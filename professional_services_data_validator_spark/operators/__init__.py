from .aggregates import (
    agg_column,
    benford_check,
    build_aggregate_specs,
    categorical_compare,
    fd_violations,
    column_entropy,
    column_stats,
    mutual_information,
    novel_categories,
    numeric_corr_matrix,
    robust_outlier_profile,
)
from .row_compare import row_compare, row_violations, row_compare_verdicts
from .uniqueness import uniqueness_violations, uniqueness_verdict
from .referential import referential_violations, referential_violations_large
from .bloom import bloom_bitset, bloom_might_contain, seen_filter, with_bloom_flag
from .partitioning import (
    assign_partition_id,
    key_skew_profile,
    partition_boundaries,
    partition_manifest,
    partition_where_clauses,
    pending_where,
    salted_agg,
)
from .sampling import deterministic_sample
from .checksums import (
    checksum_compare,
    checksum_validation,
    failing_partition_predicate,
    partition_checksums,
)
from .snapshot import (
    snapshot_diff,
    snapshot_diff_rows,
    snapshot_diff_summary,
)

__all__ = [
    "column_stats",
    "build_aggregate_specs",
    "agg_column",
    "column_entropy",
    "mutual_information",
    "numeric_corr_matrix",
    "categorical_compare",
    "novel_categories",
    "fd_violations",
    "robust_outlier_profile",
    "benford_check",
    "key_skew_profile",
    "row_compare",
    "row_violations",
    "row_compare_verdicts",
    "uniqueness_violations",
    "uniqueness_verdict",
    "referential_violations",
    "referential_violations_large",
    "bloom_bitset",
    "bloom_might_contain",
    "seen_filter",
    "with_bloom_flag",
    "partition_boundaries",
    "partition_manifest",
    "partition_where_clauses",
    "pending_where",
    "assign_partition_id",
    "salted_agg",
    "deterministic_sample",
    "partition_checksums",
    "checksum_compare",
    "checksum_validation",
    "failing_partition_predicate",
    "snapshot_diff",
    "snapshot_diff_rows",
    "snapshot_diff_summary",
]
