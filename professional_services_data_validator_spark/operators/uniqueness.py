"""Primary-key uniqueness checks.

The reference has no dedicated uniqueness validation — PK collisions surface
as row-validation anomalies. BASELINE.json makes uniqueness on
(conv_id, turn_idx) a first-class check. Pure hash-aggregate: one shuffle on
the PK, map-side partial counts, violations = filter(count > 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import consts


def uniqueness_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once: (keys..., dup_count)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def uniqueness_verdict(
    df: DataFrame, keys: list[str], partition_col=None
) -> DataFrame:
    """Per-partition verdict: n_keys, n_dup_keys, n_extra_rows, status.

    One pass: groupBy(partition, keys).count() -> groupBy(partition) re-agg.
    ``partition_col`` must be functionally dependent on the keys (e.g. a
    conv_id bucket) so each key lands in exactly one partition.
    """
    part = (partition_col if partition_col is not None else F.lit(0)).alias(
        "partition_id"
    )
    per_key = df.groupBy(part, *keys).agg(F.count(F.lit(1)).alias("c"))
    return (
        per_key.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum((F.col("c") > 1).cast("long")).alias("n_dup_keys"),
            F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0)).alias(
                "n_extra_rows"
            ),
        )
        .withColumn(
            "validation_status",
            F.when(F.col("n_dup_keys") == 0, F.lit(consts.VALIDATION_STATUS_SUCCESS))
            .otherwise(F.lit(consts.VALIDATION_STATUS_FAIL)),
        )
    )
