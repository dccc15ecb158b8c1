"""spark-submit job entrypoint.

Reference analog: the CLI + YAML config runner
(reference data_validation/__main__.py:639-651 ``configs run`` and the
kube-completions fan-out :352-401). There: one container per partition YAML.
Here: ONE spark-submit job; partitions are Spark tasks, resume comes from
the lineage table instead of per-partition YAML files.

Usage (cluster):
    ./package.sh                         # builds dist/psdv_spark.zip
    spark-submit --py-files dist/psdv_spark.zip \
        jobs/run_validation.py --config my_validation.yaml \
        --lineage-dir /data/lineage --resume

Config file (YAML or JSON) mirrors reference config keys; see
ValidationConfig.from_dict for the schema.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def load_config(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        import yaml

        return yaml.safe_load(text)
    except ImportError:  # pragma: no cover
        return json.loads(text)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="psdv-spark")
    p.add_argument("--config", required=True, help="validation config YAML/JSON")
    p.add_argument("--source-path", help="parquet path of the source table")
    p.add_argument("--target-path", help="parquet path of the target table")
    p.add_argument("--source-table", help="catalog table name (Iceberg)")
    p.add_argument("--target-table", help="catalog table name (Iceberg)")
    p.add_argument("--lineage-dir", help="lineage table location")
    p.add_argument(
        "--resume",
        action="store_true",
        help="skip partitions already passed under the same config hash",
    )
    p.add_argument(
        "--partition-by",
        default=None,
        help="partition expression for per-partition verdicts, e.g. "
        "'CAST(ts AS DATE)'",
    )
    p.add_argument(
        "--partition-keys",
        default=None,
        help="comma-separated PK columns: builds a partition manifest "
        "(reference generate-table-partitions) whose partitions are the "
        "resume/verdict unit",
    )
    p.add_argument(
        "--num-partitions",
        type=int,
        default=8,
        help="manifest partition count (with --partition-keys)",
    )
    p.add_argument(
        "--emit-manifest",
        default=None,
        help="also write the partition manifest table (partition_id, "
        "bounds, where_clause) to this path — the analog of reference "
        "generate-table-partitions' per-partition YAML emission",
    )
    p.add_argument("--output", help="report output path (parquet append)")
    p.add_argument(
        "--filter-status", choices=["success", "fail"], help="report filter"
    )
    return p


def _load_side(spark: SparkSession, path: str | None, table: str | None):
    if path:
        return spark.read.parquet(path)
    if table:
        return spark.read.table(table)
    raise SystemExit("need --source-path/--target-path or catalog table names")


def main(argv: list[str] | None = None) -> int:
    from .config import ValidationConfig, consts
    from .lineage import LineageStore, config_hash
    from .plans.compiler import run_validation
    from .session import get_spark
    from .sources.sinks import report_to_text, write_report

    args = build_parser().parse_args(argv)
    cfg_dict = load_config(args.config)
    config = ValidationConfig.from_dict(cfg_dict)
    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("psdv-job")

    source = _load_side(spark, args.source_path, args.source_table)
    target = _load_side(spark, args.target_path, args.target_table)

    ch = config_hash(cfg_dict)
    store = LineageStore(spark, args.lineage_dir) if args.lineage_dir else None

    if args.resume and store and args.partition_by:
        passed = store.passed_partitions(ch, config.validation_type)
        part_expr = F.expr(args.partition_by).cast("string")
        # partition pruning: passed partitions never reach the operators
        source = source.join(
            F.broadcast(passed),
            part_expr == F.col("partition_id"),
            "left_anti",
        )
        target = target.join(
            F.broadcast(passed),
            part_expr == F.col("partition_id"),
            "left_anti",
        )

    manifest = None
    pkeys: list[str] = []
    if store and args.partition_keys:
        from .operators.partitioning import (
            partition_manifest,
            pending_where,
        )

        pkeys = [k.strip() for k in args.partition_keys.split(",")]
        manifest = partition_manifest(source, pkeys, args.num_partitions)
        if args.emit_manifest:
            manifest.coalesce(1).write.mode("overwrite").parquet(
                args.emit_manifest
            )
        if args.resume:
            pending = store.pending_partitions(
                manifest, ch, config.validation_type
            )
            wc = pending_where(pending)
            # one pushdown-able predicate; passed PK ranges never rescanned
            source = source.filter(F.expr(wc))
            target = target.filter(F.expr(wc))

    report = run_validation(config, source, target, spark=spark)

    if store and manifest is not None and config.validation_type == (
        consts.ROW_VALIDATION
    ):
        # per-manifest-partition verdicts into the lineage table: the
        # resumable unit matches reference generate-table-partitions' YAMLs
        from .metadata import RunMetadata
        from .operators.partitioning import assign_partition_id
        from .operators.row_compare import row_compare_verdicts

        mrows = sorted(
            manifest.collect(), key=lambda r: int(r["partition_id"])
        )
        bound_rows = [{k: r[f"{k}_lower"] for k in pkeys} for r in mrows]
        verdicts = row_compare_verdicts(
            source,
            target,
            pkeys,
            partition_col=assign_partition_id(pkeys, bound_rows),
            hash_columns=config.hash_columns or "*",
        )
        store.append_verdicts(
            verdicts, ch, RunMetadata().run_id, config.validation_type
        )

    if store and args.partition_by and config.group_by:
        # grouped runs: one verdict row per partition into the lineage table
        verdicts = report.groupBy(
            F.col("group_by_columns").alias("partition_id")
        ).agg(
            F.count(F.lit(1)).alias("n_validations"),
            F.min(
                F.when(
                    F.col("validation_status")
                    == consts.VALIDATION_STATUS_SUCCESS,
                    F.lit("success"),
                ).otherwise(F.lit("fail"))
            ).alias("validation_status"),
        )
        store.append_verdicts(
            verdicts, ch, report.first().run_id, config.validation_type
        )

    if args.output:
        if config.validation_type == consts.ROW_VALIDATION:
            # O(rows) report: partitioned parallel append, never a global
            # sort / coalesce(1) (round-1 scale-killer fix); partitioning on
            # validation_status makes --filter-status reads partition-pruned
            write_report(
                report, args.output, partition_by=["validation_status"]
            )
        else:
            write_report(report, args.output, small=True)
    print(report_to_text(report, status_filter=args.filter_status))
    failed = (
        report.filter(
            F.col("validation_status") == consts.VALIDATION_STATUS_FAIL
        ).count()
        > 0
    )
    if not preexisting:  # don't stop a session the caller owns
        spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
