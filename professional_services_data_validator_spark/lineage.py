"""Checkpointed lineage: per-partition (partition_id, stage, metrics,
verdict) rows making validation runs resumable mid-flight.

Reference analog: the reference's resumability unit is "one YAML config file
per partition, one K8s container per YAML" (reference
data_validation/partition_builder.py:361-430 + __main__.py:364-383); a
partition that already ran simply isn't re-submitted. Here the same contract
is a lineage table: before running, completed-successful partitions are
anti-joined out of the partition manifest, and Iceberg/parquet partition
pruning keeps them from even being scanned.

Storage: an Iceberg table (``writeTo(...).append()``) in production; in this
sandbox (no Iceberg jars) an append-only parquet directory. Appends are
atomic per write (one file per append), and idempotency is keyed on
(run_config_hash, partition_id, stage): re-running a completed partition
inserts a duplicate row, and ``passed_partitions`` takes the latest verdict
per key, so replays are harmless (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_config_hash", T.StringType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_id", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("metrics", T.StringType()),  # JSON blob
        T.StructField("verdict", T.StringType()),  # success | fail
        T.StructField("ts", T.TimestampType()),
    ]
)


def config_hash(config: dict | object) -> str:
    """Stable hash of the validation config — resume only skips partitions
    validated under the SAME config."""
    if hasattr(config, "__dict__"):
        config = {
            k: v for k, v in config.__dict__.items() if not k.startswith("_")
        }
    blob = json.dumps(config, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


class LineageStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet")
            for root, _, files in os.walk(self.path)
            for f in files
        )

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)

    def append(self, rows: DataFrame) -> None:
        """rows must carry (run_config_hash, run_id, partition_id, stage,
        metrics, verdict); ts is stamped here. One file per append keeps the
        write atomic-enough for a sandbox; Iceberg appends are atomic for
        real."""
        out = rows.select(
            "run_config_hash",
            "run_id",
            "partition_id",
            "stage",
            "metrics",
            "verdict",
            F.current_timestamp().alias("ts"),
        )
        out.coalesce(1).write.mode("append").parquet(self.path)

    def append_verdicts(
        self,
        verdicts: DataFrame,
        cfg_hash: str,
        run_id: str,
        stage: str,
        partition_col: str = "partition_id",
    ) -> None:
        """Persist an operator's per-partition verdict frame (e.g.
        row_compare_verdicts / uniqueness_verdict output)."""
        metric_cols = [
            c for c in verdicts.columns
            if c not in (partition_col, "validation_status")
        ]
        rows = verdicts.select(
            F.lit(cfg_hash).alias("run_config_hash"),
            F.lit(run_id).alias("run_id"),
            F.col(partition_col).cast("string").alias("partition_id"),
            F.lit(stage).alias("stage"),
            F.to_json(F.struct(*metric_cols)).alias("metrics"),
            F.col("validation_status").alias("verdict"),
        )
        self.append(rows)

    def passed_partitions(self, cfg_hash: str, stage: str) -> DataFrame:
        """Latest verdict per partition for this config+stage, filtered to
        success — the skip list for resume."""
        lin = self.read().filter(
            (F.col("run_config_hash") == cfg_hash) & (F.col("stage") == stage)
        )
        from pyspark.sql import Window

        w = Window.partitionBy("partition_id").orderBy(F.col("ts").desc())
        latest = (
            lin.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        return latest.filter(F.col("verdict") == "success").select(
            "partition_id"
        )

    def invalidate_partitions(
        self,
        partition_ids: DataFrame,
        run_id: str,
        reason: str = "snapshot-diff",
    ) -> int:
        """Supersede stale 'success' verdicts for the given partitions —
        the incremental-validation hook: after a snapshot-diff flags
        partitions as changed, every (config, stage) whose LATEST verdict
        for such a partition is success gets an appended 'invalidated'
        row, so ``passed_partitions`` (latest-wins) stops skipping it and
        the next ``--resume`` run re-validates exactly the changed
        partitions. Append-only (no rewrites — the Iceberg-friendly
        shape); config-agnostic by design: the DATA changed, so every
        validation's prior success on that partition is stale.

        ``partition_ids``: frame with a ``partition_id`` column (cast to
        string here). Returns the number of superseding rows written.
        """
        from pyspark.sql import Window

        ids = partition_ids.select(
            F.col("partition_id").cast("string").alias("partition_id")
        ).distinct()
        lin = self.read()
        w = Window.partitionBy(
            "run_config_hash", "stage", "partition_id"
        ).orderBy(F.col("ts").desc())
        latest_success = (
            lin.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col("verdict") == "success"))
        )
        hits = latest_success.join(
            F.broadcast(ids), "partition_id", "inner"
        ).select(
            "run_config_hash",
            F.lit(run_id).alias("run_id"),
            "partition_id",
            "stage",
            F.to_json(
                F.struct(F.lit(reason).alias("invalidated_by"))
            ).alias("metrics"),
            F.lit("invalidated").alias("verdict"),
        )
        hits = hits.persist()
        n = hits.count()
        if n:
            self.append(hits)
        hits.unpersist()
        return n

    def pending_partitions(
        self, manifest: DataFrame, cfg_hash: str, stage: str
    ) -> DataFrame:
        """manifest(partition_id, ...) minus already-passed partitions.

        The passed set is small (one row per partition) -> broadcast
        anti-join; at 10^12 rows the surviving partition ids then drive
        Iceberg partition pruning via an isin()/filter pushdown, so passed
        partitions are never rescanned.
        """
        passed = F.broadcast(self.passed_partitions(cfg_hash, stage))
        return manifest.join(passed, "partition_id", "left_anti")


def resumable_run(
    store: LineageStore,
    manifest: DataFrame,
    cfg_hash: str,
    run_id: str,
    stage: str,
    run_fn,
) -> DataFrame:
    """Run ``run_fn(pending_partition_ids_df) -> verdicts_df`` over only the
    not-yet-passed partitions, persist verdicts, return them."""
    pending = store.pending_partitions(manifest, cfg_hash, stage)
    verdicts = run_fn(pending)
    store.append_verdicts(verdicts, cfg_hash, run_id, stage)
    return verdicts
