"""Incremental validation over Structured Streaming.

The reference is strictly batch (reference docs/internal/
distributed_jobs.md:5 — partition + fan-out is its only scale story), and
BASELINE's "resumable" requirement is met by the lineage table (lineage.py).
This module is the engine's *streaming extension*: the same validation
semantics applied incrementally as transcript turns arrive.

Design:
- ``stream_column_stats``: windowed per-day aggregates with a watermark —
  the streaming twin of operators.aggregates.column_stats; output rows have
  the same shape as grouped-validation inputs, so the batch combiner can
  diff a streaming source against a batch reference table.
- ``stream_uniqueness_alerts``: duplicate (conv_id, turn_idx) detection in
  a watermark-bounded state via streaming dropDuplicates + exceptAll-style
  counting; emits violation rows as they occur.
- ``foreachBatch_validate``: per-microbatch hook running an arbitrary batch
  validation (reusing the exact batch operators) against each microbatch —
  the pragmatic production pattern: stream → microbatch → batch engine,
  verdicts appended to the lineage store.

State scale: watermark bounds state to (window size + lateness); per-key
state is a counter, so 10^12 turns stream through without unbounded growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_column_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "1 day",
) -> DataFrame:
    """Per-window transcript stats (streaming twin of column_stats).

    Late data beyond ``watermark`` is dropped (documented late-data policy);
    output mode 'append' emits each window once it is final — exactly the
    per-partition verdict cadence the lineage table wants.
    """
    # watermarks require TIMESTAMP (LTZ); parquet sources may carry NTZ
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.count("tool").alias("count__tool"),
            F.sum(F.length("text")).alias("sum__text"),
            F.min("turn_idx").alias("min__turn_idx"),
            F.max("turn_idx").alias("max__turn_idx"),
        )
        .select(
            F.col("w.start").cast("date").alias("ts"),
            "count",
            "count__tool",
            "sum__text",
            "min__turn_idx",
            "max__turn_idx",
        )
    )


def stream_uniqueness_alerts(
    stream: DataFrame,
    keys: tuple = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Duplicate-PK alerts from a stream.

    Streaming aggregation keyed on the PK within the watermark horizon;
    update-mode rows with count > 1 are the alerts. State = one counter per
    in-horizon key.
    """
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "1 day").alias("w"), *[F.col(k) for k in keys]
        )
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
        .select(
            F.col("w.start").cast("date").alias("day"),
            *keys,
            "dup_count",
        )
    )


def foreachBatch_validate(reference_df: DataFrame, lineage_store=None,
                          cfg_hash: str = "stream", run_id: str = "stream"):
    """Returns a foreachBatch function validating every microbatch against
    ``reference_df`` with the batch row_compare verdict operator and
    (optionally) appending verdicts to the lineage store.

    Pattern: readStream → writeStream.foreachBatch(this) — each microbatch
    is validated with EXACTLY the batch semantics (no parallel
    reimplementation to drift out of sync).
    """
    from ..operators.row_compare import row_compare_verdicts

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        verdicts = row_compare_verdicts(
            batch_df,
            reference_df.join(
                batch_df.select("conv_id").distinct(), "conv_id", "left_semi"
            ),
            ["conv_id", "turn_idx"],
            partition_col=F.lit(str(batch_id)),
        )
        if lineage_store is not None:
            lineage_store.append_verdicts(
                verdicts, cfg_hash, run_id, f"stream_batch_{batch_id}"
            )
        else:
            verdicts.collect()

    return _fn
