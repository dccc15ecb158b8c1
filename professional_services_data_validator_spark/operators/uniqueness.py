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


def duplication_by_day(df, keys, ts_col: str = "ts"):
    """Primary-key duplication rate as a per-day time series — the ops
    dashboard twin of uniqueness_violations (that one lists the dup rows;
    this one answers "WHEN did duplication start", which is what pages an
    on-call). ONE aggregate: groupBy(day) with a count-distinct over the
    key struct (Expand + two-phase hash aggregate — map-side partial
    dedup, the exchange carries live (day, key) pairs).

    Output per day: (day, n_rows, n_keys, n_dup_rows, dup_frac 6dp)
    where n_dup_rows = n_rows - n_keys (rows beyond the first per key).
    """
    from pyspark.sql import functions as F

    day = F.date_format(ts_col, "yyyy-MM-dd").alias("day")
    key = F.struct(*[F.col(k) for k in keys])
    out = df.groupBy(day).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(key).alias("n_keys"),
    )
    dup = F.col("n_rows") - F.col("n_keys")
    return out.select(
        "day",
        "n_rows",
        "n_keys",
        dup.alias("n_dup_rows"),
        F.round(dup / F.col("n_rows"), 6).alias("dup_frac"),
    ).orderBy("day")
