"""Partition planning + salted aggregation.

Reference analog: generate-table-partitions
(reference data_validation/partition_builder.py:84-239) computes N equal
PK-range partitions via ``row_number() OVER (ORDER BY pks)`` and renders
WHERE-clause text per partition (its YAML fan-out unit). Here partitions are
Spark/Iceberg partitions; the boundary computation survives as a planning
utility, and the WHERE-text slicing (partition_builder.py:97-115, fragile by
design) is replaced by structured predicates.

Salted aggregation (BASELINE requirement, no reference analog — closest is
the 10% skew warning at partition_builder.py:167-171): two-phase exact
re-aggregation so one hot conv_id cannot pin a single reducer. avg/stddev
decompose into (sum, count, sum of squares); all other supported aggregates
are algebraic (min/max/sum/count/bit_xor) so phase-2 re-agg is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def partition_boundaries(
    df: DataFrame, keys: list[str], n_partitions: int
) -> DataFrame:
    """First-row key values of each of N equal row-count partitions.

    Replicates reference partition_builder.py:183-239: rn = row_number over
    global pk order; keep rows where (rn - 1) % ceil(count/N) == 0. The
    global window is a deliberate single-reducer step — it runs on the
    *boundary planning* path, once, over PKs only (projected before the
    sort); production planning should prefer Iceberg partition metadata.
    """
    w = Window.orderBy(*[F.col(k) for k in keys])
    counted = df.select(*keys).withColumn("__rn", F.row_number().over(w))
    total = counted.count()
    step = -(-total // n_partitions)  # ceil
    return (
        counted.filter(((F.col("__rn") - 1) % F.lit(step)) == 0)
        .withColumn("partition_idx", ((F.col("__rn") - 1) / F.lit(step)).cast("int"))
        .select("partition_idx", *keys)
        .orderBy("partition_idx")
    )


def default_salt(n_salts: int) -> Column:
    """Default salt: hash of (physical partition id, per-row monotonic id).

    Independent of any data column, so it spreads even a single hot group
    across ``n_salts`` phase-1 reducers — unlike a hash of a data column,
    which is a silent no-op whenever that column is functionally dependent
    on the group key (the round-1 default hashed df.columns[0], which for
    transcripts WAS the group key: every hot group landed in one salt
    bucket). Salt assignment never affects correctness — phase 2 merges
    partials exactly — so a physical-layout-dependent salt is safe.
    """
    return F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    )


# aggregate name -> (phase1 exprs, phase2 re-agg expr builder)
def salted_agg(
    df: DataFrame,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Exact two-phase aggregation over salted groups.

    ``aggs``: output_name -> (agg_type, column) with agg_type in
    count|sum|min|max|avg|std|bit_xor. Phase 1 groups by (group_by..., salt)
    — the hot key's rows spread over ``n_salts`` reducers; phase 2 re-groups
    by group_by and merges partials exactly.

    NOTE: with AQE skew handling this is rarely needed for joins, but
    groupBy skew is not AQE-split in all Spark versions; salting is the
    explicit fix. Correctness is covered by tests comparing against the
    direct single-phase aggregate.
    """
    salt = (
        salt_source if salt_source is not None else default_salt(n_salts)
    ).alias("__salt")

    p1_exprs = []
    for name, (agg, col) in aggs.items():
        c = F.col(col) if col is not None else None
        if agg == "count":
            p1_exprs.append(
                (F.count(F.lit(1)) if c is None else F.count(c)).alias(f"{name}__cnt")
            )
        elif agg in ("sum", "min", "max"):
            p1_exprs.append(getattr(F, agg)(c).alias(f"{name}__{agg}"))
        elif agg == "bit_xor":
            p1_exprs.append(F.expr(f"bit_xor({col})").alias(f"{name}__bx"))
        elif agg in ("avg", "std"):
            p1_exprs.append(F.sum(c.cast("double")).alias(f"{name}__s"))
            p1_exprs.append(F.count(c).alias(f"{name}__n"))
            if agg == "std":
                p1_exprs.append(
                    F.sum(c.cast("double") * c.cast("double")).alias(f"{name}__ss")
                )
        else:
            raise ValueError(f"unsupported salted agg {agg!r}")

    p1 = df.groupBy(*group_by, salt).agg(*p1_exprs)

    p2_exprs = []
    for name, (agg, col) in aggs.items():
        if agg == "count":
            p2_exprs.append(F.sum(f"{name}__cnt").alias(name))
        elif agg in ("sum", "min", "max"):
            p2_exprs.append(getattr(F, agg)(f"{name}__{agg}").alias(name))
        elif agg == "bit_xor":
            p2_exprs.append(F.expr(f"bit_xor({name}__bx)").alias(name))
        elif agg == "avg":
            p2_exprs.append(
                (F.sum(f"{name}__s") / F.sum(f"{name}__n")).alias(name)
            )
        elif agg == "std":
            n = F.sum(f"{name}__n")
            s = F.sum(f"{name}__s")
            ss = F.sum(f"{name}__ss")
            # sample stddev from merged moments: sqrt((ss - s^2/n) / (n-1))
            p2_exprs.append(
                F.sqrt((ss - (s * s) / n) / (n - F.lit(1))).alias(name)
            )
    return p1.groupBy(*group_by).agg(*p2_exprs)
