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
    df: DataFrame, keys: list[str], n_partitions: int,
    range_partitions: int = 32,
) -> DataFrame:
    """First-row key values of each of N equal row-count partitions.

    Replicates reference partition_builder.py:183-239 semantics (rn =
    row_number over global pk order; keep rows where
    (rn - 1) % ceil(count/N) == 0) WITHOUT the single-reducer global
    window: the PK projection is range-partitioned (disjoint ordered key
    ranges per physical partition), per-partition row counts are
    prefix-summed driver-side (``range_partitions`` rows — tiny), and the
    global row number is offset + a per-partition window. Every window
    partitions by the physical partition id, so the sort parallelism is
    ``range_partitions`` instead of 1.
    """
    kc = [F.col(k) for k in keys]
    ranged = (
        df.select(*keys)
        .repartitionByRange(range_partitions, *kc)
        .sortWithinPartitions(*kc)
        .withColumn("__pid", F.spark_partition_id())
    )
    ranged = ranged.persist()
    try:
        counts = {r["__pid"]: r["n"] for r in
                  ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
        total = sum(counts.values())
        if total == 0:
            return ranged.sparkSession.createDataFrame(
                [], ranged.drop("__pid").withColumn(
                    "partition_idx", F.lit(0)
                ).select("partition_idx", *keys).schema
            )
        step = -(-total // n_partitions)  # ceil
        offsets, acc = {}, 0
        for pid in sorted(counts):  # range partitions are in key order
            offsets[pid] = acc
            acc += counts[pid]
        off_map = F.create_map(
            *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
        )
        w = Window.partitionBy("__pid").orderBy(*kc)
        out = (
            ranged.withColumn(
                "__rn", off_map[F.col("__pid")] + F.row_number().over(w)
            )
            .filter(((F.col("__rn") - 1) % F.lit(step)) == 0)
            .withColumn(
                "partition_idx", ((F.col("__rn") - 1) / F.lit(step)).cast("int")
            )
            .select("partition_idx", *keys)
            .orderBy("partition_idx")
        )
        out = out.localCheckpoint(eager=True)  # materialize before unpersist
        return out
    finally:
        ranged.unpersist()


# ---------------------------------------------------------------------------
# Partition manifest: boundaries -> runnable per-partition filter units
# (reference generate-table-partitions emits one YAML config per partition
#  with rendered WHERE text, partition_builder.py:361-430; here the unit is
#  a manifest row consumed by LineageStore.pending_partitions / cli --resume)
# ---------------------------------------------------------------------------


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def _lex_bound_sql(keys: list[str], bound: tuple, op: str) -> str:
    """Lexicographic tuple comparison rendered as ANSI SQL, e.g. for
    op='>=': (k1 > v1) OR (k1 = v1 AND k2 >= v2)."""
    terms = []
    for i in range(len(keys)):
        eqs = [f"{keys[j]} = {_sql_lit(bound[j])}" for j in range(i)]
        last_op = op if i == len(keys) - 1 else (">" if op == ">=" else "<")
        eqs.append(f"{keys[i]} {last_op} {_sql_lit(bound[i])}")
        terms.append("(" + " AND ".join(eqs) + ")")
    return "(" + " OR ".join(terms) + ")"


def partition_where_clauses(
    boundary_rows: list, keys: list[str]
) -> list[str]:
    """One WHERE-clause string per partition from collected boundary rows
    (reference partition_builder.py:97-115 renders the same shape by string
    slicing; here bounds are structured values)."""
    bounds = [tuple(r[k] for k in keys) for r in boundary_rows]
    out = []
    for i, lo in enumerate(bounds):
        parts = []
        if i > 0:  # first partition is unbounded below
            parts.append(_lex_bound_sql(keys, lo, ">="))
        if i + 1 < len(bounds):
            parts.append(_lex_bound_sql(keys, bounds[i + 1], "<"))
        out.append(" AND ".join(parts) if parts else "1 = 1")
    return out


def partition_manifest(
    df: DataFrame, keys: list[str], n_partitions: int
) -> DataFrame:
    """Manifest table (partition_id, <key>_lower..., where_clause): the
    resumable unit of work. partition_id is stable across runs (derived from
    boundary values, not physical layout), so lineage skip-lists survive
    restarts."""
    rows = partition_boundaries(df, keys, n_partitions).collect()
    clauses = partition_where_clauses(rows, keys)
    data = []
    for r, clause in zip(rows, clauses):
        rec = {"partition_id": str(r["partition_idx"]),
               "where_clause": clause}
        for k in keys:
            rec[f"{k}_lower"] = r[k]
        data.append(rec)
    spark = df.sparkSession
    return spark.createDataFrame(data)


def pending_where(manifest_pending: DataFrame) -> str:
    """OR of the pending partitions' WHERE clauses — a single pushdown-able
    predicate restricting the scan to unvalidated partitions."""
    clauses = [r["where_clause"] for r in manifest_pending.collect()]
    if not clauses:
        return "1 = 0"  # everything already passed
    return " OR ".join(f"({c})" for c in clauses)


def assign_partition_id(keys: list[str], boundary_rows: list) -> Column:
    """partition_id column expression from collected boundaries: a CASE
    chain of lexicographic comparisons (n_partitions branches, all
    JVM-side) for per-partition verdict grouping."""
    bounds = [tuple(r[k] for k in keys) for r in boundary_rows]
    # fold bottom-up: rows >= bounds[i] get id i, everything else falls
    # through to partition 0
    out = F.lit("0")
    for i in range(1, len(bounds)):
        out = F.when(
            F.expr(_lex_bound_sql(keys, bounds[i], ">=")), F.lit(str(i))
        ).otherwise(out)
    return out


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
