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
    """Typed SQL literal rendering (ADVICE r2: str(date) produced unquoted
    '2026-03-01', which Spark parses as integer arithmetic). Unknown types
    fall back to a QUOTED string, never bare text."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, datetime.datetime):  # before date: datetime subclasses it
        return "TIMESTAMP '" + v.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
    if isinstance(v, datetime.date):
        return "DATE '" + v.isoformat() + "'"
    if isinstance(v, (int, float, decimal.Decimal)):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex() + "'"
    return "'" + str(v).replace("'", "''") + "'"


def _cmp_sql(key: str, v, op: str) -> str:
    """One comparison term with the NULLS FIRST total order the boundary
    computation uses (``orderBy`` ascending sorts NULL keys first): NULL is
    below every value, and NULL-key rows must not be silently dropped by
    SQL's NULL-propagating comparisons (ADVICE r2 '(k >= NULL)' bug)."""
    lit = _sql_lit(v)
    if v is None:
        return {
            "=": f"{key} IS NULL",
            ">": f"{key} IS NOT NULL",
            ">=": "1 = 1",  # everything is >= NULL under NULLS FIRST
            "<": "1 = 0",  # nothing is < NULL
        }[op]
    if op == "<":  # NULL keys sort below any value -> they are < v
        return f"({key} IS NULL OR {key} < {lit})"
    return f"{key} {op} {lit}"  # =, >, >= correctly exclude NULL keys


def _lex_bound_sql(keys: list[str], bound: tuple, op: str) -> str:
    """Lexicographic tuple comparison rendered as Spark SQL, e.g. for
    op='>=': (k1 > v1) OR (k1 = v1 AND k2 >= v2), with typed literals and
    NULL bounds handled per the NULLS FIRST key order."""
    terms = []
    for i in range(len(keys)):
        eqs = [_cmp_sql(keys[j], bound[j], "=") for j in range(i)]
        last_op = op if i == len(keys) - 1 else (">" if op == ">=" else "<")
        eqs.append(_cmp_sql(keys[i], bound[i], last_op))
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


def _partition_identity(idx: int, where_clause: str) -> str:
    """Value-derived partition id: a hash of (ordinal, predicate text). The
    predicate fully determines the partition's row set given the keys, so
    the id is stable across runs over unchanged data — and if the table DID
    change between a failed run and --resume, the recomputed boundaries
    yield different clauses, hence different ids, and every affected
    partition re-runs instead of lineage 'success' rows silently skipping
    rows that were never validated (ADVICE r2 on ordinal ids)."""
    import hashlib

    return hashlib.sha256(f"{idx}|{where_clause}".encode()).hexdigest()[:12]


def partition_manifest(
    df: DataFrame, keys: list[str], n_partitions: int
) -> DataFrame:
    """Manifest table (partition_id, partition_idx, <key>_lower...,
    where_clause): the resumable unit of work. partition_id is derived from
    the boundary predicate itself (not the ordinal alone), so lineage
    skip-lists stay valid across restarts exactly when the key ranges are
    unchanged."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    rows = partition_boundaries(df, keys, n_partitions).collect()
    clauses = partition_where_clauses(rows, keys)
    data = []
    for r, clause in zip(rows, clauses):
        rec = {
            "partition_id": _partition_identity(int(r["partition_idx"]), clause),
            "partition_idx": int(r["partition_idx"]),
            "where_clause": clause,
        }
        for k in keys:
            rec[f"{k}_lower"] = r[k]
        data.append(rec)
    key_types = {f.name: f.dataType for f in df.schema.fields}
    schema = T.StructType(
        [
            T.StructField("partition_id", T.StringType()),
            T.StructField("partition_idx", T.IntegerType()),
            T.StructField("where_clause", T.StringType()),
        ]
        + [
            T.StructField(f"{k}_lower", key_types.get(k, T.StringType()))
            for k in keys
        ]
    )
    # explicit schema: createDataFrame([]) cannot infer one on an empty
    # source (ADVICE r2), and typed *_lower columns survive the round-trip
    return spark.createDataFrame(data, schema)


def pending_where(manifest_pending: DataFrame) -> str:
    """OR of the pending partitions' WHERE clauses — a single pushdown-able
    predicate restricting the scan to unvalidated partitions."""
    clauses = [r["where_clause"] for r in manifest_pending.collect()]
    if not clauses:
        return "1 = 0"  # everything already passed
    return " OR ".join(f"({c})" for c in clauses)


def assign_partition_id(
    keys: list[str], boundary_rows: list, partition_ids: list[str] | None = None
) -> Column:
    """partition_id column expression from collected boundaries: a CASE
    chain of lexicographic comparisons (n_partitions branches, all
    JVM-side) for per-partition verdict grouping. ``partition_ids`` (e.g.
    the manifest's value-derived ids) aligns emitted ids with the manifest;
    default is the ordinal string."""
    bounds = [tuple(r[k] for k in keys) for r in boundary_rows]
    ids = partition_ids or [str(i) for i in range(len(bounds))]
    # fold bottom-up: rows >= bounds[i] get id i, everything else falls
    # through to partition 0
    out = F.lit(ids[0] if ids else "0")
    for i in range(1, len(bounds)):
        out = F.when(
            F.expr(_lex_bound_sql(keys, bounds[i], ">=")), F.lit(ids[i])
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


def key_skew_profile(df: DataFrame, keys: list[str] | str) -> DataFrame:
    """Group-size skew diagnostics for a prospective shuffle/join key — the
    pre-flight check that decides whether a key needs salting or AQE skew
    handling BEFORE a 10^12-row job is launched (north-rule skew mandate;
    the reference's closest analog is the 10% source/target row-count skew
    warning, partition_builder.py:167-171).

    One groupBy(keys) count (the only O(rows) pass, map-side combined: the
    exchange carries one row per distinct key), then a single fold over the
    O(keys) size distribution. Percentiles are exact (`percentile`,
    cell-identical to DuckDB quantile_cont) — the distribution has one row
    per key, which is collect-free but assumed << rows; for key spaces
    where even that is huge, swap percentile for percentile_approx.

    Output (one row): n_keys, n_rows, max_size, max_share (top key's row
    fraction — the direct "one reducer gets this much" number), avg_size,
    p50/p90/p99 size, skew_ratio (max/p50 — >> 1 means a hot key), and the
    heaviest key rendered as a string.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    sizes = df.groupBy(*key_list).agg(F.count(F.lit(1)).alias("__n"))
    key_str = F.concat_ws(
        "|", *[F.col(k).cast("string") for k in key_list]
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("n_rows"),
        F.max("__n").alias("max_size"),
        F.round(F.max("__n") / F.sum("__n"), 6).alias("max_share"),
        F.round(F.avg("__n"), 6).alias("avg_size"),
        F.expr("percentile(__n, 0.5)").alias("p50_size"),
        F.expr("percentile(__n, 0.9)").alias("p90_size"),
        F.expr("percentile(__n, 0.99)").alias("p99_size"),
        F.round(
            F.max("__n") / F.expr("percentile(__n, 0.5)"), 6
        ).alias("skew_ratio"),
        # deterministic tie-break: among equal max sizes, the largest key
        F.max_by(key_str, F.struct(F.col("__n"), key_str)).alias("top_key"),
    )
