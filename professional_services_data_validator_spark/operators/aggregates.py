"""Column-validation aggregation: one-pass hash aggregate.

Reference analog: AggregateField factories
(reference data_validation/query_builder/query_builder.py:37-115) compiled in
a single GROUP BY query (query_builder.py:546-557), plus the type-driven
pre-aggregation rewrites of '*'-expansion
(reference data_validation/config_manager.py:741-967).

Spark-first notes:
- ALL requested aggregates run in ONE ``groupBy().agg(...)`` — a single scan,
  partial (map-side) + final hash aggregation, whole-stage codegen. No
  per-aggregate queries, no second pass for null-rate.
- group-by timestamp columns auto-cast to date
  (reference query_builder.py:251-252).
- COUNT(*) and COUNT(col) in the same pass give null-rate for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import AggregateSpec, FilterSpec

try:  # Spark >= 3.5 has the python wrapper; fall back to SQL expr
    from pyspark.sql.functions import bit_xor as _bit_xor_fn  # type: ignore

    def _bit_xor(c: Column) -> Column:
        return _bit_xor_fn(c)

except ImportError:  # pragma: no cover

    def _bit_xor(c: Column) -> Column:
        return F.expr(f"bit_xor({c._jc.toString()})")


_PRECALC = {
    None: lambda c: c,
    "length": F.length,
    "byte_length": F.octet_length,
    "epoch_seconds": lambda c: F.unix_timestamp(c.cast("timestamp")),
    "cast_bigint": lambda c: c.cast("long"),
}

_AGG = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "avg": F.avg,
    "std": F.stddev_samp,
    "bit_xor": _bit_xor,
}


def agg_column(spec: AggregateSpec) -> Column:
    """AggregateSpec -> a single Spark aggregate Column."""
    if spec.agg_type == "count":
        base = (
            F.count(F.lit(1))
            if spec.column is None
            else F.count(_PRECALC[spec.precalc](F.col(spec.column)))
        )
    else:
        if spec.column is None:
            raise ValueError(f"{spec.agg_type} requires a column")
        base = _AGG[spec.agg_type](_PRECALC[spec.precalc](F.col(spec.column)))
    if spec.post_cast:
        base = base.cast(spec.post_cast)
    return base.alias(spec.validation_name)


def apply_filters(df: DataFrame, filters: list[FilterSpec], side: str) -> DataFrame:
    """Apply the per-side WHERE predicates
    (reference query_builder.py:145-197 FilterField family)."""
    for f in filters:
        if f.ftype == "custom":
            sql = f.source if side == "source" else (f.target or f.source)
            if sql:
                df = df.filter(F.expr(sql))
        elif f.ftype == "equal_to":
            df = df.filter(F.col(f.column) == F.lit(f.value))
        elif f.ftype == "greater_than":
            df = df.filter(F.col(f.column) > F.lit(f.value))
        elif f.ftype == "less_than":
            df = df.filter(F.col(f.column) < F.lit(f.value))
        elif f.ftype == "isin":
            df = df.filter(F.col(f.column).isin(list(f.value)))
        elif f.ftype == "or":
            import functools
            import operator as _op

            preds = [F.expr(s) for s in f.value]
            df = df.filter(functools.reduce(_op.or_, preds))
        else:
            raise ValueError(f"unknown filter type {f.ftype!r}")
    return df


def column_stats(
    df: DataFrame,
    aggregates: list[AggregateSpec],
    group_by: list[str] | None = None,
    filters: list[FilterSpec] | None = None,
    side: str = "source",
    cast_group_timestamps_to_date: bool = True,
) -> DataFrame:
    """One row per group with one column per aggregate validation.

    This is the entire 'query' of a Column/GroupedColumn validation
    (reference query_builder.py:512-562 compile order:
    filter -> calculated mutates -> group_by -> aggregate).
    """
    if filters:
        df = apply_filters(df, filters, side)
    agg_cols = [agg_column(a) for a in aggregates]
    group_by = group_by or []
    if not group_by:
        return df.agg(*agg_cols)
    keys = []
    schema = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    for g in group_by:
        col = F.col(g)
        if cast_group_timestamps_to_date and isinstance(
            schema.get(g), (T.TimestampType, T.TimestampNTZType)
        ):
            # reference query_builder.py:251-252
            col = col.cast("date").alias(g)
        keys.append(col)
    return df.groupBy(*keys).agg(*agg_cols)


def build_aggregate_specs(
    df: DataFrame,
    agg_types: list[str],
    columns: str | list[str] = "*",
    cast_to_bigint: bool = False,
    wildcard_include_string: bool = True,
    wildcard_include_timestamp: bool = True,
) -> list[AggregateSpec]:
    """'*'-expansion with type-driven pre-calc rewrites.

    Reference analog: config_manager.build_config_column_aggregates +
    pre-calc selection (reference config_manager.py:741-967):
      string -> length(), binary -> byte_length(), timestamp/date ->
      epoch_seconds() for sum/avg/bit_xor/std; int32 -> bigint when
      ``cast_to_bigint`` (reference cli --cast-to-bigint).
    min/max/count keep native types.

    ``wildcard_include_string`` / ``wildcard_include_timestamp``: the
    reference's '*' expansion EXCLUDES string and timestamp/date columns
    from non-count aggregates unless --wildcard-include-string-len /
    --wildcard-include-timestamp opt them in (reference __main__.py:77-97
    supported_data_types; an explicit column list always includes them,
    __main__ widens supported_types for explicit lists at
    config_manager.py:894-905). Library default is True — the repo's
    documented round-1 divergence keeps type-driven expansion on for
    programmatic callers; the CLI passes the reference defaults (False
    unless flagged).
    """
    specs: list[AggregateSpec] = [AggregateSpec("count")]
    fields = df.schema.fields
    is_star = columns == "*"
    if not is_star:
        wanted = set(columns)
        fields = [f for f in fields if f.name in wanted]
    numericish = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
    )
    tstypes = (T.TimestampType, T.TimestampNTZType, T.DateType)
    for f in fields:
        dt = f.dataType
        for agg in agg_types:
            if agg == "count":
                specs.append(AggregateSpec("count", f.name))
                continue
            if is_star and isinstance(dt, T.StringType) and not (
                wildcard_include_string
            ):
                continue
            if is_star and isinstance(dt, tstypes) and not (
                wildcard_include_timestamp
            ):
                continue
            precalc = None
            if agg in ("sum", "avg", "std", "bit_xor"):
                if isinstance(dt, T.StringType):
                    precalc = "length"
                elif isinstance(dt, T.BinaryType):
                    precalc = "byte_length"
                elif isinstance(
                    dt, (T.TimestampType, T.TimestampNTZType, T.DateType)
                ):
                    precalc = "epoch_seconds"
                elif isinstance(dt, T.IntegerType) and cast_to_bigint:
                    precalc = "cast_bigint"
                elif not isinstance(dt, numericish):
                    continue  # e.g. boolean/array: no sum-family aggregate
            elif agg in ("min", "max"):
                pass  # native min/max for all orderable types
            else:
                continue
            specs.append(AggregateSpec(agg, f.name, precalc=precalc))
    return specs


def numeric_profile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    mode: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group numeric distribution profile: count / min / max / avg /
    stddev_samp plus quantiles — the column-stats core (this module's
    single-pass discipline) extended to shape statistics, which the
    reference cannot express (its aggregate set stops at sum/avg/std,
    query_builder.py:37-115; percentile profiling is a BASELINE drift /
    data-quality extension).

    ``mode='exact'`` uses Spark's exact ``percentile`` (linear
    interpolation, identical definition to DuckDB ``quantile_cont`` —
    probed cell-exact, see tests) and holds per-group sorted value
    buffers: correct at group cardinalities that fit an executor, the
    oracle-able path. ``mode='approx'`` swaps in ``approx_percentile``
    (t-digest-style sketch, bounded memory regardless of group size) — the
    100-TB path: same output schema, mergeable partial aggregation,
    accuracy trades memory for error. Everything still ONE groupBy pass.

    Output: group cols + (n, vmin, vmax, avg 6dp, std 6dp, p_50, p_90, ...
    each rounded 6dp).
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"unknown mode {mode!r}")
    v = F.col(value_col).cast("double")
    pct_arr = F.array(*[F.lit(float(p)) for p in percentiles])
    if mode == "exact":
        q = F.percentile(v, pct_arr)
    else:
        q = F.percentile_approx(v, pct_arr, F.lit(accuracy))
    aggs = [
        F.count(v).cast("long").alias("n"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.round(F.avg(v), 6).alias("avg"),
        F.round(F.stddev_samp(v), 6).alias("std"),
        q.alias("__q"),
    ]
    out = (
        df.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else df.agg(*aggs)
    )
    pcols = [
        F.round(F.col("__q")[i], 6).alias(
            "p_" + str(p).replace("0.", "").ljust(2, "0")
        )
        for i, p in enumerate(percentiles)
    ]
    return out.select(*group_cols, "n", "vmin", "vmax", "avg", "std", *pcols)


def categorical_profile(
    df: DataFrame,
    columns: list[str],
    mode: str = "exact",
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column cardinality + frequency profile: exact distinct count,
    null count, and the modal (most frequent) value with its count — the
    categorical complement to ``numeric_profile`` (the reference's
    aggregate surface stops at count/min/max/sum/avg/std/bit_xor,
    config_manager.py:871; cardinality profiling is a data-quality
    extension every profiler ships).

    Plan, ``mode='exact'``: melt the selected columns to long format
    (column, value-as-string) via explode(array(structs)) — map-side only,
    no shuffle — then TWO-LEVEL aggregation: groupBy (column, value) count
    (shuffle keyed on the value space, partial map-side combine collapses
    repeats before the exchange), then groupBy column to fold per-value
    counts into (n_distinct, n_null, top_value, top_count). The second
    shuffle carries one row per DISTINCT value, not per input row — the
    scalable exact-distinct shape. Modal tie-break is deterministic:
    max_by over (count, value) picks the lexicographically largest among
    tied counts, so results are reproducible and oracle-able.

    ``mode='approx'`` is the 100-TB path when even the distinct-value
    stream is huge: ONE aggregation pass with HyperLogLog++
    (approx_count_distinct at relative error ``rsd``) per column and no
    modal value (frequency needs the exact pass). Same output schema;
    top_value/top_count come back NULL.

    Output: (column, n_distinct, n_null, top_value, top_count),
    one row per profiled column, ordered by column name.
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "approx":
        aggs = []
        for c in columns:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd).alias(f"__d_{c}")
            )
            aggs.append(
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"__n_{c}")
            )
        wide = df.agg(*aggs)
        longs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__d_{c}").cast("long").alias("n_distinct"),
                    F.col(f"__n_{c}").cast("long").alias("n_null"),
                )
                for c in columns
            ]
        )
        return (
            wide.select(F.explode(longs).alias("p"))
            .select(
                "p.column",
                "p.n_distinct",
                "p.n_null",
                F.lit(None).cast("string").alias("top_value"),
                F.lit(None).cast("long").alias("top_count"),
            )
            .orderBy("column")
        )

    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in columns
                ]
            )
        ).alias("cv")
    ).select("cv.column", "cv.value")
    per_value = melted.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    nn = F.col("value").isNotNull()
    return (
        per_value.groupBy("column")
        .agg(
            F.count(F.when(nn, 1)).cast("long").alias("n_distinct"),
            F.coalesce(
                F.sum(F.when(~nn, F.col("cnt"))), F.lit(0)
            ).cast("long").alias("n_null"),
            F.max_by(
                F.col("value"),
                F.when(nn, F.struct(F.col("cnt"), F.col("value"))),
            ).alias("top_value"),
            F.max_by(
                F.col("cnt"),
                F.when(nn, F.struct(F.col("cnt"), F.col("value"))),
            ).cast("long").alias("top_count"),
        )
        .orderBy("column")
    )


def frequent_values(
    df: DataFrame,
    columns: list[str],
    k: int = 5,
    num_salts: int = 32,
) -> DataFrame:
    """Exact per-column top-k most frequent values (heavy hitters) — the
    full-ranking extension of ``categorical_profile``'s modal value.

    Scale shape: melt the columns to long format (map-side), aggregate
    per-(column, value) counts (shuffle carries one row per DISTINCT
    value, partial map-side combine collapses repeats), then TWO-LEVEL
    top-k so no single task ever sorts a column's whole distinct-value
    stream: level 1 ranks within (column, salt = xxhash64(value) mod
    ``num_salts``) and keeps k survivors per salt — the salt spreads a
    high-cardinality column's distinct values across ``num_salts``
    independent window partitions — and level 2 ranks the at most
    num_salts * k survivors per column. Exact: a value's count is fully
    aggregated before salting, and the global top-k is a subset of every
    covering partition's local top-k. Ties break deterministically on
    (count DESC, value DESC), so results are reproducible and
    oracle-able. NULLs are excluded (they are a null-rate concern, not a
    frequency one).

    Output: (column, rank 1..k, value string, cnt), ordered by
    (column, rank).
    """
    from pyspark.sql import Window

    melted = _melt_to_column_value(df, columns)
    per_value = melted.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    order = [F.col("cnt").desc(), F.col("value").desc()]
    salt = F.pmod(F.xxhash64("value"), F.lit(num_salts))
    local = (
        per_value.withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("column", salt).orderBy(*order)
            ),
        )
        .filter(F.col("__r") <= k)
        .drop("__r")
    )
    return (
        local.withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("column").orderBy(*order)),
        )
        .filter(F.col("rank") <= k)
        .select(
            "column",
            F.col("rank").cast("int").alias("rank"),
            "value",
            F.col("cnt").cast("long").alias("cnt"),
        )
        .orderBy("column", "rank")
    )


def _melt_to_column_value(df: DataFrame, columns: list[str]) -> DataFrame:
    """Map-side melt of the selected columns to (column, value-as-string)
    long format, NULLs dropped — shared by the exact and approximate
    heavy-hitter paths."""
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(c).cast("string").alias("value"),
                        )
                        for c in columns
                    ]
                )
            ).alias("cv")
        )
        .select("cv.column", "cv.value")
        .filter(F.col("value").isNotNull())
    )


def frequent_values_approx(
    df: DataFrame,
    columns: list[str],
    k: int = 5,
    num_counters: int = 1024,
) -> DataFrame:
    """Heavy hitters for columns whose DISTINCT-value stream is itself too
    big to shuffle (free text, ids): Misra-Gries candidate generation +
    exact broadcast recount. Same output schema as ``frequent_values``.

    Stage 1 — candidates: ``mapInPandas`` keeps ``num_counters`` (= m)
    Misra-Gries counters per column per input partition (Arrow batches,
    vectorized value_counts; the batched decrement subtracts the (m+1)-th
    largest count from all counters, the standard mergeable-summary step).
    MG guarantees every value with true in-partition frequency >
    n_part/(m+1) survives, so every value with GLOBAL frequency >
    n_col/(m+1) survives in at least one partition. Emits only the
    candidate (column, value) pairs — at most m per column per partition,
    never raw rows.

    Stage 2 — exact recount: the distinct candidate set (bounded, tiny)
    broadcasts back onto the melted stream; matched rows aggregate with
    map-side partial combine, so the only wide exchange carries at most
    |candidates| rows per mapper. Final top-k ranks |candidates| rows.

    Determinism: MG counter CONTENTS depend on partition order, but the
    emitted counts are exact (stage 2), so the result is deterministic —
    and identical to ``frequent_values`` — whenever the true k-th hitter's
    frequency exceeds n_col/(m+1) (always true when a column has fewer
    than m distinct values, and the Misra-Gries guarantee for skewed data
    otherwise). Below that threshold the tail of the ranking may vary
    with partitioning; raise ``num_counters`` to tighten.

    Cost shape: two map-side scans of the melted stream (candidates +
    recount) and zero shuffles of raw or distinct-value rows — vs the
    exact path's one scan + one shuffle of every distinct value. The
    approx path wins exactly when distinct values >> num_counters.
    """
    import pandas as pd

    melted = _melt_to_column_value(df, columns)
    cols = list(columns)
    m = int(num_counters)

    def mg_candidates(batches):
        summaries: dict[str, dict[str, int]] = {c: {} for c in cols}
        for pdf in batches:
            for col, grp in pdf.groupby("column")["value"]:
                d = summaries[col]
                for v, c in grp.value_counts().items():
                    d[v] = d.get(v, 0) + int(c)
                if len(d) > m:
                    # batched Misra-Gries decrement: subtracting the
                    # (m+1)-th largest count from every counter removes
                    # that many copies of > m distinct values
                    delta = sorted(d.values(), reverse=True)[m]
                    summaries[col] = {
                        v: c - delta for v, c in d.items() if c > delta
                    }
        out = [
            (col, v) for col, d in summaries.items() for v in d
        ]
        yield pd.DataFrame(out, columns=["column", "value"])

    cands = melted.mapInPandas(
        mg_candidates, "column string, value string"
    ).distinct()
    counted = (
        melted.join(F.broadcast(cands), ["column", "value"])
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    order = [F.col("cnt").desc(), F.col("value").desc()]
    return (
        counted.withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("column").orderBy(*order)),
        )
        .filter(F.col("rank") <= k)
        .select(
            "column",
            F.col("rank").cast("int").alias("rank"),
            "value",
            F.col("cnt").cast("long").alias("cnt"),
        )
        .orderBy("column", "rank")
    )


def profile_compare(
    source: DataFrame,
    target: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    threshold_pct: float = 0.0,
    mode: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Distribution-profile validation: compare source vs target
    ``numeric_profile`` per group, one long-format row per (group, metric)
    with the percent difference and a verdict — the validation to run when
    PKs don't align (different grain, sampled copies, post-transform
    tables) but the SHAPE of a numeric column must survive (reference
    analog: column validation min/max/avg/std, query_builder.py:37-115;
    quantile metrics are a BASELINE extension the reference cannot
    express).

    Plan: one single-pass profile aggregate per side (map-side combined;
    ``mode='approx'`` = t-digest sketches for the 100-TB path), a
    full-outer join over O(groups) profile rows, then the combiner's
    explode(array(structs)) melt over |metrics| entries — every exchange
    after the scans carries O(groups) rows.

    ``pct_diff`` = (target - source) / source * 100 (NULL when the source
    value is 0 or either side is missing). A row fails when exactly one
    side is NULL (missing group, or a statistic defined on one side only),
    when |pct_diff| > ``threshold_pct``, or when pct_diff is undefined
    with unequal values (source 0 -> nonzero). Both sides NULL agree
    (e.g. stddev of single-row groups) -> success.
    """
    from .. import consts as _c

    s = numeric_profile(
        source, group_cols, value_col, percentiles, mode, accuracy
    )
    t = numeric_profile(
        target, group_cols, value_col, percentiles, mode, accuracy
    )
    metrics = ["n", "vmin", "vmax", "avg", "std"] + [
        "p_" + str(p).replace("0.", "").ljust(2, "0") for p in percentiles
    ]
    sm = s.select(
        *group_cols,
        *[F.col(m).cast("double").alias(f"s_{m}") for m in metrics],
    )
    tm = t.select(
        *group_cols,
        *[F.col(m).cast("double").alias(f"t_{m}") for m in metrics],
    )
    j = sm.join(tm, group_cols, "full_outer")
    melted = j.select(
        *group_cols,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(m).alias("metric"),
                    F.col(f"s_{m}").alias("source_value"),
                    F.col(f"t_{m}").alias("target_value"),
                )
                for m in metrics
            ])
        ).alias("e"),
    ).select(*group_cols, "e.metric", "e.source_value", "e.target_value")
    pct = F.round(
        (F.col("target_value") - F.col("source_value"))
        / F.nullif(F.col("source_value"), F.lit(0.0)) * 100.0,
        6,
    )
    s_null = F.col("source_value").isNull()
    t_null = F.col("target_value").isNull()
    fail = (
        (s_null & ~t_null)
        | (~s_null & t_null)
        | F.coalesce(F.abs(pct) > F.lit(threshold_pct), F.lit(False))
        | (
            ~s_null & ~t_null & pct.isNull()
            & (F.col("source_value") != F.col("target_value"))
        )
    )
    return melted.select(
        *group_cols,
        "metric",
        "source_value",
        "target_value",
        pct.alias("pct_diff"),
        F.when(fail, F.lit(_c.VALIDATION_STATUS_FAIL))
        .otherwise(F.lit(_c.VALIDATION_STATUS_SUCCESS))
        .alias("validation_status"),
    )


def column_entropy(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column Shannon entropy + uniqueness profile — the information-
    theoretic column analyzers a validation engine ships beside cardinality
    (Deequ's Entropy/Uniqueness analyzers; the reference's aggregate surface
    has no analog, config_manager.py:871).

    entropy = -sum p ln p over the NON-NULL value distribution, computed
    without a per-column total join via the identity
    H = ln(N) - sum(n_i * ln n_i) / N. Plan: one map-side melt (the
    categorical_profile shape), groupBy (column, value) count (shuffle
    carries one row per distinct value, partial-agg'd map-side), then a
    groupBy(column) fold — O(distinct values) ever crosses an exchange.

    Output per column: n_nonnull, n_distinct, entropy (nats),
    norm_entropy (entropy / ln n_distinct; 0 when a single value),
    uniqueness_ratio (n_distinct / n_nonnull). 6dp-rounded for
    cross-engine float stability. NULLs are excluded (report null counts
    via categorical_profile).
    """
    counts = (
        _melt_to_column_value(df, columns)
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n = F.sum("n")
    h = F.log(n) - F.sum(F.col("n") * F.log("n")) / n
    d = F.count(F.lit(1))
    # + 0.0 after ROUND: the ln(N) - sum(n ln n)/N identity can land an
    # epsilon below zero when one value holds all mass, and ROUND keeps the
    # IEEE sign (-0.0) — adding +0.0 canonicalizes it so a value-hash
    # comparison against the oracle (which does the same) can't diverge on
    # the zero's sign (caught at sf1, round 4).
    return (
        counts.groupBy("column")
        .agg(
            n.alias("n_nonnull"),
            d.alias("n_distinct"),
            (F.round(h, 6) + F.lit(0.0)).alias("entropy"),
            (
                F.round(
                    F.when(d > 1, h / F.log(d.cast("double"))).otherwise(0.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("norm_entropy"),
            F.round(d / n, 6).alias("uniqueness_ratio"),
        )
        .orderBy("column")
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information between two categorical columns — detects
    dependent/redundant columns (Deequ MutualInformation analog). Rows
    with a NULL on either side are excluded.

    MI = sum_ab p(a,b) ln( p(a,b) / (p(a) p(b)) ), assembled from ONE
    groupBy(a, b) count (the only O(rows) pass; map-side combined) whose
    result is O(|A| x |B|) — marginals re-aggregate FROM the joint counts
    and broadcast back, so nothing row-scale is touched twice. Normalized
    MI divides by min(H(a), H(b)) (1.0 = one column determines the other;
    0 = independent), with 0/0 -> 0 for constant columns.

    Output: one row (col_a, col_b, n, mi, nmi), 6dp-rounded.
    """
    joint = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(
            F.col(col_a).cast("string").alias("a"),
            F.col(col_b).cast("string").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("nab"))
    )
    joint = joint.persist()
    try:
        ma = joint.groupBy("a").agg(F.sum("nab").alias("na"))
        mb = joint.groupBy("b").agg(F.sum("nab").alias("nb"))
        tot = joint.agg(
            F.sum("nab").alias("n"),
            (
                F.log(F.sum("nab"))
                - F.sum(F.col("nab") * F.log("nab")) / F.sum("nab")
            ).alias("hab"),
        )
        enriched = (
            joint.join(F.broadcast(ma), "a")
            .join(F.broadcast(mb), "b")
            .crossJoin(F.broadcast(tot))
        )
        # per-cell contribution: (nab/N) * ln(nab * N / (na * nb))
        contrib = (F.col("nab") / F.col("n")) * F.log(
            F.col("nab") * F.col("n") / (F.col("na") * F.col("nb"))
        )
        # H(a), H(b) from the same enriched frame: each (a, b) cell carries
        # its marginal, so sum over DISTINCT a of na*ln(na) needs the
        # marginal tables, not the joint — aggregate them separately.
        ha = ma.agg(
            (F.log(F.sum("na")) - F.sum(F.col("na") * F.log("na")) / F.sum("na"))
            .alias("ha")
        )
        hb = mb.agg(
            (F.log(F.sum("nb")) - F.sum(F.col("nb") * F.log("nb")) / F.sum("nb"))
            .alias("hb")
        )
        out = (
            enriched.groupBy("n")
            .agg(F.sum(contrib).alias("mi"))
            .crossJoin(F.broadcast(ha))
            .crossJoin(F.broadcast(hb))
            .select(
                F.lit(col_a).alias("col_a"),
                F.lit(col_b).alias("col_b"),
                F.col("n"),
                F.round("mi", 6).alias("mi"),
                F.round(
                    F.when(
                        F.least("ha", "hb") > 1e-12,
                        F.col("mi") / F.least("ha", "hb"),
                    ).otherwise(0.0),
                    6,
                ).alias("nmi"),
            )
        )
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        joint.unpersist()


def numeric_corr_matrix(df: DataFrame, columns: list[str]) -> DataFrame:
    """Pairwise Pearson correlation over the selected numeric columns in
    ONE aggregate pass (Deequ Correlation analog; the reference's aggregate
    surface stops at per-column stats). All C(n,2) `corr` aggregates share
    a single scan + partial-agg — the exchange carries one partial-moment
    row per map partition, never data. Rows with a NULL on either side of
    a pair are excluded pairwise (Spark/DuckDB corr semantics agree).

    Output: (col_a, col_b, corr) long format, col_a < col_b, 6dp-rounded,
    ordered — NULL corr when either side is constant or a pair has < 2
    complete rows.
    """
    pairs = [
        (a, b)
        for i, a in enumerate(columns)
        for b in columns[i + 1:]
    ]
    if not pairs:
        raise ValueError("need at least two columns")

    def _corr(a: str, b: str) -> Column:
        # pairwise deletion: mask each side on the OTHER being non-null, so
        # covar/stddev all see exactly the complete pairs; try_divide keeps
        # a constant column (zero stddev) NULL instead of raising under
        # ANSI mode (built-in corr divides by zero there).
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        av = F.when(both, F.col(a).cast("double"))
        bv = F.when(both, F.col(b).cast("double"))
        # + 0.0 normalizes IEEE negative zero: a sub-half-ulp-of-rounding
        # negative correlation rounds to -0.0 in one engine and +0.0 in
        # the other depending on each engine's accumulation order — a
        # pandas value-hash mismatch on numerically-equal results
        # (observed at sf1 on near-independent columns).
        return F.round(
            F.try_divide(
                F.covar_samp(av, bv),
                F.stddev_samp(av) * F.stddev_samp(bv),
            ),
            6,
        ) + F.lit(0.0)

    wide = df.agg(
        *[_corr(a, b).alias(f"__c_{i}") for i, (a, b) in enumerate(pairs)]
    )
    melted = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.col(f"__c_{i}").alias("corr"),
                    )
                    for i, (a, b) in enumerate(pairs)
                ]
            )
        ).alias("e")
    ).select("e.col_a", "e.col_b", "e.corr")
    return melted.orderBy("col_a", "col_b")


def categorical_compare(
    source: DataFrame,
    target: DataFrame,
    columns: list[str],
    threshold_pct: float = 0.0,
) -> DataFrame:
    """Source-vs-target comparison of the CATEGORICAL profile — the
    companion to ``profile_compare`` (numeric shapes) for string columns:
    per column, n_distinct / n_null / modal value / modal count must agree
    between the two tables within ``threshold_pct``.

    Plan: one ``categorical_profile`` pass per side (two-level exact
    aggregate, O(distinct values) through the exchanges), a full-outer join
    over O(columns) profile rows, then an explode melt to one verdict row
    per (column, metric). Numeric metrics carry pct_diff; ``top_value``
    compares by equality (pct_diff NULL). A row fails on one-sided NULL,
    |pct_diff| > threshold, or unequal modal values.

    Output: (column, metric, source_value, target_value, pct_diff,
    validation_status) — values rendered as strings (mixed metric types),
    like the reference's combiner report (consts.py value columns).
    """
    from .. import consts as _c

    s = categorical_profile(source, columns)
    t = categorical_profile(target, columns)
    j = s.alias("s").join(
        t.alias("t"), F.col("s.column") == F.col("t.column"), "full_outer"
    ).select(
        F.coalesce(F.col("s.column"), F.col("t.column")).alias("column"),
        *[
            F.col(f"s.{m}").alias(f"s_{m}")
            for m in ("n_distinct", "n_null", "top_value", "top_count")
        ],
        *[
            F.col(f"t.{m}").alias(f"t_{m}")
            for m in ("n_distinct", "n_null", "top_value", "top_count")
        ],
    )

    def _num_row(metric: str):
        sv, tv = F.col(f"s_{metric}").cast("double"), F.col(
            f"t_{metric}"
        ).cast("double")
        pct = F.when(
            sv.isNotNull() & tv.isNotNull() & (sv != 0),
            F.round((tv - sv) / sv * 100.0, 6),
        )
        ok = (
            (sv.isNull() & tv.isNull())
            | (
                sv.isNotNull()
                & tv.isNotNull()
                & (
                    F.when(sv != 0, F.abs((tv - sv) / sv * 100.0)
                           <= F.lit(threshold_pct))
                    .otherwise(tv == 0)
                )
            )
        )
        return F.struct(
            F.lit(metric).alias("metric"),
            F.col(f"s_{metric}").cast("string").alias("source_value"),
            F.col(f"t_{metric}").cast("string").alias("target_value"),
            pct.alias("pct_diff"),
            F.when(ok, F.lit(_c.VALIDATION_STATUS_SUCCESS))
            .otherwise(F.lit(_c.VALIDATION_STATUS_FAIL))
            .alias("validation_status"),
        )

    top_ok = (
        F.col("s_top_value").isNull() & F.col("t_top_value").isNull()
    ) | (F.col("s_top_value") == F.col("t_top_value"))
    top_row = F.struct(
        F.lit("top_value").alias("metric"),
        F.col("s_top_value").alias("source_value"),
        F.col("t_top_value").alias("target_value"),
        F.lit(None).cast("double").alias("pct_diff"),
        F.when(top_ok, F.lit(_c.VALIDATION_STATUS_SUCCESS))
        .otherwise(F.lit(_c.VALIDATION_STATUS_FAIL))
        .alias("validation_status"),
    )
    melted = j.select(
        "column",
        F.explode(
            F.array(
                _num_row("n_distinct"),
                _num_row("n_null"),
                top_row,
                _num_row("top_count"),
            )
        ).alias("e"),
    ).select("column", "e.*")
    return melted.orderBy("column", "metric")


def novel_categories(
    source: DataFrame, target: DataFrame, columns: list[str]
) -> DataFrame:
    """Value-set containment validation: values the TARGET carries that the
    source has never seen, per column — the "new enum value appeared"
    drift check (a novel role/tool/lang in an ingest batch usually means an
    upstream schema or encoder change; n_distinct equality can miss it when
    a value is simultaneously dropped).

    Plan: both sides melt map-side to (column, value) and pre-aggregate
    (exchange carries one row per distinct value per side), then an
    O(distinct) left-anti join target-vs-source. Output: (column, value,
    n_rows) for each novel value, with its target row count, ordered.
    """
    s = (
        _melt_to_column_value(source, columns)
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select("column", "value")
    )
    t = (
        _melt_to_column_value(target, columns)
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return t.join(s, ["column", "value"], "left_anti").orderBy(
        "column", "value"
    )


def fd_violations(
    df: DataFrame,
    determinant: str,
    dependent: str,
    null_token: str = "<NULL>",
) -> DataFrame:
    """Functional-dependency check: determinant values for which the
    dependent column is NOT constant — "does A determine B" (candidate-key /
    denormalization-consistency validation; the single-table cousin of the
    reference's grouped validations, and what a uniqueness check on (A, B)
    cannot answer because it counts pairs, not conflicts per A).

    A NULL dependent is a real conflicting value (a key mapping to both
    'x' and NULL violates the dependency), so it participates as
    ``null_token``; rows with a NULL determinant are excluded (no key to
    hold the dependency on).

    ONE groupBy(determinant) with a count-distinct: Spark plans the
    distinct via Expand + two-phase hash aggregate — map-side partial
    dedup means the exchange carries one row per live (det, dep) pair,
    never O(rows). Output, one row per violating determinant value:
      (det_value, n_rows, n_distinct_dep, dep_min, dep_max)
    dep_min/dep_max bound the conflict set for forensics without
    collecting it.
    """
    dep = F.coalesce(F.col(dependent).cast("string"), F.lit(null_token))
    return (
        df.filter(F.col(determinant).isNotNull())
        .groupBy(F.col(determinant).cast("string").alias("det_value"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(dep).alias("n_distinct_dep"),
            F.min(dep).alias("dep_min"),
            F.max(dep).alias("dep_max"),
        )
        .filter(F.col("n_distinct_dep") > 1)
        .orderBy("det_value")
    )


def _melt_numeric(df: DataFrame, columns: list[str]) -> DataFrame:
    """Map-side melt of numeric columns to (column, v double), NULLs
    dropped — the numeric twin of _melt_to_column_value."""
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(c).cast("double").alias("v"),
                        )
                        for c in columns
                    ]
                )
            ).alias("cv")
        )
        .select("cv.column", "cv.v")
        .filter(F.col("v").isNotNull())
    )


def robust_outlier_profile(
    df: DataFrame, columns: list[str], k: float = 5.0
) -> DataFrame:
    """Median/MAD robust-outlier profile per numeric column: the
    mean/stddev z-score family (numeric_profile, metric_anomalies) breaks
    down exactly when outliers are present — the outliers inflate the
    stddev that is supposed to flag them. Median and MAD (median absolute
    deviation) have a 50% breakdown point; a value is flagged when
    |x - median| > k * 1.4826 * MAD (1.4826 scales MAD to sigma-equivalent
    under normality; k=5 is a conservative production gate).

    Three exact-percentile aggregate passes over the map-side melt
    (median -> MAD -> flag counts), each reduced per column and broadcast
    back — nothing row-scale crosses an exchange twice in the same pass,
    and the two joins are broadcasts of O(n_columns) rows. Exact
    ``percentile`` keeps the DuckDB oracle (``quantile_cont``/``median``,
    same interpolation) cell-identical; at 100 TB swap approx_percentile
    into the same shape (documented divergence, identical schema).

    Output per column:
      (column, n_nonnull, median 6dp, mad 6dp, n_outliers, outlier_frac 6dp)
    """
    m = _melt_numeric(df, columns)
    med = m.groupBy("column").agg(
        F.percentile("v", F.lit(0.5)).alias("med")
    )
    m2 = m.join(F.broadcast(med), "column")
    mad = m2.groupBy("column").agg(
        F.percentile(F.abs(F.col("v") - F.col("med")), F.lit(0.5)).alias(
            "mad"
        )
    )
    m3 = m2.join(F.broadcast(mad), "column")
    is_out = (
        F.abs(F.col("v") - F.col("med"))
        > F.lit(k) * F.lit(1.4826) * F.col("mad")
    ).cast("long")
    return (
        m3.groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_nonnull"),
            F.round(F.max("med"), 6).alias("median"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(is_out).alias("n_outliers"),
            F.round(F.sum(is_out) / F.count(F.lit(1)), 6).alias(
                "outlier_frac"
            ),
        )
        .orderBy("column")
    )


def benford_check(df: DataFrame, value_col: Column) -> DataFrame:
    """First-significant-digit (Benford) conformance check on a positive
    numeric column — the classic fabricated/corrupted-batch detector for
    organically-grown magnitudes (amounts, durations, sizes): natural
    multi-decade data follows P(d) = log10(1 + 1/d); truncation, unit
    mix-ups, or synthetic fill shift the digit histogram sharply.

    The digit is extracted ENGINE-PORTABLY: the value is cast to
    DECIMAL(20, 2) (exact decimal printing — never the double's
    binary-float repr, whose textual form differs across engines near
    power-of-10 boundaries) and the first [1-9] of that string is the
    first significant digit. Rows with NULL or |value| < 0.005 (no
    significant digit at 2 decimals) are excluded.

    Plan: map-only digit projection -> ONE 9-key groupBy (map-side
    combined; the exchange carries <= 9 rows per task) -> window total
    over the 9-row frame (ONE input scan total).
    chi2 = N * sum (obs_frac - exp_frac)^2 / exp_frac over OBSERVED digits
    (every digit is observed on any non-degenerate sample; an absent digit
    simply contributes no term, identically in the oracle).

    Output, one row per observed digit 1..9:
      (digit, n, observed_frac 6dp, expected_frac 6dp, chi2 6dp)
    ``chi2`` is the statistic over all digits, repeated per row.
    """
    from pyspark.sql import Window

    s = F.abs(value_col).cast("decimal(20,2)").cast("string")
    digit = F.regexp_extract(s, "[1-9]", 0)
    rows = (
        df.select(digit.alias("d"))
        .filter(F.col("d") != "")
        .groupBy(F.col("d").cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # total as a window sum over the 9-row frame — an agg + crossJoin
    # would re-execute the histogram subtree and scan the input twice.
    w = Window.partitionBy(F.lit(1))
    with_tot = rows.select(
        "digit", "n", F.sum("n").over(w).alias("tot")
    )
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    obs = F.col("n") / F.col("tot")
    term = F.col("tot") * (obs - expected) * (obs - expected) / expected
    return (
        with_tot.select(
            "digit",
            "n",
            F.round(obs, 6).alias("observed_frac"),
            F.round(expected, 6).alias("expected_frac"),
            F.round(F.sum(term).over(w), 6).alias("chi2"),
        )
        .orderBy("digit")
    )


_TYPE_PATTERNS = {
    # anchored, RE2/Java-portable (no lookarounds) — identical semantics
    # in Spark rlike and DuckDB regexp_matches
    "frac_int": r"^[+-]?[0-9]+$",
    "frac_double": r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$",
    "frac_date": r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
    "frac_timestamp": r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}:[0-9]{2}",
    "frac_bool": r"^([Tt][Rr][Uu][Ee]|[Ff][Aa][Ll][Ss][Ee])$",
}


def type_conformance(df: DataFrame, columns: list[str]) -> DataFrame:
    """Inferred-type profile per string column: what fraction of the
    NON-NULL values parses as int / double / date / timestamp / bool,
    plus the empty-string fraction — the type-inference analyzer
    (TFX schema inference / Deequ type detection analog; the reference
    validates declared schemas, schema_validation.py — this discovers
    what a string column actually HOLDS, the step before a cast-based
    migration).

    All checks are anchored portable regexes (int conforms to double
    too, by design — the fractions are independent signals, not a
    partition). ONE map-side melt + ONE aggregate pass: N columns x 6
    signals cost a single scan; every avg is a conditional aggregate
    (the expectations-engine discipline). Output per column:
      (column, n_nonnull, frac_int, frac_double, frac_date,
       frac_timestamp, frac_bool, frac_empty)   — fractions 6dp.
    """
    m = _melt_to_column_value(df, columns)
    aggs = [F.count(F.lit(1)).alias("n_nonnull")]
    for name, pat in _TYPE_PATTERNS.items():
        aggs.append(
            F.round(
                F.avg(F.col("value").rlike(pat).cast("double")), 6
            ).alias(name)
        )
    aggs.append(
        F.round(
            F.avg((F.col("value") == "").cast("double")), 6
        ).alias("frac_empty")
    )
    return m.groupBy("column").agg(*aggs).orderBy("column")


def string_length_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column value-length profile (Deequ MinLength/MaxLength
    analyzers, plus avg and exact median): truncation, padding, and
    concatenation bugs show up as length-distribution shifts before any
    content check fires. ONE map-side melt + one aggregate pass; the
    exact percentile buffers per-column length lists (numeric_profile's
    documented caveat; approx_percentile is the extreme-cardinality
    swap). NULLs excluded; empty strings count with length 0.

    Output per column:
      (column, n_nonnull, min_len, max_len, avg_len 6dp, p50_len)
    """
    m = _melt_to_column_value(df, columns).select(
        "column", F.length("value").alias("l")
    )
    return (
        m.groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_nonnull"),
            F.min("l").cast("long").alias("min_len"),
            F.max("l").cast("long").alias("max_len"),
            F.round(F.avg("l"), 6).alias("avg_len"),
            F.percentile("l", F.lit(0.5)).alias("p50_len"),
        )
        .orderBy("column")
    )


def grouped_null_rates(
    df: DataFrame, group_col: str, columns: list[str]
) -> DataFrame:
    """Completeness BY SEGMENT: null rate of each column within each
    group — the slicer that turns "0.4% of tool is null" into "tool is
    null for every row of channel ch3" (a failing upstream producer is
    almost always segment-shaped; the global null rate dilutes it).

    ONE groupBy(group) aggregate computes every column's null count
    (conditional sums, expectations-engine discipline); the wide result
    (O(groups) rows) melts to long format with the combiner's
    explode(array(structs)) — zero joins, one shuffle total.

    Output: (group, column, n_rows, n_null, null_frac 6dp), ordered.
    """
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}")
        for c in columns
    ]
    wide = df.groupBy(
        F.col(group_col).cast("string").alias("group")
    ).agg(*aggs)
    melted = wide.select(
        "group",
        "__n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__null_{c}").alias("n_null"),
                    )
                    for c in columns
                ]
            )
        ).alias("e"),
    )
    return melted.select(
        "group",
        F.col("e.column").alias("column"),
        F.col("__n").alias("n_rows"),
        F.col("e.n_null").alias("n_null"),
        F.round(F.col("e.n_null") / F.col("__n"), 6).alias("null_frac"),
    ).orderBy("group", "column")


def cohens_kappa(
    src: DataFrame,
    tgt: DataFrame,
    pk_cols: list[str],
    label_col: str | list[str],
) -> DataFrame:
    """Chance-corrected label agreement (Cohen's kappa) between the same
    label column(s) in two tables, paired by primary key — the
    inter-annotator-agreement statistic applied to source-vs-target
    validation. A raw match rate of 0.9 is meaningless when one class
    covers 90% of rows; kappa = (po - pe) / (1 - pe) subtracts the
    agreement two independent annotators with these marginals would reach
    by chance. Landis-Koch reading: <0 poor, 0.41-0.60 moderate, >0.80
    near-perfect.

    NULL labels are real disagreement material (a label wiped by a bad
    ETL step must not vanish from the statistic), so NULL forms its own
    class — carried as a struct(is_null, value) key rather than a string
    sentinel, so no genuine label value can collide with the NULL class
    (ADVICE r3). Caveat shared with the DuckDB oracle: labels are compared
    by their string form (cast('string')), so distinct non-string values
    with equal renderings (e.g. int 1 vs string '1' across tables) merge.

    Plan: ONE inner PK join (shuffle-free when both tables are bucketed
    on the PK) no matter how many labels — multiple labels melt through
    the join as an explode of (label, a, b) structs, so each label costs
    an O(k) confusion slice, never a second O(rows) join (measured 3.58
    -> 1.79 s for 2 labels at 1M turns). Then ONE groupBy(label, a, b)
    count — the only O(rows) aggregate — to the persisted per-label
    |classes|^2 confusion frame; the diagonal/total fold and the
    union-melt marginal fold for pe = sum_c pa_c * pb_c are label-keyed
    aggregations over that k-row frame.

    Output, one row per label (ordered by label): (label, n_pairs,
    observed_agreement, expected_agreement, kappa), 6dp-rounded. kappa
    -> 1.0 when pe = 1 (both sides constant on one class: agreement is
    exact and chance correction is degenerate).
    """
    labels = [label_col] if isinstance(label_col, str) else list(label_col)

    def _lab(side: str, c: str):
        v = F.col(f"{side}.{c}").cast("string")
        # struct key: NULL is its own class, collision-free with any real
        # string value (struct equality is null-safe on the value field
        # because is_null disambiguates; value coalesced for group keys)
        return F.struct(
            v.isNull().alias("is_null"),
            F.coalesce(v, F.lit("")).alias("value"),
        )

    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("label"),
                    _lab("s", c).alias("a"),
                    _lab("t", c).alias("b"),
                )
                for c in labels
            ]
        )
    )
    joint = (
        src.alias("s")
        .join(tgt.alias("t"), pk_cols, "inner")
        .select(pairs.alias("p"))
        .groupBy(
            F.col("p.label").alias("label"),
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("nab"))
    )
    joint = joint.persist()
    try:
        tot = joint.groupBy("label").agg(
            F.sum("nab").alias("n"),
            F.sum(F.when(F.col("a") == F.col("b"), F.col("nab"))
                  .otherwise(F.lit(0))).alias("n_agree"),
        )
        marg = (
            joint.select("label", F.col("a").alias("c"),
                         F.col("nab").alias("na"),
                         F.lit(0).cast("long").alias("nb"))
            .unionByName(
                joint.select("label", F.col("b").alias("c"),
                             F.lit(0).cast("long").alias("na"),
                             F.col("nab").alias("nb"))
            )
            .groupBy("label", "c")
            .agg(F.sum("na").alias("na"), F.sum("nb").alias("nb"))
        )
        pe = (
            marg.join(F.broadcast(tot), "label")
            .groupBy("label")
            .agg(
                F.sum(
                    (F.col("na") / F.col("n")) * (F.col("nb") / F.col("n"))
                ).alias("pe")
            )
        )
        out = (
            tot.join(F.broadcast(pe), "label")
            .select(
                "label",
                F.col("n").cast("long").alias("n_pairs"),
                F.round(F.col("n_agree") / F.col("n"), 6).alias(
                    "observed_agreement"
                ),
                F.round("pe", 6).alias("expected_agreement"),
                F.round(
                    F.when(
                        (1 - F.col("pe")) > 1e-12,
                        (F.col("n_agree") / F.col("n") - F.col("pe"))
                        / (1 - F.col("pe")),
                    ).otherwise(F.lit(1.0)),
                    6,
                ).alias("kappa"),
            )
            .orderBy("label")
        )
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        joint.unpersist()
