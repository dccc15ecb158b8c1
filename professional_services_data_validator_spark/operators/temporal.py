"""Temporal operators: gap-based sessionization and as-of joins.

No reference analog (the reference validates static tables); BASELINE
training-pipeline extensions — agent-transcript and event-log pipelines
need both: sessionization turns a raw event stream into conversation-like
units, and the as-of join ("most recent right row at or before this left
row") attaches slowly-changing context (model version, config snapshot,
price) to events. Spark has no native ASOF JOIN (DuckDB/Pandas do); the
standard Spark-first construction is a tagged UNION + one per-key ordered
window, which is what ``asof_join`` implements:

- one shuffle keyed on the ``by`` column (both inputs together),
- per key, sort by (ts, side-tag, tiebreak) with right rows BEFORE left
  rows at equal ts (inclusive as-of), and
- ``last(right_payload, ignorenulls)`` over the unbounded-preceding frame
  carries the latest right row forward to each left row.

That is O(n log n) per key — the same cost class as any windowed lag —
and never materializes the O(left x right) inequality join a naive
``l.ts >= r.ts`` range join would. Determinism on duplicate right
timestamps: the tiebreak column makes "latest" well-defined (max
(ts, tiebreak)), which the DuckDB oracle replays exactly (arg_max), so
results are hash-comparable cross-engine.

At 100 TB: the window state is one row per key (the carried payload), and
keys (users / conversations) shard across the cluster; skewed hot keys are
the same AQE-skew story as every other per-key window in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key gap sessionization: a new session starts when the time since
    the previous event exceeds ``gap_seconds``. Returns the per-SESSION
    summary (the per-event assignment is the intermediate, exposed by the
    summary's deterministic definition):

      (key, session_idx 1-based, n_events, start_epoch, end_epoch)

    ONE shuffle on the key; the lag and the running session counter are two
    frames over the same window partitioning, so no second exchange. The
    session boundary predicate uses floor-epoch seconds — engine-portable
    integer arithmetic (the house timestamp discipline).
    """
    tb = [F.col(order_tiebreak)] if order_tiebreak else []
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), *tb)
    epoch = F.floor(
        F.col(ts_col).cast("timestamp").cast("double")
    ).cast("long")
    prev = F.lag(epoch).over(w)
    is_new = F.when(
        prev.isNull() | ((epoch - prev) > gap_seconds), 1
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # group by the ORIGINAL key column (not an alias): Catalyst then sees
    # the window's hashpartitioning(key_col) satisfies the re-aggregation's
    # clustering and plans ONE exchange total (aliasing first inserted a
    # second exchange on (key, session_idx))
    assigned = df.select(
        F.col(key_col),
        epoch.alias("__e"),
        F.sum(is_new).over(wcum).alias("session_idx"),
    )
    return (
        assigned.groupBy(key_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("__e").alias("start_epoch"),
            F.max("__e").alias("end_epoch"),
        )
        .select(
            F.col(key_col).alias("key"),
            F.col("session_idx").cast("long").alias("session_idx"),
            "n_events",
            "start_epoch",
            "end_epoch",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    left_cols: list[str],
    right_cols: list[str],
    tiebreak: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward inclusive as-of join: for every left row, the right row of
    the same ``by`` key with the greatest (ts, tiebreak) such that
    right.ts <= left.ts; NULL payload when no right row precedes.

    Output: by, <left_cols>, left ts as ``ts_epoch``, and each requested
    right column as ``{prefix}{col}`` plus ``{prefix}ts_epoch``.
    ``tiebreak`` must be a right column that makes ordering total (e.g. a
    PK) — that is what makes the result deterministic and oracle-able.
    """
    payload = F.struct(
        F.floor(F.col(ts).cast("timestamp").cast("double"))
        .cast("long")
        .alias("ts_epoch"),
        F.col(tiebreak).alias("__tb"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(by).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        payload.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left_cols],
    )
    l = left.select(
        F.col(by).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "__asof", F.last("__p", ignorenulls=True).over(w)
    )
    out_cols = [
        F.col("__k").alias(by),
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        F.floor(F.col("__ts").cast("timestamp").cast("double"))
        .cast("long")
        .alias("ts_epoch"),
        F.col("__asof.ts_epoch").alias(f"{prefix}ts_epoch"),
        *[F.col(f"__asof.{c}").alias(f"{prefix}{c}") for c in right_cols],
    ]
    return carried.filter(F.col("__side") == 1).select(*out_cols)


def metric_anomalies(
    history: DataFrame,
    key_cols: list[str],
    ts_col: str,
    metric_col: str,
    trailing_n: int = 7,
    min_history: int = 3,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection over a per-key metric
    time series — the temporal complement to the two-sample drift family
    (KS/PSI/chi2/JSD compare two snapshots; this compares each observation
    to ITS OWN recent history). Typical inputs: per-day row counts,
    per-partition violation rates, or any metric series from the lineage
    table (lineage.py:36 stores metrics per partition per run).

    For each (key, ts) observation: mean and sample-std of the up-to-
    ``trailing_n`` STRICTLY PRIOR observations (rowsBetween(-n, -1) under
    ts order — the current value never contaminates its own baseline),
    z = (x - mean) / std, anomaly when |z| >= ``z_thresh``. Observations
    with fewer than ``min_history`` priors or zero baseline variance emit
    NULL z and are never flagged (cold starts and constant series are not
    anomalies). round(6) on z keeps results engine-portable.

    Scale shape: ONE shuffle keyed on the metric keys; each key's window
    is an independent partition sorted by ts (a key = one metric series —
    thousands of rows at most, never the corpus). No global window, no
    collect. Output: key_cols + (ts, value, base_mean, base_std, z,
    is_anomaly), ordered by (keys, ts).
    """
    x = F.col(metric_col).cast("double")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(-trailing_n, -1)
    )
    base = history.select(
        *key_cols,
        F.col(ts_col).alias("ts"),
        x.alias("value"),
        F.avg(x).over(w).alias("base_mean"),
        F.stddev_samp(x).over(w).alias("base_std"),
        F.count(x).over(w).alias("__n_prior"),
    )
    usable = (F.col("__n_prior") >= min_history) & (F.col("base_std") > 0)
    z = F.when(
        usable,
        F.round((F.col("value") - F.col("base_mean")) / F.col("base_std"), 6),
    )
    return (
        base.select(
            *key_cols,
            "ts",
            "value",
            F.round("base_mean", 6).alias("base_mean"),
            F.round("base_std", 6).alias("base_std"),
            z.alias("z"),
            F.coalesce(
                F.abs(z) >= F.lit(float(z_thresh)), F.lit(False)
            ).alias("is_anomaly"),
        )
        .orderBy(*key_cols, "ts")
    )


def calendar_completeness(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    expected_start=None,
    expected_end=None,
) -> DataFrame:
    """Date-coverage validation: which calendar days in the expected range
    carry NO rows (a day-partitioned ingest that silently dropped a
    partition is the classic failure this catches; the reference can only
    see it as a count mismatch after the fact).

    Plan: distinct observed days per group (one map-side-combined
    aggregate — the exchange carries one row per (group, day)), the
    expected calendar generated with `sequence(min, max)` + explode from
    the observed bounds (or explicit ``expected_start``/``expected_end``),
    then a left-anti join of calendar vs observed — both sides O(days),
    nothing row-scale crosses a second exchange.

    Output: one row per (group..., missing day), ordered. Empty output =
    complete coverage. With ``group_cols``, each group's expected range
    defaults to ITS OWN [min, max] span.
    """
    gc = list(group_cols or [])
    day = F.col(ts_col).cast("date").alias("day")
    observed = df.select(*gc, day).groupBy(*gc, "day").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    observed = observed.persist()
    try:
        lo = (
            F.lit(expected_start).cast("date")
            if expected_start is not None
            else F.min("day")
        )
        hi = (
            F.lit(expected_end).cast("date")
            if expected_end is not None
            else F.max("day")
        )
        bounds = observed.groupBy(*gc).agg(
            lo.alias("__lo"), hi.alias("__hi")
        )
        calendar = bounds.select(
            *gc,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"))
            ).alias("day"),
        )
        missing = calendar.join(
            observed.select(*gc, "day"), gc + ["day"], "left_anti"
        ).orderBy(*gc, "day")
        return missing.localCheckpoint(eager=True)
    finally:
        observed.unpersist()


def turn_gap_stats(
    df,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    day_col: str | None = None,
    sla_seconds: int = 3600,
):
    """Inter-turn latency profile: per-day statistics of the time gap
    between consecutive turns WITHIN a conversation — the ingestion-health
    twin of conversation_checks' boolean ts_monotonic flag (that check says
    "never decreases"; this one says HOW the cadence is distributed, so SLA
    regressions and clock skew show up as numbers, not just violations).

    Adjacent pairs come from the same lag-free self-join trick as
    conversation_checks: the table joins to itself on
    (key, order+1) — co-partitioned on the conversation key, so with the
    transcript table bucketed by conv_id it is shuffle-free at 100 TB, and
    no per-conversation window sort runs anywhere. Gaps are attributed to
    the day of the LATER turn.

    Output per day (ordered):
      (day, n_gaps, n_negative, n_over_sla, avg_gap_s 6dp,
       p50_gap_s 6dp, p90_gap_s 6dp, max_gap_s 6dp) — all gap columns in
    seconds, computed from exact integer microseconds
    n_negative > 0 means out-of-order timestamps under the stable turn
    ordering (clock skew / replayed events); exact percentiles keep the
    DuckDB oracle cell-identical (approx_percentile is the 100-TB swap).
    """
    from pyspark.sql import functions as F

    prev = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("i"),
        F.col(ts_col).alias("ts_prev"),
    )
    nxt = df.select(
        F.col(key_col).alias("k"),
        (F.col(order_col) - 1).alias("i"),
        F.col(ts_col).alias("ts_next"),
    )
    pairs = prev.join(nxt, ["k", "i"])
    # exact integer microseconds: truncating each timestamp to seconds
    # first would shift individual gaps by up to 1s (engine-dependent
    # rounding); integer micros are engine-exact, seconds are derived
    # once at the end (us / 1e6, both engines the same double division).
    # NTZ timestamps cast through TIMESTAMP under the engine's forced-UTC
    # session (session.py), so the cast is value-preserving.
    gap = (
        F.unix_micros(F.col("ts_next").cast("timestamp"))
        - F.unix_micros(F.col("ts_prev").cast("timestamp"))
    ).alias("gap_us")
    day = F.date_format(
        "ts_next" if day_col is None else day_col, "yyyy-MM-dd"
    ).alias("day")
    us = F.lit(1e6)
    return (
        pairs.select(day, gap)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum((F.col("gap_us") < 0).cast("long")).alias("n_negative"),
            F.sum(
                (F.col("gap_us") > sla_seconds * 1_000_000).cast("long")
            ).alias("n_over_sla"),
            F.round(F.avg("gap_us") / us, 6).alias("avg_gap_s"),
            F.round(F.percentile("gap_us", F.lit(0.5)) / us, 6).alias(
                "p50_gap_s"
            ),
            F.round(F.percentile("gap_us", F.lit(0.9)) / us, 6).alias(
                "p90_gap_s"
            ),
            F.round(F.max("gap_us") / us, 6).alias("max_gap_s"),
        )
        .orderBy("day")
    )


def response_latency(
    df,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
    from_role: str = "user",
    to_role: str = "assistant",
):
    """Role-conditioned response-latency profile: per-day statistics of
    the time between a ``from_role`` turn and the IMMEDIATELY following
    ``to_role`` turn within a conversation — the serving-health view of
    the transcript table (turn_gap_stats profiles every adjacent pair;
    this isolates the user->assistant edge, i.e. how long the assistant
    took to answer).

    Same lag-free self-join plan as turn_gap_stats: the table joins to
    itself on (key, order+1), co-partitioned on the conversation key
    (shuffle-free at 100 TB with the table bucketed by conv_id); only
    pairs matching (from_role -> to_role) survive, so the day aggregate
    sees a role-filtered subset. Latencies are exact integer microseconds
    (engine-exact; see turn_gap_stats) converted to seconds once at the
    end; latency is attributed to the day of the RESPONSE turn.

    Output per day (ordered):
      (day, n_responses, avg_latency_s, p50_latency_s, p95_latency_s,
       max_latency_s) — seconds at 6dp, exact percentiles (approx_percentile
    is the 100-TB swap).
    """
    from pyspark.sql import functions as F

    prev = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("i"),
        F.col(role_col).alias("role_prev"),
        F.col(ts_col).alias("ts_prev"),
    )
    nxt = df.select(
        F.col(key_col).alias("k"),
        (F.col(order_col) - 1).alias("i"),
        F.col(role_col).alias("role_next"),
        F.col(ts_col).alias("ts_next"),
    )
    pairs = prev.join(nxt, ["k", "i"]).filter(
        (F.col("role_prev") == from_role) & (F.col("role_next") == to_role)
    )
    lat = (
        F.unix_micros(F.col("ts_next").cast("timestamp"))
        - F.unix_micros(F.col("ts_prev").cast("timestamp"))
    ).alias("lat_us")
    day = F.date_format("ts_next", "yyyy-MM-dd").alias("day")
    us = F.lit(1e6)
    return (
        pairs.select(day, lat)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_responses"),
            F.round(F.avg("lat_us") / us, 6).alias("avg_latency_s"),
            F.round(F.percentile("lat_us", F.lit(0.5)) / us, 6).alias(
                "p50_latency_s"
            ),
            F.round(F.percentile("lat_us", F.lit(0.95)) / us, 6).alias(
                "p95_latency_s"
            ),
            F.round(F.max("lat_us") / us, 6).alias("max_latency_s"),
        )
        .orderBy("day")
    )


def cusum_changepoint(
    series,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    threshold: float = 1.358,
):
    """CUSUM change-point localization over a per-key metric time series:
    WHERE did the level shift? (metric_anomalies flags WHICH observations
    deviate from their own trailing window; this finds the single most
    likely structural break over the whole series — the
    Pettitt/CUSUM-style complement.)

    For each key: S_i = cumsum(x - mean(x)); the change point is the
    order value maximizing |S_i| and the test statistic is
    max|S_i| / (std * sqrt(n)) — under no-change this is asymptotically
    the Kolmogorov distribution, so 1.358 corresponds to alpha = 0.05.
    Constant series (std = 0) emit NULL stat and never drift.

    Input is an ALREADY-AGGREGATED series (e.g. per-day row counts from
    one groupBy — O(days x keys) rows), so every window here partitions
    by key over series-length frames, never corpus rows. One shuffle
    keyed on the series keys; ties on max|S_i| break to the earliest
    order value.

    Output per key (ordered by keys):
      (keys..., n_points, mean 6dp, cusum_stat 6dp, changepoint,
       drifted boolean).
    """
    from pyspark.sql import Window

    from pyspark.sql import functions as F

    wk = Window.partitionBy(*key_cols)
    wo = wk.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    x = F.col(value_col)
    staged = series.select(
        *key_cols,
        F.col(order_col).alias("__o"),
        F.abs(
            F.sum(x - F.avg(x).over(wk)).over(wo)
        ).alias("__abs_s"),
        F.avg(x).over(wk).alias("__mean"),
        F.stddev_samp(x).over(wk).alias("__std"),
        F.count(F.lit(1)).over(wk).alias("__n"),
    ).withColumn("__max_s", F.max("__abs_s").over(wk))
    stat = F.when(
        F.max("__std") > 0,
        F.max("__max_s") / (F.max("__std") * F.sqrt(F.max("__n"))),
    )
    return (
        staged.groupBy(*key_cols)
        .agg(
            F.max("__n").cast("long").alias("n_points"),
            F.round(F.max("__mean"), 6).alias("mean"),
            F.round(stat, 6).alias("cusum_stat"),
            F.min(
                F.when(F.col("__abs_s") == F.col("__max_s"), F.col("__o"))
            ).alias("changepoint"),
            (F.coalesce(stat > threshold, F.lit(False))).alias("drifted"),
        )
        .orderBy(*key_cols)
    )
