"""Sessionization + as-of join."""

import datetime

from pyspark.sql import functions as F  # noqa: F401

from professional_services_data_validator_spark.operators.temporal import (
    asof_join,
    sessionize,
)


def _ts(m):
    return datetime.datetime(2026, 1, 1, 0, m, 0)


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user a: events at minutes 0, 5, 40 with gap 600s -> sessions
        # {0,5} and {40}; boundary: exactly-gap is NOT a new session
        ("a", 0), ("a", 5), ("a", 40),
        # user b: 0, 10 with gap 600s -> exactly 600s apart stays together
        ("b", 0), ("b", 10),
        ("c", 0),
    ]
    df = spark.createDataFrame(
        [(u, i, _ts(m)) for i, (u, m) in enumerate(rows)],
        "user string, event_id long, ts timestamp",
    )
    out = {
        (r["key"], r["session_idx"]): r
        for r in sessionize(
            df, "user", "ts", gap_seconds=600, order_tiebreak="event_id"
        ).collect()
    }
    assert out[("a", 1)]["n_events"] == 2
    assert out[("a", 2)]["n_events"] == 1
    assert ("b", 2) not in out and out[("b", 1)]["n_events"] == 2
    assert out[("c", 1)]["n_events"] == 1
    # epochs
    assert out[("a", 1)]["end_epoch"] - out[("a", 1)]["start_epoch"] == 300


def test_sessionize_one_exchange(spark):
    df = spark.createDataFrame(
        [("a", 1, _ts(0))], "user string, event_id long, ts timestamp"
    )
    plan = sessionize(df, "user", "ts", 600)._jdf.queryExecution() \
        .executedPlan().toString()
    # lag + cumsum + the per-(key,session) re-agg all share the user-keyed
    # partitioning: exactly one exchange
    assert plan.count("Exchange") == 1


def test_asof_backward_inclusive_and_ties(spark):
    left = spark.createDataFrame(
        [("u", 10, _ts(10)), ("u", 11, _ts(5)), ("u", 12, _ts(1))],
        "user string, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", 1, _ts(5), 1.0),   # equal-ts -> inclusive match for l@5
            ("u", 2, _ts(5), 2.0),   # tie on ts -> larger event_id wins
            ("u", 3, _ts(8), 3.0),
            ("v", 4, _ts(0), 9.0),   # other key never leaks
        ],
        "user string, event_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, by="user", ts="ts",
            left_cols=["event_id"], right_cols=["event_id", "value"],
            tiebreak="event_id",
        ).collect()
    }
    assert out[10]["asof_event_id"] == 3          # latest before minute 10
    assert out[11]["asof_event_id"] == 2          # inclusive + tiebreak max
    assert out[11]["asof_value"] == 2.0
    assert out[12]["asof_event_id"] is None       # nothing precedes minute 1
    assert out[12]["asof_value"] is None


def test_asof_no_range_join_in_plan(spark):
    left = spark.createDataFrame(
        [("u", 1, _ts(1))], "user string, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", 2, _ts(0), 1.0)],
        "user string, event_id long, ts timestamp, value double",
    )
    plan = asof_join(
        left, right, by="user", ts="ts",
        left_cols=["event_id"], right_cols=["value"], tiebreak="event_id",
    )._jdf.queryExecution().executedPlan().toString()
    # the tagged-union + window construction: no join node at all, so the
    # O(left x right) inequality join can never appear
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_metric_anomalies_flags_spike_only(spark):
    from professional_services_data_validator_spark.operators.temporal import (
        metric_anomalies,
    )

    # steady series 100±1 with one 10x spike at t=8
    vals = [100, 101, 99, 100, 101, 99, 100, 101, 1000, 100]
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts int, m long")
    out = metric_anomalies(
        df, ["key"], "ts", "m", trailing_n=7, min_history=3, z_thresh=3.0
    ).collect()
    by_ts = {r["ts"]: r for r in out}
    assert by_ts[8]["is_anomaly"] is True and by_ts[8]["z"] > 3
    # every other observation is within noise
    assert all(not by_ts[t]["is_anomaly"] for t in range(10) if t != 8)
    # the spike sits in t=9's trailing window -> inflated std, not flagged
    assert by_ts[9]["is_anomaly"] is False


def test_metric_anomalies_cold_start_and_zero_variance(spark):
    from professional_services_data_validator_spark.operators.temporal import (
        metric_anomalies,
    )

    rows = [("a", i, 5) for i in range(6)] + [("a", 6, 50)]
    df = spark.createDataFrame(rows, "key string, ts int, m long")
    out = {r["ts"]: r for r in metric_anomalies(
        df, ["key"], "ts", "m", min_history=3
    ).collect()}
    # fewer than min_history priors: NULL z, never flagged
    for t in (0, 1, 2, 3):
        assert out[t]["z"] is None and out[t]["is_anomaly"] is False
    # constant history -> zero variance -> guarded NULL z even for the jump
    assert out[6]["base_std"] == 0.0
    assert out[6]["z"] is None and out[6]["is_anomaly"] is False


def test_metric_anomalies_strictly_prior_baseline(spark):
    from professional_services_data_validator_spark.operators.temporal import (
        metric_anomalies,
    )

    rows = [("a", 0, 10), ("a", 1, 20), ("a", 2, 30)]
    df = spark.createDataFrame(rows, "key string, ts int, m long")
    out = {r["ts"]: r for r in metric_anomalies(
        df, ["key"], "ts", "m", min_history=1
    ).collect()}
    # baseline at t=2 is mean(10,20)=15, NOT contaminated by 30
    assert out[2]["base_mean"] == 15.0


def test_metric_anomalies_one_exchange(spark):
    from professional_services_data_validator_spark.operators.temporal import (
        metric_anomalies,
    )

    df = spark.createDataFrame(
        [("a", 0, 1), ("a", 1, 2)], "key string, ts int, m long"
    )
    q = metric_anomalies(df, ["key"], "ts", "m")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on the key for the window; the final orderBy adds
    # its range exchange, nothing else
    assert plan.count("Exchange hashpartitioning") == 1


def test_calendar_completeness_gaps_and_ranges(spark):
    from professional_services_data_validator_spark.operators.temporal import (
        calendar_completeness,
    )

    df = spark.createDataFrame(
        [("a", "2024-01-01"), ("a", "2024-01-03"),
         ("b", "2024-02-01"), ("b", "2024-02-02")],
        "k string, d string",
    ).select("k", F.col("d").cast("timestamp").alias("ts"))
    # per-group spans: a misses the middle day; b is complete
    got = [(r.k, str(r.day)) for r in
           calendar_completeness(df, "ts", ["k"]).collect()]
    assert got == [("a", "2024-01-02")]
    # explicit expected range extends past the observed max
    got2 = [str(r.day) for r in calendar_completeness(
        df.filter("k = 'a'"), "ts", expected_end="2024-01-05"
    ).collect()]
    assert got2 == ["2024-01-02", "2024-01-04", "2024-01-05"]
    # complete coverage -> empty
    assert calendar_completeness(
        df.filter("k = 'b'"), "ts", ["k"]
    ).count() == 0


def test_response_latency_role_conditioned(spark):
    from professional_services_data_validator_spark.operators.temporal import (
        response_latency,
    )

    rows = [
        # user@0s -> assistant@3s : latency 3 s on assistant's day
        ("c1", 0, "user", datetime.datetime(2026, 1, 1, 0, 0, 0)),
        ("c1", 1, "assistant", datetime.datetime(2026, 1, 1, 0, 0, 3)),
        # assistant -> tool pair must NOT count
        ("c1", 2, "tool", datetime.datetime(2026, 1, 1, 0, 0, 9)),
        # user@10s -> assistant@17s : latency 7 s
        ("c1", 3, "user", datetime.datetime(2026, 1, 1, 0, 0, 10)),
        ("c1", 4, "assistant", datetime.datetime(2026, 1, 1, 0, 0, 17)),
        # user turn with NO following assistant turn: no pair
        ("c2", 0, "user", datetime.datetime(2026, 1, 2, 0, 0, 0)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    out = response_latency(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["day"] == "2026-01-01"
    assert r["n_responses"] == 2
    assert r["avg_latency_s"] == 5.0
    assert r["p50_latency_s"] == 5.0  # interpolated between 3 and 7
    assert r["max_latency_s"] == 7.0


def test_cusum_changepoint_localizes_level_shift(spark):
    from professional_services_data_validator_spark.operators.temporal import (
        cusum_changepoint,
    )

    # key A: level 10 for 10 days then 20 for 10 days -> break at day 09
    # key B: constant -> NULL stat, never drifts
    rows = [("A", f"d{i:02d}", 10.0 if i < 10 else 20.0) for i in range(20)]
    rows += [("B", f"d{i:02d}", 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, day string, v double")
    out = {r["k"]: r for r in cusum_changepoint(df, ["k"], "day", "v").collect()}
    a = out["A"]
    assert a["n_points"] == 20 and a["mean"] == 15.0
    assert a["changepoint"] == "d09"  # |cusum| peaks at the last pre-shift day
    assert a["drifted"] is True
    b = out["B"]
    assert b["cusum_stat"] is None and b["drifted"] is False
