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
