"""Conversation-structure validation + embedding-column health profile."""

import datetime

from pyspark.sql import functions as F

from professional_services_data_validator_spark.operators.conversation import (
    conversation_checks,
)
from professional_services_data_validator_spark.operators.similarity import (
    embedding_stats,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            (c, t, r, tool, datetime.datetime(2026, 1, 1, 0, 0, s))
            for c, t, r, tool, s in rows
        ],
        "conv_id string, turn_idx int, role string, tool string, "
        "ts timestamp",
    )


def test_clean_conversation_emits_nothing(spark):
    df = _mk(
        spark,
        [
            ("c1", 0, "user", None, 1),
            ("c1", 1, "assistant", None, 2),
            ("c1", 2, "tool", "search", 3),
            ("c1", 3, "assistant", None, 4),
            ("c2", 0, "system", None, 1),
            ("c2", 1, "user", None, 2),
            ("c2", 2, "assistant", None, 3),
        ],
    )
    assert conversation_checks(df).count() == 0


def test_each_violation_class_detected(spark):
    df = _mk(
        spark,
        [
            # gap (0 then 2) + opens with assistant + tool set on non-tool
            ("bad1", 0, "assistant", "x", 5),
            ("bad1", 2, "user", None, 6),
            # duplicate turn_idx
            ("bad2", 0, "user", None, 1),
            ("bad2", 0, "user", None, 1),
            ("bad2", 1, "assistant", None, 2),
            # disallowed transition (user -> user) + ts regression
            ("bad3", 0, "user", None, 5),
            ("bad3", 1, "user", None, 3),
        ],
    )
    out = {
        (r["conv_id"], r["check"]): r["detail"]
        for r in conversation_checks(df).collect()
    }
    assert ("bad1", "contiguous") in out
    assert out[("bad1", "opening_role")] == "opens with assistant"
    assert ("bad1", "tool_role") in out
    assert ("bad2", "contiguous") in out
    assert out[("bad3", "role_transition")] == "1 disallowed transition(s)"
    assert out[("bad3", "ts_monotonic")] == "1 timestamp regression(s)"
    # no false positives on checks that hold
    assert ("bad3", "contiguous") not in out
    assert ("bad2", "role_transition") not in out


def test_conversation_join_copartitioned(spark):
    df = _mk(spark, [("c", 0, "user", None, 1), ("c", 1, "assistant", None, 2)])
    plan = conversation_checks(df)._jdf.queryExecution().executedPlan() \
        .toString()
    # the adjacent-pair check is a join keyed on conv_id — no window sort
    # over conversations
    assert "Window" not in plan


def test_embedding_stats_counts_and_norms(spark):
    rows = [
        (0, None),
        (1, [1.0, 0.0, 0.0]),          # norm 1
        (2, [3.0, 4.0, 0.0]),          # norm 5
        (3, [0.0, 0.0, 0.0]),          # zero vector
        (4, [1.0, float("nan"), 0.0]),  # non-finite
        (5, [1.0, 1.0]),               # wrong dim (still finite, norm ok)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_stats(df, "vec_id", "embedding", expected_dim=3).collect()[0]
    assert r["n_vecs"] == 6
    assert r["n_null"] == 1
    assert r["n_wrong_dim"] == 1
    assert r["n_nonfinite"] == 1
    assert r["n_zero_norm"] == 1
    # healthy = ids 1, 2 -> norms 1 and 5
    assert r["avg_norm"] == 3.0
    assert r["p50_norm"] == 3.0


def test_embedding_stats_single_pass(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    plan = embedding_stats(df, "vec_id", "embedding", 2)._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Scan") == 1


def test_role_transition_matrix_counts_and_probs(spark):
    from professional_services_data_validator_spark.operators.conversation import (
        role_transition_matrix,
    )

    rows = [
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "user"),
        ("c1", 3, "assistant"),
        ("c2", 0, "user"), ("c2", 1, "assistant"), ("c2", 2, "tool"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = {(r.prev_role, r.next_role): r for r in role_transition_matrix(df).collect()}
    assert out[("user", "assistant")].n_pairs == 3
    assert out[("assistant", "user")].n_pairs == 1
    assert out[("assistant", "tool")].n_pairs == 1
    # row-normalized: assistant -> {user: .5, tool: .5}
    assert out[("assistant", "user")].p == 0.5
    assert out[("assistant", "tool")].p == 0.5
    assert out[("user", "assistant")].p == 1.0
    # no cross-conversation edge (c1 turn 3 -> c2 turn 0 must not pair)
    assert ("assistant", "user") in out and len(out) == 3


def test_role_transition_matrix_no_window_sort(spark):
    """Adjacent pairs come from the co-partitioned self-join; the only
    sort in the plan is the final output ORDER BY over |roles|^2 cells,
    never a per-conversation window sort on the corpus side."""
    from professional_services_data_validator_spark.operators.conversation import (
        role_transition_matrix,
    )

    df = spark.createDataFrame(
        [("c1", 0, "user"), ("c1", 1, "assistant")],
        "conv_id string, turn_idx int, role string",
    )
    q = role_transition_matrix(df)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # exactly ONE window (the denominator over aggregated cells) and it
    # sits ABOVE the aggregation, not over the raw pair stream
    assert plan.count("Window") == 1
    agg_pos = plan.find("n_pairs")
    assert agg_pos != -1
    opt = q._jdf.queryExecution().optimizedPlan().toString()
    assert opt.index("Window") < opt.index("Join")  # window above the join/agg subtree


def test_loop_detection_planted_runs(spark):
    from professional_services_data_validator_spark.operators.conversation import (
        loop_detection,
    )

    rows = [
        # c1: turns 1-3 identical assistant "X" -> run of 3; plus a
        # 2-run of "Y" at turns 5-6 (below min_run=3, still counted in
        # n_repeat_turns)
        ("c1", 0, "user", "q"),
        ("c1", 1, "assistant", "X"),
        ("c1", 2, "assistant", "X"),
        ("c1", 3, "assistant", "X"),
        ("c1", 4, "user", "ok"),
        ("c1", 5, "assistant", "Y"),
        ("c1", 6, "assistant", "Y"),
        # c2: same text but alternating roles -> no repeat pair
        ("c2", 0, "user", "Z"),
        ("c2", 1, "assistant", "Z"),
        ("c2", 2, "user", "Z"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {r["conv_id"]: r for r in loop_detection(df, min_run=3).collect()}
    assert list(out) == ["c1"]
    r = out["c1"]
    assert r["n_turns"] == 7
    assert r["n_loop_runs"] == 1  # only the 3-run clears min_run
    assert r["max_run_len"] == 3
    assert r["n_repeat_turns"] == 3  # (3-1) from X-run + (2-1) from Y-run


def test_loop_detection_null_text_is_nullsafe(spark):
    from professional_services_data_validator_spark.operators.conversation import (
        loop_detection,
    )

    df = spark.createDataFrame(
        [("c1", 0, "assistant", None), ("c1", 1, "assistant", None)],
        "conv_id string, turn_idx int, role string, text string",
    )
    r = loop_detection(df, min_run=2).collect()
    assert len(r) == 1 and r[0]["max_run_len"] == 2


def test_role_sequence_anomaly_scores_rare_edges(spark):
    from professional_services_data_validator_spark.operators.conversation import (
        role_sequence_anomaly,
    )
    import math

    # corpus: 3 convs of user->assistant->user (common edges) + 1 conv
    # with a user->user edge (rare) — the rare conv must score highest
    rows = []
    for i, c in enumerate(["c1", "c2", "c3"]):
        rows += [(c, 0, "user"), (c, 1, "assistant"), (c, 2, "user")]
    rows += [("c9", 0, "user"), ("c9", 1, "user")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string"
    )
    out = {r["conv_id"]: r for r in role_sequence_anomaly(df).collect()}
    assert set(out) == {"c1", "c2", "c3", "c9"}
    # edges from 'user': 3x ->assistant, 1x ->user  => p(u->u) = 1/4
    assert out["c9"]["n_pairs"] == 1
    assert out["c9"]["avg_nll"] == round(-math.log(1 / 4), 6)
    # common convs: edges u->a (p=3/4) and a->u (p=1)
    expect = round((-math.log(3 / 4) - math.log(1.0)) / 2, 6)
    assert out["c1"]["avg_nll"] == expect
    assert out["c9"]["avg_nll"] > out["c1"]["avg_nll"]


def test_conv_redundancy_catches_alternating_loop(spark):
    from professional_services_data_validator_spark.operators.conversation import (
        conv_redundancy,
        loop_detection,
    )

    # A-B-A-B ping-pong: NO adjacent identical pair, so loop_detection is
    # blind to it — conv_redundancy is the non-adjacent complement
    rows = [
        ("c1", 0, "assistant", "A"),
        ("c1", 1, "assistant", "B"),
        ("c1", 2, "assistant", "A"),
        ("c1", 3, "assistant", "B"),
        ("c2", 0, "user", "x"),
        ("c2", 1, "assistant", "y"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    assert loop_detection(df, min_run=2).count() == 0
    out = conv_redundancy(df, min_repeats=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["conv_id"] == "c1"
    assert r["n_turns"] == 4 and r["n_distinct"] == 2
    assert r["redundancy"] == 0.5 and r["max_repeats"] == 2
    # role matters: same text under different roles is NOT a repeat
    df2 = spark.createDataFrame(
        [("c3", 0, "user", "Z"), ("c3", 1, "assistant", "Z")],
        "conv_id string, turn_idx int, role string, text string",
    )
    assert conv_redundancy(df2, min_repeats=2).count() == 0


def test_transition_drift_hand_computed(spark):
    from professional_services_data_validator_spark.operators.conversation import (
        transition_drift,
    )

    def mk(rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string"
        )

    # source pairs: u->a, a->u, u->a  (prev u: {a: 1.0}; prev a: {u: 1.0})
    src = mk(
        [("c1", 0, "u"), ("c1", 1, "a"), ("c1", 2, "u"), ("c1", 3, "a")]
    )
    # target pairs: u->a, u->t (prev u: {a: .5, t: .5}; prev a absent)
    tgt = mk(
        [("t1", 0, "u"), ("t1", 1, "a"), ("t2", 0, "u"), ("t2", 1, "t")]
    )
    out = {
        (r["prev_role"], r["next_role"]): r
        for r in transition_drift(src, tgt).collect()
    }
    assert set(out) == {("u", "a"), ("u", "t"), ("a", "u")}
    ua = out[("u", "a")]
    assert (ua["n_source"], ua["n_target"]) == (2, 1)
    assert ua["p_source"] == 1.0 and ua["p_target"] == 0.5
    # prev u: tvd = .5*(|1-.5| + |0-.5|) = .5 ; prev a one-sided -> .5
    assert ua["tvd_prev"] == 0.5
    assert out[("a", "u")]["tvd_prev"] == 0.5
    assert out[("u", "t")]["p_source"] == 0.0
    # w_drift = (2/3)*.5 + (1/3)*.5 = .5 on every row
    assert {r["w_drift"] for r in out.values()} == {0.5}


def test_transition_drift_identical_corpora_zero(spark):
    from professional_services_data_validator_spark.operators.conversation import (
        transition_drift,
    )

    df = spark.createDataFrame(
        [("c1", 0, "u"), ("c1", 1, "a"), ("c1", 2, "u")],
        "conv_id string, turn_idx int, role string",
    )
    rows = transition_drift(df, df).collect()
    assert rows and all(
        r["tvd_prev"] == 0.0 and r["w_drift"] == 0.0 for r in rows
    )


def test_context_budget_overflow_first_crossing(spark):
    from professional_services_data_validator_spark.operators.conversation import (
        context_budget_overflow,
    )

    # word of length L costs ceil(L/4): "aaaa"=1, "aaaaaaaa"=2
    w1, w2 = "aaaa", "aaaaaaaa"
    df = spark.createDataFrame(
        [
            # conv over: costs 2, 2, 1 -> cum 2, 4, 5; budget 4 -> turn 2
            ("over", 0, f"{w1} {w1}"),
            ("over", 1, w2),
            ("over", 2, w1),
            # conv under: cum 1, 2 -> never crosses 4
            ("under", 0, w1),
            ("under", 1, w1),
            # NULL text costs 0 and must not poison the running sum
            ("nulls", 0, None),
            ("nulls", 1, w1),
        ],
        "conv_id string, turn_idx int, text string",
    )
    out = {r["conv_id"]: r for r in
           context_budget_overflow(df, budget=4).collect()}
    assert set(out) == {"over"}
    r = out["over"]
    assert r["n_turns"] == 3
    assert r["total_tokens"] == 5
    assert r["overflow_turn_idx"] == 2
    assert r["turns_within_budget"] == 2


def test_context_budget_overflow_empty_input(spark):
    from professional_services_data_validator_spark.operators.conversation import (
        context_budget_overflow,
    )

    df = spark.createDataFrame(
        [], "conv_id string, turn_idx int, text string"
    )
    assert context_budget_overflow(df, budget=1).count() == 0
