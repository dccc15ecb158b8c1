"""Round-3 additions: repetition stats, cross-doc span dedup, PII scrub,
numeric percentile profiles, chi-squared drift."""

import math

from pyspark.sql import functions as F

from professional_services_data_validator_spark.operators.aggregates import (
    numeric_profile,
)
from professional_services_data_validator_spark.operators.dedup import (
    cross_doc_shingle_dups,
)
from professional_services_data_validator_spark.operators.drift import (
    chi2_categorical,
)
from professional_services_data_validator_spark.operators.text import (
    pii_scrub,
    repetition_stats,
)


def test_repetition_stats_known_fractions(spark):
    df = spark.createDataFrame(
        [
            # "a b" x3 + "b a" x2 -> bigrams: ab,ba,ab,ba,ab = 5, top 3
            (1, "a b a b a b"),
            # all-distinct tokens: no repeated bigram, no dup 5-gram
            (2, "q w e r t y u"),
            # shorter than 5 tokens: n_kgrams 0, frac 0.0 (total predicate)
            (3, "x y"),
            (4, ""),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in repetition_stats(df, "id", "text", dup_k=5).collect()
    }
    assert out[1]["n_bigrams"] == 5
    assert abs(out[1]["top_bigram_frac"] - 3 / 5) < 1e-9
    # 5-grams of doc 1: ababa, babab -> "a b a b a" x1? positions 0,1:
    # [a b a b a], [b a b a b] -> both unique -> dup 0
    assert out[1]["dup_kgram_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == round(1 / 6, 6)
    assert out[2]["dup_kgram_frac"] == 0.0
    assert out[3]["n_kgrams"] == 0 and out[3]["dup_kgram_frac"] == 0.0
    assert out[4]["n_bigrams"] == 0 and out[4]["top_bigram_frac"] == 0.0


def test_repetition_stats_detects_loops(spark):
    looped = " ".join(["the same five words again"] * 10)
    clean = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, looped), (2, clean)], "id long, text string"
    )
    out = {
        r["id"]: r
        for r in repetition_stats(df, "id", "text", dup_k=5).collect()
    }
    assert out[1]["dup_kgram_frac"] == 1.0  # every 5-gram occurs >1x
    assert out[2]["dup_kgram_frac"] == 0.0
    assert out[1]["top_bigram_frac"] > out[2]["top_bigram_frac"]


def test_cross_doc_spans_shared_vs_unique(spark):
    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [
            (1, shared + " tail1 a b c"),
            (2, shared + " tail2 d e f"),
            (3, "totally different words " + " ".join(f"u{i}" for i in range(8))),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in cross_doc_shingle_dups(df, "id", "text", k=8).collect()
    }
    # docs 1 and 2 share exactly the one 8-gram made of the shared prefix
    assert out[1]["n_shared"] == 1 and out[2]["n_shared"] == 1
    assert out[3]["n_shared"] == 0 and out[3]["shared_frac"] == 0.0
    assert 0 < out[1]["shared_frac"] < 1


def test_cross_doc_spans_shuffles_hash_not_string(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h")], "id long, text string")
    plan = cross_doc_shingle_dups(df, "id", "text", k=8)._jdf.queryExecution(
    ).optimizedPlan().toString()
    # the corpus-wide aggregation groups by the 8-byte hash, not the k-word
    # shingle string
    assert "xxhash64" in plan


def test_pii_scrub_counts_and_idempotence(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at john.doe+x@corp.example.org or 123456789 now"),
            (2, "no pii here, just 12345 (too short) and at-sign @ alone"),
            (3, None),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in pii_scrub(df, "id", "text").collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_long_digits"] == 1
    assert out[2]["n_emails"] == 0 and out[2]["n_long_digits"] == 0
    assert out[3]["n_emails"] == 0  # null-safe
    assert out[2]["n_chars_removed"] == 0
    # scrubbing output again finds nothing (sentinel contains no PII)
    df2 = spark.createDataFrame(
        [(1, "pre <PII> post <PII>")], "id long, text string"
    )
    again = pii_scrub(df2, "id", "text").collect()[0]
    assert again["n_emails"] == 0 and again["n_long_digits"] == 0


def test_numeric_profile_exact_matches_python(spark):
    vals = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 100)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = numeric_profile(df, [], "x", percentiles=(0.5, 0.9), mode="exact")
    r = row.collect()[0]
    assert r["n"] == 10 and r["vmin"] == 1.0 and r["vmax"] == 100.0
    # linear interpolation: p50 = (5+6)/2, p90 = 9 + 0.1*(100-9)
    assert abs(r["p_50"] - 5.5) < 1e-9
    assert abs(r["p_90"] - (9 + 0.1 * 91)) < 1e-9
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / (len(vals) - 1)
    assert abs(r["avg"] - round(mean, 6)) < 1e-9
    assert abs(r["std"] - round(math.sqrt(var), 6)) < 1e-6


def test_numeric_profile_approx_same_schema_close_values(spark, transcripts):
    t = transcripts.select("role", F.length("text").alias("x"))
    exact = numeric_profile(t, ["role"], "x", mode="exact")
    approx = numeric_profile(t, ["role"], "x", mode="approx")
    assert exact.columns == approx.columns
    e = {r["role"]: r for r in exact.collect()}
    a = {r["role"]: r for r in approx.collect()}
    for role in e:
        # sketch error is tiny at this accuracy; p50 within 2 length units
        assert abs(e[role]["p_50"] - a[role]["p_50"]) <= 2.0
        assert e[role]["n"] == a[role]["n"]


def test_numeric_profile_single_aggregate_pass(spark):
    # plain source (the transcripts fixture's derivation DAG would add its
    # own exchanges and its plan depends on session cache state)
    t = spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("role"),
        (F.col("id") % 97).cast("double").alias("x"),
    )
    plan = numeric_profile(t, ["role"], "x", mode="approx")._jdf \
        .queryExecution().executedPlan().toString()
    # ONE shuffle for the groupBy (partial + final aggregate), none extra
    assert plan.count("Exchange") == 1


def test_chi2_identical_distributions_is_zero(spark):
    df = spark.createDataFrame(
        [(r,) for r in ["a"] * 30 + ["b"] * 20], "role string"
    )
    r = chi2_categorical(df, df, F.col("role")).collect()[0]
    assert r["chi2"] == 0.0 and r["dof"] == 1
    assert r["n_source"] == 50 and r["n_target"] == 50


def test_chi2_known_2x2_value(spark):
    # contingency: source a=10 b=30, target a=20 b=20
    s = spark.createDataFrame([(r,) for r in ["a"] * 10 + ["b"] * 30], "c string")
    t = spark.createDataFrame([(r,) for r in ["a"] * 20 + ["b"] * 20], "c string")
    r = chi2_categorical(s, t, F.col("c")).collect()[0]
    # classic formula: N(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    expect = 80 * (10 * 20 - 30 * 20) ** 2 / (40 * 40 * 30 * 50)
    assert abs(r["chi2"] - round(expect, 6)) < 1e-6
    assert r["dof"] == 1


def test_chi2_category_only_on_one_side(spark):
    s = spark.createDataFrame([("a",), ("b",)], "c string")
    t = spark.createDataFrame([("a",), ("c",)], "c string")
    r = chi2_categorical(s, t, F.col("c")).collect()[0]
    assert r["dof"] == 2 and r["chi2"] > 0  # no div-by-zero on absent cells


def test_repetition_stats_map_only(spark):
    df = spark.createDataFrame([(1, "a b a b")], "id long, text string")
    plan = repetition_stats(df, "id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    # per-doc metric: zero shuffle, one scan (the sorted-run fold)
    assert "Exchange" not in plan


def test_categorical_profile_exact_known_values(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        categorical_profile,
    )

    df = spark.createDataFrame(
        [
            ("a", 1, None),
            ("b", 1, "x"),
            ("b", 2, "x"),
            (None, 2, "y"),
            (None, None, "y"),
        ],
        "s string, i int, t string",
    )
    rows = {r["column"]: r for r in categorical_profile(df, ["s", "i", "t"]).collect()}
    assert rows["s"].n_distinct == 2 and rows["s"].n_null == 2
    assert rows["s"].top_value == "b" and rows["s"].top_count == 2
    assert rows["i"].n_distinct == 2 and rows["i"].n_null == 1
    # tie 1=2x, 2=2x -> lexicographically largest string wins ('2')
    assert rows["i"].top_value == "2" and rows["i"].top_count == 2
    assert rows["t"].n_distinct == 2 and rows["t"].n_null == 1
    assert rows["t"].top_value == "y"


def test_categorical_profile_approx_schema_and_bounds(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        categorical_profile,
    )

    df = spark.range(1000).select(
        (F.col("id") % 17).cast("string").alias("k"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 5).alias("v"),
    )
    exact = {r["column"]: r for r in categorical_profile(df, ["k", "v"]).collect()}
    approx = {r["column"]: r for r in categorical_profile(df, ["k", "v"], mode="approx").collect()}
    assert list(exact) == list(approx)
    for c in ("k", "v"):
        assert approx[c].n_null == exact[c].n_null  # null count is exact
        assert approx[c].top_value is None and approx[c].top_count is None
        # HLL at rsd=0.05 on tiny cardinalities: within 20%
        assert abs(approx[c].n_distinct - exact[c].n_distinct) <= max(
            2, 0.2 * exact[c].n_distinct
        )


def test_categorical_profile_exact_two_level_agg_plan(spark):
    """The exact path must aggregate per-(column,value) BEFORE the
    per-column fold — i.e. two HashAggregate pairs, with the final fold
    consuming distinct-value rows, never raw input rows."""
    from professional_services_data_validator_spark.operators.aggregates import (
        categorical_profile,
    )

    df = spark.range(100).select((F.col("id") % 3).cast("string").alias("k"))
    plan = categorical_profile(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    # partial+final at BOTH levels. Level 1 (per column,value) is a
    # HashAggregate; level 2 (per-column fold) falls back to SortAggregate
    # because max_by over a struct ordering is not hash-aggregable.
    n_aggs = plan.count("HashAggregate") + plan.count("SortAggregate")
    assert n_aggs >= 4
    # the per-(column,value) pre-aggregation keyed on the value must sit
    # BELOW the per-column fold, so the fold consumes distinct-value rows
    lvl1 = plan.find("keys=[column#")
    assert lvl1 != -1 and "value#" in plan[lvl1 : plan.find("]", lvl1)]


def test_jensen_shannon_identical_is_zero(spark):
    from professional_services_data_validator_spark.operators.drift import (
        jensen_shannon,
    )

    df = spark.createDataFrame(
        [(r,) for r in ["a"] * 30 + ["b"] * 20], "role string"
    )
    r = jensen_shannon(df, df, F.col("role")).collect()[0]
    assert r["jsd"] == 0.0
    assert r["n_source"] == 50 and r["n_target"] == 50


def test_jensen_shannon_known_value_and_bounds(spark):
    from professional_services_data_validator_spark.operators.drift import (
        jensen_shannon,
    )

    # p = [.25, .75], q = [.5, .5]
    s = spark.createDataFrame([(r,) for r in ["a"] * 10 + ["b"] * 30], "c string")
    t = spark.createDataFrame([(r,) for r in ["a"] * 20 + ["b"] * 20], "c string")
    r = jensen_shannon(s, t, F.col("c")).collect()[0]
    m = [0.375, 0.625]
    expect = 0.5 * (
        0.25 * math.log(0.25 / m[0]) + 0.75 * math.log(0.75 / m[1])
    ) + 0.5 * (0.5 * math.log(0.5 / m[0]) + 0.5 * math.log(0.5 / m[1]))
    assert abs(r["jsd"] - round(expect, 6)) < 1e-6
    assert 0.0 <= r["jsd"] <= math.log(2) + 1e-9


def test_jensen_shannon_disjoint_is_ln2_and_no_nan(spark):
    from professional_services_data_validator_spark.operators.drift import (
        jensen_shannon,
    )

    # fully disjoint supports -> maximal divergence ln(2); the 0-count side
    # must contribute exactly 0 (no ln(0), no epsilon distortion)
    s = spark.createDataFrame([("a",), ("a",)], "c string")
    t = spark.createDataFrame([("b",), ("b",)], "c string")
    r = jensen_shannon(s, t, F.col("c")).collect()[0]
    assert abs(r["jsd"] - round(math.log(2), 6)) < 1e-6


def test_frequent_values_counts_ranks_ties_nulls(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        frequent_values,
    )

    rows = (
        [("x", 1)] * 5 + [("y", 1)] * 3 + [("z", 2)] * 3
        + [("w", 3)] * 1 + [(None, None)] * 4
    )
    df = spark.createDataFrame(rows, "s string, i int")
    out = frequent_values(df, ["s", "i"], k=2).collect()
    by_col = {}
    for r in out:
        by_col.setdefault(r["column"], []).append(r)
    s_rows = by_col["s"]
    assert [r["value"] for r in s_rows] == ["x", "z"]  # tie y=3,z=3 -> 'z'
    assert [r["cnt"] for r in s_rows] == [5, 3]
    assert [r["rank"] for r in s_rows] == [1, 2]
    i_rows = by_col["i"]
    assert [r["value"] for r in i_rows] == ["1", "2"]
    assert [r["cnt"] for r in i_rows] == [8, 3]
    # NULLs excluded everywhere
    assert all(r["value"] is not None for r in out)


def test_frequent_values_salting_invariant(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        frequent_values,
    )

    df = spark.range(2000).select(
        (F.col("id") % 37).cast("string").alias("a"),
        (F.pow(F.col("id") % 13, 2)).cast("int").alias("b"),
    )
    one = frequent_values(df, ["a", "b"], k=4, num_salts=1).collect()
    many = frequent_values(df, ["a", "b"], k=4, num_salts=32).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_frequent_values_two_level_window_plan(spark):
    """No single task sorts a column's whole distinct stream: the plan has
    TWO window stages (salted local top-k, then global over survivors) and
    the per-(column,value) aggregation sits below both."""
    from professional_services_data_validator_spark.operators.aggregates import (
        frequent_values,
    )

    df = spark.range(100).select((F.col("id") % 7).cast("string").alias("k"))
    plan = frequent_values(df, ["k"], k=3)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert plan.count("Window [") == 2
    assert "xxhash64" in plan  # the salt key
    # Spark's rank-limit pushdown inserts WindowGroupLimit under BOTH
    # windows: each task pre-prunes to k rows per partition key before the
    # window sort ever runs — the partial top-k shape we want at 100 TB
    assert plan.count("WindowGroupLimit") == 2


def test_frequent_values_approx_matches_exact_low_cardinality(spark):
    """Distinct < num_counters: MG keeps every value, so the approx path
    is deterministic and byte-identical to the exact ranking."""
    from professional_services_data_validator_spark.operators.aggregates import (
        frequent_values,
        frequent_values_approx,
    )

    df = spark.range(3000).select(
        (F.col("id") % 37).cast("string").alias("a"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") % 13)).cast("int").alias("b"),
    )
    exact = frequent_values(df, ["a", "b"], k=4).collect()
    approx = frequent_values_approx(df, ["a", "b"], k=4,
                                    num_counters=64).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in approx]


def test_frequent_values_approx_mg_guarantee_and_exact_counts(spark):
    """Tiny counter budget (m=4) on skewed data: every value with global
    frequency > n/(m+1) MUST survive candidate generation, and its
    reported count is EXACT (stage-2 recount), regardless of how the tail
    behaves."""
    from professional_services_data_validator_spark.operators.aggregates import (
        frequent_values_approx,
    )

    # 500 'hot' (50%), 300 'warm' (30%), 200 spread over 100 cold values
    rows = (
        [("hot",)] * 500 + [("warm",)] * 300
        + [(f"cold{i % 100}",) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    out = {r["value"]: r for r in frequent_values_approx(
        df, ["v"], k=2, num_counters=4
    ).collect()}
    # n/(m+1) = 1000/5 = 200 < 300, 500 -> both guaranteed present
    assert out["hot"].cnt == 500 and out["hot"].rank == 1
    assert out["warm"].cnt == 300 and out["warm"].rank == 2


def test_frequent_values_approx_no_distinct_value_shuffle(spark):
    """The only aggregation consumes the candidate-joined stream: the plan
    has the MapInPandas candidate stage and a broadcast join feeding the
    count — the raw distinct-value stream is never exchanged."""
    from professional_services_data_validator_spark.operators.aggregates import (
        frequent_values_approx,
    )

    df = spark.range(100).select((F.col("id") % 7).cast("string").alias("k"))
    plan = frequent_values_approx(df, ["k"], k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    # the per-(column,value) count aggregate sits ABOVE the broadcast join
    agg = plan.find("HashAggregate")
    assert agg != -1 and plan.find("BroadcastHashJoin") > agg  # join below


def test_normalize_text_steps_and_hash(spark):
    from professional_services_data_validator_spark.operators.text import (
        normalize_text,
    )
    import hashlib

    df = spark.createDataFrame(
        [
            (1, "  Hello   World \t\n again "),
            (2, "hello world again"),
            (3, None),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in normalize_text(df, "id", "text").collect()}
    assert out[1]["norm_text"] == "hello world again"
    # trivially-reformatted copy collapses to the same hash
    assert out[1]["norm_hash"] == out[2]["norm_hash"]
    assert out[1]["norm_hash"] == hashlib.md5(b"hello world again").hexdigest()
    assert out[1]["n_chars_before"] == 25 and out[1]["n_chars_after"] == 17
    assert out[3]["norm_text"] == "" and out[3]["n_chars_before"] == 0


def test_normalize_text_strip_punct_and_map_only(spark):
    from professional_services_data_validator_spark.operators.text import (
        normalize_text,
    )

    df = spark.createDataFrame([(1, "A, b; c!")], "id long, text string")
    r = normalize_text(df, "id", "text", strip_punct=True).collect()[0]
    assert r["norm_text"] == "a b c"
    plan = normalize_text(df, "id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # map-only


def test_normalized_dedup_catches_reformatted_copies(spark):
    from professional_services_data_validator_spark.operators.dedup import (
        exact_dedup,
    )
    from professional_services_data_validator_spark.operators.text import (
        normalize_text,
    )

    df = spark.createDataFrame(
        [(1, "Same   Doc"), (2, "same doc"), (3, "other")],
        "id long, text string",
    )
    # raw exact dedup sees three distinct texts
    assert exact_dedup(df, "text", ["id"]).count() == 0
    norm = normalize_text(df, "id", "text")
    drops = exact_dedup(norm, "norm_text", ["id"]).collect()
    assert [r["id"] for r in drops] == [2]  # keeper = smallest id


# ---------------------------------------------------------------------------
# profile_compare (operators/aggregates.py)
# ---------------------------------------------------------------------------


def test_profile_compare_closed_form(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        profile_compare,
    )

    src = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], "g string, v double"
    )
    tgt = spark.createDataFrame(
        [("a", 10.0), ("a", 22.0), ("b", 5.0)], "g string, v double"
    )
    out = {
        (r["g"], r["metric"]): r
        for r in profile_compare(
            src, tgt, ["g"], "v", percentiles=(0.5,), threshold_pct=5.0
        ).collect()
    }
    # group a: avg 15 -> 16, +6.666667% > 5% -> fail; n unchanged -> success
    a_avg = out[("a", "avg")]
    assert a_avg["source_value"] == 15.0 and a_avg["target_value"] == 16.0
    assert abs(a_avg["pct_diff"] - 6.666667) < 1e-6
    assert a_avg["validation_status"] == "fail"
    assert out[("a", "n")]["validation_status"] == "success"
    # group b identical everywhere
    assert all(
        v["validation_status"] == "success"
        for (g, _), v in out.items() if g == "b"
    )
    # vmax a: 20 -> 22 = +10% fail
    assert out[("a", "vmax")]["validation_status"] == "fail"


def test_profile_compare_missing_group_fails(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        profile_compare,
    )

    src = spark.createDataFrame([("a", 1.0), ("b", 2.0), ("b", 4.0)],
                                "g string, v double")
    tgt = spark.createDataFrame([("a", 1.0)], "g string, v double")
    out = profile_compare(
        src, tgt, ["g"], "v", percentiles=(0.5,)
    ).collect()
    b_rows = [r for r in out if r["g"] == "b"]
    assert b_rows and all(
        r["validation_status"] == "fail" and r["target_value"] is None
        for r in b_rows
    )


def test_profile_compare_approx_same_schema(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        profile_compare,
    )

    src = spark.createDataFrame(
        [("a", float(i)) for i in range(100)], "g string, v double"
    )
    exact = profile_compare(src, src, ["g"], "v")
    approx = profile_compare(src, src, ["g"], "v", mode="approx")
    assert exact.columns == approx.columns
    # identical sides -> all success in both modes
    assert all(
        r["validation_status"] == "success" for r in approx.collect()
    )


# ------------------------------------------------- entropy / MI / skew ----


def test_column_entropy_closed_form(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        column_entropy,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x"), ("b", None)],
        "u string, c string",
    )
    rows = {r["column"]: r for r in column_entropy(df, ["u", "c"]).collect()}
    # u: 2+2 uniform over 2 values -> H = ln 2, norm 1
    assert rows["u"]["n_nonnull"] == 4 and rows["u"]["n_distinct"] == 2
    assert abs(rows["u"]["entropy"] - math.log(2)) < 1e-6
    assert rows["u"]["norm_entropy"] == 1.0
    assert rows["u"]["uniqueness_ratio"] == 0.5
    # c: constant (NULL excluded) -> zero entropy, zero norm
    assert rows["c"]["n_nonnull"] == 3 and rows["c"]["n_distinct"] == 1
    assert rows["c"]["entropy"] == 0.0 and rows["c"]["norm_entropy"] == 0.0


def test_mutual_information_dependence_extremes(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        mutual_information,
    )

    # b determined by a -> MI = H(a) = ln 2, NMI = 1
    dep = spark.createDataFrame(
        [("a", "1"), ("a", "1"), ("b", "2"), ("b", "2")], "x string, y string"
    )
    r = mutual_information(dep, "x", "y").collect()[0]
    assert abs(r["mi"] - math.log(2)) < 1e-6 and r["nmi"] == 1.0
    # independent uniform 2x2 -> MI = 0
    ind = spark.createDataFrame(
        [("a", "1"), ("a", "2"), ("b", "1"), ("b", "2")], "x string, y string"
    )
    r = mutual_information(ind, "x", "y").collect()[0]
    assert abs(r["mi"]) < 1e-6 and abs(r["nmi"]) < 1e-6
    # NULLs on either side are excluded from n
    withnull = dep.union(
        spark.createDataFrame([(None, "1"), ("a", None)], "x string, y string")
    )
    assert mutual_information(withnull, "x", "y").collect()[0]["n"] == 4


def test_key_skew_profile_closed_form(spark):
    from professional_services_data_validator_spark.operators.partitioning import (
        key_skew_profile,
    )

    df = spark.createDataFrame(
        [("A",)] * 5 + [("B",)] * 1, "k string"
    )
    r = key_skew_profile(df, "k").collect()[0]
    assert r["n_keys"] == 2 and r["n_rows"] == 6
    assert r["max_size"] == 5 and abs(r["max_share"] - 5 / 6) < 1e-6
    assert r["p50_size"] == 3.0  # interpolated between 1 and 5
    assert abs(r["skew_ratio"] - 5 / 3) < 1e-6
    assert r["top_key"] == "A"


def test_key_skew_profile_composite_key_tiebreak(spark):
    from professional_services_data_validator_spark.operators.partitioning import (
        key_skew_profile,
    )

    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("B", 2), ("B", 2)], "k string, d int"
    )
    r = key_skew_profile(df, ["k", "d"]).collect()[0]
    # both groups size 2: deterministic tie-break picks the LARGEST key
    assert r["top_key"] == "B|2" and r["skew_ratio"] == 1.0


def test_numeric_corr_matrix_closed_form(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        numeric_corr_matrix,
    )

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 1.0), (3.0, 6.0, 3.0)],
        "x double, y double, z double",
    )
    rows = {
        (r.col_a, r.col_b): r["corr"]
        for r in numeric_corr_matrix(df, ["x", "y", "z"]).collect()
    }
    assert rows[("x", "y")] == 1.0  # y = 2x exactly
    assert abs(rows[("x", "z")] - (-0.5)) < 1e-6  # hand-computed
    # constant column -> NULL corr, and NULL rows excluded pairwise
    df2 = spark.createDataFrame(
        [(1.0, 7.0, 1.0), (2.0, 7.0, None), (3.0, 7.0, 3.0)],
        "x double, c double, w double",
    )
    rows2 = {
        (r.col_a, r.col_b): r["corr"]
        for r in numeric_corr_matrix(df2, ["x", "c", "w"]).collect()
    }
    assert rows2[("x", "c")] is None
    assert rows2[("x", "w")] == 1.0  # the (2.0, None) row drops pairwise


def test_categorical_compare_verdicts(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        categorical_compare,
    )

    src = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "c string"
    )
    tgt_same = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "c string"
    )
    ok = categorical_compare(src, tgt_same, ["c"]).collect()
    assert all(r.validation_status == "success" for r in ok)
    tgt_diff = spark.createDataFrame(
        [("b",), ("b",), ("b",), ("x",)], "c string"
    )
    rows = {
        r.metric: r for r in categorical_compare(src, tgt_diff, ["c"]).collect()
    }
    assert rows["n_distinct"].validation_status == "success"  # 2 == 2
    assert rows["n_null"].validation_status == "fail"  # 1 -> 0, src != 0
    assert rows["top_value"].validation_status == "fail"  # a vs b
    assert rows["top_count"].validation_status == "fail"  # 2 vs 3, +50%
    assert rows["top_count"].pct_diff == 50.0


def test_new_profilers_empty_input_totality(spark):
    """Entropy / MI / skew / corr / categorical_compare are total on empty
    inputs — no inference errors, no ANSI division failures."""
    from professional_services_data_validator_spark.operators.aggregates import (
        categorical_compare,
        column_entropy,
        mutual_information,
        numeric_corr_matrix,
    )
    from professional_services_data_validator_spark.operators.partitioning import (
        key_skew_profile,
    )

    empty = spark.createDataFrame([], "a string, b string, x double, y double")
    assert column_entropy(empty, ["a", "b"]).count() == 0
    assert mutual_information(empty, "a", "b").count() == 0
    skew = key_skew_profile(empty, "a").collect()[0]
    assert skew["n_keys"] == 0 and skew["max_size"] is None
    corr = numeric_corr_matrix(empty, ["x", "y"]).collect()[0]
    assert corr["corr"] is None
    cmp_rows = categorical_compare(empty, empty, ["a"]).collect()
    # zero-count profiles on both sides agree
    assert all(r.validation_status == "success" for r in cmp_rows)


def test_novel_categories_detection(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        novel_categories,
    )

    src = spark.createDataFrame(
        [("a", "x"), ("b", "x"), (None, "y")], "c string, d string"
    )
    tgt = spark.createDataFrame(
        [("a", "x"), ("NEW", "x"), ("NEW", "z"), (None, "y")],
        "c string, d string",
    )
    got = {
        (r["column"], r.value): r.n_rows
        for r in novel_categories(src, tgt, ["c", "d"]).collect()
    }
    # NEW appears twice in c; z once in d; NULLs and seen values never flag
    assert got == {("c", "NEW"): 2, ("d", "z"): 1}
    # containment holds -> empty (src's d-values are a subset of tgt's)
    assert novel_categories(tgt, src, ["d"]).count() == 0


def test_cohens_kappa_hand_computed(spark):
    """2x2 confusion with known kappa: po=0.7, marginals (0.5,0.5) vs
    (0.6,0.4) -> pe = 0.5*0.6 + 0.5*0.4 = 0.5, kappa = 0.4."""
    from professional_services_data_validator_spark.operators.aggregates import (
        cohens_kappa,
    )

    # 10 PK-paired rows: 4 (x,x), 3 (y,y), 1 (x,y), 2 (y,x)
    labels = [("x", "x")] * 4 + [("y", "y")] * 3 + [("x", "y")] + [("y", "x")] * 2
    src = spark.createDataFrame(
        [(i, a) for i, (a, _) in enumerate(labels)], "pk int, lab string"
    )
    tgt = spark.createDataFrame(
        [(i, b) for i, (_, b) in enumerate(labels)], "pk int, lab string"
    )
    r = cohens_kappa(src, tgt, ["pk"], "lab").collect()[0]
    assert r["n_pairs"] == 10
    assert r["observed_agreement"] == 0.7
    assert r["expected_agreement"] == 0.5
    assert r["kappa"] == 0.4


def test_cohens_kappa_null_sentinel_and_degenerate(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        cohens_kappa,
    )

    # NULL target label disagrees with a non-NULL source label
    src = spark.createDataFrame([(1, "x"), (2, "x")], "pk int, lab string")
    tgt = spark.createDataFrame([(1, "x"), (2, None)], "pk int, lab string")
    r = cohens_kappa(src, tgt, ["pk"], "lab").collect()[0]
    assert r["observed_agreement"] == 0.5
    assert r["kappa"] < 1.0
    # both sides constant on the same class: pe = 1 -> kappa defined as 1.0
    const = spark.createDataFrame([(1, "x"), (2, "x")], "pk int, lab string")
    r2 = cohens_kappa(const, const, ["pk"], "lab").collect()[0]
    assert (r2["observed_agreement"], r2["kappa"]) == (1.0, 1.0)


def test_canned_turns_cross_conv_only(spark):
    """A text repeated across conversations ranks first; a text repeated
    only WITHIN one conversation never appears (that is loop territory)."""
    from professional_services_data_validator_spark.operators.text import (
        canned_turns,
    )

    df = spark.createDataFrame(
        [
            ("c1", "canned"), ("c2", "canned"), ("c3", "canned"),
            ("c1", "boiler"), ("c2", "boiler"),
            ("c4", "looped"), ("c4", "looped"), ("c4", "looped"),
            ("c5", "unique"), ("c6", None),
        ],
        "conv_id string, text string",
    )
    rows = canned_turns(df, min_convs=2, top_k=10).collect()
    assert [(r.text, r.n_convs, r.n_occurrences, r.rank) for r in rows] == [
        ("canned", 3, 3, 1),
        ("boiler", 2, 2, 2),
    ]
