"""Round-3 cont.: FD check, robust outliers, Benford, quantile-bin PSI,
inter-turn gap profile — closed-form assertions on literal frames."""

import math
from datetime import datetime

from pyspark.sql import functions as F

from professional_services_data_validator_spark.operators.aggregates import (
    benford_check,
    fd_violations,
    robust_outlier_profile,
)
from professional_services_data_validator_spark.operators.drift import (
    psi_quantile_binned,
)
from professional_services_data_validator_spark.operators.temporal import (
    turn_gap_stats,
)


def test_fd_violations_conflicts_and_nulls(spark):
    df = spark.createDataFrame(
        [
            ("a", "x"),
            ("a", "x"),  # constant dependent: holds
            ("b", "x"),
            ("b", "y"),  # two values: violated
            ("c", None),
            ("c", "z"),  # NULL vs value: violated (NULL is a real conflict)
            (None, "q"),  # NULL determinant: excluded
        ],
        "det string, dep string",
    )
    out = {r["det_value"]: r for r in fd_violations(df, "det", "dep").collect()}
    assert set(out) == {"b", "c"}
    assert out["b"]["n_rows"] == 2 and out["b"]["n_distinct_dep"] == 2
    assert (out["b"]["dep_min"], out["b"]["dep_max"]) == ("x", "y")
    assert out["c"]["n_distinct_dep"] == 2
    assert out["c"]["dep_min"] == "<NULL>" and out["c"]["dep_max"] == "z"


def test_fd_violations_holds_everywhere_is_empty(spark):
    df = spark.createDataFrame(
        [("k1", "v"), ("k1", "v"), ("k2", "w")], "det string, dep string"
    )
    assert fd_violations(df, "det", "dep").count() == 0


def test_robust_outlier_profile_known_mad(spark):
    # v = [1,2,3,4,100]: median 3, |dev| = [2,1,0,1,97], MAD = 1
    # k=3 -> cut = 3 * 1.4826 * 1 = 4.4478 -> only 97 exceeds
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,), (100.0,)], "v double"
    )
    r = robust_outlier_profile(df, ["v"], k=3.0).collect()
    assert len(r) == 1
    row = r[0]
    assert row["column"] == "v"
    assert row["n_nonnull"] == 5
    assert row["median"] == 3.0
    assert row["mad"] == 1.0
    assert row["n_outliers"] == 1
    assert abs(row["outlier_frac"] - 0.2) < 1e-9


def test_robust_outlier_profile_constant_column(spark):
    # constant column: MAD 0 -> nothing exceeds (0 > 0 is false)
    df = spark.createDataFrame([(7.0,), (7.0,), (7.0,)], "v double")
    row = robust_outlier_profile(df, ["v"], k=3.0).collect()[0]
    assert row["mad"] == 0.0 and row["n_outliers"] == 0


def test_benford_check_known_digits(spark):
    # digits: 1.0->1, 1.5->1, 19.0->1, 2.2->2, 0.25->2;
    # 0.004 -> DECIMAL(20,2) "0.00" (no significant digit) and NULL excluded
    df = spark.createDataFrame(
        [(1.0,), (1.5,), (19.0,), (2.2,), (0.004,), (None,), (0.25,)],
        "v double",
    )
    rows = {r["digit"]: r for r in benford_check(df, F.col("v")).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n"] == 3 and rows[2]["n"] == 2
    assert abs(rows[1]["observed_frac"] - 0.6) < 1e-9
    e1, e2 = math.log10(2.0), math.log10(1.5)
    assert abs(rows[1]["expected_frac"] - round(e1, 6)) < 1e-9
    chi2 = 5 * ((0.6 - e1) ** 2 / e1 + (0.4 - e2) ** 2 / e2)
    assert abs(rows[1]["chi2"] - chi2) < 1e-4
    # the total is repeated on every row
    assert rows[1]["chi2"] == rows[2]["chi2"]


def test_psi_quantile_binned_identical_is_zero(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    out = psi_quantile_binned(df, df, F.col("v"), n_bins=10).collect()
    assert len(out) == 10
    # equal-frequency property: every source bin holds exactly 10 of 100
    assert all(r["n_source"] == 10 for r in out)
    assert all(abs(r["psi"]) < 1e-9 for r in out)


def test_psi_quantile_binned_shift_detected(spark):
    src = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    tgt = src.select((F.col("v") + 50.0).alias("v"))
    out = psi_quantile_binned(src, tgt, F.col("v"), n_bins=10).collect()
    psi = out[0]["psi"]
    assert psi > 0.5  # half the mass left the source's bin support
    # target mass beyond the last edge piles into the top bin
    top = [r for r in out if r["bin_idx"] == 9][0]
    assert top["n_target"] > top["n_source"]


def test_turn_gap_stats_known_gaps(spark):
    d = datetime
    df = spark.createDataFrame(
        [
            # c1: +5s, then -65s (out of order under stable turn order)
            ("c1", 0, d(2024, 1, 1, 10, 0, 0)),
            ("c1", 1, d(2024, 1, 1, 10, 0, 5)),
            ("c1", 2, d(2024, 1, 1, 9, 59, 0)),
            # c2: one gap of 7200s (over the 3600s SLA)
            ("c2", 0, d(2024, 1, 1, 11, 0, 0)),
            ("c2", 1, d(2024, 1, 1, 13, 0, 0)),
        ],
        "conv_id string, turn_idx int, ts timestamp",
    )
    rows = turn_gap_stats(df, sla_seconds=3600).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["day"] == "2024-01-01"
    assert r["n_gaps"] == 3
    assert r["n_negative"] == 1
    assert r["n_over_sla"] == 1
    # gaps = [5, -65, 7200]: median 5, avg 2380
    assert r["p50_gap_s"] == 5.0
    assert abs(r["avg_gap_s"] - 2380.0) < 1e-6
    assert r["max_gap_s"] == 7200.0


def test_turn_gap_stats_day_of_later_turn(spark):
    d = datetime
    df = spark.createDataFrame(
        [
            # gap crosses midnight: attributed to Jan 2 (the later turn)
            ("c1", 0, d(2024, 1, 1, 23, 59, 0)),
            ("c1", 1, d(2024, 1, 2, 0, 1, 0)),
        ],
        "conv_id string, turn_idx int, ts timestamp",
    )
    rows = turn_gap_stats(df).collect()
    assert len(rows) == 1 and rows[0]["day"] == "2024-01-02"
    assert rows[0]["n_gaps"] == 1 and rows[0]["max_gap_s"] == 120.0


def test_bigram_pmi_known_corpus(spark):
    from professional_services_data_validator_spark.operators.text import (
        bigram_pmi,
    )

    # unigrams: a=3, b=3, c=2, d=2 -> N1=10; bigrams: (a,b)x3, (b,c)x2,
    # (c,d)x2, (d,a)x1 -> N2=8; min_count=2 keeps the first three
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d a b")], "id long, text string"
    )
    rows = bigram_pmi(df, "text", min_count=2, top_k=10).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    assert set(got) == {("a", "b"), ("b", "c"), ("c", "d")}
    ab = got[("a", "b")]
    assert ab["c12"] == 3 and ab["c1"] == 3 and ab["c2"] == 3
    pmi_ab = math.log((3 / 8) / ((3 / 10) * (3 / 10)))
    assert abs(ab["pmi"] - pmi_ab) < 1e-5
    # ranks are 1-based and ordered by pmi desc
    assert sorted(r["rank"] for r in rows) == [1, 2, 3]


def test_bigram_pmi_min_count_filters(spark):
    from professional_services_data_validator_spark.operators.text import (
        bigram_pmi,
    )

    df = spark.createDataFrame([(1, "x y"), (2, "x z")], "id long, text string")
    assert bigram_pmi(df, "text", min_count=2, top_k=10).count() == 0


def test_zipf_fit_perfect_powerlaw(spark):
    from professional_services_data_validator_spark.operators.text import (
        zipf_fit,
    )

    # counts c = [8,4,2,1] on ranks r = [1,2,3,4]: assert the moments-
    # based fit reproduces an independent closed-form least-squares
    # replay of ln(c) ~ ln(r) (no numpy), plus the corpus totals.
    words = []
    for w, n in (("a", 8), ("b", 4), ("c", 2), ("d", 1)):
        words += [w] * n
    df = spark.createDataFrame([(1, " ".join(words))], "id long, text string")
    row = zipf_fit(df, "text", top_n=10).collect()[0]
    assert row["n_tokens"] == 15 and row["vocab_size"] == 4
    assert row["n_fit"] == 4
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(c) for c in (8, 4, 2, 1)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(row["zipf_slope"] - slope) < 1e-5
    assert abs(row["r2"] - r2) < 1e-5
    assert row["zipf_slope"] < 0  # frequency falls with rank


def test_sample_representativeness_uniform_sample_passes(spark):
    from professional_services_data_validator_spark.operators.sampling import (
        sample_representativeness,
    )

    df = spark.createDataFrame(
        [(i, float(i % 50), "c" + str(i % 4)) for i in range(2000)],
        "id long, x double, cat string",
    )
    rows = {r["check"]: r for r in sample_representativeness(
        df, ["id"], F.col("x"), F.col("cat"), sample_hex="0123"
    ).collect()}
    assert set(rows) == {"ks_numeric", "jsd_categorical"}
    ks, jsd = rows["ks_numeric"], rows["jsd_categorical"]
    assert ks["n_population"] == 2000
    # md5-prefix slice: ~4/16 of rows, binomial-bounded
    assert 350 < ks["n_sample"] < 650
    assert ks["validation_status"] == "success"
    assert jsd["validation_status"] == "success"
    assert jsd["n_sample"] == ks["n_sample"]


def test_sample_representativeness_detects_key_correlated_category(spark):
    """A category that is a function of the sampling hash is the worst
    case — the sample sees only one value. The JSD check must fail."""
    from professional_services_data_validator_spark.operators.sampling import (
        sample_representativeness,
    )

    base = spark.createDataFrame(
        [(i, float(i % 50)) for i in range(2000)], "id long, x double"
    )
    h1 = F.substring(
        F.md5(F.concat_ws("|", F.lit("42"), F.col("id").cast("string"))), 1, 1
    )
    df = base.withColumn(
        "cat",
        F.when(h1.isin("0", "1", "2", "3"), F.lit("in")).otherwise(
            F.lit("out")
        ),
    )
    rows = {r["check"]: r for r in sample_representativeness(
        df, ["id"], F.col("x"), F.col("cat"), sample_hex="0123"
    ).collect()}
    assert rows["jsd_categorical"]["validation_status"] == "fail"
    # the numeric column is NOT hash-correlated: KS still passes
    assert rows["ks_numeric"]["validation_status"] == "success"


def test_type_conformance_known_fractions(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        type_conformance,
    )

    df = spark.createDataFrame(
        [
            ("1", "2024-01-01", "TRUE"),
            ("2.5", "2024-01-01 10:00:00", "false"),
            ("-3", "not a date", ""),
            (None, "2024-13-45", "maybe"),
        ],
        "a string, b string, c string",
    )
    out = {r["column"]: r for r in type_conformance(df, ["a", "b", "c"]).collect()}
    a, b, c = out["a"], out["b"], out["c"]
    # a: '1', '2.5', '-3' (NULL excluded): ints 2/3, doubles 3/3
    assert a["n_nonnull"] == 3
    assert abs(a["frac_int"] - round(2 / 3, 6)) < 1e-9
    assert a["frac_double"] == 1.0
    assert a["frac_date"] == 0.0
    # b: one date, one timestamp; '2024-13-45' matches the shape regex
    # (conformance is syntactic, not calendar-valid — documented)
    assert b["frac_date"] == 0.5  # 2024-01-01 and 2024-13-45
    assert b["frac_timestamp"] == 0.25
    # c: TRUE + false -> 0.5 bool; one empty string
    assert c["frac_bool"] == 0.5
    assert c["frac_empty"] == 0.25


def test_string_length_profile_known(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        string_length_profile,
    )

    df = spark.createDataFrame(
        [("ab", ""), ("abcd", None), ("x", "yy")], "s string, t string"
    )
    out = {r["column"]: r for r in string_length_profile(df, ["s", "t"]).collect()}
    s, t = out["s"], out["t"]
    assert (s["min_len"], s["max_len"]) == (1, 4)
    assert abs(s["avg_len"] - round(7 / 3, 6)) < 1e-9
    assert s["p50_len"] == 2.0
    # NULL excluded, empty string counts as length 0
    assert t["n_nonnull"] == 2 and t["min_len"] == 0 and t["max_len"] == 2


def test_grouped_null_rates_segment_shaped(spark):
    from professional_services_data_validator_spark.operators.aggregates import (
        grouped_null_rates,
    )

    df = spark.createDataFrame(
        [
            ("g1", None, 1.0),
            ("g1", None, None),
            ("g2", "v", 2.0),
            ("g2", "w", 3.0),
        ],
        "g string, a string, b double",
    )
    out = {(r["group"], r["column"]): r for r in grouped_null_rates(
        df, "g", ["a", "b"]
    ).collect()}
    assert out[("g1", "a")]["null_frac"] == 1.0  # segment-shaped failure
    assert out[("g2", "a")]["null_frac"] == 0.0
    assert out[("g1", "b")]["n_null"] == 1
    assert out[("g1", "b")]["n_rows"] == 2


def test_duplication_by_day_planted(spark):
    from professional_services_data_validator_spark.operators.uniqueness import (
        duplication_by_day,
    )
    from datetime import datetime as d

    df = spark.createDataFrame(
        [
            ("c1", 0, d(2024, 1, 1, 1)),
            ("c1", 0, d(2024, 1, 1, 2)),  # dup PK on day 1
            ("c1", 1, d(2024, 1, 1, 3)),
            ("c2", 0, d(2024, 1, 2, 1)),  # clean day 2
        ],
        "conv_id string, turn_idx int, ts timestamp",
    )
    out = {r["day"]: r for r in duplication_by_day(
        df, ["conv_id", "turn_idx"]
    ).collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert d1["n_rows"] == 3 and d1["n_keys"] == 2 and d1["n_dup_rows"] == 1
    assert abs(d1["dup_frac"] - round(1 / 3, 6)) < 1e-9
    assert d2["n_dup_rows"] == 0 and d2["dup_frac"] == 0.0


def test_psi_quantile_binned_empty_source_raises(spark):
    empty = spark.createDataFrame([], "v double")
    tgt = spark.createDataFrame([(1.0,)], "v double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no non-null values"):
        psi_quantile_binned(empty, tgt, F.col("v"))


def test_zipf_fit_degenerate_corpus_is_null_not_nan(spark):
    from professional_services_data_validator_spark.operators.text import (
        zipf_fit,
    )

    # single distinct token: n_fit = 1 -> no spread -> NULL slope/r2
    df = spark.createDataFrame([(1, "w w w")], "id long, text string")
    row = zipf_fit(df, "text").collect()[0]
    assert row["n_fit"] == 1
    assert row["zipf_slope"] is None and row["r2"] is None
