"""Drift (KS/PSI) + schema validation tests."""

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from professional_services_data_validator_spark.operators.drift import (
    drift_grouped,
    emd_binned,
    ks_binned,
    ks_statistic,
    psi,
    psi_verdict,
)
from professional_services_data_validator_spark.schema_validation import (
    schema_validation_matching,
    schema_validation_report,
)


def _scipy_ks(a, b):
    a, b = np.sort(a), np.sort(b)
    allv = np.sort(np.concatenate([a, b]))
    return float(
        np.max(
            np.abs(
                np.searchsorted(a, allv, "right") / len(a)
                - np.searchsorted(b, allv, "right") / len(b)
            )
        )
    )


def test_ks_exact_matches_numpy(spark, transcripts):
    tgt = spark.table("transcripts_target")
    got = ks_statistic(
        transcripts, tgt, F.length("text")
    ).collect()[0]
    a = [r[0] for r in transcripts.select(F.length("text")).collect()]
    b = [r[0] for r in tgt.select(F.length("text")).collect()]
    expected = _scipy_ks(np.array(a, float), np.array(b, float))
    assert abs(got.ks_stat - expected) < 1e-12
    assert got.n_source == 1000


def test_ks_identical_is_zero(spark, transcripts):
    got = ks_statistic(transcripts, transcripts, F.length("text")).collect()[0]
    assert got.ks_stat == 0.0


def test_ks_binned_matches_exact_for_integers(spark, transcripts):
    tgt = spark.table("transcripts_target")
    exact = ks_statistic(transcripts, tgt, F.length("text")).collect()[0]
    binned = ks_binned(transcripts, tgt, F.length("text"), 1).collect()[0]
    assert abs(exact.ks_stat - binned.ks_stat) < 1e-12


def test_ks_detects_shift(spark, transcripts):
    shifted = transcripts.withColumn("text", F.concat(F.col("text"), F.lit("xxxxxxxxxx")))
    got = ks_statistic(transcripts, shifted, F.length("text")).collect()[0]
    assert got.ks_stat > 0.5


def test_psi_identical_is_near_zero(spark, transcripts):
    got = psi(transcripts, transcripts, F.col("role")).collect()[0]
    assert abs(got.psi) < 1e-9
    v = psi_verdict(transcripts, transcripts, F.col("role")).collect()[0]
    assert v.validation_status == "success"


def test_psi_detects_category_shift(spark, transcripts):
    skewed = transcripts.withColumn(
        "role", F.when(F.col("role") == "user", "assistant").otherwise(F.col("role"))
    )
    got = psi(transcripts, skewed, F.col("role")).collect()[0]
    assert got.psi > 0.2
    v = psi_verdict(transcripts, skewed, F.col("role")).collect()[0]
    assert v.validation_status == "fail"


def test_drift_grouped_vectorized(spark, transcripts):
    tgt = spark.table("transcripts_target")
    out = drift_grouped(
        transcripts,
        tgt,
        F.date_format("ts", "yyyy-MM-dd"),
        F.length("text"),
        F.col("role"),
    ).collect()
    assert len(out) >= 29  # one row per day
    assert all(0.0 <= r.ks_stat <= 1.0 for r in out)
    assert all(r.psi >= -1e-9 for r in out)
    # spot-check one day against the exact distributed computation
    day = out[0].group_key
    s_day = transcripts.filter(F.date_format("ts", "yyyy-MM-dd") == day)
    t_day = tgt.filter(F.date_format("ts", "yyyy-MM-dd") == day)
    exact = ks_statistic(s_day, t_day, F.length("text")).collect()[0]
    got = [r for r in out if r.group_key == day][0]
    assert abs(got.ks_stat - exact.ks_stat) < 1e-12


def test_emd_identical_is_zero(spark, transcripts):
    got = emd_binned(transcripts, transcripts, F.length("text")).collect()[0]
    assert got.emd == 0.0


def test_emd_shift_equals_shift_size(spark, transcripts):
    # 1-Wasserstein of (X, X + k) is exactly k — the magnitude property
    # KS cannot express (KS saturates at its CDF-gap max regardless of k).
    shifted = transcripts.withColumn(
        "text", F.concat(F.col("text"), F.lit("x" * 7))
    )
    got = emd_binned(transcripts, shifted, F.length("text")).collect()[0]
    assert abs(got.emd - 7.0) < 1e-9
    assert got.n_source == got.n_target == 1000


def test_emd_matches_numpy(spark, transcripts):
    tgt = spark.table("transcripts_target")
    got = emd_binned(transcripts, tgt, F.length("text")).collect()[0]
    a = np.array(
        [r[0] for r in transcripts.select(F.length("text")).collect()], float
    )
    b = np.array(
        [r[0] for r in tgt.select(F.length("text")).collect()], float
    )
    # np analogue: integrate |F_a - F_b| over the union grid
    grid = np.sort(np.unique(np.concatenate([a, b])))
    ca = np.searchsorted(np.sort(a), grid, "right") / len(a)
    cb = np.searchsorted(np.sort(b), grid, "right") / len(b)
    expected = float(np.sum(np.abs(ca - cb)[:-1] * np.diff(grid)))
    assert abs(got.emd - round(expected, 6)) < 1e-6


def test_emd_grouped_keys(spark, transcripts):
    tgt = spark.table("transcripts_target")
    s = transcripts.select(F.col("role"), F.length("text").alias("len"))
    t = tgt.select(F.col("role"), F.length("text").alias("len"))
    out = emd_binned(s, t, F.col("len"), group_cols=["role"]).collect()
    roles = {r.role for r in out}
    assert roles == {
        r.role for r in transcripts.select("role").distinct().collect()
    }
    assert all(r.emd >= 0.0 for r in out)


def test_schema_matching_reference_semantics():
    # mirrors reference schema_validation.py:120-229 branches
    res = schema_validation_matching(
        {"ID": "bigint", "a": "string", "only_src": "int",
         "widen": "int", "dec": "decimal(10,2)"},
        {"id": "bigint", "A": "string", "only_tgt": "double",
         "widen": "bigint", "dec": "decimal(20,4)"},
    )
    by_col = {(r[0], r[1]): r[4] for r in res}
    assert by_col[("id", "id")] == "success"  # casefold match
    assert by_col[("a", "a")] == "success"
    assert by_col[("only_src", "N/A")] == "fail"
    assert by_col[("N/A", "only_tgt")] == "fail"
    assert by_col[("widen", "widen")] == "success"  # int -> bigint widening
    assert by_col[("dec", "dec")] == "success"  # decimal widening


def test_schema_allow_list_and_exclusion():
    res = schema_validation_matching(
        {"a": "string", "b": "int", "c": "date"},
        {"a": "binary", "b": "int", "c": "timestamp"},
        exclusion_fields=["c"],
        allow_list="string:binary",
    )
    by_col = {r[0]: r[4] for r in res}
    assert by_col["a"] == "success"  # allow-listed
    assert "c" not in by_col  # excluded


def test_schema_allow_list_range_expansion():
    """Reference --allow-list range syntax (schema_validation.py:252-329):
    'decimal(2-4,0):int' covers decimal(2,0)/(3,0)/(4,0); commas inside
    (precision,scale) do not split pairs."""
    import pytest

    from professional_services_data_validator_spark.schema_validation import (
        expand_type_ranges,
        parse_allow_list,
    )

    assert expand_type_ranges("decimal(1-3,0)") == [
        "decimal(1,0)", "decimal(2,0)", "decimal(3,0)"
    ]
    assert expand_type_ranges("decimal(38,0-2)") == [
        "decimal(38,0)", "decimal(38,1)", "decimal(38,2)"
    ]
    assert expand_type_ranges("int64") == ["int64"]

    allow = parse_allow_list("decimal(2-3,0-1):int,string:binary")
    assert allow["decimal(2,0)"] == {"int"}
    assert allow["decimal(3,1)"] == {"int"}
    assert allow["string"] == {"binary"}

    # comma inside parens on both sides of the colon
    allow2 = parse_allow_list("decimal(38,9):decimal(38,18)")
    assert allow2 == {"decimal(38,9)": {"decimal(38,18)"}}

    with pytest.raises(ValueError, match="lower"):
        parse_allow_list("decimal(5-2,0):int")
    with pytest.raises(ValueError, match="invalid allow-list"):
        parse_allow_list("string-binary")

    # end-to-end through the matcher
    res = schema_validation_matching(
        {"d": "decimal(3,0)"},
        {"d": "int"},
        allow_list="decimal(2-4,0):int",
    )
    assert res[0][4] == "success"


def test_schema_report_shape(spark, transcripts):
    tgt = spark.table("transcripts_target")
    rep = schema_validation_report(spark, transcripts, tgt)
    rows = rep.collect()
    assert all(r.validation_type == "Schema" for r in rows)
    assert all(r.validation_status == "success" for r in rows)
    assert len(rows) == len(transcripts.columns)
    mismatched = schema_validation_report(
        spark, transcripts, tgt.withColumn("extra", F.lit(1))
    ).collect()
    assert any(
        r.validation_status == "fail" and r.target_column_name == "extra"
        for r in mismatched
    )


def test_cramers_v_extremes(spark):
    from professional_services_data_validator_spark.operators.drift import (
        cramers_v,
    )

    # perfect 2x2 association -> V = 1; constant column -> NULL (dof 0)
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")] * 3,
        "u string, v string",
    )
    r = cramers_v(df, F.col("u"), F.col("v"), "u:v").collect()[0]
    assert r["pair"] == "u:v" and r["n"] == 12
    assert r["r"] == 2 and r["c"] == 2 and r["dof"] == 1
    assert r["cramers_v"] == 1.0

    const = spark.createDataFrame(
        [("a", "x"), ("b", "x")], "u string, v string"
    )
    r2 = cramers_v(const, F.col("u"), F.col("v")).collect()[0]
    assert r2["cramers_v"] is None and r2["chi2"] == 0.0


def test_char_ngrams_short_rows_contribute_nothing(spark):
    from professional_services_data_validator_spark.operators.text import (
        char_ngrams,
    )

    df = spark.createDataFrame(
        [(1, "abc"), (2, "x"), (3, ""), (4, None)], "id long, text string"
    )
    got = sorted(
        r["ng"] for r in char_ngrams(df, "text").collect()
    )
    assert got == ["ab", "bc"]
