"""Golden combiner tests.

Ported case-for-case from reference tests/unit/test_combiner.py semantics:
count mismatch -> fail with difference/pct_difference; missing target group
-> NULL-filled fail row; both-null agg -> success; one-side-null in the
numeric branch -> success (reference combiner.py:195-204 falls to else_);
one-side-null in the value branch -> fail (combiner.py:159-171).
"""

import pytest
from pyspark.sql import Row

from professional_services_data_validator_spark.combiner import generate_report
from professional_services_data_validator_spark.config import consts
from professional_services_data_validator_spark.metadata import (
    RunMetadata,
    ValidationMeta,
)


def _meta(name, field_type="bigint", threshold=0.0, vtype="Column", agg="count"):
    return ValidationMeta(
        name=name,
        validation_type=vtype,
        aggregation_type=agg,
        source_table_name="src_tbl",
        source_column_name=None,
        target_table_name="tgt_tbl",
        target_column_name=None,
        threshold=threshold,
        field_type=field_type,
    )


def _report(spark, src_rows, tgt_rows, metas, join_on=(), value_cmp=False,
            schema=None):
    src = spark.createDataFrame(src_rows, schema=schema)
    tgt = spark.createDataFrame(tgt_rows, schema=schema)
    rm = RunMetadata(validations={m.name: m for m in metas})
    return generate_report(
        src, tgt, rm, join_on_fields=join_on, is_value_comparison=value_cmp
    ).collect()


def test_count_mismatch_fails(spark):
    # reference test_combiner.py: count 1 vs 2 -> difference 1, pct 100, fail
    rows = _report(spark, [Row(count=1)], [Row(count=2)], [_meta("count")])
    r = rows[0]
    assert r.validation_name == "count"
    assert r.source_agg_value == "1" and r.target_agg_value == "2"
    assert r.difference == 1.0 and r.pct_difference == 100.0
    assert r.validation_status == consts.VALIDATION_STATUS_FAIL
    assert r.source_table_name == "src_tbl" and r.target_table_name == "tgt_tbl"
    assert r.group_by_columns is None


def test_count_match_succeeds(spark):
    rows = _report(spark, [Row(count=5)], [Row(count=5)], [_meta("count")])
    assert rows[0].validation_status == consts.VALIDATION_STATUS_SUCCESS
    assert rows[0].difference == 0.0 and rows[0].pct_difference == 0.0


def test_both_zero_succeeds(spark):
    # 0 vs 0: difference==0 -> pct 0 (not NaN), success
    rows = _report(spark, [Row(count=0)], [Row(count=0)], [_meta("count")])
    assert rows[0].validation_status == consts.VALIDATION_STATUS_SUCCESS
    assert rows[0].pct_difference == 0.0


def test_source_zero_uses_target_denominator(spark):
    # reference combiner.py:175-184: denom = target when source == 0
    rows = _report(spark, [Row(count=0)], [Row(count=4)], [_meta("count")])
    assert rows[0].difference == 4.0
    assert rows[0].pct_difference == 100.0
    assert rows[0].validation_status == consts.VALIDATION_STATUS_FAIL


def test_threshold_within_passes(spark):
    rows = _report(
        spark, [Row(count=100)], [Row(count=105)], [_meta("count", threshold=25.0)]
    )
    assert rows[0].pct_difference == 5.0
    assert rows[0].pct_threshold == 25.0
    assert rows[0].validation_status == consts.VALIDATION_STATUS_SUCCESS


def test_threshold_exceeded_fails(spark):
    rows = _report(
        spark, [Row(count=100)], [Row(count=150)], [_meta("count", threshold=25.0)]
    )
    assert rows[0].validation_status == consts.VALIDATION_STATUS_FAIL


def test_both_null_numeric_succeeds(spark):
    # reference combiner.py:195-199
    rows = _report(
        spark,
        [Row(s=None)],
        [Row(s=None)],
        [_meta("s", field_type="bigint", agg="sum")],
        schema="s bigint",
    )
    assert rows[0].validation_status == consts.VALIDATION_STATUS_SUCCESS
    assert rows[0].source_agg_value is None and rows[0].target_agg_value is None


def test_one_side_null_numeric_succeeds_reference_quirk(spark):
    # reference quirk: th_diff NULL -> falls through to else_ -> success
    # (combiner.py:195-204)
    rows = _report(
        spark,
        [Row(s=None)],
        [Row(s=7)],
        [_meta("s", agg="sum")],
        schema="s bigint",
    )
    assert rows[0].validation_status == consts.VALIDATION_STATUS_SUCCESS
    assert rows[0].difference is None


def test_one_side_null_value_comparison_fails(spark):
    # value branch: NULL == x -> NULL -> fail (combiner.py:159-171)
    rows = _report(
        spark,
        [Row(v="a")],
        [Row(v=None)],
        [_meta("v", field_type="string", vtype="Row", agg=None)],
        schema="v string",
        value_cmp=True,
    )
    assert rows[0].validation_status == consts.VALIDATION_STATUS_FAIL
    assert rows[0].difference is None and rows[0].pct_difference is None


def test_value_comparison_both_null_succeeds(spark):
    rows = _report(
        spark,
        [Row(v=None)],
        [Row(v=None)],
        [_meta("v", field_type="string")],
        schema="v string",
        value_cmp=True,
    )
    assert rows[0].validation_status == consts.VALIDATION_STATUS_SUCCESS


def test_grouped_missing_target_group_fails(spark):
    # a group present in source only: differences row missing -> status NULL
    # -> filled 'fail' (reference combiner.py:103); source values retained.
    rows = _report(
        spark,
        [Row(g="a", count=3), Row(g="b", count=4)],
        [Row(g="a", count=3)],
        [_meta("count")],
        join_on=("g",),
        schema="g string, count bigint",
    )
    by_group = {r.group_by_columns: r for r in rows}
    assert by_group['{"g": "a"}'].validation_status == "success"
    b = by_group['{"g": "b"}']
    assert b.validation_status == "fail"
    assert b.source_agg_value == "3" or b.source_agg_value == "4"
    assert b.target_agg_value is None
    assert b.difference is None and b.pct_threshold is None


def test_grouped_extra_target_group_fails(spark):
    rows = _report(
        spark,
        [Row(g="a", count=3)],
        [Row(g="a", count=3), Row(g="z", count=9)],
        [_meta("count")],
        join_on=("g",),
        schema="g string, count bigint",
    )
    by_group = {r.group_by_columns: r for r in rows}
    z = by_group['{"g": "z"}']
    assert z.validation_status == "fail"
    assert z.source_agg_value is None and z.target_agg_value == "9"
    # table names are filled for non-custom-query validations
    # (reference combiner.py:106-113)
    assert z.source_table_name == "src_tbl"


def test_schema_mismatch_raises(spark):
    # reference combiner.py:69-73
    src = spark.createDataFrame([Row(a=1)])
    tgt = spark.createDataFrame([Row(b=1)])
    rm = RunMetadata(validations={"a": _meta("a")})
    with pytest.raises(ValueError, match="same schema"):
        generate_report(src, tgt, rm)


def test_float_rounding_branch(spark):
    # decimal/double compared after cast('float')+round(4)
    # (reference combiner.py:132-142)
    rows = _report(
        spark,
        [Row(avg=1.00001)],
        [Row(avg=1.000011)],
        [_meta("avg", field_type="double", agg="avg")],
        schema="avg double",
    )
    # rounds to 1.0 on both sides -> difference 0 -> success
    assert rows[0].validation_status == consts.VALIDATION_STATUS_SUCCESS
    assert rows[0].difference == 0.0


def test_timestamp_epoch_difference(spark):
    import datetime

    t1 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    t2 = datetime.datetime(2024, 1, 1, 0, 0, 10)
    rows = _report(
        spark,
        [Row(mx=t1)],
        [Row(mx=t2)],
        [_meta("mx", field_type="timestamp", agg="max")],
        schema="mx timestamp",
    )
    assert rows[0].difference == 10.0
    assert rows[0].validation_status == consts.VALIDATION_STATUS_FAIL


def test_report_has_20_reference_columns(spark):
    from professional_services_data_validator_spark.combiner import REPORT_COLUMNS

    src = spark.createDataFrame([Row(count=1)])
    tgt = spark.createDataFrame([Row(count=1)])
    rm = RunMetadata(validations={"count": _meta("count")})
    rep = generate_report(src, tgt, rm)
    assert rep.columns == REPORT_COLUMNS
    assert len(REPORT_COLUMNS) == 20


def test_group_key_json_escaping_round_trips(spark):
    """Round-4 regression: group-key values containing quotes, backslashes
    or control characters must still produce VALID JSON (Java replaceAll
    replacement semantics ate the backslash in the quote escape, so any
    quoted text in a join key emitted unparseable group_by_columns)."""
    import json

    from professional_services_data_validator_spark.combiner import (
        _group_by_columns_json,
    )

    values = ['a"b', "c\\d", "e\nf", 'q\t"\\x', "plain"]
    df = spark.createDataFrame([(v,) for v in values], "k string")
    out = [
        r[0]
        for r in df.select(
            _group_by_columns_json(("k",)).alias("j")
        ).collect()
    ]
    assert sorted(json.loads(j)["k"] for j in out) == sorted(values)
