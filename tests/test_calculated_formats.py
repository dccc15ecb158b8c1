"""to_char format models + parameterized custom calc fields.

Reference parity targets: query_builder.py:334-339 (to_char default
'FM90.099'), operations.py:350-401 (engine to_char compilers),
README.md:768-795 (custom calculated fields with a params block, e.g.
TemporalValue.strftime '%m%d%Y').
"""

import datetime

import pytest
from pyspark.sql import functions as F

from professional_services_data_validator_spark.config import (
    CalculatedFieldSpec,
)
from professional_services_data_validator_spark.functions.calculated import (
    apply_calculated_fields,
    strftime_to_spark,
    to_char_date_pattern,
    to_char_number,
)


@pytest.mark.parametrize(
    "fmt,cases",
    [
        (
            "FM90.099",
            [
                (1.5, "1.5"),
                (0.0, "0.0"),
                (0.25, "0.25"),
                (1.125, "1.125"),
                (-0.5, "-0.5"),
                (99.875, "99.875"),
                (123.0, "#######"),  # overflow -> Oracle-style hash fill
                (None, None),
            ],
        ),
        (
            "FM99.99",
            [(1.5, "1.5"), (0.25, ".25"), (-0.5, "-.5"), (1.125, "1.13")],
        ),
        (
            "90.099",  # non-FM: full scale, right-justified with sign slot
            [(1.5, "  1.500"), (-0.5, " -0.500"), (99.875, " 99.875")],
        ),
        ("FM999", [(1.5, "2"), (0.0, "0"), (-0.5, "-1"), (123.0, "123")]),
    ],
)
def test_to_char_number_models(spark, fmt, cases):
    df = spark.createDataFrame([(v,) for v, _ in cases], "v double")
    got = [
        r.s
        for r in df.select(to_char_number(F.col("v"), fmt).alias("s"))
        .collect()
    ]
    assert got == [exp for _, exp in cases]


def test_to_char_number_rejects_bad_format():
    with pytest.raises(ValueError, match="number format"):
        to_char_number(F.lit(1.0), "FMABC")
    with pytest.raises(ValueError, match="number format"):
        to_char_number(F.lit(1.0), "9.9.9")


def test_to_char_date_pattern():
    assert to_char_date_pattern("YYYY-MM-DD HH24:MI:SS") == (
        "yyyy-MM-dd HH:mm:ss"
    )
    assert to_char_date_pattern("DD/MM/YY") == "dd/MM/yy"
    with pytest.raises(ValueError, match="date token"):
        to_char_date_pattern("YYYY-QQ")


def test_to_char_calc_field_dispatches_on_dtype(spark):
    df = spark.createDataFrame(
        [(1.5, datetime.datetime(2024, 3, 7, 14, 30, 5))], "v double, ts timestamp"
    )
    out = apply_calculated_fields(
        df,
        [
            CalculatedFieldSpec("to_char", "n", ("v",)),  # default FM90.099
            CalculatedFieldSpec(
                "to_char", "d", ("ts",), expr="YYYY-MM-DD HH24:MI:SS"
            ),
        ],
    ).collect()[0]
    assert out.n == "1.5"
    assert out.d == "2024-03-07 14:30:05"


# --- parameterized custom calc fields (reference README params block) ------


def test_strftime_translation():
    assert strftime_to_spark("%m%d%Y") == "MMddyyyy"  # README example
    assert strftime_to_spark("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert strftime_to_spark("%d of %m") == "dd 'o''f' MM"  # literals quoted
    with pytest.raises(ValueError, match="strftime token"):
        strftime_to_spark("%Q")


@pytest.mark.parametrize(
    "expr,params,src,expected",
    [
        ("strftime", [{"format_str": "%m%d%Y"}], "ts", "03072024"),
        ("replace", {"pattern": "b", "replacement": "X"}, "s", "aXc"),
        ("round", {"digits": 1}, "v", 1.2),
        ("substr", {"start": 2, "length": 2}, "s", "bc"),
        ("left", {"nchars": 2}, "s", "ab"),
        ("lpad", {"length": 5, "pad": "0"}, "s", "00abc"),
    ],
)
def test_param_funcs(spark, expr, params, src, expected):
    df = spark.createDataFrame(
        [("abc", 1.23, datetime.datetime(2024, 3, 7))],
        "s string, v double, ts timestamp",
    )
    out = apply_calculated_fields(
        df,
        [CalculatedFieldSpec("custom", "o", (src,), expr=expr, params=params)],
    ).collect()[0]
    assert out.o == expected


def test_unknown_custom_expr_still_raises(spark):
    df = spark.createDataFrame([("x",)], "s string")
    with pytest.raises(ValueError, match="allowlist"):
        apply_calculated_fields(
            df,
            [CalculatedFieldSpec("custom", "o", ("s",), expr="__import__")],
        )
