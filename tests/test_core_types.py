"""Type-coverage table (FIXTURES.md F3, modeled on the reference's
dvt_core_types shared fixture — reference
tests/resources/bigquery_test_tables.sql:13-31) driving every type-special-
case the reference implements: int widening, decimal precision, float
rounding, CHAR padding rstrip, date/timestamp epoch, binary byte_length,
bool-in-string casts."""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from professional_services_data_validator_spark.config import (
    AggregateSpec,
    ValidationConfig,
    consts,
)
from professional_services_data_validator_spark.operators.aggregates import (
    build_aggregate_specs,
    column_stats,
)
from professional_services_data_validator_spark.plans.compiler import (
    build_column_validation_report,
)

CORE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("col_int8", T.ByteType()),
        T.StructField("col_int16", T.ShortType()),
        T.StructField("col_int32", T.IntegerType()),
        T.StructField("col_int64", T.LongType()),
        T.StructField("col_dec_20", T.DecimalType(20, 0)),
        T.StructField("col_dec_38", T.DecimalType(38, 0)),
        T.StructField("col_dec_10_2", T.DecimalType(10, 2)),
        T.StructField("col_float32", T.FloatType()),
        T.StructField("col_float64", T.DoubleType()),
        T.StructField("col_varchar_30", T.StringType()),
        T.StructField("col_char_2", T.StringType()),
        T.StructField("col_string", T.StringType()),
        T.StructField("col_date", T.DateType()),
        T.StructField("col_datetime", T.TimestampNTZType()),
        T.StructField("col_tstz", T.TimestampType()),
        T.StructField("col_binary", T.BinaryType()),
        T.StructField("col_bool_str", T.StringType()),
    ]
)


def _rows():
    # 3 rows like the reference insert (bigquery_test_tables.sql:33-53)
    base = datetime.datetime(1970, 1, 1, 0, 0, 1)
    return [
        Row(
            id=i,
            col_int8=i,
            col_int16=i * 100,
            col_int32=i * 10_000,
            col_int64=i * 1_000_000,
            col_dec_20=Decimal(10**19 + i),
            col_dec_38=Decimal(10**37 + i),
            col_dec_10_2=Decimal(f"123.1{i}"),
            col_float32=float(f"123.45{i}"),
            col_float64=float(f"123.456{i}"),
            col_varchar_30=f"Hello DVT {i}",
            col_char_2=f"{chr(65 + i)} ",  # trailing-space CHAR padding
            col_string=f"row {i} string",
            col_date=datetime.date(1970, 1, i + 1),
            col_datetime=base + datetime.timedelta(days=i),
            col_tstz=(base + datetime.timedelta(days=i)).replace(
                tzinfo=datetime.timezone.utc
            ),
            col_binary=f"DVT{i}".encode(),
            col_bool_str="Y" if i % 2 else "0",
        )
        for i in range(3)
    ]


@pytest.fixture(scope="module")
def core(spark):
    return spark.createDataFrame(_rows(), schema=CORE_SCHEMA)


def test_star_expansion_covers_all_types(spark, core):
    specs = build_aggregate_specs(core, ["sum", "min", "max", "count"])
    by_name = {s.validation_name: s for s in specs}
    assert by_name["sum__col_varchar_30"].precalc == "length"
    assert by_name["sum__col_binary"].precalc == "byte_length"
    assert by_name["sum__col_date"].precalc == "epoch_seconds"
    assert by_name["sum__col_datetime"].precalc == "epoch_seconds"
    assert by_name["sum__col_tstz"].precalc == "epoch_seconds"
    assert by_name["sum__col_dec_38"].precalc is None  # native decimal
    row = column_stats(core, specs).collect()[0]
    assert row["sum__col_binary"] == 4 * 3  # 'DVT0'..'DVT2'
    assert row["sum__col_int64"] == 3_000_000
    # decimal(38) sums natively — no string workaround needed in Spark
    assert row["sum__col_dec_38"] == Decimal(3 * 10**37 + 3)


def test_int32_cast_to_bigint(spark, core):
    specs = build_aggregate_specs(
        core, ["sum"], columns=["col_int32"], cast_to_bigint=True
    )
    s = [x for x in specs if x.validation_name == "sum__col_int32"][0]
    assert s.precalc == "cast_bigint"
    out = column_stats(core, [s])
    assert dict(out.dtypes)["sum__col_int32"] == "bigint"


def test_decimal38_agg_value_string_roundtrip(spark, core):
    # the report casts agg_value to string — 38-digit decimals survive
    cfg = ValidationConfig(
        validation_type=consts.COLUMN_VALIDATION,
        aggregates=[AggregateSpec("sum", "col_dec_38")],
    )
    rep = build_column_validation_report(core, core, cfg).collect()[0]
    assert rep.source_agg_value == str(3 * 10**37 + 3)
    assert rep.validation_status == "success"
    # decimal difference goes through the float32-round-4 branch
    assert rep.difference == 0.0


def test_char_padding_rstrip_hash(spark, core):
    from professional_services_data_validator_spark.functions.calculated import (
        build_row_hash,
    )

    padded = core.select("id", "col_char_2")
    unpadded = core.select(
        "id", F.rtrim("col_char_2").alias("col_char_2")
    )
    h1 = {r.id: r.hash__all for r in build_row_hash(padded, ["col_char_2"]).collect()}
    h2 = {r.id: r.hash__all for r in build_row_hash(unpadded, ["col_char_2"]).collect()}
    assert h1 == h2  # rstrip in the chain erases CHAR padding differences


def test_bool_string_cast(spark, core):
    from professional_services_data_validator_spark.config import (
        CalculatedFieldSpec,
    )
    from professional_services_data_validator_spark.functions.calculated import (
        apply_calculated_fields,
    )

    out = apply_calculated_fields(
        core,
        [
            CalculatedFieldSpec(
                "cast", "b", ("col_bool_str",), target_type="bool_string"
            )
        ],
    ).select("id", "b").collect()
    vals = {r.id: r.b for r in out}
    assert vals[0] == "false" and vals[1] == "true"


def test_float_validation_rounding_branch(spark, core):
    # float64 aggregates diff through cast('float')+round(4)
    tgt = core.withColumn(
        "col_float64", F.col("col_float64") + F.lit(0.00001)
    )
    cfg = ValidationConfig(
        validation_type=consts.COLUMN_VALIDATION,
        aggregates=[AggregateSpec("sum", "col_float64")],
    )
    rep = build_column_validation_report(core, tgt, cfg).collect()[0]
    # 3e-5 total shift disappears at float32 round(4) on ~370 sums
    assert rep.validation_status == "success"


def test_timestamp_vs_date_epoch_aggs(spark, core):
    specs = [
        AggregateSpec("sum", "col_date", precalc="epoch_seconds"),
        AggregateSpec("sum", "col_tstz", precalc="epoch_seconds"),
        AggregateSpec("min", "col_tstz"),
        AggregateSpec("max", "col_datetime"),
    ]
    row = column_stats(core, specs).collect()[0]
    assert row["sum__col_date"] == sum(
        int(
            datetime.datetime(1970, 1, i + 1, tzinfo=datetime.timezone.utc)
            .timestamp()
        )
        for i in range(3)
    )
    assert isinstance(row["min__col_tstz"], datetime.datetime)


def test_schema_validation_core_types(spark, core):
    from professional_services_data_validator_spark.schema_validation import (
        schema_validation_report,
    )

    # target with narrowed + widened + missing columns
    tgt = (
        core.withColumn("col_int32", F.col("col_int32").cast("long"))  # widen ok
        .withColumn("col_int64", F.col("col_int64").cast("int"))  # narrow fail
        .drop("col_binary")
    )
    rep = {
        (r.source_column_name, r.validation_status)
        for r in schema_validation_report(spark, core, tgt).collect()
    }
    assert ("col_int32", "success") in rep  # widening passes w/ warning
    assert ("col_int64", "fail") in rep
    assert ("col_binary", "fail") in rep
