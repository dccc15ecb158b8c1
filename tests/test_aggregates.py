"""Aggregate builder, '*'-expansion pre-calcs, salting, sampling,
partition boundaries."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from professional_services_data_validator_spark.config import AggregateSpec
from professional_services_data_validator_spark.operators.aggregates import (
    build_aggregate_specs,
    column_stats,
)
from professional_services_data_validator_spark.operators.partitioning import (
    partition_boundaries,
    salted_agg,
)
from professional_services_data_validator_spark.operators.sampling import (
    deterministic_sample,
)


def test_single_pass_all_aggregates(spark, transcripts):
    aggs = [
        AggregateSpec("count"),
        AggregateSpec("count", "tool"),
        AggregateSpec("min", "turn_idx"),
        AggregateSpec("max", "turn_idx"),
        AggregateSpec("sum", "turn_idx"),
        AggregateSpec("avg", "turn_idx"),
        AggregateSpec("std", "turn_idx"),
        AggregateSpec("bit_xor", "event_id"),
        AggregateSpec("sum", "text", precalc="length"),
        AggregateSpec("sum", "ts", precalc="epoch_seconds"),
    ]
    row = column_stats(transcripts, aggs).collect()[0]
    assert row["count"] == 1000
    assert row["count__tool"] == 100  # role='tool' on event_id%10==9
    assert row["min__turn_idx"] == 0
    # single-pass plan: exactly one aggregate exchange
    plan = column_stats(transcripts, aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial+final agg, no extra joins


def test_null_rate_from_same_pass(spark, transcripts):
    row = column_stats(
        transcripts, [AggregateSpec("count"), AggregateSpec("count", "tool")]
    ).collect()[0]
    null_rate = (row["count"] - row["count__tool"]) / row["count"]
    assert abs(null_rate - 0.9) < 0.05


def test_star_expansion_precalcs(spark, transcripts):
    specs = build_aggregate_specs(
        transcripts.drop("event_id"), ["sum", "min", "count"]
    )
    by_name = {s.validation_name: s for s in specs}
    assert by_name["sum__text"].precalc == "length"  # string -> length
    assert by_name["sum__ts"].precalc == "epoch_seconds"  # ts -> epoch
    assert by_name["sum__turn_idx"].precalc is None  # int native
    assert "count" in by_name  # COUNT(*) always present
    # min/max keep native types (no precalc)
    assert by_name["min__text"].precalc is None
    # all specs aggregate in one pass without error
    column_stats(transcripts.drop("event_id"), specs).collect()


def test_grouped_timestamp_auto_date_cast(spark, transcripts):
    out = column_stats(
        transcripts, [AggregateSpec("count")], group_by=["ts"]
    )
    assert dict(out.dtypes)["ts"] == "date"
    # reference query_builder.py:251-252 semantics: groups by calendar day
    n_days = out.count()
    assert 29 <= n_days <= 31  # events span 2024-01-01..01-30


def test_salted_agg_exact(spark, transcripts):
    direct = (
        transcripts.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("turn_idx").alias("s"),
            F.avg("turn_idx").alias("a"),
            F.stddev_samp("turn_idx").alias("sd"),
            F.min("ts").alias("mn"),
        )
    )
    salted = salted_agg(
        transcripts,
        ["conv_id"],
        {
            "n": ("count", None),
            "s": ("sum", "turn_idx"),
            "a": ("avg", "turn_idx"),
            "sd": ("std", "turn_idx"),
            "mn": ("min", "ts"),
        },
        n_salts=8,
        salt_source=F.pmod(F.col("event_id"), F.lit(8)),
    )
    d = {r.conv_id: r for r in direct.collect()}
    s = {r.conv_id: r for r in salted.collect()}
    assert set(d) == set(s)
    for k in d:
        assert d[k].n == s[k].n and d[k].s == s[k].s and d[k].mn == s[k].mn
        assert abs(d[k].a - s[k].a) < 1e-9
        if d[k].sd is not None:
            assert abs(d[k].sd - s[k].sd) < 1e-6


def test_salted_agg_default_salt_spreads_hot_group(spark):
    """Regression for the round-1 default-salt no-op: salting a frame whose
    FIRST column is the group key must still spread the hot group across
    multiple phase-1 reducers, and the result must equal the direct agg."""
    from professional_services_data_validator_spark.operators.partitioning import (
        default_salt,
    )

    # one hot key with 4000 rows, a cold key with 10 — first column IS the key
    hot = spark.range(4000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(10).select(
        F.lit("cold").alias("k"), (F.col("id") + 100).alias("v")
    )
    df = hot.unionByName(cold).repartition(8)

    n_distinct = (
        df.withColumn("__salt", default_salt(16))
        .groupBy("k")
        .agg(F.countDistinct("__salt").alias("d"))
        .collect()
    )
    by_key = {r.k: r.d for r in n_distinct}
    assert by_key["hot"] > 1, "default salt failed to spread the hot group"

    salted = salted_agg(
        df, ["k"], {"n": ("count", None), "s": ("sum", "v"), "a": ("avg", "v")}
    )
    direct = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.avg("v").alias("a")
    )
    d = {r.k: r for r in direct.collect()}
    s = {r.k: r for r in salted.collect()}
    assert set(d) == set(s)
    for k in d:
        assert d[k].n == s[k].n and d[k].s == s[k].s
        assert abs(d[k].a - s[k].a) < 1e-9


def test_deterministic_sample_stable(spark, transcripts):
    s1 = deterministic_sample(transcripts, ["conv_id", "turn_idx"], n=50)
    s2 = deterministic_sample(
        transcripts.repartition(13), ["conv_id", "turn_idx"], n=50
    )
    k1 = sorted((r.conv_id, r.turn_idx) for r in s1.collect())
    k2 = sorted((r.conv_id, r.turn_idx) for r in s2.collect())
    assert k1 == k2 and len(k1) == 50


def test_partition_boundaries(spark, transcripts):
    b = partition_boundaries(transcripts, ["conv_id", "turn_idx"], 4).collect()
    assert len(b) == 4
    assert [r.partition_idx for r in b] == [0, 1, 2, 3]
    # first boundary is the global min PK
    assert b[0].conv_id == "c0" and b[0].turn_idx == 0


def test_filters_applied(spark, transcripts):
    from professional_services_data_validator_spark.config import FilterSpec

    out = column_stats(
        transcripts,
        [AggregateSpec("count")],
        filters=[FilterSpec("custom", source="role = 'user'")],
    ).collect()[0]
    expected = transcripts.filter("role = 'user'").count()
    assert out["count"] == expected


def test_calc_field_chain(spark):
    from professional_services_data_validator_spark.config import (
        CalculatedFieldSpec,
    )
    from professional_services_data_validator_spark.functions.calculated import (
        apply_calculated_fields,
        build_row_hash,
    )

    df = spark.createDataFrame(
        [Row(a="x ", b=None), Row(a="y", b="z")],
        schema="a string, b string",
    )
    out = apply_calculated_fields(
        df,
        [
            CalculatedFieldSpec("ifnull", "b0", ("b",), depth=0),
            CalculatedFieldSpec("rstrip", "a0", ("a",), depth=0),
            CalculatedFieldSpec("concat", "cc", ("a0", "b0"), depth=1),
            CalculatedFieldSpec("length", "ln", ("cc",), depth=2),
        ],
    ).collect()
    assert out[0].cc == "xDEFAULT_REPLACEMENT_STRING"
    assert out[1].cc == "yz" and out[1].ln == 2

    hashed = build_row_hash(df, ["a", "b"]).collect()
    import hashlib

    exp = hashlib.sha256(b"xDEFAULT_REPLACEMENT_STRING").hexdigest()
    assert hashed[0].hash__all == exp
