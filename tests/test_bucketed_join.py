"""Bucketed co-located row validation: the 100-TB join strategy, proven at
the plan level. With both sides bucketed+sorted on the PK, the full-outer
SortMergeJoin runs with ZERO Exchange operators — the shuffle that dominates
row validation at 10^12 turns disappears into the storage layout (Iceberg
analog: bucket partition transform + sorted files)."""

from pyspark.sql import functions as F

from professional_services_data_validator_spark.operators import row_violations
from professional_services_data_validator_spark.sources.sinks import (
    write_bucketed_table,
)


def test_bucketed_pk_join_is_shuffle_free(spark, transcripts):
    src = transcripts.drop("event_id", "ts")
    tgt = spark.table("transcripts_target").drop("event_id", "ts")
    pks = ["conv_id", "turn_idx"]
    try:
        write_bucketed_table(src, "bkt_src", pks, n_buckets=8)
        write_bucketed_table(tgt, "bkt_tgt", pks, n_buckets=8)
        bsrc, btgt = spark.table("bkt_src"), spark.table("bkt_tgt")

        violations = row_violations(bsrc, btgt, pks, hash_columns="*")
        plan = (
            violations._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, (
            "bucketed PK join should be shuffle-free:\n" + plan[:2000]
        )

        # and the result matches the unbucketed computation exactly
        expect = {
            tuple(r)
            for r in row_violations(src, tgt, pks, hash_columns="*")
            .select(*pks, "violation_type")
            .collect()
        }
        got = {
            tuple(r)
            for r in violations.select(*pks, "violation_type").collect()
        }
        assert got == expect and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_src")
        spark.sql("DROP TABLE IF EXISTS bkt_tgt")


def test_bucketed_aggregation_avoids_exchange(spark, transcripts):
    """groupBy on the bucket key also reuses the storage distribution: no
    Exchange before the aggregate."""
    try:
        write_bucketed_table(
            transcripts.drop("event_id", "ts"), "bkt_agg", ["conv_id"],
            n_buckets=8,
        )
        t = spark.table("bkt_agg")
        agg = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert agg.count() == transcripts.select("conv_id").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_agg")


def test_bucketed_snapshot_diff_is_shuffle_free(spark, transcripts):
    """The incremental-validation join inherits the same 100-TB strategy:
    with both snapshot versions bucketed+sorted on the PK, snapshot_diff's
    full-outer join plans with ZERO Exchange operators (Iceberg analog:
    bucket partition transform on both snapshots)."""
    from professional_services_data_validator_spark.operators.snapshot import (
        snapshot_diff_rows,
    )

    src = transcripts.drop("event_id", "ts")
    tgt = spark.table("transcripts_target").drop("event_id", "ts")
    pks = ["conv_id", "turn_idx"]
    try:
        write_bucketed_table(src, "bkt_snap_old", pks, n_buckets=8)
        write_bucketed_table(tgt, "bkt_snap_new", pks, n_buckets=8)
        old, new = spark.table("bkt_snap_old"), spark.table("bkt_snap_new")

        delta = snapshot_diff_rows(old, new, pks)
        plan = delta._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (
            "bucketed snapshot diff should be shuffle-free:\n" + plan[:2000]
        )

        # values match the unbucketed computation
        expect = {
            tuple(r)
            for r in snapshot_diff_rows(src, tgt, pks)
            .select(*pks, "diff_status").collect()
        }
        got = {
            tuple(r)
            for r in delta.select(*pks, "diff_status").collect()
        }
        assert got == expect and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_snap_old")
        spark.sql("DROP TABLE IF EXISTS bkt_snap_new")
