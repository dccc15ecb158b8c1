"""Partition manifest + resumable runs + hardened report sink.

Reference analog: generate-table-partitions emits one runnable YAML config
per PK-range partition (partition_builder.py:361-430); a partition that
already ran is not re-submitted. Here the manifest is a table consumed by
LineageStore.pending_partitions, and the skip predicate is one pushdown-able
WHERE clause.
"""

import glob
import os

from pyspark.sql import functions as F

from professional_services_data_validator_spark.lineage import (
    LineageStore,
    resumable_run,
)
from professional_services_data_validator_spark.operators.partitioning import (
    assign_partition_id,
    partition_boundaries,
    partition_manifest,
    partition_where_clauses,
    pending_where,
)


def test_boundaries_match_global_window_semantics(spark, transcripts):
    """The distributed (range-partition + prefix-sum) implementation must
    reproduce the single-reducer row_number formulation exactly."""
    from pyspark.sql import Window

    keys = ["conv_id", "turn_idx"]
    got = partition_boundaries(transcripts, keys, 4).collect()

    w = Window.orderBy(*keys)
    total = transcripts.count()
    step = -(-total // 4)
    ref = (
        transcripts.select(*keys)
        .withColumn("__rn", F.row_number().over(w))
        .filter(((F.col("__rn") - 1) % step) == 0)
        .withColumn("partition_idx", ((F.col("__rn") - 1) / step).cast("int"))
        .select("partition_idx", *keys)
        .orderBy("partition_idx")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]


def test_boundaries_no_unpartitioned_window(spark, transcripts):
    """The plan must not move all rows to one reducer: every Window in the
    physical plan partitions by the physical partition id."""
    keys = ["conv_id", "turn_idx"]
    kc = [F.col(k) for k in keys]
    ranged = (
        transcripts.select(*keys)
        .repartitionByRange(8, *kc)
        .sortWithinPartitions(*kc)
        .withColumn("__pid", F.spark_partition_id())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__pid").orderBy(*kc)
    staged = ranged.withColumn("__rn", F.row_number().over(w))
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_where_clauses_partition_the_table(spark, transcripts):
    keys = ["conv_id", "turn_idx"]
    rows = partition_boundaries(transcripts, keys, 4).collect()
    clauses = partition_where_clauses(rows, keys)
    assert len(clauses) == 4
    counts = [transcripts.filter(F.expr(c)).count() for c in clauses]
    assert sum(counts) == transcripts.count()  # disjoint + exhaustive
    step = -(-transcripts.count() // 4)
    assert all(c <= step for c in counts)


def test_assign_partition_id_agrees_with_clauses(spark, transcripts):
    keys = ["conv_id", "turn_idx"]
    rows = partition_boundaries(transcripts, keys, 4).collect()
    clauses = partition_where_clauses(rows, keys)
    assigned = transcripts.withColumn(
        "pid", assign_partition_id(keys, rows)
    )
    for i, c in enumerate(clauses):
        n_clause = transcripts.filter(F.expr(c)).count()
        n_assigned = assigned.filter(F.col("pid") == str(i)).count()
        assert n_clause == n_assigned, f"partition {i}"


def test_resume_skips_passed_partitions(spark, transcripts, tmp_path):
    """Kill-and-resume: after partitions 0/1 record success, a resumed run
    sees only 2/3 pending, and its scan predicate covers exactly those
    rows."""
    keys = ["conv_id", "turn_idx"]
    store = LineageStore(spark, str(tmp_path / "lineage"))
    manifest = partition_manifest(transcripts, keys, 4)
    cfg_hash, stage = "cfgX", "Row"

    ids = {
        r["partition_idx"]: r["partition_id"] for r in manifest.collect()
    }
    # ids are value-derived (hash of the boundary predicate), not ordinals:
    # a changed table changes the clause, hence the id, hence forces a re-run
    assert all(len(v) == 12 and not v.isdigit() for v in ids.values())

    # simulate a run that died after validating partitions 0 and 1
    first_two = manifest.filter(
        F.col("partition_idx").isin(0, 1)
    ).select(
        "partition_id",
        F.lit("{}").alias("metrics"),
        F.lit("success").alias("validation_status"),
    )
    store.append_verdicts(first_two, cfg_hash, "run1", stage)

    seen = {}

    def run_fn(pending):
        rows = sorted(r["partition_id"] for r in pending.collect())
        seen["pending"] = rows
        return pending.select(
            "partition_id",
            F.lit("{}").alias("metrics"),
            F.lit("success").alias("validation_status"),
        )

    resumable_run(store, manifest, cfg_hash, "run2", stage, run_fn)
    assert seen["pending"] == sorted([ids[2], ids[3]])
    # all four now pass; nothing pending on a third attempt
    assert store.pending_partitions(manifest, cfg_hash, stage).count() == 0

    # the resume predicate restricts the scan to the pending PK ranges only
    pending_before = manifest.filter(F.col("partition_idx").isin(2, 3))
    wc = pending_where(pending_before)
    n_pending_rows = transcripts.filter(F.expr(wc)).count()
    rows = sorted(
        manifest.collect(), key=lambda r: int(r["partition_idx"])
    )
    clause_rows = partition_where_clauses(
        [{k: r[f"{k}_lower"] for k in keys} for r in rows], keys
    )
    expected = sum(
        transcripts.filter(F.expr(c)).count() for c in clause_rows[2:]
    )
    assert n_pending_rows == expected
    # fully-passed manifest -> constant-false predicate (scan prunes to 0)
    assert pending_where(manifest.limit(0)) == "1 = 0"


def test_manifest_date_and_timestamp_keys(spark, transcripts):
    """ADVICE r2: date/timestamp partition keys must render as typed SQL
    literals (DATE '...' / TIMESTAMP '...'), not bare text that Spark
    parses as integer arithmetic."""
    by_day = transcripts.withColumn("day", F.col("ts").cast("date"))
    for key in ("day", "ts"):
        man = partition_manifest(by_day, [key, "event_id"], 3)
        rows = man.collect()
        assert len(rows) == 3
        lit = "DATE '" if key == "day" else "TIMESTAMP '"
        assert any(lit in r["where_clause"] for r in rows)
        counts = [
            by_day.filter(F.expr(r["where_clause"])).count() for r in rows
        ]
        assert sum(counts) == by_day.count()  # disjoint + exhaustive


def test_manifest_null_keys_not_dropped(spark):
    """ADVICE r2: NULL key values must stay assigned to some partition —
    comparisons like (k >= NULL) match nothing and silently drop rows."""
    rows = [(None, i) for i in range(10)] + [
        (f"c{i:02d}", i) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    man = partition_manifest(df, ["conv_id", "turn_idx"], 4)
    clauses = [r["where_clause"] for r in man.collect()]
    counts = [df.filter(F.expr(c)).count() for c in clauses]
    assert sum(counts) == 50  # NULL-key rows all covered, no double-count
    # and assign_partition_id agrees with the clauses on the NULL rows
    bounds = partition_boundaries(df, ["conv_id", "turn_idx"], 4).collect()
    assigned = df.withColumn(
        "pid", assign_partition_id(["conv_id", "turn_idx"], bounds)
    )
    assert assigned.filter(F.col("pid").isNull()).count() == 0


def test_manifest_empty_source(spark):
    """ADVICE r2: an empty source must produce an empty (typed) manifest,
    not a schema-inference crash."""
    df = spark.createDataFrame([], "conv_id string, turn_idx int, ts timestamp")
    man = partition_manifest(df, ["conv_id", "turn_idx"], 4)
    assert man.count() == 0
    assert set(man.columns) >= {
        "partition_id", "partition_idx", "where_clause",
        "conv_id_lower", "turn_idx_lower",
    }


def test_write_report_row_scale_path(spark, transcripts, tmp_path):
    """Row-level reports: partitioned parallel append — multiple part files,
    no coalesce(1); small column reports still produce one sorted file."""
    from professional_services_data_validator_spark.sources.sinks import (
        write_report,
    )

    big = transcripts.repartition(4).select(
        "conv_id",
        "turn_idx",
        F.lit("hash__all").alias("validation_name"),
        F.when(F.col("event_id") % 7 == 0, "fail")
        .otherwise("success")
        .alias("validation_status"),
    )
    out_big = str(tmp_path / "row_report")
    write_report(big, out_big, partition_by=["validation_status"])
    assert os.path.isdir(os.path.join(out_big, "validation_status=fail"))
    parts = glob.glob(os.path.join(out_big, "*", "*.parquet"))
    assert len(parts) > 1  # parallel write, not a single reducer
    back = spark.read.parquet(out_big)
    assert back.count() == transcripts.count()

    small = big.limit(5)
    out_small = str(tmp_path / "col_report")
    write_report(small, out_small, small=True)
    assert len(glob.glob(os.path.join(out_small, "*.parquet"))) == 1
