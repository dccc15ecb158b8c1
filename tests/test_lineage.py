"""Lineage store: checkpoint, resume-skip, idempotent replay."""

import tempfile

from pyspark.sql import functions as F

from professional_services_data_validator_spark.lineage import (
    LineageStore,
    config_hash,
    resumable_run,
)
from professional_services_data_validator_spark.operators.row_compare import (
    row_compare_verdicts,
)


def _day_verdicts(spark, src, tgt, days=None):
    s, t = src.drop("event_id"), tgt.drop("event_id")
    if days is not None:
        s = s.filter(F.date_format("ts", "yyyy-MM-dd").isin(days))
        t = t.filter(F.date_format("ts", "yyyy-MM-dd").isin(days))
    return row_compare_verdicts(
        s, t, ["conv_id", "turn_idx", "ts"],
        partition_col=F.date_format("ts", "yyyy-MM-dd"),
    )


def test_checkpoint_and_resume(spark, transcripts):
    tgt = spark.table("transcripts_target")
    with tempfile.TemporaryDirectory() as d:
        store = LineageStore(spark, d + "/lineage")
        ch = config_hash({"check": "row_hash", "pks": ["conv_id", "turn_idx"]})

        verdicts = _day_verdicts(spark, transcripts, tgt)
        store.append_verdicts(verdicts, ch, "run-1", "row_compare")

        n_days = verdicts.count()
        passed = store.passed_partitions(ch, "row_compare")
        n_passed = passed.count()
        assert 0 < n_passed < n_days  # defect days fail, clean days pass

        manifest = verdicts.select("partition_id")
        pending = store.pending_partitions(manifest, ch, "row_compare")
        assert pending.count() == n_days - n_passed

        # different config hash -> nothing is skipped
        other = config_hash({"check": "other"})
        assert store.pending_partitions(manifest, other, "row_compare").count() == n_days


def test_idempotent_replay_takes_latest(spark, transcripts):
    tgt = spark.table("transcripts_target")
    with tempfile.TemporaryDirectory() as d:
        store = LineageStore(spark, d + "/lineage")
        ch = config_hash({"v": 1})
        v1 = _day_verdicts(spark, transcripts, tgt)
        store.append_verdicts(v1, ch, "run-1", "row_compare")
        # replay the same partitions against a FIXED target: all pass now
        v2 = _day_verdicts(spark, transcripts, transcripts)
        import time

        time.sleep(1.1)  # ensure later ts wins
        store.append_verdicts(v2, ch, "run-2", "row_compare")
        passed = store.passed_partitions(ch, "row_compare")
        assert passed.count() == v1.count()  # latest verdicts all success


def test_resumable_run_skips_passed(spark, transcripts):
    tgt = spark.table("transcripts_target")
    with tempfile.TemporaryDirectory() as d:
        store = LineageStore(spark, d + "/lineage")
        ch = config_hash({"v": 2})
        all_verdicts = _day_verdicts(spark, transcripts, tgt)
        manifest = all_verdicts.select("partition_id")
        ran_days = []

        def run_fn(pending):
            days = [r.partition_id for r in pending.collect()]
            ran_days.append(days)
            return _day_verdicts(spark, transcripts, tgt, days)

        resumable_run(store, manifest, ch, "r1", "row_compare", run_fn)
        first = set(ran_days[0])
        assert len(first) == manifest.count()
        resumable_run(store, manifest, ch, "r2", "row_compare", run_fn)
        second = set(ran_days[1])
        # second run touches only previously-failing partitions
        assert second < first and len(second) > 0
        failing = {
            r.partition_id
            for r in all_verdicts.filter(
                F.col("validation_status") == "fail"
            ).collect()
        }
        assert second == failing


def test_drift_and_training_verdicts_in_lineage(spark, transcripts):
    """Round-2: drift / dedup / quality operators emit lineage-shaped
    verdict frames and land in the store like the validation operators."""
    from professional_services_data_validator_spark.operators.dedup import (
        dedup_verdicts,
    )
    from professional_services_data_validator_spark.operators.drift import (
        drift_grouped_verdicts,
    )
    from professional_services_data_validator_spark.operators.text import (
        quality_verdicts,
    )

    tgt = spark.table("transcripts_target")
    with tempfile.TemporaryDirectory() as d:
        store = LineageStore(spark, d + "/lineage")
        ch = config_hash({"check": "drift+dedup+quality"})

        drift_v = drift_grouped_verdicts(
            transcripts, tgt,
            F.date_format("ts", "yyyy-MM-dd"),
            F.length("text"),
            F.col("role"),
            ks_threshold=0.5, psi_threshold=0.5,
        )
        store.append_verdicts(drift_v, ch, "run-1", "drift")

        dd_v = dedup_verdicts(
            transcripts, "text", F.date_format("ts", "yyyy-MM-dd"),
            max_dup_rate=0.9,
        )
        store.append_verdicts(dd_v, ch, "run-1", "dedup")

        q_v = quality_verdicts(
            transcripts, "event_id", "text",
            F.date_format("ts", "yyyy-MM-dd"),
            min_mean_quality=0.0,
        )
        store.append_verdicts(q_v, ch, "run-1", "quality")

        lin = store.read()
        by_stage = {
            r["stage"]: r["n"]
            for r in lin.groupBy("stage").agg(F.count("*").alias("n")).collect()
        }
        n_days = transcripts.select(
            F.date_format("ts", "yyyy-MM-dd")
        ).distinct().count()
        assert by_stage == {"drift": n_days, "dedup": n_days, "quality": n_days}
        # metrics JSON round-trips the operator's numbers
        row = lin.filter(F.col("stage") == "drift").first()
        import json

        m = json.loads(row["metrics"])
        assert {"ks_stat", "psi", "n_source", "n_target"} <= set(m)
        # resume works on these stages too
        pending = store.pending_partitions(
            drift_v.select("partition_id"), ch, "drift"
        )
        n_failed = drift_v.filter(
            F.col("validation_status") == "fail"
        ).count()
        assert pending.count() == n_failed


def test_empty_store_reads_empty(spark):
    with tempfile.TemporaryDirectory() as d:
        store = LineageStore(spark, d + "/nothing")
        assert store.read().count() == 0
        assert store.passed_partitions("x", "y").count() == 0


def test_invalidate_partitions_supersedes_success(spark, tmp_path):
    """invalidate_partitions appends 'invalidated' rows that win the
    latest-verdict race: passed_partitions stops skipping the flagged
    partitions for EVERY (config, stage), untouched partitions stay
    passed, and already-failed partitions get no extra row."""
    from pyspark.sql import functions as F

    from professional_services_data_validator_spark.lineage import (
        LineageStore,
    )

    store = LineageStore(spark, str(tmp_path / "lin"))
    verdicts = spark.createDataFrame(
        [("p1", "success"), ("p2", "success"), ("p3", "fail")],
        "partition_id string, validation_status string",
    )
    store.append_verdicts(verdicts, "cfgA", "run1", "Row")
    store.append_verdicts(verdicts, "cfgB", "run1", "Column")

    ids = spark.createDataFrame([("p2",), ("p3",)], "partition_id string")
    n = store.invalidate_partitions(ids, run_id="inv1")
    # p2 superseded under both configs; p3 was already failed (no row)
    assert n == 2

    passed_a = {
        r["partition_id"]
        for r in store.passed_partitions("cfgA", "Row").collect()
    }
    passed_b = {
        r["partition_id"]
        for r in store.passed_partitions("cfgB", "Column").collect()
    }
    assert passed_a == {"p1"} and passed_b == {"p1"}

    # a later re-validation success takes over again
    revalidated = spark.createDataFrame(
        [("p2", "success")], "partition_id string, validation_status string"
    )
    store.append_verdicts(revalidated, "cfgA", "run2", "Row")
    passed_a2 = {
        r["partition_id"]
        for r in store.passed_partitions("cfgA", "Row").collect()
    }
    assert passed_a2 == {"p1", "p2"}


def test_cli_snapshot_diff_invalidate(spark, tmp_path, capsys):
    """snapshot-diff --invalidate supersedes lineage success rows for
    exactly the partitions the rollup flags."""
    from pyspark.sql import functions as F

    from professional_services_data_validator_spark.cli import main
    from professional_services_data_validator_spark.lineage import (
        LineageStore,
    )

    lin_dir = str(tmp_path / "lin")
    store = LineageStore(spark, lin_dir)
    verdicts = spark.createDataFrame(
        [("x", "success"), ("y", "success")],
        "partition_id string, validation_status string",
    )
    store.append_verdicts(verdicts, "cfg", "run0", "Row")

    old = spark.createDataFrame(
        [(1, "x", 1), (2, "y", 2)], "id int, part string, val int"
    )
    new = spark.createDataFrame(
        [(1, "x", 1), (2, "y", 99)], "id int, part string, val int"
    )
    od, nd = str(tmp_path / "old"), str(tmp_path / "new")
    old.write.parquet(od)
    new.write.parquet(nd)

    rc = main([
        "snapshot-diff", "--old-path", od, "--new-path", nd,
        "--primary-keys", "id", "--partition-by", "part",
        "--lineage-dir", lin_dir, "--invalidate",
    ])
    capsys.readouterr()
    assert rc == 1
    passed = {
        r["partition_id"]
        for r in store.passed_partitions("cfg", "Row").collect()
    }
    assert passed == {"x"}  # only the changed partition y was superseded
