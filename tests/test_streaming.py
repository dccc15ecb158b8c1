"""Structured Streaming incremental validation tests (rate/memory sources,
deterministic micro-batches via availableNow)."""

import tempfile

from pyspark.sql import functions as F

from professional_services_data_validator_spark.streaming.incremental import (
    foreachBatch_validate,
    stream_column_stats,
    stream_uniqueness_alerts,
)


def _file_stream(spark, transcripts, d):
    # write the batch fixture as parquet, stream it back with availableNow
    path = d + "/turns"
    transcripts.drop("event_id").write.parquet(path)
    return spark.readStream.schema(
        transcripts.drop("event_id").schema
    ).parquet(path)


def test_stream_column_stats_matches_batch(spark, transcripts):
    with tempfile.TemporaryDirectory() as d:
        stream = _file_stream(spark, transcripts, d)
        out = stream_column_stats(stream, watermark="0 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("stats_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            str(r.ts): r.asDict() for r in spark.table("stats_out").collect()
        }
        batch = {
            str(r.ts): r.asDict()
            for r in transcripts.groupBy(F.col("ts").cast("date").alias("ts"))
            .agg(
                F.count(F.lit(1)).alias("count"),
                F.count("tool").alias("count__tool"),
                F.sum(F.length("text")).alias("sum__text"),
                F.min("turn_idx").alias("min__turn_idx"),
                F.max("turn_idx").alias("max__turn_idx"),
            )
            .collect()
        }
        assert set(got) == set(batch)
        for day in got:
            for k in ("count", "count__tool", "sum__text"):
                assert got[day][k] == batch[day][k], (day, k)


def test_stream_partition_checksums_match_batch(spark, transcripts):
    """Streaming per-window fingerprints are bit-identical to the batch
    partition_checksums operator, and checksum_compare against a
    defect-injected batch side flags exactly the days batch flags."""
    from professional_services_data_validator_spark.operators.checksums import (
        checksum_compare,
        checksum_validation,
        partition_checksums,
    )
    from professional_services_data_validator_spark.streaming.incremental import (
        stream_partition_checksums,
    )

    cols = ["role", "text", "tool"]
    with tempfile.TemporaryDirectory() as d:
        stream = _file_stream(spark, transcripts, d)
        out = stream_partition_checksums(stream, cols, watermark="0 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("ck_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("ck_out")
        batch = partition_checksums(
            transcripts, F.date_format("ts", "yyyy-MM-dd"), cols
        )
        key = lambda r: (r["partition_id"], r["n_rows"],
                         r["xor_lo"], r["xor_hi"])
        assert sorted(map(key, got.collect())) == sorted(
            map(key, batch.collect())
        )

        # incremental verdicts: streaming fingerprints vs batch target side
        tgt = spark.table("transcripts_target")
        v_stream = checksum_compare(
            got, partition_checksums(
                tgt, F.date_format("ts", "yyyy-MM-dd"), cols
            )
        )
        v_batch = checksum_validation(
            transcripts, tgt, F.date_format("ts", "yyyy-MM-dd"), cols
        )
        fails = lambda df: {
            r["partition_id"]
            for r in df.collect()
            if r["validation_status"] == "fail"
        }
        assert fails(v_stream) == fails(v_batch)
        assert 0 < len(fails(v_batch))


def test_stream_uniqueness_alerts(spark, transcripts):
    dirty = transcripts.drop("event_id").unionByName(
        transcripts.drop("event_id").filter(F.col("turn_idx") == 0).limit(5)
    )
    with tempfile.TemporaryDirectory() as d:
        path = d + "/turns"
        dirty.write.parquet(path)
        stream = spark.readStream.schema(dirty.schema).parquet(path)
        out = stream_uniqueness_alerts(stream, watermark="0 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("uniq_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        alerts = spark.table("uniq_out").collect()
        assert len(alerts) == 5
        assert all(r.dup_count == 2 for r in alerts)


def test_stateful_turn_order_monitor(spark):
    """applyInPandasWithState custom operator: per-conv max-turn state
    persists across microbatches (one file per trigger); stale turns in a
    later batch surface as out_of_order, in-batch repeats as duplicates."""
    import os

    from professional_services_data_validator_spark.streaming.incremental import (
        stream_turn_order_monitor,
    )

    # ignore_cleanup_errors: RocksDB/HDFS state-store maintenance threads
    # may still touch the checkpoint dir while rmtree runs
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as d:
        src = d + "/turns"
        os.makedirs(src)
        batch1 = spark.createDataFrame(
            [("a", 0), ("a", 1), ("a", 2), ("b", 0), ("b", 0)],
            "conv_id string, turn_idx long",
        )
        batch2 = spark.createDataFrame(
            [("a", 1), ("a", 3), ("b", 5)],
            "conv_id string, turn_idx long",
        )
        batch1.coalesce(1).write.parquet(src + "/f=1")
        batch2.coalesce(1).write.parquet(src + "/f=2")
        stream = (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/f=*")
        )
        out = stream_turn_order_monitor(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("order_out")
            .outputMode("append")
            .option("checkpointLocation", d + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
        got = {
            (r.conv_id, r.turn_idx, r.violation)
            for r in spark.table("order_out").collect()
        }
        # batch1: b has an in-batch duplicate of turn 0
        assert ("b", 0, "duplicate_in_batch") in got
        # batch2: a's turn 1 is stale (state max_seen = 2 from batch1)
        assert ("a", 1, "out_of_order") in got
        # monotone progress is never flagged
        assert not any(c == "a" and t in (0, 2, 3) for c, t, _ in got)
        assert not any(c == "b" and t == 5 for c, t, _ in got)


def test_foreachbatch_reuses_batch_operators(spark, transcripts):
    import tempfile

    from professional_services_data_validator_spark.lineage import LineageStore

    ref = transcripts.drop("event_id")
    with tempfile.TemporaryDirectory() as d:
        store = LineageStore(spark, d + "/lineage")
        stream = _file_stream(spark, ref, d)
        fn = foreachBatch_validate(ref, store, "cfg", "run-s")
        q = (
            stream.writeStream.foreachBatch(fn)
            .trigger(availableNow=True)
            .option("checkpointLocation", d + "/ckpt")
            .start()
        )
        q.awaitTermination(120)
        lineage = store.read().collect()
        assert len(lineage) >= 1
        assert all(r.verdict == "success" for r in lineage)


def test_stream_exact_dedup_reports_duplicates(spark):
    """Seen-counter state persists across microbatches: the first arrival
    of a text is never reported; later arrivals are, with n_prior counting
    every earlier occurrence; within a batch the smallest (conv, turn) is
    the keeper."""
    import os

    from professional_services_data_validator_spark.streaming.incremental import (
        stream_exact_dedup,
    )

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as d:
        src = d + "/turns"
        os.makedirs(src)
        batch1 = spark.createDataFrame(
            [("a", 0, "hello"), ("a", 1, "hello"), ("b", 0, "unique1")],
            "conv_id string, turn_idx long, text string",
        )
        batch2 = spark.createDataFrame(
            [("c", 7, "hello"), ("c", 8, "unique2")],
            "conv_id string, turn_idx long, text string",
        )
        batch1.coalesce(1).write.parquet(src + "/f=1")
        batch2.coalesce(1).write.parquet(src + "/f=2")
        stream = (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/f=*")
        )
        q = (
            stream_exact_dedup(stream)
            .writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", d + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
        got = {
            (r.conv_id, r.turn_idx): r.n_prior
            for r in spark.table("dedup_out").collect()
        }
        # batch1: ("a", 0) is the in-batch keeper of "hello"; ("a", 1) is
        # its duplicate with one prior. batch2: ("c", 7) repeats "hello"
        # with TWO priors (state crossed the microbatch). Uniques silent.
        assert got == {("a", 1): 1, ("c", 7): 2}


def test_stream_expectations_matches_batch(spark, transcripts):
    from professional_services_data_validator_spark.operators.expectations import (
        Expectation,
        run_expectations,
    )
    from professional_services_data_validator_spark.streaming.incremental import (
        stream_expectations,
    )

    rules = [
        Expectation("not_null", "tool", threshold=0.95),
        Expectation("isin", "role",
                    values=("user", "assistant", "system", "tool")),
        Expectation("unique", "turn_idx", threshold=0.0, name="uniq_turn"),
        Expectation("custom_sql", expr="length(text) > 0", name="net"),
    ]
    with tempfile.TemporaryDirectory() as d:
        stream = _file_stream(spark, transcripts, d)
        out = stream_expectations(stream, rules, watermark="0 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("exp_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("exp_out").collect()
        days = {r["window_start"] for r in got}
        assert len(days) > 1  # windowed, not global
        assert len(got) == len(days) * len(rules)
        # per-window observed matches the batch engine run on that window's
        # rows (approx unique == exact at these per-day cardinalities except
        # HLL error; compare the algebraic rules exactly)
        one_day = sorted(days)[0]
        batch_rows = transcripts.filter(
            F.col("ts").cast("timestamp").cast("date")
            == F.lit(one_day).cast("date")
        )
        batch = {
            r["rule_name"]: r["observed"]
            for r in run_expectations(batch_rows, rules, approx=True).collect()
        }
        stream_day = {
            r["rule_name"]: r["observed"]
            for r in got
            if r["window_start"] == one_day
        }
        for name in ("not_null__tool", "isin__role", "net", "uniq_turn"):
            assert abs(stream_day[name] - batch[name]) < 1e-9, name
        # statuses present and schema matches batch + window_start
        assert {r["validation_status"] for r in got} <= {"success", "fail"}


def test_stream_seen_filter_exact_and_stateless(spark, sf_dir):
    """Streaming bloom gate == batch anti-join on the same data, at a
    deliberately tiny bitset (FP-verify path exercised); the query is
    stateless (no watermark/state store needed for availableNow to drain)."""
    from professional_services_data_validator_spark.streaming.incremental import (
        stream_seen_filter,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    with tempfile.TemporaryDirectory() as d:
        path = d + "/docs"
        docs.write.parquet(path)
        stream = spark.readStream.schema(docs.schema).parquet(path)
        out = stream_seen_filter(
            stream, seen, F.md5("text"), n_bits=4096, n_hashes=4
        ).select("doc_id")
        q = (
            out.writeStream.format("memory")
            .queryName("seen_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(r.doc_id for r in spark.table("seen_out").collect())
    keys = seen.select(F.md5("text").alias("__k")).dropDuplicates()
    want = sorted(
        r.doc_id
        for r in docs.join(
            keys, F.md5(docs["text"]) == F.col("__k"), "left_anti"
        ).collect()
    )
    assert got == want and 0 < len(want) < docs.count()


def test_stream_drift_psi_matches_batch_per_day(spark, transcripts):
    """Per-window streaming PSI == the batch psi() operator run on each
    day's slice vs the same reference (6dp) — including the absent-category
    correction algebra (chained event-time aggregations, append mode)."""
    from professional_services_data_validator_spark.operators.drift import psi
    from professional_services_data_validator_spark.streaming.incremental import (
        stream_drift_psi,
    )

    # reference = the global role distribution; per-day slices drift from it
    reference = transcripts
    # append-mode windows emit only once the watermark passes their end, so
    # the LAST real day needs a later event to flush it: add one sentinel
    # turn 2 days past max(ts) (its own window stays open — the correct
    # streaming late-data policy, asserted below)
    max_ts = transcripts.agg(F.max("ts")).collect()[0][0]
    sentinel = transcripts.limit(1).withColumn(
        "ts", (F.lit(max_ts) + F.expr("INTERVAL 2 DAYS")).cast(
            dict(transcripts.dtypes)["ts"]
        )
    )
    augmented = transcripts.unionByName(sentinel)
    with tempfile.TemporaryDirectory() as d:
        stream = _file_stream(spark, augmented, d)
        out = stream_drift_psi(
            stream, reference, "role", watermark="0 seconds"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("psi_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {str(r.ts): r.psi for r in spark.table("psi_out").collect()}
    days = [
        r.d
        for r in transcripts.select(F.col("ts").cast("date").alias("d"))
        .distinct()
        .collect()
    ]
    # every REAL day emitted; the sentinel's still-open window did not
    assert set(got) == {str(d) for d in days} and len(days) > 1
    for day in days:
        batch = psi(
            transcripts.filter(F.col("ts").cast("date") == F.lit(day)),
            reference,
            F.col("role"),
        ).collect()[0]["psi"]
        # NOTE: batch psi() floors BOTH sides' proportions; the streaming
        # version floors identically, so values agree to rounding
        assert abs(got[str(day)] - round(batch, 6)) < 2e-6, day


def test_stream_drift_psi_quantile_matches_batch(spark, transcripts):
    """Per-window streaming quantile-bin PSI == batch psi() on the same
    literal-edge bin projection per day slice (6dp) — the numeric twin
    rides stream_drift_psi's correction algebra unchanged."""
    from professional_services_data_validator_spark.operators.drift import psi
    from professional_services_data_validator_spark.streaming.incremental import (
        stream_drift_psi_quantile,
    )

    reference = transcripts
    val = F.length("text").alias("tl")
    ref_tl = transcripts.select(val, "ts")
    max_ts = transcripts.agg(F.max("ts")).collect()[0][0]
    sentinel = ref_tl.limit(1).withColumn(
        "ts", (F.lit(max_ts) + F.expr("INTERVAL 2 DAYS")).cast(
            dict(transcripts.dtypes)["ts"]
        )
    )
    augmented = ref_tl.unionByName(sentinel)
    n_bins = 8
    with tempfile.TemporaryDirectory() as d:
        stream = _file_stream(spark, augmented, d)
        out = stream_drift_psi_quantile(
            stream, ref_tl, "tl", watermark="0 seconds", n_bins=n_bins
        )
        q = (
            out.writeStream.format("memory")
            .queryName("psi_q_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {str(r.ts): r.psi for r in spark.table("psi_q_out").collect()}

    # batch replay: same edges (exact percentiles on the reference), same
    # bin fold, batch psi() per day
    fracs = [i / n_bins for i in range(1, n_bins)]
    edges = ref_tl.agg(
        F.percentile("tl", F.array(*[F.lit(p) for p in fracs]))
    ).collect()[0][0]
    earr = F.array(*[F.lit(float(e)) for e in edges])
    bin_of = F.aggregate(
        earr, F.lit(0),
        lambda acc, e: acc + F.when(F.col("tl") > e, 1).otherwise(0),
    ).alias("__bin")
    binned = ref_tl.select(bin_of, "ts")
    days = [
        r.d for r in binned.select(F.col("ts").cast("date").alias("d"))
        .distinct().collect()
    ]
    assert set(got) == {str(d) for d in days} and len(days) > 1
    for day in days:
        batch = psi(
            binned.filter(F.col("ts").cast("date") == F.lit(day)),
            binned,
            F.col("__bin"),
        ).collect()[0]["psi"]
        assert abs(got[str(day)] - round(batch, 6)) < 2e-6, day


def test_stream_loop_monitor_matches_batch_semantics(spark):
    """Loop-run state persists across microbatches: a run split over two
    batches still alerts; a gap in turn_idx resets the run instead of
    fabricating adjacency."""
    import os

    from professional_services_data_validator_spark.streaming.incremental import (
        stream_loop_monitor,
    )

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as d:
        src = d + "/turns"
        os.makedirs(src)
        schema = "conv_id string, turn_idx long, role string, text string"
        # batch1: conv a turns 0-1 identical assistant 'X' (run 2, below
        # min_run=3); conv b two identical turns but with a GAP (0 then 2)
        batch1 = spark.createDataFrame(
            [
                ("a", 0, "assistant", "X"),
                ("a", 1, "assistant", "X"),
                ("b", 0, "assistant", "Y"),
                ("b", 2, "assistant", "Y"),
            ],
            schema,
        )
        # batch2: conv a turn 2 extends the run to 3 -> alert fires here
        batch2 = spark.createDataFrame(
            [("a", 2, "assistant", "X"), ("a", 3, "user", "ok")], schema
        )
        batch1.coalesce(1).write.parquet(src + "/f=1")
        batch2.coalesce(1).write.parquet(src + "/f=2")
        stream = (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/f=*")
        )
        out = stream_loop_monitor(stream, min_run=3)
        q = (
            out.writeStream.format("memory")
            .queryName("loop_out")
            .outputMode("append")
            .option("checkpointLocation", d + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
        got = {
            (r.conv_id, r.turn_idx, r.run_len)
            for r in spark.table("loop_out").collect()
        }
        assert got == {("a", 2, 3)}  # cross-batch run; gap in b never fires


def test_stream_context_budget_monitor_cross_batch_single_alert(spark):
    """Cumulative token state persists across microbatches; the alert
    fires exactly once, at the first crossing turn, and agrees with the
    batch operator on the same ordered input."""
    import os

    from professional_services_data_validator_spark.operators.conversation import (
        context_budget_overflow,
    )
    from professional_services_data_validator_spark.streaming.incremental import (
        stream_context_budget_monitor,
    )

    schema = "conv_id string, turn_idx long, text string"
    # costs: "aaaa"=1, "aaaaaaaa"=2 -> conv a cum 2,4,6 crosses 4 at turn 2
    # (split across batches); conv b never crosses; NULL text costs 0
    rows1 = [("a", 0, "aaaa aaaa"), ("a", 1, "aaaaaaaa"), ("b", 0, "aaaa")]
    rows2 = [("a", 2, "aaaaaaaa"), ("a", 3, "aaaa"), ("b", 1, None)]
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as d:
        src = d + "/turns"
        os.makedirs(src)
        b1 = spark.createDataFrame(rows1, schema)
        b1.coalesce(1).write.parquet(src + "/f=1")
        spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
            src + "/f=2"
        )
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/f=*")
        )
        out = stream_context_budget_monitor(stream, budget=4)
        q = (
            out.writeStream.format("memory")
            .queryName("budget_out")
            .outputMode("append")
            .option("checkpointLocation", d + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
        got = {
            (r.conv_id, r.turn_idx, r.cum_tokens, r.n_turns)
            for r in spark.table("budget_out").collect()
        }
        assert got == {("a", 2, 6, 3)}  # one alert, first crossing only
        # batch operator agrees on the union of both batches
        batch = context_budget_overflow(
            spark.createDataFrame(rows1 + rows2, schema), budget=4
        ).collect()
        assert [(r.conv_id, r.overflow_turn_idx) for r in batch] == [("a", 2)]
