"""Row validation / uniqueness / referential tests on the deterministic
transcripts fixtures (FIXTURES.md F1/F2 defect matrix)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from professional_services_data_validator_spark.operators.row_compare import (
    row_compare,
    row_compare_verdicts,
    row_violations,
)
from professional_services_data_validator_spark.operators.uniqueness import (
    uniqueness_verdict,
    uniqueness_violations,
)
from professional_services_data_validator_spark.operators.referential import (
    referential_verdict,
    referential_violations,
)


def test_row_violations_on_transcripts(spark, transcripts):
    tgt = spark.table("transcripts_target")
    v = row_violations(
        transcripts.drop("event_id"),
        tgt.drop("event_id"),
        ["conv_id", "turn_idx"],
        hash_columns="*",
    )
    rows = v.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.violation_type, []).append(r)
    # defects keyed on event_id: %211==0 deleted (incl. 0), %193==0 mutated,
    # %177==5 tool nulled. sf0.001 events: event_id 0..999.
    n_deleted = len([e for e in range(1000) if e % 211 == 0])
    n_mutated = len(
        [e for e in range(1000) if e % 193 == 0 and e % 211 != 0]
    )
    n_toolnull = len(
        [
            e
            for e in range(1000)
            if e % 177 == 5 and e % 211 != 0 and e % 193 != 0
            and e % 10 == 9  # tool only non-null for role='tool' rows
        ]
    )
    assert len(by_type["missing_in_target"]) == n_deleted
    assert len(by_type.get("hash_mismatch", [])) == n_mutated + n_toolnull
    assert "missing_in_source" not in by_type


def test_row_compare_reference_report(spark, transcripts):
    tgt = spark.table("transcripts_target")
    rep = row_compare(
        transcripts.drop("event_id"),
        tgt.drop("event_id"),
        ["conv_id", "turn_idx"],
        hash_columns="*",
    )
    agg = (
        rep.groupBy("validation_status").count().collect()
    )
    counts = {r.validation_status: r["count"] for r in agg}
    total = transcripts.count()
    n_deleted = len([e for e in range(1000) if e % 211 == 0])
    n_mutated = len([e for e in range(1000) if e % 193 == 0 and e % 211 != 0])
    n_toolnull = len(
        [
            e
            for e in range(1000)
            if e % 177 == 5 and e % 211 != 0 and e % 193 != 0 and e % 10 == 9
        ]
    )
    n_mismatch = n_mutated + n_toolnull
    # reference joins row validations on (pks..., hash__all)
    # (combiner.py:267-272): a hash mismatch shows up as TWO fail rows
    # (source-only + target-only), a deleted row as one fail row.
    assert counts["success"] == total - n_deleted - n_mismatch
    assert counts["fail"] == n_deleted + 2 * n_mismatch
    one = rep.filter(F.col("validation_status") == "fail").first()
    assert one.validation_name == "hash__all"
    assert one.primary_keys in ("{conv_id, turn_idx}", None)


def test_row_compare_verdicts_single_pass(spark, transcripts):
    tgt = spark.table("transcripts_target")
    v = row_compare_verdicts(
        transcripts.drop("event_id"),
        tgt.drop("event_id"),
        ["conv_id", "turn_idx"],
        partition_col=F.crc32(F.col("conv_id")) % 8,
    ).collect()
    assert sum(r.n_rows for r in v) == transcripts.count()
    assert any(r.validation_status == "fail" for r in v)
    # identical tables -> all partitions pass
    v2 = row_compare_verdicts(
        transcripts.drop("event_id"),
        transcripts.drop("event_id"),
        ["conv_id", "turn_idx"],
        partition_col=F.crc32(F.col("conv_id")) % 8,
    ).collect()
    assert all(r.validation_status == "success" for r in v2)
    assert sum(r.n_matched for r in v2) == transcripts.count()


def test_comparison_fields_mode(spark):
    src = spark.createDataFrame(
        [Row(pk=1, a=10, b="x"), Row(pk=2, a=20, b="y")]
    )
    tgt = spark.createDataFrame(
        [Row(pk=1, a=10, b="x"), Row(pk=2, a=99, b="y")]
    )
    from professional_services_data_validator_spark.config import (
        ComparisonFieldSpec,
    )

    rep = row_compare(
        src, tgt, ["pk"],
        comparison_fields=[ComparisonFieldSpec("a"), ComparisonFieldSpec("b")],
    )
    rows = {(r.validation_name, r.group_by_columns): r for r in rep.collect()}
    assert rows[("a", '{"pk": "1"}')].validation_status == "success"
    assert rows[("a", '{"pk": "2"}')].validation_status == "fail"
    assert rows[("b", '{"pk": "2"}')].validation_status == "success"


def test_null_safe_pk_alignment(spark):
    """NULL PKs: default join semantics report them missing on both sides
    (SQL NULL != NULL); null_safe_pks=True aligns them like the reference's
    pandas merge (NaN keys join)."""
    src = spark.createDataFrame(
        [(None, 1, "x"), ("a", 1, "y")], "conv_id string, turn_idx int, text string"
    )
    tgt = spark.createDataFrame(
        [(None, 1, "x"), ("a", 1, "y")], "conv_id string, turn_idx int, text string"
    )
    strict = row_violations(src, tgt, ["conv_id", "turn_idx"])
    assert strict.count() == 2  # the NULL-key row is 'missing' on each side
    safe = row_violations(
        src, tgt, ["conv_id", "turn_idx"], null_safe_pks=True
    )
    assert safe.count() == 0
    # a real mismatch is still caught under null-safe alignment
    tgt2 = spark.createDataFrame(
        [(None, 1, "CHANGED"), ("a", 1, "y")],
        "conv_id string, turn_idx int, text string",
    )
    v = row_violations(
        src, tgt2, ["conv_id", "turn_idx"], null_safe_pks=True
    ).collect()
    assert len(v) == 1 and v[0].violation_type == "hash_mismatch"
    # null-safe equality plans as an equi-join, not a cartesian product
    plan = (
        row_violations(src, tgt, ["conv_id", "turn_idx"], null_safe_pks=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_farm_fingerprint_hash_algo(spark, transcripts):
    """xxhash64 fast path finds the same violation set as sha256."""
    tgt = spark.table("transcripts_target")
    pks = ["conv_id", "turn_idx"]
    cols = ["role", "text", "tool"]
    sha = {
        tuple(r)
        for r in row_violations(transcripts, tgt, pks, hash_columns=cols)
        .select(*pks, "violation_type")
        .collect()
    }
    fast = {
        tuple(r)
        for r in row_violations(
            transcripts, tgt, pks, hash_columns=cols,
            hash_algo="farm_fingerprint",
        )
        .select(*pks, "violation_type")
        .collect()
    }
    assert sha == fast and len(sha) > 0


def test_uniqueness(spark, transcripts):
    clean = uniqueness_violations(transcripts, ["conv_id", "turn_idx"])
    assert clean.count() == 0
    # inject duplicates deterministically
    dups = transcripts.filter(F.col("event_id") % 101 == 3)
    dirty = transcripts.unionByName(dups)
    viol = uniqueness_violations(dirty, ["conv_id", "turn_idx"]).collect()
    assert len(viol) == dups.count()
    assert all(r.dup_count == 2 for r in viol)
    verd = uniqueness_verdict(
        dirty, ["conv_id", "turn_idx"], partition_col=F.crc32("conv_id") % 4
    ).collect()
    assert sum(r.n_dup_keys for r in verd) == len(viol)
    assert any(r.validation_status == "fail" for r in verd)


def test_referential(spark, transcripts):
    dim = spark.table("dim_conversations")
    orphans = referential_violations(transcripts, dim, "conv_id")
    got = {r.conv_id for r in orphans.select("conv_id").distinct().collect()}
    # dim excludes user_id % 53 == 7 (readers.py _DIM_CONV_TMPL)
    expected = {f"c{u}" for u in range(150) if u % 53 == 7}
    users_present = {
        r.conv_id for r in transcripts.select("conv_id").distinct().collect()
    }
    assert got == expected & users_present
    verd = referential_verdict(transcripts, dim, "conv_id").collect()
    assert verd[0].n_orphans == orphans.count()
    assert verd[0].validation_status == "fail"


def test_referential_broadcast_plan(spark, transcripts):
    dim = spark.table("dim_conversations")
    plan = referential_violations(transcripts, dim, "conv_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_violation_rate_gate_fails_on_evidence_not_uncertainty(spark):
    from professional_services_data_validator_spark.operators.row_compare import (
        violation_rate_gate,
    )
    import datetime

    d1 = datetime.datetime(2026, 1, 1)
    d2 = datetime.datetime(2026, 1, 2)
    # day 1: 200 rows, 50 violations (25% - solid evidence) -> fail
    # day 2: 3 rows, 0 violations (tiny sample, certifies nothing) -> success
    src = [(f"c{i}", 0, f"t{i}", d1) for i in range(200)]
    src += [(f"x{i}", 0, f"t{i}", d2) for i in range(3)]
    tgt = [
        (f"c{i}", 0, ("MUT" if i < 50 else f"t{i}"), d1) for i in range(200)
    ]
    tgt += [(f"x{i}", 0, f"t{i}", d2) for i in range(3)]
    schema = "conv_id string, turn_idx int, text string, ts timestamp"
    out = {
        r["day"]: r
        for r in violation_rate_gate(
            spark.createDataFrame(src, schema),
            spark.createDataFrame(tgt, schema),
            ["conv_id", "turn_idx"],
            ["text"],
            threshold=0.01,
        ).collect()
    }
    assert out["2026-01-01"]["validation_status"] == "fail"
    assert out["2026-01-01"]["n_violations"] == 50
    assert out["2026-01-02"]["validation_status"] == "success"
    assert out["2026-01-02"]["wilson_lower"] == 0.0
    # missing row counts as a violation
    src2 = spark.createDataFrame(src[:10], schema)
    tgt2 = spark.createDataFrame(
        [r for r in tgt[:10] if r[0] != "c3"], schema
    )
    r = violation_rate_gate(
        src2, tgt2, ["conv_id", "turn_idx"], ["text"]
    ).collect()[0]
    assert r["n_rows"] == 10 and r["n_violations"] > 0


def test_row_tolerance_violations_classifies(spark):
    from professional_services_data_validator_spark.operators.row_compare import (
        row_tolerance_violations,
    )

    schema = "id long, v double"
    src = spark.createDataFrame(
        [(1, 100.0), (2, 100.0), (3, 100.0), (4, None),
         (5, float("nan")), (6, float("nan")), (7, None)],
        schema,
    )
    tgt = spark.createDataFrame(
        [(1, 100.0 + 1e-10), (2, 100.5), (3, 100.0), (4, 4.0),
         (5, 5.0), (6, float("nan")), (7, None)],
        schema,
    )
    out = {
        r["id"]: r
        for r in row_tolerance_violations(
            src, tgt, ["id"], ["v"], rel_tol=1e-9
        ).collect()
    }
    # 1: ULP-scale diff within rel_tol -> NOT a violation
    # 3: identical, 6: both NaN, 7: both NULL -> pass
    assert set(out) == {2, 4, 5}
    assert out[2]["reason"] == "exceeds_tolerance"
    assert out[2]["abs_diff"] == 0.5
    assert out[4]["reason"] == "null_mismatch"
    assert out[5]["reason"] == "nan_mismatch"


def test_mismatch_severity_bands(spark):
    from professional_services_data_validator_spark.operators.row_compare import (
        mismatch_severity,
    )
    from professional_services_data_validator_spark.sources.readers import (
        jaro_similarity,
    )

    base = "the quick brown fox jumps over the lazy dog"
    schema = "id long, text string"
    src = spark.createDataFrame([(i, base) for i in range(1, 6)], schema)
    tgt = spark.createDataFrame(
        [
            (1, base),  # identical -> not a mismatch at all
            (2, base + "!"),  # minor edit
            (3, base[:20]),  # truncation -> partial
            (4, "zzz qqq completely unrelated www"),  # rewrite
            (5, None),  # null_change
        ],
        schema,
    )
    out = {r["severity"]: r for r in mismatch_severity(src, tgt, ["id"]).collect()}
    assert set(out) == {"minor_edit", "partial_rewrite", "rewrite", "null_change"}
    assert all(r["n"] == 1 for r in out.values())
    assert out["null_change"]["avg_sim"] is None
    assert out["minor_edit"]["avg_sim"] == round(
        jaro_similarity(base, base + "!"), 6
    )
