"""Bloom seen-set membership + large-dim referential integrity.

Exactness contract: seen_filter must equal a plain anti-join at ANY bitset
size (bloom FPs are verified away, bloom misses are provably-correct
negatives), and referential_violations_large must equal
referential_violations row-for-row while never exchanging the fact side.
"""

import pytest
from pyspark.sql import functions as F

from professional_services_data_validator_spark.operators import (
    referential_violations,
    referential_violations_large,
    seen_filter,
    with_bloom_flag,
)
from professional_services_data_validator_spark.operators.bloom import (
    bloom_bitset,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_bloom_no_false_negatives(spark, docs):
    """Every inserted key must test positive — the property exactness
    rests on."""
    bitset = bloom_bitset(docs, F.md5("text"), n_bits=1 << 14, n_hashes=4)
    flagged = with_bloom_flag(docs, bitset, F.md5("text"), 1 << 14, 4)
    assert flagged.filter(~F.col("__bloom_hit")).count() == 0


def test_bloom_rejects_most_absent_keys(spark, docs):
    """At 16 Kbit for ~500 keys, unseen keys overwhelmingly miss: the
    candidate fraction (what the verify join must touch) stays small."""
    bitset = bloom_bitset(docs, F.md5("text"), n_bits=1 << 14, n_hashes=4)
    absent = spark.range(2000).select(
        F.md5(F.concat(F.lit("absent-"), F.col("id"))).alias("k")
    )
    flagged = with_bloom_flag(absent, bitset, F.col("k"), 1 << 14, 4)
    fp = flagged.filter(F.col("__bloom_hit")).count()
    assert fp < 200  # < 10% FP at this sizing


@pytest.mark.parametrize("n_bits", [64, 1 << 16])
def test_seen_filter_exact_at_any_bitset(spark, docs, n_bits):
    """Exactness does not depend on bloom sizing: n_bits=64 forces nearly
    every probe through the FP-verify join; 64K makes most short-cut."""
    seen = docs.filter(F.col("doc_id") % 3 == 0)
    got = sorted(
        r.doc_id
        for r in seen_filter(
            docs, seen, F.md5("text"), n_bits=n_bits, n_hashes=3
        ).collect()
    )
    keys = seen.select(F.md5("text").alias("__k")).dropDuplicates()
    want = sorted(
        r.doc_id
        for r in docs.join(
            keys, F.md5(docs["text"]) == F.col("__k"), "left_anti"
        ).collect()
    )
    assert got == want and len(want) > 0


def test_seen_filter_key_cross_table(spark, docs):
    """seen key expression may differ from the new-side expression."""
    seen = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.md5("text").alias("content_hash")
    )
    got = seen_filter(
        docs, seen, F.md5("text"), seen_key=F.col("content_hash"),
        n_bits=1 << 12, n_hashes=4,
    )
    keys = seen.dropDuplicates()
    want = docs.join(
        keys, F.md5(docs["text"]) == F.col("content_hash"), "left_anti"
    )
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    )


def test_referential_large_matches_broadcast_path(spark, transcripts):
    dim = spark.table("dim_conversations")
    a = referential_violations(transcripts, dim, "conv_id")
    b = referential_violations_large(transcripts, dim, "conv_id")
    ka = sorted((r.conv_id, r.turn_idx) for r in a.collect())
    kb = sorted((r.conv_id, r.turn_idx) for r in b.collect())
    assert ka == kb and len(ka) > 0


def test_referential_large_plan_shape(spark, transcripts):
    """The fact side must reach the final join without an Exchange of fact
    rows: orphan keys come back as a broadcast left-semi."""
    dim = spark.table("dim_conversations")
    plan = referential_violations_large(
        transcripts, dim, "conv_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "BroadcastExchange" in plan
