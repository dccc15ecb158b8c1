"""File readers, find-tables/jaro, random-row validation."""

import tempfile

from pyspark.sql import functions as F

from professional_services_data_validator_spark.operators.row_compare import (
    random_row_compare,
)
from professional_services_data_validator_spark.sources.readers import (
    find_tables,
    jaro_similarity,
    read_file,
)


def test_read_file_formats(spark, transcripts):
    small = transcripts.drop("event_id").limit(50)
    with tempfile.TemporaryDirectory() as d:
        small.write.parquet(d + "/p")
        small.write.orc(d + "/o")
        small.write.json(d + "/j")
        small.select(
            "conv_id", "turn_idx", "role"
        ).write.option("header", "true").csv(d + "/c")
        assert read_file(spark, d + "/p", "parquet").count() == 50
        assert read_file(spark, d + "/o", "orc").count() == 50
        assert read_file(spark, d + "/j", "json").count() == 50
        csv = read_file(spark, d + "/c", "csv")
        assert csv.count() == 50
        assert dict(csv.dtypes)["turn_idx"] == "int"  # inferSchema on
    try:
        read_file(spark, "/nowhere", "avro")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_jaro_similarity():
    # spot values of the public Jaro definition
    assert jaro_similarity("abc", "abc") == 1.0
    assert jaro_similarity("", "abc") == 0.0
    assert abs(jaro_similarity("martha", "marhta") - 0.9444444) < 1e-6
    assert abs(jaro_similarity("dixon", "dicksonx") - 0.7666666) < 1e-6


def test_find_tables(spark, transcripts):
    matches = find_tables(spark, score_cutoff=0.85)
    pairs = {(m["source_table"], m["target_table"]) for m in matches}
    assert ("transcripts", "transcripts_target") in pairs


def test_random_row_compare(spark, transcripts):
    tgt = spark.table("transcripts_target")
    rep = random_row_compare(
        transcripts.drop("event_id"),
        tgt.drop("event_id"),
        ["conv_id", "turn_idx"],
        num_rows=100,
    )
    rows = rep.collect()
    # <= 100 sampled PKs; hash mismatches may double rows (src+tgt pivots)
    names = {r.validation_name for r in rows}
    assert names == {"hash__all"}
    assert all(r.num_random_rows == 100 for r in rows)
    assert 100 <= len(rows) <= 120
    # deterministic: same sample every run
    rep2 = random_row_compare(
        transcripts.drop("event_id"),
        tgt.drop("event_id"),
        ["conv_id", "turn_idx"],
        num_rows=100,
    )
    k1 = sorted(r.group_by_columns for r in rows)
    k2 = sorted(r.group_by_columns for r in rep2.collect())
    assert k1 == k2


def test_replicate_documents_scaling_fixture(spark):
    """Docs-shape scaling fixture: factor-x corpus with disjoint replica
    vocabularies (no cross-replica near-dups) and intact intra-replica
    duplicate structure."""
    from pyspark.sql import Row

    from professional_services_data_validator_spark.sources.readers import (
        replicate_documents,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma", lang="en",
                source="web", n_chars=16),
            Row(doc_id=2, text="alpha beta gamma", lang="en",
                source="web", n_chars=16),  # intra-replica dup of doc 1
            Row(doc_id=3, text="delta epsilon zeta", lang="en",
                source="web", n_chars=18),
        ]
    )
    rep = replicate_documents(docs, 3)
    rows = {r.doc_id: r.text for r in rep.collect()}
    assert len(rows) == 9
    # replica 0 keeps the original text
    assert rows[1] == "alpha beta gamma"
    # replicas share NO tokens
    t0 = set(rows[1].split())
    t1 = set(rows[10_000_000_001].split())
    t2 = set(rows[20_000_000_001].split())
    assert not (t0 & t1) and not (t1 & t2)
    # intra-replica duplicate structure preserved in every replica
    for base in (0, 10_000_000_000, 20_000_000_000):
        assert rows[base + 1] == rows[base + 2]
        assert rows[base + 1] != rows[base + 3]
