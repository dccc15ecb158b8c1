"""Driver-gate rehearsal: every __spark_entry__ query vs its DuckDB oracle.

Mimics CORRECTNESS_r{N}.json: row count + column names + order-insensitive
value comparison (sorted rows, stringified values). Runs at sf0.001 for
speed; `SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01` re-runs at the
driver's actual correctness scale.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# data-dependent oracles (embedding_kmeans_ann inlines centroids trained on
# the compared dataset) must be generated for THIS sf dir, not the driver's
# sf0.01 default
os.environ["SPARK_GRAFT_TEST_SF_DIR"] = SF_DIR

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, ddb):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLES:
        # iterative / non-SQL-expressible ops: rows-only contract check,
        # mirroring the driver's weaker gate for oracle-less entries
        assert len(s_rows) > 0 and len(s_cols) > 0
        return

    res = ddb.execute(ORACLES[name])
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_set = _rows_to_set(s_cols, s_rows)
    o_set = _rows_to_set(o_cols, o_rows)
    if s_set != o_set:
        diffs = [
            (a, b) for a, b in zip(s_set, o_set) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.schema.fields) > 0
