"""Strict (dtype-sensitive) rehearsal of the driver's CORRECTNESS hash.

The per-round driver compares Spark vs DuckDB results by sorting columns by
name and hashing the raw values — so a DuckDB HUGEINT that pandas renders as
object/float mismatches a Spark int64 even when numerically equal (the round-1
hash-weak quartet). tests/test_oracle_parity.py normalizes types and therefore
cannot catch that class; this script does NOT normalize: every cell is tagged
with its Python type before comparison.

Usage:
    python scripts/strict_parity.py [query ...]    # default: all queries
    SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python scripts/strict_parity.py
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from professional_services_data_validator_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
# data-dependent oracles (kmeans centroid literals) follow this var
os.environ["SPARK_GRAFT_TEST_SF_DIR"] = SF_DIR


def _cell(v):
    # type-tagged rendering: int64 12 -> "int:12", float 12.0 -> "float:12.0"
    t = type(v).__name__
    if v is None:
        return "none"
    if isinstance(v, float) and math.isnan(v):
        return "float:nan"
    return f"{t}:{v!r}"


def _canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_cell(r[i]) for i in idx) for r in rows)


def main(names):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark("strict-parity", master="local[8]", shuffle_partitions=8)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names or sorted(queries)
    failures = []
    for name in names:
        sdf = queries[name](spark, SF_DIR)
        s_rows = [tuple(r) for r in sdf.collect()]
        s_cols = list(sdf.columns)
        if name not in oracles:
            print(f"{name}: no oracle (rows-only check) rows={len(s_rows)}")
            continue
        res = con.execute(oracles[name])
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
        ok_cols = sorted(s_cols) == sorted(o_cols)
        s_set, o_set = _canon(s_cols, s_rows), _canon(o_cols, o_rows)
        ok = ok_cols and s_set == o_set
        status = "OK " if ok else "FAIL"
        print(f"{status} {name}: spark={len(s_rows)} oracle={len(o_rows)}")
        if not ok:
            failures.append(name)
            if not ok_cols:
                print(f"  cols spark={s_cols} oracle={o_cols}")
            diffs = [(a, b) for a, b in zip(s_set, o_set) if a != b][:3]
            for a, b in diffs:
                print(f"  spark : {a}\n  oracle: {b}")
    spark.stop()
    if failures:
        print(f"\nSTRICT FAILURES: {failures}")
        return 1
    print("\nall strict-green")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
