"""Strict (dtype-sensitive) rehearsal of the driver's CORRECTNESS hash.

The per-round driver compares Spark vs DuckDB results by sorting columns by
name and hashing the raw values — so a DuckDB HUGEINT that pandas renders as
object/float mismatches a Spark int64 even when numerically equal (the round-1
hash-weak quartet). tests/test_oracle_parity.py normalizes types and therefore
cannot catch that class; this script does NOT normalize: every cell is tagged
with its Python type before comparison.

Round-4 addition (VERDICT r3 #2): the driver actually hashes *pandas* frames
(Spark `toPandas()` vs DuckDB `.df()`), and DuckDB's Python `fetchall()`
returns HUGEINT as plain int while `.df()` renders it float64 — exactly the
class that made `pack_sequences` hash-red in r03 while this script stayed
green. So every query is now ALSO fetched via the pandas path on both sides
and compared with dtype-kind tags (int vs float vs object vs datetime); a
kind divergence fails even when the type-tagged fetchall values match.

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


def _pd_cell(v):
    """Dtype-faithful cell tag for the pandas rehearsal.

    Mirrors what a value-hash over a pandas frame sees: numpy int64 12 and
    float64 12.0 must NOT collide (that is the HUGEINT hazard), but both
    sides' NaN/None/NaT collapse to "none" and timestamps compare by instant
    regardless of ns-vs-us unit.
    """
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "none"
    if isinstance(v, float) and math.isnan(v):
        return "none"
    if isinstance(v, (np.floating,)):
        return "none" if math.isnan(float(v)) else f"float:{float(v)!r}"
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{bool(v)!r}"
    if isinstance(v, (int, np.integer)):
        return f"int:{int(v)!r}"
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    import datetime

    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        # Spark DATE -> datetime.date objects, DuckDB DATE -> datetime64
        # midnight: the driver hashed this class green in r03
        # (metric_anomaly_daily, missing_days_by_role), so equate them
        return f"ts:{v.isoformat()}T00:00:00"
    if isinstance(v, bytes):
        return f"bytes:{v!r}"
    return f"{type(v).__name__}:{v!r}"


def _pd_canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_pd_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def _pd_kinds(df):
    return {c: df[c].dtype.kind for c in df.columns}


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
        # pandas-path rehearsal of the driver hash (VERDICT r3 #2)
        pd_ok, pd_note = True, ""
        if ok_cols:
            try:
                s_pdf = sdf.toPandas()
                o_pdf = con.execute(oracles[name]).df()
                s_k, o_k = _pd_kinds(s_pdf), _pd_kinds(o_pdf)
                kind_diff = {
                    c: (s_k[c], o_k[c])
                    for c in s_k
                    if s_k[c] != o_k[c]
                    # int-vs-float is THE hazard; object covers strings,
                    # decimals, arrays — compare those by value below
                    and {s_k[c], o_k[c]} <= {"i", "u", "f"}
                }
                val_ok = _pd_canon(s_pdf) == _pd_canon(o_pdf)
                pd_ok = not kind_diff and val_ok
                if kind_diff:
                    pd_note = f" pandas-dtype-diff={kind_diff}"
                elif not val_ok:
                    pd_note = " pandas-value-diff"
            except Exception as exc:  # pragma: no cover - diagnostic path
                pd_ok, pd_note = False, f" pandas-path-error={exc!r}"
        ok = ok and pd_ok
        status = "OK " if ok else "FAIL"
        print(f"{status} {name}: spark={len(s_rows)} oracle={len(o_rows)}{pd_note}")
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
