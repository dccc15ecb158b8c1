"""Deterministic sf1 generation: 10x sf0.1, written INSIDE the repo
(testdata_sf1/) because /root/testdata is read-only (VERDICT r3 #7: the CC
loop / decontamination broadcast / salted top-k claims deserve one more
order of magnitude before the 100x story is trusted).

Replication is the same disjoint-range key-shift replicate_events uses
(sources/readers.py): replica r shifts every PK/FK by r * 1e9 (user_id by
r * 1e6, matching replicate_events exactly), so referential integrity is
preserved replica-by-replica and conversation-size / doc-length
distributions are unchanged while row counts scale 10x. Values (text,
embeddings, timestamps) are NOT mutated — strict parity compares Spark vs
DuckDB over the SAME files, so duplicated content changes nothing about
correctness and makes dedup/CC genuinely heavier (every doc gains 9 exact
copies: the 50k-node near-dup graph is the stress test).

DuckDB writes single .parquet FILES (not Spark part-directories) so
strict_parity.py's read_parquet('<dir>/<t>.parquet') works unchanged.

Usage: python scripts/gen_sf1.py [out_dir]   # default /root/repo/testdata_sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
FACTOR = 10
BIG = 1_000_000_000  # matches replicate_events' event_id shift
USR = 1_000_000  # matches replicate_events' user_id shift

# table -> list of (column, shift) key remaps; unlisted columns copy through
REMAPS: dict[str, list[tuple[str, int]]] = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", BIG)],
    "supplier": [("s_suppkey", BIG)],
    "part": [("p_partkey", BIG)],
    "orders": [("o_orderkey", BIG), ("o_custkey", BIG)],
    "lineitem": [
        ("l_orderkey", BIG), ("l_partkey", BIG), ("l_suppkey", BIG)
    ],
    "events": [("event_id", BIG), ("user_id", USR)],
    "documents": [("doc_id", BIG)],
    "embeddings": [("vec_id", BIG)],
}
# tiny dimension vocab tables are NOT replicated (their keys are referenced
# unshifted by every replica)
NO_REPLICATE = {"region", "nation"}


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for table, remaps in REMAPS.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            print(f"{table}: exists, skipping")
            continue
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        if table in NO_REPLICATE:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}' "
                "(FORMAT PARQUET)"
            )
        else:
            shifted = dict(remaps)
            proj = ", ".join(
                f"CAST(t.{c} + r.range * {shifted[c]} AS BIGINT) AS {c}"
                if c in shifted
                else f"t.{c}"
                for c in cols
            )
            con.execute(
                f"COPY (SELECT {proj} FROM read_parquet('{src}') t "
                f"CROSS JOIN range({FACTOR}) r ORDER BY {cols[0]}) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1")
