"""Bloom-filter seen-set membership — the scale path for checking a huge
stream of keys against a large reference set without shuffling the stream.

Use case (LLM-data pipelines): incremental corpus ingestion must drop
documents already present in a multi-billion-row "seen" corpus. A plain
anti-join shuffles every new row; a broadcast anti-join needs the seen keys
to fit as data. The bloom path broadcasts a fixed-size BITSET instead
(n_bits/8 bytes regardless of key count — any memory budget trades directly
against false-positive rate), tests membership with pure JVM column
expressions inside the scan stage, and then exact-verifies only the
bloom-positive candidates with a join. Because bloom filters have no false
negatives, the composition is EXACT: bloom-miss rows are definitely new
(they never touch a join), and the false-positive fraction among bloom-hits
is removed by the verification anti-join.

Everything is DataFrame ops:
  * bitset construction is a `bit_or(shiftleft(1L, bit))` hash aggregate
    over (word, bit) positions — distributed, partial bit_or map-side, a
    shuffle of at most n_bits/64 word rows (independent of input size);
  * membership is element_at + getbit on a crossJoin(broadcast(1-row
    bitset)) — a single-row broadcast, i.e. a free map-side variable, never
    a row-matching join.

The reference has no bloom analog (its RI story is the PK row join,
data_validation/data_validation.py:294-305); this is a BASELINE-driven
extension for the 10^12-turn regime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORDS = "__bloom_words"


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k bit positions for a key: xxhash64(key, i) mod n_bits. Seeding via
    an extra lit column keeps every hash JVM-native and deterministic, so
    the same (key, n_bits, n_hashes) always lands on the same bits — builds
    and probes agree across jobs and across cluster sizes."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def _as_col(key: Column | str) -> Column:
    return F.col(key) if isinstance(key, str) else key


def bloom_bitset(
    df: DataFrame, key: Column | str, n_bits: int = 1 << 20, n_hashes: int = 5
) -> DataFrame:
    """Distributed bloom build: one row with an array<long> of n_bits/64
    words. The aggregate is a two-level hash agg on word index (partial
    bit_or map-side, final bit_or after a shuffle of <= n_bits/64 rows)."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    pos = F.explode(
        F.array(*_positions(_as_col(key), n_bits, n_hashes))
    ).alias("__pos")
    words = (
        df.select(pos)
        .select(
            F.shiftright(F.col("__pos"), 6).cast("int").alias("__w"),
            F.col("__pos").bitwiseAND(F.lit(63)).cast("int").alias("__b"),
        )
        .groupBy("__w")
        .agg(
            F.call_function(
                "bit_or",
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), F.col("__b")
                ),
            ).alias("__word")
        )
    )
    # densify: element_at probes need a fixed-length array. n_bits/64 longs
    # collect to the driver once (the bitset IS the broadcast payload).
    dense = [0] * (n_bits // 64)
    for r in words.collect():
        dense[r["__w"]] = r["__word"]
    return df.sparkSession.createDataFrame([(dense,)], f"{_WORDS} array<long>")


def bloom_might_contain(
    key: Column | str, n_bits: int, n_hashes: int, words: str = _WORDS
) -> Column:
    """JVM-only membership test against the bitset column (the crossJoined
    1-row array): AND over k hashes of getbit(word, bit). False positives
    possible, false negatives impossible."""
    test = F.lit(True)
    for pos in _positions(_as_col(key), n_bits, n_hashes):
        word = F.element_at(
            F.col(words), F.shiftright(pos, 6).cast("int") + F.lit(1)
        )
        bit = pos.bitwiseAND(F.lit(63)).cast("int")
        test = test & (F.call_function("getbit", word, bit) == 1)
    return test


def with_bloom_flag(
    df: DataFrame,
    bitset: DataFrame,
    key: Column | str,
    n_bits: int,
    n_hashes: int,
    flag: str = "__bloom_hit",
) -> DataFrame:
    """Attach the membership flag: crossJoin the broadcast 1-row bitset
    (BroadcastNestedLoopJoin of exactly one row — a shipped constant, not a
    matching join), evaluate the bit tests, drop the array."""
    return (
        df.crossJoin(F.broadcast(bitset))
        .withColumn(flag, bloom_might_contain(key, n_bits, n_hashes))
        .drop(_WORDS)
    )


def seen_filter(
    new: DataFrame,
    seen: DataFrame,
    new_key: Column | str,
    seen_key: Column | str | None = None,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """EXACT rows of ``new`` whose key does not occur in ``seen``.

    Plan shape: build the bitset from ``seen`` (shuffle of <= n_bits/64
    words), broadcast it as one row; scan ``new`` once — bloom-miss rows
    short-cut to the output with no join at all; bloom-hit candidates (true
    matches + false positives) anti-join the distinct seen keys to remove
    the false positives. The anti-join's left side is only the candidate
    fraction: at a well-sized bitset candidates ~= |matches| + eps, so a
    mostly-new stream shuffles almost nothing. Works at any FP rate —
    correctness never depends on n_bits, only the candidate volume does.
    """
    nk = _as_col(new_key)
    sk = _as_col(seen_key) if seen_key is not None else nk
    bitset = bloom_bitset(seen, sk, n_bits, n_hashes)
    flagged = with_bloom_flag(new, bitset, nk, n_bits, n_hashes)
    definite_new = flagged.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
    candidates = flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    seen_keys = seen.select(sk.alias("__seen_key")).dropDuplicates()
    verified_new = candidates.join(
        seen_keys, nk == F.col("__seen_key"), "left_anti"
    )
    return definite_new.unionByName(verified_new)
