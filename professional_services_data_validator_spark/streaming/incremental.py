"""Incremental validation over Structured Streaming.

The reference is strictly batch (reference docs/internal/
distributed_jobs.md:5 — partition + fan-out is its only scale story), and
BASELINE's "resumable" requirement is met by the lineage table (lineage.py).
This module is the engine's *streaming extension*: the same validation
semantics applied incrementally as transcript turns arrive.

Design:
- ``stream_column_stats``: windowed per-day aggregates with a watermark —
  the streaming twin of operators.aggregates.column_stats; output rows have
  the same shape as grouped-validation inputs, so the batch combiner can
  diff a streaming source against a batch reference table.
- ``stream_uniqueness_alerts``: duplicate (conv_id, turn_idx) detection in
  a watermark-bounded state via streaming dropDuplicates + exceptAll-style
  counting; emits violation rows as they occur.
- ``foreachBatch_validate``: per-microbatch hook running an arbitrary batch
  validation (reusing the exact batch operators) against each microbatch —
  the pragmatic production pattern: stream → microbatch → batch engine,
  verdicts appended to the lineage store.

State scale: watermark bounds state to (window size + lateness); per-key
state is a counter, so 10^12 turns stream through without unbounded growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_column_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "1 day",
) -> DataFrame:
    """Per-window transcript stats (streaming twin of column_stats).

    Late data beyond ``watermark`` is dropped (documented late-data policy);
    output mode 'append' emits each window once it is final — exactly the
    per-partition verdict cadence the lineage table wants.
    """
    # watermarks require TIMESTAMP (LTZ); parquet sources may carry NTZ
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.count("tool").alias("count__tool"),
            F.sum(F.length("text")).alias("sum__text"),
            F.min("turn_idx").alias("min__turn_idx"),
            F.max("turn_idx").alias("max__turn_idx"),
        )
        .select(
            F.col("w.start").cast("date").alias("ts"),
            "count",
            "count__tool",
            "sum__text",
            "min__turn_idx",
            "max__turn_idx",
        )
    )


def stream_partition_checksums(
    stream: DataFrame,
    hash_columns: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "1 day",
    trim_strings: bool = True,
    case_insensitive: bool = False,
) -> DataFrame:
    """Streaming twin of ``operators.checksums.partition_checksums``: each
    window emits its (partition_id, n_rows, xor_lo, xor_hi) fingerprint as
    turns arrive; ``checksum_compare`` against the reference side's batch
    fingerprints then verdicts partitions incrementally — a day of a
    10^12-turn ingest is cleared (or flagged for row-level drilldown) the
    moment its window closes, without any batch re-scan.

    XOR and count are order-independent and merge exactly, so the streaming
    partial aggregation gives bit-identical fingerprints to the batch
    operator (asserted in tests/test_streaming.py). State per window is one
    (count, xor, xor) triple — O(windows inside the watermark horizon).
    """
    from ..functions.calculated import build_row_hash
    from ..operators.aggregates import _bit_xor
    from ..operators.checksums import _SLICE

    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    hashed = build_row_hash(
        stream, hash_columns, trim_strings=trim_strings,
        case_insensitive=case_insensitive,
    )
    lo = F.conv(F.substring("hash__all", 1, _SLICE), 16, 10).cast("long")
    hi = F.conv(
        F.substring("hash__all", _SLICE + 1, _SLICE), 16, 10
    ).cast("long")
    return (
        hashed.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _bit_xor(lo).alias("xor_lo"),
            _bit_xor(hi).alias("xor_hi"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("partition_id"),
            "n_rows",
            "xor_lo",
            "xor_hi",
        )
    )


def stream_uniqueness_alerts(
    stream: DataFrame,
    keys: tuple = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Duplicate-PK alerts from a stream.

    Streaming aggregation keyed on the PK within the watermark horizon;
    update-mode rows with count > 1 are the alerts. State = one counter per
    in-horizon key.
    """
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "1 day").alias("w"), *[F.col(k) for k in keys]
        )
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
        .select(
            F.col("w.start").cast("date").alias("day"),
            *keys,
            "dup_count",
        )
    )


TURN_ORDER_OUTPUT_SCHEMA = (
    "conv_id string, turn_idx long, max_seen long, violation string"
)
_TURN_ORDER_STATE_SCHEMA = "max_idx long, n_turns long"


def stream_turn_order_monitor(
    stream: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-conv
    monotone turn-order monitor — the north-star's 'stable turn ordering
    within conv_id' invariant checked incrementally.

    State per conversation = (max turn_idx seen, turn count): O(1) per key,
    expired after ``timeout_ms`` of inactivity so 10^12 streaming turns
    never accumulate unbounded state. Microbatch semantics are SET-wise
    (shuffle order within a batch is nondeterministic, so the check must
    not depend on arrival order): a turn <= the state's max_seen is an
    'out_of_order' violation; a turn repeated within the batch is a
    'duplicate_in_batch' violation. All numpy-vectorized.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _fn(key, pdf_iter, state: GroupState):
        max_idx, n_turns = state.get if state.exists else (-1, 0)
        if state.hasTimedOut:
            state.remove()
            return
        rows = []
        for pdf in pdf_iter:
            turns = np.sort(pdf[turn_col].to_numpy().astype("int64"))
            if len(turns) == 0:
                continue
            stale = turns[turns <= max_idx]
            dups = turns[1:][turns[1:] == turns[:-1]]
            rows += [
                (key[0], int(t), max_idx, "out_of_order") for t in stale
            ]
            rows += [
                (key[0], int(t), max_idx, "duplicate_in_batch")
                for t in dups
                if t > max_idx  # stale dups already reported above
            ]
            max_idx = max(max_idx, int(turns[-1]))
            n_turns += int(len(turns))
        state.update((max_idx, n_turns))
        state.setTimeoutDuration(timeout_ms)
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "max_seen", "violation"],
            )

    return (
        stream.select(
            F.col(conv_col).alias("conv_id"),
            F.col(turn_col).cast("long").alias(turn_col),
        )
        .groupBy("conv_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=TURN_ORDER_OUTPUT_SCHEMA,
            stateStructType=_TURN_ORDER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def foreachBatch_validate(reference_df: DataFrame, lineage_store=None,
                          cfg_hash: str = "stream", run_id: str = "stream"):
    """Returns a foreachBatch function validating every microbatch against
    ``reference_df`` with the batch row_compare verdict operator and
    (optionally) appending verdicts to the lineage store.

    Pattern: readStream → writeStream.foreachBatch(this) — each microbatch
    is validated with EXACTLY the batch semantics (no parallel
    reimplementation to drift out of sync).
    """
    from ..operators.row_compare import row_compare_verdicts

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        verdicts = row_compare_verdicts(
            batch_df,
            reference_df.join(
                batch_df.select("conv_id").distinct(), "conv_id", "left_semi"
            ),
            ["conv_id", "turn_idx"],
            partition_col=F.lit(str(batch_id)),
        )
        if lineage_store is not None:
            lineage_store.append_verdicts(
                verdicts, cfg_hash, run_id, f"stream_batch_{batch_id}"
            )
        else:
            verdicts.collect()

    return _fn


DEDUP_OUTPUT_SCHEMA = (
    "text_hash string, conv_id string, turn_idx long, n_prior long"
)
_DEDUP_STATE_SCHEMA = "n_seen long"


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming exact-dedup REPORTER via ``applyInPandasWithState``: emit
    every duplicate-text occurrence as it arrives, keeping O(1) state per
    distinct text (a seen-counter keyed by md5(text)).

    The batch twin is operators.dedup.exact_dedup; Spark's built-in
    streaming ``dropDuplicates`` silently keeps firsts, but a validation
    engine must REPORT the drops — (who, when, how many priors) — which
    needs custom state. Semantics: first arrival is the keeper; within one
    microbatch (set-wise, arrival order is shuffle-nondeterministic) the
    smallest (conv_id, turn_idx) is the deterministic keeper and the rest
    are emitted with ``n_prior`` = how many occurrences preceded them.

    State scale at 10^12 turns: one counter per distinct text, expired
    after ``timeout_ms`` of inactivity — the same bounded-state posture as
    the turn-order monitor (dup detection beyond the timeout horizon is the
    batch job's responsibility; the stream catches the hot/recent dups).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        (n_seen,) = state.get if state.exists else (0,)
        rows = []
        for pdf in pdf_iter:
            # a group is ONE text-hash's occurrences within the batch —
            # a handful of rows by construction (dup multiplicity), so the
            # python sort is not a hot path the way per-turn work would be
            batch = sorted(
                zip(pdf[conv_col], pdf[turn_col].astype("int64"))
            )
            for conv, turn in batch:
                if n_seen > 0:
                    rows.append((key[0], conv, int(turn), int(n_seen)))
                n_seen += 1
        state.update((n_seen,))
        state.setTimeoutDuration(timeout_ms)
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["text_hash", "conv_id", "turn_idx", "n_prior"],
            )

    return (
        stream.select(
            F.md5(F.col(text_col)).alias("text_hash"),
            F.col(conv_col).alias(conv_col),
            F.col(turn_col).cast("long").alias(turn_col),
        )
        .groupBy("text_hash")
        .applyInPandasWithState(
            _fn,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=_DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_expectations(
    stream: DataFrame,
    rules,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "1 day",
) -> DataFrame:
    """Streaming twin of operators.expectations.run_expectations: the same
    declarative rules evaluated per event-time window, emitted once each
    window closes (append mode + watermark).

    Every rule kind lowers to an algebraic conditional aggregate, so the
    streaming state per window is a handful of (sum, count) pairs; 'unique'
    rules use approx_count_distinct (HLL — mergeable, bounded state; exact
    distinct in streaming state would grow with cardinality, which is
    precisely what a 10^12-turn stream cannot do). Report schema matches
    the batch engine plus the window-start column, so verdicts route to the
    same lineage table.
    """
    from ..config import consts
    from ..operators.expectations import _pass_condition

    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(rules):
        if e.kind == "unique":
            aggs.append(
                F.approx_count_distinct(e.column)
                .cast("double")
                .alias(f"__m{i}")
            )
            aggs.append(F.count(e.column).cast("double").alias(f"__t{i}"))
        else:
            aggs.append(
                F.avg(
                    F.when(_pass_condition(e), 1.0).otherwise(0.0)
                ).alias(f"__m{i}")
            )
    wide = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*aggs)
    )
    structs = []
    for i, e in enumerate(rules):
        if e.kind == "unique":
            obs = F.when(
                F.col(f"__t{i}") > 0,
                F.least(F.col(f"__m{i}") / F.col(f"__t{i}"), F.lit(1.0)),
            ).otherwise(F.lit(1.0))
        else:
            obs = F.coalesce(F.col(f"__m{i}"), F.lit(1.0))
        structs.append(
            F.struct(
                F.lit(e.rule_name).alias("rule_name"),
                F.lit(e.kind).alias("rule_kind"),
                F.lit(e.column).cast("string").alias("column"),
                F.round(obs, 6).alias("observed"),
                F.lit(float(e.threshold)).alias("threshold"),
                F.when(
                    F.round(obs, 6) >= F.lit(float(e.threshold)),
                    F.lit(consts.VALIDATION_STATUS_SUCCESS),
                )
                .otherwise(F.lit(consts.VALIDATION_STATUS_FAIL))
                .alias("validation_status"),
            )
        )
    return wide.select(
        F.col("w.start").alias("window_start"),
        F.explode(F.array(*structs)).alias("r"),
    ).select("window_start", "r.*")


def stream_seen_filter(
    stream: DataFrame,
    seen: DataFrame,
    new_key,
    seen_key=None,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Streaming twin of operators.bloom.seen_filter: EXACT "not yet in the
    ingested corpus" gate on an arriving document/turn stream.

    The bitset is built ONCE from the static ``seen`` side (a batch
    bit_or aggregate, operators/bloom.py) and enters every micro-batch as a
    broadcast one-row crossJoin — a shipped constant. Bloom-miss rows pass
    with NO join at all; bloom-hit candidates (true matches + false
    positives) are removed/verified by a STATELESS stream-static left-anti
    join against the distinct seen keys. No watermark, no state store —
    state never grows with the stream. Exact at any n_bits (no false
    negatives; FPs verified away). Dedup WITHIN the stream is
    ``stream_exact_dedup``'s job (stateful); this operator gates against
    the already-ingested corpus.
    """
    from ..operators.bloom import (
        bloom_bitset,
        bloom_might_contain,
        _WORDS,
    )

    nk = F.col(new_key) if isinstance(new_key, str) else new_key
    sk = (
        (F.col(seen_key) if isinstance(seen_key, str) else seen_key)
        if seen_key is not None
        else nk
    )
    bitset = bloom_bitset(seen, sk, n_bits, n_hashes)
    flagged = (
        stream.crossJoin(F.broadcast(bitset))
        .withColumn(
            "__bloom_hit", bloom_might_contain(nk, n_bits, n_hashes)
        )
        .drop(_WORDS)
    )
    definite_new = flagged.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
    candidates = flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    seen_keys = seen.select(sk.alias("__seen_key")).dropDuplicates()
    verified_new = candidates.join(
        F.broadcast(seen_keys), nk == F.col("__seen_key"), "left_anti"
    )
    return definite_new.unionByName(verified_new)


def stream_drift_psi(
    stream: DataFrame,
    reference: DataFrame,
    category_col,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "1 day",
    eps: float = 1e-6,
) -> DataFrame:
    """Per-window Population Stability Index of a categorical column
    against a STATIC reference distribution — the streaming twin of
    operators.drift.psi (per-day drift verdicts as each window closes).

    The reference distribution is computed once batch-side and enters the
    stream as literals (an |categories|-entry map — roles/langs/tools are
    small). Per window the stream needs only ONE stateful aggregation
    chain: counts per (window, value), then the per-window fold (chained
    event-time aggregations, append mode). Categories present in the
    reference but ABSENT from a window cannot produce rows, so their
    epsilon-floored contribution sum((eps - q) ln(eps/q)) is folded in as
    a precomputed constant, and each OBSERVED reference category subtracts
    its own absent-term back out — exact algebra, no row generation. An
    observed value missing from the reference gets q = eps (its correction
    term is identically 0).
    """
    cat = (
        F.col(category_col) if isinstance(category_col, str) else category_col
    )
    import math

    ref = (
        reference.groupBy(cat.cast("string").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    tot = sum(r["n"] for r in ref) or 1
    q_by_v = {r["v"]: max(r["n"] / tot, eps) for r in ref if r["v"] is not None}
    c_total = sum((eps - q) * math.log(eps / q) for q in q_by_v.values())
    q_map = (
        F.create_map(
            *[F.lit(x) for v, q in sorted(q_by_v.items()) for x in (v, q)]
        )
        if q_by_v
        else F.create_map()
    )

    s = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    counts = (
        s.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            cat.cast("string").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cells = counts.groupBy("w").agg(
        F.collect_list(F.struct("n", "v")).alias("cells")
    )
    total = F.aggregate(
        "cells", F.lit(0).cast("long"), lambda acc, x: acc + x["n"]
    ).cast("double")

    def _term(x):
        p = F.greatest(x["n"] / total, F.lit(eps))
        q = F.coalesce(q_map[x["v"]], F.lit(eps))
        present = (p - q) * F.log(p / q)
        absent = (F.lit(eps) - q) * F.log(F.lit(eps) / q)
        return present - absent

    psi = (
        F.aggregate(
            "cells", F.lit(0.0), lambda acc, x: acc + _term(x)
        )
        + F.lit(c_total)
    )
    return cells.select(
        F.col("w.start").cast("date").alias("ts"),
        F.round(psi, 6).alias("psi"),
    )


def stream_drift_psi_quantile(
    stream: DataFrame,
    reference: DataFrame,
    value_col,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    window: str = "1 day",
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-window equal-frequency NUMERIC PSI against a static reference —
    the streaming twin of operators.drift.psi_quantile_binned, built by
    composition: the reference's exact interior percentiles are computed
    once batch-side and folded into the stream as a literal edge array
    (map-only bin assignment inside the stream's stateless projection);
    the per-window PSI fold then reuses stream_drift_psi on the bin index
    (bins are just categories), inheriting its absent-category correction
    algebra and chained event-time aggregation plan. State per window is
    <= n_bins + 1 counters.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    fracs = [i / n_bins for i in range(1, n_bins)]
    ref_v = reference.select(v.cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    edges = ref_v.agg(
        F.percentile("__v", F.array(*[F.lit(p) for p in fracs])).alias("e")
    ).first()["e"]
    edge_arr = F.array(*[F.lit(float(e)) for e in edges])

    def _bin(frame: DataFrame, keep_ts: bool) -> DataFrame:
        vv = frame[value_col] if isinstance(value_col, str) else value_col
        b = F.aggregate(
            edge_arr,
            F.lit(0),
            lambda acc, e: acc
            + F.when(vv.cast("double") > e, 1).otherwise(0),
        ).alias("__bin")
        cols = [b] + ([F.col(ts_col)] if keep_ts else [])
        return frame.filter(vv.isNotNull()).select(*cols)

    return stream_drift_psi(
        _bin(stream, keep_ts=True),
        _bin(reference, keep_ts=False),
        "__bin",
        ts_col=ts_col,
        watermark=watermark,
        window=window,
        eps=eps,
    )


LOOP_MONITOR_OUTPUT_SCHEMA = (
    "conv_id string, turn_idx long, role string, run_len long"
)
_LOOP_STATE_SCHEMA = (
    "last_turn long, run_len long, last_role string, last_hash string"
)


def stream_loop_monitor(
    stream: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    min_run: int = 3,
    timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming twin of operators/conversation.py loop_detection: per-conv
    stuck-loop alerts via ``applyInPandasWithState`` — an agent re-emitting
    the identical (role, text) turn is caught WHILE the conversation is
    still running, not in the nightly batch pass.

    State per conversation = (last turn_idx, current run length, last role,
    last text sha256): O(1) per key, expired after ``timeout_ms`` idle so
    10^12 streaming turns never accumulate unbounded state. Microbatch
    semantics are set-wise: turns are sorted by turn_idx within the batch
    and a run only extends across EXACTLY-ADJACENT turn indexes (gaps from
    late/missing turns reset the run rather than fabricating adjacency —
    the batch operator joins on turn+1 for the same reason). One alert row
    per turn whose run length reaches ``min_run``; text is hashed
    vectorized (pandas sha256 over utf-8) so the shuffle and the state
    carry 64 hex chars, never the text payload.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        last_turn, run_len, last_role, last_hash = (
            state.get if state.exists else (-2, 0, None, None)
        )
        rows = []
        # ADVICE r3: a conversation's microbatch slice can span multiple
        # Arrow chunks (> arrow.maxRecordsPerBatch rows); sorting each chunk
        # independently would accumulate turns out of global order. One
        # conversation's slice is small by construction (turns/conv, not
        # corpus-sized), so materialize-and-sort-once is safe.
        chunks = [p for p in pdf_iter if len(p)]
        whole = (
            pd.concat(chunks, ignore_index=True).sort_values(turn_col)
            if chunks
            else None
        )
        for pdf in [whole] if whole is not None else []:
            turns = pdf[turn_col].to_numpy().astype("int64")
            roles = pdf[role_col].astype("object").to_numpy()
            hashes = np.array(
                [
                    hashlib.sha256(
                        (t if t is not None else "\x00NULL").encode("utf-8")
                    ).hexdigest()
                    for t in pdf[text_col].astype("object")
                ],
                dtype="object",
            )
            for i in range(len(turns)):
                t, r, h = int(turns[i]), roles[i], hashes[i]
                if t == last_turn + 1 and r == last_role and h == last_hash:
                    run_len += 1
                else:
                    run_len = 1
                last_turn, last_role, last_hash = t, r, h
                if run_len >= min_run:
                    rows.append((key[0], t, r, int(run_len)))
        state.update((last_turn, run_len, last_role, last_hash))
        state.setTimeoutDuration(timeout_ms)
        if rows:
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "run_len"]
            )

    return (
        stream.select(
            F.col(conv_col).alias("conv_id"),
            F.col(turn_col).cast("long").alias(turn_col),
            F.col(role_col).alias(role_col),
            F.col(text_col).alias(text_col),
        )
        .groupBy("conv_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=LOOP_MONITOR_OUTPUT_SCHEMA,
            stateStructType=_LOOP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


BUDGET_MONITOR_OUTPUT_SCHEMA = (
    "conv_id string, turn_idx long, cum_tokens long, n_turns long"
)
_BUDGET_STATE_SCHEMA = "cum long, n_turns long, alerted boolean"


def stream_context_budget_monitor(
    stream: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming twin of operators/conversation.py context_budget_overflow:
    per-conversation running BPE-estimate token total via
    ``applyInPandasWithState``, alerting the moment a LIVE conversation
    crosses the context budget — so an agent can truncate/summarize now
    instead of discovering the overflow in the nightly batch pass.

    State per conversation = (cumulative cost, turns seen, alerted): O(1)
    per key, expired after ``timeout_ms`` idle. Exactly ONE alert row per
    conversation (the first crossing; `alerted` latches). Turns are sorted
    by turn_idx within each microbatch; the token cost replicates
    text.bpe_cost (' +'-split words, ceil(len/4) each; NULL/empty cost 0)
    inside the Arrow batch, so the streaming and batch verdicts agree on
    ordered input.
    """
    import re

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _cost(t) -> int:
        if t is None or (isinstance(t, float) and pd.isna(t)):
            return 0
        words = re.split(" +", str(t).strip())
        return sum((len(w) + 3) // 4 for w in words)

    def _fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        cum, n_turns, alerted = (
            state.get if state.exists else (0, 0, False)
        )
        rows = []
        # ADVICE r3: sort the WHOLE microbatch slice of this conversation,
        # not each Arrow chunk independently — otherwise the first-crossing
        # turn_idx/cum_tokens can be wrong when the slice spans chunks.
        chunks = [p for p in pdf_iter if len(p)]
        whole = (
            pd.concat(chunks, ignore_index=True).sort_values(turn_col)
            if chunks
            else None
        )
        for pdf in [whole] if whole is not None else []:
            turns = pdf[turn_col].to_numpy().astype("int64")
            costs = [_cost(t) for t in pdf[text_col].astype("object")]
            for t, c in zip(turns, costs):
                cum += int(c)
                n_turns += 1
                if cum > budget and not alerted:
                    alerted = True
                    rows.append((key[0], int(t), int(cum), int(n_turns)))
        state.update((int(cum), int(n_turns), bool(alerted)))
        state.setTimeoutDuration(timeout_ms)
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "cum_tokens", "n_turns"],
            )

    return (
        stream.select(
            F.col(conv_col).alias("conv_id"),
            F.col(turn_col).cast("long").alias(turn_col),
            F.col(text_col).alias(text_col),
        )
        .groupBy("conv_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=BUDGET_MONITOR_OUTPUT_SCHEMA,
            stateStructType=_BUDGET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
