"""Similarity search over embedding columns (array<float>).

BASELINE training-data extension; no reference analog. Two paths:

- brute_force_topk: exact cosine top-k. Queries are broadcast (small Q),
  the corpus is scanned once; per-partition top-k via window rank after a
  repartition-free aggregation — Spark executes rank-filter with partial
  top-k pushdown under AQE. Dot products stay JVM-side via
  ``aggregate(zip_with(...))`` — no Python.
- ivf_topk: IVF-style two-stage search. Coarse centroids (here: per-label
  means, i.e. a pre-trained quantizer; production would k-means) are
  broadcast; each query probes its ``nprobe`` nearest centroids and scans
  only those inverted lists — the candidate set shrinks by ~|labels|/nprobe.

All math in double precision with deterministic left-to-right array folds,
scores rounded for cross-engine comparability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, rank, score).

    queries is broadcast (small); ties broken by neighbor_id for
    determinism. Self-matches excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("score_raw", round_digits).alias("score"),
        )
    )


def label_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean vectors — the coarse quantizer for ivf_topk.

    Element-wise mean via posexplode + groupBy(label, pos) + collect back
    with array ordering: all built-ins, one shuffle of (label, pos, val).
    """
    pos = corpus.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    means = pos.groupBy("label", "pos").agg(
        F.avg(F.col("val").cast("double")).alias("m")
    )
    return (
        means.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("pm")
        )
        .select(
            "label",
            F.transform(F.col("pm"), lambda s: s.getField("m")).alias(
                "centroid"
            ),
        )
    )


def srp_planes(dim: int, bits: int = 16, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 random hyperplanes from md5 — engine-portable, so
    the same planes can be inlined into a SQL oracle."""
    import hashlib

    planes = []
    for b in range(bits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{b}|{d}".encode()).digest()[0]
            row.append(1 if h % 2 == 0 else -1)
        planes.append(row)
    return planes


def srp_signature(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Sign-random-projection (SimHash-for-vectors) signature: bit b is the
    sign of <vec, plane_b>. P(bits agree) = 1 - angle/pi, so close-cosine
    vectors land in close signatures — the LSH structure for embedding
    near-dup detection (Charikar '02). All JVM-side literal-array folds."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = srp_planes(dim, bits, seed)
    sig = None
    for b, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda a, p: a.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot >= 0, F.lit(2 ** b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sig.cast("long").alias("srp_sig"),
    )


def srp_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    seed: int = 42,
    max_hamming: int = 2,
    min_cosine: float = 0.3,
    n_chunks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs WITHOUT the quadratic self-join:
    pigeonhole chunk blocking on the SRP signature (two signatures within
    hamming d share at least one of d+1 chunks -> bucketed equi-join on
    (chunk_idx, chunk_val)), then exact cosine verification on the
    candidates only. Output: (id_a, id_b, hamming, cos) with cos rounded
    for cross-engine comparability."""
    n_chunks = n_chunks or (max_hamming + 1)
    chunk_bits = bits // n_chunks
    sigs = srp_signature(df, id_col, vec_col, bits, seed)
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_idx"),
                (
                    F.shiftright(F.col("srp_sig"), i * chunk_bits)
                    % F.lit(2 ** chunk_bits)
                ).alias("chunk_val"),
            )
            for i in range(n_chunks)
        ]
    )
    # both self-join sides read `chunks`; persist so the 16-plane signature
    # fold over the corpus runs once, not twice (same rationale as
    # simhash_near_pairs — the asymmetric id_a < id_b filter defeats
    # ReusedExchange). Spills to disk at scale: one corpus scan, not two.
    from pyspark import StorageLevel

    chunks = sigs.select(
        "id", "vec", "srp_sig", F.explode(chunk_structs).alias("ch")
    ).select(
        "id", "vec", "srp_sig",
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.col("ch.chunk_val").alias("chunk_val"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = chunks.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("srp_sig").alias("sig_a"),
        "chunk_idx",
        "chunk_val",
    )
    b = chunks.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vb"),
        F.col("srp_sig").alias("sig_b"),
        "chunk_idx",
        "chunk_val",
    )
    pairs = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "va",
            "vb",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            "hamming",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= min_cosine)
    )


def _center_score(vec_col: Column, center: list[float]) -> Column:
    """cosine(vec, literal centroid) with the centroid's norm precomputed
    driver-side — one JVM fold per row per centroid, no Python."""
    import math

    norm_c = math.sqrt(sum(x * x for x in center)) or 1.0
    dot = F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(float(x)) for x in center]),
            lambda a, b: a.cast("double") * b,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot / (_norm(vec_col) * F.lit(norm_c))


def _assign_scores(vec_col: Column, centers: list[list[float]]) -> Column:
    return F.array(*[_center_score(vec_col, c) for c in centers])


#: decimal places centroid coordinates are rounded to after every update.
#: Spark's distributed ``avg`` sums partials in nondeterministic order, so
#: unrounded centroids wobble in the last ulp run-to-run; rounding pins the
#: trained matrix so it is reproducible (and replayable by
#: ``kmeans_centroids_local`` for the DuckDB oracle). 9 dp is far below any
#: quantizer-quality threshold and far above double-sum noise (~1e-16).
KMEANS_ROUND_DP = 9


def kmeans_centroids(
    corpus: DataFrame,
    n_clusters: int = 10,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic spherical k-means as DataFrame ops (Lloyd's algorithm).

    Init: the ``n_clusters`` vectors with the smallest md5(id) — a seeded,
    engine-portable pseudo-random draw (same trick as deterministic_sample).
    Each iteration: (1) assign every vector to its max-cosine centroid via a
    broadcast literal-array fold (no join, no shuffle); (2) recompute
    centroids with posexplode + groupBy(cluster, pos) — one shuffle of
    (cluster, pos, val). Only the k x d centroid matrix is ever collected.
    Replaces the round-1 per-label means (a *pre-trained* stand-in) with an
    actually trained coarse quantizer.

    The projected (id, vec) corpus is persisted across the ``iters + 1``
    passes (seed draw + one scan per Lloyd iteration) — without it every
    iteration re-reads and re-decodes the source. Centroid coordinates are
    rounded to ``KMEANS_ROUND_DP`` after every update, which makes the
    trained matrix deterministic and bit-replayable by
    ``kmeans_centroids_local`` (the oracle path).
    """
    proj = corpus.select(id_col, vec_col).persist()
    try:
        seed_rows = (
            proj.withColumn("__h", F.md5(F.col(id_col).cast("string")))
            .orderBy("__h")
            .limit(n_clusters)
            .collect()
        )
        centers = [
            [round(float(x), KMEANS_ROUND_DP) for x in r[vec_col]]
            for r in seed_rows
        ]
        for _ in range(iters):
            scores = _assign_scores(F.col(vec_col), centers)
            assigned = proj.select(
                F.col(vec_col).alias("v"),
                (F.array_position(scores, F.array_max(scores)) - 1).alias("c"),
            )
            means = (
                assigned.select("c", F.posexplode("v").alias("pos", "val"))
                .groupBy("c", "pos")
                .agg(F.avg(F.col("val").cast("double")).alias("m"))
                .collect()
            )
            by_c: dict[int, dict[int, float]] = {}
            for r in means:
                by_c.setdefault(int(r["c"]), {})[int(r["pos"])] = round(
                    float(r["m"]), KMEANS_ROUND_DP
                )
            new_centers = []
            for i, old in enumerate(centers):
                if i in by_c:  # empty clusters keep their previous center
                    d = by_c[i]
                    new_centers.append([d[p] for p in sorted(d)])
                else:
                    new_centers.append(old)
            centers = new_centers
        return centers
    finally:
        proj.unpersist()


def _cosine_fold_local(vec: list[float], center: list[float],
                       norm_c: float) -> float:
    """Driver-side cosine that reproduces the Spark expression bit-for-bit:
    left-to-right double folds (``F.aggregate`` order) for both the dot
    product and the vector norm, and the same (norm_v * norm_c) grouping as
    ``_center_score``."""
    import math

    dot = 0.0
    for a, b in zip(vec, center):
        dot += a * b
    nv = 0.0
    for a in vec:
        nv += a * a
    return dot / (math.sqrt(nv) * norm_c)


def kmeans_centroids_local(
    rows: list[tuple], n_clusters: int = 10, iters: int = 3
) -> list[list[float]]:
    """Pure-Python replay of ``kmeans_centroids`` over in-memory (id, vec)
    rows — the independent implementation behind the DuckDB oracle for
    ``embedding_kmeans_ann`` (same literal-inlining trick as the SRP planes).

    Mirrors the Spark path exactly: md5-seeded init, first-argmax cosine
    assignment (``array_position`` returns the FIRST max, as does
    ``list.index``), per-cluster means, empty clusters keeping their previous
    center, and ``KMEANS_ROUND_DP`` rounding after every update. The
    assignment scores are bit-identical (same fold order); the means differ
    from Spark's distributed avg only at ~1e-16, which the rounding absorbs.
    Parity with the Spark trainer is asserted in tests/test_training_ops.py.
    """
    import hashlib
    import math

    by_hash = sorted(
        rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest()
    )
    centers = [
        [round(float(x), KMEANS_ROUND_DP) for x in r[1]]
        for r in by_hash[:n_clusters]
    ]
    vecs = [[float(x) for x in r[1]] for r in rows]
    for _ in range(iters):
        norms = [math.sqrt(sum(x * x for x in c)) or 1.0 for c in centers]
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for v in vecs:
            scores = [
                _cosine_fold_local(v, c, nc) for c, nc in zip(centers, norms)
            ]
            best = scores.index(max(scores))
            if best not in sums:
                sums[best] = [0.0] * len(v)
                counts[best] = 0
            acc = sums[best]
            for i, x in enumerate(v):
                acc[i] += x
            counts[best] += 1
        new_centers = []
        for i, old in enumerate(centers):
            if i in sums:
                n = counts[i]
                new_centers.append(
                    [round(s / n, KMEANS_ROUND_DP) for s in sums[i]]
                )
            else:
                new_centers.append(old)
        centers = new_centers
    return centers


def kmeans_centroids_sampled(
    corpus: DataFrame,
    n_clusters: int = 10,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 512,
) -> list[list[float]]:
    """Sample-trained coarse quantizer — the 100-TB path (VERDICT r3 #4).

    Standard IVF practice (FAISS trains quantizers on ~30×k sampled
    vectors, never the full corpus): take the ``sample_size`` rows with the
    smallest md5(id) — the same seeded, engine-portable pseudo-random draw
    as deterministic_sample — in ONE Spark job (TakeOrderedAndProject:
    per-partition partial top-k, no full sort, O(sample) driver memory),
    then run the pure-Python Lloyd replay on the driver. Versus the
    distributed trainer this replaces ``iters + 1`` full-corpus Spark jobs
    with one bounded sample job: at billions of vectors the quantizer cost
    becomes O(sample × iters) on the driver instead of O(corpus × iters)
    across the cluster, and at bench scale it removes the per-iteration job
    overhead that dominated the timing. Deterministic and independently
    replayable: the DuckDB oracle re-draws the identical sample (same md5
    order) and calls the same local Lloyd.
    """
    rows = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(sample_size)
        .collect()
    )
    return kmeans_centroids_local(
        [(r[id_col], list(r[vec_col])) for r in rows], n_clusters, iters
    )


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
    n_clusters: int = 10,
    iters: int = 3,
    round_digits: int = 4,
    train_sample: int | None = None,
) -> DataFrame:
    """IVF ANN over a *trained* k-means coarse quantizer.

    Same two-stage shape as ivf_topk but the inverted lists are k-means
    cells: corpus rows are tagged with their argmax-cosine cluster (literal
    fold, no shuffle), queries probe their ``nprobe`` best clusters, and
    only those cells are scanned. Recall vs brute_force_topk is measured in
    tests (pytest recall@k bound).

    ``train_sample``: when set, the quantizer trains on a deterministic
    md5-sample of that size via ``kmeans_centroids_sampled`` (the scale
    path — one bounded Spark job + driver-side Lloyd) instead of the
    ``iters + 1``-job distributed trainer.
    """
    if train_sample:
        centers = kmeans_centroids_sampled(
            corpus, n_clusters, iters, id_col, vec_col, train_sample
        )
    else:
        centers = kmeans_centroids(corpus, n_clusters, iters, id_col, vec_col)
    c_scores = _assign_scores(F.col(vec_col), centers)
    tagged = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        (F.array_position(c_scores, F.array_max(c_scores)) - 1).alias(
            "__cluster"
        ),
    )
    q_scores = _assign_scores(F.col(vec_col), centers)
    q_exp = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.posexplode(q_scores).alias("__cluster", "cscore"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("__cluster")
    )
    probes = (
        q_exp.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qv", "__cluster")
    )
    scored = (
        F.broadcast(probes)
        .join(tagged, "__cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("score_raw", round_digits).alias("score"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    nprobe: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """IVF two-stage ANN: probe ``nprobe`` nearest centroids, scan only
    their lists. Output shape matches brute_force_topk (recall < 1 by
    design; the tests measure recall against the exact path)."""
    cents = F.broadcast(label_centroids(corpus, vec_col, label_col))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qc = q.crossJoin(cents).select(
        "query_id",
        "qv",
        "label",
        cosine(F.col("qv"), F.col("centroid")).alias("cscore"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("label")
    )
    probes = (
        qc.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qv", "label")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col(label_col).alias("label"),
    )
    scored = (
        F.broadcast(probes)
        .join(c, "label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("score_raw", round_digits).alias("score"),
        )
    )


def embedding_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    expected_dim: int,
    zero_tol: float = 1e-12,
) -> DataFrame:
    """Embedding-column quality profile: the validation-engine checks an
    array<float> column needs before any ANN/near-dup stage trusts it
    (no reference analog — BASELINE extension; a single bad batch of NULL /
    truncated / NaN / all-zero vectors silently poisons every cosine op
    downstream, since cosine with a zero vector is 0/0).

    One pass, built-ins only: per-row flags (null, wrong dim, non-finite
    element, ~zero norm) and the L2 norm (double fold, rounded 6dp BEFORE
    the distribution stats so the percentile interpolation is bit-stable
    cross-engine), then ONE global aggregate:
    (n_vecs, n_null, n_wrong_dim, n_nonfinite, n_zero_norm,
     avg_norm, p50_norm) — norm stats over healthy vectors only.
    """
    v = F.col(vec_col)
    sq = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm = F.round(F.sqrt(sq), 6)
    nonfinite = F.exists(
        v, lambda x: F.isnan(x.cast("double")) | (F.abs(x) == float("inf"))
    )
    flagged = df.select(
        F.when(v.isNull(), 1).otherwise(0).alias("is_null"),
        F.when(v.isNotNull() & (F.size(v) != expected_dim), 1)
        .otherwise(0)
        .alias("wrong_dim"),
        F.when(v.isNotNull() & nonfinite, 1).otherwise(0).alias("nonfin"),
        F.when(
            v.isNotNull() & ~nonfinite & (sq <= zero_tol), 1
        ).otherwise(0).alias("zero_norm"),
        F.when(
            v.isNotNull()
            & (F.size(v) == expected_dim)
            & ~nonfinite
            & (sq > zero_tol),
            norm,
        ).alias("healthy_norm"),
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("is_null").cast("long").alias("n_null"),
        F.sum("wrong_dim").cast("long").alias("n_wrong_dim"),
        F.sum("nonfin").cast("long").alias("n_nonfinite"),
        F.sum("zero_norm").cast("long").alias("n_zero_norm"),
        F.round(F.avg("healthy_norm"), 6).alias("avg_norm"),
        F.round(F.percentile(F.col("healthy_norm"), F.lit(0.5)), 6).alias(
            "p50_norm"
        ),
    )


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    vec_col: str,
    n_bins: int = 10,
    norm_lo: float = 0.0,
    norm_hi: float = 2.0,
) -> DataFrame:
    """Distribution drift between two snapshots of an embedding column —
    the gate that catches a silently-swapped encoder model or a corrupted
    re-embedding batch before the vectors feed dedup/ANN (no reference
    analog — BASELINE extension alongside the KS/PSI drift family).

    Two signals in one output row:
    - centroid shift: per-dimension means of each side (posexplode ->
      groupBy(pos), map-side combined, shuffle = O(dim x partitions) rows),
      joined on dimension (dim rows) and folded to cosine similarity and
      L2 distance between the two mean vectors;
    - norm-distribution PSI: L2 norms binned on FIXED edges
      [norm_lo, norm_hi) (data-independent, so the binning is
      deterministic cross-engine; outliers clamp to the edge bins),
      fed through the same epsilon-floored ``psi`` fold the categorical
      drift checks use.

    Output: (n_old, n_new, centroid_cosine, centroid_l2, norm_psi), all
    floats rounded 6dp for bit-stable cross-engine comparison. Nothing
    O(rows) leaves the executors: the widest shuffle carries dim-keyed
    partial sums; every later exchange is O(dim) or O(bins).
    """
    from .drift import psi

    v = F.col(vec_col)

    def _means(df: DataFrame, side: str) -> DataFrame:
        ex = df.select(F.posexplode(v).alias("pos", "x"))
        return ex.groupBy("pos").agg(
            F.avg(F.col("x").cast("double")).alias(f"m_{side}")
        )

    cen = (
        _means(old, "old")
        .join(_means(new, "new"), "pos", "inner")
        .agg(
            F.sum(F.col("m_old") * F.col("m_new")).alias("dot"),
            F.sum(F.col("m_old") * F.col("m_old")).alias("no"),
            F.sum(F.col("m_new") * F.col("m_new")).alias("nn"),
            F.sum(
                (F.col("m_old") - F.col("m_new"))
                * (F.col("m_old") - F.col("m_new"))
            ).alias("d2"),
        )
        .select(
            F.round(
                F.col("dot") / F.sqrt(F.col("no") * F.col("nn")), 6
            ).alias("centroid_cosine"),
            F.round(F.sqrt(F.col("d2")), 6).alias("centroid_l2"),
        )
    )

    width = (norm_hi - norm_lo) / n_bins
    norm = F.round(
        F.sqrt(
            F.aggregate(
                v,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ),
        6,
    )
    bin_idx = F.least(
        F.greatest(
            F.floor((norm - F.lit(norm_lo)) / F.lit(width)), F.lit(0)
        ),
        F.lit(n_bins - 1),
    ).cast("int")

    def _binned(df: DataFrame) -> DataFrame:
        return df.filter(v.isNotNull()).select(bin_idx.alias("bin"))

    ob, nb = _binned(old), _binned(new)
    norm_psi = psi(ob, nb, F.col("bin")).select(
        F.round(F.col("psi"), 6).alias("norm_psi")
    )
    counts = old.agg(
        F.count(v).cast("long").alias("n_old")
    ).crossJoin(new.agg(F.count(v).cast("long").alias("n_new")))
    return (
        counts.crossJoin(F.broadcast(cen)).crossJoin(F.broadcast(norm_psi))
    )


def embedding_novelty(
    new_df: DataFrame,
    old_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    seed: int = 42,
    max_hamming: int = 2,
    min_cosine: float = 0.3,
    dim: int | None = None,
) -> DataFrame:
    """Semantic-novelty gate for an incoming embedding batch: which new
    vectors have NO near-cosine neighbor in the already-ingested corpus?
    The training-pipeline question behind it: how much of this crawl is
    actually new signal vs re-embeddings of content the model has already
    seen — exact dedup (md5) and n-gram decontamination both miss
    paraphrases that land close in embedding space.

    Same sub-quadratic structure as srp_near_pairs, but CROSS-TABLE and
    asymmetric: SRP signatures per side (JVM literal-array folds),
    pigeonhole chunk blocking (two signatures within hamming d share >= 1
    of d+1 chunks), bucketed equi-join on (chunk_idx, chunk_val) between
    the new batch and the corpus — never new x old — then exact cosine on
    candidates only. Candidates ~ sum over buckets |new_b| x |old_b|; the
    corpus side never self-joins. Recall is the SRP recall (missed
    neighbors have hamming > max_hamming); raise bits/max_hamming for
    tighter guarantees, exactly as in srp_near_pairs.

    Output, one row per NEW vector (ordered by id): (id, n_matches =
    distinct corpus neighbors at cos >= min_cosine, max_cos 6dp,
    nearest_id — ties broken toward the larger corpus id on the ROUNDED
    cosine for engine-stable determinism, is_novel).
    """
    new_sigs = srp_signature(new_df, id_col, vec_col, bits, seed, dim=dim)
    old_sigs = srp_signature(old_df, id_col, vec_col, bits, seed, dim=dim)
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks

    def _chunks(sigs: DataFrame, side: str) -> DataFrame:
        structs = F.array(
            *[
                F.struct(
                    F.lit(i).alias("chunk_idx"),
                    (
                        F.shiftright(F.col("srp_sig"), i * chunk_bits)
                        % F.lit(2 ** chunk_bits)
                    ).alias("chunk_val"),
                )
                for i in range(n_chunks)
            ]
        )
        return sigs.select(
            F.col("id").alias(f"id_{side}"),
            F.col("vec").alias(f"v{side}"),
            F.col("srp_sig").alias(f"sig_{side}"),
            F.explode(structs).alias("ch"),
        ).select(
            f"id_{side}", f"v{side}", f"sig_{side}",
            F.col("ch.chunk_idx").alias("chunk_idx"),
            F.col("ch.chunk_val").alias("chunk_val"),
        )

    cand = (
        _chunks(new_sigs, "n")
        .join(_chunks(old_sigs, "o"), ["chunk_idx", "chunk_val"])
        .filter(
            F.bit_count(F.col("sig_n").bitwiseXOR(F.col("sig_o")))
            <= max_hamming
        )
        .dropDuplicates(["id_n", "id_o"])
        .select(
            "id_n", "id_o",
            F.round(cosine(F.col("vn"), F.col("vo")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= min_cosine)
    )
    matched = cand.groupBy("id_n").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.max("cos").alias("max_cos"),
        F.max_by(
            "id_o", F.struct(F.col("cos"), F.col("id_o"))
        ).alias("nearest_id"),
    )
    return (
        new_df.select(F.col(id_col).alias("id"))
        .join(matched, F.col("id") == F.col("id_n"), "left")
        .select(
            "id",
            F.coalesce("n_matches", F.lit(0).cast("long")).alias("n_matches"),
            "max_cos",
            "nearest_id",
            F.col("n_matches").isNull().alias("is_novel"),
        )
        .orderBy("id")
    )
