"""Deterministic sampling.

Reference analog: random-row validation — ``ORDER BY rand LIMIT n``
(reference data_validation/query_builder/random_row_builder.py:86-104,
default batch 10,000 reference consts.py:83). Engine RNGs differ, so for
cross-engine reproducibility we derive the "random" order from a hash of the
key columns: same rows selected on any engine, any partitioning, any run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import consts


def deterministic_sample(
    df: DataFrame,
    keys: list[str],
    n: int = consts.DEFAULT_NUM_RANDOM_ROWS,
    seed: int = 42,
) -> DataFrame:
    """Top-n rows by md5(seed || keys) — a seeded, engine-portable 'random'
    sample. Spark executes this as TakeOrderedAndProject (distributed top-K,
    no global sort materialization)."""
    h = F.md5(
        F.concat_ws(
            "|", F.lit(str(seed)), *[F.col(k).cast("string") for k in keys]
        )
    )
    return (
        df.withColumn("__h", h)
        .orderBy("__h", *keys)
        .limit(n)
        .drop("__h")
    )


def hash_split(
    df: DataFrame,
    keys: list[str],
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split assignment — ``sampleBy`` without
    the irreproducibility (no reference analog; BASELINE training-pipeline
    extension).

    Each row gets a uniform bucket in [0,1) from the first 8 hex chars of
    md5(seed|keys), then a split name by cumulative weight. Properties
    ``rand()``-based splitting lacks:

    - reproducible across runs, engines, partitionings (hash of values);
    - group-coherent: key on conv_id and every turn of a conversation lands
      in the SAME split — the leakage guard a transcript pipeline needs;
    - stable under appends: existing rows never migrate when data grows.

    Implementation is a pure string CASE over the hex prefix against
    precomputed hex thresholds — no numeric conversion, whole-stage-codegen
    friendly, zero shuffle (a map-only projection), and byte-identical in
    any engine with md5 (exact DuckDB oracle). Weights are normalized;
    boundaries quantize to 1/16^8 (~2.3e-10).
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    total = float(sum(weights.values()))
    names = list(weights)
    h8 = F.substring(
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(seed)),
                *[F.col(k).cast("string") for k in keys],
            )
        ),
        1,
        8,
    )
    col = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        t = format(min(int(round(cum * 16**8)), 16**8 - 1), "08x")
        cond = h8 < F.lit(t)
        col = F.when(cond, name) if col is None else col.when(cond, name)
    col = F.lit(names[-1]) if col is None else col.otherwise(names[-1])
    return df.withColumn(split_col, col)


def split_thresholds(weights: dict[str, float]) -> list[str]:
    """The hex boundaries hash_split uses, exposed so oracles/tests can
    embed the identical literals."""
    total = float(sum(weights.values()))
    out, cum = [], 0.0
    for name in list(weights)[:-1]:
        cum += weights[name] / total
        out.append(format(min(int(round(cum * 16**8)), 16**8 - 1), "08x"))
    return out


def stratified_sample(
    df: DataFrame,
    group_col: str,
    keys: list[str],
    n_per_group: int,
    seed: int = 42,
    prefilter: bool = True,
) -> DataFrame:
    """Deterministic stratified sample: the n rows with the smallest
    md5(seed|keys) hash per group — per-group reservoir sampling without the
    irreproducibility (same rows on any engine/partitioning/run, stable
    under reruns; no reference analog — BASELINE training-pipeline
    extension, complements [hash_split]).

    Scale posture: a naive per-group ``row_number`` window sorts EVERY row
    of every group. With ``prefilter`` (default), a first aggregate counts
    each group, and rows are pre-filtered to hash < (3n+20)/count — the
    expected survivor set is ~3n+20 rows per group, so the window sorts
    O(n) rows regardless of group size. The shortfall probability (fewer
    than n survivors, giving a short sample for that group) is
    P[Poisson(3n+20) < n] < e^-20 per group. Both passes are deterministic,
    so an oracle replaying the same threshold matches exactly, shortfall or
    not. The counts frame is broadcast (group cardinality = langs/sources/
    days — small by construction).

    Output: input columns + ``sample_rank`` (1..n within group, ordered by
    hash then keys).
    """
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(seed)),
                    *[F.col(k).cast("string") for k in keys],
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    from pyspark.sql import Window

    base = df.withColumn("__h", hv)
    if prefilter:
        cnt = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__cnt"))
        f = F.least(
            F.lit(1.0), F.lit(3.0 * n_per_group + 20) / F.col("__cnt")
        )
        base = (
            base.join(F.broadcast(cnt), group_col)
            .filter(F.col("__h") < f * F.lit(float(16**8)))
            .drop("__cnt")
        )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__h"), *[F.col(k) for k in keys])
    )
    return (
        base.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_group)
        .drop("__h")
    )


def split_balance(
    df: DataFrame,
    keys: list[str],
    weights: dict[str, float],
    category_col,
    seed: int = 42,
    exact_keys: bool = True,
) -> DataFrame:
    """Post-split balance report: after ``hash_split``, verify each split
    got (a) its weight share of rows, (b) whole key groups (counted), and
    (c) the same categorical mix as the corpus — the imbalance/leakage
    gate a training pipeline runs right after splitting (no reference
    analog; BASELINE training-pipeline extension).

    Output one row per split: (split, n_rows, n_keys, row_frac,
    cat_jsd) where ``cat_jsd`` is the Jensen-Shannon divergence between
    the split's ``category_col`` distribution and the whole corpus's
    (bounded [0, ln 2]; 0 = perfectly balanced; no epsilon floor — the
    same zero-count CASE as ``drift.jensen_shannon``).

    Scale posture: ONE (split, category) count aggregate (map-side
    combined; the corpus distribution is re-aggregated FROM those counts,
    never a second scan) joined over the tiny splits x categories grid;
    the key count is a two-level (split, keys) -> (split) aggregate, or
    one HyperLogLog++ pass under ``exact_keys=False`` when even the
    distinct key stream is huge.
    """
    s = hash_split(df, keys, weights, seed=seed)
    v = category_col
    # cat (splits x categories rows) feeds corpus, the grid, the left
    # join AND both totals: persisted, or every consumer would re-execute
    # the O(rows) scan+aggregate subtree (MI's joint-persist pattern).
    cat = s.groupBy("split", v.alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    ).persist()
    corpus = cat.groupBy("v").agg(F.sum("n").alias("n_c"))
    # complete the grid so categories absent from a split still contribute
    # their corpus-side JSD term
    grid = cat.select("split").distinct().crossJoin(corpus)
    g = (
        grid.join(cat, ["split", "v"], "left")
        .fillna(0, ["n"])
    )
    tot_split = g.groupBy("split").agg(F.sum("n").alias("tot_s"))
    tot_corpus = corpus.agg(F.sum("n_c").alias("tot_c"))
    pq = (
        g.join(tot_split, "split")
        .crossJoin(F.broadcast(tot_corpus))
        .select(
            "split",
            (F.col("n") / F.col("tot_s")).alias("p"),
            (F.col("n_c") / F.col("tot_c")).alias("q"),
            "tot_s", "tot_c",
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    term_p = F.when(
        F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)
    ).otherwise(0.0)
    term_q = F.when(
        F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)
    ).otherwise(0.0)
    jsd = pq.groupBy("split").agg(
        F.round(0.5 * F.sum(term_p) + 0.5 * F.sum(term_q), 6).alias(
            "cat_jsd"
        ),
        F.max("tot_s").alias("n_rows"),
        F.max("tot_c").alias("tot_c"),
    )
    if exact_keys:
        nk = (
            s.select("split", *keys).groupBy("split", *keys).agg(
                F.lit(1).alias("__one")
            )
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_keys"))
        )
    else:
        nk = s.groupBy("split").agg(
            F.approx_count_distinct(F.concat_ws("\x1f", *keys)).alias(
                "n_keys"
            )
        )
    try:
        out = (
            jsd.join(nk, "split")
            .select(
                "split",
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_keys").cast("long").alias("n_keys"),
                F.round(F.col("n_rows") / F.col("tot_c"), 6).alias(
                    "row_frac"
                ),
                "cat_jsd",
            )
        )
        # materialize the O(splits)-row report before releasing the cache
        return out.localCheckpoint(eager=True)
    finally:
        cat.unpersist()


def sample_representativeness(
    df: DataFrame,
    keys: list[str],
    numeric_col,
    category_col,
    sample_hex: str = "0123",
    seed: int = 42,
    ks_threshold: float = 0.05,
    jsd_threshold: float = 0.01,
) -> DataFrame:
    """Is a deterministic subsample representative of its population? The
    gate a pipeline runs before trusting an eval subset, a drilldown
    sample, or a profile computed on a fraction of the table: an unlucky
    (or key-correlated) sample silently skews every downstream number.

    The sample is the md5-prefix slice md5(seed || keys)[0] in
    ``sample_hex`` (fraction = len(sample_hex)/16) — engine-portable,
    scale-proportional, and map-only (the hash_split construction, so
    whatever sampling a job used can be replayed here exactly). Two
    statistics compare sample vs population:

    - KS on ``numeric_col`` (exact two-sample ECDF sup-distance via the
      drift family's grouped-counts + window-cumsum plan);
    - Jensen-Shannon divergence on ``category_col`` (bounded [0, ln 2],
      no epsilon floor).

    Output, one row per check (long format, combiner discipline):
      (check, value 6dp, n_population, n_sample, threshold,
       validation_status)
    """
    from .drift import jensen_shannon, ks_statistic

    h1 = F.substring(
        F.md5(
            F.concat_ws(
                "|", F.lit(str(seed)), *[F.col(k).cast("string") for k in keys]
            )
        ),
        1,
        1,
    )
    samp = df.filter(h1.isin(*list(sample_hex)))

    def _verdict(value, thr):
        return (
            F.when(value <= thr, F.lit(consts.VALIDATION_STATUS_SUCCESS))
            .otherwise(F.lit(consts.VALIDATION_STATUS_FAIL))
            .alias("validation_status")
        )

    # verdicts compare the 6dp-ROUNDED statistic so the status is
    # engine-deterministic even when the raw value sits on the threshold
    ks = ks_statistic(df, samp, numeric_col).select(
        F.lit("ks_numeric").alias("check"),
        F.round(F.col("ks_stat"), 6).alias("value"),
        F.col("n_source").cast("long").alias("n_population"),
        F.col("n_target").cast("long").alias("n_sample"),
        F.lit(float(ks_threshold)).alias("threshold"),
        _verdict(F.round(F.col("ks_stat"), 6), ks_threshold),
    )
    jsd = jensen_shannon(df, samp, category_col).select(
        F.lit("jsd_categorical").alias("check"),
        F.col("jsd").alias("value"),
        F.col("n_source").cast("long").alias("n_population"),
        F.col("n_target").cast("long").alias("n_sample"),
        F.lit(float(jsd_threshold)).alias("threshold"),
        _verdict(F.col("jsd"), jsd_threshold),
    )
    return ks.unionByName(jsd).orderBy("check")


def cross_split_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keys: list[str],
    weights: dict[str, float],
    seed: int = 42,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Eval-contamination detector: NEAR-DUPLICATE documents that landed in
    DIFFERENT splits. hash_split keyed on a group key guarantees no exact
    row crosses splits, but a near-copy of a training document sitting in
    the test split still leaks — the gap decontaminate (exact n-gram
    overlap vs a benchmark) and split_balance (distribution parity) both
    miss.

    Plan: minhash_dedup_pairs produces the verified near-dup pair list
    (bucketed LSH equi-join, never all-pairs); the pair frame is RARE-ROW
    sized, so it joins to the map-only split assignment BROADCAST — the
    corpus never shuffles for the split lookup (two broadcast hash joins,
    zero exchange of the document table beyond what LSH already does).

    Output: (id_a, id_b, jaccard, split_a, split_b) for pairs with
    split_a != split_b, ordered by (id_a, id_b).
    """
    from .dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        df, id_col, text_col,
        k=k, num_hashes=num_hashes, bands=bands, threshold=threshold,
    )
    splits = hash_split(df, keys, weights, seed=seed).select(
        F.col(id_col), "split"
    )
    a = splits.select(
        F.col(id_col).alias("id_a"), F.col("split").alias("split_a")
    )
    b = splits.select(
        F.col(id_col).alias("id_b"), F.col("split").alias("split_b")
    )
    leaks = (
        a.join(F.broadcast(pairs), "id_a")
        .join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
    )
    return leaks.select(
        "id_a", "id_b", "jaccard", "split_a", "split_b"
    ).orderBy("id_a", "id_b")
