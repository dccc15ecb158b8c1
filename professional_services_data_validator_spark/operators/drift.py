"""Distribution-drift checks: two-sample KS and PSI.

No reference analog — BASELINE.json extension ("KS/PSI distribution-drift
checks on turn-length and role frequencies"). Two implementations each:

1. Exact, declarative (built-in functions only, oracle-checkable in any SQL
   engine): the statistic is computed from grouped counts + window cumsums —
   everything stays JVM-side in whole-stage codegen.
2. Grouped vectorized (``applyInPandas``): one KS/PSI per group (e.g. per
   day-partition), with the per-group computation in numpy over Arrow
   batches — the BASELINE-mandated "vectorized pandas/Arrow UDFs, no
   per-row Python" scale path. Each group's sample must fit one executor's
   memory (true for per-day turn-length distributions; for 10^12 rows use
   the binned variant below).
3. Binned KS (``ks_binned``): approximates the ECDF on a fixed integer grid
   -> pure groupBy aggregation, no global window, unbounded scale. Error is
   bounded by bin width; for integer-valued statistics like turn length with
   a capped domain it is EXACT.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-6


def _counts_by_value(df: DataFrame, value_col: Column, side: str) -> DataFrame:
    return df.groupBy(value_col.alias("v")).agg(
        F.count(F.lit(1)).alias(f"n_{side}")
    )


def ks_statistic(
    source: DataFrame, target: DataFrame, value_col: Column
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic, distributed.

    sup_x |F_src(x) - F_tgt(x)| via: per-value counts (one shuffle each
    side), full-outer join on value, global-window cumulative sums, max.
    The global window runs over |distinct values| rows — for turn-length
    style integer statistics that is tiny (thousands), NOT O(rows).
    Output: one row (ks_stat double, n_source, n_target).
    """
    s = _counts_by_value(source, value_col, "s")
    t = _counts_by_value(target, value_col, "t")
    joined = s.join(t, "v", "full_outer").fillna(0, ["n_s", "n_t"])
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    # totals as whole-frame window sums in the same pass as the cumsums —
    # an agg + crossJoin would duplicate the count subtree in the plan
    # and re-aggregate both inputs twice (same fix as psi/chi2/jsd).
    wt = Window.partitionBy()
    cum = joined.select(
        F.sum("n_s").over(w).alias("c_s"),
        F.sum("n_t").over(w).alias("c_t"),
        F.sum("n_s").over(wt).alias("tot_s"),
        F.sum("n_t").over(wt).alias("tot_t"),
    )
    return cum.agg(
        F.max(
            F.abs(
                F.col("c_s") / F.col("tot_s") - F.col("c_t") / F.col("tot_t")
            )
        ).alias("ks_stat"),
        F.max("tot_s").alias("n_source"),
        F.max("tot_t").alias("n_target"),
    )


def ks_binned(
    source: DataFrame,
    target: DataFrame,
    value_col: Column,
    bin_width: int = 1,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Scale-path KS: bin values first (exact when values are integers and
    bin_width=1). With ``group_cols`` computes one KS per group in one job —
    the cumsum window partitions by group, so no global single-reducer stage.
    """
    b = (F.floor(value_col / F.lit(bin_width)) * F.lit(bin_width)).alias("v")
    gcols = group_cols or []
    s = source.groupBy(*gcols, b).agg(F.count(F.lit(1)).alias("n_s"))
    t = target.groupBy(*gcols, b).agg(F.count(F.lit(1)).alias("n_t"))
    joined = s.join(t, gcols + ["v"], "full_outer").fillna(0, ["n_s", "n_t"])
    w = (
        Window.partitionBy(*gcols)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*gcols)
    cum = joined.select(
        *gcols,
        F.sum("n_s").over(w).alias("c_s"),
        F.sum("n_t").over(w).alias("c_t"),
        F.sum("n_s").over(wt).alias("tot_s"),
        F.sum("n_t").over(wt).alias("tot_t"),
    )
    agg = cum.groupBy(*gcols).agg(
        F.max(
            F.abs(F.col("c_s") / F.col("tot_s") - F.col("c_t") / F.col("tot_t"))
        ).alias("ks_stat"),
        F.max("tot_s").alias("n_source"),
        F.max("tot_t").alias("n_target"),
    )
    return agg


def psi(
    source: DataFrame,
    target: DataFrame,
    category_col: Column,
    eps: float = EPS,
) -> DataFrame:
    """Population Stability Index over a categorical column.

    PSI = sum_c (p_c - q_c) * ln(p_c / q_c), with epsilon-floored
    proportions so absent categories don't produce ln(0). Pure
    two-shuffle aggregation — totals are window sums over the k-row
    joined frame, so each input is aggregated exactly once; output one
    row (psi double).
    """
    s = _counts_by_value(source, category_col, "s")
    t = _counts_by_value(target, category_col, "t")
    joined = s.join(t, "v", "full_outer").fillna(0, ["n_s", "n_t"])
    # totals as window sums over the k-category frame (an agg + crossJoin
    # duplicates the count subtree: both inputs would aggregate twice)
    wt = Window.partitionBy()
    with_p = joined.select(
        F.greatest(
            F.col("n_s") / F.sum("n_s").over(wt), F.lit(eps)
        ).alias("p"),
        F.greatest(
            F.col("n_t") / F.sum("n_t").over(wt), F.lit(eps)
        ).alias("q"),
    )
    return with_p.agg(
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias(
            "psi"
        )
    )


def psi_verdict(
    source: DataFrame,
    target: DataFrame,
    category_col: Column,
    threshold: float = 0.2,
) -> DataFrame:
    from ..config import consts

    return psi(source, target, category_col).select(
        "psi",
        F.when(F.col("psi") <= threshold, F.lit(consts.VALIDATION_STATUS_SUCCESS))
        .otherwise(F.lit(consts.VALIDATION_STATUS_FAIL))
        .alias("validation_status"),
    )


# ---------------------------------------------------------------------------
# Grouped vectorized path (applyInPandas; Arrow-batched numpy kernels)
# ---------------------------------------------------------------------------

_KS_SCHEMA = (
    "group_key string, ks_stat double, n_source long, n_target long, "
    "psi double"
)


def drift_grouped(
    source: DataFrame,
    target: DataFrame,
    group_col: Column,
    value_col: Column,
    category_col: Column,
) -> DataFrame:
    """One (KS on value, PSI on category) pair per group, vectorized.

    Union the two sides with a side tag (no join), group by the partition
    key, compute both statistics per group in numpy. Shuffle: one exchange
    of (group, value, category, side) — columns pruned before the shuffle.
    """
    tagged = source.select(
        group_col.alias("g"),
        value_col.cast("double").alias("val"),
        category_col.cast("string").alias("cat"),
        F.lit("s").alias("side"),
    ).unionByName(
        target.select(
            group_col.alias("g"),
            value_col.cast("double").alias("val"),
            category_col.cast("string").alias("cat"),
            F.lit("t").alias("side"),
        )
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        s = pdf[pdf["side"] == "s"]
        t = pdf[pdf["side"] == "t"]
        sv = np.sort(s["val"].to_numpy())
        tv = np.sort(t["val"].to_numpy())
        if len(sv) == 0 or len(tv) == 0:
            ks = float("nan")
        else:
            allv = np.concatenate([sv, tv])
            allv.sort()
            cdf_s = np.searchsorted(sv, allv, side="right") / len(sv)
            cdf_t = np.searchsorted(tv, allv, side="right") / len(tv)
            ks = float(np.max(np.abs(cdf_s - cdf_t)))
        sc = s["cat"].value_counts(normalize=True)
        tc = t["cat"].value_counts(normalize=True)
        cats = sc.index.union(tc.index)
        p = np.maximum(sc.reindex(cats, fill_value=0.0).to_numpy(), EPS)
        q = np.maximum(tc.reindex(cats, fill_value=0.0).to_numpy(), EPS)
        psi_v = float(np.sum((p - q) * np.log(p / q)))
        return pd.DataFrame(
            {
                "group_key": [str(pdf["g"].iloc[0])],
                "ks_stat": [ks],
                "n_source": [len(sv)],
                "n_target": [len(tv)],
                "psi": [psi_v],
            }
        )

    return tagged.groupBy("g").applyInPandas(_kernel, schema=_KS_SCHEMA)


def drift_grouped_verdicts(
    source: DataFrame,
    target: DataFrame,
    group_col: Column,
    value_col: Column,
    category_col: Column,
    ks_threshold: float = 0.2,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Per-group drift verdicts in the lineage-table shape
    (partition_id, metrics..., validation_status) — routes the vectorized
    drift path through LineageStore.append_verdicts exactly like
    row_compare_verdicts / uniqueness_verdict do."""
    from ..config import consts

    out = drift_grouped(source, target, group_col, value_col, category_col)
    return out.select(
        F.col("group_key").alias("partition_id"),
        "ks_stat",
        "psi",
        "n_source",
        "n_target",
        F.when(
            (F.col("ks_stat") <= ks_threshold)
            & (F.col("psi") <= psi_threshold),
            F.lit(consts.VALIDATION_STATUS_SUCCESS),
        )
        .otherwise(F.lit(consts.VALIDATION_STATUS_FAIL))
        .alias("validation_status"),
    )


def chi2_categorical(
    source: DataFrame,
    target: DataFrame,
    category_col: Column,
) -> DataFrame:
    """Pearson chi-squared homogeneity test between source and target
    category frequencies — the third classical drift statistic next to KS
    (continuous) and PSI (stability): chi2 = sum over cells of
    (observed - expected)^2 / expected for the 2 x k contingency table,
    expected_{side,c} = row_total_side * col_total_c / grand_total.

    Same plan shape as psi(): two count aggregations, one full-outer join
    on the category value (key space = k categories, tiny), window
    totals over the k-row frame. Categories absent from both sides contribute nothing; cells
    with expected = 0 cannot occur (a category is in the table only if one
    side observed it). Output one row:
    (chi2 double 6dp, dof long = k - 1, n_source, n_target).
    """
    s = _counts_by_value(source, category_col, "s")
    t = _counts_by_value(target, category_col, "t")
    joined = s.join(t, "v", "full_outer").fillna(0, ["n_s", "n_t"])
    # window totals over the k-cell frame, not agg + crossJoin (which
    # would re-aggregate both inputs twice for a k-row table)
    wt = Window.partitionBy()
    with_tot = joined.select(
        "n_s",
        "n_t",
        F.sum("n_s").over(wt).alias("tot_s_l"),
        F.sum("n_t").over(wt).alias("tot_t_l"),
    )
    cells = with_tot.select(
        F.col("n_s").cast("double").alias("o_s"),
        F.col("n_t").cast("double").alias("o_t"),
        (
            (F.col("n_s") + F.col("n_t")).cast("double")
            / (F.col("tot_s_l") + F.col("tot_t_l")).cast("double")
        ).alias("p_col"),
        F.col("tot_s_l").cast("double").alias("tot_s"),
        F.col("tot_t_l").cast("double").alias("tot_t"),
    )
    contrib = (
        F.pow(F.col("o_s") - F.col("tot_s") * F.col("p_col"), 2)
        / (F.col("tot_s") * F.col("p_col"))
        + F.pow(F.col("o_t") - F.col("tot_t") * F.col("p_col"), 2)
        / (F.col("tot_t") * F.col("p_col"))
    )
    return cells.agg(
        F.round(F.sum(contrib), 6).alias("chi2"),
        (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
        F.max("tot_s").cast("long").alias("n_source"),
        F.max("tot_t").cast("long").alias("n_target"),
    )


def emd_binned(
    source: DataFrame,
    target: DataFrame,
    value_col: Column,
    bin_width: int = 1,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Binned 1-Wasserstein (earth-mover) distance — the fourth classical
    drift statistic: where KS reports the WORST CDF gap and PSI/chi2 weigh
    per-category divergence, EMD integrates |F_s(x) - F_t(x)| dx, so it
    sees by HOW MUCH the mass moved, not just that it moved (a +1 shift of
    every value moves EMD by exactly 1 but barely moves PSI on wide bins).

    Identical plan shape to ks_binned: per-bin counts each side, full-outer
    join on (group, bin), cumulative sums over the bin-ordered window
    partitioned by group, then sum of |cum_p - cum_q| x bin_width. Exact
    for integer values at bin_width=1. Output per group:
    (group..., emd double 6dp, n_source, n_target).
    """
    b = (F.floor(value_col / F.lit(bin_width)) * F.lit(bin_width)).alias("v")
    gcols = group_cols or []
    s = source.groupBy(*gcols, b).agg(F.count(F.lit(1)).alias("n_s"))
    t = target.groupBy(*gcols, b).agg(F.count(F.lit(1)).alias("n_t"))
    joined = s.join(t, gcols + ["v"], "full_outer").fillna(0, ["n_s", "n_t"])
    w = (
        Window.partitionBy(*gcols)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*gcols)
    # the |CDF gap| at bin v applies over the interval up to the NEXT bin:
    # width = lead(v) - v (the final bin contributes nothing: both CDFs
    # are 1 there)
    nxt = F.lead("v").over(Window.partitionBy(*gcols).orderBy("v"))
    cum = joined.select(
        *gcols,
        F.col("v"),
        (nxt - F.col("v")).alias("width"),
        F.sum("n_s").over(w).alias("c_s"),
        F.sum("n_t").over(w).alias("c_t"),
        F.sum("n_s").over(wt).alias("tot_s"),
        F.sum("n_t").over(wt).alias("tot_t"),
    )
    gap = F.abs(
        F.col("c_s") / F.col("tot_s") - F.col("c_t") / F.col("tot_t")
    )
    return cum.groupBy(*gcols).agg(
        F.round(
            F.sum(
                F.when(F.col("width").isNotNull(), gap * F.col("width"))
                .otherwise(F.lit(0.0))
            ),
            6,
        ).alias("emd"),
        F.max("tot_s").cast("long").alias("n_source"),
        F.max("tot_t").cast("long").alias("n_target"),
    )


def jensen_shannon(
    source: DataFrame,
    target: DataFrame,
    category_col: Column,
) -> DataFrame:
    """Jensen-Shannon divergence between source and target category
    frequencies — the bounded, symmetric member of the drift family
    (KS continuous, PSI unbounded, chi-squared count-scaled):
    JSD = 0.5 KL(p || m) + 0.5 KL(q || m) with m = (p + q) / 2, in nats,
    0 <= JSD <= ln 2. Unlike PSI it needs NO epsilon floor: a category
    absent from one side has m > 0, and the absent side's 0 * ln(0/m)
    term is 0 by continuity (rendered as a CASE on the zero count, so
    ANSI mode never sees ln(0)).

    Same plan shape as chi2_categorical: two count aggregations, one
    full-outer join on the category value (key space = k categories),
    window totals over the k-row frame, one final fold. Output one row:
    (jsd double 6dp, n_source, n_target).
    """
    s = _counts_by_value(source, category_col, "s")
    t = _counts_by_value(target, category_col, "t")
    joined = s.join(t, "v", "full_outer").fillna(0, ["n_s", "n_t"])
    # window totals over the k-category frame; the previous DOUBLE
    # crossJoin(broadcast(totals)) executed the count subtree three times
    wt = Window.partitionBy()
    cells = joined.select(
        (F.col("n_s") / F.sum("n_s").over(wt)).alias("p"),
        (F.col("n_t") / F.sum("n_t").over(wt)).alias("q"),
        F.sum("n_s").over(wt).alias("tot_s"),
        F.sum("n_t").over(wt).alias("tot_t"),
    )
    m = (F.col("p") + F.col("q")) / F.lit(2.0)
    kl_term = lambda x: F.when(  # noqa: E731 - local expression factory
        x > 0, x * F.log(x / m)
    ).otherwise(F.lit(0.0))
    return cells.agg(
        F.round(
            F.lit(0.5) * F.sum(kl_term(F.col("p")))
            + F.lit(0.5) * F.sum(kl_term(F.col("q"))),
            6,
        ).alias("jsd"),
        F.max("tot_s").cast("long").alias("n_source"),
        F.max("tot_t").cast("long").alias("n_target"),
    )


def psi_quantile_binned(
    source: DataFrame,
    target: DataFrame,
    value_col: Column,
    n_bins: int = 10,
    eps: float = EPS,
) -> DataFrame:
    """PSI for NUMERIC columns over equal-frequency (source-quantile) bins —
    the industry-standard numeric-PSI formulation (``psi`` above is the
    categorical form). Bin edges are the source's interior exact percentiles,
    so every source bin holds ~1/n_bins of the mass: sparse tails cannot
    mask drift the way fixed-width bins (``ks_binned``'s grid) can, and the
    statistic is invariant to monotone rescaling of the column.

    Plan: ONE exact-percentile aggregate on the source collects n_bins-1
    doubles to the driver (the centroid-collect precedent — O(k), never
    O(rows)), folded back in as a literal array; bin assignment is a
    JVM-side ``aggregate()`` over that array (map-only, codegen); counting
    is one map-side-combined groupBy per side on the bin index, so the
    only row-scale shuffles carry <= n_bins partial-count rows per task.
    At 100 TB swap the exact ``percentile`` for ``approx_percentile`` —
    identical downstream plan; exact keeps the DuckDB oracle
    (``quantile_cont``, same linear interpolation) cell-identical.

    Duplicate edges (coarse/integer-valued columns) yield structurally
    empty bins on BOTH sides; the epsilon floor keeps their PSI terms
    finite and ~0. NULLs are excluded on both sides.

    Output, one row per bin ordered by bin_idx:
      (bin_idx, n_source, n_target, src_frac 6dp, tgt_frac 6dp,
       psi_term 6dp, psi 6dp)  — ``psi`` is the total, repeated per row
    (the report stays a single long-format frame, combiner discipline).
    """
    src_v = source.select(value_col.cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    tgt_v = target.select(value_col.cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    fracs = [i / n_bins for i in range(1, n_bins)]
    edges = src_v.agg(
        F.percentile("v", F.array(*[F.lit(p) for p in fracs])).alias("e")
    ).first()["e"]
    if edges is None:
        raise ValueError(
            "psi_quantile_binned: source has no non-null values "
            "(cannot derive quantile bin edges)"
        )
    edge_arr = F.array(*[F.lit(float(e)) for e in edges])
    bin_of = F.aggregate(
        edge_arr,
        F.lit(0),
        lambda acc, e: acc + F.when(F.col("v") > e, 1).otherwise(0),
    ).alias("bin_idx")
    s = src_v.groupBy(bin_of).agg(F.count(F.lit(1)).alias("n_source"))
    t = tgt_v.groupBy(bin_of).agg(F.count(F.lit(1)).alias("n_target"))
    joined = s.join(t, "bin_idx", "full_outer").fillna(
        0, ["n_source", "n_target"]
    )
    # totals as window sums over the n_bins-row frame — NOT an agg +
    # crossJoin, which would duplicate (re-execute) each side's count
    # subtree and scan both inputs twice for a 10-row result. The
    # single-partition windows are O(n_bins).
    w = Window.partitionBy(F.lit(1))
    with_tot = joined.select(
        "bin_idx",
        "n_source",
        "n_target",
        F.sum("n_source").over(w).alias("tot_s"),
        F.sum("n_target").over(w).alias("tot_t"),
    )
    p = F.greatest(F.col("n_source") / F.col("tot_s"), F.lit(eps))
    q = F.greatest(F.col("n_target") / F.col("tot_t"), F.lit(eps))
    term = (p - q) * F.log(p / q)
    return (
        with_tot.select(
            "bin_idx",
            "n_source",
            "n_target",
            F.round(p, 6).alias("src_frac"),
            F.round(q, 6).alias("tgt_frac"),
            F.round(term, 6).alias("psi_term"),
            F.round(F.sum(term).over(w), 6).alias("psi"),
        )
        .orderBy("bin_idx")
    )


def cramers_v(
    source: DataFrame, col_a: Column, col_b: Column, label: str | None = None
) -> DataFrame:
    """Cramér's V association between two categorical columns — the
    column-PAIR member of the drift/association family (chi2_categorical
    compares ONE column across two tables; this measures dependence
    between TWO columns of one table, the profiling signal behind
    "is `tool` a function of `role`?" / "does traffic mix shift by
    weekday?").

    V = sqrt(chi2 / (n * (min(r, c) - 1))) from the r x c contingency
    table; V = 0 independent, V = 1 perfect association, NULL when the
    table is degenerate (min(r, c) = 1).

    Plan: ONE count aggregation to the r*c cell frame (the only
    O(rows) pass), then marginals as window sums OVER THE CELL FRAME
    (partitionBy row / column / whole-frame — r*c rows, never the corpus;
    an agg + crossJoin of totals would re-execute the count subtree, the
    same plan bug purged from psi/chi2/jsd), and one final fold. NULL
    category values participate as their own level via null-safe grouping.

    Output one row: (pair, n BIGINT, r, c, dof, chi2 6dp, cramers_v 6dp).
    """
    cells = source.groupBy(
        col_a.alias("a"), col_b.alias("b")
    ).agg(F.count(F.lit(1)).alias("n_ab"))
    w_a = Window.partitionBy("a")
    w_b = Window.partitionBy("b")
    wt = Window.partitionBy()
    m = cells.select(
        "n_ab",
        F.sum("n_ab").over(w_a).alias("row_tot"),
        F.sum("n_ab").over(w_b).alias("col_tot"),
        F.sum("n_ab").over(wt).alias("n"),
        F.size(F.collect_set("a").over(wt)).alias("r"),
        F.size(F.collect_set("b").over(wt)).alias("c"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    # the cell frame holds only NONZERO cells; a zero cell contributes
    # (0 - exp)^2 / exp = exp, and sum(exp) over ALL r*c cells = n, so
    # chi2 = n + sum_nonzero((obs - exp)^2 / exp - exp) — no dense
    # r x c materialization needed
    chi2 = F.max("n") + F.sum(
        (F.col("n_ab") - exp) * (F.col("n_ab") - exp) / exp - exp
    )
    out = m.agg(
        F.max("n").cast("long").alias("n"),
        F.max("r").cast("long").alias("r"),
        F.max("c").cast("long").alias("c"),
        chi2.alias("_chi2"),
    ).select(
        F.lit(label or "a:b").alias("pair"),
        "n",
        "r",
        "c",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.round("_chi2", 6).alias("chi2"),
        F.round(
            F.when(
                F.least("r", "c") > 1,
                F.sqrt(
                    F.col("_chi2")
                    / (F.col("n") * (F.least("r", "c") - 1))
                ),
            ),
            6,
        ).alias("cramers_v"),
    )
    return out
