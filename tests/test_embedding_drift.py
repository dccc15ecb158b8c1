"""Embedding-distribution drift (operators/similarity.py embedding_drift):
closed-form centroid geometry, null-drift on identical snapshots, norm-PSI
sensitivity, and the O(dim)-shuffle plan shape."""

import math

from pyspark.sql import functions as F

from professional_services_data_validator_spark.operators.similarity import (
    embedding_drift,
)

SCHEMA = "id int, embedding array<float>"


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], SCHEMA
    )


def test_identical_snapshots_no_drift(spark):
    vs = [[1.0, 0.0], [0.0, 1.0], [0.6, 0.8]]
    old = _df(spark, vs)
    r = embedding_drift(
        old, _df(spark, vs), "embedding", n_bins=4, norm_lo=0.5, norm_hi=1.5
    ).first()
    assert r["n_old"] == r["n_new"] == 3
    assert r["centroid_cosine"] == 1.0
    assert r["centroid_l2"] == 0.0
    assert abs(r["norm_psi"]) < 1e-9


def test_orthogonal_centroids(spark):
    old = _df(spark, [[1.0, 0.0], [1.0, 0.0]])
    new = _df(spark, [[0.0, 1.0], [0.0, 1.0]])
    r = embedding_drift(
        old, new, "embedding", n_bins=4, norm_lo=0.5, norm_hi=1.5
    ).first()
    # mean vectors (1,0) vs (0,1): cosine 0, L2 sqrt(2); norms identical
    assert r["centroid_cosine"] == 0.0
    assert abs(r["centroid_l2"] - round(math.sqrt(2.0), 6)) < 1e-9
    assert abs(r["norm_psi"]) < 1e-9


def test_norm_shift_flags_psi(spark):
    old = _df(spark, [[0.6, 0.8]] * 8)          # norm 1.0
    new = _df(spark, [[1.2, 1.6]] * 8)          # norm 2.0 -> different bin
    r = embedding_drift(
        old, new, "embedding", n_bins=8, norm_lo=0.875, norm_hi=1.275
    ).first()
    # all mass moved between (clamped) bins: PSI far above the 0.2 bar
    assert r["norm_psi"] > 1.0
    # direction is preserved, so the centroid cosine stays 1
    assert r["centroid_cosine"] == 1.0


def test_null_vectors_excluded_from_bins(spark):
    old = spark.createDataFrame(
        [(0, [0.6, 0.8]), (1, None)], SCHEMA
    )
    r = embedding_drift(
        old, _df(spark, [[0.6, 0.8]]), "embedding",
        n_bins=4, norm_lo=0.5, norm_hi=1.5,
    ).first()
    assert r["n_old"] == 1 and r["n_new"] == 1   # count(v) skips NULL
    assert abs(r["norm_psi"]) < 1e-9


def test_plan_no_row_level_shuffle_after_explode_agg(spark):
    """The per-dimension mean is partially aggregated before its exchange
    (shuffle carries dim-keyed partial sums, not exploded rows)."""
    old = _df(spark, [[1.0, 0.0]] * 4)
    plan = embedding_drift(
        old, old, "embedding", n_bins=4, norm_lo=0.5, norm_hi=1.5
    )._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    generates = [i for i, ln in enumerate(lines) if "Generate" in ln]
    assert generates, plan  # posexplode is in the plan
    # tree printout lists parents before children: between each Generate
    # (posexplode) and the nearest Exchange ABOVE it there must be a
    # HashAggregate — i.e. the explode stream is partially aggregated
    # map-side and never shuffled raw
    for g in generates:
        above = [
            ln for ln in lines[:g]
            if "Exchange" in ln or "HashAggregate" in ln
        ]
        assert above and "HashAggregate" in above[-1], plan
