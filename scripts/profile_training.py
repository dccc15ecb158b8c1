"""Stage-level timing decomposition for the slow training queries.

Times each sub-stage of the LSH / simhash / kmeans pipelines independently
(each stage's count() pays its upstream recompute, so the deltas expose
which stage dominates and how much a persist of a shared intermediate
would save). Informative tooling only — bench.py stays the protocol.

Usage: python scripts/profile_training.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from professional_services_data_validator_spark.session import get_spark  # noqa: E402

spark = get_spark("profile-training")


def t(label, fn):
    t0 = time.monotonic()
    n = fn()
    dt = time.monotonic() - t0
    print(f"{label:40s} {dt:7.2f}s  rows={n}")
    return dt


docs = spark.read.parquet(f"{SF}/documents.parquet")
docs.createOrReplaceTempView("documents")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")

print(f"documents={docs.count()}  embeddings={emb.count()}")

from professional_services_data_validator_spark.operators.dedup import (  # noqa: E402
    jaccard_verify,
    lsh_candidates,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_pairs,
)

sh = shingles(docs, "doc_id", "text", 2)
t("lsh: shingles (distinct explode)", sh.count)
sig = minhash_signatures(sh, 8)
t("lsh: + minhash agg (8x md5)", sig.count)
cand = lsh_candidates(sig, 8, 4)
t("lsh: + band self-join candidates", cand.count)
pairs = jaccard_verify(cand, sh, 0.5)
t("lsh: + jaccard verify (full e2e)", pairs.count)

shp = sh.persist()
shp.count()
sigp = minhash_signatures(shp, 8)
candp = lsh_candidates(sigp, 8, 4)
pairsp = jaccard_verify(candp, shp, 0.5)
t("lsh: e2e with shingles persisted", pairsp.count)
shp.unpersist()

sim = simhash(docs, "doc_id", "text", bits=16)
t("simhash: signatures", sim.count)
near = simhash_near_pairs(sim, max_hamming=1, bits=16)
t("simhash: + near pairs (e2e)", near.count)
simp = sim.persist()
simp.count()
nearp = simhash_near_pairs(simp, max_hamming=1, bits=16)
t("simhash: e2e with sig persisted", nearp.count)
simp.unpersist()

from professional_services_data_validator_spark.operators.similarity import (  # noqa: E402
    ivf_kmeans_topk,
    kmeans_centroids,
)

from pyspark.sql import functions as F  # noqa: E402

t(
    "kmeans: train centroids (3 iters)",
    lambda: len(kmeans_centroids(emb, 10, 3)),
)
t(
    "kmeans: e2e ann topk",
    ivf_kmeans_topk(
        emb, emb.filter(F.col("vec_id") < 8),
        k=5, nprobe=3, n_clusters=10, iters=3,
    ).count,
)

spark.stop()
