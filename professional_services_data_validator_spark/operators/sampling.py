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
