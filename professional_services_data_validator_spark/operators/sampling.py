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
