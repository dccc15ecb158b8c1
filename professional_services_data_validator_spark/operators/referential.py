"""Referential-integrity checks: fact keys must exist in a dimension.

The reference's closest analog is its PK-join row validation
(reference data_validation/data_validation.py:294-305); RI as a named check
is a BASELINE.json extension. Implementation: broadcast left-anti join — the
dimension (conversations/roles/tools) is small relative to the 10^12-row
fact, so no shuffle of the fact side ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import consts


def referential_violations(
    fact: DataFrame,
    dim: DataFrame,
    fact_key,
    dim_key: str | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Rows of ``fact`` whose key has no match in ``dim``.

    ``fact_key`` may be a str or list of str; ``dim_key`` defaults to the
    same name(s). Broadcast is on by default: dims here are order-of-thousands
    rows, so the anti join is map-side only (verify with .explain —
    BroadcastHashJoin ... LeftAnti, no Exchange on the fact side).
    """
    fact_keys = [fact_key] if isinstance(fact_key, str) else list(fact_key)
    dim_keys = (
        [dim_key] if isinstance(dim_key, str)
        else list(dim_key) if dim_key else fact_keys
    )
    dim_proj = dim.select(
        *[F.col(d).alias(f) for d, f in zip(dim_keys, fact_keys)]
    ).dropDuplicates(fact_keys)
    if broadcast_dim:
        dim_proj = F.broadcast(dim_proj)
    return fact.join(dim_proj, fact_keys, "left_anti")


def referential_violations_large(
    fact: DataFrame,
    dim: DataFrame,
    fact_key,
    dim_key: str | None = None,
) -> DataFrame:
    """Rows of ``fact`` with no match in ``dim`` when the dimension is TOO
    LARGE to broadcast as data (the 10^12-fact x 10^9-dim regime).

    Same result as referential_violations; different physical strategy:

    1. distinct fact keys — a hash aggregate whose partial (map-side) dedup
       collapses the 10^12 rows to the key cardinality before any shuffle;
    2. keys anti-join dim keys — the only real shuffle, and it moves KEYS,
       never fact rows;
    3. orphan keys broadcast back onto the fact as a left-semi join — the
       fact is scanned but never exchanged.

    Correct because orphanhood is a property of the key alone. Broadcasting
    orphan keys (step 3) assumes violations are rare — the normal case for
    an RI check; if orphans can be a large fraction, fall back to a plain
    shuffled anti-join of the fact.
    """
    fact_keys = [fact_key] if isinstance(fact_key, str) else list(fact_key)
    dim_keys = (
        [dim_key] if isinstance(dim_key, str)
        else list(dim_key) if dim_key else fact_keys
    )
    dim_proj = dim.select(
        *[F.col(d).alias(f) for d, f in zip(dim_keys, fact_keys)]
    ).dropDuplicates(fact_keys)
    orphan_keys = (
        fact.select(*fact_keys).dropDuplicates(fact_keys)
        .join(dim_proj, fact_keys, "left_anti")
    )
    return fact.join(F.broadcast(orphan_keys), fact_keys, "left_semi")


def referential_verdict(
    fact: DataFrame, dim: DataFrame, fact_key, dim_key=None, partition_col=None
) -> DataFrame:
    """Per-partition orphan counts + status, single pass (broadcast left join
    + conditional count; avoids a second scan for the violation count)."""
    fact_keys = [fact_key] if isinstance(fact_key, str) else list(fact_key)
    dim_keys = (
        [dim_key] if isinstance(dim_key, str)
        else list(dim_key) if dim_key else fact_keys
    )
    dim_proj = F.broadcast(
        dim.select(
            *[F.col(d).alias(f) for d, f in zip(dim_keys, fact_keys)],
            F.lit(True).alias("__dim_hit"),
        ).dropDuplicates(fact_keys)
    )
    part = (partition_col if partition_col is not None else F.lit(0)).alias(
        "partition_id"
    )
    joined = fact.join(dim_proj, fact_keys, "left")
    return (
        joined.groupBy(part)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("__dim_hit").isNull().cast("long")).alias("n_orphans"),
        )
        .withColumn(
            "validation_status",
            F.when(F.col("n_orphans") == 0, F.lit(consts.VALIDATION_STATUS_SUCCESS))
            .otherwise(F.lit(consts.VALIDATION_STATUS_FAIL)),
        )
    )
