"""Declarative data-quality expectations compiled into ONE aggregate pass.

The reference validates by comparing two tables; production pipelines also
need SINGLE-table assertions ("this column is never null", "99% of values in
range", "PK is unique") — the Great-Expectations-shaped rule surface. No
reference analog (closest: the reference's threshold/status CASE logic,
combiner.py in this repo); BASELINE validation-engine extension.

Spark-first design: every rule lowers to a conditional aggregate
(avg(CASE WHEN ...)), so N rules over a 100-TB table cost ONE scan + one
partial/final hash aggregate — not N queries. ``unique`` rules add
count(DISTINCT col) terms: Spark plans multiple distincts via a single
Expand (one extra shuffle total, independent of rule count); at extreme
cardinality swap ``approx=True`` to use HLL sketches (approx_count_distinct)
with the identical report schema. The long-format report is built with the
same explode(array(structs)) melt as the combiner (zero joins).

Output, one row per rule:
  (rule_name, rule_kind, column, observed double 6dp, threshold double,
   validation_status 'success'|'fail')
``observed`` is the pass FRACTION over non-excluded rows (for ``unique``:
distinct/total); status = observed >= threshold.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import consts


@dataclass(frozen=True)
class Expectation:
    """One rule.

    kind: 'not_null' | 'unique' | 'between' | 'matches_regex' | 'isin'
          | 'custom_sql'
    column: target column (custom_sql ignores it; ``expr`` is the boolean).
    threshold: minimum pass fraction in [0, 1] (1.0 = must always hold).
    lo/hi: inclusive bounds for 'between' (either may be None).
    values: allow-list for 'isin'.
    pattern: Java/RE2-portable regex for 'matches_regex' (full-match not
             required; a match anywhere passes, like rlike).
    expr: raw boolean SQL for 'custom_sql'.
    name: report name; defaults to '{kind}__{column}'.
    """

    kind: str
    column: str | None = None
    threshold: float = 1.0
    lo: object = None
    hi: object = None
    values: tuple = ()
    pattern: str | None = None
    expr: str | None = None
    name: str | None = None

    @property
    def rule_name(self) -> str:
        return self.name or f"{self.kind}__{self.column or 'row'}"


def _pass_condition(e: Expectation) -> Column:
    c = F.col(e.column) if e.column else None
    if e.kind == "not_null":
        return c.isNotNull()
    if e.kind == "between":
        cond = F.lit(True)
        if e.lo is not None:
            cond = cond & (c >= F.lit(e.lo))
        if e.hi is not None:
            cond = cond & (c <= F.lit(e.hi))
        return c.isNotNull() & cond
    if e.kind == "matches_regex":
        return c.isNotNull() & c.rlike(e.pattern)
    if e.kind == "isin":
        return c.isin(*e.values)
    if e.kind == "custom_sql":
        return F.expr(e.expr)
    raise ValueError(f"unknown expectation kind {e.kind!r}")


def run_expectations(
    df: DataFrame, rules: list[Expectation], approx: bool = False
) -> DataFrame:
    """Evaluate all rules in one aggregate pass; long-format report."""
    if not rules:
        raise ValueError("no expectations given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(rules):
        if e.kind == "unique":
            d = (
                F.approx_count_distinct(e.column)
                if approx
                else F.countDistinct(e.column)
            )
            aggs.append(d.cast("double").alias(f"__m{i}"))
            aggs.append(F.count(e.column).cast("double").alias(f"__t{i}"))
        else:
            aggs.append(
                F.avg(
                    F.when(_pass_condition(e), 1.0).otherwise(0.0)
                ).alias(f"__m{i}")
            )
    wide = df.agg(*aggs)
    structs = []
    for i, e in enumerate(rules):
        if e.kind == "unique":
            # least(): HLL sketches can over-count; a fraction above 1.0 is
            # meaningless (seen live: 1.026 on a fully-unique column)
            obs = F.when(
                F.col(f"__t{i}") > 0,
                F.least(F.col(f"__m{i}") / F.col(f"__t{i}"), F.lit(1.0)),
            ).otherwise(F.lit(1.0))
        else:
            # empty table: every universally-quantified rule holds
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
    melted = wide.select(F.explode(F.array(*structs)).alias("r"))
    return melted.select("r.*")
