"""Calculated-field registry — scalar derivations used by validations.

Reference analog: the CalculatedField factories
(reference data_validation/query_builder/query_builder.py:302-414) and the
``--hash '*'`` expansion that layers them by depth
(reference data_validation/config_manager.py:1064-1074, order
cast -> ifnull -> rstrip -> [upper] -> concat -> hash).

Differences by design (SURVEY.md §7):
- everything is a built-in Spark SQL function (JVM, whole-stage codegen);
  no Python UDFs anywhere in the hot path.
- the reference's ``custom`` field eval()s arbitrary Ibis code
  (query_builder.py:414); here ``custom`` is an allowlisted F.expr registry.
- farm_fingerprint is mapped to xxhash64 (documented divergence; sha256 is
  the parity hash, as it is the reference default query_builder.py:317-324).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import CalculatedFieldSpec, consts

# Allowlist for CalculatedFieldSpec(calc_type='custom', expr=...). Keys are the
# only expression templates accepted from config files; '{col}' is substituted.
CUSTOM_EXPR_ALLOWLIST = {
    "strftime_ymd": "date_format({col}, 'yyyy-MM-dd')",
    "strftime_iso": "date_format({col}, \"yyyy-MM-dd'T'HH:mm:ss'Z'\")",
    "abs": "abs({col})",
    "lower": "lower({col})",
    "ltrim": "ltrim({col})",
    "trim": "trim({col})",
}


def _concat(cols: list[Column]) -> Column:
    # reference query_builder.py:302-313 joins with '' separator
    return F.concat_ws("", *cols)


def _hash(cols: list[Column]) -> Column:
    # sha256 hex digest of the (single, pre-concatenated) input
    # (reference query_builder.py:315-332, HashBytes op operations.py:148-175)
    return F.sha2(cols[0].cast("string"), 256)


def _farm_fingerprint(cols: list[Column]) -> Column:
    # documented divergence: xxhash64 stands in for BigQuery FARM_FINGERPRINT
    return F.xxhash64(cols[0].cast("string"))


def _ifnull(cols: list[Column]) -> Column:
    # reference query_builder.py:341-351
    return F.coalesce(
        cols[0].cast("string"), F.lit(consts.DEFAULT_REPLACEMENT_STRING)
    )


CALC_REGISTRY = {
    "concat": _concat,
    "hash": _hash,
    "farm_fingerprint": _farm_fingerprint,
    "ifnull": _ifnull,
    "length": lambda cols: F.length(cols[0]),
    "byte_length": lambda cols: F.octet_length(cols[0]),
    "rstrip": lambda cols: F.rtrim(cols[0]),
    "upper": lambda cols: F.upper(cols[0]),
    "epoch_seconds": lambda cols: F.unix_timestamp(cols[0]),
}


def _cast(col: Column, target_type: str) -> Column:
    """Cast incl. the reference's bool_string CASE mapping
    (reference third_party/ibis/ibis_addon/api.py:24-67)."""
    if target_type == "bool_string":
        s = F.upper(F.trim(col.cast("string")))
        return (
            F.when(s.isin("0", "N", "NO", "FALSE", "F"), F.lit("false"))
            .when(s.isin("1", "Y", "YES", "TRUE", "T"), F.lit("true"))
            .otherwise(F.lit(None).cast("string"))
        )
    return col.cast(target_type)


def eval_calc_field(spec: CalculatedFieldSpec, df: DataFrame) -> Column:
    cols = [F.col(c) for c in spec.source_columns]
    if spec.calc_type == "cast":
        return _cast(cols[0], spec.target_type or "string")
    if spec.calc_type == "custom":
        if spec.expr not in CUSTOM_EXPR_ALLOWLIST:
            raise ValueError(
                f"custom calc expr {spec.expr!r} not in allowlist "
                f"{sorted(CUSTOM_EXPR_ALLOWLIST)}"
            )
        template = CUSTOM_EXPR_ALLOWLIST[spec.expr]
        return F.expr(template.format(col=spec.source_columns[0]))
    if spec.calc_type == "to_char":
        # number/date -> formatted string (reference query_builder.py:334-339)
        return F.format_string("%s", cols[0].cast("string"))
    fn = CALC_REGISTRY.get(spec.calc_type)
    if fn is None:
        raise ValueError(f"unknown calculated field type {spec.calc_type!r}")
    return fn(cols)


def apply_calculated_fields(
    df: DataFrame, specs: list[CalculatedFieldSpec]
) -> DataFrame:
    """Apply specs in depth order as chained withColumns.

    The reference emits one nested subquery per depth
    (query_builder.py:523-531); Catalyst's CollapseProject folds our chain
    back into a single projection, so depth layering costs nothing.
    """
    by_depth: dict[int, list[CalculatedFieldSpec]] = {}
    for s in specs:
        by_depth.setdefault(s.depth, []).append(s)
    out = df
    for depth in sorted(by_depth):
        out = out.withColumns(
            {s.name: eval_calc_field(s, out) for s in by_depth[depth]}
        )
    return out


def build_row_hash(
    df: DataFrame,
    columns: list[str],
    trim_strings: bool = True,
    case_insensitive: bool = False,
    hash_name: str = "hash__all",
) -> DataFrame:
    """The ``--hash '*'`` chain in one shot:
    cast(string) -> ifnull -> rstrip -> [upper] -> concat_ws -> sha256
    (reference config_manager.py:1064-1074 + 1097-1161).

    Column order is the given ``columns`` order (the reference sorts its
    expansion by table column order; callers pass that order in).
    """
    parts = []
    for c in columns:
        col = F.col(c).cast("string")
        col = F.coalesce(col, F.lit(consts.DEFAULT_REPLACEMENT_STRING))
        if trim_strings:
            col = F.rtrim(col)
        if case_insensitive:
            col = F.upper(col)
        parts.append(col)
    return df.withColumn(hash_name, F.sha2(F.concat_ws("", *parts), 256))
