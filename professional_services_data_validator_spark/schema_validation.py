"""Schema validation: StructType-vs-StructType comparison.

Reference analog: data_validation/schema_validation.py:120-229
(schema_validation_matching): casefolded name matching, exclusion columns,
allow-listed type pairs, precision-widening passes with a warning, missing
columns fail in both directions. Driver-side by nature (schemas are tiny);
the report rides the standard 20-column shape.

Type names are normalized to Spark simpleStrings; the allow-list accepts
'src_type:tgt_type' pairs like the reference CLI's --allow-list.
"""

from __future__ import annotations

import itertools
import logging
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .config import consts
from .metadata import RunMetadata

# widening pairs treated as success-with-warning
# (reference schema_validation.py parse_n_validate_datatypes)
_PRECISION_ORDER = [
    "tinyint", "smallint", "int", "bigint", "float", "double",
]


def _normalize(dt: T.DataType) -> str:
    s = dt.simpleString()
    # timestamp_ntz and timestamp compare equal for validation purposes —
    # the reference compares backend-reported types after UTC coercion
    # (clients.py:95-97); document as a deliberate mapping.
    if s == "timestamp_ntz":
        return "timestamp"
    return s


def _is_widening(src: str, tgt: str) -> bool:
    if src in _PRECISION_ORDER and tgt in _PRECISION_ORDER:
        return _PRECISION_ORDER.index(tgt) > _PRECISION_ORDER.index(src)
    if src.startswith("decimal") and tgt.startswith("decimal"):
        def ps(x):
            try:
                inner = x[x.index("(") + 1 : x.index(")")]
                p, _, s = inner.partition(",")
                return int(p), int(s or 0)
            except ValueError:
                return (38, 18)
        sp, ss = ps(src)
        tp, ts = ps(tgt)
        return tp >= sp and ts >= ss and (tp, ts) != (sp, ss)
    return False


# --allow-list parsing with precision/scale range expansion
# (reference schema_validation.py:231-329: split_allow_list_str,
#  expand_precision_range, expand_precision_or_scale_range, parse_allow_list)

_RANGE_RE = re.compile(r"^([0-9]+)-([0-9]+)$")
_PAREN_TYPE_RE = re.compile(r"^([a-z0-9_ ]+)\(([0-9\-]+)(?:,([0-9\-]+))?\)$")
# one datatype token: name with optional (precision[,scale]) where each part
# may be a range; pairs are 'type:type' joined by commas
_TYPE_TOKEN = r"[a-z0-9_ ]+(?:\((?:[0-9 ,\-]+|'UTC')\))?"
_PAIR_RE = re.compile(f"({_TYPE_TOKEN}):({_TYPE_TOKEN})", re.I)


def expand_precision_range(s: str) -> list[str]:
    """'0-3' -> ['0','1','2','3']; non-range strings pass through
    (reference schema_validation.py:252-268)."""
    m = _RANGE_RE.match(s)
    if not m:
        return [s]
    lo, hi = int(m.group(1)), int(m.group(2))
    if lo >= hi:
        raise ValueError(
            f"invalid allow-list precision/scale range {s!r}: "
            f"lower {lo} >= upper {hi}"
        )
    return [str(v) for v in range(lo, hi + 1)]


def expand_type_ranges(data_type: str) -> list[str]:
    """'decimal(1-3,0)' -> ['decimal(1,0)','decimal(2,0)','decimal(3,0)']
    (reference schema_validation.py:271-295)."""
    m = _PAREN_TYPE_RE.match(data_type.replace(" ", ""))
    if not m:
        return [data_type]
    name, p, s = m.groups()
    p_list = expand_precision_range(p)
    if s:
        s_list = expand_precision_range(s)
        return [
            f"{name}({pp},{ss})"
            for pp, ss in itertools.product(p_list, s_list)
        ]
    return [f"{name}({pp})" for pp in p_list]


def parse_allow_list(allow_list: str) -> dict[str, set[str]]:
    """'decimal(38,0-9):int64,int32:int64' -> expanded src->targets map
    (reference schema_validation.py:297-329). Comma-aware: commas inside
    (precision,scale) do not split pairs."""
    allow: dict[str, set[str]] = {}
    matched_spans = []
    for m in _PAIR_RE.finditer(allow_list):
        matched_spans.append(m.group(0))
        src_t, tgt_t = (g.replace(" ", "") for g in m.groups())
        for s_exp in expand_type_ranges(src_t):
            for t_exp in expand_type_ranges(tgt_t):
                allow.setdefault(s_exp, set()).add(t_exp)
    leftover = allow_list
    for span in matched_spans:
        leftover = leftover.replace(span, "", 1)
    if leftover.strip().strip(","):
        raise ValueError(
            f"invalid allow-list data type pairs near {leftover.strip()!r}"
        )
    return allow


def schema_validation_matching(
    source_fields: dict[str, str],
    target_fields: dict[str, str],
    exclusion_fields: list[str] | None = None,
    allow_list: str | None = None,
) -> list[list]:
    """Row tuples: [source_column_name, target_column_name,
    source_agg_value(type), target_agg_value(type), validation_status] —
    exactly the reference's result rows (schema_validation.py:124-229)."""
    src = {k.casefold(): v for k, v in source_fields.items()}
    tgt = {k.casefold(): v for k, v in target_fields.items()}
    for f in exclusion_fields or []:
        src.pop(f.casefold(), None)
        tgt.pop(f.casefold(), None)

    allow = parse_allow_list(allow_list) if allow_list else {}

    results = []
    S, FA = consts.VALIDATION_STATUS_SUCCESS, consts.VALIDATION_STATUS_FAIL
    for name, stype in src.items():
        if name not in tgt:
            results.append([name, "N/A", stype, "N/A", FA])
            continue
        ttype = tgt[name]
        if stype == ttype:
            results.append([name, name, stype, ttype, S])
        elif stype in allow and ttype in allow[stype]:
            results.append([name, name, stype, ttype, S])
        elif _is_widening(stype, ttype):
            logging.warning(
                "Source and target data type has precision mismatch: %s - %s",
                stype, ttype,
            )
            results.append([name, name, stype, ttype, S])
        else:
            results.append([name, name, stype, ttype, FA])
    for name, ttype in tgt.items():
        if name not in src:
            results.append(["N/A", name, "N/A", ttype, FA])
    return results


def schema_validation_report(
    spark: SparkSession,
    source: DataFrame,
    target: DataFrame,
    source_table: str = "source",
    target_table: str = "target",
    exclusion_fields: list[str] | None = None,
    allow_list: str | None = None,
    run_metadata: RunMetadata | None = None,
) -> DataFrame:
    """Full 20-column report, one row per column comparison."""
    import json

    run_metadata = run_metadata or RunMetadata()
    rows = schema_validation_matching(
        {f.name: _normalize(f.dataType) for f in source.schema.fields},
        {f.name: _normalize(f.dataType) for f in target.schema.fields},
        exclusion_fields,
        allow_list,
    )
    out = [
        {
            "validation_name": r[0] if r[0] != "N/A" else r[1],
            "validation_type": consts.SCHEMA_VALIDATION,
            "aggregation_type": "Schema",
            "source_table_name": source_table,
            "source_column_name": r[0],
            "source_agg_value": r[2],
            "target_table_name": target_table,
            "target_column_name": r[1],
            "target_agg_value": r[3],
            "group_by_columns": None,
            "primary_keys": None,
            "num_random_rows": None,
            "difference": None,
            "pct_difference": None,
            "pct_threshold": None,
            "validation_status": r[4],
            "run_id": run_metadata.run_id,
            "labels": json.dumps(run_metadata.labels),
            "start_time": run_metadata.start_time,
            "end_time": None,
        }
        for r in rows
    ]
    from .combiner import REPORT_COLUMNS

    schema = T.StructType(
        [
            T.StructField(c, T.TimestampType() if c in ("start_time", "end_time")
                          else T.DoubleType() if c in ("difference", "pct_difference", "pct_threshold")
                          else T.LongType() if c == "num_random_rows"
                          else T.StringType())
            for c in REPORT_COLUMNS
        ]
    )
    return spark.createDataFrame(out, schema=schema)
