"""Report sinks.

Reference analogs: text handler (reference data_validation/result_handlers/
text.py:37-85) and BigQuery appender (result_handlers/bigquery.py:25-121).
Here the durable sink is a parquet/Iceberg append; text output collects only
the final (small) report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def safe_collect(df: DataFrame, max_rows: int = 50_000) -> list:
    """Guarded driver collect (reference max_recursive_query_size,
    config_manager.py:145-148): refuse to materialize unbounded result sets
    on the driver. Operators never need this — it exists for callers who
    want rows in Python."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"result exceeds driver collect guard ({max_rows} rows); "
            "write it to a sink instead (write_report) or aggregate further"
        )
    return rows


def write_report(report: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Append the report to a results table. With an Iceberg catalog this is
    ``report.writeTo(table).append()``; parquet-append is the sandbox
    fallback (no Iceberg jars in this environment)."""
    # canonical ordering before write -> deterministic output files
    ordered = report.orderBy("validation_name", "group_by_columns")
    ordered.coalesce(1).write.mode("append").format(fmt).save(path)


def report_to_text(
    report: DataFrame,
    status_filter: str | None = None,
    cols: list[str] | None = None,
    max_rows: int = 1000,
) -> str:
    """Driver-side rendering of the (small) report — reference text.py
    semantics incl. --filter-status (reference cli_tools.py)."""
    if status_filter:
        report = report.filter(F.col("validation_status") == status_filter)
    cols = cols or [
        "validation_name",
        "validation_type",
        "source_agg_value",
        "target_agg_value",
        "group_by_columns",
        "difference",
        "pct_difference",
        "validation_status",
    ]
    pdf = report.select(*cols).limit(max_rows).toPandas()
    return pdf.to_string(index=False)
