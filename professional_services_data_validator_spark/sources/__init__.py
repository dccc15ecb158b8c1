from .readers import (
    load_tables,
    read_table,
    custom_query,
    transcripts_sql,
    target_transcripts_sql,
    register_transcripts,
    TRANSCRIPT_TABLES,
)
from .sinks import write_report, report_to_text

__all__ = [
    "load_tables",
    "read_table",
    "custom_query",
    "transcripts_sql",
    "target_transcripts_sql",
    "register_transcripts",
    "TRANSCRIPT_TABLES",
    "write_report",
    "report_to_text",
]
