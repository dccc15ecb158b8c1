"""PySpark-native data-validation engine.

A from-scratch rebuild of the capabilities of
GoogleCloudPlatform/professional-services-data-validator (the "reference",
surveyed in SURVEY.md) as a single-engine, Spark-first distributed system:

- the reference compiles Ibis expression trees to per-backend SQL and diffs
  result sets in driver-side pandas (reference ``data_validation/combiner.py``);
  here every step — aggregation, source/target alignment, difference and
  verdict computation, violation-row extraction — is a Catalyst logical plan
  executed distributed, and only the final (small) report is ever collected.

Public surface:
    get_spark / stop_spark          — session factory (UTC, AQE, tuned shuffle)
    ValidationConfig et al.         — config model mirroring reference consts
    run_validation                  — config -> report DataFrame
    operators.*                     — column_stats, row_compare, uniqueness,
                                      referential, drift, dedup, similarity,
                                      text analysis, partitioning, sampling
"""

from .session import get_spark, stop_spark
from .config import (
    AggregateSpec,
    CalculatedFieldSpec,
    ComparisonFieldSpec,
    FilterSpec,
    ValidationConfig,
    consts,
)
from .metadata import RunMetadata, ValidationMeta
from .combiner import generate_report
from .plans.compiler import run_validation

__all__ = [
    "get_spark",
    "stop_spark",
    "AggregateSpec",
    "CalculatedFieldSpec",
    "ComparisonFieldSpec",
    "FilterSpec",
    "ValidationConfig",
    "consts",
    "RunMetadata",
    "ValidationMeta",
    "generate_report",
    "run_validation",
]

__version__ = "0.1.0"
