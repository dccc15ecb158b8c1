from .compiler import run_validation, build_column_validation_report

__all__ = ["run_validation", "build_column_validation_report"]
