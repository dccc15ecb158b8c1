from .calculated import apply_calculated_fields, build_row_hash, CALC_REGISTRY

__all__ = ["apply_calculated_fields", "build_row_hash", "CALC_REGISTRY"]
