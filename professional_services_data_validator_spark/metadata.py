"""Run + per-validation metadata used by the combiner.

Mirrors the reference's RunMetadata / ValidationMetadata
(reference data_validation/metadata.py) trimmed to what the report needs.
"""

from __future__ import annotations

import datetime
import uuid
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ValidationMeta:
    """Per-field metadata carried into every report row.

    Reference analog: metadata.ValidationMetadata, consumed by
    combiner._pivot_result (reference combiner.py:288-314).
    ``field_type`` is the *Spark* simpleString of the aggregate/compare value
    type — drives the difference branch selection
    (reference combiner.py:126-145).
    """

    name: str
    validation_type: str
    aggregation_type: str | None
    source_table_name: str | None
    source_column_name: str | None
    target_table_name: str | None
    target_column_name: str | None
    threshold: float = 0.0
    primary_keys: tuple = ()
    num_random_rows: int | None = None
    field_type: str = "bigint"
    target_field_type: str | None = None

    def get_table_name(self, result_type: str) -> str | None:
        if result_type == "source":
            return self.source_table_name
        return self.target_table_name

    def get_column_name(self, result_type: str) -> str | None:
        if result_type == "source":
            return self.source_column_name
        return self.target_column_name


@dataclass
class RunMetadata:
    """Reference analog: metadata.RunMetadata (combiner.py:391-403)."""

    run_id: str = field(default_factory=lambda: str(uuid.uuid4()))
    labels: list = field(default_factory=list)
    start_time: datetime.datetime = field(
        default_factory=lambda: datetime.datetime.now(datetime.timezone.utc)
    )
    end_time: datetime.datetime | None = None
    validations: dict = field(default_factory=dict)  # name -> ValidationMeta
