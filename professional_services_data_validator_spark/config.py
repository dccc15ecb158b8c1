"""Validation config model.

Mirrors the reference's dict-based config "IR"
(reference data_validation/consts.py:16-103 for the key vocabulary and
data_validation/config_manager.py:34-67 for how configs are held) but as typed
dataclasses; a plain-dict loader is provided for YAML/JSON parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class consts:
    """Key + enum vocabulary (reference data_validation/consts.py)."""

    # validation types (reference consts.py:91-103)
    COLUMN_VALIDATION = "Column"
    GROUPED_COLUMN_VALIDATION = "GroupedColumn"
    ROW_VALIDATION = "Row"
    SCHEMA_VALIDATION = "Schema"
    CUSTOM_QUERY = "Custom-query"

    # statuses (reference consts.py)
    VALIDATION_STATUS_SUCCESS = "success"
    VALIDATION_STATUS_FAIL = "fail"

    RESULT_TYPE_SOURCE = "source"
    RESULT_TYPE_TARGET = "target"

    # replacement string used by ifnull in hash chains
    # (reference query_builder.py:341-351)
    DEFAULT_REPLACEMENT_STRING = "DEFAULT_REPLACEMENT_STRING"

    # default random row batch size (reference consts.py:83)
    DEFAULT_NUM_RANDOM_ROWS = 10_000

    # driver-side collect guard (reference config_manager.py:145-148)
    MAX_RECURSIVE_QUERY_SIZE = 50_000

    AGG_TYPES = ("count", "min", "max", "sum", "avg", "std", "bit_xor")


@dataclass(frozen=True)
class AggregateSpec:
    """One aggregate validation field.

    ``name`` becomes the report's validation_name; the reference names these
    ``{agg}__{column}`` (or bare ``count`` for COUNT(*)).
    ``precalc`` is a type-driven rewrite applied before aggregation
    (reference config_manager.py:741-796): one of
    None | 'length' | 'byte_length' | 'epoch_seconds' | 'cast_bigint'.
    ``post_cast`` optionally casts the aggregate result
    (reference query_builder.py:114-115).
    """

    agg_type: str  # count|min|max|sum|avg|std|bit_xor
    column: str | None = None  # None => COUNT(*)
    name: str | None = None
    precalc: str | None = None
    post_cast: str | None = None

    @property
    def validation_name(self) -> str:
        if self.name:
            return self.name
        if self.column is None:
            return self.agg_type
        return f"{self.agg_type}__{self.column}"


@dataclass(frozen=True)
class FilterSpec:
    """WHERE predicate applied to one or both sides.

    ``ftype``: 'custom' (raw SQL, reference query_builder.py:173-180),
    'equal_to' | 'greater_than' | 'less_than' (reference :145-164),
    'isin' (reference :166-171).
    """

    ftype: str
    source: str | None = None  # SQL text for custom, column name otherwise
    target: str | None = None
    value: object = None  # literal / list for comparison filters
    column: str | None = None


@dataclass(frozen=True)
class CalculatedFieldSpec:
    """A derived column; chains replicate the reference depth-layered DAG
    (reference config_manager.py:1064-1074 order:
    cast -> ifnull -> rstrip -> [upper] -> concat -> hash)."""

    calc_type: str  # concat|hash|ifnull|length|byte_length|rstrip|upper|
    #                 epoch_seconds|cast|to_char|custom
    name: str = ""
    source_columns: tuple = ()
    target_type: str | None = None  # for cast
    expr: str | None = None  # custom: allowlisted name; to_char: format model
    depth: int = 0
    # params for parameterized custom funcs (reference README.md:779-790
    # 'params' block, e.g. strftime format_str); dict or list of dicts
    params: object = None


@dataclass(frozen=True)
class ComparisonFieldSpec:
    """Row-validation comparison field (reference query_builder.py:202-228)."""

    column: str
    name: str | None = None
    cast: str | None = None  # force_cast target type

    @property
    def validation_name(self) -> str:
        return self.name or self.column


@dataclass
class ValidationConfig:
    """One validation run; maps 1:1 onto the reference YAML config."""

    validation_type: str
    source_table: str = "source"
    target_table: str = "target"
    aggregates: list[AggregateSpec] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    filters: list[FilterSpec] = field(default_factory=list)
    calculated_fields: list[CalculatedFieldSpec] = field(default_factory=list)
    comparison_fields: list[ComparisonFieldSpec] = field(default_factory=list)
    primary_keys: list[str] = field(default_factory=list)
    threshold: float = 0.0
    labels: list = field(default_factory=list)
    # row-validation hash mode: '*' or list of columns -> sha256 row hash
    hash_columns: object = None
    # row-validation concat mode (reference --concat, cli_tools.py:610-617):
    # same cast->ifnull->rstrip->[upper]->concat chain as hash mode but the
    # RAW concat is compared (column concat__all), no sha256
    concat_columns: object = None
    # random-row mode (reference --use-random-row/--random-row-batch-size,
    # cli_tools.py:567-578): sample N source PKs, validate only those rows
    use_random_row: bool = False
    random_row_batch_size: int | None = None
    trim_string_pks: bool = False
    case_insensitive_match: bool = False
    # Schema validation knobs (reference --allow-list / --exclusion-columns)
    allow_list: str | None = None
    exclusion_columns: list[str] = field(default_factory=list)
    # grouped timestamp columns auto-cast to date
    # (reference query_builder.py:251-252)
    cast_group_timestamps_to_date: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "ValidationConfig":
        aggs = [AggregateSpec(**a) for a in d.get("aggregates", [])]
        filts = [FilterSpec(**f) for f in d.get("filters", [])]
        calcs = [CalculatedFieldSpec(**c) for c in d.get("calculated_fields", [])]
        comps = [ComparisonFieldSpec(**c) for c in d.get("comparison_fields", [])]
        return cls(
            validation_type=d["type"],
            source_table=d.get("source_table", "source"),
            target_table=d.get("target_table", "target"),
            aggregates=aggs,
            group_by=list(d.get("group_by", [])),
            filters=filts,
            calculated_fields=calcs,
            comparison_fields=comps,
            primary_keys=list(d.get("primary_keys", [])),
            threshold=float(d.get("threshold", 0.0)),
            labels=list(d.get("labels", [])),
            hash_columns=d.get("hash_columns"),
            concat_columns=d.get("concat_columns"),
            use_random_row=bool(d.get("use_random_row", False)),
            random_row_batch_size=(
                int(d["random_row_batch_size"])
                if d.get("random_row_batch_size") is not None
                else None
            ),
            trim_string_pks=bool(d.get("trim_string_pks", False)),
            case_insensitive_match=bool(d.get("case_insensitive_match", False)),
            allow_list=d.get("allow_list"),
            exclusion_columns=list(d.get("exclusion_columns", [])),
        )
