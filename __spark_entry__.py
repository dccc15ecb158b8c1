"""Driver contract for the spark-graft builder (PySpark target).

Every ``queries()`` entry is an operator from SURVEY.md §2 / BASELINE.json
implemented Spark-first in ``professional_services_data_validator_spark``;
``oracle_sql()`` provides an exact DuckDB equivalent over the same parquet
tables. Transcripts / transcripts_target / dim_conversations are DERIVED
deterministically from the ``events`` view by a shared SQL template
(professional_services_data_validator_spark/sources/readers.py), so both
engines validate byte-identical inputs.

Cross-engine value-hash discipline:
- no raw timestamp columns in outputs (epoch bigints / date strings instead);
- every float output rounded to a fixed decimal count on BOTH sides;
- identical aliases in Spark code and oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from professional_services_data_validator_spark.config import (  # noqa: E402
    AggregateSpec,
    ValidationConfig,
    consts,
)
from professional_services_data_validator_spark.sources.readers import (  # noqa: E402
    duckdb_transcript_ctes,
    register_transcripts,
    load_tables,
)

_CTES = duckdb_transcript_ctes()


_PREPPED: dict[tuple[int, str], bool] = {}


def _prep(spark: SparkSession, sf_dir: str) -> None:
    """Register views once per (session, sf_dir); cache derived transcripts
    so repeated queries measure validation work, not fixture re-derivation."""
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "1"))
    rep_docs = int(os.environ.get("SPARK_GRAFT_REPLICATE_DOCS", "1"))
    key = (id(spark), sf_dir, replicate, rep_docs)
    if _PREPPED.get(key):
        return
    load_tables(spark, sf_dir)
    register_transcripts(spark, sf_dir, cache=True, replicate=replicate)
    if rep_docs > 1:
        # docs-shape scaling protocol: scale the dedup/curation corpus
        # in-Spark (replica-tagged tokens preserve the dup rate; see
        # sources.readers.replicate_documents)
        from professional_services_data_validator_spark.sources.readers import (
            replicate_documents,
        )

        docs = replicate_documents(
            spark.table("documents"), rep_docs
        ).persist()
        docs.count()  # materialize outside any timed region
        docs.createOrReplaceTempView("documents")
    _PREPPED.clear()
    _PREPPED[key] = True


# ---------------------------------------------------------------------------
# 1. column stats: the single-pass hash-aggregate core (SURVEY §2.4)
# ---------------------------------------------------------------------------

def q_col_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    t = spark.table("transcripts")
    from professional_services_data_validator_spark.operators import column_stats

    aggs = [
        AggregateSpec("count"),
        AggregateSpec("count", "tool", name="count_tool"),
        AggregateSpec("min", "turn_idx", name="min_turn"),
        AggregateSpec("max", "turn_idx", name="max_turn"),
        AggregateSpec("sum", "turn_idx", name="sum_turn"),
        AggregateSpec("sum", "text", precalc="length", name="sum_text_len"),
        AggregateSpec("bit_xor", "event_id", name="xor_event"),
        AggregateSpec("sum", "ts", precalc="epoch_seconds", name="sum_epoch"),
    ]
    out = column_stats(t, aggs)
    return out.select(
        F.col("count").alias("n_rows"),
        "count_tool", "min_turn", "max_turn", "sum_turn",
        "sum_text_len", "xor_event", "sum_epoch",
        F.round(F.col("count") - F.col("count_tool"), 0).cast("long").alias(
            "null_tool_rows"
        ),
    )


# every aggregate CAST to the Spark output type: DuckDB sum(INTEGER/BIGINT)
# yields HUGEINT, which pandas renders as object/float — the driver's exact
# value-hash then diverges from Spark's int64 even when values are equal
# (VERDICT r1 "what's wrong" #1).
_SQL_COL_STATS = f"""{_CTES}
SELECT
  count(*) AS n_rows,
  count(tool) AS count_tool,
  min(turn_idx) AS min_turn,
  max(turn_idx) AS max_turn,
  CAST(sum(turn_idx) AS BIGINT) AS sum_turn,
  CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
  CAST(bit_xor(event_id) AS BIGINT) AS xor_event,
  CAST(sum(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS sum_epoch,
  count(*) - count(tool) AS null_tool_rows
FROM transcripts
"""


# ---------------------------------------------------------------------------
# 2. column validation report: full combiner semantics source vs target
# ---------------------------------------------------------------------------

def q_column_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark import run_validation

    cfg = ValidationConfig(
        validation_type=consts.COLUMN_VALIDATION,
        source_table="transcripts",
        target_table="transcripts_target",
        aggregates=[
            AggregateSpec("count"),
            AggregateSpec("count", "tool"),
            AggregateSpec("min", "turn_idx"),
            AggregateSpec("max", "turn_idx"),
            AggregateSpec("sum", "text", precalc="length"),
        ],
        threshold=1.0,
    )
    rep = run_validation(
        cfg, spark.table("transcripts"), spark.table("transcripts_target")
    )
    return rep.select(
        "validation_name",
        "source_agg_value",
        "target_agg_value",
        F.round("difference", 4).alias("difference"),
        F.round("pct_difference", 4).alias("pct_difference"),
        F.round("pct_threshold", 4).alias("pct_threshold"),
        "validation_status",
    )


# replicates combiner.py difference/threshold semantics in ANSI SQL
_SQL_COLUMN_VALIDATION = f"""{_CTES},
s AS (SELECT count(*) AS c, count(tool) AS ct, min(turn_idx) AS mn,
             max(turn_idx) AS mx, sum(length(text)) AS sl FROM transcripts),
t AS (SELECT count(*) AS c, count(tool) AS ct, min(turn_idx) AS mn,
             max(turn_idx) AS mx, sum(length(text)) AS sl FROM transcripts_target),
pairs AS (
  SELECT 'count' AS validation_name, s.c AS sv, t.c AS tv FROM s, t
  UNION ALL SELECT 'count__tool', s.ct, t.ct FROM s, t
  UNION ALL SELECT 'min__turn_idx', s.mn, t.mn FROM s, t
  UNION ALL SELECT 'max__turn_idx', s.mx, t.mx FROM s, t
  UNION ALL SELECT 'sum__text', s.sl, t.sl FROM s, t
),
d AS (
  SELECT validation_name,
    CAST(sv AS VARCHAR) AS source_agg_value,
    CAST(tv AS VARCHAR) AS target_agg_value,
    CAST(tv - sv AS DOUBLE) AS diff,
    CASE WHEN tv - sv = 0 THEN 0.0
         ELSE 100.0 * CAST(CAST(tv - sv AS REAL) AS DOUBLE)
              / (CASE WHEN sv = 0 THEN tv ELSE sv END) END AS pct
  FROM pairs)
SELECT validation_name, source_agg_value, target_agg_value,
  round(diff, 4) AS difference,
  round(pct, 4) AS pct_difference,
  CAST(1.0 AS DOUBLE) AS pct_threshold,
  CASE WHEN abs(pct) - 1.0 > 0.0 THEN 'fail' ELSE 'success' END
    AS validation_status
FROM d
"""


# ---------------------------------------------------------------------------
# 3. grouped validation by day: per-partition verdicts (GroupedColumn)
# ---------------------------------------------------------------------------

def q_grouped_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark import run_validation

    cfg = ValidationConfig(
        validation_type=consts.GROUPED_COLUMN_VALIDATION,
        source_table="transcripts",
        target_table="transcripts_target",
        aggregates=[
            AggregateSpec("count"),
            AggregateSpec("sum", "text", precalc="length"),
        ],
        group_by=["ts"],
    )
    rep = run_validation(
        cfg, spark.table("transcripts"), spark.table("transcripts_target")
    )
    return rep.select(
        "validation_name",
        "group_by_columns",
        "source_agg_value",
        "target_agg_value",
        F.round("difference", 4).alias("difference"),
        "validation_status",
    )


_SQL_GROUPED_VALIDATION = f"""{_CTES},
s AS (SELECT CAST(ts AS DATE) AS d, count(*) AS c, sum(length(text)) AS sl
      FROM transcripts GROUP BY 1),
t AS (SELECT CAST(ts AS DATE) AS d, count(*) AS c, sum(length(text)) AS sl
      FROM transcripts_target GROUP BY 1),
j AS (SELECT coalesce(s.d, t.d) AS d, s.c AS sc, t.c AS tc,
             s.sl AS ssl, t.sl AS tsl,
             s.d IS NOT NULL AS sp, t.d IS NOT NULL AS tp
      FROM s FULL OUTER JOIN t ON s.d = t.d),
m AS (
  SELECT 'count' AS validation_name, d, sp, tp,
         CAST(sc AS VARCHAR) AS sv, CAST(tc AS VARCHAR) AS tv,
         CAST(tc - sc AS DOUBLE) AS diff FROM j
  UNION ALL
  SELECT 'sum__text', d, sp, tp, CAST(ssl AS VARCHAR), CAST(tsl AS VARCHAR),
         CAST(tsl - ssl AS DOUBLE) FROM j)
SELECT validation_name,
  '{{"ts": "' || CAST(d AS VARCHAR) || '"}}' AS group_by_columns,
  CASE WHEN sp THEN sv END AS source_agg_value,
  CASE WHEN tp THEN tv END AS target_agg_value,
  round(CASE WHEN sp AND tp THEN diff END, 4) AS difference,
  CASE WHEN sp AND tp THEN (CASE WHEN diff = 0 THEN 'success' ELSE 'fail' END)
       ELSE 'fail' END AS validation_status
FROM m
"""


# ---------------------------------------------------------------------------
# 4. row-hash violations (Row validation scale path)
# ---------------------------------------------------------------------------

def _with_epoch(df: DataFrame) -> DataFrame:
    return df.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))


def _build_row_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsorted scale path: at 10^12 turns violations are written partitioned,
    never globally sorted (a global orderBy adds a range-sampling pass that
    re-executes the join subtree — measured 2-4x the query cost)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators import row_violations

    src = _with_epoch(spark.table("transcripts")).drop("ts", "event_id")
    tgt = _with_epoch(spark.table("transcripts_target")).drop("ts", "event_id")
    return row_violations(
        src, tgt, ["conv_id", "turn_idx"],
        hash_columns=["role", "text", "tool", "ts_us"],
    )


def q_row_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy only for the driver's deterministic oracle comparison
    return _build_row_violations(spark, sf_dir).orderBy("conv_id", "turn_idx")


def q_row_concat_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference --concat row mode (cli_tools.py:610-617,
    config_manager.py:1071-1072): the compared value is the RAW
    cast->ifnull->rstrip concat (concat__all), not its sha256 — same join
    shape as row_hash_violations, but the shuffle carries the concat
    payload, which is exactly why --hash is the default at scale and
    --concat is the debugging mode (you see the differing bytes, not two
    opaque digests)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators import (
        row_violations,
    )

    src = _with_epoch(spark.table("transcripts")).drop("ts", "event_id")
    tgt = _with_epoch(spark.table("transcripts_target")).drop(
        "ts", "event_id"
    )
    return row_violations(
        src, tgt, ["conv_id", "turn_idx"],
        hash_columns=["role", "text", "tool", "ts_us"],
        hash_algo="concat",
    ).orderBy("conv_id", "turn_idx")


_SQL_ROW_CONCAT_VIOLATIONS = f"""{_CTES},
sh AS (SELECT conv_id, turn_idx,
  rtrim(coalesce(CAST(role AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(text AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(tool AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(epoch_us(ts) AS VARCHAR),
                        'DEFAULT_REPLACEMENT_STRING'))
   AS h FROM transcripts),
th AS (SELECT conv_id, turn_idx,
  rtrim(coalesce(CAST(role AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(text AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(tool AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(epoch_us(ts) AS VARCHAR),
                        'DEFAULT_REPLACEMENT_STRING'))
   AS h FROM transcripts_target)
SELECT coalesce(sh.conv_id, th.conv_id) AS conv_id,
  coalesce(sh.turn_idx, th.turn_idx) AS turn_idx,
  CASE WHEN th.conv_id IS NULL THEN 'missing_in_target'
       WHEN sh.conv_id IS NULL THEN 'missing_in_source'
       WHEN sh.h <> th.h THEN 'hash_mismatch' END AS violation_type,
  sh.h AS source_hash, th.h AS target_hash
FROM sh FULL OUTER JOIN th
  ON sh.conv_id = th.conv_id AND sh.turn_idx = th.turn_idx
WHERE th.conv_id IS NULL OR sh.conv_id IS NULL OR sh.h <> th.h
ORDER BY 1, 2
"""


_SQL_ROW_VIOLATIONS = f"""{_CTES},
sh AS (SELECT conv_id, turn_idx,
  sha256(rtrim(coalesce(CAST(role AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(text AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(tool AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(epoch_us(ts) AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
  ) AS h FROM transcripts),
th AS (SELECT conv_id, turn_idx,
  sha256(rtrim(coalesce(CAST(role AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(text AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(tool AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(epoch_us(ts) AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
  ) AS h FROM transcripts_target)
SELECT coalesce(sh.conv_id, th.conv_id) AS conv_id,
  coalesce(sh.turn_idx, th.turn_idx) AS turn_idx,
  CASE WHEN th.conv_id IS NULL THEN 'missing_in_target'
       WHEN sh.conv_id IS NULL THEN 'missing_in_source'
       WHEN sh.h <> th.h THEN 'hash_mismatch' END AS violation_type,
  sh.h AS source_hash, th.h AS target_hash
FROM sh FULL OUTER JOIN th
  ON sh.conv_id = th.conv_id AND sh.turn_idx = th.turn_idx
WHERE th.conv_id IS NULL OR sh.conv_id IS NULL OR sh.h <> th.h
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# 4b. checksum-first partition validation (aggregate-only, no PK shuffle)
# ---------------------------------------------------------------------------

def _build_partition_checksums(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-day-partition (count, 120-bit row-hash XOR) fingerprints for both
    sides, aligned -> partition verdicts. The checksum-first scale path: one
    map-side-combined aggregate per side (shuffle = O(partitions) rows) clears
    clean partitions WITHOUT the row-level PK join; only failing partitions
    need the drill-down (operators/checksums.py, reference analog
    query_builder.py:90-97 bit_xor). Hash chain identical to
    row_hash_violations, so a cleared partition is cleared against the same
    bytes the row validation would compare."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.checksums import (
        checksum_validation,
    )

    src = _with_epoch(spark.table("transcripts")).drop("event_id")
    tgt = _with_epoch(spark.table("transcripts_target")).drop("event_id")
    return checksum_validation(
        src, tgt, F.date_format("ts", "yyyy-MM-dd"),
        ["role", "text", "tool", "ts_us"],
    )


def q_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy only for the driver's deterministic oracle comparison
    return _build_partition_checksums(spark, sf_dir).orderBy("partition_id")


_CHECKSUM_HASH_SQL = """
  sha256(rtrim(coalesce(CAST(role AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(text AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(tool AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(epoch_us(ts) AS VARCHAR),
                        'DEFAULT_REPLACEMENT_STRING'))
  )"""

_SQL_PARTITION_CHECKSUMS = f"""{_CTES},
sh AS (SELECT strftime(ts, '%Y-%m-%d') AS partition_id,
  {_CHECKSUM_HASH_SQL} AS h FROM transcripts),
th AS (SELECT strftime(ts, '%Y-%m-%d') AS partition_id,
  {_CHECKSUM_HASH_SQL} AS h FROM transcripts_target),
ss AS (SELECT partition_id, count(*) AS n,
  CAST(bit_xor(('0x' || substr(h, 1, 15))::BIGINT) AS BIGINT) AS lo,
  CAST(bit_xor(('0x' || substr(h, 16, 15))::BIGINT) AS BIGINT) AS hi
  FROM sh GROUP BY 1),
tt AS (SELECT partition_id, count(*) AS n,
  CAST(bit_xor(('0x' || substr(h, 1, 15))::BIGINT) AS BIGINT) AS lo,
  CAST(bit_xor(('0x' || substr(h, 16, 15))::BIGINT) AS BIGINT) AS hi
  FROM th GROUP BY 1)
SELECT coalesce(ss.partition_id, tt.partition_id) AS partition_id,
  ss.n AS n_rows_src, tt.n AS n_rows_tgt,
  (ss.n IS NOT DISTINCT FROM tt.n AND ss.lo IS NOT DISTINCT FROM tt.lo
   AND ss.hi IS NOT DISTINCT FROM tt.hi) AS checksum_match,
  CASE WHEN ss.n IS NOT DISTINCT FROM tt.n
        AND ss.lo IS NOT DISTINCT FROM tt.lo
        AND ss.hi IS NOT DISTINCT FROM tt.hi
       THEN 'success' ELSE 'fail' END AS validation_status
FROM ss FULL OUTER JOIN tt ON ss.partition_id = tt.partition_id
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 4c. snapshot-diff validation (Iceberg version-to-version delta)
# ---------------------------------------------------------------------------

# "next snapshot" fixture: the target copy (which already carries deletes,
# text mutations, and tool-nulls keyed on event_id) plus a deterministic
# tail of NEW rows (PK turn_idx shifted by 1,000,000 so they exist in no
# prior snapshot) — all four diff statuses are live. One template, both
# dialects (the column list is dialect-neutral).
_SNAPSHOT_NEW_SQL = """
SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts_target
UNION ALL
SELECT conv_id, turn_idx + 1000000 AS turn_idx, role,
       text || ' NEW' AS text, tool, ts
FROM transcripts WHERE event_id % 419 = 0
"""


def _snapshot_frames(spark: SparkSession, sf_dir: str):
    _prep(spark, sf_dir)
    old = _with_epoch(spark.table("transcripts")).drop("event_id")
    new = _with_epoch(spark.sql(_SNAPSHOT_NEW_SQL))
    return old, new


def _build_snapshot_delta_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot delta: which PKs were added / removed / changed
    between the validated snapshot and the current one — the same single
    full-outer binary-hash join as row_hash_violations, with add/remove
    classification on top (operators/snapshot.py; reference analog: row
    validation between table versions, data_validation.py:294-305)."""
    from professional_services_data_validator_spark.operators import (
        snapshot_diff_rows,
    )

    old, new = _snapshot_frames(spark, sf_dir)
    return snapshot_diff_rows(
        old.drop("ts"), new.drop("ts"), ["conv_id", "turn_idx"],
        compare_columns=["role", "text", "tool", "ts_us"],
    )


def q_snapshot_delta_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy only for the driver's deterministic oracle comparison
    return _build_snapshot_delta_rows(spark, sf_dir).orderBy(
        "conv_id", "turn_idx"
    )


def _build_snapshot_diff_by_day(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-day-partition change rollup between two snapshots: the counts
    that decide which partitions a resumable validation must re-check
    (revalidate=true invalidates that partition's lineage 'success')."""
    from professional_services_data_validator_spark.operators import (
        snapshot_diff_summary,
    )

    old, new = _snapshot_frames(spark, sf_dir)
    return snapshot_diff_summary(
        old, new, ["conv_id", "turn_idx"],
        F.date_format("ts", "yyyy-MM-dd"),
        compare_columns=["role", "text", "tool", "ts_us"],
    )


def q_snapshot_diff_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy only for the driver's deterministic oracle comparison
    return _build_snapshot_diff_by_day(spark, sf_dir).orderBy("partition_id")


def _build_snapshot_delta_detail(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forensic snapshot delta: each changed PK names WHICH columns
    changed (detail=True adds one xxhash64 per compare column — 8 bytes
    each — to the map-side projection; the join then folds the per-column
    hash inequalities into a name list). Fixture expectations: mutated
    rows -> 'text', tool-nulled -> 'tool', added tail -> NULL detail."""
    from professional_services_data_validator_spark.operators import (
        snapshot_diff_rows,
    )

    old, new = _snapshot_frames(spark, sf_dir)
    d = snapshot_diff_rows(
        old.drop("ts"), new.drop("ts"), ["conv_id", "turn_idx"],
        compare_columns=["role", "text", "tool", "ts_us"],
        detail=True,
    )
    return d.select(
        "conv_id", "turn_idx", "diff_status",
        F.array_join("changed_columns", ",").alias("changed_cols"),
    )


def q_snapshot_delta_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy only for the driver's deterministic oracle comparison
    return _build_snapshot_delta_detail(spark, sf_dir).orderBy(
        "conv_id", "turn_idx"
    )


# the oracle classifies with IS NOT DISTINCT FROM tuple compares — value
# equality and sha256-hash equality agree (the hash chain is injective per
# column list up to collision), so statuses match the Spark side exactly.
_SNAPSHOT_DIFF_CTE = f"""
snap_new AS ({_SNAPSHOT_NEW_SQL}),
diff AS (
  SELECT coalesce(o.conv_id, n.conv_id) AS conv_id,
    coalesce(o.turn_idx, n.turn_idx) AS turn_idx,
    coalesce(o.day, n.day) AS partition_id,
    CASE WHEN o.conv_id IS NULL THEN 'added'
         WHEN n.conv_id IS NULL THEN 'removed'
         WHEN (o.role IS NOT DISTINCT FROM n.role)
          AND (o.text IS NOT DISTINCT FROM n.text)
          AND (o.tool IS NOT DISTINCT FROM n.tool)
          AND (o.ts IS NOT DISTINCT FROM n.ts) THEN 'unchanged'
         ELSE 'changed' END AS diff_status
  FROM (SELECT *, strftime(ts, '%Y-%m-%d') AS day FROM transcripts) o
  FULL OUTER JOIN (SELECT *, strftime(ts, '%Y-%m-%d') AS day FROM snap_new) n
    ON o.conv_id = n.conv_id AND o.turn_idx = n.turn_idx)
"""

_SQL_SNAPSHOT_DELTA_ROWS = f"""{_CTES},
{_SNAPSHOT_DIFF_CTE}
SELECT conv_id, turn_idx, diff_status
FROM diff WHERE diff_status <> 'unchanged' ORDER BY conv_id, turn_idx
"""

# per-column chain compare replicating build_row_hash's canonicalization
# (cast -> ifnull DEFAULT_REPLACEMENT_STRING -> rtrim), so NULL-vs-value
# flags exactly like the Spark side's per-column xxhash64 inequality
_DETAIL_NEQ = (
    "rtrim(coalesce(CAST(o.{c} AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))"
    " <> "
    "rtrim(coalesce(CAST(n.{c} AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))"
)

_SQL_SNAPSHOT_DELTA_DETAIL = f"""{_CTES},
snap_new AS ({_SNAPSHOT_NEW_SQL}),
o AS (SELECT conv_id, turn_idx, role, text, tool,
             CAST(epoch_us(ts) AS VARCHAR) AS ts_us FROM transcripts),
n AS (SELECT conv_id, turn_idx, role, text, tool,
             CAST(epoch_us(ts) AS VARCHAR) AS ts_us FROM snap_new),
diff AS (
  SELECT coalesce(o.conv_id, n.conv_id) AS conv_id,
    coalesce(o.turn_idx, n.turn_idx) AS turn_idx,
    CASE WHEN o.conv_id IS NULL THEN 'added'
         WHEN n.conv_id IS NULL THEN 'removed'
         WHEN NOT ({_DETAIL_NEQ.format(c='role')})
          AND NOT ({_DETAIL_NEQ.format(c='text')})
          AND NOT ({_DETAIL_NEQ.format(c='tool')})
          AND NOT ({_DETAIL_NEQ.format(c='ts_us')}) THEN 'unchanged'
         ELSE 'changed' END AS diff_status,
    concat_ws(',',
      CASE WHEN {_DETAIL_NEQ.format(c='role')} THEN 'role' END,
      CASE WHEN {_DETAIL_NEQ.format(c='text')} THEN 'text' END,
      CASE WHEN {_DETAIL_NEQ.format(c='tool')} THEN 'tool' END,
      CASE WHEN {_DETAIL_NEQ.format(c='ts_us')} THEN 'ts_us' END
    ) AS cols
  FROM o FULL OUTER JOIN n
    ON o.conv_id = n.conv_id AND o.turn_idx = n.turn_idx)
SELECT conv_id, turn_idx, diff_status,
  CASE WHEN diff_status = 'changed' THEN cols END AS changed_cols
FROM diff WHERE diff_status <> 'unchanged' ORDER BY conv_id, turn_idx
"""

_SQL_SNAPSHOT_DIFF_BY_DAY = f"""{_CTES},
{_SNAPSHOT_DIFF_CTE}
SELECT partition_id,
  count(*) FILTER (WHERE diff_status = 'added') AS n_added,
  count(*) FILTER (WHERE diff_status = 'removed') AS n_removed,
  count(*) FILTER (WHERE diff_status = 'changed') AS n_changed,
  count(*) FILTER (WHERE diff_status = 'unchanged') AS n_unchanged,
  (count(*) FILTER (WHERE diff_status = 'added') > 0
   OR count(*) FILTER (WHERE diff_status = 'removed') > 0
   OR count(*) FILTER (WHERE diff_status = 'changed') > 0) AS revalidate
FROM diff GROUP BY partition_id ORDER BY partition_id
"""


# ---------------------------------------------------------------------------
# 4d. conversation-rollup compare (per-turn text equality, conv granularity)
# ---------------------------------------------------------------------------

def _build_conv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-granularity text-equality validation: one (count,
    120-bit XOR of sha256(turn_idx, text)) fingerprint per conv_id per side
    — the north rule's per-turn-text-equality invariant checked WITHOUT the
    O(turns) PK join. The XOR fold is commutative, so the per-conv
    aggregate is map-side combined and order-independent while still
    order-AWARE (turn_idx is inside each hash: mutations, missing turns,
    and re-orderings all flip the fingerprint). Output = mismatching
    conversations only; drill down to row_hash_violations filtered to
    these conv_ids. Reuses operators/checksums.py with conv_id as the
    grouping expression."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators import (
        checksum_validation,
    )

    src = spark.table("transcripts")
    tgt = spark.table("transcripts_target")
    out = checksum_validation(
        src, tgt, F.col("conv_id"), ["turn_idx", "text"]
    )
    return out.filter(F.col("validation_status") == "fail").select(
        F.col("partition_id").alias("conv_id"),
        "n_rows_src", "n_rows_tgt", "validation_status",
    )


def q_conv_rollup_mismatches(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy only for the driver's deterministic oracle comparison
    return _build_conv_rollup(spark, sf_dir).orderBy("conv_id")


_CONV_ROLLUP_HASH_SQL = """
  sha256(rtrim(coalesce(CAST(turn_idx AS VARCHAR),
                        'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(text AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
  )"""

_SQL_CONV_ROLLUP = f"""{_CTES},
sh AS (SELECT conv_id, {_CONV_ROLLUP_HASH_SQL} AS h FROM transcripts),
th AS (SELECT conv_id, {_CONV_ROLLUP_HASH_SQL} AS h FROM transcripts_target),
ss AS (SELECT conv_id, count(*) AS n,
  CAST(bit_xor(('0x' || substr(h, 1, 15))::BIGINT) AS BIGINT) AS lo,
  CAST(bit_xor(('0x' || substr(h, 16, 15))::BIGINT) AS BIGINT) AS hi
  FROM sh GROUP BY 1),
tt AS (SELECT conv_id, count(*) AS n,
  CAST(bit_xor(('0x' || substr(h, 1, 15))::BIGINT) AS BIGINT) AS lo,
  CAST(bit_xor(('0x' || substr(h, 16, 15))::BIGINT) AS BIGINT) AS hi
  FROM th GROUP BY 1)
SELECT coalesce(ss.conv_id, tt.conv_id) AS conv_id,
  ss.n AS n_rows_src, tt.n AS n_rows_tgt, 'fail' AS validation_status
FROM ss FULL OUTER JOIN tt ON ss.conv_id = tt.conv_id
WHERE NOT (ss.n IS NOT DISTINCT FROM tt.n
           AND ss.lo IS NOT DISTINCT FROM tt.lo
           AND ss.hi IS NOT DISTINCT FROM tt.hi)
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 4e. profile-compare validation (distribution shape, no PK alignment)
# ---------------------------------------------------------------------------

def q_profile_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-profile validation of text length per role: source vs
    target numeric_profile (count/min/max/avg/std/p50/p90/p99) melted to
    one verdict row per (role, metric) — the shape check for tables whose
    PKs don't align (operators/aggregates.py profile_compare)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        profile_compare,
    )

    src = spark.table("transcripts").select(
        "role", F.length("text").alias("text_len")
    )
    tgt = spark.table("transcripts_target").select(
        "role", F.length("text").alias("text_len")
    )
    return profile_compare(
        src, tgt, ["role"], "text_len", threshold_pct=0.5
    ).orderBy("role", "metric")


_PROFILE_SQL = """
  SELECT role, CAST(count(v) AS DOUBLE) AS n,
    min(v) AS vmin, max(v) AS vmax,
    round(avg(v), 6) AS avg, round(stddev_samp(v), 6) AS std,
    round(quantile_cont(v, 0.5), 6) AS p_50,
    round(quantile_cont(v, 0.9), 6) AS p_90,
    round(quantile_cont(v, 0.99), 6) AS p_99
  FROM (SELECT role, CAST(length(text) AS DOUBLE) AS v FROM {tbl}) z
  GROUP BY 1"""

_SQL_PROFILE_COMPARE = f"""{_CTES},
sp AS ({_PROFILE_SQL.format(tbl='transcripts')}),
tp AS ({_PROFILE_SQL.format(tbl='transcripts_target')}),
j AS (SELECT coalesce(sp.role, tp.role) AS role,
  sp.n AS s_n, tp.n AS t_n, sp.vmin AS s_vmin, tp.vmin AS t_vmin,
  sp.vmax AS s_vmax, tp.vmax AS t_vmax, sp.avg AS s_avg, tp.avg AS t_avg,
  sp.std AS s_std, tp.std AS t_std, sp.p_50 AS s_p_50, tp.p_50 AS t_p_50,
  sp.p_90 AS s_p_90, tp.p_90 AS t_p_90, sp.p_99 AS s_p_99,
  tp.p_99 AS t_p_99
  FROM sp FULL OUTER JOIN tp ON sp.role = tp.role),
u AS (
  SELECT role, 'n' AS metric, s_n AS source_value, t_n AS target_value
  FROM j
  UNION ALL SELECT role, 'vmin', s_vmin, t_vmin FROM j
  UNION ALL SELECT role, 'vmax', s_vmax, t_vmax FROM j
  UNION ALL SELECT role, 'avg', s_avg, t_avg FROM j
  UNION ALL SELECT role, 'std', s_std, t_std FROM j
  UNION ALL SELECT role, 'p_50', s_p_50, t_p_50 FROM j
  UNION ALL SELECT role, 'p_90', s_p_90, t_p_90 FROM j
  UNION ALL SELECT role, 'p_99', s_p_99, t_p_99 FROM j)
SELECT role, metric, source_value, target_value,
  round((target_value - source_value) / nullif(source_value, 0) * 100.0,
        6) AS pct_diff,
  CASE WHEN (source_value IS NULL) <> (target_value IS NULL)
         OR coalesce(abs(round((target_value - source_value)
                / nullif(source_value, 0) * 100.0, 6)) > 0.5, false)
         OR (source_value IS NOT NULL AND target_value IS NOT NULL
             AND source_value = 0 AND target_value <> 0)
       THEN 'fail' ELSE 'success' END AS validation_status
FROM u ORDER BY role, metric
"""


# ---------------------------------------------------------------------------
# 5. uniqueness violations on (conv_id, turn_idx)
# ---------------------------------------------------------------------------

def _build_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators import (
        uniqueness_violations,
    )

    t = spark.table("transcripts")
    dirty = t.unionByName(t.filter(F.col("event_id") % 101 == 3))
    return uniqueness_violations(dirty, ["conv_id", "turn_idx"])


def q_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _build_uniqueness(spark, sf_dir).orderBy("conv_id", "turn_idx")


_SQL_UNIQUENESS = f"""{_CTES},
dirty AS (SELECT * FROM transcripts
          UNION ALL SELECT * FROM transcripts WHERE event_id % 101 = 3)
SELECT conv_id, turn_idx, count(*) AS dup_count
FROM dirty GROUP BY conv_id, turn_idx HAVING count(*) > 1
ORDER BY conv_id, turn_idx
"""


# ---------------------------------------------------------------------------
# 6. referential integrity: orphan conv_ids (broadcast left-anti)
# ---------------------------------------------------------------------------

def _build_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators import (
        referential_violations,
    )

    orphans = referential_violations(
        spark.table("transcripts"), spark.table("dim_conversations"), "conv_id"
    )
    return orphans.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("orphan_rows")
    )


def q_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _build_referential(spark, sf_dir).orderBy("conv_id")


_SQL_REFERENTIAL = f"""{_CTES}
SELECT conv_id, count(*) AS orphan_rows
FROM transcripts
WHERE conv_id NOT IN (SELECT conv_id FROM dim_conversations)
GROUP BY conv_id ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# 7. PSI drift on role frequencies
# ---------------------------------------------------------------------------

def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import psi

    # target with a deterministic role skew so PSI is nonzero
    tgt = spark.table("transcripts_target").withColumn(
        "role",
        F.when(F.col("event_id") % 7 == 0, F.lit("assistant")).otherwise(
            F.col("role")
        ),
    )
    out = psi(spark.table("transcripts"), tgt, F.col("role"))
    return out.select(F.round("psi", 6).alias("psi"))


_SQL_DRIFT_PSI = f"""{_CTES},
tgt AS (SELECT CASE WHEN event_id % 7 = 0 THEN 'assistant' ELSE role END AS role
        FROM transcripts_target),
u AS (
  SELECT v, sum(ns) AS n_s, sum(nt) AS n_t FROM (
    SELECT role AS v, 1 AS ns, 0 AS nt FROM transcripts
    UNION ALL SELECT role, 0, 1 FROM tgt) z
  GROUP BY v),
tot AS (SELECT sum(n_s) AS ts, sum(n_t) AS tt FROM u),
p AS (SELECT greatest(n_s * 1.0 / ts, 1e-6) AS p,
             greatest(n_t * 1.0 / tt, 1e-6) AS q FROM u, tot)
SELECT round(sum((p - q) * ln(p / q)), 6) AS psi FROM p
"""


# ---------------------------------------------------------------------------
# 8. exact KS drift on turn text length
# ---------------------------------------------------------------------------

def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import (
        ks_statistic,
    )

    out = ks_statistic(
        spark.table("transcripts"),
        spark.table("transcripts_target"),
        F.length("text"),
    )
    return out.select(
        F.round("ks_stat", 6).alias("ks_stat"), "n_source", "n_target"
    )


_SQL_DRIFT_KS = f"""{_CTES},
u AS (
  SELECT v, sum(ns) AS n_s, sum(nt) AS n_t FROM (
    SELECT length(text) AS v, 1 AS ns, 0 AS nt FROM transcripts
    UNION ALL SELECT length(text), 0, 1 FROM transcripts_target) z
  GROUP BY v),
c AS (SELECT
   sum(n_s) OVER (ORDER BY v) AS cs, sum(n_t) OVER (ORDER BY v) AS ct,
   sum(n_s) OVER () AS tot_s, sum(n_t) OVER () AS tot_t FROM u)
SELECT CAST(round(max(abs(cs * 1.0 / tot_s - ct * 1.0 / tot_t)), 6)
         AS DOUBLE) AS ks_stat,
       CAST(max(tot_s) AS BIGINT) AS n_source,
       CAST(max(tot_t) AS BIGINT) AS n_target
FROM c
"""


# ---------------------------------------------------------------------------
# 8b. binned KS per group — the unbounded-scale drift path (no global
#     window; cumsum partitions by group; exact for integer stats, bin=1)
# ---------------------------------------------------------------------------

def q_drift_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import (
        ks_binned,
    )

    src = spark.table("transcripts").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    tgt = spark.table("transcripts_target").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = ks_binned(
        src, tgt, F.length("text"), bin_width=5, group_cols=["day"]
    )
    return out.select(
        "day",
        F.round("ks_stat", 6).alias("ks_stat"),
        "n_source",
        "n_target",
    ).orderBy("day")


_SQL_DRIFT_KS_BINNED = f"""{_CTES},
u AS (
  SELECT g, v, sum(ns) AS n_s, sum(nt) AS n_t FROM (
    SELECT strftime(ts, '%Y-%m-%d') AS g,
           CAST(floor(length(text) / 5) * 5 AS BIGINT) AS v, 1 AS ns, 0 AS nt
    FROM transcripts
    UNION ALL
    SELECT strftime(ts, '%Y-%m-%d'),
           CAST(floor(length(text) / 5) * 5 AS BIGINT), 0, 1
    FROM transcripts_target) z
  GROUP BY g, v),
c AS (SELECT g,
   sum(n_s) OVER (PARTITION BY g ORDER BY v) AS cs,
   sum(n_t) OVER (PARTITION BY g ORDER BY v) AS ct,
   sum(n_s) OVER (PARTITION BY g) AS tot_s,
   sum(n_t) OVER (PARTITION BY g) AS tot_t FROM u)
SELECT g AS day,
  CAST(round(max(abs(cs * 1.0 / tot_s - ct * 1.0 / tot_t)), 6) AS DOUBLE)
    AS ks_stat,
  CAST(max(tot_s) AS BIGINT) AS n_source,
  CAST(max(tot_t) AS BIGINT) AS n_target
FROM c GROUP BY g ORDER BY day
"""


# ---------------------------------------------------------------------------
# 9. partition boundary planning (generate-table-partitions)
# ---------------------------------------------------------------------------

def q_partition_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators import (
        partition_boundaries,
    )

    return partition_boundaries(
        spark.table("transcripts"), ["conv_id", "turn_idx"], 8
    )


_SQL_PARTITION_BOUNDARIES = f"""{_CTES},
b AS (SELECT conv_id, turn_idx,
        row_number() OVER (ORDER BY conv_id, turn_idx) AS rn,
        count(*) OVER () AS cnt
      FROM transcripts)
SELECT CAST((rn - 1) / CAST(ceil(cnt / 8.0) AS BIGINT) AS INTEGER)
         AS partition_idx,
       conv_id, turn_idx
FROM b WHERE (rn - 1) % CAST(ceil(cnt / 8.0) AS BIGINT) = 0
ORDER BY partition_idx
"""


# ---------------------------------------------------------------------------
# 10. salted two-phase aggregation == direct aggregation (skew path)
# ---------------------------------------------------------------------------

def _build_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators import salted_agg

    t2 = spark.table("transcripts").withColumn("text_len", F.length("text"))
    out = salted_agg(
        t2,
        ["conv_id"],
        {
            "n_turns": ("count", None),
            "sum_turn": ("sum", "turn_idx"),
            "avg_text_len": ("avg", "text_len"),
            "max_turn": ("max", "turn_idx"),
        },
        n_salts=16,
        salt_source=F.pmod(F.col("event_id"), F.lit(16)),
    )
    return out.select(
        "conv_id", "n_turns", "sum_turn",
        F.round("avg_text_len", 4).alias("avg_text_len"), "max_turn",
    )


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _build_salted_agg(spark, sf_dir).orderBy("conv_id")


_SQL_SALTED_AGG = f"""{_CTES}
SELECT conv_id, count(*) AS n_turns,
       CAST(sum(turn_idx) AS BIGINT) AS sum_turn,
       CAST(round(avg(length(text)), 4) AS DOUBLE) AS avg_text_len,
       max(turn_idx) AS max_turn
FROM transcripts GROUP BY conv_id ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# 11. deterministic random-row sampling (random-row validation)
# ---------------------------------------------------------------------------

def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators import (
        deterministic_sample,
    )

    return deterministic_sample(
        spark.table("transcripts").select("conv_id", "turn_idx", "role"),
        ["conv_id", "turn_idx"],
        n=100,
    ).orderBy("conv_id", "turn_idx")


_SQL_SAMPLE = f"""{_CTES},
h AS (SELECT conv_id, turn_idx, role,
        md5('42' || '|' || conv_id || '|' || CAST(turn_idx AS VARCHAR)) AS hh
      FROM transcripts)
SELECT conv_id, turn_idx, role FROM h
ORDER BY hh, conv_id, turn_idx LIMIT 100
"""


# ---------------------------------------------------------------------------
# 12. custom-query validation (SQL both sides; reference clients.py:170-176)
# ---------------------------------------------------------------------------

def q_custom_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark import run_validation

    cfg = ValidationConfig(
        validation_type=consts.CUSTOM_QUERY,
        source_table=(
            "SELECT role, count(*) AS n FROM transcripts GROUP BY role"
        ),
        target_table=(
            "SELECT role, count(*) AS n FROM transcripts_target GROUP BY role"
        ),
        aggregates=[AggregateSpec("sum", "n", name="sum_n"),
                    AggregateSpec("count", name="count")],
    )
    rep = run_validation(cfg, spark=spark)
    return rep.select(
        "validation_name", "source_agg_value", "target_agg_value",
        "validation_status",
    ).orderBy("validation_name")


_SQL_CUSTOM_QUERY = f"""{_CTES},
s AS (SELECT count(*) AS c, sum(n) AS sn FROM
      (SELECT role, count(*) AS n FROM transcripts GROUP BY role) z),
t AS (SELECT count(*) AS c, sum(n) AS sn FROM
      (SELECT role, count(*) AS n FROM transcripts_target GROUP BY role) z)
SELECT 'count' AS validation_name, CAST(s.c AS VARCHAR) AS source_agg_value,
       CAST(t.c AS VARCHAR) AS target_agg_value,
       CASE WHEN s.c = t.c THEN 'success' ELSE 'fail' END AS validation_status
FROM s, t
UNION ALL
SELECT 'sum_n', CAST(s.sn AS VARCHAR), CAST(t.sn AS VARCHAR),
       CASE WHEN s.sn = t.sn THEN 'success' ELSE 'fail' END
FROM s, t
ORDER BY validation_name
"""


# ---------------------------------------------------------------------------
# 13. schema validation (catalog-introspected, casefolded)
# ---------------------------------------------------------------------------

def q_schema_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.schema_validation import (
        schema_validation_report,
    )

    rep = schema_validation_report(
        spark,
        spark.table("transcripts"),
        spark.table("transcripts_target"),
        source_table="transcripts",
        target_table="transcripts_target",
    )
    return rep.select(
        "source_column_name",
        "target_column_name",
        F.col("source_agg_value").alias("source_type"),
        F.col("target_agg_value").alias("target_type"),
        "validation_status",
    ).orderBy("source_column_name")


_SQL_SCHEMA_VALIDATION = f"""{_CTES},
cols AS (
  SELECT lower(column_name) AS c,
    CASE lower(column_type)
      WHEN 'integer' THEN 'int' WHEN 'varchar' THEN 'string'
      WHEN 'timestamp' THEN 'timestamp' ELSE lower(column_type) END AS t
  FROM (DESCRIBE SELECT * FROM transcripts))
SELECT c AS source_column_name, c AS target_column_name,
       t AS source_type, t AS target_type,
       'success' AS validation_status
FROM cols ORDER BY c
"""


# ---------------------------------------------------------------------------
# 14. stddev column validation (reference README:638-640 `std` aggregate)
# ---------------------------------------------------------------------------

def q_std_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators import column_stats

    out = column_stats(
        spark.table("transcripts"),
        [
            AggregateSpec("std", "turn_idx", name="std_turn"),
            AggregateSpec("std", "text", precalc="length", name="std_text_len"),
            AggregateSpec("avg", "turn_idx", name="avg_turn"),
        ],
    )
    return out.select(
        F.round("std_turn", 6).alias("std_turn"),
        F.round("std_text_len", 6).alias("std_text_len"),
        F.round("avg_turn", 6).alias("avg_turn"),
    )


_SQL_STD_VALIDATION = f"""{_CTES}
SELECT CAST(round(stddev_samp(turn_idx), 6) AS DOUBLE) AS std_turn,
       CAST(round(stddev_samp(length(text)), 6) AS DOUBLE) AS std_text_len,
       CAST(round(avg(turn_idx), 6) AS DOUBLE) AS avg_turn
FROM transcripts
"""


# ---------------------------------------------------------------------------
# 15. random-row validation (reference --use-random-row,
#     random_row_builder.py:86-104; deterministic seed -> oracle-able)
# ---------------------------------------------------------------------------

def q_random_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.row_compare import (
        random_row_compare,
    )

    src = _with_epoch(spark.table("transcripts")).drop("ts", "event_id")
    tgt = _with_epoch(spark.table("transcripts_target")).drop("ts", "event_id")
    rep = random_row_compare(
        src, tgt, ["conv_id", "turn_idx"], num_rows=100, seed=42,
        hash_columns=["role", "text", "tool", "ts_us"],
    )
    return rep.select(
        "group_by_columns",
        "validation_name",
        "source_agg_value",
        "target_agg_value",
        "validation_status",
        "num_random_rows",
    ).orderBy("group_by_columns", "validation_status")


_HASH_EXPR_SQL = """sha256(
  rtrim(coalesce(CAST(role AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
  || rtrim(coalesce(CAST(text AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
  || rtrim(coalesce(CAST(tool AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING'))
  || rtrim(coalesce(CAST(ts_us AS VARCHAR), 'DEFAULT_REPLACEMENT_STRING')))"""

_SQL_RANDOM_ROW = f"""{_CTES},
base_s AS (SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
           FROM transcripts),
base_t AS (SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
           FROM transcripts_target),
samp AS (SELECT conv_id, turn_idx FROM (
    SELECT conv_id, turn_idx,
      md5('42' || '|' || conv_id || '|' || CAST(turn_idx AS VARCHAR)) AS hh
    FROM base_s) z ORDER BY hh, conv_id, turn_idx LIMIT 100),
sh AS (SELECT s.conv_id, s.turn_idx, {_HASH_EXPR_SQL} AS h
       FROM base_s s JOIN samp USING (conv_id, turn_idx)),
th AS (SELECT t.conv_id, t.turn_idx, {_HASH_EXPR_SQL} AS h
       FROM base_t t JOIN samp USING (conv_id, turn_idx)),
j AS (SELECT coalesce(sh.conv_id, th.conv_id) AS conv_id,
             coalesce(sh.turn_idx, th.turn_idx) AS turn_idx,
             coalesce(sh.h, th.h) AS h, sh.h AS s_h, th.h AS t_h
      FROM sh FULL OUTER JOIN th
        ON sh.conv_id = th.conv_id AND sh.turn_idx = th.turn_idx
       AND sh.h = th.h)
SELECT '{{"conv_id": "' || conv_id || '", "turn_idx": "'
         || CAST(turn_idx AS VARCHAR) || '", "hash__all": "' || h || '"}}'
         AS group_by_columns,
       'hash__all' AS validation_name,
       s_h AS source_agg_value,
       t_h AS target_agg_value,
       CASE WHEN s_h IS NOT NULL AND t_h IS NOT NULL THEN 'success'
            ELSE 'fail' END AS validation_status,
       CAST(100 AS BIGINT) AS num_random_rows
FROM j ORDER BY group_by_columns, validation_status
"""


# ---------------------------------------------------------------------------
# 16. to_char round-trip (reference query_builder.py:334-339 default
#     'FM90.099'; operations.py:350-353/390-401 engine to_char compilers)
# ---------------------------------------------------------------------------

def q_to_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number + date format models through the config-driven calc-field
    path. v = turn_idx/8 - 2 is an exact binary eighth, so '%.3f' needs no
    rounding and both engines render identical digits."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.config import (
        CalculatedFieldSpec,
    )
    from professional_services_data_validator_spark.functions.calculated import (
        apply_calculated_fields,
    )

    t = (
        spark.table("transcripts")
        .filter((F.col("event_id") % 20 == 0) & (F.col("turn_idx") < 700))
        .withColumn("v", F.col("turn_idx") / F.lit(8.0) - F.lit(2.0))
    )
    out = apply_calculated_fields(
        t,
        [
            CalculatedFieldSpec(
                "to_char", "num_str", ("v",), expr="FM90.099"
            ),
            CalculatedFieldSpec(
                "to_char", "date_str", ("ts",), expr="YYYY-MM-DD HH24:MI:SS"
            ),
        ],
    )
    return out.select("event_id", "num_str", "date_str").orderBy("event_id")


_SQL_TO_CHAR = f"""{_CTES},
v AS (SELECT event_id, turn_idx / 8.0 - 2.0 AS v, ts FROM transcripts
      WHERE event_id % 20 = 0 AND turn_idx < 700)
SELECT event_id,
  CASE WHEN v < 0 THEN '-' ELSE '' END ||
    regexp_replace(printf('%.3f', abs(v)), '(\\.[0-9][0-9]*?)0+$', '\\1')
    AS num_str,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS date_str
FROM v ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grouped per-day validation verdicts at sf0.001."""
    return q_grouped_validation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = dict(_TRAINING_QUERIES)
    out.update({
        "col_stats_transcripts": q_col_stats,
        "column_validation_report": q_column_validation,
        "grouped_validation_by_day": q_grouped_validation,
        "row_hash_violations": q_row_violations,
        "row_concat_violations": q_row_concat_violations,
        "partition_checksum_compare": q_partition_checksums,
        "snapshot_delta_rows": q_snapshot_delta_rows,
        "snapshot_delta_detail": q_snapshot_delta_detail,
        "snapshot_diff_by_day": q_snapshot_diff_by_day,
        "conv_rollup_mismatches": q_conv_rollup_mismatches,
        "profile_compare_by_role": q_profile_compare,
        "uniqueness_violations": q_uniqueness,
        "referential_orphans": q_referential,
        "drift_psi_role": q_drift_psi,
        "drift_ks_textlen": q_drift_ks,
        "drift_ks_binned_by_day": q_drift_ks_binned,
        "partition_boundaries": q_partition_boundaries,
        "salted_agg_parity": q_salted_agg,
        "deterministic_sample": q_sample,
        "custom_query_validation": q_custom_query,
        "schema_validation": q_schema_validation,
        "std_validation": q_std_validation,
        "random_row_compare": q_random_row,
        "to_char_roundtrip": q_to_char,
    })
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(_TRAINING_ORACLES)
    out.update({
        "col_stats_transcripts": _SQL_COL_STATS,
        "column_validation_report": _SQL_COLUMN_VALIDATION,
        "grouped_validation_by_day": _SQL_GROUPED_VALIDATION,
        "row_hash_violations": _SQL_ROW_VIOLATIONS,
        "row_concat_violations": _SQL_ROW_CONCAT_VIOLATIONS,
        "partition_checksum_compare": _SQL_PARTITION_CHECKSUMS,
        "snapshot_delta_rows": _SQL_SNAPSHOT_DELTA_ROWS,
        "snapshot_delta_detail": _SQL_SNAPSHOT_DELTA_DETAIL,
        "snapshot_diff_by_day": _SQL_SNAPSHOT_DIFF_BY_DAY,
        "conv_rollup_mismatches": _SQL_CONV_ROLLUP,
        "profile_compare_by_role": _SQL_PROFILE_COMPARE,
        "uniqueness_violations": _SQL_UNIQUENESS,
        "referential_orphans": _SQL_REFERENTIAL,
        "drift_psi_role": _SQL_DRIFT_PSI,
        "drift_ks_textlen": _SQL_DRIFT_KS,
        "drift_ks_binned_by_day": _SQL_DRIFT_KS_BINNED,
        "partition_boundaries": _SQL_PARTITION_BOUNDARIES,
        "salted_agg_parity": _SQL_SALTED_AGG,
        "deterministic_sample": _SQL_SAMPLE,
        "custom_query_validation": _SQL_CUSTOM_QUERY,
        "schema_validation": _SQL_SCHEMA_VALIDATION,
        "std_validation": _SQL_STD_VALIDATION,
        "random_row_compare": _SQL_RANDOM_ROW,
        "to_char_roundtrip": _SQL_TO_CHAR,
    })
    # generated lazily (data-dependent literal centroids, see the builder)
    out["embedding_kmeans_ann"] = _kmeans_oracle_sql()
    return out


# ===========================================================================
# Training-data pipeline queries (dedup / similarity / text analysis)
# ===========================================================================

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        exact_dedup,
    )

    return exact_dedup(
        spark.table("transcripts"), "text", ["conv_id", "turn_idx"]
    ).orderBy("conv_id", "turn_idx")


_SQL_DEDUP_EXACT = f"""{_CTES},
h AS (SELECT conv_id, turn_idx, md5(text) AS text_hash,
        row_number() OVER (PARTITION BY md5(text)
                           ORDER BY conv_id, turn_idx) AS keep_rank
      FROM transcripts)
SELECT conv_id, turn_idx, text_hash, keep_rank
FROM h WHERE keep_rank > 1 ORDER BY conv_id, turn_idx
"""


def q_conv_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-conversation exact dedup: drop conversations whose ordered
    (turn_idx, text) transcript already exists under a smaller conv_id.
    Fixture plants duplicates by re-keying every conv with
    uid % 97 = 3 as '<conv_id>_dup' — the operator must flag exactly the
    re-keyed copies (original keys sort first). operators/dedup.py
    group_exact_dedup: per-conv XOR-fingerprint fold (map-side combined)
    + keep-rank window over the fingerprint."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        group_exact_dedup,
    )

    base = spark.table("transcripts").select("conv_id", "turn_idx", "text")
    dup = base.filter(
        F.expr("CAST(substring(conv_id, 2) AS INT) % 97 = 3")
    ).select(
        F.concat(F.col("conv_id"), F.lit("_dup")).alias("conv_id"),
        "turn_idx", "text",
    )
    u = base.unionByName(dup)
    return group_exact_dedup(
        u, ["conv_id"], "turn_idx", "text"
    ).orderBy("conv_id")


_SQL_CONV_DEDUP = f"""{_CTES},
base AS (SELECT conv_id, turn_idx, text FROM transcripts),
dup AS (SELECT conv_id || '_dup' AS conv_id, turn_idx, text FROM base
        WHERE CAST(substring(conv_id, 2) AS INT) % 97 = 3),
u AS (SELECT * FROM base UNION ALL SELECT * FROM dup),
h AS (SELECT conv_id,
  sha256(rtrim(coalesce(CAST(turn_idx AS VARCHAR),
                        'DEFAULT_REPLACEMENT_STRING'))
      || rtrim(coalesce(CAST(text AS VARCHAR),
                        'DEFAULT_REPLACEMENT_STRING'))) AS hh
  FROM u),
fp AS (SELECT conv_id, count(*) AS n_rows,
  CAST(bit_xor(('0x' || substr(hh, 1, 15))::BIGINT) AS BIGINT) AS fp_lo,
  CAST(bit_xor(('0x' || substr(hh, 16, 15))::BIGINT) AS BIGINT) AS fp_hi
  FROM h GROUP BY 1),
r AS (SELECT conv_id, n_rows, fp_lo, fp_hi,
  row_number() OVER (PARTITION BY n_rows, fp_lo, fp_hi
                     ORDER BY conv_id) AS keep_rank
  FROM fp)
SELECT conv_id, n_rows, fp_lo, fp_hi, keep_rank
FROM r WHERE keep_rank > 1 ORDER BY conv_id
"""

def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        minhash_signatures,
        shingles,
    )

    docs = spark.table("documents")
    sh = shingles(docs, "doc_id", "text", k=3)
    return minhash_signatures(sh, num_hashes=4).orderBy("id")


def _minhash_oracle_mins(num_hashes: int) -> list[str]:
    """DuckDB replay of operators.dedup.minhash_signatures: same
    (a_j, b_j) literals (imported from the operator module, so the two
    engines cannot drift) over the identical 60-bit md5-prefix base."""
    from professional_services_data_validator_spark.operators.dedup import (
        MINHASH_P,
        minhash_coeffs,
    )

    h = (
        "(CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) "
        f"% {MINHASH_P})"
    )
    out = []
    for j in range(num_hashes):
        a, b = minhash_coeffs(j)
        out.append(
            f"min(({a} * {h} + {b}) % {MINHASH_P}) AS mh_{j}"
        )
    return out


def _oracle_band_union(num_hashes: int, bands: int) -> str:
    """DuckDB replay of operators.dedup.lsh_candidates' banding: one
    SELECT per band, band_hash = md5 of the band's r = num_hashes//bands
    signature rows pipe-joined — byte-identical to the Spark side."""
    r = num_hashes // bands
    # round 5: band key = 60-bit md5 prefix as BIGINT (the Spark side
    # shuffles 8-byte longs instead of 32-char hex; identical reduction
    # here so the bucket structure cannot drift)
    return "\n  UNION ALL ".join(
        "SELECT id, {b} AS band_idx, "
        "CAST(('0x' || substring(md5(concat_ws('|', {cols})), 1, 15)) "
        "AS BIGINT) AS band_hash FROM sig".format(
            b=b, cols=", ".join(f"mh_{b * r + j}" for j in range(r))
        )
        for b in range(bands)
    )


_SQL_MINHASH = """
WITH toks AS (
  SELECT doc_id AS id, regexp_split_to_array(trim(text), ' +') AS t FROM documents),
sh AS (
  SELECT DISTINCT id,
    array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM toks, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i))
SELECT id,
  {mins}
FROM sh GROUP BY id ORDER BY id
""".format(mins=",\n  ".join(_minhash_oracle_mins(4)))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.table("documents").filter(F.col("doc_id") < 100)
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", k=2, threshold=0.05
    ).orderBy("id_a", "id_b")


_SQL_NGRAM_JACCARD = """
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
toks AS (SELECT doc_id AS id, regexp_split_to_array(trim(text), ' +') AS t FROM docs),
sh AS (
  SELECT DISTINCT id,
    array_to_string(list_slice(t, i + 1, i + 2), ' ') AS shingle
  FROM toks, UNNEST(range(0, greatest(len(t) - 2, 0) + 1)) AS u(i)),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id)
SELECT id_a, id_b,
  round(n_common * 1.0 / (sa.sz + sb.sz - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE n_common * 1.0 / (sa.sz + sb.sz - n_common) >= 0.05
ORDER BY id_a, id_b
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import simhash

    return simhash(spark.table("documents"), "doc_id", "text", bits=16).orderBy(
        "id"
    )


_SQL_SIMHASH = """
WITH tok AS (
  SELECT doc_id AS id, md5(u.t) AS h
  FROM documents, UNNEST(regexp_split_to_array(trim(text), ' +')) AS u(t)),
votes AS (
  SELECT id, count(*) AS n,
    {sums}
  FROM tok GROUP BY id)
SELECT id, CAST({bits_expr} AS BIGINT) AS simhash FROM votes ORDER BY id
""".format(
    sums=",\n    ".join(
        f"sum(ascii(substring(h, {i + 1}, 1)) % 2) AS s{i}" for i in range(16)
    ),
    bits_expr=" + ".join(
        f"(CASE WHEN s{i} * 2 > n THEN {2**i} ELSE 0 END)" for i in range(16)
    ),
)


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    return brute_force_topk(emb, q, k=5).select(
        "query_id", "neighbor_id", "rank"
    ).orderBy("query_id", "rank")


# rank only (not score): float cosine ranks are stable cross-engine but the
# raw score's last bits are not; list_cosine_similarity vs explicit fold
# agree to ~1e-15, far below rank-flip risk on random embeddings.
_SQL_EMBEDDING_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, e.embedding) AS s
  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id)
      AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= 5 ORDER BY query_id, rank
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        token_count,
    )

    return token_count(spark.table("documents"), "doc_id", "text").orderBy("id")


_SQL_TOKEN_COUNT = """
WITH t AS (SELECT doc_id AS id, regexp_split_to_array(trim(text), ' +') AS toks,
                  length(text) AS n_chars
           FROM documents)
SELECT id,
  CASE WHEN array_to_string(toks, '') = '' THEN 0 ELSE len(toks) END
    AS n_tokens,
  CAST(coalesce(list_sum(list_transform(toks,
        w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT)
    AS bpe_est,
  n_chars
FROM t ORDER BY id
"""


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        language_id,
    )

    return language_id(spark.table("documents"), "doc_id", "text").orderBy("id")


def _langid_hits_sql(words):
    # token-membership count, mirroring the Spark single-pass filter
    lits = ", ".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter(toks, t -> t IN ({lits}))) AS BIGINT)"


_SQL_LANGID = """
WITH p0 AS (SELECT doc_id AS id,
            regexp_split_to_array(trim(text), ' +') AS toks FROM documents),
scored AS (
  {unions}
),
ranked AS (SELECT id, lang, hits,
    row_number() OVER (PARTITION BY id ORDER BY hits DESC, lang DESC) AS rn
  FROM scored)
SELECT id, lang AS pred_lang, hits AS best_hits
FROM ranked WHERE rn = 1 ORDER BY id
""".format(
    unions="\n  UNION ALL ".join(
        "SELECT id, '{lang}' AS lang, {expr} AS hits FROM p0".format(
            expr=_langid_hits_sql(words), lang=lang
        )
        for lang, words in sorted(
            __import__(
                "professional_services_data_validator_spark.operators.text",
                fromlist=["LANG_PROFILES"],
            ).LANG_PROFILES.items()
        )
    )
)


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        fingerprint,
    )

    return fingerprint(spark.table("documents"), "doc_id", "text").orderBy("id")


_SQL_FINGERPRINT = """
WITH toks AS (SELECT doc_id AS id, regexp_split_to_array(trim(text), ' +') AS t
              FROM documents),
grams AS (
  SELECT id, list_sort(list_transform(
    range(0, greatest(len(t) - 4, 0) + 1),
    i -> md5(array_to_string(list_slice(t, i + 1, i + 4), ' ')))) AS g
  FROM toks)
SELECT id, md5(array_to_string(list_slice(g, 1, 4), '|')) AS fingerprint
FROM grams ORDER BY id
"""


_TRAINING_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "conv_dedup_exact": q_conv_dedup,
    "minhash_signatures": q_minhash_signatures,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "simhash_16": q_simhash,
    "embedding_topk": q_embedding_topk,
    "token_count": q_token_count,
    "language_id": q_langid,
    "doc_fingerprint": q_fingerprint,
}

_TRAINING_ORACLES = {
    "dedup_exact": _SQL_DEDUP_EXACT,
    "conv_dedup_exact": _SQL_CONV_DEDUP,
    "minhash_signatures": _SQL_MINHASH,
    "ngram_jaccard_pairs": _SQL_NGRAM_JACCARD,
    "simhash_16": _SQL_SIMHASH,
    "embedding_topk": _SQL_EMBEDDING_TOPK,
    "token_count": _SQL_TOKEN_COUNT,
    "language_id": _SQL_LANGID,
    "doc_fingerprint": _SQL_FINGERPRINT,
}


# ===========================================================================
# Additional coverage: filters, calc chains, vectorized drift, IVF ANN
# ===========================================================================

def q_filtered_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FilterField family in one validation: custom SQL + isin + range
    (reference query_builder.py:145-197)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark import run_validation
    from professional_services_data_validator_spark.config import FilterSpec

    cfg = ValidationConfig(
        validation_type=consts.COLUMN_VALIDATION,
        source_table="transcripts",
        target_table="transcripts_target",
        aggregates=[
            AggregateSpec("count"),
            AggregateSpec("sum", "turn_idx"),
        ],
        filters=[
            FilterSpec("custom", source="turn_idx >= 2"),
            FilterSpec("isin", column="role", value=["user", "assistant"]),
            FilterSpec("less_than", column="turn_idx", value=50),
        ],
    )
    rep = run_validation(
        cfg, spark.table("transcripts"), spark.table("transcripts_target")
    )
    return rep.select(
        "validation_name", "source_agg_value", "target_agg_value",
        "validation_status",
    ).orderBy("validation_name")


_SQL_FILTERED_VALIDATION = f"""{_CTES},
s AS (SELECT count(*) AS c, sum(turn_idx) AS st FROM transcripts
      WHERE turn_idx >= 2 AND role IN ('user','assistant') AND turn_idx < 50),
t AS (SELECT count(*) AS c, sum(turn_idx) AS st FROM transcripts_target
      WHERE turn_idx >= 2 AND role IN ('user','assistant') AND turn_idx < 50)
SELECT 'count' AS validation_name, CAST(s.c AS VARCHAR) AS source_agg_value,
       CAST(t.c AS VARCHAR) AS target_agg_value,
       CASE WHEN s.c = t.c THEN 'success' ELSE 'fail' END AS validation_status
FROM s, t
UNION ALL
SELECT 'sum__turn_idx', CAST(s.st AS VARCHAR), CAST(t.st AS VARCHAR),
       CASE WHEN s.st = t.st THEN 'success' ELSE 'fail' END
FROM s, t
ORDER BY validation_name
"""


def q_ci_row_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive + rstrip calc chain: upper() folded into the hash
    (reference --case-insensitive-match, config_manager.py:1067-1068)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.functions.calculated import (
        build_row_hash,
    )

    docs = spark.table("documents")
    flipped = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0, F.upper(F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    h = build_row_hash(
        flipped, ["text", "lang"], case_insensitive=True, trim_strings=True
    )
    return h.select(F.col("doc_id"), F.col("hash__all")).orderBy("doc_id")


_SQL_CI_ROW_HASH = """
SELECT doc_id,
  sha256(
    upper(rtrim(coalesce(CASE WHEN doc_id % 2 = 0 THEN upper(text)
                              ELSE text END, 'DEFAULT_REPLACEMENT_STRING')))
    || upper(rtrim(coalesce(lang, 'DEFAULT_REPLACEMENT_STRING')))
  ) AS hash__all
FROM documents ORDER BY doc_id
"""


def q_drift_grouped_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day KS+PSI via Arrow-batched applyInPandas (BASELINE-mandated
    vectorized kernel). Oracle: the same statistics computed with the
    exact SQL formulation — the pandas kernel must agree with SQL."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import (
        drift_grouped,
    )

    out = drift_grouped(
        spark.table("transcripts"),
        spark.table("transcripts_target"),
        F.date_format("ts", "yyyy-MM-dd"),
        F.length("text"),
        F.col("role"),
    )
    return out.select(
        "group_key",
        F.round("ks_stat", 6).alias("ks_stat"),
        "n_source",
        "n_target",
        F.round("psi", 6).alias("psi"),
    ).orderBy("group_key")


_SQL_DRIFT_GROUPED = f"""{_CTES},
u AS (
  SELECT g, v, sum(ns) AS n_s, sum(nt) AS n_t FROM (
    SELECT strftime(ts, '%Y-%m-%d') AS g, length(text) AS v, 1 AS ns, 0 AS nt
    FROM transcripts
    UNION ALL
    SELECT strftime(ts, '%Y-%m-%d'), length(text), 0, 1
    FROM transcripts_target) z
  GROUP BY g, v),
c AS (SELECT g,
   sum(n_s) OVER (PARTITION BY g ORDER BY v) AS cs,
   sum(n_t) OVER (PARTITION BY g ORDER BY v) AS ct,
   sum(n_s) OVER (PARTITION BY g) AS tot_s,
   sum(n_t) OVER (PARTITION BY g) AS tot_t FROM u),
ks AS (SELECT g, round(max(abs(cs * 1.0 / tot_s - ct * 1.0 / tot_t)), 6)
         AS ks_stat,
       max(tot_s) AS n_source, max(tot_t) AS n_target
       FROM c GROUP BY g),
r AS (
  SELECT g, v, sum(ns) AS n_s, sum(nt) AS n_t FROM (
    SELECT strftime(ts, '%Y-%m-%d') AS g, role AS v, 1 AS ns, 0 AS nt
    FROM transcripts
    UNION ALL
    SELECT strftime(ts, '%Y-%m-%d'), role, 0, 1 FROM transcripts_target) z
  GROUP BY g, v),
rt AS (SELECT g, sum(n_s) AS ts, sum(n_t) AS tt FROM r GROUP BY g),
p AS (SELECT r.g,
        greatest(n_s * 1.0 / ts, 1e-6) AS p,
        greatest(n_t * 1.0 / tt, 1e-6) AS q
      FROM r JOIN rt ON r.g = rt.g),
psi AS (SELECT g, round(sum((p - q) * ln(p / q)), 6) AS psi FROM p GROUP BY g)
SELECT ks.g AS group_key,
       CAST(ks.ks_stat AS DOUBLE) AS ks_stat,
       CAST(ks.n_source AS BIGINT) AS n_source,
       CAST(ks.n_target AS BIGINT) AS n_target,
       CAST(psi.psi AS DOUBLE) AS psi
FROM ks JOIN psi ON ks.g = psi.g
ORDER BY group_key
"""


def q_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF two-stage ANN (label-centroid coarse quantizer, nprobe=3)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    return ivf_topk(emb, q, k=5, nprobe=3).select(
        "query_id", "neighbor_id", "rank"
    ).orderBy("query_id", "rank")


_SQL_EMBEDDING_IVF = """
WITH pos AS (
  SELECT label, u.pos AS pos, embedding[u.pos] AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(pos)),
cents AS (
  SELECT label, list(m ORDER BY pos) AS centroid
  FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS m
        FROM pos GROUP BY label, pos) z
  GROUP BY label),
q AS (SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id < 8),
qc AS (
  SELECT q.query_id, q.qv, c.label,
    list_cosine_similarity(list_transform(q.qv, x -> CAST(x AS DOUBLE)),
                           c.centroid) AS cscore
  FROM q, cents c),
probes AS (
  SELECT query_id, qv, label FROM (
    SELECT query_id, qv, label,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY cscore DESC, label) AS crank
    FROM qc) z WHERE crank <= 3),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
    list_cosine_similarity(p.qv, e.embedding) AS s
  FROM probes p JOIN embeddings e ON e.label = p.label
  WHERE e.vec_id <> p.query_id),
ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id)
      AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= 5 ORDER BY query_id, rank
"""


_TRAINING_QUERIES.update(
    {
        "filtered_validation": q_filtered_validation,
        "ci_row_hash": q_ci_row_hash,
        "drift_grouped_vectorized": q_drift_grouped_vectorized,
        "embedding_ivf_ann": q_embedding_ivf,
    }
)
_TRAINING_ORACLES.update(
    {
        "filtered_validation": _SQL_FILTERED_VALIDATION,
        "ci_row_hash": _SQL_CI_ROW_HASH,
        "drift_grouped_vectorized": _SQL_DRIFT_GROUPED,
        "embedding_ivf_ann": _SQL_EMBEDDING_IVF,
    }
)

# ===========================================================================
# Round-1 widening: end-to-end LSH dedup, simhash near-dup pairs,
# quality scoring, multimodal metadata
# ===========================================================================

def q_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> minhash -> band
    bucket-join -> exact-Jaccard verify (Broder '97 / MMDS ch.3 shape).
    Engine-portable md5 hash family, so the whole pipeline has an exact
    DuckDB oracle."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        minhash_dedup_pairs,
    )

    return minhash_dedup_pairs(
        spark.table("documents"), "doc_id", "text",
        k=3, num_hashes=16, bands=4, threshold=0.5,
    ).orderBy("id_a", "id_b")


_SQL_LSH_DEDUP = """
WITH toks AS (SELECT doc_id AS id, regexp_split_to_array(trim(text), ' +') AS t
              FROM documents),
sh AS (
  SELECT DISTINCT id,
    array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM toks, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)),
sig AS (
  SELECT id,
    {mins}
  FROM sh GROUP BY id),
bands AS (
  {bands}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.id = c.id_a
  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b)
SELECT id_a, id_b,
  round(n_common * 1.0 / (sa.sz + sb.sz - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(n_common * 1.0 / (sa.sz + sb.sz - n_common), 6) >= 0.5
ORDER BY id_a, id_b
""".format(
    mins=",\n    ".join(_minhash_oracle_mins(16)),
    bands=_oracle_band_union(16, 4),
)


def q_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole chunk blocking (no quadratic
    self-join): two signatures within hamming d share one of d+1 chunks."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        simhash,
        simhash_near_pairs,
    )

    sim = simhash(spark.table("documents"), "doc_id", "text", bits=16)
    return simhash_near_pairs(sim, max_hamming=1, bits=16).orderBy(
        "id_a", "id_b"
    )


_SQL_SIMHASH_NEAR = """
WITH tok AS (
  SELECT doc_id AS id, md5(u.t) AS h
  FROM documents, UNNEST(regexp_split_to_array(trim(text), ' +')) AS u(t)),
votes AS (
  SELECT id, count(*) AS n,
    {sums}
  FROM tok GROUP BY id),
sims AS (SELECT id, CAST({bits_expr} AS BIGINT) AS simhash FROM votes),
chunks AS (
  SELECT id, simhash, u.i AS chunk_idx,
         (simhash >> (u.i * 8)) & 255 AS chunk_val
  FROM sims, UNNEST(range(0, 2)) AS u(i)),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
   AND a.id < b.id)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 1
ORDER BY id_a, id_b
""".format(
    sums=",\n    ".join(
        f"sum(ascii(substring(h, {i + 1}, 1)) % 2) AS s{i}" for i in range(16)
    ),
    bits_expr=" + ".join(
        f"(CASE WHEN s{i} * 2 > n THEN {2**i} ELSE 0 END)" for i in range(16)
    ),
)


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features + composite score (training-data op)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        quality_score,
    )

    return quality_score(spark.table("documents"), "doc_id", "text").orderBy(
        "id"
    )


_STOPS = ("the", "a", "of", "and", "to")

_SQL_DOC_QUALITY = """
WITH base AS (
  SELECT doc_id AS id, text,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), ' +')) END AS DOUBLE) AS n_toks,
    CAST(length(text)
         - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
      AS n_punct,
    CAST(length(text)
         - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
      AS n_upper,
    regexp_split_to_array(trim(text), ' +') AS toks
  FROM documents),
feats AS (
  SELECT id, n_toks,
    {stop_hits} AS stop_hits,
    CASE WHEN n_toks > 0 THEN n_chars / n_toks ELSE 0.0 END AS mean_word_len,
    CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
    CASE WHEN n_chars > 0 THEN n_upper / n_chars ELSE 0.0 END AS upper_ratio
  FROM base),
f2 AS (
  SELECT id, n_toks, mean_word_len, punct_ratio, upper_ratio,
    CASE WHEN n_toks > 0 THEN stop_hits / n_toks ELSE 0.0 END AS stop_ratio,
    least(n_toks / 20.0, 1.0) AS length_term,
    CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
         THEN 1.0 ELSE 0.5 END AS wordlen_term,
    1.0 - least(punct_ratio * 5, 0.5) AS punct_term
  FROM feats)
SELECT id,
  CAST(round(n_toks, 0) AS BIGINT) AS n_tokens,
  round(mean_word_len, 6) AS mean_word_len,
  round(punct_ratio, 6) AS punct_ratio,
  round(upper_ratio, 6) AS upper_ratio,
  round(stop_ratio, 6) AS stopword_ratio,
  round(length_term * wordlen_term * punct_term
        * (0.5 + least(stop_ratio * 2, 0.5)), 6) AS quality_score
FROM f2 ORDER BY id
""".format(
    # token-membership count, mirroring the Spark single-pass filter
    stop_hits="CAST(len(list_filter(toks, t -> t IN ({lits}))) AS DOUBLE)"
    .format(lits=", ".join(f"'{w}'" for w in _STOPS))
)


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payload column + typed metadata
    (byte length, digest) via built-ins — the declarative half of the
    decode pipeline (the codec kernel itself is the mapInPandas stub,
    unit-tested separately)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.multimodal import (
        synthesize_media,
    )

    media = synthesize_media(spark.table("documents"), "doc_id", "text")
    return media.select(
        "id",
        "modality",
        F.octet_length("payload").alias("payload_bytes"),
        # digest of the canonical lowercase-hex rendering: DuckDB's sha256
        # only takes VARCHAR, so both engines digest the hex string
        F.sha2(F.lower(F.hex(F.col("payload"))), 256).alias("payload_digest"),
    ).orderBy("id")


_SQL_MEDIA_METADATA = """
SELECT doc_id AS id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio'
       ELSE 'video' END AS modality,
  octet_length(unhex(md5(text))) AS payload_bytes,
  sha256(md5(text)) AS payload_digest
FROM documents ORDER BY id
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER resolution: LSH pairs -> connected components ->
    per-doc (cluster_id, cluster_size, is_canonical). The iterative
    min-label propagation is pure DataFrame ops (one message shuffle + one
    min-aggregate per round, localCheckpoint lineage cuts); the DuckDB
    oracle replays the whole pipeline including the component resolution
    as a recursive CTE."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        dedup_clusters,
    )

    return dedup_clusters(
        spark.table("documents"), "doc_id", "text",
        k=3, num_hashes=16, bands=4, threshold=0.5,
    ).orderBy("doc_id")


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same near-dup clustering contract resolved with the alternating
    large-star/small-star algorithm (Kiveris et al., SoCC '14) — the
    O(log n)-round component resolver for high-diameter dup graphs, where
    min-label propagation would need diameter-many rounds. Identical
    (doc_id, cluster_id, cluster_size, is_canonical) output, so it shares
    dedup_clusters' recursive-CTE oracle verbatim."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        dedup_clusters,
    )

    return dedup_clusters(
        spark.table("documents"), "doc_id", "text",
        k=3, num_hashes=16, bands=4, threshold=0.5, components="star",
    ).orderBy("doc_id")


# Same LSH CTE chain as _SQL_LSH_DEDUP (identical params), then: symmetric
# edge list -> recursive min-label reachability -> min per node = component
# id (graph is symmetric, so min reachable label == component min).
_SQL_DEDUP_CLUSTERS = """
WITH RECURSIVE toks AS (
  SELECT doc_id AS id, regexp_split_to_array(trim(text), ' +') AS t
  FROM documents),
sh AS (
  SELECT DISTINCT id,
    array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM toks, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)),
sig AS (
  SELECT id,
    {mins}
  FROM sh GROUP BY id),
bands AS (
  {bands}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.id = c.id_a
  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b),
pairs AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE round(n_common * 1.0 / (sa.sz + sb.sz - n_common), 6) >= 0.5),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
  (doc_id = cluster_id) AS is_canonical
FROM comp ORDER BY doc_id
""".format(
    mins=",\n    ".join(_minhash_oracle_mins(16)),
    bands=_oracle_band_union(16, 4),
)


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucketed train/val/test split over documents —
    reproducible across runs/engines/partitionings (md5 hex-prefix CASE, a
    map-only projection with zero shuffle). Keyed on doc_id here; keying on
    conv_id in a transcript pipeline keeps whole conversations in one split
    (the leakage guard)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.sampling import (
        hash_split,
    )

    return (
        hash_split(
            spark.table("documents"), ["doc_id"],
            {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42,
        )
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


def _hash_split_oracle_sql() -> str:
    from professional_services_data_validator_spark.operators.sampling import (
        split_thresholds,
    )

    t_train, t_val = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    return f"""
SELECT doc_id,
  CASE
    WHEN substring(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8)
         < '{t_train}' THEN 'train'
    WHEN substring(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8)
         < '{t_val}' THEN 'val'
    ELSE 'test'
  END AS split
FROM documents ORDER BY doc_id
"""


def q_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-split balance gate: after the conv_id-keyed hash split, each
    split's row share, whole-conversation count, and role-distribution JSD
    vs the corpus (0 = perfectly balanced; whole conversations land in one
    split, so per-split role mixes drift only by conversation composition).
    operators/sampling.py split_balance."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.sampling import (
        split_balance,
    )

    return split_balance(
        spark.table("transcripts"), ["conv_id"],
        {"train": 0.8, "val": 0.1, "test": 0.1},
        F.col("role"), seed=42,
    ).orderBy("split")


def _split_balance_oracle_sql() -> str:
    from professional_services_data_validator_spark.operators.sampling import (
        split_thresholds,
    )

    t_train, t_val = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    return f"""{_CTES},
s AS (SELECT conv_id, role,
  CASE
    WHEN substring(md5('42|' || CAST(conv_id AS VARCHAR)), 1, 8)
         < '{t_train}' THEN 'train'
    WHEN substring(md5('42|' || CAST(conv_id AS VARCHAR)), 1, 8)
         < '{t_val}' THEN 'val'
    ELSE 'test'
  END AS split
  FROM transcripts),
cat AS (SELECT split, role AS v, count(*) AS n FROM s GROUP BY 1, 2),
corpus AS (SELECT v, sum(n) AS n_c FROM cat GROUP BY 1),
grid AS (SELECT DISTINCT split FROM cat),
g AS (SELECT grid.split, corpus.v, corpus.n_c, coalesce(cat.n, 0) AS n
      FROM grid CROSS JOIN corpus
      LEFT JOIN cat ON cat.split = grid.split AND cat.v = corpus.v),
tots AS (SELECT split, sum(n) AS tot_s FROM g GROUP BY 1),
totc AS (SELECT sum(n_c) AS tot_c FROM corpus),
pq AS (SELECT g.split, n * 1.0 / tot_s AS p, n_c * 1.0 / tot_c AS q,
              tot_s, tot_c
       FROM g JOIN tots USING (split), totc),
jsd AS (SELECT split,
   round(0.5 * sum(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0))
                        ELSE 0 END)
       + 0.5 * sum(CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0))
                        ELSE 0 END), 6) AS cat_jsd,
   max(tot_s) AS n_rows, max(tot_c) AS tot_c FROM pq GROUP BY 1),
nk AS (SELECT split, count(DISTINCT conv_id) AS n_keys FROM s GROUP BY 1)
SELECT jsd.split, CAST(n_rows AS BIGINT) AS n_rows,
  CAST(n_keys AS BIGINT) AS n_keys,
  round(n_rows * 1.0 / tot_c, 6) AS row_frac, cat_jsd
FROM jsd JOIN nk USING (split) ORDER BY split
"""


_TRAINING_QUERIES["split_balance"] = q_split_balance


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: offset-binned (shard, bin_id) assignment filling a
    512-token budget, one parallel window per md5 shard (no global sort, no
    single-reducer window). Exact DuckDB oracle over the same windowed
    prefix sums."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        pack_sequences,
    )

    docs = spark.table("documents")
    t = F.trim(F.col("text"))
    toks = docs.select(
        "doc_id",
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, " +")))
        .alias("n_tokens"),
    )
    return pack_sequences(
        toks, "doc_id", "n_tokens", budget=512, num_shards=8
    ).orderBy("id")


_SQL_PACK_SEQUENCES = """
WITH toks AS (
  SELECT doc_id AS id,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), ' +')) END AS n_tokens
  FROM documents),
sh AS (
  SELECT id, n_tokens,
    CAST(('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
      AS shard
  FROM toks),
c AS (
  SELECT id, shard, n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      PARTITION BY shard ORDER BY id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM sh)
SELECT id, shard, CAST(floor(cum * 1.0 / 512) AS BIGINT) AS bin_id,
  CAST(cum % 512 AS BIGINT) AS offset_in_bin,
  CAST(n_tokens AS BIGINT) AS n_tokens
FROM c ORDER BY id
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 20 docs per lang, smallest
    md5(seed|doc_id) first. The two-pass threshold prefilter keeps the
    per-group window sort at O(n) survivors regardless of group size; the
    oracle replays the identical threshold, so parity is exact."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.sampling import (
        stratified_sample,
    )

    return (
        stratified_sample(
            spark.table("documents"), "lang", ["doc_id"], n_per_group=20,
        )
        .select("doc_id", "lang", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


_SQL_STRATIFIED_SAMPLE = """
WITH cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
h AS (
  SELECT doc_id, lang,
    CAST(('0x' || substring(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8))
         AS BIGINT) AS hv
  FROM documents),
pre AS (
  SELECT h.doc_id, h.lang, hv
  FROM h JOIN cnt USING (lang)
  WHERE hv < least(1.0, 80.0 / c) * 4294967296.0),
r AS (
  SELECT doc_id, lang,
    row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)
      AS sample_rank
  FROM pre)
SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
FROM r WHERE sample_rank <= 20 ORDER BY lang, sample_rank
"""


def q_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality: per-doc cross-entropy under the corpus's own
    unigram distribution (two vocab-bounded aggregates over one token
    explode; totals are two driver scalars). Oracle recomputes N/V as
    scalar subqueries — identical integers — and the same smoothed -ln
    average at 6dp."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        unigram_logperplexity,
    )

    return (
        unigram_logperplexity(spark.table("documents"), "doc_id", "text")
        .orderBy("id")
    )


_SQL_UNIGRAM_LOGPPL = """
WITH toks AS (
  SELECT doc_id AS id, t.token
  FROM documents,
    UNNEST(regexp_split_to_array(trim(text), ' +')) AS t(token)
  WHERE length(t.token) > 0),
counts AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
tot AS (
  SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v
  FROM counts),
scored AS (
  SELECT id, count(*) AS n_tokens,
    round(avg(-ln((c + 0.5) / (n + 0.5 * v))), 6) AS logppl
  FROM toks JOIN counts USING (token) CROSS JOIN tot
  GROUP BY id)
SELECT d.doc_id AS id,
  CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
  s.logppl
FROM documents d LEFT JOIN scored s ON s.id = d.doc_id
ORDER BY id
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= 2 distinct word
    3-gram shingles with any 'benchmark' doc (docs with doc_id % 37 == 0
    stand in for an eval set; the rest are the corpus). Benchmark side is
    broadcast twice — the exploded corpus-shingle stream never shuffles;
    the only exchange carries (doc, bench) hit pairs."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        decontaminate,
    )

    docs = spark.table("documents")
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    bench = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return decontaminate(
        corpus, bench, "doc_id", "text", "bench_id", "text",
        k=3, min_overlap=2,
    ).orderBy("doc_id", "bench_id")


_SQL_DECONTAMINATE = """
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 37 <> 0),
bench AS (SELECT doc_id AS bench_id, text FROM documents
          WHERE doc_id % 37 = 0),
ctoks AS (SELECT doc_id AS id, regexp_split_to_array(trim(text), ' +') AS t
          FROM corpus),
csh AS (
  SELECT DISTINCT id,
    array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM ctoks, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)),
btoks AS (SELECT bench_id AS id, regexp_split_to_array(trim(text), ' +') AS t
          FROM bench),
bsh AS (
  SELECT DISTINCT id,
    array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM btoks, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)),
bsz AS (SELECT id AS bench_id, count(*) AS bench_ngrams FROM bsh
        GROUP BY id),
hits AS (
  SELECT c.id AS doc_id, b.id AS bench_id, count(*) AS n_overlap
  FROM csh c JOIN bsh b ON b.shingle = c.shingle
  GROUP BY c.id, b.id
  HAVING count(*) >= 2)
SELECT doc_id, bench_id, n_overlap, bench_ngrams,
  round(n_overlap * 1.0 / bench_ngrams, 6) AS overlap_frac
FROM hits JOIN bsz USING (bench_id)
ORDER BY doc_id, bench_id
"""


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end curation: per-doc keep/drop verdicts over the
    training corpus — keep = canonical near-dup representative AND not
    contaminated by the eval set AND quality >= 0.55. Composes
    dedup_clusters (LSH -> connected components), decontaminate (broadcast
    n-gram overlap), and quality_score (single-pass built-ins); the DuckDB
    oracle replays the WHOLE pipeline including the iterative component
    resolution. This is the query a training-data pipeline runs nightly."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        decontaminate,
        dedup_clusters,
    )
    from professional_services_data_validator_spark.operators.text import (
        quality_score,
    )

    docs = spark.table("documents")
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    bench = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    clusters = dedup_clusters(
        corpus, "doc_id", "text", k=3, num_hashes=16, bands=4, threshold=0.5
    )
    contam = (
        decontaminate(
            corpus, bench, "doc_id", "text", "bench_id", "text",
            k=3, min_overlap=2,
        )
        .select("doc_id")
        .distinct()
        .withColumn("is_contaminated", F.lit(True))
    )
    qual = quality_score(corpus, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "quality_score"
    )
    contaminated = F.coalesce(
        F.col("is_contaminated"), F.lit(False)
    ).alias("is_contaminated")
    return (
        clusters.join(contam, "doc_id", "left")
        .join(qual, "doc_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            "is_canonical",
            contaminated,
            "quality_score",
            (
                F.col("is_canonical")
                & ~F.coalesce(F.col("is_contaminated"), F.lit(False))
                & (F.col("quality_score") >= 0.55)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


_TRAINING_QUERIES.update(
    {
        "corpus_curation": q_corpus_curation,
        "decontaminate": q_decontaminate,
        "hash_split": q_hash_split,
        "pack_sequences": q_pack_sequences,
        "stratified_sample": q_stratified_sample,
        "unigram_logppl": q_unigram_logppl,
        "dedup_clusters": q_dedup_clusters,
        "dedup_clusters_star": q_dedup_clusters_star,
        "lsh_dedup_pairs": q_lsh_dedup,
        "simhash_near_pairs": q_simhash_near,
        "doc_quality": q_doc_quality,
        "media_metadata": q_media_metadata,
    }
)
# Replays the whole curation pipeline: LSH dedup (k=3 shingles, 16 hashes,
# 4 bands, j>=0.5) -> recursive-CTE component resolution -> contamination
# (k=3, >=2 shared shingles vs the bench split) -> quality features -> the
# final keep verdict. Same params as q_corpus_curation.
_SQL_CORPUS_CURATION = """
WITH RECURSIVE
corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 37 <> 0),
bench AS (SELECT doc_id AS bench_id, text FROM documents
          WHERE doc_id % 37 = 0),
toks AS (SELECT doc_id AS id, regexp_split_to_array(trim(text), ' +') AS t
         FROM corpus),
sh AS (
  SELECT DISTINCT id,
    array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM toks, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)),
sig AS (
  SELECT id,
    {mins}
  FROM sh GROUP BY id),
bands AS (
  {bands}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.id = c.id_a
  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b),
pairs AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE round(n_common * 1.0 / (sa.sz + sb.sz - n_common), 6) >= 0.5),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
clus AS (
  SELECT doc_id, cluster_id,
    count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
    (doc_id = cluster_id) AS is_canonical
  FROM comp),
csh3 AS (
  SELECT DISTINCT id,
    array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM toks, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)),
btoks AS (SELECT bench_id AS id, regexp_split_to_array(trim(text), ' +') AS t
          FROM bench),
bsh3 AS (
  SELECT DISTINCT id,
    array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM btoks, UNNEST(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)),
contam AS (
  SELECT DISTINCT doc_id FROM (
    SELECT c.id AS doc_id, b.id AS bench_id
    FROM csh3 c JOIN bsh3 b ON b.shingle = c.shingle
    GROUP BY c.id, b.id
    HAVING count(*) >= 2)),
qbase AS (
  SELECT doc_id AS id,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), ' +')) END AS DOUBLE)
      AS n_toks,
    CAST(length(text)
         - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
      AS n_punct,
    regexp_split_to_array(trim(text), ' +') AS qtoks
  FROM corpus),
qfeats AS (
  SELECT id, n_toks,
    {stop_hits} AS stop_hits,
    CASE WHEN n_toks > 0 THEN n_chars / n_toks ELSE 0.0 END AS mean_word_len,
    CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio
  FROM qbase),
qf2 AS (
  SELECT id,
    CASE WHEN n_toks > 0 THEN stop_hits / n_toks ELSE 0.0 END AS stop_ratio,
    least(n_toks / 20.0, 1.0) AS length_term,
    CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
         THEN 1.0 ELSE 0.5 END AS wordlen_term,
    1.0 - least(punct_ratio * 5, 0.5) AS punct_term
  FROM qfeats),
qual AS (
  SELECT id,
    round(length_term * wordlen_term * punct_term
          * (0.5 + least(stop_ratio * 2, 0.5)), 6) AS quality_score
  FROM qf2)
SELECT cl.doc_id, cl.cluster_id, cl.cluster_size, cl.is_canonical,
  (ct.doc_id IS NOT NULL) AS is_contaminated,
  q.quality_score,
  (cl.is_canonical AND ct.doc_id IS NULL AND q.quality_score >= 0.55) AS keep
FROM clus cl
LEFT JOIN contam ct ON ct.doc_id = cl.doc_id
JOIN qual q ON q.id = cl.doc_id
ORDER BY cl.doc_id
""".format(
    mins=",\n    ".join(_minhash_oracle_mins(16)),
    bands=_oracle_band_union(16, 4),
    stop_hits="CAST(len(list_filter(qtoks, t -> t IN ({lits}))) AS DOUBLE)"
    .format(lits=", ".join(f"'{w}'" for w in _STOPS)),
)


_TRAINING_ORACLES.update(
    {
        "corpus_curation": _SQL_CORPUS_CURATION,
        "decontaminate": _SQL_DECONTAMINATE,
        "hash_split": _hash_split_oracle_sql(),
        "split_balance": _split_balance_oracle_sql(),
        "pack_sequences": _SQL_PACK_SEQUENCES,
        "stratified_sample": _SQL_STRATIFIED_SAMPLE,
        "unigram_logppl": _SQL_UNIGRAM_LOGPPL,
        "dedup_clusters": _SQL_DEDUP_CLUSTERS,
        # star and propagation resolvers share one output contract — and
        # therefore one oracle (the recursive CTE computes component minima)
        "dedup_clusters_star": _SQL_DEDUP_CLUSTERS,
        "lsh_dedup_pairs": _SQL_LSH_DEDUP,
        "simhash_near_pairs": _SQL_SIMHASH_NEAR,
        "doc_quality": _SQL_DOC_QUALITY,
        "media_metadata": _SQL_MEDIA_METADATA,
    }
)


def q_decoded_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode over mapInPandas (the multimodal codec path,
    BASELINE's 'vectorized pandas/Arrow UDFs, no per-row Python'). The stub
    kernel derives mean_px deterministically from payload bytes, so even the
    Python-kernel path is oracle-checkable: DuckDB recomputes the byte mean
    from the md5 hex."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.multimodal import (
        decode_media,
        synthesize_media,
    )

    media = synthesize_media(spark.table("documents"), "doc_id", "text")
    return decode_media(media).select(
        "id", "modality", F.round("mean_px", 6).alias("mean_px")
    ).orderBy("id")


_SQL_DECODED_MEDIA = """
SELECT doc_id AS id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio'
       ELSE 'video' END AS modality,
  round(list_sum(list_transform(range(1, 17),
    i -> CAST('0x' || substring(md5(text), 2 * i - 1, 2) AS INT)))
    / 16.0 / 255.0, 6) AS mean_px
FROM documents ORDER BY id
"""


_TRAINING_QUERIES["decoded_media"] = q_decoded_media
_TRAINING_ORACLES["decoded_media"] = _SQL_DECODED_MEDIA


def q_decoded_media_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec path (round 3, VERDICT r2 #6): payloads are genuine
    uncompressed 24-bit BMPs built from a closed formula of doc_id; the
    mapInPandas kernel runs the real pure-Python BMP parser (magic/header
    validation + stride-aware pixel mean), and DuckDB recomputes the
    expected width/height/mean from the same formula — so the oracle checks
    the parser's actual decode output, not a fake."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.multimodal import (
        decode_media,
        synthesize_bmp,
    )

    media = synthesize_bmp(spark.table("documents"), "doc_id")
    return decode_media(media).select(
        "id", "width", "height",
        F.round("mean_px", 6).alias("mean_px"), "codec",
    ).orderBy("id")


_SQL_DECODED_MEDIA_BMP = """
SELECT doc_id AS id,
  CAST(doc_id % 13 + 1 AS INT) AS width,
  CAST(doc_id % 7 + 1 AS INT) AS height,
  round(list_sum(list_transform(
      range(0, (doc_id % 13 + 1) * (doc_id % 7 + 1) * 3),
      k -> (doc_id * 31 + k) % 256))
    / ((doc_id % 13 + 1) * (doc_id % 7 + 1) * 3) / 255.0, 6) AS mean_px,
  'bmp' AS codec
FROM documents ORDER BY id
"""


_TRAINING_QUERIES["decoded_media_bmp"] = q_decoded_media_bmp
_TRAINING_ORACLES["decoded_media_bmp"] = _SQL_DECODED_MEDIA_BMP


def q_resized_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize kernel (multimodal pipeline step): genuine 24-bit BMP
    payloads (closed formula of doc_id) are decoded to numpy pixel grids,
    nearest-neighbor resampled to 4x4 (vectorized fancy indexing, both up-
    and down-sampling since inputs range 1x1..13x7), and re-encoded.
    The DuckDB oracle replays the index map from the synthesis formula:
    output logical pixel (L, c, ch) reads input byte
    (h_in-1 - (L*h_in)//4)*w_in*3 + ((c*w_in)//4)*3 + ch of the BOTTOM-UP
    stored pixel stream whose k-th byte is (doc_id*31 + k) % 256 — so the
    oracle checks the kernel's actual resampling arithmetic, not just row
    plumbing."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.multimodal import (
        resize_images,
        synthesize_bmp,
    )

    media = synthesize_bmp(spark.table("documents"), "doc_id")
    return (
        resize_images(media, out_w=4, out_h=4)
        .select(
            "id", "in_w", "in_h", "out_w", "out_h",
            F.round("out_mean_px", 6).alias("out_mean_px"),
        )
        .orderBy("id")
    )


# k enumerates the 4*4*3 output pixel bytes: L = k//12, c = (k%12)//3,
# ch = k%3; logical row L of the top-down view is stored row h_in-1-L of
# the bottom-up BMP stream (synthesize_bmp writes pixel byte k as
# (doc_id*31 + k) % 256 in stored order, padding excluded).
_SQL_RESIZED_MEDIA = """
SELECT doc_id AS id,
  CAST(doc_id % 13 + 1 AS INT) AS in_w,
  CAST(doc_id % 7 + 1 AS INT) AS in_h,
  4 AS out_w, 4 AS out_h,
  round(list_sum(list_transform(range(0, 48), k ->
      (doc_id * 31 +
       ((doc_id % 7 + 1) - 1 - ((k // 12) * (doc_id % 7 + 1)) // 4)
         * (doc_id % 13 + 1) * 3
       + ((((k % 12) // 3) * (doc_id % 13 + 1)) // 4) * 3
       + k % 3) % 256))
    / (48 * 255.0), 6) AS out_mean_px
FROM documents ORDER BY id
"""


_TRAINING_QUERIES["resized_media"] = q_resized_media
_TRAINING_ORACLES["resized_media"] = _SQL_RESIZED_MEDIA


def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a TRAINED spherical k-means quantizer (Lloyd iterations
    as DataFrame ops, deterministic md5-seeded init, centroids rounded to
    KMEANS_ROUND_DP so the trained matrix is reproducible). Oracled since
    round 3: the deterministic centroids are retrained by an independent
    pure-Python replay (kmeans_centroids_local) and inlined as literals into
    a DuckDB SQL that replays assignment + nprobe + top-k — the same
    literal-inlining trick as the SRP planes (_srp_oracle_sql).

    Round 4 (VERDICT r3 #4): the quantizer trains on a deterministic
    512-row md5-sample (kmeans_centroids_sampled — one bounded Spark job +
    driver Lloyd, FAISS-style) instead of iters+1 full-corpus jobs; the
    oracle re-draws the identical sample."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.similarity import (
        ivf_kmeans_topk,
    )

    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    return ivf_kmeans_topk(
        emb, q, k=5, nprobe=3, n_clusters=10, iters=3,
        train_sample=KMEANS_TRAIN_SAMPLE,
    ).select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")


_TRAINING_QUERIES["embedding_kmeans_ann"] = q_embedding_kmeans


# contract-pinned quantizer training-sample size (Spark side and oracle must
# draw the same deterministic md5-sample)
KMEANS_TRAIN_SAMPLE = 512

_KMEANS_ORACLE_CACHE: dict[str, str] = {}


def _kmeans_oracle_sql(sf_dir: str | None = None) -> str:
    """DuckDB oracle for embedding_kmeans_ann.

    The k-means training is iterative, so the oracle can't be one static SQL
    string — instead the centroids are retrained by kmeans_centroids_local
    (an independent pure-Python Lloyd implementation that matches the Spark
    trainer bit-for-bit thanks to KMEANS_ROUND_DP rounding; parity asserted
    in tests/test_training_ops.py) and inlined as k x d literals. The SQL
    then independently replays assignment (argmax cosine vs the literal
    centroids), query probing (top-nprobe cells) and the top-k scan.
    Data-dependent, so it is generated per sf_dir: the driver compares at
    sf0.01 (the default); tests override via SPARK_GRAFT_TEST_SF_DIR.
    """
    import math

    import duckdb

    from professional_services_data_validator_spark.operators.similarity import (
        kmeans_centroids_local,
    )

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"
    )
    if sf_dir in _KMEANS_ORACLE_CACHE:
        return _KMEANS_ORACLE_CACHE[sf_dir]
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    # identical deterministic md5-sample as kmeans_centroids_sampled (the
    # Spark trainer): smallest KMEANS_TRAIN_SAMPLE md5(id) rows
    import hashlib

    rows = sorted(
        rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest()
    )[:KMEANS_TRAIN_SAMPLE]
    centers = kmeans_centroids_local(rows, n_clusters=10, iters=3)
    score_exprs = []
    for c in centers:
        lits = ", ".join(repr(float(x)) for x in c)
        norm_c = math.sqrt(sum(x * x for x in c)) or 1.0
        score_exprs.append(
            f"list_dot_product(e, [{lits}]) / "
            f"(sqrt(list_dot_product(e, e)) * {norm_c!r})"
        )
    cs = ",\n      ".join(score_exprs)
    sql = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings),
scored AS (
  SELECT vec_id, e,
    [ {cs} ] AS cs
  FROM v),
assigned AS (
  SELECT vec_id, e, list_position(cs, list_max(cs)) - 1 AS c FROM scored),
probes AS (
  SELECT query_id, qv, c FROM (
    SELECT s.vec_id AS query_id, s.e AS qv, u.c AS c,
      row_number() OVER (PARTITION BY s.vec_id
                         ORDER BY s.cs[u.c + 1] DESC, u.c) AS crank
    FROM scored s, UNNEST(range(0, {len(centers)})) AS u(c)
    WHERE s.vec_id < 8) z
  WHERE crank <= 3),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
    list_cosine_similarity(p.qv, a.e) AS s
  FROM probes p JOIN assigned a ON a.c = p.c
  WHERE a.vec_id <> p.query_id),
ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id)
      AS rank
  FROM cand)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= 5 ORDER BY query_id, rank
"""
    _KMEANS_ORACLE_CACHE[sf_dir] = sql
    return sql


# ===========================================================================
# Round-2 widening: TF-IDF weighting + SRP embedding near-dup
# ===========================================================================

def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency weighting (round-1 gap): top-3 TF-IDF terms per
    document, rank computed on the rounded score so cross-engine ties break
    identically on the token."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        tfidf_top_terms,
    )

    return tfidf_top_terms(
        spark.table("documents"), "doc_id", "text", top_k=3
    ).orderBy("id", "rank")


_SQL_TFIDF = """
WITH toks AS (
  SELECT doc_id AS id, u.t AS token
  FROM documents, UNNEST(regexp_split_to_array(trim(text), ' +')) AS u(t)
  WHERE u.t <> ''),
tf AS (SELECT id, token, count(*) AS tf FROM toks GROUP BY id, token),
dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT id, token, round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
  FROM tf JOIN dft USING (token), nd),
ranked AS (
  SELECT id, token, tfidf,
    row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, token) AS rank
  FROM scored)
SELECT id, rank, token, CAST(tfidf AS DOUBLE) AS tfidf
FROM ranked WHERE rank <= 3 ORDER BY id, rank
"""


def q_srp_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via sign-random-projection LSH: pigeonhole
    chunk blocking on the 16-bit SRP signature (bucketed equi-join, never
    the quadratic all-pairs), exact-cosine verification on candidates only
    (Charikar '02 SRP; same blocking shape as simhash_near_pairs)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.similarity import (
        srp_near_pairs,
    )

    return srp_near_pairs(
        spark.table("embeddings"), bits=16, seed=42,
        max_hamming=3, min_cosine=0.2,
    ).orderBy("id_a", "id_b")


def _srp_oracle_sql() -> str:
    from professional_services_data_validator_spark.operators.similarity import (
        srp_planes,
    )

    planes = srp_planes(64, 16, 42)
    bit_terms = []
    for b, plane in enumerate(planes):
        lits = ", ".join(f"{float(x)}" for x in plane)
        bit_terms.append(
            f"(CASE WHEN list_dot_product("
            f"list_transform(embedding, x -> CAST(x AS DOUBLE)), "
            f"[{lits}]) >= 0 THEN {2 ** b} ELSE 0 END)"
        )
    sig_expr = " + ".join(bit_terms)
    return f"""
WITH sig AS (
  SELECT vec_id AS id, embedding, CAST({sig_expr} AS BIGINT) AS srp_sig
  FROM embeddings),
chunks AS (
  SELECT id, srp_sig, u.i AS chunk_idx,
         (srp_sig >> (u.i * 4)) % 16 AS chunk_val
  FROM sig, UNNEST(range(0, 4)) AS u(i)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
   AND a.id < b.id),
verified AS (
  SELECT c.id_a, c.id_b,
    CAST(bit_count(xor(sa.srp_sig, sb.srp_sig)) AS INT) AS hamming,
    round(list_cosine_similarity(
      list_transform(sa.embedding, x -> CAST(x AS DOUBLE)),
      list_transform(sb.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
  FROM cand c
  JOIN sig sa ON sa.id = c.id_a
  JOIN sig sb ON sb.id = c.id_b)
SELECT id_a, id_b, hamming, CAST(cos AS DOUBLE) AS cos
FROM verified WHERE hamming <= 3 AND cos >= 0.2
ORDER BY id_a, id_b
"""


def q_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-side near-dup CLUSTERS: SRP candidate pairs (same params
    as srp_embedding_near_pairs) -> connected components -> per-vector
    (cluster_id, cluster_size, is_canonical) — the embedding twin of
    dedup_clusters, sharing the same component-resolution operator."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        cluster_assignments,
        connected_components,
    )
    from professional_services_data_validator_spark.operators.similarity import (
        srp_near_pairs,
    )

    emb = spark.table("embeddings")
    pairs = srp_near_pairs(
        emb, bits=16, seed=42, max_hamming=3, min_cosine=0.2
    ).select("id_a", "id_b")
    comp = connected_components(pairs, emb.select("vec_id"), id_col="vec_id")
    return cluster_assignments(comp, "vec_id").orderBy("vec_id")


def _embedding_cluster_oracle_sql() -> str:
    """SRP CTE chain (identical params to _srp_oracle_sql) + the recursive
    component resolution — the same literal-planes trick, extended with the
    dedup_clusters recursion."""
    base = _srp_oracle_sql()
    head, tail = base.rsplit("SELECT id_a, id_b, hamming,", 1)
    assert "ORDER BY" in tail
    return (
        "WITH RECURSIVE "
        + head.strip()[len("WITH "):]
        + """,
pairs AS (
  SELECT id_a, id_b FROM verified WHERE hamming <= 3 AND cos >= 0.2),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(id, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
comp AS (SELECT id AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
SELECT vec_id, cluster_id,
  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
  (vec_id = cluster_id) AS is_canonical
FROM comp ORDER BY vec_id
"""
    )


_TRAINING_QUERIES["tfidf_top_terms"] = q_tfidf
_TRAINING_ORACLES["tfidf_top_terms"] = _SQL_TFIDF
_TRAINING_QUERIES["srp_embedding_near_pairs"] = q_srp_near
_TRAINING_ORACLES["srp_embedding_near_pairs"] = _srp_oracle_sql()
_TRAINING_QUERIES["embedding_dedup_clusters"] = q_embedding_dedup_clusters
_TRAINING_ORACLES["embedding_dedup_clusters"] = _embedding_cluster_oracle_sql()


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Bench-harness variants of the headline queries: identical plans minus
    the final global orderBy (contract queries sort only so the driver's
    DuckDB comparison is deterministic; production validation at 10^12 turns
    writes results partitioned, never globally sorted — and orderBy's
    range-boundary sampling re-executes the expensive subtree)."""
    q = queries()
    q.update(
        {
            "row_hash_violations": _build_row_violations,
            "partition_checksum_compare": _build_partition_checksums,
            "snapshot_delta_rows": _build_snapshot_delta_rows,
            "snapshot_delta_detail": _build_snapshot_delta_detail,
            "snapshot_diff_by_day": _build_snapshot_diff_by_day,
            "conv_rollup_mismatches": _build_conv_rollup,
            "uniqueness_violations": _build_uniqueness,
            "referential_orphans": _build_referential,
            "salted_agg_parity": _build_salted_agg,
        }
    )
    return q


# ===========================================================================
# Round-3 additions: repetition stats, cross-doc span dedup, PII scrub,
# percentile profiles, chi-squared drift
# ===========================================================================

def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition filters (top-2-gram fraction,
    duplicate-5-gram fraction) over the documents corpus."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        repetition_stats,
    )

    return repetition_stats(
        spark.table("documents"), "doc_id", "text", dup_k=5
    ).orderBy("id")


_SQL_REPETITION = """
WITH toks AS (
  SELECT doc_id AS id, regexp_split_to_array(trim(text), ' +') AS t
  FROM documents),
bi AS (
  SELECT id, array_to_string(list_slice(t, i + 1, i + 2), ' ') AS g
  FROM toks, UNNEST(range(0, greatest(len(t) - 2, 0) + 1)) AS u(i)
  WHERE len(t) >= 2),
bi_c AS (SELECT id, g, count(*) AS c FROM bi GROUP BY id, g),
bi_a AS (SELECT id, sum(c) AS total, max(c) AS top_c FROM bi_c GROUP BY id),
kg AS (
  SELECT id, array_to_string(list_slice(t, i + 1, i + 5), ' ') AS g
  FROM toks, UNNEST(range(0, greatest(len(t) - 5, 0) + 1)) AS u(i)
  WHERE len(t) >= 5),
kg_c AS (SELECT id, g, count(*) AS c FROM kg GROUP BY id, g),
kg_a AS (
  SELECT id, sum(c) AS total,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c
  FROM kg_c GROUP BY id)
SELECT d.doc_id AS id,
  CAST(coalesce(bi_a.total, 0) AS BIGINT) AS n_bigrams,
  round(coalesce(bi_a.top_c * 1.0 / bi_a.total, 0.0), 6) AS top_bigram_frac,
  CAST(coalesce(kg_a.total, 0) AS BIGINT) AS n_kgrams,
  round(coalesce(kg_a.dup_c * 1.0 / kg_a.total, 0.0), 6) AS dup_kgram_frac
FROM documents d
LEFT JOIN bi_a ON bi_a.id = d.doc_id
LEFT JOIN kg_a ON kg_a.id = d.doc_id
ORDER BY id
"""


def q_cross_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. cross-document duplicated-span metric: per doc, the
    fraction of its distinct word 8-grams shared with any other doc."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.dedup import (
        cross_doc_shingle_dups,
    )

    return cross_doc_shingle_dups(
        spark.table("documents"), "doc_id", "text", k=8
    ).orderBy("id")


_SQL_CROSS_DOC_SPANS = """
WITH toks AS (
  SELECT doc_id AS id, regexp_split_to_array(trim(text), ' +') AS t
  FROM documents),
sh AS (
  SELECT DISTINCT id,
    array_to_string(list_slice(t, i + 1, i + 8), ' ') AS shingle
  FROM toks, UNNEST(range(0, greatest(len(t) - 8, 0) + 1)) AS u(i)
  WHERE len(t) >= 8),
freq AS (SELECT shingle, count(*) AS n_docs FROM sh GROUP BY shingle),
per_doc AS (
  SELECT sh.id, count(*) AS n_shingles,
         sum(CASE WHEN freq.n_docs > 1 THEN 1 ELSE 0 END) AS n_shared
  FROM sh JOIN freq USING (shingle) GROUP BY sh.id)
SELECT d.doc_id AS id,
  CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles,
  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
  round(CASE WHEN coalesce(n_shingles, 0) > 0
        THEN n_shared * 1.0 / n_shingles ELSE 0.0 END, 6) AS shared_frac
FROM documents d LEFT JOIN per_doc ON per_doc.id = d.doc_id
ORDER BY id
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus. The synthetic corpus carries no PII,
    so the query plants deterministic emails + numeric ids (same
    engine-portable string arithmetic on both sides) and the operator must
    find and scrub exactly those."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        pii_scrub,
    )

    docs = spark.table("documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact agent"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com ref "),
            (F.col("doc_id") * 7919 + 1000003).cast("string"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit(" alt a.b-c@x.io")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scrub(docs, "doc_id", "text").orderBy("id")


_SQL_PII_SCRUB = r"""
WITH aug AS (
  SELECT doc_id,
    text || ' contact agent' || CAST(doc_id AS VARCHAR)
         || '@mail.example.com ref '
         || CAST(doc_id * 7919 + 1000003 AS VARCHAR)
         || CASE WHEN doc_id % 3 = 0 THEN ' alt a.b-c@x.io' ELSE '' END
      AS text
  FROM documents),
s1 AS (
  SELECT doc_id, text,
    len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS n_emails,
    regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+',
        '<PII>', 'g') AS t1
  FROM aug),
s2 AS (
  SELECT doc_id, text, n_emails,
    len(regexp_extract_all(t1, '[0-9]{6,}')) AS n_long_digits,
    regexp_replace(t1, '[0-9]{6,}', '<PII>', 'g') AS scrubbed
  FROM s1)
SELECT doc_id AS id,
  CAST(n_emails AS BIGINT) AS n_emails,
  CAST(n_long_digits AS BIGINT) AS n_long_digits,
  CAST(len(text) - len(scrubbed) AS BIGINT) AS n_chars_removed,
  md5(scrubbed) AS scrubbed_hash
FROM s2 ORDER BY id
"""


def q_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-role distribution profile of turn text length: count/min/max/
    avg/stddev + exact interpolated p50/p90/p99 in ONE groupBy pass.
    mode='approx' (percentile_approx) is the bounded-memory 100-TB path
    with the identical schema (tests assert the plan + closeness)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        numeric_profile,
    )

    t = spark.table("transcripts").select(
        "role", F.length("text").alias("text_len")
    )
    return numeric_profile(
        t, ["role"], "text_len", percentiles=(0.5, 0.9, 0.99), mode="exact"
    ).orderBy("role")


_SQL_NUMERIC_PROFILE = f"""{_CTES},
v AS (SELECT role, CAST(length(text) AS DOUBLE) AS x FROM transcripts)
SELECT role,
  count(x) AS n,
  min(x) AS vmin,
  max(x) AS vmax,
  round(avg(x), 6) AS avg,
  round(stddev_samp(x), 6) AS std,
  round(quantile_cont(x, 0.5), 6) AS p_50,
  round(quantile_cont(x, 0.9), 6) AS p_90,
  round(quantile_cont(x, 0.99), 6) AS p_99
FROM v GROUP BY role ORDER BY role
"""


def q_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared homogeneity drift on role frequencies, same
    skewed target as the PSI query so the statistic is nonzero."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import (
        chi2_categorical,
    )

    tgt = spark.table("transcripts_target").withColumn(
        "role",
        F.when(F.col("event_id") % 7 == 0, F.lit("assistant")).otherwise(
            F.col("role")
        ),
    )
    return chi2_categorical(spark.table("transcripts"), tgt, F.col("role"))


_SQL_DRIFT_CHI2 = f"""{_CTES},
tgt AS (SELECT CASE WHEN event_id % 7 = 0 THEN 'assistant' ELSE role END AS role
        FROM transcripts_target),
u AS (
  SELECT v, sum(ns) AS n_s, sum(nt) AS n_t FROM (
    SELECT role AS v, 1 AS ns, 0 AS nt FROM transcripts
    UNION ALL SELECT role, 0, 1 FROM tgt) z
  GROUP BY v),
tot AS (SELECT sum(n_s) AS ts, sum(n_t) AS tt FROM u),
cells AS (
  SELECT n_s * 1.0 AS o_s, n_t * 1.0 AS o_t,
         (n_s + n_t) * 1.0 / (ts + tt) AS p_col,
         ts * 1.0 AS ts, tt * 1.0 AS tt
  FROM u, tot)
SELECT
  round(sum(pow(o_s - ts * p_col, 2) / (ts * p_col)
          + pow(o_t - tt * p_col, 2) / (tt * p_col)), 6) AS chi2,
  CAST(count(*) - 1 AS BIGINT) AS dof,
  CAST(max(ts) AS BIGINT) AS n_source,
  CAST(max(tt) AS BIGINT) AS n_target
FROM cells
"""


_TRAINING_QUERIES.update(
    {
        "repetition_stats": q_repetition_stats,
        "cross_doc_spans": q_cross_doc_spans,
        "pii_scrub": q_pii_scrub,
        "numeric_profile_by_role": q_numeric_profile,
        "drift_chi2_role": q_drift_chi2,
    }
)
_TRAINING_ORACLES.update(
    {
        "repetition_stats": _SQL_REPETITION,
        "cross_doc_spans": _SQL_CROSS_DOC_SPANS,
        "pii_scrub": _SQL_PII_SCRUB,
        "numeric_profile_by_role": _SQL_NUMERIC_PROFILE,
        "drift_chi2_role": _SQL_DRIFT_CHI2,
    }
)


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative single-table expectations: seven rules, ONE aggregate
    pass (count distinct included via Expand). Thresholds chosen so both
    verdicts appear: tool is nullable by construction, so not_null__tool
    at 0.95 fails while the rest pass."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.expectations import (
        Expectation,
        run_expectations,
    )

    rules = [
        Expectation("not_null", "conv_id"),
        Expectation("not_null", "tool", threshold=0.95),
        Expectation("unique", "event_id"),
        Expectation("between", "turn_idx", lo=0, hi=10_000),
        Expectation("matches_regex", "role", pattern="^[a-z]+$"),
        Expectation(
            "isin", "role", values=("user", "assistant", "system", "tool")
        ),
        Expectation(
            "custom_sql",
            expr="length(text) > 0",
            threshold=0.99,
            name="nonempty_text",
        ),
    ]
    return run_expectations(spark.table("transcripts"), rules).orderBy(
        "rule_name"
    )


_SQL_EXPECTATIONS = f"""{_CTES},
w AS (
  SELECT count(*) AS n,
    avg(CASE WHEN conv_id IS NOT NULL THEN 1.0 ELSE 0.0 END) AS m_conv,
    avg(CASE WHEN tool IS NOT NULL THEN 1.0 ELSE 0.0 END) AS m_tool,
    count(DISTINCT event_id) * 1.0 AS d_event,
    count(event_id) * 1.0 AS t_event,
    avg(CASE WHEN turn_idx IS NOT NULL AND turn_idx >= 0
              AND turn_idx <= 10000 THEN 1.0 ELSE 0.0 END) AS m_between,
    avg(CASE WHEN role IS NOT NULL
              AND regexp_matches(role, '^[a-z]+$') THEN 1.0 ELSE 0.0 END)
      AS m_regex,
    avg(CASE WHEN role IN ('user','assistant','system','tool')
             THEN 1.0 ELSE 0.0 END) AS m_isin,
    avg(CASE WHEN length(text) > 0 THEN 1.0 ELSE 0.0 END) AS m_text
  FROM transcripts)
SELECT rule_name, rule_kind, "column", observed, threshold,
  CASE WHEN observed >= threshold THEN 'success' ELSE 'fail' END
    AS validation_status
FROM (
  SELECT 'not_null__conv_id' AS rule_name, 'not_null' AS rule_kind,
         'conv_id' AS "column", round(CAST(m_conv AS DOUBLE), 6) AS observed,
         CAST(1.0 AS DOUBLE) AS threshold FROM w
  UNION ALL SELECT 'not_null__tool', 'not_null', 'tool',
         round(CAST(m_tool AS DOUBLE), 6), CAST(0.95 AS DOUBLE) FROM w
  UNION ALL SELECT 'unique__event_id', 'unique', 'event_id',
         round(CAST(CASE WHEN t_event > 0 THEN d_event / t_event
                    ELSE 1.0 END AS DOUBLE), 6), CAST(1.0 AS DOUBLE) FROM w
  UNION ALL SELECT 'between__turn_idx', 'between', 'turn_idx',
         round(CAST(m_between AS DOUBLE), 6), CAST(1.0 AS DOUBLE) FROM w
  UNION ALL SELECT 'matches_regex__role', 'matches_regex', 'role',
         round(CAST(m_regex AS DOUBLE), 6), CAST(1.0 AS DOUBLE) FROM w
  UNION ALL SELECT 'isin__role', 'isin', 'role',
         round(CAST(m_isin AS DOUBLE), 6), CAST(1.0 AS DOUBLE) FROM w
  UNION ALL SELECT 'nonempty_text', 'custom_sql', NULL,
         round(CAST(m_text AS DOUBLE), 6), CAST(0.99 AS DOUBLE) FROM w
) ORDER BY rule_name
"""


_TRAINING_QUERIES["expectations_report"] = q_expectations
_TRAINING_ORACLES["expectations_report"] = _SQL_EXPECTATIONS


def q_conversation_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-turn transcript structure invariants: contiguous turn_idx,
    allowed opening role, allowed role transitions, tool-column/role
    consistency, timestamp monotonicity — the transcript-semantic checks no
    generic column/row validation covers. Real violations exist in the
    derived fixture (role-transition + opening-role)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.conversation import (
        conversation_checks,
    )

    return conversation_checks(spark.table("transcripts")).orderBy(
        "conv_id", "check"
    )


_SQL_CONVERSATION = f"""{_CTES},
per_conv AS (
  SELECT conv_id, count(*) AS n_turns,
         count(DISTINCT turn_idx) AS n_distinct_turns,
         min(turn_idx) AS min_turn, max(turn_idx) AS max_turn,
         arg_min(role, turn_idx) AS first_role,
         count(CASE WHEN (role = 'tool') != (tool IS NOT NULL)
               THEN 1 END) AS n_tool_mismatch
  FROM transcripts GROUP BY conv_id),
pairs AS (
  SELECT l.conv_id,
         count(CASE WHEN NOT (
             (l.role = 'system' AND r.role = 'user')
          OR (l.role = 'user' AND r.role = 'assistant')
          OR (l.role = 'assistant' AND r.role = 'user')
          OR (l.role = 'assistant' AND r.role = 'tool')
          OR (l.role = 'tool' AND r.role = 'assistant'))
          THEN 1 END) AS n_bad_transitions,
         count(CASE WHEN r.ts < l.ts THEN 1 END) AS n_ts_regressions
  FROM transcripts l JOIN transcripts r
    ON l.conv_id = r.conv_id AND r.turn_idx = l.turn_idx + 1
  GROUP BY l.conv_id),
j AS (
  SELECT per_conv.*, coalesce(n_bad_transitions, 0) AS n_bad,
         coalesce(n_ts_regressions, 0) AS n_reg
  FROM per_conv LEFT JOIN pairs USING (conv_id)),
melted AS (
  SELECT conv_id, n_turns, 'contiguous' AS "check",
         (min_turn != 0 OR max_turn != n_turns - 1
          OR n_distinct_turns != n_turns) AS failed,
         'turns [' || min_turn || '..' || max_turn || '] count ' || n_turns
           AS detail
  FROM j
  UNION ALL
  SELECT conv_id, n_turns, 'opening_role',
         first_role NOT IN ('user', 'system'),
         'opens with ' || first_role FROM j
  UNION ALL
  SELECT conv_id, n_turns, 'role_transition', n_bad > 0,
         n_bad || ' disallowed transition(s)' FROM j
  UNION ALL
  SELECT conv_id, n_turns, 'tool_role', n_tool_mismatch > 0,
         n_tool_mismatch || ' row(s) where tool presence != (role = ''tool'')'
  FROM j
  UNION ALL
  SELECT conv_id, n_turns, 'ts_monotonic', n_reg > 0,
         n_reg || ' timestamp regression(s)' FROM j)
SELECT conv_id, CAST(n_turns AS BIGINT) AS n_turns, "check", detail
FROM melted WHERE failed ORDER BY conv_id, "check"
"""


_TRAINING_QUERIES["conversation_checks"] = q_conversation_checks
_TRAINING_ORACLES["conversation_checks"] = _SQL_CONVERSATION


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column health profile. The fixture vectors are clean, so
    the query plants one defect of each class deterministically (NULL /
    truncated / NaN element / zero vector on vec_id 0-3) with the same
    engine-portable expressions the oracle uses — the operator must count
    exactly those and profile norms over the healthy rest."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.similarity import (
        embedding_stats,
    )

    vecs = spark.table("embeddings").select(
        "vec_id",
        F.when(F.col("vec_id") == 0, F.lit(None))
        .when(F.col("vec_id") == 1, F.slice(F.col("embedding"), 1, 10))
        .when(
            F.col("vec_id") == 2,
            F.concat(
                F.slice(F.col("embedding"), 1, 63),
                F.array(F.lit(float("nan")).cast("float")),
            ),
        )
        .when(
            F.col("vec_id") == 3,
            F.transform(F.col("embedding"), lambda x: F.lit(0.0).cast("float")),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    return embedding_stats(vecs, "vec_id", "embedding", expected_dim=64)


_SQL_EMBEDDING_STATS = """
WITH vecs AS (
  SELECT vec_id,
    CASE WHEN vec_id = 0 THEN NULL
         WHEN vec_id = 1 THEN embedding[1:10]
         WHEN vec_id = 2 THEN list_append(embedding[1:63],
                                          CAST('nan' AS FLOAT))
         WHEN vec_id = 3 THEN list_transform(embedding,
                                             x -> CAST(0.0 AS FLOAT))
         ELSE embedding END AS v
  FROM embeddings),
flagged AS (
  SELECT
    CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_null,
    CASE WHEN v IS NOT NULL AND len(v) != 64 THEN 1 ELSE 0 END AS wrong_dim,
    CASE WHEN v IS NOT NULL AND len(list_filter(v,
         x -> isnan(CAST(x AS DOUBLE)) OR abs(x) = CAST('inf' AS DOUBLE)))
         > 0 THEN 1 ELSE 0 END AS nonfin,
    list_sum(list_transform(v,
         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq
  FROM vecs),
scored AS (
  SELECT is_null, wrong_dim, nonfin,
    CASE WHEN is_null = 0 AND nonfin = 0 AND sq <= 1e-12
         THEN 1 ELSE 0 END AS zero_norm,
    CASE WHEN is_null = 0 AND wrong_dim = 0 AND nonfin = 0 AND sq > 1e-12
         THEN round(sqrt(sq), 6) END AS healthy_norm
  FROM flagged)
SELECT count(*) AS n_vecs,
  CAST(sum(is_null) AS BIGINT) AS n_null,
  CAST(sum(wrong_dim) AS BIGINT) AS n_wrong_dim,
  CAST(sum(nonfin) AS BIGINT) AS n_nonfinite,
  CAST(sum(zero_norm) AS BIGINT) AS n_zero_norm,
  round(avg(healthy_norm), 6) AS avg_norm,
  round(quantile_cont(healthy_norm, 0.5), 6) AS p50_norm
FROM scored
"""


_TRAINING_QUERIES["embedding_stats"] = q_embedding_stats
_TRAINING_ORACLES["embedding_stats"] = _SQL_EMBEDDING_STATS


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift between two snapshots of the vector
    column: centroid shift (cosine + L2 between per-dimension mean
    vectors) and norm-distribution PSI. Fixture 'new' snapshot: drop
    vec_id % 3 = 0 and re-scale vec_id % 7 = 0 by 1.1 (a partial
    re-embedding with a mis-scaled encoder). Bin edges are mid-centered
    on the unit norm (lo=0.875, width 0.05) so the ~1.0 norms never sit
    on a bin boundary — cross-engine float noise cannot flip a bin."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.similarity import (
        embedding_drift,
    )

    emb = spark.table("embeddings")
    v = F.col("embedding")
    scaled = F.transform(v, lambda x: (x.cast("double") * 1.1).cast("float"))
    new = emb.filter(F.col("vec_id") % 3 != 0).select(
        "vec_id",
        F.when(F.col("vec_id") % 7 == 0, scaled).otherwise(v).alias(
            "embedding"
        ),
    )
    return embedding_drift(
        emb, new, "embedding", n_bins=8, norm_lo=0.875, norm_hi=1.275
    )


_SQL_EMBEDDING_DRIFT = """
WITH o AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings),
n AS (
  SELECT vec_id,
    CASE WHEN vec_id % 7 = 0 THEN list_transform(embedding,
           x -> CAST(CAST(x AS DOUBLE) * 1.1 AS FLOAT))
         ELSE embedding END AS emb
  FROM embeddings WHERE vec_id % 3 <> 0),
n2 AS (SELECT vec_id, list_transform(emb, x -> CAST(x AS DOUBLE)) AS e
       FROM n),
om AS (SELECT i AS pos, avg(e[i + 1]) AS m_old
       FROM o, UNNEST(range(0, len(e))) AS u(i) GROUP BY 1),
nm AS (SELECT i AS pos, avg(e[i + 1]) AS m_new
       FROM n2, UNNEST(range(0, len(e))) AS u(i) GROUP BY 1),
cen AS (
  SELECT round(sum(m_old * m_new)
               / sqrt(sum(m_old * m_old) * sum(m_new * m_new)), 6)
           AS centroid_cosine,
         round(sqrt(sum((m_old - m_new) * (m_old - m_new))), 6)
           AS centroid_l2
  FROM om JOIN nm USING (pos)),
obin AS (
  SELECT CAST(least(greatest(floor(
    (round(sqrt(list_sum(list_transform(e, x -> x * x))), 6) - 0.875)
    / 0.05), 0), 7) AS INTEGER) AS bin FROM o),
nbin AS (
  SELECT CAST(least(greatest(floor(
    (round(sqrt(list_sum(list_transform(e, x -> x * x))), 6) - 0.875)
    / 0.05), 0), 7) AS INTEGER) AS bin FROM n2),
oc AS (SELECT bin, count(*) AS n_s FROM obin GROUP BY 1),
nc AS (SELECT bin, count(*) AS n_t FROM nbin GROUP BY 1),
j AS (SELECT coalesce(oc.n_s, 0) AS n_s, coalesce(nc.n_t, 0) AS n_t
      FROM oc FULL OUTER JOIN nc ON oc.bin = nc.bin),
tot AS (SELECT sum(n_s) AS ts, sum(n_t) AS tt FROM j),
p AS (SELECT greatest(n_s / ts, 1e-6) AS p, greatest(n_t / tt, 1e-6) AS q
      FROM j, tot),
ps AS (SELECT round(sum((p - q) * ln(p / q)), 6) AS norm_psi FROM p)
SELECT (SELECT count(*) FROM o) AS n_old,
       (SELECT count(*) FROM n2) AS n_new,
       centroid_cosine, centroid_l2, norm_psi
FROM cen, ps
"""

_TRAINING_QUERIES["embedding_drift"] = q_embedding_drift
_TRAINING_ORACLES["embedding_drift"] = _SQL_EMBEDDING_DRIFT


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the raw event log (6h gap): per-session
    summaries. ONE shuffle on user_id; lag + running counter share the
    window partitioning."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.temporal import (
        sessionize,
    )

    return sessionize(
        spark.table("events"), "user_id", "ts",
        gap_seconds=6 * 3600, order_tiebreak="event_id",
    ).orderBy("key", "session_idx")


_SQL_SESSIONIZE = """
WITH e AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep, ts
  FROM events),
lagged AS (
  SELECT user_id, ep, ts, event_id,
    lag(ep) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM e),
marked AS (
  SELECT user_id, ep, ts, event_id,
    CASE WHEN prev IS NULL OR ep - prev > 21600 THEN 1 ELSE 0 END AS is_new
  FROM lagged),
assigned AS (
  SELECT user_id, ep,
    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked)
SELECT user_id AS key, CAST(session_idx AS BIGINT) AS session_idx,
  count(*) AS n_events,
  min(ep) AS start_epoch, max(ep) AS end_epoch
FROM assigned GROUP BY user_id, session_idx
ORDER BY key, session_idx
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward inclusive): each purchase gets the latest click
    of the same user at or before it — tagged-union + per-key ordered
    window (Spark has no native ASOF JOIN; this is the O(n log n)-per-key
    construction, never the O(l x r) range join). Deterministic on ts ties
    via the event_id tiebreak, which the oracle replays."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.temporal import (
        asof_join,
    )

    ev = spark.table("events")
    out = asof_join(
        ev.filter("event_type = 'purchase'"),
        ev.filter("event_type = 'click'"),
        by="user_id", ts="ts",
        left_cols=["event_id"],
        right_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return out.select(
        "user_id", "event_id", "ts_epoch", "asof_ts_epoch",
        "asof_event_id", F.round("asof_value", 6).alias("asof_value"),
    ).orderBy("user_id", "event_id")


_SQL_ASOF = """
SELECT l.user_id, l.event_id,
  CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_epoch,
  r.asof_ts_epoch, r.asof_event_id, r.asof_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
LEFT JOIN LATERAL (
  SELECT CAST(floor(epoch(c.ts)) AS BIGINT) AS asof_ts_epoch,
         c.event_id AS asof_event_id,
         round(c.value, 6) AS asof_value
  FROM events c
  WHERE c.event_type = 'click' AND c.user_id = l.user_id AND c.ts <= l.ts
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
) r ON true
ORDER BY l.user_id, l.event_id
"""


_TRAINING_QUERIES["sessionize_events"] = q_sessionize
_TRAINING_ORACLES["sessionize_events"] = _SQL_SESSIONIZE
_TRAINING_QUERIES["asof_purchase_click"] = q_asof_join
_TRAINING_ORACLES["asof_purchase_click"] = _SQL_ASOF


def q_drift_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned 1-Wasserstein drift on turn text length per day — the
    magnitude-sensitive complement to the KS/PSI/chi2 set, same
    group-partitioned cumsum plan as drift_ks_binned_by_day."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import (
        emd_binned,
    )

    src = spark.table("transcripts").select(
        F.col("ts").cast("date").cast("string").alias("day"),
        F.length("text").alias("len"),
    )
    tgt = spark.table("transcripts_target").select(
        F.col("ts").cast("date").cast("string").alias("day"),
        F.length("text").alias("len"),
    )
    return emd_binned(
        src, tgt, F.col("len"), bin_width=1, group_cols=["day"]
    ).orderBy("day")


_SQL_DRIFT_EMD = f"""{_CTES},
s AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             length(text) AS v, count(*) AS n_s
      FROM transcripts GROUP BY 1, 2),
t AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             length(text) AS v, count(*) AS n_t
      FROM transcripts_target GROUP BY 1, 2),
j AS (SELECT coalesce(s.day, t.day) AS day, coalesce(s.v, t.v) AS v,
             coalesce(n_s, 0) AS n_s, coalesce(n_t, 0) AS n_t
      FROM s FULL OUTER JOIN t ON s.day = t.day AND s.v = t.v),
cum AS (
  SELECT day, v,
    lead(v) OVER (PARTITION BY day ORDER BY v) - v AS width,
    sum(n_s) OVER (PARTITION BY day ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS c_s,
    sum(n_t) OVER (PARTITION BY day ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS c_t,
    sum(n_s) OVER (PARTITION BY day) AS tot_s,
    sum(n_t) OVER (PARTITION BY day) AS tot_t
  FROM j)
SELECT day,
  round(sum(CASE WHEN width IS NOT NULL
        THEN abs(c_s * 1.0 / tot_s - c_t * 1.0 / tot_t) * width
        ELSE 0.0 END), 6) AS emd,
  CAST(max(tot_s) AS BIGINT) AS n_source,
  CAST(max(tot_t) AS BIGINT) AS n_target
FROM cum GROUP BY day ORDER BY day
"""


_TRAINING_QUERIES["drift_emd_by_day"] = q_drift_emd
_TRAINING_ORACLES["drift_emd_by_day"] = _SQL_DRIFT_EMD


def q_categorical_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column cardinality/frequency profile over the transcript
    columns: melt -> two-level agg (per-value counts, then per-column fold)
    so the exact distinct count shuffles one row per DISTINCT value, not
    per input row. ts is excluded from the profile set: Spark and DuckDB
    render timestamp->string with different fractional-second trimming, so
    its modal VALUE (not the counts) would diverge textually."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        categorical_profile,
    )

    return categorical_profile(
        spark.table("transcripts"),
        ["conv_id", "turn_idx", "role", "text", "tool"],
    )


def _categorical_profile_oracle_sql() -> str:
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    blocks = []
    for c in cols:
        blocks.append(f"""
SELECT '{c}' AS "column", s.n_distinct, s.n_null, t.top_value, t.top_count
FROM (
  SELECT CAST(count(*) FILTER (value IS NOT NULL) AS BIGINT) AS n_distinct,
         CAST(coalesce(sum(cnt) FILTER (value IS NULL), 0) AS BIGINT) AS n_null
  FROM (SELECT CAST({c} AS VARCHAR) AS value, count(*) AS cnt
        FROM transcripts GROUP BY 1)
) s CROSS JOIN (
  SELECT value AS top_value, CAST(cnt AS BIGINT) AS top_count
  FROM (SELECT CAST({c} AS VARCHAR) AS value, count(*) AS cnt
        FROM transcripts GROUP BY 1)
  WHERE value IS NOT NULL
  ORDER BY cnt DESC, value DESC LIMIT 1
) t""")
    return (
        _CTES
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(blocks)
        + '\n) ORDER BY "column"'
    )


def q_role_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical role->role Markov transition matrix under stable
    turn ordering (the BASELINE per-row invariant): adjacent pairs via the
    co-partitioned (conv_id, turn_idx+1) self-join, no window sort."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.conversation import (
        role_transition_matrix,
    )

    return role_transition_matrix(spark.table("transcripts"))


_SQL_ROLE_TRANSITIONS = f"""{_CTES},
pairs AS (
  SELECT a.role AS prev_role, b.role AS next_role
  FROM transcripts a
  JOIN transcripts b
    ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1),
cells AS (
  SELECT prev_role, next_role, count(*) AS n_pairs
  FROM pairs GROUP BY 1, 2)
SELECT prev_role, next_role, CAST(n_pairs AS BIGINT) AS n_pairs,
  round(n_pairs * 1.0 / sum(n_pairs) OVER (PARTITION BY prev_role), 6) AS p
FROM cells ORDER BY prev_role, next_role
"""


_TRAINING_QUERIES["categorical_profile"] = q_categorical_profile
_TRAINING_ORACLES["categorical_profile"] = _categorical_profile_oracle_sql()
_TRAINING_QUERIES["role_transitions"] = q_role_transitions
_TRAINING_ORACLES["role_transitions"] = _SQL_ROLE_TRANSITIONS


def q_drift_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence drift on role frequencies — the bounded,
    symmetric, epsilon-free member of the drift family (KS/PSI/chi2/EMD);
    same deterministic role skew as the PSI/chi2 queries so it's nonzero."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import (
        jensen_shannon,
    )

    tgt = spark.table("transcripts_target").withColumn(
        "role",
        F.when(F.col("event_id") % 7 == 0, F.lit("assistant")).otherwise(
            F.col("role")
        ),
    )
    return jensen_shannon(spark.table("transcripts"), tgt, F.col("role"))


_SQL_DRIFT_JSD = f"""{_CTES},
tgt AS (SELECT CASE WHEN event_id % 7 = 0 THEN 'assistant' ELSE role END AS role
        FROM transcripts_target),
u AS (
  SELECT v, sum(ns) AS n_s, sum(nt) AS n_t FROM (
    SELECT role AS v, 1 AS ns, 0 AS nt FROM transcripts
    UNION ALL SELECT role, 0, 1 FROM tgt) z
  GROUP BY v),
tot AS (SELECT sum(n_s) AS ts, sum(n_t) AS tt FROM u),
pq AS (SELECT n_s * 1.0 / ts AS p, n_t * 1.0 / tt AS q,
              ts, tt FROM u, tot)
SELECT
  round(0.5 * sum(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0))
                       ELSE 0.0 END)
      + 0.5 * sum(CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0))
                       ELSE 0.0 END), 6) AS jsd,
  CAST(max(ts) AS BIGINT) AS n_source,
  CAST(max(tt) AS BIGINT) AS n_target
FROM pq
"""


def q_frequent_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column top-5 heavy hitters over the low/medium-cardinality
    transcript columns (salted two-level top-k, exact; see
    operators/aggregates.py frequent_values)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        frequent_values,
    )

    return frequent_values(
        spark.table("transcripts"), ["role", "tool", "turn_idx"], k=5
    )


def _frequent_values_oracle_sql() -> str:
    blocks = []
    for c in ["role", "tool", "turn_idx"]:
        blocks.append(f"""
SELECT '{c}' AS "column", rank, value, cnt FROM (
  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, value DESC) AS INT)
           AS rank,
         value, cnt
  FROM (SELECT CAST({c} AS VARCHAR) AS value,
               CAST(count(*) AS BIGINT) AS cnt
        FROM transcripts WHERE {c} IS NOT NULL GROUP BY 1))
WHERE rank <= 5""")
    return (
        _CTES
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(blocks)
        + '\n) ORDER BY "column", rank'
    )


_TRAINING_QUERIES["drift_jsd_role"] = q_drift_jsd
_TRAINING_ORACLES["drift_jsd_role"] = _SQL_DRIFT_JSD
_TRAINING_QUERIES["frequent_values"] = q_frequent_values
_TRAINING_ORACLES["frequent_values"] = _frequent_values_oracle_sql()


def q_metric_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomalies on the per-role daily turn-count
    series — each day judged against ITS OWN prior 7 days (strictly-prior
    frame), the temporal complement to the two-sample drift queries. The
    validation-engine use: the same operator over the lineage table's
    per-partition metric history flags silently degrading partitions."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.temporal import (
        metric_anomalies,
    )

    daily = spark.table("transcripts").groupBy(
        "role", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_turns"))
    return metric_anomalies(
        daily, ["role"], "day", "n_turns",
        trailing_n=7, min_history=3, z_thresh=2.0,
    )


_SQL_METRIC_ANOMALY = f"""{_CTES},
daily AS (
  SELECT role, CAST(ts AS DATE) AS day, count(*) AS n
  FROM transcripts GROUP BY 1, 2),
base AS (
  SELECT role, day AS ts, CAST(n AS DOUBLE) AS value,
    avg(CAST(n AS DOUBLE)) OVER w AS bm,
    stddev_samp(CAST(n AS DOUBLE)) OVER w AS bs,
    count(n) OVER w AS np
  FROM daily
  WINDOW w AS (PARTITION BY role ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT role, ts, value,
    round(bm, 6) AS base_mean, round(bs, 6) AS base_std,
    CASE WHEN np >= 3 AND bs > 0
         THEN round((value - bm) / bs, 6) END AS z
  FROM base)
SELECT role, ts, value, base_mean, base_std, z,
  coalesce(abs(z) >= 2.0, false) AS is_anomaly
FROM z ORDER BY role, ts
"""


_TRAINING_QUERIES["metric_anomaly_daily"] = q_metric_anomaly
_TRAINING_ORACLES["metric_anomaly_daily"] = _SQL_METRIC_ANOMALY


def q_frequent_values_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters (candidate generation via mapInPandas MG
    summaries + exact broadcast recount) over the same columns as
    frequent_values. With num_counters=1024 > the columns' distinct
    counts, MG provably keeps every value, so the result is deterministic
    and identical to the exact ranking — the SAME oracle applies and gives
    the 100-TB sketch path a hard correctness signal."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        frequent_values_approx,
    )

    return frequent_values_approx(
        spark.table("transcripts"), ["role", "tool", "turn_idx"],
        k=5, num_counters=1024,
    )


_TRAINING_QUERIES["frequent_values_mg"] = q_frequent_values_mg
_TRAINING_ORACLES["frequent_values_mg"] = _frequent_values_oracle_sql()


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization + content hash over the documents
    table — the pre-dedup pass that makes exact dedup robust to case/
    spacing edits. Map-only; all patterns RE2/Java-portable."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        normalize_text,
    )

    return normalize_text(
        spark.table("documents"), "doc_id", "text"
    ).orderBy("id")


_SQL_NORMALIZE_TEXT = """
WITH n AS (
  SELECT doc_id AS id,
    trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))
      AS norm_text,
    coalesce(text, '') AS raw
  FROM documents)
SELECT id, norm_text, md5(norm_text) AS norm_hash,
  CAST(length(raw) AS INTEGER) AS n_chars_before,
  CAST(length(norm_text) AS INTEGER) AS n_chars_after
FROM n ORDER BY id
"""


_TRAINING_QUERIES["normalize_text"] = q_normalize_text
_TRAINING_ORACLES["normalize_text"] = _SQL_NORMALIZE_TEXT


def q_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated incremental ingestion: documents whose content hash does
    not occur in the already-ingested half of the corpus (seen = even
    doc_ids). Exact despite the bloom: misses skip the join entirely, hits
    are verified by an anti-join on the candidates only
    (operators/bloom.py seen_filter). n_bits deliberately small here so the
    false-positive path is exercised, not just the trivial one."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.bloom import (
        seen_filter,
    )

    docs = spark.table("documents")
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    out = seen_filter(docs, seen, F.md5("text"), n_bits=1 << 12, n_hashes=4)
    return out.select("doc_id", "source").orderBy("doc_id")


_SQL_INCREMENTAL_NEW_DOCS = """
SELECT d.doc_id, d.source FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM documents s
  WHERE s.doc_id % 2 = 0 AND md5(s.text) = md5(d.text))
ORDER BY d.doc_id
"""


_TRAINING_QUERIES["incremental_new_docs"] = q_incremental_new_docs
_TRAINING_ORACLES["incremental_new_docs"] = _SQL_INCREMENTAL_NEW_DOCS


def q_referential_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """referential_orphans re-planned for a dimension too large to
    broadcast as data: distinct fact keys anti-join dim keys (keys-only
    shuffle), orphan keys broadcast back as a left-semi join — the fact is
    never exchanged (operators/referential.py
    referential_violations_large). Same result set as referential_orphans;
    the contract entry pins the large-dim plan to the same oracle."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators import (
        referential_violations_large,
    )

    orphans = referential_violations_large(
        spark.table("transcripts"), spark.table("dim_conversations"), "conv_id"
    )
    return (
        orphans.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("orphan_rows"))
        .orderBy("conv_id")
    )


_TRAINING_QUERIES["referential_orphans_large"] = q_referential_large
_TRAINING_ORACLES["referential_orphans_large"] = _SQL_REFERENTIAL


def q_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column Shannon entropy / uniqueness profile over the transcript
    categorical columns (operators/aggregates.py column_entropy): one melt
    + two-level aggregate, O(distinct values) across the exchange."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        column_entropy,
    )

    return column_entropy(spark.table("transcripts"), ["role", "tool"])


_SQL_COLUMN_ENTROPY = f"""{_CTES},
m AS (
  SELECT 'role' AS "column", role AS value FROM transcripts
  WHERE role IS NOT NULL
  UNION ALL
  SELECT 'tool', tool FROM transcripts WHERE tool IS NOT NULL),
c AS (SELECT "column", value, CAST(count(*) AS DOUBLE) AS n
      FROM m GROUP BY 1, 2)
SELECT "column",
  CAST(SUM(n) AS BIGINT) AS n_nonnull,
  CAST(COUNT(*) AS BIGINT) AS n_distinct,
  ROUND(ln(SUM(n)) - SUM(n * ln(n)) / SUM(n), 6) + 0.0 AS entropy,
  ROUND(CASE WHEN COUNT(*) > 1
        THEN (ln(SUM(n)) - SUM(n * ln(n)) / SUM(n)) / ln(COUNT(*))
        ELSE 0 END, 6) + 0.0 AS norm_entropy,
  ROUND(COUNT(*) / SUM(n), 6) AS uniqueness_ratio
FROM c GROUP BY "column" ORDER BY "column"
"""


_TRAINING_QUERIES["column_entropy_profile"] = q_column_entropy
_TRAINING_ORACLES["column_entropy_profile"] = _SQL_COLUMN_ENTROPY


def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information lang<->source on documents
    (operators/aggregates.py mutual_information): one O(rows) joint count;
    marginals/entropies re-aggregated FROM the joint."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        mutual_information,
    )

    return mutual_information(spark.table("documents"), "lang", "source")


_SQL_MUTUAL_INFO = """
WITH j AS (
  SELECT lang AS a, source AS b, CAST(count(*) AS DOUBLE) AS nab
  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY 1, 2),
ma AS (SELECT a, SUM(nab) AS na FROM j GROUP BY a),
mb AS (SELECT b, SUM(nab) AS nb FROM j GROUP BY b),
t AS (SELECT SUM(nab) AS n FROM j),
mi AS (
  SELECT SUM((nab / n) * ln(nab * n / (na * nb))) AS mi, ANY_VALUE(n) AS n
  FROM j JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN t),
ha AS (SELECT ln(SUM(na)) - SUM(na * ln(na)) / SUM(na) AS ha FROM ma),
hb AS (SELECT ln(SUM(nb)) - SUM(nb * ln(nb)) / SUM(nb) AS hb FROM mb)
SELECT 'lang' AS col_a, 'source' AS col_b, CAST(mi.n AS BIGINT) AS n,
  ROUND(mi.mi, 6) AS mi,
  ROUND(CASE WHEN LEAST(ha, hb) > 1e-12 THEN mi.mi / LEAST(ha, hb)
        ELSE 0 END, 6) AS nmi
FROM mi, ha, hb
"""


_TRAINING_QUERIES["mutual_info_lang_source"] = q_mutual_info
_TRAINING_ORACLES["mutual_info_lang_source"] = _SQL_MUTUAL_INFO


def q_conv_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight shuffle-key skew diagnostics on conv_id
    (operators/partitioning.py key_skew_profile): the check that decides
    whether the PK join needs salting/AQE before a 10^12-row run."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.partitioning import (
        key_skew_profile,
    )

    return key_skew_profile(spark.table("transcripts"), "conv_id")


_SQL_CONV_SKEW = f"""{_CTES},
s AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n
      FROM transcripts GROUP BY conv_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(n) AS BIGINT) AS n_rows,
  MAX(n) AS max_size,
  ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS max_share,
  ROUND(AVG(n), 6) AS avg_size,
  quantile_cont(n, 0.5) AS p50_size,
  quantile_cont(n, 0.9) AS p90_size,
  quantile_cont(n, 0.99) AS p99_size,
  ROUND(CAST(MAX(n) AS DOUBLE) / quantile_cont(n, 0.5), 6) AS skew_ratio,
  (SELECT conv_id FROM s ORDER BY n DESC, conv_id DESC LIMIT 1) AS top_key
FROM s
"""


_TRAINING_QUERIES["conv_skew_profile"] = q_conv_skew
_TRAINING_ORACLES["conv_skew_profile"] = _SQL_CONV_SKEW


def q_numeric_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over the events numeric columns in
    ONE aggregate pass (operators/aggregates.py numeric_corr_matrix):
    C(n,2) corr aggregates share a single scan."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        numeric_corr_matrix,
    )

    ev = spark.table("events")
    return numeric_corr_matrix(ev, ["event_id", "user_id", "value"])


_SQL_NUMERIC_CORR = """
SELECT * FROM (
  SELECT 'event_id' AS col_a, 'user_id' AS col_b,
    ROUND(corr(CAST(event_id AS DOUBLE), CAST(user_id AS DOUBLE)), 6) + 0.0 AS corr
  FROM events
  UNION ALL
  SELECT 'event_id', 'value',
    ROUND(corr(CAST(event_id AS DOUBLE), CAST(value AS DOUBLE)), 6) + 0.0
  FROM events
  UNION ALL
  SELECT 'user_id', 'value',
    ROUND(corr(CAST(user_id AS DOUBLE), CAST(value AS DOUBLE)), 6) + 0.0
  FROM events
) ORDER BY col_a, col_b
"""


_TRAINING_QUERIES["numeric_corr_events"] = q_numeric_corr
_TRAINING_ORACLES["numeric_corr_events"] = _SQL_NUMERIC_CORR


def q_categorical_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-profile validation source vs defect-injected target
    (operators/aggregates.py categorical_compare): n_distinct / n_null /
    modal value / modal count verdicts per column — the string-column
    companion to profile_compare_by_role."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        categorical_compare,
    )

    return categorical_compare(
        spark.table("transcripts"),
        spark.table("transcripts_target"),
        ["role", "tool"],
    )


def _categorical_compare_oracle_sql(threshold_pct: float = 0.0) -> str:
    """DuckDB replay of categorical_compare over (role, tool): per
    column/side profile scalars assembled into the same melted verdict
    rows (modal tie-break: max (count, value), like the Spark max_by)."""
    cols = ["role", "tool"]
    thr = threshold_pct

    def scal(c, tbl, metric):
        if metric == "n_distinct":
            return (f"(SELECT CAST(count(DISTINCT CAST({c} AS VARCHAR)) "
                    f"AS BIGINT) FROM {tbl})")
        if metric == "n_null":
            return (f"(SELECT CAST(count(*) FILTER ({c} IS NULL) AS BIGINT) "
                    f"FROM {tbl})")
        if metric == "top_value":
            return (f"(SELECT CAST({c} AS VARCHAR) FROM {tbl} "
                    f"WHERE {c} IS NOT NULL GROUP BY 1 "
                    f"ORDER BY count(*) DESC, 1 DESC LIMIT 1)")
        return (f"(SELECT CAST(count(*) AS BIGINT) FROM {tbl} "
                f"WHERE {c} IS NOT NULL GROUP BY CAST({c} AS VARCHAR) "
                f"ORDER BY count(*) DESC, CAST({c} AS VARCHAR) DESC LIMIT 1)")

    blocks = []
    for c in cols:
        for m in ("n_distinct", "n_null", "top_count"):
            s, t = scal(c, "transcripts", m), scal(c, "transcripts_target", m)
            blocks.append(f"""
SELECT '{c}' AS "column", '{m}' AS metric,
  CAST(s AS VARCHAR) AS source_value, CAST(t AS VARCHAR) AS target_value,
  CASE WHEN s IS NOT NULL AND t IS NOT NULL AND s != 0
       THEN ROUND((t - s) * 100.0 / s, 6) END AS pct_diff,
  CASE WHEN (s IS NULL AND t IS NULL)
         OR (s IS NOT NULL AND t IS NOT NULL AND
             CASE WHEN s != 0 THEN abs((t - s) * 100.0 / s) <= {thr}
                  ELSE t = 0 END)
       THEN 'success' ELSE 'fail' END AS validation_status
FROM (SELECT {s} AS s, {t} AS t)""")
        sv, tv = scal(c, "transcripts", "top_value"), scal(
            c, "transcripts_target", "top_value")
        blocks.append(f"""
SELECT '{c}', 'top_value', s, t, CAST(NULL AS DOUBLE),
  CASE WHEN (s IS NULL AND t IS NULL) OR s = t THEN 'success'
       ELSE 'fail' END
FROM (SELECT {sv} AS s, {tv} AS t)""")
    return (
        _CTES
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(blocks)
        + '\n) ORDER BY "column", metric'
    )


_TRAINING_QUERIES["categorical_compare_roles"] = q_categorical_compare
_TRAINING_ORACLES["categorical_compare_roles"] = (
    _categorical_compare_oracle_sql()
)


def q_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-completeness validation per role after deterministically
    dropping two ingest days (operators/temporal.py calendar_completeness):
    the silently-missing-partition check. Expected per-group range defaults
    to the group's own [min, max] span."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.temporal import (
        calendar_completeness,
    )

    t = spark.table("transcripts").filter(
        ~F.dayofmonth("ts").isin(7, 19)
    )
    return calendar_completeness(t, "ts", ["role"])


_SQL_MISSING_DAYS = f"""{_CTES},
obs AS (
  SELECT role, CAST(ts AS DATE) AS day FROM transcripts
  WHERE day(ts) NOT IN (7, 19) GROUP BY 1, 2),
b AS (SELECT role, MIN(day) AS lo, MAX(day) AS hi FROM obs GROUP BY role),
cal AS (
  SELECT role, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
    AS day
  FROM b)
SELECT cal.role, cal.day FROM cal
WHERE NOT EXISTS (
  SELECT 1 FROM obs WHERE obs.role = cal.role AND obs.day = cal.day)
ORDER BY role, day
"""


_TRAINING_QUERIES["missing_days_by_role"] = q_missing_days
_TRAINING_ORACLES["missing_days_by_role"] = _SQL_MISSING_DAYS


def q_novel_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novel-value detection target vs source on (role, tool) with a
    deterministically planted novel role (operators/aggregates.py
    novel_categories)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        novel_categories,
    )

    tgt = spark.table("transcripts_target").withColumn(
        "role",
        F.when(F.col("event_id") % 997 == 0, F.lit("moderator")).otherwise(
            F.col("role")
        ),
    )
    return novel_categories(spark.table("transcripts"), tgt, ["role", "tool"])


_SQL_NOVEL_CATEGORIES = f"""{_CTES},
tgt AS (
  SELECT CASE WHEN event_id % 997 = 0 THEN 'moderator' ELSE role END AS role,
         tool
  FROM transcripts_target),
tm AS (
  SELECT 'role' AS "column", role AS value FROM tgt
  UNION ALL SELECT 'tool', tool FROM tgt),
sm AS (
  SELECT 'role' AS "column", CAST(role AS VARCHAR) AS value FROM transcripts
  UNION ALL SELECT 'tool', tool FROM transcripts),
tc AS (SELECT "column", value, CAST(count(*) AS BIGINT) AS n_rows
       FROM tm WHERE value IS NOT NULL GROUP BY 1, 2)
SELECT tc."column", tc.value, tc.n_rows FROM tc
WHERE NOT EXISTS (
  SELECT 1 FROM sm
  WHERE sm."column" = tc."column" AND sm.value = tc.value)
ORDER BY "column", value
"""


_TRAINING_QUERIES["novel_categories_roles"] = q_novel_categories
_TRAINING_ORACLES["novel_categories_roles"] = _SQL_NOVEL_CATEGORIES


# ---------------------------------------------------------------------------
# Round-3 cont.: FD / robust-outlier / Benford / quantile-PSI / turn gaps
# ---------------------------------------------------------------------------

def q_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency validation on two pairs at once: documents
    'source -> lang' (violated by every source: corpora are multilingual)
    and transcripts 'tool -> role' (HOLDS: a named tool only ever appears
    on role='tool' rows, so it contributes zero violation rows — the
    passing case) — one long-format report
    (operators/aggregates.py fd_violations)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        fd_violations,
    )

    a = fd_violations(spark.table("documents"), "source", "lang").select(
        F.lit("documents: source -> lang").alias("fd"), "*"
    )
    b = fd_violations(spark.table("transcripts"), "tool", "role").select(
        F.lit("transcripts: tool -> role").alias("fd"), "*"
    )
    return a.unionByName(b).orderBy("fd", "det_value")


_SQL_FD_VIOLATIONS = f"""{_CTES},
f1 AS (
  SELECT 'documents: source -> lang' AS fd,
         CAST(source AS VARCHAR) AS det_value,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT coalesce(lang, '<NULL>')) AS BIGINT)
           AS n_distinct_dep,
         min(coalesce(lang, '<NULL>')) AS dep_min,
         max(coalesce(lang, '<NULL>')) AS dep_max
  FROM documents WHERE source IS NOT NULL GROUP BY source
  HAVING count(DISTINCT coalesce(lang, '<NULL>')) > 1),
f2 AS (
  SELECT 'transcripts: tool -> role' AS fd,
         CAST(tool AS VARCHAR) AS det_value,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT coalesce(role, '<NULL>')) AS BIGINT)
           AS n_distinct_dep,
         min(coalesce(role, '<NULL>')) AS dep_min,
         max(coalesce(role, '<NULL>')) AS dep_max
  FROM transcripts WHERE tool IS NOT NULL GROUP BY tool
  HAVING count(DISTINCT coalesce(role, '<NULL>')) > 1)
SELECT * FROM (SELECT * FROM f1 UNION ALL SELECT * FROM f2) u
ORDER BY fd, det_value
"""


def q_psi_qbins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric PSI over equal-frequency bins (operators/drift.py
    psi_quantile_binned): source = events.value; target = the same column
    under the deterministic snapshot-defect pattern (deletions at
    event_id % 211 = 0) plus a constant +250 offset on every third event
    (the unit-mix-up / fee-added corruption shape) — numeric drift the
    categorical PSI can't see. PSI = 0.536 at sf0.01: a firing alert
    (0.1 watch / 0.2 act conventions)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import (
        psi_quantile_binned,
    )

    src = spark.table("events").select("value", "event_id")
    tgt = (
        spark.table("events")
        .filter(F.col("event_id") % 211 != 0)
        .select(
            F.when(
                F.col("event_id") % 3 == 0, F.col("value") + F.lit(250.0)
            )
            .otherwise(F.col("value"))
            .alias("value")
        )
    )
    return psi_quantile_binned(src, tgt, F.col("value"), n_bins=10)


_SQL_PSI_QBINS = """
WITH src AS (
  SELECT CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL),
tgt AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN CAST(value AS DOUBLE) + 250.0
              ELSE CAST(value AS DOUBLE) END AS v
  FROM events WHERE event_id % 211 <> 0 AND value IS NOT NULL),
e AS (
  SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
    AS edges FROM src),
sb AS (SELECT len(list_filter((SELECT edges FROM e), x -> v > x))
         AS bin_idx FROM src),
tb AS (SELECT len(list_filter((SELECT edges FROM e), x -> v > x))
         AS bin_idx FROM tgt),
s AS (SELECT bin_idx, count(*) AS n_source FROM sb GROUP BY 1),
t AS (SELECT bin_idx, count(*) AS n_target FROM tb GROUP BY 1),
j AS (
  SELECT coalesce(s.bin_idx, t.bin_idx) AS bin_idx,
         coalesce(n_source, 0) AS n_source,
         coalesce(n_target, 0) AS n_target
  FROM s FULL OUTER JOIN t ON s.bin_idx = t.bin_idx),
tot AS (SELECT sum(n_source) AS ts, sum(n_target) AS tt FROM j),
terms AS (
  SELECT bin_idx, n_source, n_target,
         greatest(n_source / ts, 1e-6) AS p,
         greatest(n_target / tt, 1e-6) AS q
  FROM j, tot)
SELECT CAST(bin_idx AS INTEGER) AS bin_idx,
       CAST(n_source AS BIGINT) AS n_source,
       CAST(n_target AS BIGINT) AS n_target,
       round(p, 6) AS src_frac,
       round(q, 6) AS tgt_frac,
       round((p - q) * ln(p / q), 6) AS psi_term,
       round(sum((p - q) * ln(p / q)) OVER (), 6) AS psi
FROM terms ORDER BY bin_idx
"""


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust-outlier profile over the transcript numerics
    (text length, turn index) — operators/aggregates.py
    robust_outlier_profile, k=3."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        robust_outlier_profile,
    )

    df = spark.table("transcripts").select(
        F.length("text").cast("double").alias("text_len"),
        F.col("turn_idx").cast("double").alias("turn_idx"),
    )
    return robust_outlier_profile(df, ["text_len", "turn_idx"], k=3.0)


_SQL_ROBUST_OUTLIERS = f"""{_CTES},
m AS (
  SELECT 'text_len' AS "column", CAST(length(text) AS DOUBLE) AS v
  FROM transcripts WHERE text IS NOT NULL
  UNION ALL
  SELECT 'turn_idx', CAST(turn_idx AS DOUBLE)
  FROM transcripts WHERE turn_idx IS NOT NULL),
med AS (SELECT "column", quantile_cont(v, 0.5) AS med FROM m GROUP BY 1),
mad AS (
  SELECT m."column" AS "column", quantile_cont(abs(v - med), 0.5) AS mad
  FROM m JOIN med ON m."column" = med."column" GROUP BY m."column")
SELECT m."column" AS "column",
       CAST(count(*) AS BIGINT) AS n_nonnull,
       round(max(med), 6) AS median,
       round(max(mad), 6) AS mad,
       CAST(sum(CASE WHEN abs(v - med) > 3.0 * 1.4826 * mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(sum(CASE WHEN abs(v - med) > 3.0 * 1.4826 * mad
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS outlier_frac
FROM m
JOIN med ON m."column" = med."column"
JOIN mad ON m."column" = mad."column"
GROUP BY m."column" ORDER BY "column"
"""


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit Benford conformance on events.value
    (operators/aggregates.py benford_check). The synthetic amounts are
    roughly Benford-shaped but deviate measurably (chi2 = 61.75 at
    sf0.01 over dof 8 — a firing check on a near-natural distribution,
    which is the realistic shape for this detector)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        benford_check,
    )

    return benford_check(spark.table("events"), F.col("value"))


_SQL_BENFORD = """
WITH b AS (
  SELECT CAST(CAST(abs(value) AS DECIMAL(20,2)) AS VARCHAR) AS s
  FROM events WHERE value IS NOT NULL),
dg AS (
  SELECT CAST(regexp_extract(s, '[1-9]', 0) AS INTEGER) AS digit
  FROM b WHERE regexp_matches(s, '[1-9]')),
r AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM dg GROUP BY 1),
tot AS (SELECT sum(n) AS tot FROM r)
SELECT digit, n,
       round(n / tot, 6) AS observed_frac,
       round(log10(1.0 + 1.0 / digit), 6) AS expected_frac,
       round(sum(tot * (n / tot - log10(1.0 + 1.0 / digit))
                     * (n / tot - log10(1.0 + 1.0 / digit))
                 / log10(1.0 + 1.0 / digit)) OVER (), 6) AS chi2
FROM r, tot ORDER BY digit
"""


def q_turn_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day inter-turn latency profile over transcripts
    (operators/temporal.py turn_gap_stats, SLA 3600 s)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.temporal import (
        turn_gap_stats,
    )

    return turn_gap_stats(spark.table("transcripts"), sla_seconds=3600)


_SQL_TURN_GAPS = f"""{_CTES},
g AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
  FROM transcripts),
g2 AS (SELECT day, gap_us FROM g WHERE gap_us IS NOT NULL)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(CASE WHEN gap_us < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       CAST(sum(CASE WHEN gap_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_sla,
       round(avg(gap_us) / 1e6, 6) AS avg_gap_s,
       round(quantile_cont(gap_us, 0.5) / 1e6, 6) AS p50_gap_s,
       round(quantile_cont(gap_us, 0.9) / 1e6, 6) AS p90_gap_s,
       round(max(gap_us) / 1e6, 6) AS max_gap_s
FROM g2 GROUP BY day ORDER BY day
"""


_TRAINING_QUERIES.update(
    {
        "fd_violations": q_fd_violations,
        "drift_psi_value_qbins": q_psi_qbins,
        "robust_outlier_profile": q_robust_outliers,
        "benford_first_digit": q_benford,
        "turn_gap_stats": q_turn_gaps,
    }
)
_TRAINING_ORACLES.update(
    {
        "fd_violations": _SQL_FD_VIOLATIONS,
        "drift_psi_value_qbins": _SQL_PSI_QBINS,
        "robust_outlier_profile": _SQL_ROBUST_OUTLIERS,
        "benford_first_digit": _SQL_BENFORD,
        "turn_gap_stats": _SQL_TURN_GAPS,
    }
)


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PMI collocations over the documents corpus (min_count=5) —
    operators/text.py bigram_pmi; ranking on 6dp-rounded pmi with the
    pair as tie-break keeps the top-k cut engine-deterministic."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        bigram_pmi,
    )

    return bigram_pmi(spark.table("documents"), "text", min_count=5, top_k=50)


_SQL_BIGRAM_PMI = """
WITH toks AS (
  SELECT string_split_regex(trim(text), ' +') AS l
  FROM documents WHERE text IS NOT NULL),
uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(l) AS w FROM toks) z WHERE w <> '' GROUP BY w),
uni_t AS (SELECT w, c, sum(c) OVER () AS n1 FROM uni),
pairs AS (
  SELECT l[i] AS w1, l[i + 1] AS w2
  FROM toks, unnest(range(1, len(l))) AS t(i)
  WHERE l[i] <> '' AND l[i + 1] <> ''),
big AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
big_f AS (
  SELECT w1, w2, c12, sum(c12) OVER () AS n2 FROM big
  QUALIFY c12 >= 5),
j AS (
  SELECT b.w1, b.w2, b.c12, b.n2, u1.c AS c1, u1.n1 AS n1, u2.c AS c2
  FROM big_f b
  JOIN uni_t u1 ON b.w1 = u1.w
  JOIN uni_t u2 ON b.w2 = u2.w),
scored AS (
  SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
         CAST(c2 AS BIGINT) AS c2,
         round(ln((c12 / n2) / ((c1 / n1) * (c2 / n1))), 6) AS pmi
  FROM j),
top AS (SELECT * FROM scored ORDER BY pmi DESC, w1, w2 LIMIT 50)
SELECT CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INTEGER)
         AS rank,
       w1, w2, c12, c1, c2, pmi
FROM top ORDER BY rank
"""


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the documents corpus (top 1000 ranks)
    — operators/text.py zipf_fit."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        zipf_fit,
    )

    return zipf_fit(spark.table("documents"), "text", top_n=1000)


_SQL_ZIPF_FIT = """
WITH counts AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(string_split_regex(trim(text), ' +')) AS w
        FROM documents WHERE text IS NOT NULL) z
  WHERE w <> '' GROUP BY w),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r,
         sum(c) OVER () AS n_tokens, count(*) OVER () AS vocab_size
  FROM counts),
f AS (SELECT * FROM ranked WHERE r <= 1000),
mom AS (
  SELECT max(n_tokens) AS n_tokens, max(vocab_size) AS vocab_size,
         count(*) AS n_fit,
         sum(ln(CAST(r AS DOUBLE))) AS sx,
         sum(ln(CAST(c AS DOUBLE))) AS sy,
         sum(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS sxy,
         sum(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))) AS sxx,
         sum(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS syy
  FROM f)
SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(vocab_size AS BIGINT) AS vocab_size,
       CAST(n_fit AS BIGINT) AS n_fit,
       round(CASE WHEN (n_fit * sxx - sx * sx) > 0
                  THEN (n_fit * sxy - sx * sy) / (n_fit * sxx - sx * sx)
                  END, 6) AS zipf_slope,
       round(CASE WHEN (n_fit * sxx - sx * sx) > 0
                   AND (n_fit * syy - sy * sy) > 0
                  THEN (n_fit * sxy - sx * sy) * (n_fit * sxy - sx * sy)
                       / ((n_fit * sxx - sx * sx) * (n_fit * syy - sy * sy))
                  END, 6) AS r2
FROM mom
"""


_TRAINING_QUERIES.update(
    {
        "bigram_pmi_top": q_bigram_pmi,
        "zipf_fit": q_zipf_fit,
    }
)
_TRAINING_ORACLES.update(
    {
        "bigram_pmi_top": _SQL_BIGRAM_PMI,
        "zipf_fit": _SQL_ZIPF_FIT,
    }
)


def q_sample_repr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representativeness gate for a 25% md5-prefix subsample of the
    transcripts (operators/sampling.py sample_representativeness):
    KS on text length + JSD on role vs the full population."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.sampling import (
        sample_representativeness,
    )

    return sample_representativeness(
        spark.table("transcripts"),
        ["conv_id", "turn_idx"],
        F.length("text"),
        F.col("role"),
        sample_hex="0123",
    )


_SQL_SAMPLE_REPR = f"""{_CTES},
samp AS (
  SELECT * FROM transcripts
  WHERE substr(md5('42' || '|' || conv_id || '|'
                   || CAST(turn_idx AS VARCHAR)), 1, 1)
        IN ('0', '1', '2', '3')),
u AS (
  SELECT v, sum(ns) AS n_s, sum(nt) AS n_t FROM (
    SELECT length(text) AS v, 1 AS ns, 0 AS nt FROM transcripts
    UNION ALL SELECT length(text), 0, 1 FROM samp) z
  GROUP BY v),
c AS (SELECT
   sum(n_s) OVER (ORDER BY v) AS cs,
   sum(n_t) OVER (ORDER BY v) AS ct,
   sum(n_s) OVER () AS tot_s,
   sum(n_t) OVER () AS tot_t FROM u),
k AS (SELECT
   round(max(abs(cs * 1.0 / tot_s - ct * 1.0 / tot_t)), 6) AS value,
   CAST(max(tot_s) AS BIGINT) AS np, CAST(max(tot_t) AS BIGINT) AS nsm
 FROM c),
uj AS (
  SELECT v, sum(ns) AS n_s, sum(nt) AS n_t FROM (
    SELECT role AS v, 1 AS ns, 0 AS nt FROM transcripts
    UNION ALL SELECT role, 0, 1 FROM samp) z
  GROUP BY v),
cj AS (SELECT
   n_s * 1.0 / sum(n_s) OVER () AS p,
   n_t * 1.0 / sum(n_t) OVER () AS q,
   sum(n_s) OVER () AS tot_s, sum(n_t) OVER () AS tot_t FROM uj),
j AS (SELECT
   round(0.5 * sum(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0))
                        ELSE 0 END)
       + 0.5 * sum(CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0))
                        ELSE 0 END), 6) AS value,
   CAST(max(tot_s) AS BIGINT) AS np, CAST(max(tot_t) AS BIGINT) AS nsm
 FROM cj)
SELECT * FROM (
  SELECT 'jsd_categorical' AS "check", value, np AS n_population,
         nsm AS n_sample, CAST(0.01 AS DOUBLE) AS threshold,
         CASE WHEN value <= 0.01 THEN 'success' ELSE 'fail' END
           AS validation_status
  FROM j
  UNION ALL
  SELECT 'ks_numeric', value, np, nsm, CAST(0.05 AS DOUBLE),
         CASE WHEN value <= 0.05 THEN 'success' ELSE 'fail' END
  FROM k) z
ORDER BY "check"
"""


_TRAINING_QUERIES["sample_representativeness"] = q_sample_repr
_TRAINING_ORACLES["sample_representativeness"] = _SQL_SAMPLE_REPR


def q_type_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inferred-type profile over a mixed-type string view of events:
    ids stringify as ints, values as doubles, timestamps as timestamps,
    event_type/props as free text (operators/aggregates.py
    type_conformance)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        type_conformance,
    )

    df = spark.table("events").select(
        F.col("event_id").cast("string").alias("event_id_s"),
        F.col("value").cast("string").alias("value_s"),
        F.col("ts").cast("string").alias("ts_s"),
        "event_type",
        "props",
    )
    return type_conformance(
        df, ["event_id_s", "value_s", "ts_s", "event_type", "props"]
    )


_SQL_TYPE_CONFORMANCE = """
WITH m AS (
  SELECT "column", value FROM (
    SELECT 'event_id_s' AS "column", CAST(event_id AS VARCHAR) AS value
    FROM events
    UNION ALL SELECT 'value_s', CAST(value AS VARCHAR) FROM events
    UNION ALL SELECT 'ts_s', CAST(ts AS VARCHAR) FROM events
    UNION ALL SELECT 'event_type', event_type FROM events
    UNION ALL SELECT 'props', props FROM events) z
  WHERE value IS NOT NULL)
SELECT "column",
  CAST(count(*) AS BIGINT) AS n_nonnull,
  round(avg(CASE WHEN regexp_matches(value, '^[+-]?[0-9]+$')
                 THEN 1.0 ELSE 0.0 END), 6) AS frac_int,
  round(avg(CASE WHEN regexp_matches(value,
      '^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$')
                 THEN 1.0 ELSE 0.0 END), 6) AS frac_double,
  round(avg(CASE WHEN regexp_matches(value,
      '^[0-9]{4}-[0-9]{2}-[0-9]{2}$') THEN 1.0 ELSE 0.0 END), 6)
    AS frac_date,
  round(avg(CASE WHEN regexp_matches(value,
      '^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}:[0-9]{2}')
                 THEN 1.0 ELSE 0.0 END), 6) AS frac_timestamp,
  round(avg(CASE WHEN regexp_matches(value,
      '^([Tt][Rr][Uu][Ee]|[Ff][Aa][Ll][Ss][Ee])$')
                 THEN 1.0 ELSE 0.0 END), 6) AS frac_bool,
  round(avg(CASE WHEN value = '' THEN 1.0 ELSE 0.0 END), 6) AS frac_empty
FROM m GROUP BY "column" ORDER BY "column"
"""


_TRAINING_QUERIES["type_conformance"] = q_type_conformance
_TRAINING_ORACLES["type_conformance"] = _SQL_TYPE_CONFORMANCE


def q_string_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column value-length profile over transcripts (text/role/tool)
    — operators/aggregates.py string_length_profile."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        string_length_profile,
    )

    return string_length_profile(
        spark.table("transcripts"), ["text", "role", "tool"]
    )


_SQL_STRING_LENGTHS = f"""{_CTES},
m AS (
  SELECT "column", length(value) AS l FROM (
    SELECT 'text' AS "column", text AS value FROM transcripts
    UNION ALL SELECT 'role', role FROM transcripts
    UNION ALL SELECT 'tool', tool FROM transcripts) z
  WHERE value IS NOT NULL)
SELECT "column",
  CAST(count(*) AS BIGINT) AS n_nonnull,
  CAST(min(l) AS BIGINT) AS min_len,
  CAST(max(l) AS BIGINT) AS max_len,
  round(avg(l), 6) AS avg_len,
  quantile_cont(l, 0.5) AS p50_len
FROM m GROUP BY "column" ORDER BY "column"
"""


def q_grouped_null_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null rate of (tool, text) per role — the by-segment completeness
    slicer; tool is null for every non-tool role by construction
    (operators/aggregates.py grouped_null_rates)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        grouped_null_rates,
    )

    return grouped_null_rates(
        spark.table("transcripts"), "role", ["tool", "text"]
    )


_SQL_GROUPED_NULL_RATES = f"""{_CTES},
w AS (
  SELECT CAST(role AS VARCHAR) AS "group",
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_tool,
         CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_text
  FROM transcripts GROUP BY role)
SELECT "group", "column", n_rows, n_null,
       round(n_null * 1.0 / n_rows, 6) AS null_frac
FROM (
  SELECT "group", 'tool' AS "column", n_rows, null_tool AS n_null FROM w
  UNION ALL
  SELECT "group", 'text', n_rows, null_text FROM w) z
ORDER BY "group", "column"
"""


def q_duplication_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK duplication rate per day over transcripts with a planted
    duplicate slice (every event_id % 101 = 0 row appended twice) —
    operators/uniqueness.py duplication_by_day answers WHEN duplication
    started."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.uniqueness import (
        duplication_by_day,
    )

    t = spark.table("transcripts")
    planted = t.unionByName(t.filter(F.col("event_id") % 101 == 0))
    return duplication_by_day(planted, ["conv_id", "turn_idx"])


_SQL_DUPLICATION_BY_DAY = f"""{_CTES},
planted AS (
  SELECT * FROM transcripts
  UNION ALL SELECT * FROM transcripts WHERE event_id % 101 = 0)
SELECT strftime(ts, '%Y-%m-%d') AS day,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(DISTINCT (conv_id, turn_idx)) AS BIGINT) AS n_keys,
  CAST(count(*) - count(DISTINCT (conv_id, turn_idx)) AS BIGINT)
    AS n_dup_rows,
  round((count(*) - count(DISTINCT (conv_id, turn_idx))) * 1.0 / count(*),
        6) AS dup_frac
FROM planted GROUP BY 1 ORDER BY day
"""


_TRAINING_QUERIES.update(
    {
        "string_length_profile": q_string_lengths,
        "grouped_null_rates": q_grouped_null_rates,
        "duplication_by_day": q_duplication_by_day,
    }
)
_TRAINING_ORACLES.update(
    {
        "string_length_profile": _SQL_STRING_LENGTHS,
        "grouped_null_rates": _SQL_GROUPED_NULL_RATES,
        "duplication_by_day": _SQL_DUPLICATION_BY_DAY,
    }
)


# ---------------------------------------------------------------------------
# Conversation-semantic + association profilers (cont. 7):
# stuck-loop detection, role-conditioned response latency, Cramér's V
# association pairs, char-bigram style drift, conv-length KS.
# ---------------------------------------------------------------------------


def q_loop_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuck-agent loop detector over transcripts with a planted loop
    slice (turn_idx % 11 in (3,4,5) forced to identical assistant turns)
    — operators/conversation.py loop_detection; gaps-and-islands over
    conv-partitioned windows, never a global sort."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.conversation import (
        loop_detection,
    )

    t = spark.table("transcripts")
    looped = (F.col("turn_idx") % 11).isin(3, 4, 5)
    planted = t.withColumn(
        "text", F.when(looped, F.lit("LOOP")).otherwise(F.col("text"))
    ).withColumn(
        "role", F.when(looped, F.lit("assistant")).otherwise(F.col("role"))
    )
    return loop_detection(planted, min_run=3)


_SQL_LOOP_DETECTION = f"""{_CTES},
planted AS (
  SELECT conv_id, turn_idx,
    CASE WHEN turn_idx % 11 IN (3,4,5) THEN 'assistant' ELSE role END AS role,
    CASE WHEN turn_idx % 11 IN (3,4,5) THEN 'LOOP' ELSE text END AS text
  FROM transcripts),
flagged AS (
  SELECT conv_id, turn_idx,
    (role IS NOT DISTINCT FROM
       lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx))
    AND (text IS NOT DISTINCT FROM
       lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx)) AS is_rep
  FROM planted),
islands AS (
  SELECT conv_id,
    sum(CASE WHEN is_rep THEN 0 ELSE 1 END)
      OVER (PARTITION BY conv_id ORDER BY turn_idx) AS island
  FROM flagged),
runs AS (
  SELECT conv_id, island, count(*) AS run_len
  FROM islands GROUP BY conv_id, island),
per_conv AS (
  SELECT conv_id,
    CAST(sum(run_len) AS BIGINT) AS n_turns,
    CAST(count(CASE WHEN run_len >= 3 THEN 1 END) AS BIGINT) AS n_loop_runs,
    CAST(max(run_len) AS BIGINT) AS max_run_len,
    CAST(sum(CASE WHEN run_len >= 2 THEN run_len - 1 ELSE 0 END) AS BIGINT)
      AS n_repeat_turns
  FROM runs GROUP BY conv_id)
SELECT * FROM per_conv WHERE max_run_len >= 3 ORDER BY conv_id
"""


def q_response_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user->assistant response-latency percentiles per day —
    operators/temporal.py response_latency; lag-free (conv, turn+1)
    self-join, exact integer-microsecond arithmetic."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.temporal import (
        response_latency,
    )

    return response_latency(spark.table("transcripts"))


_SQL_RESPONSE_LATENCY = f"""{_CTES},
pairs AS (
  SELECT b.ts AS ts_next,
    epoch_us(b.ts) - epoch_us(a.ts) AS lat_us
  FROM transcripts a
  JOIN transcripts b
    ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1
  WHERE a.role = 'user' AND b.role = 'assistant')
SELECT strftime(ts_next, '%Y-%m-%d') AS day,
  CAST(count(*) AS BIGINT) AS n_responses,
  round(avg(lat_us) / 1000000, 6) AS avg_latency_s,
  round(quantile_cont(lat_us, 0.5) / 1000000, 6) AS p50_latency_s,
  round(quantile_cont(lat_us, 0.95) / 1000000, 6) AS p95_latency_s,
  round(max(lat_us) / 1000000.0, 6) AS max_latency_s
FROM pairs GROUP BY 1 ORDER BY day
"""


def q_cramers_v_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association for two column pairs of the transcript
    table: (role, has_tool) — near-deterministic by construction — and
    (role, day-of-week) — independent. operators/drift.py cramers_v;
    marginals are window sums over the r*c cell frame, one O(rows) pass
    per pair."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import (
        cramers_v,
    )

    t = spark.table("transcripts")
    has_tool = F.col("tool").isNotNull().cast("string")
    # engine-neutral day-of-week: days since Monday 1970-01-05, mod 7
    dow = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) % 7
    ).cast("string")
    a = cramers_v(t, F.col("role"), has_tool, "role:has_tool")
    b = cramers_v(t, F.col("role"), dow, "role:dow")
    return a.unionByName(b).orderBy("pair")


_SQL_CRAMERS_V = f"""{_CTES},
pairs AS (
  SELECT 'role:has_tool' AS pair, role AS a,
         CAST(tool IS NOT NULL AS VARCHAR) AS b
  FROM transcripts
  UNION ALL
  SELECT 'role:dow', role,
         CAST(datediff('day', DATE '1970-01-05', CAST(ts AS DATE)) % 7
              AS VARCHAR)
  FROM transcripts),
cells AS (
  SELECT pair, a, b, count(*) AS n_ab FROM pairs GROUP BY pair, a, b),
m AS (
  SELECT pair, n_ab,
    sum(n_ab) OVER (PARTITION BY pair, a) AS row_tot,
    sum(n_ab) OVER (PARTITION BY pair, b) AS col_tot,
    sum(n_ab) OVER (PARTITION BY pair) AS n,
    count(DISTINCT a) OVER (PARTITION BY pair) AS r,
    count(DISTINCT b) OVER (PARTITION BY pair) AS c
  FROM cells),
agg AS (
  -- only NONZERO cells exist in m; each zero cell contributes exp to
  -- chi2 and sum(exp) over all r*c cells = n, hence the n + sum(...-exp)
  SELECT pair,
    CAST(max(n) AS BIGINT) AS n,
    CAST(max(r) AS BIGINT) AS r,
    CAST(max(c) AS BIGINT) AS c,
    max(n) + sum((n_ab - row_tot * col_tot * 1.0 / n)
        * (n_ab - row_tot * col_tot * 1.0 / n)
        / (row_tot * col_tot * 1.0 / n)
        - row_tot * col_tot * 1.0 / n) AS chi2_raw
  FROM m GROUP BY pair)
SELECT pair, n, r, c,
  CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
  round(chi2_raw, 6) AS chi2,
  round(CASE WHEN least(r, c) > 1
             THEN sqrt(chi2_raw / (n * (least(r, c) - 1))) END, 6)
    AS cramers_v
FROM agg ORDER BY pair
"""


def q_char_bigram_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-bigram style drift between source and target corpora:
    operators/text.py char_ngrams (JVM explode) composed with
    operators/drift.py jensen_shannon — orthography-level drift the
    token-level jsd misses."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import (
        jensen_shannon,
    )
    from professional_services_data_validator_spark.operators.text import (
        char_ngrams,
    )

    return jensen_shannon(
        char_ngrams(spark.table("transcripts"), "text"),
        char_ngrams(spark.table("transcripts_target"), "text"),
        F.col("ng"),
    )


_SQL_CHAR_BIGRAM_JSD = f"""{_CTES},
src AS (
  SELECT substring(text, CAST(i AS INTEGER), 2) AS v, count(*) AS cnt
  FROM transcripts, UNNEST(range(1, length(text))) AS g(i)
  GROUP BY 1),
tgt AS (
  SELECT substring(text, CAST(i AS INTEGER), 2) AS v, count(*) AS cnt
  FROM transcripts_target, UNNEST(range(1, length(text))) AS g(i)
  GROUP BY 1),
u AS (
  SELECT coalesce(s.v, t.v) AS v,
         coalesce(s.cnt, 0) AS n_s, coalesce(t.cnt, 0) AS n_t
  FROM src s FULL OUTER JOIN tgt t ON s.v = t.v),
cells AS (
  SELECT n_s * 1.0 / sum(n_s) OVER () AS p,
         n_t * 1.0 / sum(n_t) OVER () AS q,
         sum(n_s) OVER () AS tot_s, sum(n_t) OVER () AS tot_t
  FROM u)
SELECT round(0.5 * sum(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0))
                            ELSE 0 END)
           + 0.5 * sum(CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0))
                            ELSE 0 END), 6) AS jsd,
  CAST(max(tot_s) AS BIGINT) AS n_source,
  CAST(max(tot_t) AS BIGINT) AS n_target
FROM cells
"""


def q_conv_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-LENGTH distribution KS between source and target —
    drift at conversation granularity (the %211 row deletions shorten
    target conversations). Composes a per-conv count with
    operators/drift.py ks_statistic; the KS window runs over distinct
    lengths (bounded by max conversation length), never the corpus."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.drift import (
        ks_statistic,
    )

    lens = lambda name: (  # noqa: E731 - local frame factory
        spark.table(name)
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
    out = ks_statistic(
        lens("transcripts"), lens("transcripts_target"), F.col("n_turns")
    )
    return out.select(
        F.round("ks_stat", 6).alias("ks_stat"), "n_source", "n_target"
    )


_SQL_CONV_LENGTH_KS = f"""{_CTES},
u AS (
  SELECT v, sum(ns) AS n_s, sum(nt) AS n_t FROM (
    SELECT count(*) AS v, 1 AS ns, 0 AS nt FROM transcripts GROUP BY conv_id
    UNION ALL
    SELECT count(*), 0, 1 FROM transcripts_target GROUP BY conv_id) z
  GROUP BY v),
c AS (SELECT
   sum(n_s) OVER (ORDER BY v) AS cs, sum(n_t) OVER (ORDER BY v) AS ct,
   sum(n_s) OVER () AS tot_s, sum(n_t) OVER () AS tot_t FROM u)
SELECT CAST(round(max(abs(cs * 1.0 / tot_s - ct * 1.0 / tot_t)), 6)
         AS DOUBLE) AS ks_stat,
       CAST(max(tot_s) AS BIGINT) AS n_source,
       CAST(max(tot_t) AS BIGINT) AS n_target
FROM c
"""


_TRAINING_QUERIES.update(
    {
        "loop_detection": q_loop_detection,
        "response_latency_by_day": q_response_latency,
        "cramers_v_pairs": q_cramers_v_pairs,
        "char_bigram_jsd": q_char_bigram_jsd,
        "conv_length_ks": q_conv_length_ks,
    }
)
_TRAINING_ORACLES.update(
    {
        "loop_detection": _SQL_LOOP_DETECTION,
        "response_latency_by_day": _SQL_RESPONSE_LATENCY,
        "cramers_v_pairs": _SQL_CRAMERS_V,
        "char_bigram_jsd": _SQL_CHAR_BIGRAM_JSD,
        "conv_length_ks": _SQL_CONV_LENGTH_KS,
    }
)


def q_role_sequence_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation NLL under the corpus's own role-transition model —
    operators/conversation.py role_sequence_anomaly; the (conv, prev,
    next) cell frame is persisted (two consumers), the |roles|^2 model
    joins back broadcast."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.conversation import (
        role_sequence_anomaly,
    )

    return role_sequence_anomaly(spark.table("transcripts"))


_SQL_ROLE_SEQ_ANOMALY = f"""{_CTES},
cc AS (
  SELECT a.conv_id, a.role AS prev_role, b.role AS next_role,
         count(*) AS cnt
  FROM transcripts a
  JOIN transcripts b
    ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1
  GROUP BY 1, 2, 3),
model AS (
  SELECT prev_role, next_role,
         sum(cnt) * 1.0 / sum(sum(cnt)) OVER (PARTITION BY prev_role) AS p
  FROM cc GROUP BY prev_role, next_role),
scored AS (
  SELECT cc.conv_id, cc.cnt, -ln(model.p) AS nll
  FROM cc JOIN model USING (prev_role, next_role))
SELECT conv_id,
  CAST(sum(cnt) AS BIGINT) AS n_pairs,
  round(sum(cnt * nll) / sum(cnt), 6) AS avg_nll,
  round(max(nll), 6) AS max_nll
FROM scored GROUP BY conv_id ORDER BY conv_id
"""


def q_violation_rate_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-interval gate on the per-day violation rate between
    transcripts and the defect-injected target —
    operators/row_compare.py violation_rate_gate; fails only when the
    interval's LOWER bound clears the tolerated rate."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.row_compare import (
        violation_rate_gate,
    )

    return violation_rate_gate(
        spark.table("transcripts"),
        spark.table("transcripts_target"),
        ["conv_id", "turn_idx"],
        ["text", "tool"],
        threshold=0.003,
    )


_SQL_VIOLATION_RATE_GATE = f"""{_CTES},
j AS (
  SELECT coalesce(s.ts, t.ts) AS d,
    CASE WHEN s.conv_id IS NULL OR t.conv_id IS NULL
           OR s.text IS DISTINCT FROM t.text
           OR s.tool IS DISTINCT FROM t.tool
         THEN 1 ELSE 0 END AS v
  FROM transcripts s
  FULL OUTER JOIN transcripts_target t
    ON s.conv_id = t.conv_id AND s.turn_idx = t.turn_idx),
g AS (
  SELECT strftime(d, '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(v) AS BIGINT) AS n_violations
  FROM j GROUP BY 1)
SELECT day, n_rows, n_violations,
  round(n_violations * 1.0 / n_rows, 6) AS rate,
  round((n_violations * 1.0 / n_rows + 1.96 * 1.96 / (2 * n_rows)
         - 1.96 * sqrt((n_violations * 1.0 / n_rows)
                       * (1 - n_violations * 1.0 / n_rows) / n_rows
                       + 1.96 * 1.96 / (4 * n_rows * n_rows)))
        / (1 + 1.96 * 1.96 / n_rows), 6) AS wilson_lower,
  round((n_violations * 1.0 / n_rows + 1.96 * 1.96 / (2 * n_rows)
         + 1.96 * sqrt((n_violations * 1.0 / n_rows)
                       * (1 - n_violations * 1.0 / n_rows) / n_rows
                       + 1.96 * 1.96 / (4 * n_rows * n_rows)))
        / (1 + 1.96 * 1.96 / n_rows), 6) AS wilson_upper,
  CASE WHEN (n_violations * 1.0 / n_rows + 1.96 * 1.96 / (2 * n_rows)
             - 1.96 * sqrt((n_violations * 1.0 / n_rows)
                           * (1 - n_violations * 1.0 / n_rows) / n_rows
                           + 1.96 * 1.96 / (4 * n_rows * n_rows)))
            / (1 + 1.96 * 1.96 / n_rows) > 0.003
       THEN 'fail' ELSE 'success' END AS validation_status
FROM g ORDER BY day
"""


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point localization on per-(role, day) row counts with
    a planted level shift (a third of assistant rows dropped from
    2024-01-16 on) — operators/temporal.py cusum_changepoint; windows run
    over the O(days) series, never corpus rows."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.temporal import (
        cusum_changepoint,
    )

    t = spark.table("transcripts")
    planted = t.filter(
        ~(
            (F.col("role") == "assistant")
            & (F.col("ts") >= "2024-01-16")
            & (F.col("event_id") % 3 == 0)
        )
    )
    series = planted.groupBy(
        "role", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return cusum_changepoint(series, ["role"], "day", "n")


_SQL_CUSUM_CHANGEPOINT = f"""{_CTES},
planted AS (
  SELECT * FROM transcripts
  WHERE NOT (role = 'assistant' AND ts >= TIMESTAMP '2024-01-16'
             AND event_id % 3 = 0)),
series AS (
  SELECT role, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
  FROM planted GROUP BY 1, 2),
staged0 AS (
  SELECT role, day, n,
    avg(n) OVER (PARTITION BY role) AS mean,
    stddev_samp(n) OVER (PARTITION BY role) AS std,
    count(*) OVER (PARTITION BY role) AS n_pts
  FROM series),
staged AS (
  SELECT role, day, mean, std, n_pts,
    abs(sum(n - mean) OVER (PARTITION BY role ORDER BY day)) AS abs_s
  FROM staged0),
m AS (SELECT *, max(abs_s) OVER (PARTITION BY role) AS max_s FROM staged)
SELECT role,
  CAST(max(n_pts) AS BIGINT) AS n_points,
  round(max(mean), 6) AS mean,
  round(CASE WHEN max(std) > 0
             THEN max(max_s) / (max(std) * sqrt(max(n_pts))) END, 6)
    AS cusum_stat,
  min(CASE WHEN abs_s = max_s THEN day END) AS changepoint,
  coalesce(CASE WHEN max(std) > 0
                THEN max(max_s) / (max(std) * sqrt(max(n_pts))) > 1.358
           END, FALSE) AS drifted
FROM m GROUP BY role ORDER BY role
"""


_TRAINING_QUERIES.update(
    {
        "role_sequence_anomaly": q_role_sequence_anomaly,
        "violation_rate_gate": q_violation_rate_gate,
        "cusum_changepoint": q_cusum_changepoint,
    }
)
_TRAINING_ORACLES.update(
    {
        "role_sequence_anomaly": _SQL_ROLE_SEQ_ANOMALY,
        "violation_rate_gate": _SQL_VIOLATION_RATE_GATE,
        "cusum_changepoint": _SQL_CUSUM_CHANGEPOINT,
    }
)


def q_conv_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-conversation repeated-turn profile with a planted
    alternating A-B loop slice (turn_idx % 13 in (2,4) share one text,
    (3,5) another — invisible to adjacent-run loop_detection) —
    operators/conversation.py conv_redundancy."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.conversation import (
        conv_redundancy,
    )

    t = spark.table("transcripts")
    planted = t.withColumn(
        "text",
        F.when((F.col("turn_idx") % 13).isin(2, 4), F.lit("PING"))
        .when((F.col("turn_idx") % 13).isin(3, 5), F.lit("PONG"))
        .otherwise(F.col("text")),
    ).withColumn(
        "role",
        F.when(
            (F.col("turn_idx") % 13).isin(2, 3, 4, 5), F.lit("assistant")
        ).otherwise(F.col("role")),
    )
    return conv_redundancy(planted, min_repeats=2)


_SQL_CONV_REDUNDANCY = f"""{_CTES},
planted AS (
  SELECT conv_id,
    CASE WHEN turn_idx % 13 IN (2,3,4,5) THEN 'assistant' ELSE role END
      AS role,
    CASE WHEN turn_idx % 13 IN (2,4) THEN 'PING'
         WHEN turn_idx % 13 IN (3,5) THEN 'PONG'
         ELSE text END AS text
  FROM transcripts),
cells AS (
  SELECT conv_id,
    coalesce(role, chr(0) || 'NULL') || chr(1)
      || coalesce(text, chr(0) || 'NULL') AS k,
    count(*) AS cnt
  FROM planted GROUP BY 1, 2),
per_conv AS (
  SELECT conv_id,
    CAST(sum(cnt) AS BIGINT) AS n_turns,
    CAST(count(*) AS BIGINT) AS n_distinct,
    CAST(max(cnt) AS BIGINT) AS max_repeats
  FROM cells GROUP BY conv_id)
SELECT conv_id, n_turns, n_distinct,
  round(1 - n_distinct * 1.0 / n_turns, 6) AS redundancy,
  max_repeats
FROM per_conv WHERE max_repeats >= 2 ORDER BY conv_id
"""


_TRAINING_QUERIES["conv_redundancy"] = q_conv_redundancy
_TRAINING_ORACLES["conv_redundancy"] = _SQL_CONV_REDUNDANCY


def q_row_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-aware numeric row validation over events vs a planted
    target copy: event_id % 7 = 0 gets an ULP-scale relative jitter
    (1e-10, PASSES rel_tol 1e-9), % 97 = 0 a real +0.5 shift (fails),
    % 211 = 0 a nulled value (null_mismatch) —
    operators/row_compare.py row_tolerance_violations."""
    _prep(spark, sf_dir)
    ev = spark.table("events")
    tgt = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 211 == 0, F.lit(None).cast("double"))
        .when(F.col("event_id") % 97 == 0, F.col("value") + F.lit(0.5))
        .when(
            F.col("event_id") % 7 == 0,
            F.col("value") * F.lit(1.0000000001),
        )
        .otherwise(F.col("value")),
    )
    from professional_services_data_validator_spark.operators.row_compare import (
        row_tolerance_violations,
    )

    return row_tolerance_violations(
        ev, tgt, ["event_id"], ["value"], rel_tol=1e-9
    )


_SQL_ROW_TOLERANCE = """
WITH tgt AS (
  SELECT event_id,
    CASE WHEN event_id % 211 = 0 THEN NULL
         WHEN event_id % 97 = 0 THEN value + 0.5
         WHEN event_id % 7 = 0 THEN value * 1.0000000001
         ELSE value END AS value
  FROM events),
j AS (
  SELECT s.event_id, s.value AS sv, t.value AS tv
  FROM events s JOIN tgt t USING (event_id)),
flagged AS (
  SELECT event_id, 'value' AS "column", sv AS source_value,
    tv AS target_value,
    CASE WHEN sv IS NOT NULL AND tv IS NOT NULL
              AND NOT isnan(sv) AND NOT isnan(tv)
         THEN abs(sv - tv) END AS abs_diff,
    CASE WHEN sv IS NOT NULL AND tv IS NOT NULL
              AND NOT isnan(sv) AND NOT isnan(tv)
              AND greatest(abs(sv), abs(tv)) > 0
         THEN abs(sv - tv) / greatest(abs(sv), abs(tv)) END AS rel_diff,
    CASE WHEN (sv IS NULL) != (tv IS NULL) THEN 'null_mismatch'
         WHEN sv IS NOT NULL AND tv IS NOT NULL
              AND (isnan(sv) != isnan(tv)) THEN 'nan_mismatch'
         WHEN sv IS NOT NULL AND tv IS NOT NULL
              AND NOT isnan(sv) AND NOT isnan(tv)
              AND abs(sv - tv) >
                  greatest(0.0, 1e-9 * greatest(abs(sv), abs(tv)))
         THEN 'exceeds_tolerance' END AS reason
  FROM j)
SELECT * FROM flagged WHERE reason IS NOT NULL
ORDER BY event_id, "column"
"""


def q_mismatch_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triage of text mismatches by Jaro similarity over a target with
    four planted mutation classes (append / truncate / full rewrite /
    nulled) — operators/row_compare.py mismatch_severity; the
    Arrow-batched UDF runs over the RARE mismatching rows only."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.row_compare import (
        mismatch_severity,
    )

    t = spark.table("transcripts")
    planted = t.withColumn(
        "text",
        F.when(F.col("event_id") % 223 == 0, F.lit(None).cast("string"))
        .when(
            F.col("event_id") % 211 == 3,
            F.lit("COMPLETELY DIFFERENT CONTENT xyz"),
        )
        .when(
            F.col("event_id") % 89 == 0,
            F.substring(
                F.col("text"), 1, F.floor(F.length("text") / 2).cast("int")
            ),
        )
        .when(
            F.col("event_id") % 193 == 0,
            F.concat(F.col("text"), F.lit(" MUTATED")),
        )
        .otherwise(F.col("text")),
    )
    return mismatch_severity(t, planted, ["conv_id", "turn_idx"], "text")


_SQL_MISMATCH_SEVERITY = f"""{_CTES},
planted AS (
  SELECT conv_id, turn_idx,
    CASE WHEN event_id % 223 = 0 THEN NULL
         WHEN event_id % 211 = 3 THEN 'COMPLETELY DIFFERENT CONTENT xyz'
         WHEN event_id % 89 = 0
           THEN substring(text, 1, CAST(floor(length(text) / 2.0) AS INTEGER))
         WHEN event_id % 193 = 0 THEN text || ' MUTATED'
         ELSE text END AS text
  FROM transcripts),
mism AS (
  SELECT jaro_similarity(s.text, t.text) AS sim,
         (s.text IS NULL OR t.text IS NULL) AS has_null
  FROM transcripts s
  JOIN planted t
    ON s.conv_id = t.conv_id AND s.turn_idx = t.turn_idx
  WHERE s.text IS DISTINCT FROM t.text),
classed AS (
  SELECT CASE WHEN has_null THEN 'null_change'
              WHEN sim >= 0.9 THEN 'minor_edit'
              WHEN sim >= 0.7 THEN 'partial_rewrite'
              ELSE 'rewrite' END AS severity,
         CASE WHEN has_null THEN NULL ELSE sim END AS sim
  FROM mism)
SELECT severity,
  CAST(count(*) AS BIGINT) AS n,
  round(avg(sim), 6) AS avg_sim,
  round(min(sim), 6) AS min_sim
FROM classed GROUP BY severity ORDER BY severity
"""


_TRAINING_QUERIES.update(
    {
        "row_tolerance_violations": q_row_tolerance,
        "mismatch_severity": q_mismatch_severity,
    }
)
_TRAINING_ORACLES.update(
    {
        "row_tolerance_violations": _SQL_ROW_TOLERANCE,
        "mismatch_severity": _SQL_MISMATCH_SEVERITY,
    }
)


def q_cross_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs that straddle the doc_id-keyed train/val/test split
    — eval contamination the exact-split guarantee cannot see
    (operators/sampling.py cross_split_leakage: LSH pairs broadcast-joined
    to the map-only split assignment)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.sampling import (
        cross_split_leakage,
    )

    return cross_split_leakage(
        spark.table("documents"), "doc_id", "text", ["doc_id"],
        {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42,
        k=3, num_hashes=16, bands=4, threshold=0.5,
    )


def _cross_split_leakage_oracle_sql() -> str:
    from professional_services_data_validator_spark.operators.sampling import (
        split_thresholds,
    )

    t_train, t_val = split_thresholds(
        {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    split_case = f"""CASE
    WHEN substring(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8)
         < '{t_train}' THEN 'train'
    WHEN substring(md5('42|' || CAST(doc_id AS VARCHAR)), 1, 8)
         < '{t_val}' THEN 'val'
    ELSE 'test'
  END"""
    return f"""
WITH pairs AS ({_SQL_LSH_DEDUP}),
splits AS (SELECT doc_id, {split_case} AS split FROM documents)
SELECT p.id_a, p.id_b, p.jaccard,
       sa.split AS split_a, sb.split AS split_b
FROM pairs p
JOIN splits sa ON sa.doc_id = p.id_a
JOIN splits sb ON sb.doc_id = p.id_b
WHERE sa.split <> sb.split
ORDER BY id_a, id_b
"""


_TRAINING_QUERIES["cross_split_leakage"] = q_cross_split_leakage
_TRAINING_ORACLES["cross_split_leakage"] = _cross_split_leakage_oracle_sql()


def q_transition_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-transition-matrix drift source vs target: conditional
    P(next_role | prev_role) compared cell-by-cell with per-prev TVD and a
    source-weighted matrix drift (operators/conversation.transition_drift)
    — the structural complement of the marginal drift family
    (drift_psi_role / drift_jsd_role). Same deterministic event_id % 7
    role flip as drift_jsd_role so the drift is nonzero."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.conversation import (
        transition_drift,
    )

    tgt = spark.table("transcripts_target").withColumn(
        "role",
        F.when(F.col("event_id") % 7 == 0, F.lit("assistant")).otherwise(
            F.col("role")
        ),
    )
    return transition_drift(spark.table("transcripts"), tgt)


_SQL_TRANSITION_DRIFT = f"""{_CTES},
tgt AS (
  SELECT conv_id, turn_idx,
         CASE WHEN event_id % 7 = 0 THEN 'assistant' ELSE role END AS role
  FROM transcripts_target),
cs AS (
  SELECT a.role AS prev_role, b.role AS next_role, count(*) AS n
  FROM transcripts a JOIN transcripts b
    ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1
  GROUP BY 1, 2),
ct AS (
  SELECT a.role AS prev_role, b.role AS next_role, count(*) AS n
  FROM tgt a JOIN tgt b
    ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1
  GROUP BY 1, 2),
u AS (
  SELECT prev_role, next_role,
         CAST(sum(ns) AS BIGINT) AS n_source,
         CAST(sum(nt) AS BIGINT) AS n_target
  FROM (SELECT prev_role, next_role, n AS ns, 0 AS nt FROM cs
        UNION ALL
        SELECT prev_role, next_role, 0, n FROM ct) z
  GROUP BY 1, 2),
s1 AS (
  SELECT prev_role, next_role, n_source, n_target,
    CASE WHEN sum(n_source) OVER (PARTITION BY prev_role) > 0
         THEN n_source * 1.0 / sum(n_source) OVER (PARTITION BY prev_role)
         ELSE 0.0 END AS ps,
    CASE WHEN sum(n_target) OVER (PARTITION BY prev_role) > 0
         THEN n_target * 1.0 / sum(n_target) OVER (PARTITION BY prev_role)
         ELSE 0.0 END AS pt,
    sum(n_source) OVER (PARTITION BY prev_role) AS tsp
  FROM u),
s2 AS (
  SELECT *,
    0.5 * sum(abs(ps - pt)) OVER (PARTITION BY prev_role) AS tvd_prev_raw,
    sum(n_source) OVER () AS gs
  FROM s1)
SELECT prev_role, next_role, n_source, n_target,
  round(ps, 6) AS p_source,
  round(pt, 6) AS p_target,
  round(tvd_prev_raw, 6) AS tvd_prev,
  round(sum((tsp * 1.0 / gs) * 0.5 * abs(ps - pt)) OVER (), 6) AS w_drift
FROM s2 ORDER BY prev_role, next_role
"""


def q_context_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window budget check: conversations whose cumulative
    BPE-estimate token cost (text.bpe_cost, a JVM array fold) crosses 480
    tokens, with the first overflowing turn and the truncation-survivor
    count (operators/conversation.context_budget_overflow)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.conversation import (
        context_budget_overflow,
    )

    return context_budget_overflow(spark.table("transcripts"), budget=480)


_SQL_CONTEXT_BUDGET = f"""{_CTES},
per AS (
  SELECT conv_id, turn_idx,
    CAST(coalesce(list_sum(list_transform(
        regexp_split_to_array(trim(text), ' +'),
        w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT) AS cost
  FROM transcripts),
c AS (
  SELECT conv_id, turn_idx, cost,
    sum(cost) OVER (PARTITION BY conv_id ORDER BY turn_idx, cost
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM per)
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(cost) AS BIGINT) AS total_tokens,
  CAST(min(CASE WHEN cum > 480 THEN turn_idx END) AS INT)
    AS overflow_turn_idx,
  CAST(count(CASE WHEN cum <= 480 THEN 1 END) AS BIGINT)
    AS turns_within_budget
FROM c GROUP BY conv_id
HAVING min(CASE WHEN cum > 480 THEN turn_idx END) IS NOT NULL
ORDER BY conv_id
"""


_TRAINING_QUERIES["transition_drift"] = q_transition_drift
_TRAINING_ORACLES["transition_drift"] = _SQL_TRANSITION_DRIFT
_TRAINING_QUERIES["context_budget_overflow"] = q_context_budget
_TRAINING_ORACLES["context_budget_overflow"] = _SQL_CONTEXT_BUDGET


def q_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa source vs target, PK-paired on (conv_id, turn_idx):
    chance-corrected label agreement (operators/aggregates.cohens_kappa).
    Two labels: role (with the deterministic event_id % 7 flip, so kappa
    is meaningfully < 1) and tool (NULL-heavy — exercises the reserved
    NULL-sentinel class: a label wiped by ETL is real disagreement)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.aggregates import (
        cohens_kappa,
    )

    src = spark.table("transcripts")
    tgt = spark.table("transcripts_target").withColumn(
        "role",
        F.when(F.col("event_id") % 7 == 0, F.lit("assistant")).otherwise(
            F.col("role")
        ),
    )
    return cohens_kappa(
        src, tgt, ["conv_id", "turn_idx"], ["role", "tool"]
    )


_SQL_LABEL_AGREEMENT = f"""{_CTES},
tgt AS (
  SELECT conv_id, turn_idx,
         CASE WHEN event_id % 7 = 0 THEN 'assistant' ELSE role END AS role,
         tool
  FROM transcripts_target),
pairs AS (
  SELECT s.conv_id, s.turn_idx,
         coalesce(CAST(s.role AS VARCHAR), chr(0) || 'NULL') AS a_role,
         coalesce(CAST(t.role AS VARCHAR), chr(0) || 'NULL') AS b_role,
         coalesce(CAST(s.tool AS VARCHAR), chr(0) || 'NULL') AS a_tool,
         coalesce(CAST(t.tool AS VARCHAR), chr(0) || 'NULL') AS b_tool
  FROM transcripts s JOIN tgt t
    ON s.conv_id = t.conv_id AND s.turn_idx = t.turn_idx),
k AS (
  SELECT 'role' AS label, a_role AS a, b_role AS b FROM pairs
  UNION ALL
  SELECT 'tool', a_tool, b_tool FROM pairs),
joint AS (
  SELECT label, a, b, count(*) AS nab FROM k GROUP BY 1, 2, 3),
tot AS (
  SELECT label, sum(nab) AS n,
         sum(CASE WHEN a = b THEN nab ELSE 0 END) AS n_agree
  FROM joint GROUP BY 1),
marg AS (
  SELECT label, c, sum(na) AS na, sum(nb) AS nb FROM (
    SELECT label, a AS c, nab AS na, 0 AS nb FROM joint
    UNION ALL
    SELECT label, b, 0, nab FROM joint) z
  GROUP BY 1, 2),
pe AS (
  SELECT m.label, sum((m.na * 1.0 / t.n) * (m.nb * 1.0 / t.n)) AS pe
  FROM marg m JOIN tot t USING (label) GROUP BY 1)
SELECT t.label,
  CAST(t.n AS BIGINT) AS n_pairs,
  round(t.n_agree * 1.0 / t.n, 6) AS observed_agreement,
  round(p.pe, 6) AS expected_agreement,
  round(CASE WHEN (1 - p.pe) > 1e-12
             THEN (t.n_agree * 1.0 / t.n - p.pe) / (1 - p.pe)
             ELSE 1.0 END, 6) AS kappa
FROM tot t JOIN pe p USING (label)
ORDER BY label
"""


_TRAINING_QUERIES["label_agreement_kappa"] = q_label_agreement
_TRAINING_ORACLES["label_agreement_kappa"] = _SQL_LABEL_AGREEMENT


def q_embedding_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-novelty gate: the vec_id % 5 == 0 slice plays the incoming
    batch, the rest the already-ingested corpus
    (operators/similarity.embedding_novelty — SRP chunk blocking CROSS-
    TABLE, no corpus self-join; same bits/seed as the SRP pair queries)."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.similarity import (
        embedding_novelty,
    )

    emb = spark.table("embeddings")
    return embedding_novelty(
        emb.filter(F.col("vec_id") % 5 == 0),
        emb.filter(F.col("vec_id") % 5 != 0),
        bits=16, seed=42, max_hamming=3, min_cosine=0.2, dim=64,
    )


def _embedding_novelty_oracle_sql() -> str:
    from professional_services_data_validator_spark.operators.similarity import (
        srp_planes,
    )

    planes = srp_planes(64, 16, 42)
    bit_terms = []
    for b, plane in enumerate(planes):
        lits = ", ".join(f"{float(x)}" for x in plane)
        bit_terms.append(
            f"(CASE WHEN list_dot_product("
            f"list_transform(embedding, x -> CAST(x AS DOUBLE)), "
            f"[{lits}]) >= 0 THEN {2 ** b} ELSE 0 END)"
        )
    sig_expr = " + ".join(bit_terms)
    return f"""
WITH sig AS (
  SELECT vec_id AS id, embedding, vec_id % 5 = 0 AS is_new,
         CAST({sig_expr} AS BIGINT) AS srp_sig
  FROM embeddings),
chunks AS (
  SELECT id, srp_sig, is_new, u.i AS chunk_idx,
         (srp_sig >> (u.i * 4)) % 16 AS chunk_val
  FROM sig, UNNEST(range(0, 4)) AS u(i)),
cand AS (
  SELECT DISTINCT n.id AS id_n, o.id AS id_o
  FROM chunks n JOIN chunks o
    ON n.chunk_idx = o.chunk_idx AND n.chunk_val = o.chunk_val
  WHERE n.is_new AND NOT o.is_new),
verified AS (
  SELECT c.id_n, c.id_o,
    round(list_cosine_similarity(
      list_transform(sn.embedding, x -> CAST(x AS DOUBLE)),
      list_transform(so.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
  FROM cand c
  JOIN sig sn ON sn.id = c.id_n
  JOIN sig so ON so.id = c.id_o
  WHERE bit_count(xor(sn.srp_sig, so.srp_sig)) <= 3),
hits AS (SELECT * FROM verified WHERE cos >= 0.2),
ranked AS (
  SELECT id_n, id_o, cos,
    row_number() OVER (PARTITION BY id_n ORDER BY cos DESC, id_o DESC) AS rn,
    count(*) OVER (PARTITION BY id_n) AS n_all,
    max(cos) OVER (PARTITION BY id_n) AS cos_all
  FROM hits),
matched AS (
  SELECT id_n, CAST(n_all AS BIGINT) AS n_matches,
         CAST(cos_all AS DOUBLE) AS max_cos, id_o AS nearest_id
  FROM ranked WHERE rn = 1)
SELECT s.id,
  coalesce(m.n_matches, 0) AS n_matches,
  m.max_cos,
  m.nearest_id,
  m.n_matches IS NULL AS is_novel
FROM sig s LEFT JOIN matched m ON m.id_n = s.id
WHERE s.is_new
ORDER BY s.id
"""


_TRAINING_QUERIES["embedding_novelty"] = q_embedding_novelty
_TRAINING_ORACLES["embedding_novelty"] = _embedding_novelty_oracle_sql()


def q_canned_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned-response profile (operators/text.canned_turns). The synthetic
    corpus has no verbatim cross-conversation repeats, so two canned
    strings are planted deterministically (event_id % 97 / % 89 — the
    pii_scrub precedent: both engines replay the identical injection) and
    the profiler must surface exactly them."""
    _prep(spark, sf_dir)
    from professional_services_data_validator_spark.operators.text import (
        canned_turns,
    )

    t = spark.table("transcripts").withColumn(
        "text",
        F.when(
            F.col("event_id") % 97 == 0,
            F.lit("I cannot help with that request."),
        )
        .when(
            F.col("event_id") % 89 == 0,
            F.lit("Thanks for contacting support!"),
        )
        .otherwise(F.col("text")),
    )
    return canned_turns(t, min_convs=2, top_k=50)


_SQL_CANNED_TURNS = f"""{_CTES},
planted AS (
  SELECT conv_id,
    CASE WHEN event_id % 97 = 0 THEN 'I cannot help with that request.'
         WHEN event_id % 89 = 0 THEN 'Thanks for contacting support!'
         ELSE text END AS text
  FROM transcripts),
agg AS (
  SELECT text,
         CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
         CAST(count(*) AS BIGINT) AS n_occurrences
  FROM planted WHERE text IS NOT NULL
  GROUP BY text HAVING count(DISTINCT conv_id) >= 2)
SELECT text, n_convs, n_occurrences,
  CAST(row_number() OVER (ORDER BY n_convs DESC, n_occurrences DESC, text)
       AS INT) AS rank
FROM agg
QUALIFY rank <= 50
ORDER BY rank
"""


_TRAINING_QUERIES["canned_response_profile"] = q_canned_turns
_TRAINING_ORACLES["canned_response_profile"] = _SQL_CANNED_TURNS
