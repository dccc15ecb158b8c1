"""Sources: parquet/csv/json/orc readers, custom-query tables, and the
deterministic transcripts derivation.

Reference analogs:
- table scan / FileSystem connection (reference data_validation/clients.py:
  117-167) -> ``spark.read.<format>`` / ``spark.read.table``;
- custom-query scan with lowercased columns (reference clients.py:170-176)
  -> ``spark.sql`` + ``toDF(lowercased)``.

Transcripts model (BASELINE.json input_hint):
    (conv_id string, turn_idx int, role string, text string, tool string,
     ts timestamp)
derived 100% deterministically from the driver's ``events`` parquet so that a
DuckDB oracle can materialize the byte-identical table from the same SQL
template. The "target" variant injects deterministic defects (mutated text,
dropped rows, nulled tools) keyed on event_id, exercising every fail path the
reference's fixtures cover (FIXTURES.md F1).

At 10^12-turn scale the same derivation is irrelevant — the engine reads an
Iceberg/parquet transcripts table directly; these helpers exist for tests,
oracles and benchmarks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

TRANSCRIPT_TABLES = ("transcripts", "transcripts_target", "dim_conversations")

# One SQL template, two dialects: {str} -> STRING (Spark) / VARCHAR (DuckDB).
# Derivation notes:
# - conv_id groups events by user; turn order = (ts, event_id), unique since
#   event_id is unique -> stable turn ordering (window-ranked, BASELINE).
# - role is a 4:4:1:1 enum keyed on event_id (user/assistant/system/tool).
# - text concatenates event_type + props (deterministic pseudo-text).
# - tool is NULL except for role='tool' rows (null-rate / IFNULL paths).
_TRANSCRIPTS_TMPL = """
SELECT
  'c' || CAST(user_id AS {str}) AS conv_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
       AS INTEGER) AS turn_idx,
  CASE WHEN event_id % 10 < 4 THEN 'user'
       WHEN event_id % 10 < 8 THEN 'assistant'
       WHEN event_id % 10 < 9 THEN 'system'
       ELSE 'tool' END AS role,
  event_type || ' ' || props || ' u' || CAST(user_id AS {str})
      || ' e' || CAST(event_id % 97 AS {str}) AS text,
  CASE WHEN event_id % 10 = 9 THEN 'tool_' || CAST(event_id % 5 AS {str})
       ELSE NULL END AS tool,
  ts,
  event_id
FROM {events}
"""

# Target copy defects, keyed on the carried-through event_id:
# - event_id % 211 = 0  -> row deleted            (outer-join-null fail)
# - event_id % 193 = 0  -> text mutated           (row-hash fail)
# - event_id % 177 = 5  -> tool nulled            (null-vs-value fail)
_TARGET_TMPL = """
SELECT
  conv_id,
  turn_idx,
  role,
  CASE WHEN event_id % 193 = 0 THEN text || ' MUTATED' ELSE text END AS text,
  CASE WHEN event_id % 177 = 5 THEN NULL ELSE tool END AS tool,
  ts,
  event_id
FROM ({base}) __t
WHERE event_id % 211 <> 0
"""

# Conversation dimension for referential-integrity checks (FIXTURES.md F2):
# deliberately EXCLUDES conv_ids of users with user_id % 53 = 7 so orphans
# exist in the fact table.
_DIM_CONV_TMPL = """
SELECT
  'c' || CAST(user_id AS {str}) AS conv_id,
  'ch' || CAST(user_id % 7 AS {str}) AS channel,
  MIN(ts) AS started_ts
FROM {events}
WHERE user_id % 53 <> 7
GROUP BY user_id
"""


def transcripts_sql(dialect: str = "spark", events: str = "events") -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    return _TRANSCRIPTS_TMPL.format(str=str_t, events=events)


def target_transcripts_sql(dialect: str = "spark", events: str = "events") -> str:
    return _TARGET_TMPL.format(base=transcripts_sql(dialect, events))


def dim_conversations_sql(dialect: str = "spark", events: str = "events") -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    return _DIM_CONV_TMPL.format(str=str_t, events=events)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan. Catalyst pushes filters/projections into the scan; at
    production scale this is ``spark.read.table('catalog.db.transcripts')``
    over Iceberg with partition pruning on day(ts)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_file(
    spark: SparkSession, path: str, fmt: str = "parquet", **options
) -> DataFrame:
    """FileSystem connection analog (reference clients.py:117-137):
    csv/json/orc/parquet with sane defaults. CSV gets header+inferSchema
    like the reference's pandas reader defaults."""
    fmt = fmt.lower()
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt not in ("csv", "json", "orc", "parquet"):
        raise ValueError(f"unsupported file format {fmt!r}")
    return getattr(reader, fmt)(path)


def find_tables(
    spark: SparkSession, score_cutoff: float = 0.8
) -> list[dict]:
    """``find-tables`` analog (reference clients.py:203-241 +
    jellyfish_distance.py:18-35): list catalog tables and fuzzy-match names
    by Jaro similarity. Driver-side by nature (catalog metadata is tiny)."""
    names = [t.name for t in spark.catalog.listTables()]
    out = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            s = jaro_similarity(a, b)
            if s >= score_cutoff:
                out.append(
                    {"source_table": a, "target_table": b, "score": round(s, 4)}
                )
    return out


def jaro_similarity(s1: str, s2: str) -> float:
    """Plain Jaro similarity (public algorithm; the reference delegates to
    the jellyfish library)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    s1_matches = [False] * len1
    s2_matches = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not s2_matches[j] and s2[j] == c:
                s1_matches[i] = s2_matches[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if s1_matches[i]:
            while not s2_matches[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (
        matches / len1 + matches / len2 + (matches - t) / matches
    ) / 3.0


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register the driver testdata as temp views."""
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


def replicate_events(events: DataFrame, factor: int):
    """Deterministically scale the events table by ``factor`` inside Spark:
    each replica shifts user_id/event_id into a disjoint range, so
    conversation-size distribution is preserved while conversation count
    scales. Used by the bench scaling protocol to get compute-bound inputs
    without external data."""
    from pyspark.sql import functions as F

    r = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    rep = events.select("*", r)
    rl = F.col("__r").cast("long")
    return rep.select(
        (F.col("event_id") + rl * F.lit(1_000_000_000)).alias("event_id"),
        "ts",
        (F.col("user_id") + rl * F.lit(1_000_000)).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).repartition(64, "user_id")


def replicate_documents(docs: DataFrame, factor: int):
    """Deterministically scale the documents corpus by ``factor`` inside
    Spark for the docs-shape scaling protocol (dedup / curation jobs).

    Each replica shifts doc_id into a disjoint range; replica 0 keeps the
    original text, every other replica prefixes each token with a replica
    tag (``qkq``) so replicas share NO shingles. This preserves the
    intra-replica duplicate structure exactly (the dup rate the LSH /
    connected-components workload is sized by) while avoiding the
    quadratic cross-replica near-dup blowup verbatim copies would create
    (every doc would gain factor-1 twins, growing LSH pairs by
    C(factor, 2) per doc — a different workload, not a bigger one).
    """
    from pyspark.sql import functions as F

    r = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    rep = docs.select("*", r)
    tag = F.concat(F.lit(" q"), F.col("__r").cast("string"), F.lit("q"))
    # prepend a space before replacing so the FIRST token is tagged too —
    # the leading " qkq" merges into it ("a b" -> " qkqa qkqb" -> trim)
    tagged = F.trim(
        F.regexp_replace(F.concat(F.lit(" "), F.col("text")), F.lit(" "), tag)
    )
    return rep.select(
        (F.col("doc_id") + F.col("__r").cast("long") * F.lit(10_000_000_000))
        .alias("doc_id"),
        F.when(F.col("__r") == 0, F.col("text")).otherwise(tagged)
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    ).repartition(64, "doc_id")


def register_transcripts(
    spark: SparkSession, sf_dir: str, cache: bool = False, replicate: int = 1
) -> None:
    """Register transcripts / transcripts_target / dim_conversations views
    derived from the events parquet (deterministic; oracle-replicable).

    ``cache=True`` persists the derived tables (MEMORY_AND_DISK): in
    production the transcripts table is a stored Iceberg table, so the
    benchmark measures validation work, not fixture re-derivation.
    """
    events = read_table(spark, sf_dir, "events")
    if replicate > 1:
        events = replicate_events(events, replicate)
    events.createOrReplaceTempView("events")
    views = {
        "transcripts": transcripts_sql("spark"),
        "transcripts_target": target_transcripts_sql("spark"),
        "dim_conversations": dim_conversations_sql("spark"),
    }
    for name, sql in views.items():
        df = spark.sql(sql)
        if cache:
            df = df.persist()
        df.createOrReplaceTempView(name)


def duckdb_transcript_ctes(events: str = "events") -> str:
    """WITH-clause header so oracle SQL can reference the same three views."""
    return (
        "WITH transcripts AS ({t}), transcripts_target AS ({tt}), "
        "dim_conversations AS ({dc})"
    ).format(
        t=transcripts_sql("duckdb", events),
        tt=target_transcripts_sql("duckdb", events),
        dc=dim_conversations_sql("duckdb", events),
    )


def custom_query(spark: SparkSession, sql: str) -> DataFrame:
    """Custom-query scan; lowercases result columns like the reference
    (clients.py:170-176)."""
    df = spark.sql(sql)
    return df.toDF(*[c.lower() for c in df.columns])
