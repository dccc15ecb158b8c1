"""Snapshot-diff validation (operators/snapshot.py): status classification
on hand-built version pairs, per-partition rollup + revalidate flags, and
the plan-shape guarantees (hash before the exchange; one join)."""

from pyspark.sql import functions as F

from professional_services_data_validator_spark.operators.snapshot import (
    snapshot_diff,
    snapshot_diff_rows,
    snapshot_diff_summary,
)

COLS = ["id", "part", "val", "txt"]


def _versions(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10, "x"),   # unchanged
            (2, "a", 20, "y"),   # changed (val)
            (3, "b", 30, "z"),   # removed
            (5, "b", 50, None),  # unchanged (NULL compare col)
        ],
        COLS,
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10, "x"),
            (2, "a", 21, "y"),
            (4, "b", 40, "w"),   # added
            (5, "b", 50, None),
        ],
        COLS,
    )
    return old, new


def test_status_classification(spark):
    old, new = _versions(spark)
    got = {
        r["id"]: r["diff_status"]
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {
        1: "unchanged", 2: "changed", 3: "removed", 4: "added",
        5: "unchanged",
    }


def test_rows_filter_drops_unchanged(spark):
    old, new = _versions(spark)
    rows = snapshot_diff_rows(old, new, ["id"]).collect()
    assert {r["id"] for r in rows} == {2, 3, 4}


def test_compare_column_subset(spark):
    """Columns outside compare_columns don't flag a change."""
    old, new = _versions(spark)
    got = {
        r["id"]: r["diff_status"]
        for r in snapshot_diff(
            old, new, ["id"], compare_columns=["txt"]
        ).collect()
    }
    assert got[2] == "unchanged"  # only val differs, txt identical


def test_summary_counts_and_revalidate(spark):
    old, new = _versions(spark)
    summ = {
        r["partition_id"]: r
        for r in snapshot_diff_summary(
            old, new, ["id"], F.col("part")
        ).collect()
    }
    a, b = summ["a"], summ["b"]
    assert (a["n_added"], a["n_removed"], a["n_changed"],
            a["n_unchanged"]) == (0, 0, 1, 1)
    assert (b["n_added"], b["n_removed"], b["n_changed"],
            b["n_unchanged"]) == (1, 1, 0, 1)
    assert a["revalidate"] and b["revalidate"]


def test_clean_partition_not_revalidated(spark):
    old, _ = _versions(spark)
    summ = snapshot_diff_summary(old, old, ["id"], F.col("part")).collect()
    assert all(not r["revalidate"] for r in summ)
    assert all(
        r["n_added"] == r["n_removed"] == r["n_changed"] == 0 for r in summ
    )


def test_partition_of_removed_and_added_rows(spark):
    """Removed rows report the OLD snapshot's partition; added rows the
    NEW one's (coalesce across sides)."""
    old, new = _versions(spark)
    d = {
        r["id"]: r["partition_id"]
        for r in snapshot_diff(
            old, new, ["id"], partition_col=F.col("part")
        ).collect()
    }
    assert d[3] == "b" and d[4] == "b"


def test_null_safe_pk_join(spark):
    """Under null_safe_pks=True NULL keys align instead of producing
    phantom added+removed pairs; the default (plain equality, the
    bucketing-compatible condition) reports them as add+remove."""
    schema = "id int, part string, val int, txt string"
    old = spark.createDataFrame([(None, "a", 1, "x")], schema)
    new = spark.createDataFrame([(None, "a", 1, "x")], schema)
    rows = snapshot_diff(old, new, ["id"], null_safe_pks=True).collect()
    assert len(rows) == 1 and rows[0]["diff_status"] == "unchanged"
    default = {
        r["diff_status"]
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert default == {"added", "removed"}


def test_plan_hash_before_exchange(spark):
    """Scale guarantee: the sha256 projection runs map-side BEFORE the join
    exchange (the shuffle carries pks + 32 bytes, not the row), and the
    whole diff is ONE join."""
    old, new = _versions(spark)
    plan = snapshot_diff(
        old, new, ["id"], compare_columns=["part", "val", "txt"]
    )._jdf.queryExecution().executedPlan().toString()
    join_lines = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "sha2" not in ln
    ]
    assert len(join_lines) == 1, join_lines
    # in the tree printout every line after the join node is a child:
    # both sides must project the hash BELOW the join (map-side)
    below = plan[plan.index(join_lines[0]):]
    assert below.count("sha2") >= 2, below


def test_revalidate_rollup_gates_row_drilldown(spark):
    """The incremental-validation composition: the per-partition rollup's
    revalidate flags select exactly the partitions whose rows need the
    expensive re-validation — drilling down only into flagged partitions
    finds every changed PK, and clean partitions are never selected."""
    old = spark.createDataFrame(
        [(1, "p1", 10), (2, "p1", 20), (3, "p2", 30), (4, "p2", 40),
         (5, "p3", 50)],
        "id int, part string, val int",
    )
    new = spark.createDataFrame(
        [(1, "p1", 10), (2, "p1", 20),          # p1 clean
         (3, "p2", 31), (4, "p2", 40),          # p2 changed
         (5, "p3", 50), (6, "p3", 60)],         # p3 added
        "id int, part string, val int",
    )
    summ = snapshot_diff_summary(old, new, ["id"], F.col("part")).collect()
    dirty = {r["partition_id"] for r in summ if r["revalidate"]}
    assert dirty == {"p2", "p3"}
    # drilldown: diff restricted to flagged partitions == full delta
    full_delta = {
        (r["id"], r["diff_status"])
        for r in snapshot_diff_rows(
            old, new, ["id"], partition_col=F.col("part")
        ).collect()
    }
    drill = {
        (r["id"], r["diff_status"])
        for r in snapshot_diff_rows(
            old.filter(F.col("part").isin(dirty)),
            new.filter(F.col("part").isin(dirty)),
            ["id"], partition_col=F.col("part"),
        ).collect()
    }
    assert drill == full_delta == {(3, "changed"), (6, "added")}


def test_detail_names_changed_columns(spark):
    """detail=True names exactly the changed columns per row, NULL for
    added/removed, and NULL-vs-value flags under the ifnull chain."""
    old, new = _versions(spark)
    got = {
        r["id"]: (r["diff_status"], r["changed_columns"])
        for r in snapshot_diff(old, new, ["id"], detail=True).collect()
    }
    assert got[2] == ("changed", ["val"])
    assert got[3] == ("removed", None)
    assert got[4] == ("added", None)
    assert got[1][1] is None and got[5][1] is None  # unchanged

    # NULL -> value transition names the column
    n2 = new.withColumn(
        "txt",
        F.when(F.col("id") == 5, F.lit("now-set")).otherwise(F.col("txt")),
    )
    got5 = {
        r["id"]: r["changed_columns"]
        for r in snapshot_diff(old, n2, ["id"], detail=True).collect()
    }
    assert got5[5] == ["txt"]


def test_detail_multi_column_change_order(spark):
    """Multiple changed columns list in compare-column order."""
    old, new = _versions(spark)
    n2 = new.withColumn("part", F.lit("zz"))
    got = {
        r["id"]: r["changed_columns"]
        for r in snapshot_diff(
            old, n2, ["id"], compare_columns=["part", "val", "txt"],
            detail=True,
        ).collect()
    }
    assert got[2] == ["part", "val"]
    assert got[1] == ["part"]
