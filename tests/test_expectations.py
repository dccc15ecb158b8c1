"""Expectation-rule engine: semantics + single-pass plan."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from professional_services_data_validator_spark.operators.expectations import (
    Expectation,
    run_expectations,
)


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "a", 5, "x@y.zz"),
        (2, "a", 15, "nope"),
        (3, None, 25, "q@r.ss"),
        (4, "b", None, None),
        (1, "c", 35, "s@t.uu"),  # duplicate id
    ]
    return spark.createDataFrame(
        rows, "id long, cat string, v long, email string"
    )


def _report(df, rules, **kw):
    return {
        r["rule_name"]: r for r in run_expectations(df, rules, **kw).collect()
    }


def test_fractions_and_status(table):
    rep = _report(
        table,
        [
            Expectation("not_null", "cat", threshold=0.8),
            Expectation("not_null", "cat", threshold=0.9, name="strict"),
            Expectation("unique", "id"),
            Expectation("unique", "id", threshold=0.75, name="lenient_uniq"),
            Expectation("between", "v", lo=0, hi=30),
            Expectation("matches_regex", "email", pattern="^[a-z]+@[a-z]+"),
            Expectation("isin", "cat", values=("a", "b", "c")),
            Expectation("custom_sql", expr="v IS NULL OR v % 5 = 0",
                        name="mod5"),
        ],
    )
    assert rep["not_null__cat"]["observed"] == 0.8
    assert rep["not_null__cat"]["validation_status"] == "success"
    assert rep["strict"]["validation_status"] == "fail"
    # 4 distinct of 5 non-null ids
    assert rep["unique__id"]["observed"] == 0.8
    assert rep["unique__id"]["validation_status"] == "fail"
    assert rep["lenient_uniq"]["validation_status"] == "success"
    # between: nulls fail the rule (3 of 5 in range)
    assert rep["between__v"]["observed"] == 0.6
    assert rep["matches_regex__email"]["observed"] == 0.6
    # isin: the NULL cat is not in the list
    assert rep["isin__cat"]["observed"] == 0.8
    assert rep["mod5"]["observed"] == 1.0


def test_empty_table_universal_rules_hold(spark):
    df = spark.createDataFrame([], "id long, cat string")
    rep = _report(
        df,
        [
            Expectation("not_null", "cat"),
            Expectation("unique", "id"),
        ],
    )
    assert all(r["observed"] == 1.0 for r in rep.values())
    assert all(r["validation_status"] == "success" for r in rep.values())


def test_approx_mode_same_schema(table):
    rules = [Expectation("unique", "id"), Expectation("not_null", "cat")]
    exact = run_expectations(table, rules)
    approx = run_expectations(table, rules, approx=True)
    assert exact.columns == approx.columns
    # HLL is exact at this tiny cardinality
    e = {r["rule_name"]: r["observed"] for r in exact.collect()}
    a = {r["rule_name"]: r["observed"] for r in approx.collect()}
    assert e == a


def test_single_pass_plan(table):
    rules = [
        Expectation("not_null", "cat"),
        Expectation("between", "v", lo=0, hi=30),
        Expectation("matches_regex", "email", pattern="@"),
        Expectation("custom_sql", expr="v > 0", name="pos"),
    ]
    plan = run_expectations(table, rules)._jdf.queryExecution() \
        .executedPlan().toString()
    # no distinct rules -> one global aggregate: exactly one (single-
    # partition) Exchange, and the source is scanned once
    assert plan.count("Exchange") == 1
    assert plan.count("Scan") == 1


def test_unknown_kind_raises(table):
    with pytest.raises(ValueError):
        run_expectations(table, [Expectation("nope", "cat")])
    with pytest.raises(ValueError):
        run_expectations(table, [])


def test_cli_expect_command(spark, tmp_path, capsys):
    import yaml

    from professional_services_data_validator_spark.cli import main

    src = tmp_path / "t.parquet"
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "b")], "id long, cat string"
    ).write.parquet(str(src))
    rules = [
        {"kind": "not_null", "column": "cat", "threshold": 0.7},
        {"kind": "unique", "column": "id"},
        {"kind": "isin", "column": "cat", "values": ["a", "b"]},
    ]
    rp = tmp_path / "rules.yaml"
    rp.write_text(yaml.safe_dump(rules))
    out = tmp_path / "report"
    rc = main(
        [
            "expect",
            "--source-path", str(src),
            "--rules", str(rp),
            "--output", str(out),
        ]
    )
    # unique__id fails (3 distinct of 4) -> exit 1
    assert rc == 1
    text = capsys.readouterr().out
    assert "unique__id" in text and "fail" in text
    rep = {r["rule_name"]: r for r in spark.read.parquet(str(out)).collect()}
    assert rep["unique__id"]["observed"] == 0.75
    assert rep["not_null__cat"]["validation_status"] == "success"
    # --filter-status narrows stdout but not the verdict
    rc2 = main(
        ["expect", "--source-path", str(src), "--rules", str(rp),
         "--filter-status", "fail"]
    )
    assert rc2 == 1
    text2 = capsys.readouterr().out
    assert "unique__id" in text2 and "not_null__cat" not in text2


def test_expectations_yaml_config_block(spark, tmp_path, capsys):
    import yaml

    from professional_services_data_validator_spark.cli import main

    src = tmp_path / "t.parquet"
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id long, cat string"
    ).write.parquet(str(src))
    cfg = {
        "source_path": str(src),
        "validations": [
            {
                "type": "Expectations",
                "rules": [
                    {"kind": "not_null", "column": "cat", "threshold": 0.5},
                    {"kind": "unique", "column": "id"},
                ],
            }
        ],
    }
    cp = tmp_path / "cfg.yaml"
    cp.write_text(yaml.safe_dump(cfg))
    rc = main(["configs", "run", "--config-file", str(cp)])
    assert rc == 0  # both rules pass
    out = capsys.readouterr().out
    assert "not_null__cat" in out and "unique__id" in out
    # failing threshold propagates the exit code through configs run
    cfg["validations"][0]["rules"][0]["threshold"] = 0.9
    cp.write_text(yaml.safe_dump(cfg))
    assert main(["configs", "run", "--config-file", str(cp)]) == 1
