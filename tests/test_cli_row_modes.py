"""Round-4 CLI parity: --concat row mode, --use-random-row /
--random-row-batch-size, --wildcard-include-string-len /
--wildcard-include-timestamp.

Reference surface: cli_tools.py:567-578 (random row), :610-617 (--concat),
:699-710 + __main__.py:77-97 (wildcard include toggles). Discipline matches
test_cli_configs.py: every flag run must be byte-identical to the
equivalent stored-config run.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.test_cli_configs import _row_fixtures


def _report_rows(spark, path, cols):
    rows = [tuple(r) for r in spark.read.parquet(path).select(*cols).collect()]
    return sorted(rows, key=lambda t: tuple("" if v is None else str(v) for v in t))


def test_concat_row_mode_matches_hash_violations(spark):
    """--concat '*' compares the raw cast->ifnull->rstrip concat: same
    violating PKs as --hash '*' (sha256 is injective up to collisions on
    the same concat), validation_name concat__all, and the flag run is
    byte-identical to the stored-config run."""
    from professional_services_data_validator_spark.cli import main

    with tempfile.TemporaryDirectory() as d:
        _row_fixtures(spark, d)
        base = [
            "validate", "row",
            "--source-path", d + "/src",
            "--target-path", d + "/tgt",
            "--primary-keys", "conv_id,turn_idx",
        ]
        rc_c = main(base + ["--concat", "*", "--output", d + "/rep_concat"])
        rc_h = main(base + ["--hash", "*", "--output", d + "/rep_hash"])
        assert rc_c == rc_h == 1  # planted defects

        rep_c = spark.read.parquet(d + "/rep_concat")
        assert set(
            r.validation_name for r in rep_c.select("validation_name")
            .distinct().collect()
        ) == {"concat__all"}

        # group_by_columns JSON embeds the compared column (hash__all vs
        # concat__all) — compare on the PK fields + status only
        def _pk_status(path):
            df = spark.read.parquet(path).select(
                F.get_json_object("group_by_columns", "$.conv_id").alias("c"),
                F.get_json_object("group_by_columns", "$.turn_idx").alias("t"),
                "validation_status",
            )
            return sorted(map(tuple, df.collect()))

        assert _pk_status(d + "/rep_concat") == _pk_status(d + "/rep_hash")

        # stored-config run byte-identical to the flag run
        cfg = d + "/concat.yaml"
        rc_store = main(base + ["--concat", "*", "--config-file", cfg])
        assert rc_store == 0 and os.path.exists(cfg)
        rc_cfg = main(
            ["configs", "run", "--config-file", cfg,
             "--output", d + "/rep_cfg"]
        )
        assert rc_cfg == rc_c
        cols = [
            "validation_name", "primary_keys", "source_agg_value",
            "target_agg_value", "validation_status",
        ]
        assert _report_rows(spark, d + "/rep_concat", cols) == (
            _report_rows(spark, d + "/rep_cfg", cols)
        )


def test_concat_hash_mutually_exclusive(spark):
    from professional_services_data_validator_spark.cli import main

    with tempfile.TemporaryDirectory() as d:
        _row_fixtures(spark, d)
        with pytest.raises(SystemExit):
            main(
                [
                    "validate", "row",
                    "--source-path", d + "/src",
                    "--target-path", d + "/tgt",
                    "--primary-keys", "conv_id,turn_idx",
                    "--hash", "*", "--concat", "*",
                ]
            )


def test_use_random_row(spark):
    """--use-random-row validates only a seeded PK sample: the report
    carries num_random_rows, covers at most batch-size PKs, and the flag
    run is byte-identical to the stored-config run (determinism)."""
    from professional_services_data_validator_spark.cli import main

    with tempfile.TemporaryDirectory() as d:
        _row_fixtures(spark, d)
        base = [
            "validate", "row",
            "--source-path", d + "/src",
            "--target-path", d + "/tgt",
            "--primary-keys", "conv_id,turn_idx",
            "--hash", "*",
            "--use-random-row",
            "--random-row-batch-size", "50",
        ]
        rc = main(base + ["--output", d + "/rep_rr"])
        assert rc in (0, 1)
        rep = spark.read.parquet(d + "/rep_rr")
        assert rep.select("num_random_rows").distinct().collect()[0][0] == 50
        # <= 50 sampled PKs (some may be missing on one side; report rows
        # are per-PK for hash mode)
        n_pks = (
            rep.select(
                F.get_json_object("group_by_columns", "$.conv_id"),
                F.get_json_object("group_by_columns", "$.turn_idx"),
            )
            .distinct()
            .count()
        )
        assert 0 < n_pks <= 50

        cfg = d + "/rr.yaml"
        assert main(base + ["--config-file", cfg]) == 0
        rc_cfg = main(
            ["configs", "run", "--config-file", cfg,
             "--output", d + "/rep_rr_cfg"]
        )
        assert rc_cfg == rc
        cols = [
            "primary_keys", "source_agg_value", "target_agg_value",
            "validation_status", "num_random_rows",
        ]
        assert _report_rows(spark, d + "/rep_rr", cols) == (
            _report_rows(spark, d + "/rep_rr_cfg", cols)
        )


def test_random_row_batch_size_requires_flag(spark):
    from professional_services_data_validator_spark.cli import main

    with tempfile.TemporaryDirectory() as d:
        _row_fixtures(spark, d)
        with pytest.raises(SystemExit):
            main(
                [
                    "validate", "row",
                    "--source-path", d + "/src",
                    "--target-path", d + "/tgt",
                    "--primary-keys", "conv_id,turn_idx",
                    "--hash", "*",
                    "--random-row-batch-size", "50",
                ]
            )


def test_wildcard_include_toggles(spark):
    """Reference '*' expansion defaults: string and timestamp/date columns
    are EXCLUDED from non-count aggregates unless the include flags opt
    them in (__main__.py:77-97). transcripts has string (text/role/tool/
    conv_id), timestamp (ts) and int (turn_idx) columns."""
    from professional_services_data_validator_spark.cli import main

    def names(out_dir):
        return set(
            r.validation_name
            for r in spark.read.parquet(out_dir)
            .select("validation_name").collect()
        )

    with tempfile.TemporaryDirectory() as d:
        _row_fixtures(spark, d)
        base = [
            "validate", "column",
            "--source-path", d + "/src",
            "--target-path", d + "/tgt",
            "--sum", "*",
        ]
        main(base + ["--output", d + "/rep_plain"])
        got = names(d + "/rep_plain")
        assert "sum__turn_idx" in got
        assert not any(
            n in got for n in ("sum__text", "sum__role", "sum__ts")
        )

        main(
            base
            + ["--wildcard-include-string-len", "--output", d + "/rep_str"]
        )
        got_str = names(d + "/rep_str")
        assert "sum__text" in got_str and "sum__role" in got_str
        assert "sum__ts" not in got_str

        main(
            base
            + ["--wildcard-include-timestamp", "--output", d + "/rep_ts"]
        )
        got_ts = names(d + "/rep_ts")
        assert "sum__ts" in got_ts and "sum__text" not in got_ts

        # explicit column list bypasses the gate (reference widens
        # supported_types for explicit lists, config_manager.py:894-905)
        main(
            [
                "validate", "column",
                "--source-path", d + "/src",
                "--target-path", d + "/tgt",
                "--sum", "text",
                "--output", d + "/rep_explicit",
            ]
        )
        assert "sum__text" in names(d + "/rep_explicit")
