"""Smoke tests for the ``python -m ai_data_pipeline_spark`` CLI — the
reference's declared-but-unshipped surface (pyproject.toml:63-64)."""

from __future__ import annotations

import subprocess
import sys

from tests.conftest import SF_DIR


def test_cli_profile_smoke(tmp_path):
    out = tmp_path / "profile_out"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "ai_data_pipeline_spark",
            "profile",
            f"{SF_DIR}/region.parquet",
            "--cpus",
            "2",
            "-o",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "profile written" in r.stdout
    import duckdb

    rows = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()
    assert rows[0] == 2  # region has 2 columns


def test_cli_bad_command_exits_nonzero():
    r = subprocess.run(
        [sys.executable, "-m", "ai_data_pipeline_spark", "nonsense"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert r.returncode != 0


def test_cli_job_profile_and_save(tmp_path):
    """upload → classify → persist job: profile parquet, summary
    parquet, and generated Data Vault DDL land in the output dir."""
    out = tmp_path / "job_out"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "ai_data_pipeline_spark",
            "job",
            f"{SF_DIR}/customer.parquet",
            str(out),
            "--cpus",
            "2",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import duckdb

    n_cols = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/profile.parquet/*.parquet')"
    ).fetchone()[0]
    assert n_cols == 5  # customer has 5 columns
    assert (
        duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{out}/summary.parquet/*.parquet')"
        ).fetchone()[0]
        > 0
    )
    ddl = (out / "vault_ddl.sql").read_text()
    assert "CREATE TABLE hub_customer" in ddl
    assert "CREATE TABLE sat_customer" in ddl
    assert "hashdiff CHAR(64)" in ddl


def test_cli_list_names_every_contract_query():
    r = subprocess.run(
        [sys.executable, "-m", "ai_data_pipeline_spark", "list"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    names = set(r.stdout.split())
    import __spark_entry__ as entry_mod

    assert names == set(entry_mod.queries())


def test_cli_run_contract_query(tmp_path):
    out = tmp_path / "q1_out"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "ai_data_pipeline_spark",
            "run",
            "q1_pricing_summary",
            SF_DIR,
            "--cpus",
            "2",
            "-o",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    assert n > 0


def test_cli_run_unknown_query_exits_2():
    r = subprocess.run(
        [sys.executable, "-m", "ai_data_pipeline_spark", "run", "no_such_query"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 2
    assert "unknown query" in r.stderr
