"""Replicates the driver's t2 gate locally: every queries() entry with an
oracle must match the DuckDB result exactly at the test scale factor."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR, assert_query_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_all_queries_have_known_keys():
    unknown = set(ORACLES) - set(QUERIES)
    assert not unknown, f"oracle_sql keys without queries: {unknown}"


def test_query_names_unique_across_modules():
    """Two modules declaring the same QueryDef name would silently
    shadow each other in the contract dict — fail loudly instead."""
    from collections import Counter

    names = [d.name for mod in entry_mod.QUERY_DEF_MODULES for d in mod.QUERY_DEFS]
    dupes = [n for n, c in Counter(names).items() if c > 1]
    assert not dupes, f"duplicate query names: {dupes}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert_query_matches_oracle(sdf, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


def test_evidence_bookkeeping_names_are_fresh():
    """The driver-evidence rotation machinery is load-bearing: a stale
    name in the hand-maintained sets silently corrupts the ordering (the
    r4 stale-set bug class). Every name in _REWRITTEN_SINCE_GREEN /
    _REFIXED_FIRST / _UNPROVEN_PRIORITY must be a declared query, and
    every green-derived name must still exist in the contract."""
    declared = set(QUERIES)
    for label, names in (
        ("_REWRITTEN_SINCE_GREEN", entry_mod._REWRITTEN_SINCE_GREEN),
        ("_REFIXED_FIRST", entry_mod._REFIXED_FIRST),
        ("_UNPROVEN_PRIORITY", entry_mod._UNPROVEN_PRIORITY),
        ("_NEW_DEFERRED", entry_mod._NEW_DEFERRED),
        ("_FORCED_REFRESH", entry_mod._FORCED_REFRESH),
    ):
        stale = [n for n in names if n not in declared]
        assert not stale, f"{label} references undeclared queries: {stale}"
    green, seen = entry_mod._driver_evidence()
    gone = [n for n in green if n not in declared]
    assert not gone, f"CORRECTNESS greens for queries no longer declared: {gone}"
    # every green row is also driver evidence, never FRESHER than it
    assert set(green) <= set(seen)
    assert all(green[n] <= seen[n] for n in green)


def test_evidence_glob_reads_double_digit_rounds(tmp_path):
    """The evidence reader must pick up CORRECTNESS_r10.json and later —
    the original r0* glob silently dropped every post-r9 record, which
    would freeze the proven-tier rotation (round-10 review finding).
    Also pins last-green = MAX round across records, and (r12) that
    seen carries the LAST-SEEN round per name — the rows-only periodic
    refresh ranks on it (VERDICT r11 task #7)."""
    import json

    row = {"rows_match": True, "schema_match": True, "hash_match": True}
    (tmp_path / "CORRECTNESS_r09.json").write_text(json.dumps({"a": row}))
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps({"a": row, "b": dict(row, hash_match=False)})
    )
    green, seen = entry_mod._driver_evidence(str(tmp_path))
    assert green == {"a": 10}
    assert seen == {"a": 10, "b": 10}


def test_coverage_doc_names_every_contract_query():
    """COVERAGE.md is the judge-facing operator inventory — every
    queries() key must appear in it (backtick-quoted) so no declared
    capability is undocumented."""
    import os

    cov = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    ).read()
    missing = [n for n in QUERIES if f"`{n}`" not in cov]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"
