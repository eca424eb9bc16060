"""Property-based tests (hypothesis) for the driver-side pure functions
— the decision-cascade helpers run on every column of every table, so
they must hold algebraic invariants for ARBITRARY names/inputs, not just
the fixture vocabulary (SURVEY.md §5.2: the reference has no
property tests; its suite can't even run)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_data_pipeline_spark.classify.hybrid import merge_pii
from ai_data_pipeline_spark.profiling import patterns as P

PII_LEVELS = ["none", "low", "medium", "high"]


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_snake_case_idempotent_and_clean(name):
    s = P.snake_case(name)
    # output alphabet: lowercase alnum + single underscores, no edge _
    assert re.fullmatch(r"[a-z0-9]+(_[a-z0-9]+)*", s) or s == ""
    assert P.snake_case(s) == s


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
@settings(max_examples=300, deadline=None)
def test_name_pii_total_and_stable(name):
    lvl = P.name_pii(name)
    assert lvl in PII_LEVELS
    # name-based PII is case-insensitive
    assert P.name_pii(name.upper()) == lvl


@given(st.sampled_from(PII_LEVELS), st.sampled_from(PII_LEVELS))
def test_merge_pii_is_ordinal_max(a, b):
    got = merge_pii(a, b)
    # commutative, idempotent, and never below either input (the
    # reference's lexicographic-max bug violated all three — §7.6.1)
    assert got == merge_pii(b, a)
    assert merge_pii(a, a) == a
    order = {l: i for i, l in enumerate(PII_LEVELS)}
    assert order[got] == max(order[a], order[b])


@given(st.sampled_from(PII_LEVELS))
def test_merge_pii_none_ai_is_identity(a):
    assert merge_pii(a, None) == a


@given(st.text(max_size=60), st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_name_has_is_substring_semantics(name, part):
    if part and P.name_has(name, (part.lower(),)):
        assert part.lower() in name.lower()
