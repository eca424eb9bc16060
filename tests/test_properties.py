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


# ---- round-5 kernel properties (pure, no Spark session needed) ----


@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sets(st.integers(min_value=0, max_value=31), max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_phash_banding_is_lossless_within_hamming_3(sig, flips):
    """Pigeonhole: flipping <= 3 of 32 bits leaves at least one of the
    4 8-bit bands identical — the banded equi-join has full recall at
    Hamming distance <= PHASH_HAM_MAX by construction."""
    from ai_data_pipeline_spark.operators.multimodal import (
        PHASH_BAND_BITS,
        PHASH_BANDS,
        PHASH_HAM_MAX,
    )

    assert len(flips) <= PHASH_HAM_MAX
    other = sig
    for b in flips:
        other ^= 1 << b
    mask = (1 << PHASH_BAND_BITS) - 1
    assert any(
        (sig >> (j * PHASH_BAND_BITS)) & mask
        == (other >> (j * PHASH_BAND_BITS)) & mask
        for j in range(PHASH_BANDS)
    )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=100, deadline=None)
def test_sweep_line_delta_decomposition(intervals):
    """The sweep-line identity behind q_interval_sweep: running sum of
    (+1 at start, -1 after end) deltas equals direct interval-membership
    counting on every day."""
    spans = [(s, s + dur) for s, dur in intervals]  # inclusive [s, e]
    days = range(0, max(e for _, e in spans) + 2)
    deltas = {}
    for s, e in spans:
        deltas[s] = deltas.get(s, 0) + 1
        deltas[e + 1] = deltas.get(e + 1, 0) - 1
    run = 0
    for d in days:
        run += deltas.get(d, 0)
        direct = sum(1 for s, e in spans if s <= d <= e)
        assert run == direct


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=150, deadline=None)
def test_seg_signature_kernel_matches_brute_force(payload):
    """The vectorized 32-segment signature (np.add.reduceat with
    clamped offsets and empty-segment masking) must equal a naive
    per-byte Python recompute for ANY payload length — including
    payloads shorter than 32 bytes, where segments are empty."""
    import numpy as np
    import pandas as pd

    from ai_data_pipeline_spark.operators.multimodal import (
        SEG_BITS,
        _seg_sig_batches,
    )

    pdf = pd.DataFrame({"doc_id": [1], "payload": [payload]})
    out = pd.concat(list(_seg_sig_batches(iter([pdf]))))
    got = int(out["phash"].iloc[0])
    n = len(payload)
    if n == 0:
        assert got == 0
        return
    segs = [0] * SEG_BITS
    for pos, byte in enumerate(payload):
        segs[pos * SEG_BITS // n] += byte
    total = sum(segs)
    want = sum(1 << j for j in range(SEG_BITS) if segs[j] * SEG_BITS > total)
    assert got == want


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=150, deadline=None)
def test_frame_energy_kernel_matches_brute_force(payload):
    """Per-frame reduceat energies must equal naive per-frame byte sums
    for any payload length (ragged final frame included)."""
    import pandas as pd

    from ai_data_pipeline_spark.operators.multimodal import (
        FRAME_BYTES,
        _frame_energy_batches,
    )

    pdf = pd.DataFrame({"doc_id": [7], "payload": [payload]})
    out = pd.concat(list(_frame_energy_batches(iter([pdf]))))
    want = [
        sum(payload[i : i + FRAME_BYTES])
        for i in range(0, len(payload), FRAME_BYTES)
    ]
    assert list(out["energy"]) == want
    assert list(out["frame"]) == list(range(len(want)))
