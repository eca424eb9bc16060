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


# --- round-8 operator contracts testable as pure functions ---------------

import hashlib
import math

from ai_data_pipeline_spark.operators.redact import (
    EMAIL_RX,
    IP_RX,
    PHONE_STRICT_RX,
    SSN_RX,
)

_PII_PATTERNS = {
    "email": re.compile(EMAIL_RX),
    "phone": re.compile(PHONE_STRICT_RX),
    "ip": re.compile(IP_RX),
    "ssn": re.compile(SSN_RX),
}


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_pii_planted_channels_are_typed_disjoint(doc_id):
    """Each planted channel string matches EXACTLY its own pattern —
    for any doc_id, not just the fixture range. Cross-matching would
    double-count PII types and corrupt the drop/redact policy."""
    planted = {
        "email": f" contact user{doc_id}@example.com",
        "phone": f" call 415-555-{doc_id % 10000:04d}",
        "ip": f" host 10.0.{doc_id % 256}.{(doc_id * 7) % 256}",
        "ssn": f" id 123-45-{doc_id % 10000:04d}",
    }
    for planted_kind, s in planted.items():
        for pat_kind, rx in _PII_PATTERNS.items():
            n = len(rx.findall(s))
            assert n == (1 if pat_kind == planted_kind else 0), (
                planted_kind,
                pat_kind,
                s,
            )


@given(
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=300, deadline=None)
def test_drift_term_algebra(n_ref, n_cand, nr, nc):
    """The drift monitor's per-band chi-square term (floor of the exact
    rational) is non-negative, zero exactly when the band proportions
    agree, and symmetric under swapping the two populations."""
    if n_ref + n_cand == 0:
        return
    d = n_ref * nc - n_cand * nr
    term = d * d * 1_000_000 // ((n_ref + n_cand) * nr * nc)
    assert term >= 0
    if n_ref * nc == n_cand * nr:
        assert term == 0
    d_sw = n_cand * nr - n_ref * nc
    term_sw = d_sw * d_sw * 1_000_000 // ((n_cand + n_ref) * nc * nr)
    assert term == term_sw


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=6,
        ),
        max_size=10,
    ),
)
@settings(max_examples=200, deadline=None)
def test_tombstone_prefix_fingerprint_window_semantics(tokens, tail):
    """The purge cluster key is a LEADING-window digest: appending
    content after the window never changes it (truncated-continuation
    near-dups share a key), and case/whitespace normalization is
    already applied (upper-cased input keys identically)."""
    from ai_data_pipeline_spark.operators.curation import (
        TOMBSTONE_PREFIX_TOKENS,
    )

    def fp(toks):
        key = " ".join(toks[:TOMBSTONE_PREFIX_TOKENS])
        return hashlib.md5(key.encode()).hexdigest()

    base = fp(tokens)
    if len(tokens) >= TOMBSTONE_PREFIX_TOKENS:
        assert fp(tokens + tail) == base
    assert fp([t.upper().lower() for t in tokens]) == base


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=50),
        st.sets(st.integers(min_value=0, max_value=20), min_size=1),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_fd_accounting_identities(mapping):
    """FD discovery's emitted statistics obey their algebraic
    identities for any key→value-set relation: n_keys ≤ n_pairs ≤
    n_keys·max_fanout, holds ⇔ zero violations ⇔ strength = 10⁶."""
    n_keys = len(mapping)
    n_pairs = sum(len(v) for v in mapping.values())
    n_viol = sum(1 for v in mapping.values() if len(v) > 1)
    max_fanout = max(len(v) for v in mapping.values())
    strength = (n_keys - n_viol) * 1_000_000 // n_keys
    assert n_keys <= n_pairs <= n_keys * max_fanout
    assert (n_viol == 0) == (strength == 1_000_000)
    assert (n_viol == 0) == (max_fanout == 1)


@given(
    st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=100_000),
)
@settings(max_examples=200, deadline=None)
def test_percentile_banding_monotone_and_bounded(scores, band_w):
    """Banded percentile rank (cls_score_percentile's statistic) is
    monotone in band, bounded in [0, 1e6), and docs sharing a band
    share a percentile."""
    bands = sorted(math.floor(s / band_w) for s in scores)
    n = len(bands)
    pct = {}
    below = 0
    from collections import Counter

    hist = Counter(bands)
    for b in sorted(hist):
        pct[b] = below * 1_000_000 // n
        below += hist[b]
    vals = [pct[b] for b in sorted(hist)]
    assert vals == sorted(vals)
    assert all(0 <= v < 1_000_000 for v in vals)
    assert vals[0] == 0  # the lowest band always reads percentile 0
