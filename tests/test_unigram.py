"""Pure-Python pins on the unigram-LM Viterbi kernel — the DP whose
bit-level behavior the DuckDB oracle must reproduce (see
operators/unigram.py module docstring). No SparkSession needed."""

from __future__ import annotations

from ai_data_pipeline_spark.operators.unigram import (
    UNI_MAX_PIECE,
    UNI_MAX_WORD,
    UNI_TOP_MULTI,
    viterbi_segment,
)


def _prob(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: c / total for p, c in counts.items()}


def test_single_chars_guarantee_a_path():
    prob = _prob({"a": 1, "b": 1, "c": 1})
    assert viterbi_segment("abc", prob) == ["a", "b", "c"]
    assert viterbi_segment("a", prob) == ["a"]
    assert viterbi_segment("", prob) == []


def test_probable_multichar_piece_wins():
    # p(ab) = 10/14 — one 'ab' piece beats any two singles
    prob = _prob({"a": 1, "b": 1, "c": 2, "ab": 10})
    assert viterbi_segment("abc", prob) == ["ab", "c"]
    assert viterbi_segment("aab", prob) == ["a", "ab"]


def test_equal_product_tie_prefers_fewer_then_longer_pieces():
    # p(aa) == p(a)^2 exactly: counts 4 and 2 over total 8 give
    # 0.5 and 0.25 = 0.5^2 with no rounding — the tie is exact.
    prob = {"a": 0.5, "aa": 0.25}
    assert viterbi_segment("aa", prob) == ["aa"]  # fewer pieces wins
    # three a's: [aa, a] and [a, aa] tie at (p, k) — the backward
    # longest-first walk takes the piece ENDING the word long, i.e.
    # the forward rule "equal (p, k) -> longer last piece".
    assert viterbi_segment("aaa", prob) == ["a", "aa"]


def test_reconstruction_identity_and_vocab_membership():
    counts = {"a": 3, "b": 2, "ab": 4, "ba": 1, "aba": 2, "c": 1}
    prob = _prob(counts)
    for w in ("ababa", "abcba", "aacab", "b", "cc"):
        pieces = viterbi_segment(w, prob)
        assert "".join(pieces) == w
        assert all(p in prob for p in pieces)
        assert all(1 <= len(p) <= UNI_MAX_PIECE for p in pieces)


def test_contract_constants():
    # the oracle's range() bounds bake these in — moving them requires
    # regenerating the SQL, so pin them
    assert UNI_MAX_PIECE == 3
    assert UNI_MAX_WORD == 63
    assert UNI_TOP_MULTI == 40


def test_broken_coverage_raises_loudly():
    # ADVICE r12: a coverage-broken vocabulary (a char with no piece)
    # must raise, never silently return a non-reconstructing
    # segmentation — the invariant is implicit across
    # _word_freq/_seed_counts/_unigram_model and a future prune/caller
    # bug would otherwise corrupt data silently.
    import pytest

    with pytest.raises(ValueError, match="coverage"):
        viterbi_segment("axb", _prob({"a": 1, "b": 1, "ab": 2}))
    with pytest.raises(ValueError, match="coverage"):
        viterbi_segment("x", _prob({"a": 1}))
