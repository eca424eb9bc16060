"""Independent (non-DuckDB) invariant checks for the round-4 rewritten
operators: the block-pair embedding dedup must equal a direct in-memory
brute force, and per-domain quota caps must respect their accounting
identities. These catch decomposition bugs the oracle can also catch,
but from a second, independently-derived reference."""

from __future__ import annotations

import numpy as np
import pytest

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.operators.corpus import DOMAIN_CAP_DOCS, corpus_domain_caps
from ai_data_pipeline_spark.operators.similarity import (
    EMB_DIM,
    NEAR_DUP_COS,
    dedup_embedding_cosine,
)
from tests.conftest import SF_DIR


def _brute_force_pairs(spark):
    """All (a < b, cosine >= cut) pairs via one driver-side numpy pass —
    the reference implementation the distributed block join must match."""
    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    norms = np.zeros(len(rows))
    acc = np.zeros(len(rows))
    for i in range(EMB_DIM):
        acc = acc + mat[:, i] * mat[:, i]
    norms = np.sqrt(acc)
    out = set()
    for a in range(len(rows)):
        dot = np.zeros(len(rows))
        for i in range(EMB_DIM):
            dot = dot + mat[a, i] * mat[:, i]
        cos = dot / (norms[a] * norms)
        for b in np.nonzero(np.round(cos, 6) >= NEAR_DUP_COS)[0]:
            if ids[a] < ids[b]:
                out.add((int(ids[a]), int(ids[b])))
    return out


def test_block_pair_dedup_equals_brute_force(spark):
    got = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_embedding_cosine(spark, SF_DIR).collect()
    }
    want = _brute_force_pairs(spark)
    assert got == want


def test_block_pair_dedup_emits_each_pair_once(spark):
    rows = dedup_embedding_cosine(spark, SF_DIR).collect()
    pairs = [(r["vec_a"], r["vec_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)


def test_domain_caps_accounting_identities(spark):
    rows = corpus_domain_caps(spark, SF_DIR).collect()
    assert rows, "at least one source expected"
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["n_kept"] <= DOMAIN_CAP_DOCS
        # a source under the cap keeps everything
        if r["n_docs"] <= DOMAIN_CAP_DOCS:
            assert r["n_dropped"] == 0
        assert r["kept_tokens"] >= 0
        if r["n_kept"] > 0:
            assert r["min_kept_doc_id"] <= r["max_kept_doc_id"]


def test_domain_caps_deterministic_across_runs(spark):
    a = sorted(map(tuple, corpus_domain_caps(spark, SF_DIR).collect()))
    b = sorted(map(tuple, corpus_domain_caps(spark, SF_DIR).collect()))
    assert a == b


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
