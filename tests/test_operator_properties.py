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


# ---- exactness bounds for the four rows-only (sketch-tier) queries ----
# They have no DuckDB oracle by design; these tests pin their estimates
# to the exact twins so "rows-only" still carries quantitative evidence.


def test_hll_daily_users_within_5pct_of_exact(spark):
    from ai_data_pipeline_spark.operators.temporal import (
        q_daily_distinct_users,
        q_daily_users_hll,
    )

    exact = {
        r["day"]: r["daily_users"]
        for r in q_daily_distinct_users(spark, SF_DIR).collect()
    }
    est = {
        r["day"]: r["daily_users_est"]
        for r in q_daily_users_hll(spark, SF_DIR).collect()
    }
    assert set(est) == set(exact)
    for day, n in exact.items():
        # rsd=0.02 → ±5% is 2.5σ; HLL++ is exact below its sparse cutoff
        assert abs(est[day] - n) <= max(1, 0.05 * n)


def test_percentile_approx_within_rank_tolerance(spark):
    from pyspark.sql import functions as F

    from ai_data_pipeline_spark.operators.analytic import q_percentiles_approx

    l = load_table(spark, SF_DIR, "lineitem")
    approx = {
        r["l_returnflag"]: r for r in q_percentiles_approx(spark, SF_DIR).collect()
    }
    for flag, row in approx.items():
        vals = sorted(
            v["l_quantity"]
            for v in l.filter(F.col("l_returnflag") == flag)
            .select("l_quantity")
            .collect()
        )
        n = len(vals)
        tol = n // 1000 + 1  # percentile_approx rank error <= n/accuracy
        for p, col in ((0.5, "p50_qty"), (0.95, "p95_qty")):
            target = int(p * n)
            lo = vals[max(0, target - tol - 1)]
            hi = vals[min(n - 1, target + tol)]
            assert lo <= row[col] <= hi, (flag, col, row[col], lo, hi)


def test_profile_approx_distinct_within_5pct_of_exact(spark):
    from ai_data_pipeline_spark.catalog import TABLES
    from ai_data_pipeline_spark.profiling.profiler import profile_table

    df = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["column_name"]: r["unique_count"]
        for r in profile_table(df, TABLES["lineitem"]).collect()
    }
    approx = {
        r["column_name"]: r["unique_count"]
        for r in profile_table(df, TABLES["lineitem"], exact_distinct=False).collect()
    }
    assert set(approx) == set(exact)
    for col, n in exact.items():
        assert abs(approx[col] - n) <= max(1, 0.05 * n), (col, approx[col], n)


def test_brp_lsh_pairs_are_true_near_pairs(spark):
    """MLlib BRP-LSH has approximate RECALL but exact reported
    distances and an exact threshold filter: every emitted pair must be
    a true pair within the Euclidean threshold, with the distance equal
    to the directly-computed one."""
    from ai_data_pipeline_spark.operators.similarity import ann_mllib_brp

    got = ann_mllib_brp(spark, SF_DIR).collect()
    assert got, "LSH join returned no candidate pairs at test scale"
    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows
    }
    for r in got:
        d = float(np.linalg.norm(vecs[r["q_id"]] - vecs[r["vec_id"]]))
        assert r["dist"] <= 12.0 + 1e-6
        assert abs(r["dist"] - round(d, 6)) <= 2e-6, (r, d)


# ---- round-5 operator invariants (independent of the DuckDB oracle) ----


def test_ann_rerank_scores_are_exact_and_bounded(spark):
    """Two-stage retrieval may miss candidates (approximate recall) but
    must never fabricate scores: every emitted cosine equals the
    directly-computed exact cosine for that pair, ranks are within
    TOP_K, and candidate counts never exceed the corpus size."""
    from ai_data_pipeline_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        ann_rerank,
    )

    rows = ann_rerank(spark, SF_DIR).collect()
    assert rows, "multi-probe LSH returned no candidates at test scale"
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    n_corpus = sum(1 for v in emb if v >= N_QUERIES)

    def cos(a, b):
        # sequential fold, same op order as the kernel
        acc = na = nb = 0.0
        for i in range(len(a)):
            acc += a[i] * b[i]
            na += a[i] * a[i]
            nb += b[i] * b[i]
        return acc / (na**0.5 * nb**0.5)

    for r in rows:
        assert 1 <= r["rk"] <= TOP_K
        assert 1 <= r["n_cand"] <= n_corpus
        want = round(cos(emb[r["q_id"]], emb[r["vec_id"]]), 6)
        assert abs(r["cosine"] - want) <= 1e-6, (r, want)


def test_image_phash_matches_direct_computation(spark):
    """The 16-bit signature and total must equal a direct numpy
    recomputation from the raw bytes (crop/pad to 64x64, 4x4 tiles,
    bit j set iff tile_sum*16 > total_sum)."""
    from ai_data_pipeline_spark.operators.multimodal import (
        IMG_H,
        IMG_W,
        TILE_GRID,
        image_phash,
    )

    got = {r["doc_id"]: r for r in image_phash(spark, SF_DIR).collect()}
    docs = (
        load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    )
    assert set(got) == {r["doc_id"] for r in docs}
    n_px = IMG_W * IMG_H
    th, tw = IMG_H // TILE_GRID, IMG_W // TILE_GRID
    for r in docs:
        a = np.frombuffer(r["text"].encode()[:n_px], dtype=np.uint8).astype(
            np.int64
        )
        if len(a) < n_px:
            a = np.pad(a, (0, n_px - len(a)))
        sums = (
            a.reshape(IMG_H, IMG_W)
            .reshape(TILE_GRID, th, TILE_GRID, tw)
            .sum(axis=(1, 3))
            .reshape(-1)
        )
        total = int(sums.sum())
        phash = sum(
            1 << j
            for j in range(TILE_GRID * TILE_GRID)
            if int(sums[j]) * TILE_GRID * TILE_GRID > total
        )
        row = got[r["doc_id"]]
        assert row["total_sum"] == total
        assert row["phash"] == phash
        assert 0 <= row["phash"] < (1 << TILE_GRID * TILE_GRID)
