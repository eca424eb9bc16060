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


def test_semdedup_matches_brute_force_recompute(spark):
    """dedup_semantic's keep/drop decisions must equal a driver-side
    numpy recomputation of the full SemDeDup rule: nearest-centroid
    assignment (fold-order cosine, cell-id tiebreak) then min-lower-id
    keeper among in-cell neighbors at >= SEMDEDUP_COS."""
    from ai_data_pipeline_spark.operators.similarity import (
        N_CELLS,
        N_QUERIES,
        SEMDEDUP_COS,
        dedup_semantic,
    )

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])

    def fold_dot(A, B):
        acc = np.zeros(A.shape[0])
        for i in range(EMB_DIM):
            acc = acc + A[:, i] * B[:, i]
        return acc

    norms = np.sqrt(fold_dot(mat, mat))
    cent_idx = [
        int(np.nonzero(ids == cid)[0][0])
        for cid in range(N_QUERIES, N_QUERIES + N_CELLS)
    ]
    # nearest centroid per vector (cos desc, cell_id asc)
    best_cell = {}
    for v in range(len(ids)):
        scored = []
        for ci in cent_idx:
            cos = float(
                fold_dot(mat[v : v + 1], mat[ci : ci + 1])[0]
                / (norms[v] * norms[ci])
            )
            scored.append((-cos, ids[ci]))
        best_cell[int(ids[v])] = int(min(scored)[1])
    expect = {}
    for v in range(len(ids)):
        vid = int(ids[v])
        lowers = [
            int(ids[u])
            for u in range(len(ids))
            if ids[u] < ids[v]
            and best_cell[int(ids[u])] == best_cell[vid]
            and round(
                float(
                    fold_dot(mat[v : v + 1], mat[u : u + 1])[0]
                    / (norms[v] * norms[u])
                ),
                6,
            )
            >= SEMDEDUP_COS
        ]
        expect[vid] = (
            best_cell[vid],
            not lowers,
            min(lowers) if lowers else None,
            len(lowers),
        )
    got = {
        r["vec_id"]: (r["cell_id"], r["kept"], r["keeper_id"], r["n_dup_lower"])
        for r in dedup_semantic(spark, SF_DIR).collect()
    }
    assert got == expect


def test_phash_pairs_banding_is_lossless_and_exact(spark):
    """The banded candidate join must achieve FULL recall at the
    Hamming threshold (pigeonhole guarantee: 4 bands, distance <= 3),
    and every emitted hamming must equal the popcount of the xor of the
    independently recomputed signatures."""
    from ai_data_pipeline_spark.operators.multimodal import (
        PHASH_HAM_MAX,
        SEG_BITS,
        image_phash_pairs,
    )

    docs = (
        load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    )
    sig = {}
    for r in docs:
        a = np.frombuffer(r["text"].encode("utf-8"), dtype=np.uint8).astype(
            np.int64
        )
        n = len(a)
        segs = np.zeros(SEG_BITS, dtype=np.int64)
        for pos in range(n):
            segs[pos * SEG_BITS // n] += int(a[pos])
        total = int(a.sum())
        sig[r["doc_id"]] = int(
            sum(1 << j for j in range(SEG_BITS) if segs[j] * SEG_BITS > total)
        )
    expect = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a in sig
        for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= PHASH_HAM_MAX
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_phash_pairs(spark, SF_DIR).collect()
    }
    assert got == expect


def test_boilerplate_fractions_recompute(spark):
    """Per-doc boilerplate fractions must equal a pure-Python counter
    recomputation of the df-threshold rule."""
    from collections import Counter, defaultdict

    from ai_data_pipeline_spark.operators.corpus import (
        BOILER_DEN,
        BOILER_N,
        BOILER_NUM,
        corpus_boilerplate_ngrams,
    )

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    import re

    grams = {}
    src_docs = Counter()
    for r in docs:
        toks = re.split(r"\s+", r["text"])
        gs = [
            " ".join(toks[i : i + BOILER_N])
            for i in range(max(len(toks) - BOILER_N + 1, 1))
        ]
        grams[r["doc_id"]] = (r["source"], Counter(gs))
        src_docs[r["source"]] += 1
    df = defaultdict(Counter)
    for src, ctr in grams.values():
        for g in ctr:
            df[src][g] += 1
    boiler = {
        (src, g)
        for src in df
        for g, d in df[src].items()
        if d * BOILER_DEN >= src_docs[src] * BOILER_NUM
    }
    got = {
        r["doc_id"]: (
            r["source"],
            r["n_grams"],
            r["n_boiler"],
            r["flag_boilerplate"],
        )
        for r in corpus_boilerplate_ngrams(spark, SF_DIR).collect()
    }
    assert set(got) == set(grams)
    for doc_id, (src, ctr) in grams.items():
        n_grams = sum(ctr.values())
        n_boiler = sum(c for g, c in ctr.items() if (src, g) in boiler)
        flag = int(n_boiler * BOILER_DEN >= n_grams * BOILER_NUM)
        assert got[doc_id] == (src, n_grams, n_boiler, flag), doc_id


def test_temperature_mix_fixed_point_identities(spark):
    """sqrt_fp must be the floor of sqrt in micro-units (checked by
    exact integer squaring), shares must sum to <= 1e6 and be within
    n_sources ppm of it (floor rounding), planned tokens <= budget."""
    from ai_data_pipeline_spark.operators.corpus import (
        MIX_BUDGET_TOKENS,
        corpus_temperature_mix,
    )

    rows = corpus_temperature_mix(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        fp = r["sqrt_fp"]
        # (fp/1e6)^2 <= n_tokens < ((fp+1)/1e6)^2, modulo the one-ulp
        # double multiply — allow the boundary by testing integers
        assert fp * fp <= r["n_tokens"] * 10**12 < (fp + 2) * (fp + 2)
    total_ppm = sum(r["share_ppm"] for r in rows)
    assert 10**6 - len(rows) <= total_ppm <= 10**6
    assert sum(r["planned_tokens"] for r in rows) <= MIX_BUDGET_TOKENS
