"""Hybrid retrieval: reciprocal-rank fusion of a sparse (lexical,
inverted-index) ranker and a dense (embedding-cosine) ranker for
query-by-example search — the standard hybrid-search topology behind
RAG corpus retrieval (Cormack, Clarke & Buettcher 2009: RRF
outperforms any individual ranker it fuses).

The reference has no retrieval surface (its pipeline stops at
classification — see /root/reference/src/ai_pipeline/core/classifiers/
hybrid_classifier.py:1 for the whole extent); this module is part of
the north-star extension: a reference user curating LLM training data
needs query-by-example search to audit near-misses of the dedup and
quality stages.

Scale design (100 TB):
- The query set is a constant number of documents; every query-derived
  relation is additionally LIMIT-bounded (top RRF_MAX_QTERMS terms per
  query by idf) before it is broadcast — the fixed-size-relation rule.
- The sparse pass is the inverted-index shape text_bm25_topk documents:
  map-side explode, one (doc, term) distinct, one term-keyed df
  aggregate; candidates join the broadcast query terms on term (never
  a doc×doc join).
- Both per-query rankings run the two-level tournament (topk_per_key)
  because queries are a low-cardinality key — the reducer funnel the
  naive window would create.
- Fusion itself touches only the two ranked lists (≤ queries × depth
  rows each — constants), so the full-outer join and final top-k are
  driver-trivial at any corpus size.
- All ranking arithmetic is integer fixed-point: the idf surrogate is
  the exact rational (2(N−df)+1)·1000 div (2df+1) (monotone transform
  of the BM25+ idf — same trick text_bm25_topk documents), sparse
  scores are int64-safe to N ≈ 4.6·10¹⁵ docs, and the RRF score is
  10⁶ div (60 + rank) summed over the two lists — no floats anywhere
  except the dense cosine, which is IEEE-identical in both engines
  (channel-wise fold, rounded to 6 decimals; see similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.functions.expressions import topk_per_key
from ai_data_pipeline_spark.operators.similarity import (
    EMB_DIM,
    _cos_sql,
    _cosine_udf,
)
from ai_data_pipeline_spark.operators.text import MIN_TERM_LEN
from ai_data_pipeline_spark.registry import QueryDef

RRF_N_QUERIES = 4  # doc_id < 4 are the query-by-example documents
RRF_MAX_QTERMS = 64  # per-query keyword budget (highest-idf terms)
RRF_DEPTH = 20  # depth of each ranked list entering the fusion
RRF_K = 60  # the canonical RRF dampening constant
RRF_TOP = 10  # fused results returned per query


def _doc_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, term) presence pairs — the inverted-index
    relation. One map-side explode + one distinct shuffle."""
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") >= MIN_TERM_LEN)
        .distinct()
    )


def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of lexical and embedding retrieval: for
    each query document, rank the candidate corpus (documents that
    carry an embedding) twice — (a) sparse: sum of integer-idf weights
    over shared distinct terms, (b) dense: embedding cosine — and fuse
    with RRF(d) = Σ_lists 10⁶ div (60 + rank_list(d)), keeping the
    fused top RRF_TOP. Returns (q_id, doc_id, rk_sparse, rk_dense,
    rrf_ppm, rk); rk_sparse / rk_dense are null when the document
    reached the fused list through the other ranker only — exactly the
    complementary-evidence case RRF exists for."""
    terms = _doc_terms(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("v")
    )
    nd = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    df_ = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # per-query keyword set: top RRF_MAX_QTERMS terms by idf — the
    # LIMIT bound that makes the broadcast correct at any corpus size
    idf = F.expr("(2 * (n_docs - df) + 1) * 1000 div (2 * df + 1)")
    qterms = (
        terms.filter(F.col("doc_id") < RRF_N_QUERIES)
        .join(df_, "term")
        .crossJoin(F.broadcast(nd))
        .select(F.col("doc_id").alias("q_id"), "term", idf.alias("idf1000"))
    )
    qsel = topk_per_key(
        qterms, ["q_id"], [F.desc("idf1000"), F.asc("term")], RRF_MAX_QTERMS
    ).select("q_id", "term", "idf1000")

    cand_terms = terms.filter(F.col("doc_id") >= RRF_N_QUERIES).join(
        e.select("doc_id"), "doc_id", "left_semi"
    )
    sparse = (
        cand_terms.join(F.broadcast(qsel), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.sum("idf1000").alias("sparse_fp"))
    )
    sparse_rank = topk_per_key(
        sparse, ["q_id"], [F.desc("sparse_fp"), F.asc("doc_id")], RRF_DEPTH
    ).select("q_id", "doc_id", F.col("rk").alias("rk_sparse"))

    qv = e.filter(F.col("doc_id") < RRF_N_QUERIES).select(
        F.col("doc_id").alias("q_id"), F.col("v").alias("qv")
    )
    dense = (
        e.filter(F.col("doc_id") >= RRF_N_QUERIES)
        .crossJoin(F.broadcast(qv))
        .select(
            "q_id",
            "doc_id",
            F.round(_cosine_udf("v", "qv"), 6).alias("cosine"),
        )
    )
    dense_rank = topk_per_key(
        dense, ["q_id"], [F.desc("cosine"), F.asc("doc_id")], RRF_DEPTH
    ).select("q_id", "doc_id", F.col("rk").alias("rk_dense"))

    rrf = F.coalesce(
        F.expr(f"1000000 div ({RRF_K} + rk_sparse)"), F.lit(0)
    ) + F.coalesce(F.expr(f"1000000 div ({RRF_K} + rk_dense)"), F.lit(0))
    fused = sparse_rank.join(dense_rank, ["q_id", "doc_id"], "full").select(
        "q_id", "doc_id", "rk_sparse", "rk_dense", rrf.alias("rrf_ppm")
    )
    return topk_per_key(
        fused, ["q_id"], [F.desc("rrf_ppm"), F.asc("doc_id")], RRF_TOP
    ).select("q_id", "doc_id", "rk_sparse", "rk_dense", "rrf_ppm", "rk")


def _rrf_oracle() -> str:
    cos = _cos_sql("e.v", "q.qv")
    return f"""
WITH terms AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
    FROM documents)
  WHERE length(term) >= {MIN_TERM_LEN}
), nd AS (
  SELECT count(*) AS n_docs FROM documents
), df AS (
  SELECT term, count(*) AS df FROM terms GROUP BY term
), qsel AS (
  SELECT q_id, term, idf1000 FROM (
    SELECT t.doc_id AS q_id, t.term,
           (2 * (n_docs - df) + 1) * 1000 // (2 * df + 1) AS idf1000,
           row_number() OVER (PARTITION BY t.doc_id
             ORDER BY (2 * (n_docs - df) + 1) * 1000 // (2 * df + 1) DESC,
                      t.term ASC) AS rk
    FROM terms t JOIN df USING (term) CROSS JOIN nd
    WHERE t.doc_id < {RRF_N_QUERIES}
  ) WHERE rk <= {RRF_MAX_QTERMS}
), cand AS (
  SELECT t.doc_id, t.term FROM terms t
  WHERE t.doc_id >= {RRF_N_QUERIES}
    AND t.doc_id IN (SELECT vec_id FROM embeddings)
), sparse_rank AS (
  SELECT q_id, doc_id, rk AS rk_sparse FROM (
    SELECT q_id, doc_id, sparse_fp,
           row_number() OVER (PARTITION BY q_id
             ORDER BY sparse_fp DESC, doc_id ASC) AS rk
    FROM (
      SELECT s.q_id, c.doc_id, CAST(sum(s.idf1000) AS BIGINT) AS sparse_fp
      FROM cand c JOIN qsel s USING (term)
      GROUP BY s.q_id, c.doc_id)
  ) WHERE rk <= {RRF_DEPTH}
), ev AS (
  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings
), dense_rank AS (
  SELECT q_id, doc_id, rk AS rk_dense FROM (
    SELECT q_id, doc_id, cosine,
           row_number() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, doc_id ASC) AS rk
    FROM (
      SELECT q.doc_id AS q_id, e.doc_id, round({cos}, 6) AS cosine
      FROM ev e
      CROSS JOIN (SELECT doc_id, v AS qv FROM ev
                  WHERE doc_id < {RRF_N_QUERIES}) q
      WHERE e.doc_id >= {RRF_N_QUERIES})
  ) WHERE rk <= {RRF_DEPTH}
), fused AS (
  SELECT coalesce(s.q_id, d.q_id) AS q_id,
         coalesce(s.doc_id, d.doc_id) AS doc_id,
         s.rk_sparse, d.rk_dense,
         coalesce(1000000 // ({RRF_K} + s.rk_sparse), 0)
         + coalesce(1000000 // ({RRF_K} + d.rk_dense), 0) AS rrf_ppm
  FROM sparse_rank s
  FULL OUTER JOIN dense_rank d
    ON s.q_id = d.q_id AND s.doc_id = d.doc_id
)
SELECT q_id, doc_id, rk_sparse, rk_dense, rrf_ppm, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
    ORDER BY rrf_ppm DESC, doc_id ASC) AS rk
  FROM fused
) WHERE rk <= {RRF_TOP}
"""


QUERY_DEFS = [
    QueryDef("retrieval_rrf_fusion", retrieval_rrf_fusion, _rrf_oracle()),
]
