"""Similarity search over the embeddings table (north-star extension).

- ``ann_cosine_topk``: exact brute-force top-k neighbors for a small query
  set. The query side is broadcast, so the big side streams once with no
  shuffle of the corpus; ranking is a per-query window top-k. This is the
  100 TB baseline: cost = |corpus| × |queries| × dim, embarrassingly
  parallel.
- ``ann_lsh_buckets``: random-hyperplane LSH. Hyperplane coefficients are
  derived from pure-integer arithmetic (LCG-style), so both engines
  compute bit-identical planes; bucket = sign-bit signature. At scale,
  top-k runs within buckets only.

Float determinism: vectors are cast float→double, dot products are
sequential left-folds in both engines (same IEEE op order → identical
bits); cosines are rounded to 6 dp for output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
LSH_BITS = 12
EMB_DIM = 64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm_sq(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    pairs = e.filter(F.col("vec_id") >= N_QUERIES).crossJoin(F.broadcast(q))
    cos = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_norm_sq(F.col("v"))) * F.sqrt(_norm_sq(F.col("qv")))
    )
    scored = pairs.select(
        "q_id", "vec_id", F.round(cos, 6).alias("cosine")
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "vec_id", "cosine", "rk")
    )


ANN_TOPK_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q_id, e.vec_id,
    round(
      list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, {EMB_DIM}+1), i -> v[i]*qv[i])), (a,b) -> a+b)
      / (sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, {EMB_DIM}+1), i -> v[i]*v[i])), (a,b) -> a+b))
       * sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, {EMB_DIM}+1), i -> qv[i]*qv[i])), (a,b) -> a+b))),
      6) AS cosine
  FROM e CROSS JOIN q WHERE e.vec_id >= {N_QUERIES}
)
SELECT q_id, vec_id, cosine, rk FROM (
  SELECT q_id, vec_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
"""


def _plane_coef(j: int, i: int) -> int:
    """Deterministic pseudo-random hyperplane coefficient in [-32768, 32767]
    from pure integer arithmetic (identical in any engine / language)."""
    return ((1103515245 * (j * EMB_DIM + i) + 12345) % 65536) - 32768


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit LSH bucketing: 12 deterministic hyperplanes -> bucket id;
    returns bucket histogram (the scale path runs top-k within buckets)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    bucket = F.lit(0)
    for j in range(LSH_BITS):
        coefs = [_plane_coef(j, i) for i in range(EMB_DIM)]
        dot_j = sum(
            (F.col("v")[i] * F.lit(float(c)) for i, c in enumerate(coefs)),
            F.lit(0.0),
        )
        bucket = bucket + F.when(dot_j > 0, 2**j).otherwise(0)
    return (
        e.select("vec_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


def _lsh_oracle() -> str:
    bucket_terms = []
    for j in range(LSH_BITS):
        coefs = [_plane_coef(j, i) for i in range(EMB_DIM)]
        dot = " + ".join(f"v[{i + 1}]*({c}.0)" for i, c in enumerate(coefs))
        bucket_terms.append(f"CASE WHEN ({dot}) > 0 THEN {2**j} ELSE 0 END")
    bucket = " + ".join(bucket_terms)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT ({bucket}) AS bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
FROM e GROUP BY 1
"""


QUERY_DEFS = [
    QueryDef("ann_cosine_topk", ann_cosine_topk, ANN_TOPK_ORACLE),
    QueryDef("ann_lsh_buckets", ann_lsh_buckets, _lsh_oracle()),
]
