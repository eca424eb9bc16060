"""Duplicate-cluster assignment: connected components over near-dup
pairs (the step after pair generation in a large-scale dedup pipeline —
every doc gets a cluster id = min doc_id of its component, so "keep one
per cluster" becomes a trivial filter).

Spark-first design: iterative min-label propagation (Pregel-style).
Each round every vertex takes the min of its own label and its
neighbors' labels; convergence in O(component diameter) rounds. The
driver loop iterates over *rounds* (a handful), never over rows; each
round is one shuffle join + one groupBy, with `localCheckpoint()`
cutting lineage so plans stay flat. At 100 TB the same loop holds —
edges come from LSH band candidates (linear), not all-pairs, and the
alternating large-star/small-star optimization (Kiveris et al.,
"Connected Components in MapReduce", SOCC'14) drops round count to
O(log d); plain propagation is used here because testdata components
have tiny diameters.

The DuckDB oracle computes the same components exactly via a recursive
CTE (transitive closure + min per reach set) — one of the few genuinely
iterative operators that still has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.operators.dedup import DEDUP_NGRAM_ORACLE, dedup_ngram_jaccard
from ai_data_pipeline_spark.registry import QueryDef

CC_MAX_ITERS = 20


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, cluster_size): connected components over
    n-gram-Jaccard near-dup pairs; cluster_id = min doc_id in component."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    # The edge set is tiny relative to the corpus (near-dup pairs only):
    # squeeze it onto a few partitions before the loop so each round's
    # joins schedule a handful of tasks, not shuffle-partitions-many.
    # At larger edge counts the repartition width scales with the data;
    # 8 is right for the ≤ thousands of edges the thresholds admit here.
    sym = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .repartition(8, "src")
        .localCheckpoint()  # materialize once; reused every round
    )
    # Only edge-touched vertices enter the loop: isolated docs are their
    # own singleton component by definition, so the iterated label table
    # is bounded by |near-dup endpoints| (≪ corpus at any scale), and
    # each round shuffles only that.
    labels = (
        sym.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint()
    )
    for _ in range(CC_MAX_ITERS):
        prop = sym.join(labels, sym["src"] == labels["v"]).select(
            F.col("dst").alias("v"), F.col("label"), F.lit(False).alias("own")
        )
        # Fold the convergence check into the same groupBy: the vertex's
        # previous label rides along as min(label where own), so "did
        # anything change" is a cheap filter-count on the checkpointed
        # result — no second shuffle join per round.
        new = (
            labels.select("v", "label", F.lit(True).alias("own"))
            .union(prop)
            .groupBy("v")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("own"), F.col("label"))).alias("old_label"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("label") != F.col("old_label")).count()
        labels = new.select("v", "label")
        if changed == 0:
            break
    assign = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("v"))
        .join(labels, "v", "left")
        .select(
            F.col("v").alias("doc_id"),
            F.coalesce(F.col("label"), F.col("v")).alias("cluster_id"),
        )
    )
    return assign.withColumn(
        "cluster_size", F.count(F.lit(1)).over(W.partitionBy("cluster_id"))
    )


CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({DEDUP_NGRAM_ORACLE})
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach(v, u) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.v, e.b FROM reach r JOIN edges e ON e.a = r.u
), assign AS (
  SELECT v AS doc_id, min(u) AS cluster_id FROM reach GROUP BY v
)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM assign
"""


QUERY_DEFS = [
    QueryDef("dedup_clusters", dedup_clusters, CLUSTERS_ORACLE),
]
