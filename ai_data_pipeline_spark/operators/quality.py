"""Data-quality expectation checks and deterministic sampling.

The reference profiles columns but never *enforces* anything (its
`data_quality_notes` field is advisory text, base.py:63). A production
pipeline needs executable expectations: uniqueness, referential
integrity, nullability, and domain rules, each returning a violation
count so a scheduler can gate downstream jobs on `n_violations == 0`.

Scale notes:
- Every check is an aggregate or anti-join — shuffle on the checked
  key only, no row-level output (violations are counted, not
  materialized; a debug variant would `.limit()` sample them).
- The FK check broadcasts the PK side when it is a dim; here
  customer⋈orders anti-join shuffles on custkey like any FK audit.
- All checks over one table share a single scan via one multi-aggregate
  pass where possible (the domain checks below collapse into one agg).
- Stratified sampling orders by md5 of the key — a portable,
  engine-independent deterministic order (identical hex in Spark and
  DuckDB), so seeded-RNG divergence between engines never enters the
  oracle; at scale the window is one shuffle on the stratum key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

SAMPLE_PER_STRATUM = 20


def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per expectation: (check_name, n_violations, n_checked)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")

    # uniqueness: duplicate order keys
    uniq = o.agg(
        F.lit("orders_pk_unique").alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations"),
        F.count(F.lit(1)).alias("n_checked"),
    )
    # referential integrity: orders pointing at no customer
    orphans = o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
    ri = orphans.agg(
        F.lit("orders_custkey_fk").alias("check_name"),
        F.count(F.lit(1)).alias("n_violations"),
    ).crossJoin(o.agg(F.count(F.lit(1)).alias("n_checked")))
    # nullability + domain rules over lineitem: one shared scan/agg
    li = l.agg(
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("null_ship"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")
        ).alias("bad_disc"),
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias("bad_qty"),
        F.count(F.lit(1)).alias("n"),
    )
    li_checks = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem_shipdate_notnull").alias("check_name"),
                    F.col("null_ship").alias("n_violations"),
                    F.col("n").alias("n_checked"),
                ),
                F.struct(
                    F.lit("lineitem_discount_domain").alias("check_name"),
                    F.col("bad_disc").alias("n_violations"),
                    F.col("n").alias("n_checked"),
                ),
                F.struct(
                    F.lit("lineitem_quantity_positive").alias("check_name"),
                    F.col("bad_qty").alias("n_violations"),
                    F.col("n").alias("n_checked"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    return uniq.unionByName(ri).unionByName(li_checks)


DQ_ORACLE = """
SELECT 'orders_pk_unique' AS check_name,
       count(*) - count(DISTINCT o_orderkey) AS n_violations,
       count(*) AS n_checked
FROM orders
UNION ALL
SELECT 'orders_custkey_fk',
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
       count(*)
FROM orders
UNION ALL
SELECT 'lineitem_shipdate_notnull',
       SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END), count(*)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_domain',
       SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END), count(*)
FROM lineitem
UNION ALL
SELECT 'lineitem_quantity_positive',
       SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END), count(*)
FROM lineitem
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly SAMPLE_PER_STRATUM customers per market segment, chosen
    by md5-of-key order: deterministic, uniform-ish, and identical
    across engines (unlike seeded RNG sampling, which is
    engine-specific — `df.sample(seed=)` is the rows-only path)."""
    c = load_table(spark, sf_dir, "customer")
    h = F.md5(F.col("c_custkey").cast("string").cast("binary"))
    w = W.partitionBy("c_mktsegment").orderBy(h.asc(), F.col("c_custkey").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_PER_STRATUM)
        .select("c_mktsegment", "c_custkey", F.col("rn").alias("sample_rank"))
    )


STRATIFIED_ORACLE = f"""
SELECT c_mktsegment, c_custkey, sample_rank FROM (
  SELECT c_mktsegment, c_custkey,
    row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS sample_rank
  FROM customer
) WHERE sample_rank <= {SAMPLE_PER_STRATUM}
"""


QUERY_DEFS = [
    QueryDef("dq_checks", dq_checks, DQ_ORACLE),
    QueryDef("q_stratified_sample", q_stratified_sample, STRATIFIED_ORACLE),
]
