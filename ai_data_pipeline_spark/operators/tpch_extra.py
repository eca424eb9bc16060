"""Additional TPC-H-shape analytics (adapted to the testdata schema,
which has no partsupp/shipmode/phone columns — each query keeps the
optimizer pattern of its namesake, remapped onto available columns).

The reference implements no queries at all (SURVEY.md §2.8); these
widen the relational surface the way TPC-H does for a real engine:
each shape stresses a different Catalyst path.

Scale notes per query:
- q6: the canonical full-pushdown scan — every predicate reaches the
  parquet reader (PushedFilters), zero joins, one partial+final agg.
  At 100 TB this is the I/O-bound best case; anything slower means
  pushdown broke.
- q10: fact⋈fact shuffle join (orders⋈lineitem) + broadcast customer
  dim, top-N on the aggregated (small) side only.
- q12: join + conditional aggregation (CASE inside SUM) — map-side
  partial aggs keep the shuffle tiny regardless of fact size.
- q14: broadcast dim join + two conditional decimal sums → ratio.
- q16: distinct-count per group with a NOT-IN-style anti-join
  (excluded suppliers list is tiny → broadcast anti-join).
- q18: HAVING-on-aggregate semi-join: group lineitem first (shuffle on
  orderkey), filter the aggregate, then join — the join input is
  pre-shrunk, the classic "aggregate below join" rewrite.
- q19: disjunctive multi-conjunct predicate join — Catalyst extracts
  the common p_brand equi-condition; the OR-band residual is evaluated
  post-join on broadcast part.
- q22: scalar-subquery threshold (broadcast 1-row) + anti-join against
  orders, grouped at nation granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.functions import dec_sum
from ai_data_pipeline_spark.registry import QueryDef


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global agg; all predicates pushed down."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns, top 20 customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer scales with SF — no hard hint, AQE decides; nation
        # is fixed-size (25 rows) and keeps its broadcast hint.
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    grouped = joined.groupBy("c_custkey", "c_name", "n_name", "c_acctbal").agg(
        dec_sum(revenue).alias("revenue")
    )
    return grouped.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name, c_acctbal,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts (CASE inside SUM) per group.
    (No l_shipmode column — l_returnflag plays the grouping role,
    o_orderpriority the urgent/non-urgent CASE role.)"""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(urgent.cast("long")).alias("high_line_count"),
            F.sum((~urgent).cast("long")).alias("low_line_count"),
        )
    )


Q12_ORACLE = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — two conditional decimal sums."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    # part scales with SF — join strategy left to AQE
    joined = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (F.lit(100.0) * dec_sum(promo_rev) / dec_sum(revenue)).alias("promo_pct"),
        dec_sum(promo_rev).alias("promo_revenue"),
        dec_sum(revenue).alias("total_revenue"),
    )


Q14_ORACLE = """
SELECT
  100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS promo_pct,
  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part group, excluding a
    NOT-IN supplier list (negative balance ~ the 'complaints' filter).
    No partsupp table — lineitem provides the part↔supplier pairs."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(5, 10, 15, 20, 25))
    )
    bad_s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    # part and the supplier-derived anti side both scale with SF — no
    # hard hints; AQE broadcasts at test scale, shuffles at cluster scale
    pairs = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            bad_s,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


Q18_QTY_THRESHOLD = 180


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold —
    aggregate-then-join so the join input is pre-shrunk."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(dec_sum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("totalprice"),
            "total_qty",
        )
    )


Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
       total_qty
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > {Q18_QTY_THRESHOLD}
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of conjunctive bands over a part join."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    joined = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    band1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(1, 11))
    )
    band2 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 20))
        & (F.col("l_quantity").between(10, 20))
    )
    band3 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 30))
        & (F.col("l_quantity").between(20, 30))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(band1 | band2 | band3).agg(
        dec_sum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


Q19_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders,
    rolled up per nation (nation plays the phone-prefix role)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (dec_sum(F.col("c_acctbal"), 2) / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = rich.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        no_orders.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


Q22_ORACLE = """
SELECT n_name, count(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""


QUERY_DEFS = [
    QueryDef("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE),
    QueryDef("q10_returned_items", q10_returned_items, Q10_ORACLE),
    QueryDef("q12_priority_shipping", q12_priority_shipping, Q12_ORACLE),
    QueryDef("q14_promo_effect", q14_promo_effect, Q14_ORACLE),
    QueryDef("q16_supplier_variety", q16_supplier_variety, Q16_ORACLE),
    QueryDef("q18_large_orders", q18_large_orders, Q18_ORACLE),
    QueryDef("q19_discounted_revenue", q19_discounted_revenue, Q19_ORACLE),
    QueryDef("q22_global_sales_opportunity", q22_global_sales_opportunity, Q22_ORACLE),
]
