"""Reshaping and subquery-pattern operators: pivot/unpivot, exact
percentiles, and the TPC-H correlated-subquery shapes (Q4 EXISTS,
Q17 per-group scalar) — extensions beyond the reference, which
implements no aggregation queries at all (SURVEY.md §2.8).

Scale notes:
- pivot: fixed value list ⇒ one pass, map-side partial aggregation,
  no second job to discover pivot values.
- unpivot: Expand node (each row emitted k times) — column pruning
  keeps the scan at exactly the k unpivoted columns.
- Q4: EXISTS compiles to a left-semi hash join on the order key; the
  extra date predicate rides along as the join's non-equi condition,
  so no distinct/dedup pass is needed.
- Q17: the correlated scalar subquery (per-part average) is computed
  with a window over the partition key instead of a self-join — one
  shuffle on l_partkey, no re-scan of lineitem. The part filter is a
  broadcast semi-join applied before the shuffle.
- scalar subquery: the global average is a 1-row aggregate broadcast
  to every partition — no driver round-trip, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.functions import dec_sum
from ai_data_pipeline_spark.registry import QueryDef

ORDER_STATUSES = ["F", "O", "P"]
UNPIVOT_METRICS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
Q17_BRAND = "Brand#4"


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority, one column per order status."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"`{s}`"), F.lit(0)).alias(f"n_{s.lower()}")
            for s in ORDER_STATUSES
        ],
    )


Q_PIVOT_ORACLE = """
SELECT o_orderpriority,
  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM orders GROUP BY o_orderpriority
"""


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt four lineitem measures into (metric, value) rows, then
    aggregate per (returnflag, metric)."""
    l = load_table(spark, sf_dir, "lineitem")
    melted = l.unpivot(
        ids=["l_returnflag"],
        values=UNPIVOT_METRICS,
        variableColumnName="metric",
        valueColumnName="val",
    )
    return melted.groupBy("l_returnflag", "metric").agg(
        dec_sum(F.col("val"), 6).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


Q_UNPIVOT_ORACLE = """
SELECT l_returnflag, metric,
  CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) AS total,
  count(*) AS n
FROM (
  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
)
GROUP BY l_returnflag, metric
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of quantity per returnflag (the
    oracle path; the 100 TB tier swaps in percentile_approx sketches,
    declared rows-only, same shape as profile_lineitem_approx)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 6).alias("p95_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("n"),
    )


Q_PERCENTILES_ORACLE = """
SELECT l_returnflag,
  ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
  ROUND(quantile_cont(l_quantity, 0.95), 6) AS p95_qty,
  min(l_quantity) AS min_qty,
  max(l_quantity) AS max_qty,
  count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


QPA_ACCURACY = 1000  # percentile_approx rank error ≤ n/accuracy per group


def q_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB tier of q_percentiles: percentile_approx (a mergeable
    KLL/GK-style quantile sketch — single pass, bounded memory per
    group, no full sort/shuffle of values). Raw estimates are not
    bit-comparable across engines, so (since r10, following the
    sketch_quantile_tolerance pattern) the oracle contract is the
    sketch's per-group rank-error GUARANTEE: for each (group,
    percentile) the sketch value's occupied rank interval within its
    group must intersect target ± (n/accuracy + 2) — an integer
    predicate the oracle asserts, turning a drifting sketch into a
    loud hash-red instead of an unchecked rows-only row.

    Scale: the sketch is one mergeable grouped aggregate; the audit is
    a broadcast of the |groups|·2-row probe relation against one
    conditional-count scan, partitioned by the same group key.

    NULLs are filtered up front on both engines (the sketch's rank
    space is non-null — see sketches.rank_audit_cols, which both
    percentile audits share so the rank convention cannot drift)."""
    from ai_data_pipeline_spark.operators.sketches import rank_audit_cols

    l = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", F.col("l_quantity").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    apx = l.groupBy("l_returnflag").agg(
        F.expr(
            f"percentile_approx(v, array(0.5D, 0.95D), {QPA_ACCURACY})"
        ).alias("avs"),
        F.count(F.lit(1)).alias("n"),
    )
    probes = apx.select(
        "l_returnflag", "n", F.posexplode("avs").alias("i", "av")
    ).select(
        "l_returnflag",
        "n",
        F.element_at(
            F.array(F.lit(50), F.lit(95)), (F.col("i") + 1).cast("int")
        ).alias("q_pct"),
        "av",
    )
    counted = (
        l.join(F.broadcast(probes), "l_returnflag")
        .groupBy("l_returnflag", "q_pct", "n")
        .agg(
            F.sum((F.col("v") < F.col("av")).cast("long")).alias("cnt_lt"),
            F.sum((F.col("v") <= F.col("av")).cast("long")).alias("cnt_le"),
        )
    )
    target, ok = rank_audit_cols(QPA_ACCURACY)
    return counted.select(
        "l_returnflag",
        "q_pct",
        F.col("n").alias("n_rows"),
        target.alias("target_rank"),
        ok.cast("int").alias("sketch_rank_ok"),
    )


QPA_ORACLE = """
WITH per AS (
  SELECT l_returnflag, count(*) AS n FROM lineitem
  WHERE l_quantity IS NOT NULL GROUP BY 1
)
SELECT l_returnflag, q_pct, n AS n_rows,
       (q_pct * n + 99) // 100 AS target_rank,
       1 AS sketch_rank_ok
FROM per CROSS JOIN (SELECT unnest([50, 95]) AS q_pct)
"""


def q4_late_ship_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to this schema's columns): orders in a
    quarter having at least one lineitem shipped >90 days after the
    order date, counted per priority. EXISTS ⇒ left-semi join."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from brand lineitems whose quantity is
    below 20% of that part's average quantity. The correlated scalar
    subquery becomes a window average over l_partkey."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND)
    l = load_table(spark, sf_dir, "lineitem")
    pp = p.select("p_partkey")
    # part (even brand-filtered, 1/25 of it) scales with SF — no hard
    # broadcast hint; AQE decides
    lp = l.join(pp, l["l_partkey"] == pp["p_partkey"], "left_semi")
    w = W.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    small = lp.withColumn("avg_qty", avg_qty).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return small.agg(
        (dec_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q17_ORACLE = f"""
WITH lp AS (
  SELECT l.* FROM lineitem l
  WHERE EXISTS (SELECT 1 FROM part p
                WHERE p.p_partkey = l.l_partkey AND p.p_brand = '{Q17_BRAND}')
), windowed AS (
  SELECT l_quantity, l_extendedprice,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (PARTITION BY l_partkey) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lp
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_items
FROM windowed WHERE l_quantity < 0.2 * avg_qty
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the global average balance, per segment — the
    uncorrelated scalar subquery as a broadcast 1-row join."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.agg(
        (dec_sum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


Q_SCALAR_SUB_ORACLE = """
SELECT c_mktsegment, count(*) AS n_above_avg
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
                   FROM customer)
GROUP BY c_mktsegment
"""


def q_regression_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (price ~ quantity) computed
    from exact decimal component sums — not regr_slope(), whose float
    accumulation order is engine-specific. Σx, Σy, Σxy, Σx² are decimal
    (order-independent, mergeable — this is also the distributed-ML
    reduce shape); the closed-form slope/intercept then divides exact
    doubles, which is deterministic. One scan, one shuffle of five
    numbers per group."""
    l = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    agg = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum(x).alias("sx"),
        dec_sum(y).alias("sy"),
        dec_sum(x * y).alias("sxy"),
        dec_sum(x * x).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return agg.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


Q_REGRESSION_ORACLE = """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept
FROM s
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    distinct on each subsequent day offset. Two aggregations: first-seen
    is a groupBy(user) min (one shuffle on user_id); the join back is on
    the same user_id partitioning (no re-shuffle of the big side under
    AQE reuse); the final cell count shuffles only (cohort, offset)
    pairs. The classic product-analytics query at event-log scale."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


Q_COHORT_ORACLE = """
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
), first AS (
  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
       datediff('day', cohort_day, day) AS day_offset,
       count(DISTINCT e.user_id) AS active_users
FROM e JOIN first USING (user_id)
GROUP BY 1, 2
"""


HIST_WIDTH = 10000


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of extended price: bucket = floor(x/width),
    integer-exact (prices are positive 2-dp doubles; the double divide
    + floor is deterministic). Map-side partial counts make the shuffle
    |buckets|-sized regardless of table size."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(
            F.floor(F.col("l_extendedprice") / HIST_WIDTH).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


Q_HISTOGRAM_ORACLE = f"""
SELECT CAST(floor(l_extendedprice / {HIST_WIDTH}) AS BIGINT) AS bucket,
       count(*) AS n, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
FROM lineitem GROUP BY 1
"""


def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (window over aggregate): revenue per return flag
    and its share of the grand total. The share window runs over the
    tiny grouped result — a second pass over 3 rows, not the fact
    table."""
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    grouped = l.groupBy("l_returnflag").agg(dec_sum(revenue).alias("revenue"))
    return grouped.select(
        "l_returnflag",
        "revenue",
        F.round(
            F.lit(100) * F.col("revenue") / F.sum("revenue").over(W.partitionBy()),
            6,
        ).alias("pct_of_total"),
    )


Q_REVENUE_SHARE_ORACLE = """
WITH g AS (
  SELECT l_returnflag,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
      AS revenue
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, revenue,
       round(100 * revenue / SUM(revenue) OVER (), 6) AS pct_of_total
FROM g
"""


def q_cumulative_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total: revenue per order day, accumulated in date order.
    Daily decimal sums are exact, so the running sum (a second exact
    decimal accumulation over the tiny daily relation) is too. The
    window is a single global sort of |days| rows — the fact table
    never sorts."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev_dec")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day",
        F.col("rev_dec").cast("double").alias("day_revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("cum_revenue"),
    )


Q_CUM_REVENUE_ORACLE = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec
  FROM orders GROUP BY 1
)
SELECT day, CAST(rev_dec AS DOUBLE) AS day_revenue,
       CAST(SUM(rev_dec) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         AS cum_revenue
FROM daily
"""


BASKET_TOP_K = 20


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought in the same order,
    top-K by support. The self-join is keyed on l_orderkey (baskets are
    small — the per-key blowup is |basket|², bounded by order size, not
    table size), pairs are canonicalized a<b, and the top-K sorts only
    the aggregated pair counts. The co-occurrence-mining primitive
    (recommendations, affinity analysis) at fact-table scale."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = l.alias("a")
    b = l.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).groupBy(
        F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return pairs.orderBy(
        F.desc("n_orders"), F.asc("part_a"), F.asc("part_b")
    ).limit(BASKET_TOP_K)


Q_BASKET_ORACLE = f"""
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
FROM lineitem a
JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT {BASKET_TOP_K}
"""


def q_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE deciles of customer balance: assign each customer a decile
    over a TOTAL order (acctbal, custkey — the key tiebreak makes tile
    assignment engine-deterministic), then summarize each tile. The
    global sort is the cost; at 100 TB the same result comes from
    rangepartitioning + per-partition offsets, but NTILE's contract is
    the portable statement of it."""
    c = load_table(spark, sf_dir, "customer")
    w = W.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    tiled = c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(10).over(w).alias("decile"),
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_bal"),
    )


Q_DECILES_ORACLE = """
WITH tiled AS (
  SELECT c_custkey, c_acctbal,
         ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
  FROM customer
)
SELECT decile, count(*) AS n, min(c_acctbal) AS lo, max(c_acctbal) AS hi,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM tiled GROUP BY decile
"""


def q_window_function_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/navigation window functions in one shape:
    rank, dense_rank, first_value, and lag over a per-segment total
    order (acctbal desc, custkey — totality makes every one of them
    engine-deterministic), filtered to each segment's top 3. One
    shuffle on the partition key; the filter on rank caps the output."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.first_value("c_custkey").over(w).alias("top_custkey"),
            F.lag("c_custkey").over(w).alias("prev_custkey"),
        )
        .filter(F.col("rnk") <= 3)
    )


Q_WINDOW_SAMPLER_ORACLE = """
SELECT * FROM (
  SELECT c_mktsegment, c_custkey,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         first_value(c_custkey) OVER w AS top_custkey,
         lag(c_custkey) OVER w AS prev_custkey
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
) WHERE rnk <= 3
"""


def q_percent_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution window functions missing from the sampler:
    percent_rank, cume_dist, and ntile over a per-segment total order
    (acctbal desc, custkey — totality makes all three engine-
    deterministic; both engines evaluate the same (rank−1)/(n−1) and
    rows≤current/n integer-ratio divisions, rounded to 6dp). One
    shuffle on the partition key, every-10th-customer output cap."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    ).filter(F.col("c_custkey") % 10 == 0)


Q_PERCENT_RANK_ORACLE = """
SELECT * FROM (
  SELECT c_mktsegment, c_custkey,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume,
         ntile(4) OVER w AS quartile
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey ASC)
) WHERE c_custkey % 10 = 0
"""


QUERY_DEFS = [
    QueryDef("q_pivot_status", q_pivot_status, Q_PIVOT_ORACLE),
    QueryDef("q_percent_rank_dist", q_percent_rank_dist, Q_PERCENT_RANK_ORACLE),
    QueryDef("q_window_function_sampler", q_window_function_sampler, Q_WINDOW_SAMPLER_ORACLE),
    QueryDef("q_balance_deciles", q_balance_deciles, Q_DECILES_ORACLE),
    QueryDef("q_basket_pairs", q_basket_pairs, Q_BASKET_ORACLE),
    QueryDef("q_revenue_share", q_revenue_share, Q_REVENUE_SHARE_ORACLE),
    QueryDef("q_cumulative_daily_revenue", q_cumulative_daily_revenue, Q_CUM_REVENUE_ORACLE),
    QueryDef("q_price_histogram", q_price_histogram, Q_HISTOGRAM_ORACLE),
    QueryDef("q_regression_price_qty", q_regression_price_qty, Q_REGRESSION_ORACLE),
    QueryDef("q_cohort_retention", q_cohort_retention, Q_COHORT_ORACLE),
    QueryDef("q_unpivot_metrics", q_unpivot_metrics, Q_UNPIVOT_ORACLE),
    QueryDef("q_percentiles", q_percentiles, Q_PERCENTILES_ORACLE),
    QueryDef("q_percentiles_approx", q_percentiles_approx, QPA_ORACLE),
    QueryDef("q4_late_ship_orders", q4_late_ship_orders, Q4_ORACLE),
    QueryDef("q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_ORACLE),
    QueryDef("q_scalar_subquery", q_scalar_subquery, Q_SCALAR_SUB_ORACLE),
]
