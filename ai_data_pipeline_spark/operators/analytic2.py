"""Windowed trend and outlier analytics: moving averages over gapped
daily series, IQR and z-score outlier detection, relative-threshold
heavy hitters.

The reference implements no analytics queries (SURVEY.md §2.8); these
extend the window/statistics surface every warehouse user expects, each
with a DuckDB oracle.

Scale design:
- moving average: aggregate the fact table to |days| rows FIRST (one
  keyed shuffle with map-side partials), then run the RANGE window over
  the tiny daily relation — the fact table is never globally sorted.
  RANGE (not ROWS) over an integer day index handles calendar gaps.
- IQR outliers: per-group exact percentiles over the dimension-sized
  customer table; fences broadcast back to flag rows. At 100 TB the
  exact percentile swaps for percentile_approx (mergeable sketch, same
  plan shape — see q_percentiles_approx precedent).
- z-score outliers: mean/variance from fixed-point integer sums
  (order-independent, mergeable — the same trick as
  emb_label_centroids), so the only float ops are a final per-group
  division/sqrt with identical IEEE order in both engines. One scan +
  one broadcast join back.
- heavy hitters: groupBy count + a 1-row broadcast threshold (0.1% of
  total events) — the exact tier of frequent-item detection; at scale
  the first pass becomes a count-min/space-saving sketch with this
  exact query as the verifier on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

MOVING_AVG_DAYS = 7  # trailing window width (RANGE, calendar-aware)


def q_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing moving average of daily order revenue. Daily sums
    are exact decimals; the window accumulates decimals over an integer
    day index with RANGE framing, so missing calendar days shrink the
    window instead of silently widening it (ROWS would)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).alias("day_num"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev_dec"))
    w = W.orderBy("day_num").rangeBetween(-(MOVING_AVG_DAYS - 1), 0)
    return daily.select(
        "day",
        F.col("rev_dec").cast("double").alias("day_revenue"),
        (F.sum("rev_dec").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "avg_7d"
        ),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


Q_MOVING_AVG_ORACLE = f"""
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_num,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec
  FROM orders GROUP BY 1, 2
)
SELECT day,
  CAST(rev_dec AS DOUBLE) AS day_revenue,
  CAST(SUM(rev_dec) OVER w AS DOUBLE) / COUNT(*) OVER w AS avg_7d,
  COUNT(*) OVER w AS days_in_window
FROM daily
WINDOW w AS (ORDER BY day_num RANGE BETWEEN {MOVING_AVG_DAYS - 1} PRECEDING
             AND CURRENT ROW)
"""


def q_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR outlier detection per market segment: Tukey fences at
    1.5×IQR off the exact interpolated quartiles of account balance;
    fences broadcast back over the table to count flagged rows."""
    c = load_table(spark, sf_dir, "customer")
    fences = c.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.25)").alias("q1"),
        F.expr("percentile(c_acctbal, 0.75)").alias("q3"),
    )
    flagged = c.join(F.broadcast(fences), "c_mktsegment").select(
        "c_mktsegment",
        "c_acctbal",
        "q1",
        "q3",
        (
            (F.col("c_acctbal") < F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
            | (F.col("c_acctbal") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        ).alias("is_outlier"),
    )
    return flagged.groupBy("c_mktsegment").agg(
        F.round(F.min("q1"), 6).alias("q1"),
        F.round(F.min("q3"), 6).alias("q3"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q_OUTLIERS_IQR_ORACLE = """
WITH fences AS (
  SELECT c_mktsegment,
         quantile_cont(c_acctbal, 0.25) AS q1,
         quantile_cont(c_acctbal, 0.75) AS q3
  FROM customer GROUP BY 1
)
SELECT c.c_mktsegment,
  ROUND(MIN(q1), 6) AS q1,
  ROUND(MIN(q3), 6) AS q3,
  CAST(SUM(CASE WHEN c_acctbal < q1 - 1.5 * (q3 - q1)
            OR c_acctbal > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  COUNT(*) AS n_rows
FROM customer c JOIN fences f ON c.c_mktsegment = f.c_mktsegment
GROUP BY 1
"""


ZSCORE_CUT = 3  # |z| > 3 flags an outlier


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outliers per event type over events.value. Moments come
    from fixed-point longs (floor(value·10³) — scale chosen so the sum
    of squares stays far inside long range): integer sums are
    order-independent and mergeable, so the only float arithmetic is
    the final mean/variance division and sqrt — written with identical
    IEEE op order in both engines. The |z|>3 comparison is applied on
    the fixed-point row value against the group moments."""
    e = load_table(spark, sf_dir, "events")
    fp = e.select(
        "event_type", F.floor(F.col("value") * 1000).alias("v_fp")
    )
    # moment sums in DECIMAL(38,0): v_fp^2 is ~1e12 per row, so a LONG
    # sum overflows around 1e7 rows per group (ANSI mode throws) — the
    # decimal accumulator is exact at any scale and casts to double
    # identically for values < 2^53
    mom = fp.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v_fp").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("v_fp") * F.col("v_fp")).cast("decimal(38,0)")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    flagged = fp.join(F.broadcast(mom), "event_type").select(
        "event_type",
        "n",
        (
            F.abs(F.col("v_fp").cast("double") - mean) > F.lit(float(ZSCORE_CUT)) * F.sqrt(var)
        ).alias("is_outlier"),
    )
    return flagged.groupBy("event_type").agg(
        F.min("n").alias("n_rows"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
    )


Q_ZSCORE_ORACLE = f"""
WITH fp AS (
  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS v_fp FROM events
), mom AS (
  SELECT event_type, count(*) AS n, sum(v_fp) AS s1, sum(v_fp * v_fp) AS s2
  FROM fp GROUP BY 1
)
SELECT fp.event_type,
  MIN(n) AS n_rows,
  CAST(SUM(CASE WHEN abs(CAST(v_fp AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
            > {float(ZSCORE_CUT)} * sqrt(CAST(s2 AS DOUBLE) / n
              - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM fp JOIN mom ON fp.event_type = mom.event_type
GROUP BY 1
"""


HEAVY_HITTER_FRACTION = 0.001  # 0.1% of all events


def q_heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-item detection, exact tier: users owning more than
    0.1% of all events (threshold = 1-row broadcast scalar). At 100 TB
    the first pass becomes a space-saving/count-min sketch; this exact
    groupBy is the candidate verifier."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    threshold = per_user.agg(
        (F.sum("n_events") * F.lit(HEAVY_HITTER_FRACTION)).alias("cut")
    )
    return (
        per_user.crossJoin(F.broadcast(threshold))
        .filter(F.col("n_events") > F.col("cut"))
        .select("user_id", "n_events")
    )


Q_HEAVY_HITTER_ORACLE = f"""
SELECT user_id, count(*) AS n_events
FROM events
GROUP BY user_id
HAVING count(*) > (SELECT count(*) * {HEAVY_HITTER_FRACTION} FROM events)
"""


# Exponential time decay with a 7-day half-life, STEP-quantized per
# half-life so weights are exact powers of two: a row aged a days
# weighs DECAY_SCALE >> (a div 7). Integer throughout — both engines
# compute the same shift, so the decayed scores are oracle-exact
# (the usual e^{-lambda*age} form is a float fold whose partial-sum
# order Spark does not fix).
DECAY_SCALE = 1 << 20
DECAY_HALF_LIFE_DAYS = 7
DECAY_TOP_K = 10


def q_decayed_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted heavy hitters — the ranking q_heavy_hitter_users
    cannot express: a user's mass halves every 7 days of age, so a
    burst last week outranks steady history from a month ago. Exact
    integer decayed scores (see DECAY_SCALE note), one keyed aggregate
    with map-side combines over (user, weight) partials, then the
    two-level tournament for the top K — no corpus-wide window. At
    100 TB the per-(user, half-life-bucket) partial counts are the
    mergeable state: yesterday's scores re-weight by one shift instead
    of rescanning history."""
    from ai_data_pipeline_spark.functions import topk_per_key

    e = load_table(spark, sf_dir, "events")
    maxd = e.agg(F.max(F.to_date("ts")).alias("d_max"))
    scored = (
        e.crossJoin(F.broadcast(maxd))  # 1-row scalar
        .select(
            "user_id",
            # Shift CLAMPED at 20 half-lives (weight has decayed to 1
            # there; beyond it the weight is 0 outright). Unclamped,
            # the engines diverge on old rows: Spark's shiftleft masks
            # the shift mod 32 (an age of 224d would wrap to weight
            # 2^20), while DuckDB raises on a shift >= 31.
            F.expr(
                f"CASE WHEN datediff(d_max, to_date(ts))"
                f" div {DECAY_HALF_LIFE_DAYS} > 20 THEN 0"
                f" ELSE {DECAY_SCALE} div shiftleft(1, "
                f"datediff(d_max, to_date(ts)) div {DECAY_HALF_LIFE_DAYS})"
                f" END"
            ).alias("w"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("w").alias("decayed_score"),
        )
    )
    return topk_per_key(
        scored.withColumn("_g", F.lit(0)),
        ["_g"],
        [F.desc("decayed_score"), F.asc("user_id")],
        DECAY_TOP_K,
    ).select("user_id", "n_events", "decayed_score", F.col("rk").cast("int").alias("rk"))


Q_DECAYED_HH_ORACLE = f"""
WITH maxd AS (
  SELECT max(CAST(ts AS DATE)) AS d_max FROM events
), scored AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum(CASE WHEN date_diff('day', CAST(ts AS DATE), d_max)
                            // {DECAY_HALF_LIFE_DAYS} > 20 THEN 0
                       ELSE {DECAY_SCALE} //
                            (1 << (date_diff('day', CAST(ts AS DATE), d_max)
                                   // {DECAY_HALF_LIFE_DAYS})) END)
              AS BIGINT) AS decayed_score
  FROM events CROSS JOIN maxd
  GROUP BY user_id
)
SELECT user_id, n_events, decayed_score,
       CAST(row_number() OVER (ORDER BY decayed_score DESC, user_id)
            AS INT) AS rk
FROM scored
ORDER BY decayed_score DESC, user_id
LIMIT {DECAY_TOP_K}
"""


def q_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with LOCF (last-observation-carried-forward,
    the hypertable `locf(...)` idiom): the dense calendar comes from
    sequence()+explode (generated, not scanned), outer-joins the
    per-(type, day) aggregates, and a last-non-null window carries
    values across the gaps. The window partitions by event_type and
    orders by day over the |types|×|days| filled relation — metadata-
    sized regardless of fact volume."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("val_dec"))
    span = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    types = daily.select("event_type").distinct()
    grid = calendar.crossJoin(F.broadcast(types))
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(
        W.unboundedPreceding, 0
    )
    filled = grid.join(daily, ["event_type", "day"], "left_outer").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("val_dec").cast("double").alias("day_value"),
        F.last("val_dec", ignorenulls=True).over(w).cast("double").alias("filled_value"),
        F.col("val_dec").isNull().alias("is_gap"),
    )
    return filled


Q_GAP_FILL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS val_dec
  FROM events GROUP BY 1, 2
), span AS (
  SELECT min(day) AS d0, max(day) AS d1 FROM daily
), calendar AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM span
), grid AS (
  SELECT c.day, t.event_type
  FROM calendar c CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
)
SELECT g.event_type,
       strftime(g.day, '%Y-%m-%d') AS day,
       CAST(val_dec AS DOUBLE) AS day_value,
       CAST(last_value(val_dec IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.day
         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS filled_value,
       val_dec IS NULL AS is_gap
FROM grid g LEFT OUTER JOIN daily d
  ON g.event_type = d.event_type AND g.day = d.day
"""


MAD_K = 3  # flag |x - median| > MAD_K * MAD


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection — the robust
    complement to the IQR and z-score detectors (a single extreme value
    cannot move the median or the MAD, unlike the mean/stddev): per
    return flag, median quantity, MAD, and the count of rows beyond
    MAD_K·MAD from the median.

    Two aggregation passes (median, then median-of-deviations with the
    group medians joined back — dimension-sized, broadcast); at 100 TB
    the exact percentile swaps for the mergeable percentile_approx
    sketch, same shape as q_percentiles' documented tier."""
    l = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    med = l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med")
    )
    dev = l.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", "med", F.abs(F.col("l_quantity") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.expr("percentile(ad, 0.5)").alias("mad_exact")
    )
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("med"), 6).alias("median_qty"),
            F.round(F.first("mad_exact"), 6).alias("mad_qty"),
            F.sum((F.col("ad") > MAD_K * F.col("mad_exact")).cast("long")).alias(
                "n_outliers"
            ),
        )
    )


Q_MAD_ORACLE = f"""
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
  FROM lineitem GROUP BY 1
), dev AS (
  SELECT l.l_returnflag, med, abs(l_quantity - med) AS ad
  FROM lineitem l JOIN med USING (l_returnflag)
), mad AS (
  SELECT l_returnflag, quantile_cont(ad, 0.5) AS mad_exact
  FROM dev GROUP BY 1
)
SELECT d.l_returnflag,
       count(*) AS n,
       round(any_value(d.med), 6) AS median_qty,
       round(any_value(m.mad_exact), 6) AS mad_qty,
       CAST(sum(CASE WHEN d.ad > {MAD_K} * m.mad_exact THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (l_returnflag)
GROUP BY d.l_returnflag
"""


QUERY_DEFS = [
    QueryDef("q_moving_avg_7d", q_moving_avg_7d, Q_MOVING_AVG_ORACLE),
    QueryDef("q_mad_outliers", q_mad_outliers, Q_MAD_ORACLE),
    QueryDef("q_gap_fill_locf", q_gap_fill_locf, Q_GAP_FILL_ORACLE),
    QueryDef("q_outliers_iqr", q_outliers_iqr, Q_OUTLIERS_IQR_ORACLE),
    QueryDef("q_zscore_outliers", q_zscore_outliers, Q_ZSCORE_ORACLE),
    QueryDef("q_heavy_hitter_users", q_heavy_hitter_users, Q_HEAVY_HITTER_ORACLE),
    QueryDef(
        "q_decayed_heavy_hitters", q_decayed_heavy_hitters, Q_DECAYED_HH_ORACLE
    ),
]
