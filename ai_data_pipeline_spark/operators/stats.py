"""Statistical profiling operators: Pearson correlation, chi-square
independence, and hashing-trick feature vectorization.

Extends the reference's per-column profiling (SURVEY.md §2.3) to
RELATIONSHIPS between columns — the next thing a data engineer asks of
a profiler ("which metrics move together? are these dimensions
independent?") — plus the standard ML feature-prep step.

Exactness design (the interesting part):
- correlation: all five moment sums (Sx, Sy, Sxy, Sxx, Syy) accumulate
  as LONGS over per-row fixed-point values, with scales chosen so even
  n·Sxx stays inside long range at 10⁹+ rows (quantity ×10, rates
  ×10³). Integer sums are order-independent and mergeable; the single
  final Pearson expression runs in doubles with identical IEEE op
  order in both engines (long→double casts are correctly rounded,
  unlike wide-decimal casts).
- chi-square: observed/expected from integer counts; the statistic is
  one deterministic double expression per cell, summed over the tiny
  contingency relation.
- feature hashing: md5-bucket token counts (the sklearn
  HashingVectorizer shape) — one shuffle on (doc, bucket), vocabulary-
  free by construction, collisions deterministic and oracle-visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

# (name, column, fixed-point scale). Moment sums and the n·sp − s·s
# products accumulate in DECIMAL(38,0): at 100 TB lineitem (~10¹² rows)
# n·sum(x²) reaches ~10²⁹, far past 2⁶³ — long accumulators would throw
# ARITHMETIC_OVERFLOW under ANSI mode. Decimal is exact; the one final
# cast to double matches the oracle's HUGEINT→DOUBLE rounding for all
# driver-checked scales (< 2⁵³).
CORR_METRICS = [
    ("quantity", "l_quantity", 10),
    ("discount", "l_discount", 1000),
    ("tax", "l_tax", 1000),
]
FEATURE_BUCKETS = 256


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the lineitem rate/quantity
    metrics (on their fixed-point quantizations), all pairs from ONE
    aggregation pass — the profiler pattern applied to second-order
    moments."""
    l = load_table(spark, sf_dir, "lineitem")
    fp = l.select(
        *[
            F.floor(F.col(col) * scale).alias(name)
            for name, col, scale in CORR_METRICS
        ]
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast(dec).alias("n")]
    names = [m[0] for m in CORR_METRICS]
    for x in names:
        aggs.append(F.sum(F.col(x).cast(dec)).alias(f"s_{x}"))
        aggs.append(F.sum((F.col(x) * F.col(x)).cast(dec)).alias(f"ss_{x}"))
    for i, x in enumerate(names):
        for y in names[i + 1 :]:
            aggs.append(F.sum((F.col(x) * F.col(y)).cast(dec)).alias(f"sp_{x}_{y}"))
    mom = fp.agg(*aggs)
    pairs = None
    for i, x in enumerate(names):
        for y in names[i + 1 :]:
            num = F.col("n") * F.col(f"sp_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
            den_x = F.col("n") * F.col(f"ss_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")
            den_y = F.col("n") * F.col(f"ss_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
            row = mom.select(
                F.lit(x).alias("metric_x"),
                F.lit(y).alias("metric_y"),
                F.round(
                    num.cast("double")
                    / (F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double"))),
                    6,
                ).alias("pearson_r"),
                F.col("n").cast("long").alias("n_rows"),
            )
            pairs = row if pairs is None else pairs.unionByName(row)
    return pairs


def _corr_oracle() -> str:
    names = [m[0] for m in CORR_METRICS]
    fp_cols = ", ".join(
        f"CAST(floor({col} * {scale}) AS BIGINT) AS {name}"
        for name, col, scale in CORR_METRICS
    )
    aggs = ["count(*) AS n"]
    for x in names:
        aggs.append(f"sum({x}) AS s_{x}")
        aggs.append(f"sum({x} * {x}) AS ss_{x}")
    sel = []
    for i, x in enumerate(names):
        for y in names[i + 1 :]:
            aggs.append(f"sum({x} * {y}) AS sp_{x}_{y}")
            sel.append(
                f"SELECT '{x}' AS metric_x, '{y}' AS metric_y, "
                f"round(CAST(n * sp_{x}_{y} - s_{x} * s_{y} AS DOUBLE) / "
                f"(sqrt(CAST(n * ss_{x} - s_{x} * s_{x} AS DOUBLE)) * "
                f"sqrt(CAST(n * ss_{y} - s_{y} * s_{y} AS DOUBLE))), 6) AS pearson_r, "
                f"n AS n_rows FROM mom"
            )
    return (
        "WITH fp AS (SELECT " + fp_cols + " FROM lineitem),\n"
        "mom AS (SELECT " + ", ".join(aggs) + " FROM fp)\n"
        + "\nUNION ALL\n".join(sel)
    )


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for returnflag × linestatus:
    contingency counts (one shuffle, tiny result), expected cell counts
    from the marginals, the statistic as one deterministic expression."""
    l = load_table(spark, sf_dir, "lineitem")
    obs = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("obs")
    )
    row_tot = obs.groupBy("l_returnflag").agg(F.sum("obs").alias("row_tot"))
    col_tot = obs.groupBy("l_linestatus").agg(F.sum("obs").alias("col_tot"))
    total = obs.agg(F.sum("obs").alias("total"))
    cells = (
        obs.join(F.broadcast(row_tot), "l_returnflag")
        .join(F.broadcast(col_tot), "l_linestatus")
        .crossJoin(F.broadcast(total))
        .withColumn(
            # marginal product in decimal: row_tot·col_tot ~ 10²⁴ at
            # 100 TB — a long multiply would overflow (ANSI throws)
            "expected",
            (F.col("row_tot").cast("decimal(38,0)") * F.col("col_tot"))
            .cast("double")
            / F.col("total"),
        )
        .withColumn(
            "cell_chi2",
            (F.col("obs") - F.col("expected"))
            * (F.col("obs") - F.col("expected"))
            / F.col("expected"),
        )
    )
    return cells.select(
        "l_returnflag",
        "l_linestatus",
        "obs",
        F.round("expected", 6).alias("expected"),
        F.round("cell_chi2", 6).alias("cell_chi2"),
    )


CHI_SQUARE_ORACLE = """
WITH obs AS (
  SELECT l_returnflag, l_linestatus, count(*) AS obs
  FROM lineitem GROUP BY 1, 2
), rt AS (SELECT l_returnflag, sum(obs) AS row_tot FROM obs GROUP BY 1),
ct AS (SELECT l_linestatus, sum(obs) AS col_tot FROM obs GROUP BY 1),
tot AS (SELECT sum(obs) AS total FROM obs)
SELECT o.l_returnflag, o.l_linestatus, o.obs,
  round(CAST(row_tot * col_tot AS DOUBLE) / total, 6) AS expected,
  round((o.obs - CAST(row_tot * col_tot AS DOUBLE) / total)
      * (o.obs - CAST(row_tot * col_tot AS DOUBLE) / total)
      / (CAST(row_tot * col_tot AS DOUBLE) / total), 6) AS cell_chi2
FROM obs o
JOIN rt ON o.l_returnflag = rt.l_returnflag
JOIN ct ON o.l_linestatus = ct.l_linestatus
CROSS JOIN tot
"""


def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick term-frequency features: token → md5 bucket
    (vocabulary-free, fixed dimensionality, mergeable counts) — the
    distributed HashingVectorizer. Output is the sparse (doc, bucket,
    tf) relation; collisions are a deterministic property of the hash,
    not a race."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % FEATURE_BUCKETS
    )
    return d.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("tf")
    )


FEATURE_HASHING_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents
)
SELECT doc_id,
       (CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {FEATURE_BUCKETS}) AS bucket,
       count(*) AS tf
FROM toks WHERE tok <> ''
GROUP BY 1, 2
"""


def q_gini_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity of the market-segment distribution per nation —
    the split-quality metric a feature-selection / decision-tree stage
    computes over every candidate categorical column. Gini = 1 − Σpᵢ²
    is a pure rational (unlike entropy), so it is computed exactly in
    integer ppm: ((N² − Σnᵢ²)·10⁶) div N², alongside the majority-class
    share. Two keyed aggregates with map-side partials — the first
    reduces rows to (group, class) counts, the second to one row per
    group; at 100 TB the shuffle carries counts only."""
    c = load_table(spark, sf_dir, "customer")
    cell = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        cell.groupBy("c_nationkey")
        .agg(
            F.sum("n").alias("n_customers"),
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
            F.max("n").alias("n_majority"),
        )
        .select(
            "c_nationkey",
            "n_customers",
            "n_segments",
            F.expr(
                "((n_customers * n_customers - sum_sq) * 1000000)"
                " div (n_customers * n_customers)"
            ).alias("gini_ppm"),
            F.expr("(n_majority * 1000000) div n_customers").alias(
                "majority_ppm"
            ),
        )
    )


GINI_ORACLE = """
WITH cell AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS n
  FROM customer GROUP BY 1, 2
), g AS (
  SELECT c_nationkey,
         CAST(sum(n) AS BIGINT) AS n_customers,
         count(*) AS n_segments,
         CAST(sum(n * n) AS BIGINT) AS sum_sq,
         max(n) AS n_majority
  FROM cell GROUP BY 1
)
SELECT c_nationkey, n_customers, n_segments,
       ((n_customers * n_customers - sum_sq) * 1000000)
         // (n_customers * n_customers) AS gini_ppm,
       (n_majority * 1000000) // n_customers AS majority_ppm
FROM g
"""


QUERY_DEFS = [
    QueryDef("q_corr_matrix", q_corr_matrix, _corr_oracle()),
    QueryDef("q_gini_segments", q_gini_segments, GINI_ORACLE),
    QueryDef("q_chi_square", q_chi_square, CHI_SQUARE_ORACLE),
    QueryDef("text_feature_hashing", text_feature_hashing, FEATURE_HASHING_ORACLE),
]
