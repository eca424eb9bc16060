"""Approximate query processing (AQP): answer aggregate queries from a
deterministic hash sample with a CHECKED error bar, instead of scanning
everything.

At 100 TB this is the difference between a dashboard query that reads
1.5 TB and one that reads all 100: a 1/64 hash sample answers SUM/AVG
questions within a fraction of a percent, and — unlike row-order
dependent `TABLESAMPLE` — the md5(key)-mod membership used here is a
pure function of each row's business key, so the sample is (a) stable
across runs/partitionings, (b) co-sampling-consistent across tables
sharing the key (join two 1/64 samples and you get the 1/64 sample of
the join), and (c) reproducible by the DuckDB oracle, which makes the
ESTIMATES exactly checkable, not just plausible.

Error bars are Horvitz–Thompson: with inclusion probability p = 1/d,
the total estimate is (sample sum)/p and its variance estimate is
Σ_sample x²·(1−p)/p². The inputs (ssq, d) are exact integers; the
product ssq·d·(d−1) can exceed 2^53 already near sf0.1–sf1, so the CI
is NOT claimed exact — it is the SAME double product with identical
literal association in both engines, followed by one sqrt, which is
what makes it hash-identical cross-engine. Flags assert
|est − exact| ≤ z·se with z = 5 (the house 5σ convention for
oracle-bearing tolerance flags); the sample is a deterministic
function of the dataset, so the flag is a fixed property of each
fixture (verified at all three SFs), not a per-run coin flip — the
q_daily_users_hll precedent.

The allocation query is the planning side of the same story: Neyman
allocation n_h ∝ N_h·s_h tells a 100 TB pipeline how to split a fixed
sampling budget across strata BEFORE paying for the big scan, computed
here from exact per-stratum moments (one groupBy) so the oracle checks
the arithmetic end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

AQP_HEX = 12  # 48-bit hash: uniform mod small denominators, int64-safe
AQP_DENOM = 64  # headline sampling rate 1/64
AQP_Z = 5  # CI half-width in standard errors (house 5σ flag convention)
AQP_BUDGET = 10_000  # rows of sampling budget the allocation splits


def _row_hash_expr() -> F.Column:
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return F.conv(F.substring(F.md5(key), 1, AQP_HEX), 16, 10).cast("long")


def _row_hash_sql() -> str:
    return (
        "CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || "
        f"CAST(l_linenumber AS VARCHAR)), 1, {AQP_HEX})) AS BIGINT)"
    )


# Revenue in exact integer cents: the double product is IEEE-identical
# in both engines (same literal association), and round() of a positive
# double is half-away-from-zero in both.
def _rev_cents_expr() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0)
    ).cast("long")


_REV_CENTS_SQL = (
    "CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)"
)


def _ci_cents(ssq_dollars: F.Column, denom: int) -> F.Column:
    """z·se of the HT total estimate, in cents: se² = ssq·d·(d−1) in
    dollars² (exact integers); the product is taken in DOUBLE so large
    SFs can't overflow int64 — one multiply chain and one sqrt, both
    IEEE-identical across engines."""
    v = ssq_dollars.cast("double") * F.lit(float(denom)) * F.lit(float(denom - 1))
    return F.floor(F.lit(float(AQP_Z)) * F.sqrt(v) * F.lit(100.0)).cast("long")


def _ci_cents_sql(ssq: str, denom: int) -> str:
    return (
        f"CAST(floor({float(AQP_Z)} * "
        f"sqrt(CAST({ssq} AS DOUBLE) * {float(denom)} * {float(denom - 1)}) "
        "* 100.0) AS BIGINT)"
    )


def aqp_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline AQP row: total discounted revenue from a 1/64
    deterministic hash sample of lineitem, next to the exact total,
    with the Horvitz–Thompson 5σ CI and its coverage flag. One scan
    computes both sides here so the CHECK is airtight; the production
    form computes only the sample side and reads 1/64 of the bytes."""
    li = load_table(spark, sf_dir, "lineitem")
    base = (
        li.select(
            _row_hash_expr().alias("h"),
            _rev_cents_expr().alias("cents"),
        )
        .withColumn("member", (F.col("h") % AQP_DENOM == 0).cast("long"))
        .withColumn("dollars", F.expr("cents div 100"))
    )
    # The sample-side sums are coalesced to 0 so a zero-row input agrees
    # with the oracle's `coalesce(sum(...) FILTER ..., 0)` (Spark's sum
    # over no rows is NULL; the oracle's filtered-count is 0).
    agg = base.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.coalesce(F.sum("member"), F.lit(0)).alias("n_sample"),
        F.sum("cents").alias("exact_cents"),
        F.coalesce(F.sum(F.col("member") * F.col("cents")), F.lit(0)).alias(
            "s_cents"
        ),
        F.coalesce(
            F.sum(F.col("member") * F.col("dollars") * F.col("dollars")), F.lit(0)
        ).alias("ssq"),
    )
    est = F.col("s_cents") * AQP_DENOM
    ci = _ci_cents(F.col("ssq"), AQP_DENOM)
    return agg.select(
        "n_total",
        "n_sample",
        "exact_cents",
        est.alias("est_cents"),
        F.expr(
            f"abs(s_cents * {AQP_DENOM} - exact_cents) * 1000000 div exact_cents"
        ).alias("err_ppm"),
        ci.alias("ci_cents"),
        (F.abs(est - F.col("exact_cents")) <= ci).cast("int").alias("within_ci"),
    )


def _sample_estimate_oracle() -> str:
    return f"""
WITH base AS (
  SELECT {_row_hash_sql()} AS h, {_REV_CENTS_SQL} AS cents
  FROM lineitem
), agg AS (
  SELECT count(*) AS n_total,
         CAST(count(*) FILTER (WHERE h % {AQP_DENOM} = 0) AS BIGINT)
           AS n_sample,
         CAST(sum(cents) AS BIGINT) AS exact_cents,
         CAST(coalesce(sum(cents) FILTER (WHERE h % {AQP_DENOM} = 0), 0)
              AS BIGINT) AS s_cents,
         CAST(coalesce(sum((cents // 100) * (cents // 100))
                       FILTER (WHERE h % {AQP_DENOM} = 0), 0) AS BIGINT)
           AS ssq
  FROM base
)
SELECT n_total, n_sample, exact_cents,
       s_cents * {AQP_DENOM} AS est_cents,
       abs(s_cents * {AQP_DENOM} - exact_cents) * 1000000 // exact_cents
         AS err_ppm,
       {_ci_cents_sql("ssq", AQP_DENOM)} AS ci_cents,
       CAST(abs(s_cents * {AQP_DENOM} - exact_cents)
            <= {_ci_cents_sql("ssq", AQP_DENOM)} AS INT) AS within_ci
FROM agg
"""


AQP_DENOMS = [16, 64, 256]


def aqp_sample_staircase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accuracy/cost staircase: the SAME scan evaluated at nested
    sampling rates 1/16 ⊃ 1/64 ⊃ 1/256 (multiples of 256 are multiples
    of 64 are multiples of 16, so each sample contains the next — the
    property that lets a 100 TB pipeline keep ONE stored sample column
    and dial the rate per query). One row per rate with the HT
    estimate, realized error, and checked 5σ coverage."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        _row_hash_expr().alias("h"), _rev_cents_expr().alias("cents")
    ).withColumn("dollars", F.expr("cents div 100"))
    # Sample-side sums coalesce to 0 (empty-input agreement with the
    # oracle's `coalesce(... FILTER ..., 0)` — see aqp_sample_estimate).
    aggs = [F.sum("cents").alias("exact_cents")]
    for d in AQP_DENOMS:
        m = (F.col("h") % d == 0).cast("long")
        aggs += [
            F.coalesce(F.sum(m), F.lit(0)).alias(f"n_{d}"),
            F.coalesce(F.sum(m * F.col("cents")), F.lit(0)).alias(f"s_{d}"),
            F.coalesce(
                F.sum(m * F.col("dollars") * F.col("dollars")), F.lit(0)
            ).alias(f"q_{d}"),
        ]
    wide = base.agg(*aggs)
    stack_args = ", ".join(
        f"{d}, n_{d}, s_{d} * {d}, "
        f"abs(s_{d} * {d} - exact_cents) * 1000000 div exact_cents, q_{d}"
        for d in AQP_DENOMS
    )
    tall = wide.select(
        "exact_cents",
        F.expr(
            f"stack({len(AQP_DENOMS)}, {stack_args}) "
            "AS (denom, n_sample, est_cents, err_ppm, ssq)"
        ),
    )
    ci = F.floor(
        F.lit(float(AQP_Z))
        * F.sqrt(
            F.col("ssq").cast("double")
            * F.col("denom").cast("double")
            * (F.col("denom").cast("double") - F.lit(1.0))
        )
        * F.lit(100.0)
    ).cast("long")
    return tall.select(
        "denom",
        "n_sample",
        "est_cents",
        "err_ppm",
        ci.alias("ci_cents"),
        (F.abs(F.col("est_cents") - F.col("exact_cents")) <= ci)
        .cast("int")
        .alias("within_ci"),
    )


def _staircase_oracle() -> str:
    per_denom = []
    for d in AQP_DENOMS:
        per_denom.append(
            f"""
  SELECT {d} AS denom,
         CAST(count(*) FILTER (WHERE h % {d} = 0) AS BIGINT) AS n_sample,
         CAST(coalesce(sum(cents) FILTER (WHERE h % {d} = 0), 0) AS BIGINT)
           * {d} AS est_cents,
         abs(CAST(coalesce(sum(cents) FILTER (WHERE h % {d} = 0), 0)
                  AS BIGINT) * {d} - CAST(sum(cents) AS BIGINT)) * 1000000
           // CAST(sum(cents) AS BIGINT) AS err_ppm,
         CAST(coalesce(sum(dollars * dollars) FILTER (WHERE h % {d} = 0), 0)
              AS BIGINT) AS ssq,
         CAST(sum(cents) AS BIGINT) AS exact_cents
  FROM base"""
        )
    union = "\n  UNION ALL\n".join(per_denom)
    return f"""
WITH base AS (
  SELECT {_row_hash_sql()} AS h, {_REV_CENTS_SQL} AS cents,
         {_REV_CENTS_SQL} // 100 AS dollars
  FROM lineitem
), tall AS (
{union}
)
SELECT denom, n_sample, est_cents, err_ppm,
       CAST(floor({float(AQP_Z)} * sqrt(CAST(ssq AS DOUBLE) *
            CAST(denom AS DOUBLE) * (CAST(denom AS DOUBLE) - 1.0)) * 100.0)
            AS BIGINT) AS ci_cents,
       CAST(abs(est_cents - exact_cents) <=
            CAST(floor({float(AQP_Z)} * sqrt(CAST(ssq AS DOUBLE) *
                 CAST(denom AS DOUBLE) * (CAST(denom AS DOUBLE) - 1.0))
                 * 100.0) AS BIGINT) AS INT) AS within_ci
FROM tall
"""


def aqp_stratified_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation of a fixed sampling budget across the
    (l_returnflag, l_linestatus) strata of lineitem (classic TPC-H has
    four — A/F, N/F, N/O, R/F — the synthetic fixture yields six):
    n_h ∝ N_h·s_h — strata that
    are big AND volatile get the rows. Per-stratum moments come from
    one exact integer groupBy (the 100 TB plan: moments from the
    stats-collection pass or a prior sample, never a second full
    scan); the std/allocation arithmetic is a fixed IEEE expression
    over those exact integers, so every output digit is
    oracle-checked. Emits per stratum: size, mean revenue, std,
    permille share, and the row budget slice."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        "l_linestatus",
        _rev_cents_expr().alias("cents"),
    ).withColumn("dollars", F.expr("cents div 100"))
    per = base.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("sum_cents"),
        F.sum("dollars").alias("sum_d"),
        F.sum(F.col("dollars") * F.col("dollars")).alias("ssq_d"),
    )
    # Unbiased per-stratum variance in dollars², from exact integers:
    # (ssq − sum²/n) / (n−1); each CAST point mirrored in the oracle.
    s2 = (
        F.col("ssq_d").cast("double")
        - F.col("sum_d").cast("double")
        * F.col("sum_d").cast("double")
        / F.col("n_rows").cast("double")
    ) / (F.col("n_rows").cast("double") - F.lit(1.0))
    # Weights are quantized to INTEGER (n_h · sd-in-cents) BEFORE the
    # cross-stratum sum: summing the raw double weights would hang the
    # output on Spark's unfixed partial-sum fold order (a last-ulp
    # difference vs the oracle flips a floor at a ratio boundary) —
    # the same float-fold class the decayed-weight query documents.
    # greatest(s2, 0): a (near-)zero-variance stratum with sums past
    # 2^53 can round s2 slightly negative — Spark sqrt(neg) is NULL but
    # DuckDB sqrt(neg) RAISES, so both engines clamp before the root.
    # round-14 audit: `w` feeds both the budget total and the output
    # projection, but the duplicate is ABOVE the (returnflag,
    # linestatus) exchange, which AQE's exchange reuse dedupes inside
    # the executed plan — an eager checkpoint was TRIED and REVERTED
    # (alternating A/B: 0.44 s lazy vs 0.79 s checkpointed; the
    # blocking materialization job costs more than the reused read).
    w = per.withColumn(
        "sd_cents",
        F.floor(F.sqrt(F.greatest(s2, F.lit(0.0))) * F.lit(100.0)).cast("long"),
    ).withColumn("w_int", F.col("n_rows") * F.col("sd_cents"))
    total = w.agg(F.sum("w_int").alias("w_total"))
    return (
        w.crossJoin(F.broadcast(total))
        .select(
            "l_returnflag",
            "l_linestatus",
            "n_rows",
            F.expr("sum_cents div n_rows").alias("mean_cents"),
            "sd_cents",
            F.floor(
                F.lit(1000.0) * F.col("w_int").cast("double")
                / F.col("w_total").cast("double")
            )
            .cast("long")
            .alias("share_permille"),
            F.floor(
                F.lit(float(AQP_BUDGET)) * F.col("w_int").cast("double")
                / F.col("w_total").cast("double")
            )
            .cast("long")
            .alias("n_alloc"),
        )
    )


def _stratified_oracle() -> str:
    s2 = (
        "(CAST(ssq_d AS DOUBLE) - CAST(sum_d AS DOUBLE) * CAST(sum_d AS DOUBLE)"
        " / CAST(n_rows AS DOUBLE)) / (CAST(n_rows AS DOUBLE) - 1.0)"
    )
    return f"""
WITH base AS (
  SELECT l_returnflag, l_linestatus, {_REV_CENTS_SQL} AS cents,
         {_REV_CENTS_SQL} // 100 AS dollars
  FROM lineitem
), per AS (
  SELECT l_returnflag, l_linestatus,
         count(*) AS n_rows,
         CAST(sum(cents) AS BIGINT) AS sum_cents,
         CAST(sum(dollars) AS BIGINT) AS sum_d,
         CAST(sum(dollars * dollars) AS BIGINT) AS ssq_d
  FROM base GROUP BY 1, 2
), w AS (
  SELECT *, CAST(floor(sqrt(greatest({s2}, 0.0)) * 100.0) AS BIGINT) AS sd_cents
  FROM per
), wi AS (
  SELECT *, n_rows * sd_cents AS w_int FROM w
), tot AS (
  SELECT CAST(sum(w_int) AS BIGINT) AS w_total FROM wi
)
SELECT l_returnflag, l_linestatus, n_rows,
       sum_cents // n_rows AS mean_cents,
       sd_cents,
       CAST(floor(1000.0 * CAST(w_int AS DOUBLE) / CAST(w_total AS DOUBLE))
            AS BIGINT) AS share_permille,
       CAST(floor({float(AQP_BUDGET)} * CAST(w_int AS DOUBLE)
                  / CAST(w_total AS DOUBLE)) AS BIGINT) AS n_alloc
FROM wi CROSS JOIN tot
"""


def aqp_group_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP AQP — the dashboard case: revenue per l_returnflag
    from the same 1/64 sample, one row per group with its own HT
    estimate, CI, and coverage flag. The point the single-total query
    can't make: per-group error widths differ (small groups get wide
    CIs), and the flag checks each group independently."""
    li = load_table(spark, sf_dir, "lineitem")
    base = (
        li.select(
            "l_returnflag",
            _row_hash_expr().alias("h"),
            _rev_cents_expr().alias("cents"),
        )
        .withColumn("member", (F.col("h") % AQP_DENOM == 0).cast("long"))
        .withColumn("dollars", F.expr("cents div 100"))
    )
    agg = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("member").alias("n_sample"),
        F.sum("cents").alias("exact_cents"),
        F.sum(F.col("member") * F.col("cents")).alias("s_cents"),
        F.sum(F.col("member") * F.col("dollars") * F.col("dollars")).alias("ssq"),
    )
    est = F.col("s_cents") * AQP_DENOM
    ci = _ci_cents(F.col("ssq"), AQP_DENOM)
    return agg.select(
        "l_returnflag",
        "n_total",
        "n_sample",
        "exact_cents",
        est.alias("est_cents"),
        F.expr(
            f"abs(s_cents * {AQP_DENOM} - exact_cents) * 1000000 div exact_cents"
        ).alias("err_ppm"),
        ci.alias("ci_cents"),
        (F.abs(est - F.col("exact_cents")) <= ci).cast("int").alias("within_ci"),
    )


def _group_estimate_oracle() -> str:
    return f"""
WITH base AS (
  SELECT l_returnflag, {_row_hash_sql()} AS h, {_REV_CENTS_SQL} AS cents
  FROM lineitem
), agg AS (
  SELECT l_returnflag,
         count(*) AS n_total,
         CAST(count(*) FILTER (WHERE h % {AQP_DENOM} = 0) AS BIGINT)
           AS n_sample,
         CAST(sum(cents) AS BIGINT) AS exact_cents,
         CAST(coalesce(sum(cents) FILTER (WHERE h % {AQP_DENOM} = 0), 0)
              AS BIGINT) AS s_cents,
         CAST(coalesce(sum((cents // 100) * (cents // 100))
                       FILTER (WHERE h % {AQP_DENOM} = 0), 0) AS BIGINT)
           AS ssq
  FROM base GROUP BY 1
)
SELECT l_returnflag, n_total, n_sample, exact_cents,
       s_cents * {AQP_DENOM} AS est_cents,
       abs(s_cents * {AQP_DENOM} - exact_cents) * 1000000 // exact_cents
         AS err_ppm,
       {_ci_cents_sql("ssq", AQP_DENOM)} AS ci_cents,
       CAST(abs(s_cents * {AQP_DENOM} - exact_cents)
            <= {_ci_cents_sql("ssq", AQP_DENOM)} AS INT) AS within_ci
FROM agg
"""


# Single-key hashing reuses the KMV tier's helpers (sketches.py) —
# ONE copy of the cross-engine md5-prefix contract; KMV_HEX == AQP_HEX
# is asserted at import so the two tiers cannot silently diverge.
from ai_data_pipeline_spark.operators.sketches import (  # noqa: E402
    KMV_HEX as _SKETCH_HEX,
    _kmv_hash_expr as _okey_hash_expr,
    _kmv_hash_sql as _okey_hash_sql,
)

assert _SKETCH_HEX == AQP_HEX


def aqp_universe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQP across a JOIN — the case row-independent sampling gets
    wrong: Bernoulli-sample both sides at 1/64 and the join of the
    samples keeps only ~1/4096 of join rows (quadratically biased).
    UNIVERSE sampling (Quickr / BlinkDB lineage) samples both tables
    by the SAME hash of the JOIN KEY, so membership is perfectly
    correlated: the join of the two samples IS the 1/64 key-sample of
    the join, and the estimate scales by 1/p once, not twice.

    Emits the identity as a checked flag — joined-samples mass ==
    key-sampled-join mass (count and sum both) — plus the scaled
    revenue estimate for high-priority orders against the exact
    total. At 100 TB both sample scans prune to 1/64 of each table
    BEFORE the shuffle; the exact side here is the audit."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", _okey_hash_expr("o_orderkey").alias("ho")
    )
    l = li.select(
        "l_orderkey",
        _okey_hash_expr("l_orderkey").alias("hl"),
        _rev_cents_expr().alias("cents"),
    )
    # side A: join of the two key-samples
    sampled_join = (
        o.filter(F.col("ho") % AQP_DENOM == 0)
        .join(
            l.filter(F.col("hl") % AQP_DENOM == 0),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_a"),
            F.coalesce(F.sum("cents"), F.lit(0)).alias("s_a"),
        )
    )
    # side B: key-sample of the full join (same key, same hash)
    full = o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
    keyed_sample = full.filter(F.col("ho") % AQP_DENOM == 0).agg(
        F.count(F.lit(1)).alias("n_b"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("s_b"),
    )
    exact = full.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("exact_cents"),
    )
    return (
        sampled_join.crossJoin(F.broadcast(keyed_sample))
        .crossJoin(F.broadcast(exact))  # three 1-row relations, broadcast
        .select(
            "n_a",
            (F.col("s_a") * AQP_DENOM).alias("est_cents"),
            "exact_cents",
            F.expr(
                f"abs(s_a * {AQP_DENOM} - exact_cents) * 1000000"
                " div nullif(exact_cents, 0)"
            ).alias("err_ppm"),
            ((F.col("n_a") == F.col("n_b")) & (F.col("s_a") == F.col("s_b")))
            .cast("int")
            .alias("universe_identity_ok"),
        )
    )


def _universe_join_oracle() -> str:
    return f"""
WITH o AS (
  SELECT o_orderkey, {_okey_hash_sql("o_orderkey")} AS ho
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
), l AS (
  SELECT l_orderkey, {_okey_hash_sql("l_orderkey")} AS hl,
         {_REV_CENTS_SQL} AS cents
  FROM lineitem
), a AS (
  SELECT count(*) AS n_a,
         CAST(coalesce(sum(cents), 0) AS BIGINT) AS s_a
  FROM o JOIN l ON o_orderkey = l_orderkey
  WHERE ho % {AQP_DENOM} = 0 AND hl % {AQP_DENOM} = 0
), b AS (
  SELECT count(*) AS n_b,
         CAST(coalesce(sum(cents), 0) AS BIGINT) AS s_b
  FROM o JOIN l ON o_orderkey = l_orderkey
  WHERE ho % {AQP_DENOM} = 0
), ex AS (
  SELECT count(*) AS n_exact,
         CAST(coalesce(sum(cents), 0) AS BIGINT) AS exact_cents
  FROM o JOIN l ON o_orderkey = l_orderkey
)
SELECT n_a, s_a * {AQP_DENOM} AS est_cents, exact_cents,
       abs(s_a * {AQP_DENOM} - exact_cents) * 1000000
         // nullif(exact_cents, 0) AS err_ppm,
       CAST(n_a = n_b AND s_a = s_b AS INT) AS universe_identity_ok
FROM a CROSS JOIN b CROSS JOIN ex
"""


AQP_JACK_G = 8  # disjoint subsample groups inside the 1/64 sample
JACK_UNIT = 10_000_000  # estimate units for the spread: 1e7 cents ($100k)


def aqp_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the analytic error bar tell the truth? The delete-one-group
    JACKKNIFE re-derives the standard error EMPIRICALLY: the 1/64
    sample splits into 8 disjoint subsamples on the hash's next bits,
    each delete-one estimate rescales the remaining 7/8, and the
    jackknife SE comes from their spread — a model-free check that
    needs no variance formula. The audit flag asserts the two SEs
    agree within 3× either way; a broken variance formula (or a
    non-uniform hash) trips it. (The 3× here is a RATIO-consistency
    band between two SE estimators — deliberately not the 5σ additive
    tolerance convention, which applies to |est−exact| flags; with
    g=8 groups the jackknife SE itself has ~25% relative noise, and a
    3× band is ~4 of those, verified stable at all three SFs.)

    Determinism: group sums are exact integer cents; the spread uses
    the identity Σ(x−x̄)² = (g·Σx² − (Σx)²)/g with x in $100k units
    (JACK_UNIT) so g·Σx² stays inside int64 to ~10³× this SF (x grows
    linearly with corpus revenue; overflow at x ≈ 3.8e8 ≈ sf100-tier
    totals — switch units before that), and the single sqrt of that
    exact integer is IEEE-identical in both engines. The unit
    quantization costs ≲0.3% of the SE at this SF — far inside the 3×
    audit band. One pruned scan, one 8-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        _row_hash_expr().alias("h"), _rev_cents_expr().alias("cents")
    ).filter(F.col("h") % AQP_DENOM == 0)
    # ONE sample pass: per-subsample sum plus the pooled second moment
    # (dollars²) the analytic SE needs.
    groups = base.groupBy(
        ((F.col("h") / AQP_DENOM).cast("long") % AQP_JACK_G).alias("g")
    ).agg(
        F.sum("cents").alias("s_g"),
        F.sum(F.expr("(cents div 100) * (cents div 100)")).alias("ssq_g"),
    )
    tot = groups.agg(
        F.sum("s_g").alias("s_all"), F.sum("ssq_g").alias("ssq")
    )
    # Delete-one estimates as a projection over the 8-row relation
    # (window-free: totals ride a broadcast 1-row crossJoin).
    ests = groups.crossJoin(F.broadcast(tot)).select(
        F.expr(
            f"((s_all - s_g) * {AQP_DENOM} * {AQP_JACK_G}"
            f" div {AQP_JACK_G - 1}) div {JACK_UNIT}"
        ).alias("x_kd")
    )
    stats = (
        ests.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("x_kd").alias("sx"),
            F.sum(F.col("x_kd") * F.col("x_kd")).alias("sxx"),
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("ci", _ci_cents(F.col("ssq"), AQP_DENOM))
    )
    # jackknife: V = (g−1)/g · Σ(x−x̄)²; with D = g·Σx²−(Σx)² exact,
    # se = sqrt((g−1)·D)/g, back to cents via ×10⁵.
    d = F.col("n_groups") * F.col("sxx") - F.col("sx") * F.col("sx")
    se_jack = F.floor(
        F.sqrt((d * (AQP_JACK_G - 1)).cast("double"))
        / F.lit(float(AQP_JACK_G))
        * F.lit(float(JACK_UNIT))
    ).cast("long")
    se_ht = F.expr(f"ci div {AQP_Z}")  # same floor-div as the oracle
    return stats.select(
        "n_groups",
        (F.col("s_all") * AQP_DENOM).alias("est_cents"),
        se_jack.alias("se_jack_cents"),
        se_ht.alias("se_ht_cents"),
        ((se_jack * 3 >= se_ht) & (se_jack <= se_ht * 3))
        .cast("int")
        .alias("se_consistent"),
    )


def _jackknife_oracle() -> str:
    se_ht = f"{_ci_cents_sql('ssq', AQP_DENOM)} // {AQP_Z}"
    return f"""
WITH base AS (
  SELECT {_row_hash_sql()} AS h, {_REV_CENTS_SQL} AS cents
  FROM lineitem
), samp AS (
  SELECT h, cents FROM base WHERE h % {AQP_DENOM} = 0
), grp AS (
  SELECT (h // {AQP_DENOM}) % {AQP_JACK_G} AS g,
         CAST(sum(cents) AS BIGINT) AS s_g
  FROM samp GROUP BY 1
), tot AS (
  SELECT CAST(sum(s_g) AS BIGINT) AS s_all FROM grp
), ests AS (
  SELECT (((t.s_all - g.s_g) * {AQP_DENOM} * {AQP_JACK_G}
           // {AQP_JACK_G - 1}) // {JACK_UNIT}) AS x_kd
  FROM grp g CROSS JOIN tot t
), st AS (
  SELECT count(*) AS n_groups,
         CAST(sum(x_kd) AS BIGINT) AS sx,
         CAST(sum(x_kd * x_kd) AS BIGINT) AS sxx
  FROM ests
), ht AS (
  SELECT CAST(sum((cents // 100) * (cents // 100)) AS BIGINT) AS ssq
  FROM samp
), calc AS (
  SELECT n_groups,
         (SELECT s_all FROM tot) * {AQP_DENOM} AS est_cents,
         CAST(floor(sqrt(CAST((n_groups * sxx - sx * sx)
                              * {AQP_JACK_G - 1} AS DOUBLE))
                    / {float(AQP_JACK_G)} * {float(JACK_UNIT)}) AS BIGINT)
           AS se_jack_cents,
         CAST({se_ht} AS BIGINT) AS se_ht_cents
  FROM st CROSS JOIN ht
)
SELECT n_groups, est_cents, se_jack_cents, se_ht_cents,
       CAST(se_jack_cents * 3 >= se_ht_cents
            AND se_jack_cents <= se_ht_cents * 3 AS INT) AS se_consistent
FROM calc
"""


AQP_BOOT_B = 16  # bootstrap replicates
# Poisson(1) CDF thresholds in ppm — P(X <= k) for k = 0..7, computed
# OFFLINE in Python (floor(exp(-1)·Σ 1/i! · 1e6)) and baked as integer
# literals so no transcendental evaluates in either engine (the
# retrieval_ranking_metrics log2-discount precedent). A uniform ppm
# draw mapped through this CASE ladder is a Poisson(1) weight capped
# at 8 (P(X > 7) ≈ 1e-5 — the cap biases the weight mean by < 1e-4,
# orders of magnitude inside the 3x SE-consistency band).
_POIS1_CDF_PPM = (367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989)


def _boot_weight_sql(u: str) -> str:
    """Poisson(1) bootstrap weight from a uniform ppm draw — shared
    SQL text, dialect-neutral (pure integer comparisons)."""
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS1_CDF_PPM)
    )
    return f"(CASE {cases} ELSE {len(_POIS1_CDF_PPM)} END)"


def aqp_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The POISSONIZED BOOTSTRAP error bar (Efron's bootstrap in its
    streaming/online form: each row enters replicate b with an
    independent Poisson(1) multiplicity, so no global resample pass is
    needed) — the second model-free check of the analytic HT standard
    error next to ``aqp_jackknife``'s delete-one-group spread, and the
    one that generalizes to arbitrary non-linear estimators at 100 TB
    (quantiles, ratios) where neither a variance formula nor clean
    subsample groups exist.

    AQP_BOOT_B replicates over the 1/64 hash sample: replicate b's
    weight for a row is the Poisson(1) quantile of a deterministic
    per-(row, b) md5 ppm draw (thresholds are offline-computed integer
    literals — no transcendentals in-engine), each replicate estimate
    is AQP_DENOM · Σ w·cents (exact integer cents), and the bootstrap
    SE comes from the replicates' spread via the same exact-integer
    identity (B·Σx² − (Σx)²) and $100k units as the jackknife. The
    audit flag asserts bootstrap and analytic SEs agree within 3×
    either way — a RATIO-consistency band (the aqp_jackknife
    precedent, NOT the 5σ additive convention): with B = 16 the
    bootstrap SE itself carries ~18% relative noise, and analytically
    the Poisson bootstrap targets 64²·Σy² vs HT's 64·63·Σy², a 1.008
    ratio — verified stable at all three SFs.

    Scale: one pruned scan of the sample, a B-way generated explode
    (the shuffle carries (b, w·cents) partial sums — map-side combine
    collapses each task to ≤ B rows), a B-row aggregate, and 1-row
    broadcast glue. At 100 TB the same plan holds: replicate weights
    are computed inline from the row key, nothing is materialized or
    resampled."""
    li = load_table(spark, sf_dir, "lineitem")
    # round-14 audit: `base` feeds the replicate explode AND the
    # analytic-HT aggregate (two full md5 row-hash scans in the
    # pre-execution plan), but an eager checkpoint of the 1/64 sample
    # was TRIED and REVERTED — alternating A/B measured it neutral
    # (1.03 s lazy vs 1.05 s checkpointed): the duplicate scan
    # parallelizes while the checkpoint serializes a blocking job.
    base = li.select(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("key"),
        _row_hash_expr().alias("h"),
        _rev_cents_expr().alias("cents"),
    ).filter(F.col("h") % AQP_DENOM == 0)
    u = (
        f"CAST(conv(substring(md5(concat(key, '|', CAST(b AS STRING))), 1,"
        f" {AQP_HEX}), 16, 10) AS BIGINT) % 1000000"
    )
    # the draw is projected ONCE as a column and the CASE ladder
    # compares the column — without this, each of the 8 WHEN branches
    # re-inlines the md5/conv expression and an engine without CSE
    # hashes every row up to 8 times (ADVICE r13)
    reps = (
        base.select(
            "key",
            "cents",
            F.explode(F.expr(f"sequence(0, {AQP_BOOT_B - 1})")).alias("b"),
        )
        .withColumn("u", F.expr(u))
        .select("b", (F.expr(_boot_weight_sql("u")) * F.col("cents")).alias("wc"))
    )
    per_rep = reps.groupBy("b").agg(
        F.expr(f"(sum(wc) * {AQP_DENOM}) div {JACK_UNIT}").alias("x_kd")
    )
    # empty-sample coalesces on every sum (the ADVICE r11 AQP class):
    # a zero-row table must yield the same all-zero row as the oracle
    stats = per_rep.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.coalesce(F.sum("x_kd"), F.lit(0)).alias("sx"),
        F.coalesce(F.sum(F.col("x_kd") * F.col("x_kd")), F.lit(0)).alias("sxx"),
    )
    ht = base.agg(
        F.coalesce(F.sum("cents"), F.lit(0)).alias("s_all"),
        F.coalesce(
            F.sum(F.expr("(cents div 100) * (cents div 100)")), F.lit(0)
        ).alias("ssq"),
    )
    # bootstrap: V = (B·Σx² − (Σx)²) / (B·(B−1)); se back to cents
    d = (
        F.col("n_replicates") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    se_boot = F.floor(
        F.sqrt(d / F.lit(float(AQP_BOOT_B * (AQP_BOOT_B - 1))))
        * F.lit(float(JACK_UNIT))
    ).cast("long")
    se_ht = F.expr(f"ci div {AQP_Z}")
    return (
        stats.crossJoin(F.broadcast(ht))
        .withColumn("ci", _ci_cents(F.col("ssq"), AQP_DENOM))
        .select(
            "n_replicates",
            (F.col("s_all") * AQP_DENOM).alias("est_cents"),
            se_boot.alias("se_boot_cents"),
            se_ht.alias("se_ht_cents"),
            ((se_boot * 3 >= se_ht) & (se_boot <= se_ht * 3))
            .cast("int")
            .alias("se_consistent"),
        )
    )


def _bootstrap_oracle() -> str:
    u = (
        "CAST(('0x' || substr(md5(key || '|' || CAST(b AS VARCHAR)), 1,"
        f" {AQP_HEX})) AS BIGINT) % 1000000"
    )
    se_ht = f"{_ci_cents_sql('ssq', AQP_DENOM)} // {AQP_Z}"
    return f"""
WITH base AS (
  SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
           AS key,
         {_row_hash_sql()} AS h, {_REV_CENTS_SQL} AS cents
  FROM lineitem
), samp AS (
  SELECT key, cents FROM base WHERE h % {AQP_DENOM} = 0
), draws AS (
  -- draw projected once; the CASE ladder compares the column (ADVICE r13)
  SELECT b, cents, {u} AS u
  FROM samp CROSS JOIN range(0, {AQP_BOOT_B}) t(b)
), reps AS (
  SELECT b, {_boot_weight_sql("u")} * cents AS wc FROM draws
), per_rep AS (
  SELECT b, (CAST(sum(wc) AS BIGINT) * {AQP_DENOM}) // {JACK_UNIT} AS x_kd
  FROM reps GROUP BY b
), st AS (
  SELECT count(*) AS n_replicates,
         CAST(coalesce(sum(x_kd), 0) AS BIGINT) AS sx,
         CAST(coalesce(sum(x_kd * x_kd), 0) AS BIGINT) AS sxx
  FROM per_rep
), ht AS (
  SELECT CAST(coalesce(sum(cents), 0) AS BIGINT) AS s_all,
         CAST(coalesce(sum((cents // 100) * (cents // 100)), 0) AS BIGINT)
           AS ssq
  FROM samp
)
SELECT n_replicates,
       s_all * {AQP_DENOM} AS est_cents,
       CAST(floor(sqrt(CAST(n_replicates * sxx - sx * sx AS DOUBLE)
                       / {float(AQP_BOOT_B * (AQP_BOOT_B - 1))})
                  * {float(JACK_UNIT)}) AS BIGINT) AS se_boot_cents,
       CAST({se_ht} AS BIGINT) AS se_ht_cents,
       CAST(CAST(floor(sqrt(CAST(n_replicates * sxx - sx * sx AS DOUBLE)
                            / {float(AQP_BOOT_B * (AQP_BOOT_B - 1))})
                       * {float(JACK_UNIT)}) AS BIGINT) * 3
              >= CAST({se_ht} AS BIGINT)
            AND CAST(floor(sqrt(CAST(n_replicates * sxx - sx * sx AS DOUBLE)
                                / {float(AQP_BOOT_B * (AQP_BOOT_B - 1))})
                          * {float(JACK_UNIT)}) AS BIGINT)
              <= CAST({se_ht} AS BIGINT) * 3 AS INT) AS se_consistent
FROM st CROSS JOIN ht
"""


def aqp_bootstrap_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poissonized bootstrap of a NON-LINEAR estimator — the case the
    ``aqp_bootstrap`` docstring promises ("generalizes to quantiles,
    ratios where neither a variance formula nor clean subsample groups
    exist", VERDICT r13 task #3): average revenue per ORDER, a ratio of
    two correlated sums R̂ = Σcents / #orders where numerator and
    denominator co-vary under resampling, estimated from a 1/64
    deterministic hash sample taken at the ORDER key (cluster sampling
    — every lineitem of an order enters or leaves together, which is
    the statistically correct unit for a per-order ratio AND lets the
    membership filter run BEFORE the per-order rollup, so only 1/64 of
    rows ride the groupBy shuffle).

    Each replicate b reweights every sampled ORDER by a Poisson(1)
    draw (same offline ppm CDF literals as ``aqp_bootstrap``, draw
    projected once) and re-forms the ratio x_b = Σw·cents div Σw in
    exact integer cents-per-order; the bootstrap SE is the replicates'
    spread via the exact-integer identity. Next to it, the
    delta-method (Taylor linearization) SE from the same sample:
    Var(R̂) ≈ 63·Σ(y_i−R̂)²/(64·B²) under 1/64 Poisson inclusion,
    computed via the exact-integer identity B·Σ(y−R̂)² = B·Σy² − (Σy)²
    on $100-unit values (int64-safe through sf100), one double divide
    + sqrt in pinned order. Flags: the two SEs agree within 3× either
    way (the ``aqp_bootstrap`` ratio-band precedent — measured
    se_boot/se_delta 1.02 / 0.95 / 1.41 at sf0.001/0.01/0.1), and the
    sample ratio sits within 5·se_delta of the exact population ratio
    (house 5σ; measured |z| 0.39 / 0.05 / 0.53 at the same SFs — the
    deterministic sample makes the flag a fixture property, the
    aqp_sample_estimate precedent).

    Scale: membership prunes 63/64 of lineitem before the only
    data-sized shuffle (the per-order rollup); replicate weights are
    computed inline from the order key (nothing resampled or
    materialized); the exact side is one pruned scan + a distinct-key
    count, present here as the audit column."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        F.col("l_orderkey").alias("okey"),
        _okey_hash_expr("l_orderkey").alias("h"),
        _rev_cents_expr().alias("cents"),
    )
    pop = rows.agg(
        F.coalesce(F.sum("cents"), F.lit(0)).alias("a_pop"),
        F.count_distinct("okey").alias("b_pop"),
    )
    # round-14 audit: the per-order rollup feeds both the plug-in/delta
    # moments and the replicate explode, but the duplicate sits ABOVE
    # the okey exchange, which AQE exchange reuse dedupes in the
    # executed plan; an eager checkpoint was TRIED and REVERTED
    # (neutral-to-slower in the alternating A/B — the aqp_bootstrap /
    # aqp_stratified_allocation measurements, same shape).
    samp = (
        rows.filter(F.col("h") % AQP_DENOM == 0)
        .groupBy("okey")
        .agg(F.sum("cents").alias("cents"))
    )
    # plug-in sums + the $100-unit moments for the delta-method SE
    pl = samp.agg(
        F.coalesce(F.sum("cents"), F.lit(0)).alias("a_s"),
        F.count(F.lit(1)).alias("b_s"),
        F.coalesce(F.sum(F.expr("cents div 10000")), F.lit(0)).alias("a_u"),
        F.coalesce(
            F.sum(F.expr("(cents div 10000) * (cents div 10000)")), F.lit(0)
        ).alias("syy_u"),
    )
    u = (
        f"CAST(conv(substring(md5(concat(CAST(okey AS STRING), '|', "
        f"CAST(b AS STRING))), 1, {AQP_HEX}), 16, 10) AS BIGINT) % 1000000"
    )
    reps = (
        samp.select(
            "okey",
            "cents",
            F.explode(F.expr(f"sequence(0, {AQP_BOOT_B - 1})")).alias("b"),
        )
        .withColumn("u", F.expr(u))
        .select("b", F.expr(_boot_weight_sql("u")).alias("w"), "cents")
    )
    per_rep = (
        reps.groupBy("b")
        .agg(
            F.coalesce(F.sum(F.col("w") * F.col("cents")), F.lit(0)).alias("wa"),
            F.coalesce(F.sum("w"), F.lit(0)).alias("wb"),
        )
        .select(
            F.expr(
                "CASE WHEN wb = 0 THEN CAST(0 AS BIGINT) ELSE wa div wb END"
            ).alias("x")
        )
    )
    stats = per_rep.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.coalesce(F.sum("x"), F.lit(0)).alias("sx"),
        F.coalesce(F.sum(F.col("x") * F.col("x")), F.lit(0)).alias("sxx"),
    )
    d = (
        F.col("n_replicates") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    se_boot = F.floor(
        F.sqrt(d / F.lit(float(AQP_BOOT_B * (AQP_BOOT_B - 1))))
    ).cast("long")
    se_delta = F.when(F.col("b_s") == 0, F.lit(0).cast("long")).otherwise(
        F.floor(
            F.sqrt(
                (
                    F.lit(63)
                    * (F.col("b_s") * F.col("syy_u") - F.col("a_u") * F.col("a_u"))
                ).cast("double")
                / (
                    F.lit(64) * F.col("b_s") * F.col("b_s") * F.col("b_s")
                ).cast("double")
            )
            * F.lit(10000.0)
        ).cast("long")
    )
    est = F.expr("CASE WHEN b_s = 0 THEN CAST(0 AS BIGINT) ELSE a_s div b_s END")
    exact = F.expr(
        "CASE WHEN b_pop = 0 THEN CAST(0 AS BIGINT) ELSE a_pop div b_pop END"
    )
    return (
        stats.crossJoin(F.broadcast(pl))
        .crossJoin(F.broadcast(pop))
        .withColumn("est_cents_per_order", est)
        .withColumn("exact_cents_per_order", exact)
        .withColumn("se_boot_cents", se_boot)
        .withColumn("se_delta_cents", se_delta)
        .select(
            F.col("b_s").alias("n_orders_sample"),
            "n_replicates",
            "est_cents_per_order",
            "exact_cents_per_order",
            "se_boot_cents",
            "se_delta_cents",
            (
                (F.col("se_boot_cents") * 3 >= F.col("se_delta_cents"))
                & (F.col("se_boot_cents") <= F.col("se_delta_cents") * 3)
            )
            .cast("int")
            .alias("se_consistent"),
            (
                F.abs(F.col("est_cents_per_order") - F.col("exact_cents_per_order"))
                <= F.lit(AQP_Z) * F.col("se_delta_cents")
            )
            .cast("int")
            .alias("est_within_band"),
        )
    )


def _bootstrap_ratio_oracle() -> str:
    u = (
        "CAST(('0x' || substr(md5(CAST(okey AS VARCHAR) || '|' || "
        f"CAST(b AS VARCHAR)), 1, {AQP_HEX})) AS BIGINT) % 1000000"
    )
    return f"""
WITH rws AS (
  SELECT l_orderkey AS okey, {_okey_hash_sql("l_orderkey")} AS h,
         {_REV_CENTS_SQL} AS cents
  FROM lineitem
), pop AS (
  SELECT CAST(coalesce(sum(cents), 0) AS BIGINT) AS a_pop,
         CAST(count(DISTINCT okey) AS BIGINT) AS b_pop
  FROM rws
), samp AS (
  SELECT okey, CAST(sum(cents) AS BIGINT) AS cents
  FROM rws WHERE h % {AQP_DENOM} = 0 GROUP BY okey
), pl AS (
  SELECT CAST(coalesce(sum(cents), 0) AS BIGINT) AS a_s,
         CAST(count(*) AS BIGINT) AS b_s,
         CAST(coalesce(sum(cents // 10000), 0) AS BIGINT) AS a_u,
         CAST(coalesce(sum((cents // 10000) * (cents // 10000)), 0) AS BIGINT)
           AS syy_u
  FROM samp
), draws AS (
  SELECT b, cents, {u} AS u
  FROM samp CROSS JOIN range(0, {AQP_BOOT_B}) t(b)
), reps AS (
  SELECT b, {_boot_weight_sql("u")} AS w, cents FROM draws
), per_rep AS (
  SELECT CASE WHEN CAST(coalesce(sum(w), 0) AS BIGINT) = 0
              THEN CAST(0 AS BIGINT)
              ELSE CAST(sum(w * cents) AS BIGINT)
                   // CAST(sum(w) AS BIGINT) END AS x
  FROM reps GROUP BY b
), st AS (
  SELECT count(*) AS n_replicates,
         CAST(coalesce(sum(x), 0) AS BIGINT) AS sx,
         CAST(coalesce(sum(x * x), 0) AS BIGINT) AS sxx
  FROM per_rep
), calc AS (
  SELECT b_s, n_replicates,
         CASE WHEN b_s = 0 THEN CAST(0 AS BIGINT)
              ELSE a_s // b_s END AS est_cents_per_order,
         CASE WHEN b_pop = 0 THEN CAST(0 AS BIGINT)
              ELSE a_pop // b_pop END AS exact_cents_per_order,
         CAST(floor(sqrt(CAST(n_replicates * sxx - sx * sx AS DOUBLE)
                         / {float(AQP_BOOT_B * (AQP_BOOT_B - 1))}))
              AS BIGINT) AS se_boot_cents,
         CASE WHEN b_s = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(floor(sqrt(
                     CAST(63 * (b_s * syy_u - a_u * a_u) AS DOUBLE)
                     / CAST(64 * b_s * b_s * b_s AS DOUBLE)) * 10000.0)
                   AS BIGINT) END AS se_delta_cents
  FROM st CROSS JOIN pl CROSS JOIN pop
)
SELECT b_s AS n_orders_sample, n_replicates,
       est_cents_per_order, exact_cents_per_order,
       se_boot_cents, se_delta_cents,
       CAST(se_boot_cents * 3 >= se_delta_cents
            AND se_boot_cents <= se_delta_cents * 3 AS INT) AS se_consistent,
       CAST(abs(est_cents_per_order - exact_cents_per_order)
              <= {AQP_Z} * se_delta_cents AS INT) AS est_within_band
FROM calc
"""


QUERY_DEFS = [
    QueryDef("aqp_sample_estimate", aqp_sample_estimate, _sample_estimate_oracle()),
    QueryDef("aqp_bootstrap", aqp_bootstrap, _bootstrap_oracle()),
    QueryDef("aqp_bootstrap_ratio", aqp_bootstrap_ratio, _bootstrap_ratio_oracle()),
    QueryDef("aqp_group_estimate", aqp_group_estimate, _group_estimate_oracle()),
    QueryDef("aqp_universe_join", aqp_universe_join, _universe_join_oracle()),
    QueryDef("aqp_sample_staircase", aqp_sample_staircase, _staircase_oracle()),
    QueryDef(
        "aqp_stratified_allocation",
        aqp_stratified_allocation,
        _stratified_oracle(),
    ),
    QueryDef("aqp_jackknife", aqp_jackknife, _jackknife_oracle()),
]
