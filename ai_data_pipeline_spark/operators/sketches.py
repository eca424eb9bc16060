"""Mergeable-sketch operators materialized as relations: count-min and
Bloom. Unlike the HLL/approx-percentile tiers (engine-internal sketch
encodings, declared rows-only), these are built from deterministic
integer hashing in plain SQL expressions — so the sketch CONTENTS are
exactly oracle-checkable, not just smoke-tested.

Scale design: both sketches are groupBy relations — built with one
keyed shuffle carrying (hash-cell, count) partials, mergeable across
partitions/days by construction (sum cells / OR bits). That is the
100 TB property that matters: a day's sketch is a small relation, a
year's sketch is the union-groupBy of 365 of them, and neither ever
rescans raw data.

- count-min: d=4 rows × w=256 buckets of md5-derived counters; the
  estimate for a key is min over rows of its bucket counter —
  guaranteed ≥ truth, within εN with probability 1−δ. The query
  reports exact vs estimated counts side by side for the heavy-hitter
  candidates, making the overestimate visible and checkable.
- Bloom: k=4 bit positions per key into m=4096 bits, materialized as
  the distinct set-bit relation. The probe side is checked via a
  bits-per-key countDistinct == k join; the query reports the exact
  semi-join verdict next to the Bloom verdict, so false positives are
  rows where bloom_hit ∧ ¬exact_hit (never the reverse — Bloom has no
  false negatives, which the oracle equality proves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

CM_DEPTH = 4
CM_WIDTH = 256
BLOOM_K = 4
BLOOM_M = 4096
HH_MIN_EVENTS = 30  # heavy-hitter candidate cut for the CM demo


def _hash_bucket_expr(col: str, row: int, width: int) -> F.Column:
    """Deterministic bucket: low 8 hex digits of md5(row|key) mod width
    — engine-portable (conv/md5 in Spark, hex parse in DuckDB)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}|"), F.col(col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )


def _hash_bucket_sql(col: str, row: int, width: int) -> str:
    return (
        f"(CAST(('0x' || substr(md5('{row}|' || CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT) % {width})"
    )


def sketch_countmin_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of per-user event counts, probed for the
    heavy-hitter candidates: the sketch is d unioned groupBys (one
    shuffle each over (row, bucket) cells — 4×256 cells total
    regardless of user count); estimates join the tiny cell relation
    back to the candidates."""
    e = load_table(spark, sf_dir, "events")
    cells = None
    for j in range(CM_DEPTH):
        part = e.groupBy(
            F.lit(j).alias("cm_row"),
            _hash_bucket_expr("user_id", j, CM_WIDTH).alias("bucket"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
        cells = part if cells is None else cells.unionByName(part)
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    cand = exact.filter(F.col("exact_cnt") >= HH_MIN_EVENTS)
    probes = cand.select(
        "user_id",
        "exact_cnt",
        *[
            _hash_bucket_expr("user_id", j, CM_WIDTH).alias(f"b{j}")
            for j in range(CM_DEPTH)
        ],
    )
    est = probes
    for j in range(CM_DEPTH):
        cj = cells.filter(F.col("cm_row") == j).select(
            F.col("bucket").alias(f"b{j}"), F.col("cnt").alias(f"c{j}")
        )
        est = est.join(F.broadcast(cj), f"b{j}")
    return est.select(
        "user_id",
        "exact_cnt",
        F.least(*[F.col(f"c{j}") for j in range(CM_DEPTH)]).alias("cm_estimate"),
    )


def _countmin_oracle() -> str:
    cell_parts = " UNION ALL ".join(
        f"SELECT {j} AS cm_row, {_hash_bucket_sql('user_id', j, CM_WIDTH)} AS bucket,"
        f" count(*) AS cnt FROM events GROUP BY 2"
        for j in range(CM_DEPTH)
    )
    probe_cols = ", ".join(
        f"{_hash_bucket_sql('user_id', j, CM_WIDTH)} AS b{j}" for j in range(CM_DEPTH)
    )
    joins = " ".join(
        f"JOIN (SELECT bucket AS b{j}, cnt AS c{j} FROM cells WHERE cm_row = {j}) t{j} USING (b{j})"
        for j in range(CM_DEPTH)
    )
    least = ", ".join(f"c{j}" for j in range(CM_DEPTH))
    return f"""
WITH cells AS (
  {cell_parts}
), cand AS (
  SELECT user_id, count(*) AS exact_cnt, {probe_cols}
  FROM events GROUP BY user_id HAVING count(*) >= {HH_MIN_EVENTS}
)
SELECT user_id, exact_cnt, least({least}) AS cm_estimate
FROM cand {joins}
"""


def sketch_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join: build the bit relation from suppliers
    with negative balance, probe every distinct lineitem supplier key,
    and report the Bloom verdict next to the exact semi-join verdict.
    At 100 TB the bit relation (≤ m rows) broadcasts to prefilter the
    fact scan — the hand-rolled version of Spark's runtime row-group
    filters, with its false-positive rate measured, not assumed."""
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    keys = load_table(spark, sf_dir, "lineitem").select("l_suppkey").distinct()
    bits = None
    for j in range(BLOOM_K):
        part = s.select(_hash_bucket_expr("s_suppkey", j, BLOOM_M).alias("bit"))
        bits = part if bits is None else bits.unionByName(part)
    bits = bits.distinct()
    probe_bits = keys.select(
        "l_suppkey",
        F.explode(
            F.array(
                *[_hash_bucket_expr("l_suppkey", j, BLOOM_M) for j in range(BLOOM_K)]
            )
        ).alias("bit"),
    )
    hits = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == BLOOM_K)
        .select("l_suppkey", F.lit(True).alias("bloom_hit"))
    )
    exact = s.select(F.col("s_suppkey").alias("l_suppkey"), F.lit(True).alias("exact_hit"))
    # hits/exact derive from supplier, which scales with SF — no hard
    # broadcast hints (the bounded bit relation above keeps its hint)
    return (
        keys.join(hits, "l_suppkey", "left_outer")
        .join(exact, "l_suppkey", "left_outer")
        .select(
            "l_suppkey",
            F.coalesce("bloom_hit", F.lit(False)).alias("bloom_hit"),
            F.coalesce("exact_hit", F.lit(False)).alias("exact_hit"),
        )
    )


def _bloom_oracle() -> str:
    bit_parts = " UNION ".join(
        f"SELECT DISTINCT {_hash_bucket_sql('s_suppkey', j, BLOOM_M)} AS bit"
        f" FROM supplier WHERE s_acctbal < 0"
        for j in range(BLOOM_K)
    )
    probe_bits = ", ".join(
        f"{_hash_bucket_sql('l_suppkey', j, BLOOM_M)}" for j in range(BLOOM_K)
    )
    return f"""
WITH bits AS (
  {bit_parts}
), keys AS (
  SELECT DISTINCT l_suppkey FROM lineitem
), probes AS (
  SELECT l_suppkey, unnest([{probe_bits}]) AS bit FROM keys
), hits AS (
  SELECT l_suppkey FROM probes JOIN bits USING (bit)
  GROUP BY l_suppkey HAVING count(*) = {BLOOM_K}
)
SELECT k.l_suppkey,
       k.l_suppkey IN (SELECT l_suppkey FROM hits) AS bloom_hit,
       k.l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) AS exact_hit
FROM keys k
"""


QH_BUCKET_W = 500.0  # histogram bucket width over l_extendedprice
QH_PCTS = (50, 90, 99)


def sketch_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch — the mergeable percentile primitive
    (the role t-digest/KLL fill in production sketch libraries, built
    here from deterministic integer cells so the contents are
    oracle-exact): prices bucket into fixed-width cells, one keyed
    groupBy builds the cell relation, and each requested percentile
    resolves to the first bucket whose cumulative count reaches
    ceil(p·N/100). The estimate's guarantee is a bucket-width bound:
    est_lo ≤ true p-th value < est_lo + W.

    Scale: the sketch is a groupBy relation like the count-min/Bloom
    sketches above — one shuffle carrying (bucket, count) partials,
    mergeable across partitions/days by summing cells, never rescanning
    raw data. The cumulative window is ordered but provably bounded:
    its input has at most value_range/W rows (a few hundred) regardless
    of corpus size, and the quantile probe joins the 3-row target
    relation to that bounded cell relation."""
    l = load_table(spark, sf_dir, "lineitem")
    hist = (
        l.select(
            F.floor(F.col("l_extendedprice") / QH_BUCKET_W).cast("long").alias("bkt")
        )
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum))
    total = hist.agg(F.sum("cnt").alias("n"))
    qs = spark.range(len(QH_PCTS)).select(
        F.element_at(
            F.array(*[F.lit(p) for p in QH_PCTS]), (F.col("id") + 1).cast("int")
        ).alias("q_pct")
    )
    targets = qs.crossJoin(F.broadcast(total)).select(
        "q_pct", "n", F.expr("(q_pct * n + 99) div 100").alias("target_rank")
    )
    hit = targets.join(F.broadcast(cum), F.col("cum") >= F.col("target_rank"))
    return (
        hit.groupBy("q_pct", "n", "target_rank")
        .agg(F.min_by(F.struct("bkt", "cnt", "cum"), "bkt").alias("b"))
        .select(
            "q_pct",
            "target_rank",
            F.col("b.bkt").alias("est_bucket"),
            (F.col("b.bkt") * F.lit(int(QH_BUCKET_W))).alias("est_lo"),
            F.col("b.cnt").alias("bucket_count"),
            F.col("b.cum").alias("cum_count"),
            F.col("n").alias("total_n"),
        )
    )


def _quantile_hist_oracle() -> str:
    pcts = ", ".join(str(p) for p in QH_PCTS)
    return f"""
WITH hist AS (
  SELECT CAST(floor(l_extendedprice / {QH_BUCKET_W}) AS BIGINT) AS bkt,
         count(*) AS cnt
  FROM lineitem GROUP BY 1
), cum AS (
  SELECT bkt, cnt,
         CAST(SUM(cnt) OVER (ORDER BY bkt
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM hist
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist
), targets AS (
  SELECT q_pct, n, (q_pct * n + 99) // 100 AS target_rank
  FROM (SELECT unnest([{pcts}]) AS q_pct) CROSS JOIN tot
), hits AS (
  SELECT t.q_pct, t.n, t.target_rank, min(c.bkt) AS est_bucket
  FROM targets t JOIN cum c ON c.cum >= t.target_rank
  GROUP BY 1, 2, 3
)
SELECT h.q_pct, h.target_rank, h.est_bucket,
       h.est_bucket * {int(QH_BUCKET_W)} AS est_lo,
       c.cnt AS bucket_count, c.cum AS cum_count, h.n AS total_n
FROM hits h JOIN cum c ON c.bkt = h.est_bucket
"""


def q_quantile_exact_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global percentiles the scale-correct way — the two-phase
    histogram refinement that replaces a global sort: phase 1 builds
    the bounded cell relation and locates, per percentile, the bucket
    holding rank ceil(p·N/100) plus the residual rank within it
    (cum_before arithmetic); phase 2 scans ONLY the rows of the target
    buckets (a ~1/n_buckets fraction of the data) and picks the
    residual-rank row under a total order (value asc, orderkey,
    linenumber). The oracle computes the same percentiles by the naive
    definition — row_number over a full global sort — so the green row
    PROVES the decomposition equals the textbook semantics.

    Scale: phase 1 is the mergeable sketch shuffle (cells only); the
    in-bucket rank runs per percentile over one bucket's rows — at
    100 TB you narrow W (more buckets) until a bucket fits an executor,
    or recurse one more histogram level; the full table is never
    globally sorted."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    bkt = F.floor(F.col("l_extendedprice") / QH_BUCKET_W).cast("long").alias("bkt")
    hist = l.select(bkt).groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "cum_before", F.col("cum") - F.col("cnt")
    )
    total = hist.agg(F.sum("cnt").alias("n"))
    qs = spark.range(len(QH_PCTS)).select(
        F.element_at(
            F.array(*[F.lit(p) for p in QH_PCTS]), (F.col("id") + 1).cast("int")
        ).alias("q_pct")
    )
    targets = qs.crossJoin(F.broadcast(total)).select(
        "q_pct", F.expr("(q_pct * n + 99) div 100").alias("target_rank")
    )
    # the bucket holding the target rank + the residual rank within it
    probes = (
        targets.join(F.broadcast(cum), F.col("cum") >= F.col("target_rank"))
        .groupBy("q_pct", "target_rank")
        .agg(F.min_by(F.struct("bkt", "cum_before"), "bkt").alias("b"))
        .select(
            "q_pct",
            "target_rank",
            F.col("b.bkt").alias("bkt"),
            (F.col("target_rank") - F.col("b.cum_before")).alias("rank_in_bucket"),
        )
    )
    in_bucket = l.select("l_extendedprice", "l_orderkey", "l_linenumber", bkt).join(
        F.broadcast(probes), "bkt"
    )
    wq = Window.partitionBy("q_pct").orderBy(
        F.asc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        in_bucket.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == F.col("rank_in_bucket"))
        .select(
            "q_pct",
            "target_rank",
            F.col("l_extendedprice").alias("quantile_value"),
        )
    )


def _quantile_exact_oracle() -> str:
    """Naive definition: value at rank ceil(p*N/100) under the total
    order (value, orderkey, linenumber) — a full global sort the Spark
    side deliberately avoids; equality proves the two-phase refinement."""
    pcts = ", ".join(str(p) for p in QH_PCTS)
    return f"""
WITH ranked AS (
  SELECT l_extendedprice,
         row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS rn
  FROM lineitem
), tot AS (
  SELECT count(*) AS n FROM lineitem
), targets AS (
  SELECT q_pct, (q_pct * n + 99) // 100 AS target_rank
  FROM (SELECT unnest([{pcts}]) AS q_pct) CROSS JOIN tot
)
SELECT t.q_pct, t.target_rank, r.l_extendedprice AS quantile_value
FROM targets t JOIN ranked r ON r.rn = t.target_rank
"""


QT_ACCURACY = 10_000  # percentile_approx accuracy ⇒ rank error ≤ n/accuracy


def rank_audit_cols(accuracy: int):
    """(target_rank, within_guarantee) expressions shared by BOTH
    percentile_approx audits (the global sketch_quantile_tolerance and
    the grouped q_percentiles_approx in analytic.py) so the rank
    convention and tolerance can never drift between the two copies
    (round-10 review finding). Expects columns q_pct, n (NON-NULL row
    count — the sketch's rank space: percentile_approx ignores NULLs,
    so targets computed over a NULL-inclusive count would skew off the
    occupied interval), cnt_lt, cnt_le. The +2 absorbs rank-convention
    off-by-ones between ceil(q·n/100) and the sketch's internal
    convention; all-integer, both engines agree exactly."""
    target = F.expr("(q_pct * n + 99) div 100")
    err = F.expr(f"n div {accuracy}") + F.lit(2)
    ok = (F.col("cnt_lt") + 1 <= target + err) & (
        F.col("cnt_le") >= target - err
    )
    return target, ok


def sketch_quantile_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of Spark's own percentile_approx sketch (Greenwald-Khanna
    style) against its published rank-error guarantee — the first
    driver-checkable artifact for the engine-native sketch tier
    (VERDICT r9 stretch): a sketch estimate isn't bit-comparable across
    engines, but its GUARANTEE is an integer predicate both engines can
    agree on. For each percentile p the sketch returns an observed
    element v̂; the audit counts rank_lo = |{v < v̂}|+1 and
    rank_hi = |{v ≤ v̂}| in one pass and asserts the occupied rank
    interval intersects target ± (n/accuracy + 2) (the +2 absorbs
    rank-convention off-by-ones between ceil(p·n/100) and the sketch's
    internal convention). The oracle asserts the flag is 1 — a sketch
    whose error exceeds its contract hash-reds loudly.

    Scale: the sketch is one mergeable aggregate; the audit is one
    broadcast of the 3-row probe relation against a single scan with
    conditional counts. At 100 TB the audit runs on a sampled shard —
    the guarantee is distribution-free, so any shard bounds the
    machinery's health.

    NULLs are filtered up front on BOTH engines: percentile_approx
    ignores them, so the audit's rank space (n, targets, occupied
    intervals) must be the non-null space too — a NULL-inclusive count
    would skew targets off the interval and falsely fail the flag on
    nullable columns (round-10 review finding)."""
    l = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_extendedprice").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    apx = l.agg(
        F.percentile_approx(
            "v", F.array(*[F.lit(p / 100.0) for p in QH_PCTS]), F.lit(QT_ACCURACY)
        ).alias("avs"),
        F.count(F.lit(1)).alias("n"),
    )
    probes = apx.select(
        "n", F.posexplode("avs").alias("i", "av")
    ).select(
        F.element_at(
            F.array(*[F.lit(p) for p in QH_PCTS]), (F.col("i") + 1).cast("int")
        ).alias("q_pct"),
        "n",
        "av",
    )
    counted = (
        l.crossJoin(F.broadcast(probes))
        .groupBy("q_pct", "n")
        .agg(
            F.sum((F.col("v") < F.col("av")).cast("long")).alias("cnt_lt"),
            F.sum((F.col("v") <= F.col("av")).cast("long")).alias("cnt_le"),
        )
    )
    target, ok = rank_audit_cols(QT_ACCURACY)
    return counted.select(
        "q_pct",
        F.col("n").alias("n_rows"),
        target.alias("target_rank"),
        ok.cast("int").alias("sketch_rank_ok"),
    )


QT_TOLERANCE_ORACLE = f"""
WITH tot AS (
  SELECT count(*) AS n FROM lineitem WHERE l_extendedprice IS NOT NULL
)
SELECT q_pct, n AS n_rows, (q_pct * n + 99) // 100 AS target_rank,
       1 AS sketch_rank_ok
FROM (SELECT unnest([{", ".join(str(p) for p in QH_PCTS)}]) AS q_pct)
CROSS JOIN tot
WHERE n > 0
"""


# --- KMV (k-minimum-values) distinct sketch --------------------------------
#
# The third exactly-oracle-checkable sketch (after count-min and
# Bloom), and the one that closes the SET-OPERATION gap in the distinct
# tier: HLL (the engine-native approx_count_distinct) merges by UNION
# only — it cannot estimate intersections or Jaccard between two huge
# sets. KMV can: keep the K smallest values of a uniform hash of each
# set; the K-th smallest h_K estimates the distinct count as
# (K−1)·SPACE/h_K, and because a KMV sketch of A ∪ B is just the
# bottom-K of the two sketches' union, the fraction of those survivors
# that belong to BOTH sketches estimates Jaccard(A, B) directly
# (Bar-Yossef et al. 2002; the Theta-sketch family's core idea).
# Everything is deterministic md5 bottom-K — bit-identical in DuckDB,
# so the driver hash checks the sketch CONTENTS and the estimates
# exactly, no tolerance flag needed.
#
# Scale: per set, one distinct-hash shuffle then the two-level
# tournament bottom-K (topk_per_key — no single-reducer window); the
# sketches themselves are K-row relations, so every set operation
# downstream is driver-free arithmetic on tiny relations. 12-hex
# (48-bit) hashes keep (K−1)·SPACE inside int64 for the oracle; the
# production variant carries the full 128-bit md5 in DECIMAL(38,0)
# (48-bit birthday collisions start to bite near 2²⁴ distincts).

KMV_K = 256  # σ ≈ 1/√K ≈ 6.2%; (K−1)·SPACE ≈ 7.2e16 stays inside int64
KMV_HEX = 12
KMV_SPACE = 16**KMV_HEX
_KMV_NUM = (KMV_K - 1) * KMV_SPACE  # precomputed: DuckDB literals are INT32


def _kmv_hash_expr(col: str) -> F.Column:
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, KMV_HEX), 16, 10
    ).cast("long")


def _kmv_hash_sql(col: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, {KMV_HEX}))"
        " AS BIGINT)"
    )


def sketch_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KMV distinct-user sketch next to the exact count:
    (event_type, n_exact, kmv_est, err_pct). The estimate is exact
    when the set is smaller than K (the sketch IS the set) and
    (K−1)·SPACE/h_K otherwise — all integer arithmetic, oracle-exact."""
    from ai_data_pipeline_spark.functions import topk_per_key

    e = load_table(spark, sf_dir, "events")
    hashes = e.select(
        "event_type", _kmv_hash_expr("user_id").alias("h")
    ).distinct()
    bottom = topk_per_key(hashes, ["event_type"], [F.asc("h")], KMV_K)
    sk = bottom.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_in"), F.max("h").alias("h_k")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    est = F.when(F.col("n_in") < KMV_K, F.col("n_in")).otherwise(
        F.expr(f"{_KMV_NUM} div h_k")
    )
    return (
        exact.join(sk, "event_type")
        .withColumn("kmv_est", est)
        .select(
            "event_type",
            "n_exact",
            "kmv_est",
            F.expr(
                "abs(kmv_est - n_exact) * 100 div n_exact"
            ).alias("err_pct"),
        )
    )


def _kmv_users_oracle() -> str:
    return f"""
WITH h AS (
  SELECT DISTINCT event_type, {_kmv_hash_sql("user_id")} AS h FROM events
), b AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM h
), sk AS (
  SELECT event_type, count(*) AS n_in, max(h) AS h_k
  FROM b WHERE rk <= {KMV_K} GROUP BY 1
), ex AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1
)
SELECT ex.event_type, n_exact,
       CASE WHEN n_in < {KMV_K} THEN n_in
            ELSE {_KMV_NUM} // h_k END AS kmv_est,
       abs(CASE WHEN n_in < {KMV_K} THEN n_in
                ELSE {_KMV_NUM} // h_k END - n_exact) * 100 // n_exact
         AS err_pct
FROM ex JOIN sk ON ex.event_type = sk.event_type
"""


KMV_PURCHASE_MIN_VALUE = 50.0  # set A: users with a purchase above this


def sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimate — the query HLL cannot answer:
    Jaccard between two user sets (A = users with a purchase of
    value > 50, B = users with any error event), estimated purely
    from the two K-row sketches: survivors of the UNION sketch
    (bottom-K of kmvA ∪ kmvB) that appear in BOTH sketches, over the
    survivor count. Emits the exact Jaccard beside it — both integer
    ppm, both oracle-exact, so the estimate's quality is a checked
    measurement, not a claim. At 100 TB the exact column is the one
    you drop; the sketches merge across shards/days by construction."""
    from ai_data_pipeline_spark.functions import topk_per_key

    e = load_table(spark, sf_dir, "events")
    a = (
        e.filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") > KMV_PURCHASE_MIN_VALUE)
        )
        .select(_kmv_hash_expr("user_id").alias("h"))
        .distinct()
    )
    b = (
        e.filter(F.col("event_type") == "error")
        .select(_kmv_hash_expr("user_id").alias("h"))
        .distinct()
    )

    def bottom_k(df: DataFrame, flag: str) -> DataFrame:
        return (
            topk_per_key(
                df.withColumn("_g", F.lit(0)), ["_g"], [F.asc("h")], KMV_K
            )
            .select("h", F.lit(1).alias(flag))
        )

    ka = bottom_k(a, "in_a")
    kb = bottom_k(b, "in_b")
    merged = ka.join(kb, "h", "full_outer").select(
        "h",
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    union_sk = topk_per_key(
        merged.withColumn("_g", F.lit(0)), ["_g"], [F.asc("h")], KMV_K
    )
    est = union_sk.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    )
    exact = (
        e.filter(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") > KMV_PURCHASE_MIN_VALUE)
            )
            | (F.col("event_type") == "error")
        )
        .groupBy("user_id")
        .agg(
            F.max(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > KMV_PURCHASE_MIN_VALUE)
                ).cast("int")
            ).alias("a"),
            F.max((F.col("event_type") == "error").cast("int")).alias("b"),
        )
        .agg(
            F.sum(F.expr("a * b")).cast("long").alias("n_inter"),
            F.count(F.lit(1)).cast("long").alias("n_union"),
        )
    )
    return (
        est.crossJoin(exact)  # two 1-row relations
        .select(
            "k_used",
            F.expr("n_both * 1000000 div k_used").alias("j_est_ppm"),
            F.expr("n_inter * 1000000 div n_union").alias("j_exact_ppm"),
            "n_inter",
            "n_union",
        )
    )


def _kmv_jaccard_oracle() -> str:
    return f"""
WITH a AS (
  SELECT DISTINCT {_kmv_hash_sql("user_id")} AS h FROM events
  WHERE event_type = 'purchase' AND value > {KMV_PURCHASE_MIN_VALUE}
), b AS (
  SELECT DISTINCT {_kmv_hash_sql("user_id")} AS h FROM events
  WHERE event_type = 'error'
), ka AS (
  SELECT h FROM a ORDER BY h LIMIT {KMV_K}
), kb AS (
  SELECT h FROM b ORDER BY h LIMIT {KMV_K}
), merged AS (
  SELECT coalesce(ka.h, kb.h) AS h,
         CASE WHEN ka.h IS NULL THEN 0 ELSE 1 END AS in_a,
         CASE WHEN kb.h IS NULL THEN 0 ELSE 1 END AS in_b
  FROM ka FULL OUTER JOIN kb ON ka.h = kb.h
), union_sk AS (
  SELECT * FROM merged ORDER BY h LIMIT {KMV_K}
), est AS (
  SELECT count(*) AS k_used,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both
  FROM union_sk
), flags AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase'
                   AND value > {KMV_PURCHASE_MIN_VALUE}
                  THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b
  FROM events
  WHERE (event_type = 'purchase' AND value > {KMV_PURCHASE_MIN_VALUE})
     OR event_type = 'error'
  GROUP BY user_id
), exact AS (
  SELECT CAST(sum(a * b) AS BIGINT) AS n_inter,
         CAST(count(*) AS BIGINT) AS n_union
  FROM flags
)
SELECT k_used,
       n_both * 1000000 // k_used AS j_est_ppm,
       n_inter * 1000000 // n_union AS j_exact_ppm,
       n_inter, n_union
FROM est CROSS JOIN exact
"""


def sketch_kmv_merge_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability PROOF for the KMV tier, as an oracle-checked
    identity rather than a docstring claim: per-day bottom-K sketches
    of the distinct-user stream, merged by taking the bottom-K of
    their union, must equal the direct whole-corpus sketch EXACTLY —
    any global bottom-K member is necessarily in its own day's
    bottom-K, so merge-of-parts loses nothing. This is the property
    that lets a year's distinct estimate come from 365 K-row
    relations instead of a rescan. Emits (n_days, n_exact, kmv_est,
    merged_equals_direct); the oracle asserts the flag by computing
    both sides itself."""
    from ai_data_pipeline_spark.functions import topk_per_key

    e = load_table(spark, sf_dir, "events")
    hashes = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        _kmv_hash_expr("user_id").alias("h"),
    )
    daily = topk_per_key(hashes.distinct(), ["day"], [F.asc("h")], KMV_K)
    merged = topk_per_key(
        daily.select("h").distinct().withColumn("_g", F.lit(0)),
        ["_g"],
        [F.asc("h")],
        KMV_K,
    ).select("h")
    direct = topk_per_key(
        hashes.select("h").distinct().withColumn("_g", F.lit(0)),
        ["_g"],
        [F.asc("h")],
        KMV_K,
    ).select("h")
    sides = merged.withColumn("m", F.lit(1)).join(
        direct.withColumn("d", F.lit(1)), "h", "full_outer"
    )
    cmp = sides.agg(
        (F.sum(F.when(F.col("m").isNull() | F.col("d").isNull(), 1).otherwise(0)) == 0)
        .cast("int")
        .alias("merged_equals_direct"),
        F.count(F.lit(1)).alias("n_in"),
        F.max("h").alias("h_k"),
    )
    totals = e.agg(
        F.countDistinct(F.date_format("ts", "yyyy-MM-dd")).alias("n_days"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    est = F.when(F.col("n_in") < KMV_K, F.col("n_in")).otherwise(
        F.expr(f"{_KMV_NUM} div h_k")
    )
    return (
        totals.crossJoin(cmp)  # two 1-row relations
        .select(
            "n_days", "n_exact", est.alias("kmv_est"), "merged_equals_direct"
        )
    )


def _kmv_merge_oracle() -> str:
    return f"""
WITH h AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
         {_kmv_hash_sql("user_id")} AS h
  FROM events
), daily AS (
  SELECT day, h,
         row_number() OVER (PARTITION BY day ORDER BY h) AS rk
  FROM h
), merged AS (
  SELECT DISTINCT h FROM daily WHERE rk <= {KMV_K} ORDER BY h LIMIT {KMV_K}
), direct AS (
  SELECT DISTINCT h FROM h ORDER BY h LIMIT {KMV_K}
), cmp AS (
  SELECT CASE WHEN count(*) FILTER (WHERE m.h IS NULL OR d.h IS NULL) = 0
              THEN 1 ELSE 0 END AS merged_equals_direct,
         count(*) AS n_in, max(coalesce(m.h, d.h)) AS h_k
  FROM merged m FULL OUTER JOIN direct d ON m.h = d.h
), tot AS (
  SELECT count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
         count(DISTINCT user_id) AS n_exact
  FROM events
)
SELECT n_days, n_exact,
       CASE WHEN n_in < {KMV_K} THEN n_in ELSE {_KMV_NUM} // h_k END
         AS kmv_est,
       merged_equals_direct
FROM tot CROSS JOIN cmp
"""


# --- Misra–Gries / SpaceSaving heavy-hitter summaries -----------------
#
# The frequency sketch the exact tier promises: q_heavy_hitter_users
# (analytic2.py) documents "at 100 TB the first pass becomes a
# space-saving/count-min sketch" — count-min is above; this is the
# space-saving side, as a DETERMINISTIC K-row relation per group.
#
# Construction (order-free canonical form): with exact per-item counts
# c_i inside one summary scope (one event_type, or one day), the
# summary is {(i, c_i − t) : c_i > t} where t is the (K+1)-th largest
# count (0 if ≤ K items). This is the fixed point every Misra–Gries
# execution order can be reduced to, so unlike the streaming form it
# is oracle-exact, and it keeps the two MG theorems:
#   lower bound:  ĉ_i ≤ c_i            (we only subtract)
#   error bound:  c_i − ĉ_i ≤ t ≤ n/(K+1)
# Summaries MERGE by summing guaranteed counts and re-truncating with
# the merged (K+1)-th value; error budgets ADD (Agarwal et al.,
# "Mergeable Summaries", PODS'12) — a year's heavy hitters from 365
# K-row relations, no rescan. Both queries emit the theorems as
# integer predicate columns the oracle re-derives and asserts.
#
# Scale: per-scope counts are one keyed shuffle with map-side
# combines; the (K+1)-th order statistic rides topk_per_key's
# two-level tournament (no single-reducer funnel); everything after
# operates on ≤ (K+1)×scopes rows.

MG_K = 8


def _mg_threshold(counts: DataFrame, keys: list[str], item: str) -> DataFrame:
    """Per-key (K+1)-th largest count ``t`` (0 when a key has ≤ K
    items) — tie-insensitive: the ordinal VALUE doesn't depend on how
    equal counts order among themselves."""
    from ai_data_pipeline_spark.functions import topk_per_key

    top = topk_per_key(
        counts, keys, [F.desc("c"), F.asc(item)], MG_K + 1
    )
    return top.groupBy(*keys).agg(
        F.when(F.count(F.lit(1)) == MG_K + 1, F.min("c"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("t")
    )


def _mg_counts_plan(
    spark: SparkSession, sf_dir: str, keys: list
) -> DataFrame:
    """The RAW per-(keys, user) count plan — the only corpus-scaled
    stage of the MG tier (one keyed shuffle, map-side combines; the
    plan test pins partial aggregation on THIS builder, because the
    public queries materialize it once behind a localCheckpoint and
    the checkpoint hides the subtree as Scan ExistingRDD)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(*keys, "user_id").agg(F.count(F.lit(1)).alias("c"))


def sketch_mg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Misra–Gries summary of user frequencies: the ≤ K
    users per type with guaranteed count ĉ = c − t, the exact count
    beside it, and the error-budget theorem t·(K+1) ≤ n_type as a
    checked flag (t is the (K+1)-th largest of counts summing to
    n_type, so (K+1)·t can't exceed the total).

    The counts relation feeds three consumers (threshold, survivors,
    per-type totals); it is materialized ONCE (localCheckpoint — it is
    the small mergeable summary, |users|x|types| rows), so the corpus
    is scanned and shuffled exactly once however many views read it."""
    counts = _mg_counts_plan(spark, sf_dir, ["event_type"]).localCheckpoint()
    t_tbl = _mg_threshold(counts, ["event_type"], "user_id")
    n_tbl = counts.groupBy("event_type").agg(F.sum("c").alias("n_type"))
    return (
        counts.join(t_tbl, "event_type")
        .filter(F.col("c") > F.col("t"))
        .join(n_tbl, "event_type")
        .select(
            "event_type",
            "user_id",
            F.col("c").alias("c_exact"),
            (F.col("c") - F.col("t")).alias("mg_count"),
            F.col("t").alias("err_budget"),
            (F.col("t") * (MG_K + 1) <= F.col("n_type"))
            .cast("int")
            .alias("bound_ok"),
        )
    )


def _mg_topk_oracle() -> str:
    return f"""
WITH counts AS (
  SELECT event_type, user_id, count(*) AS c
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, user_id, c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY c DESC, user_id) AS rk
  FROM counts
), t_tbl AS (
  SELECT event_type,
         CASE WHEN count(*) FILTER (WHERE rk = {MG_K + 1}) = 1
              THEN min(c) FILTER (WHERE rk = {MG_K + 1}) ELSE 0 END AS t
  FROM ranked GROUP BY 1
), n_tbl AS (
  SELECT event_type, sum(c) AS n_type FROM counts GROUP BY 1
)
SELECT c.event_type, c.user_id, c.c AS c_exact, c.c - t.t AS mg_count,
       t.t AS err_budget,
       CAST(t.t * {MG_K + 1} <= n.n_type AS INT) AS bound_ok
FROM counts c
JOIN t_tbl t ON c.event_type = t.event_type
JOIN n_tbl n ON c.event_type = n.event_type
WHERE c.c > t.t
"""


def merge_mg_summaries(
    summaries: DataFrame, budgets: DataFrame, exact: DataFrame
) -> DataFrame:
    """The MG MERGE rule with its checked guarantees, shared by the
    batch proof (sketch_mg_merge_days) and the streaming maintenance
    view (streaming/sketch.py) so the two can never drift: sum the
    per-scope guaranteed counts, re-truncate with the merged (K+1)-th
    value, budgets ADD, and emit per surviving item — against the
    caller's exact counts — lower_ok / bound_ok / completeness_ok.

    Inputs: summaries (user_id, g), budgets (t — one row per scope),
    exact (user_id, c_exact). All downstream relations here are
    summary-sized (≤ (K+1)·scopes rows) except the exact join.

    Multi-consumer materialization (round-14, guide §2.4): every
    relation below feeds TWO downstream branches (pre → t_f & merged;
    budget → merged & joined; joined → missed & the output), and
    Catalyst inlines a subtree per consumer — the shipped plan of
    sketch_mg_merge_days carried 74 Exchanges / 36 re-scans of the
    checkpointed daily relation, and stream_mg_heavy_hitters re-ran
    the corpus-scale `exact` aggregate 4× (plans/r14/*_before.txt).
    The summary-sized fork (pre) and the one item-scaled fork
    (joined — |items| rows, the same size class as `exact`, which any
    evaluation materializes anyway) are LAZILY localCheckpoint'd
    (eager=False — materialized inside the first consumer's job, no
    standalone blocking job), so each shared stage runs exactly once
    however many views read it; the 1-row `budget` is deliberately NOT
    checkpointed — its two consumers re-derive it from the pre/budgets
    checkpoints, a duplicate 1-row agg being cheaper than another
    checkpoint (ADVICE r14: this docstring previously said the
    opposite of the shipped — and correct — design)."""
    pre = (
        summaries.groupBy("user_id")
        .agg(F.sum("g").alias("c"))
        .localCheckpoint(eager=False)  # ≤ (K+1)·scopes rows; feeds
        # t_f AND merged — lazy checkpoint: materialized by the first
        # consumer's job (no standalone job), read back by the second
    )
    t_f = _mg_threshold(
        pre.withColumn("_g", F.lit(0)), ["_g"], "user_id"
    ).select(F.col("t").alias("t_f"))
    budget = (
        budgets.agg(F.sum("t").alias("e_scopes"))
        .crossJoin(t_f)
        .select(
            (F.col("e_scopes") + F.col("t_f")).alias("err_budget"), "t_f"
        )
    )  # 1 row; its two consumers re-derive it from the pre/budgets
    # checkpoints — a duplicate 1-row agg is cheaper than another
    # eager checkpoint job
    merged = (
        pre.crossJoin(F.broadcast(budget))
        .filter(F.col("c") > F.col("t_f"))
        .select(
            "user_id",
            (F.col("c") - F.col("t_f")).alias("mg_count"),
            "err_budget",
        )
    )
    joined = (
        exact.join(merged, "user_id", "left")
        .crossJoin(F.broadcast(budget.select(F.col("err_budget").alias("_eb"))))
        .localCheckpoint(eager=False)  # |items| rows; feeds missed AND
        # the output — lazy: materialized inside the first consumer job
    )
    missed = joined.agg(
        (
            F.sum(
                F.when(
                    F.col("mg_count").isNull()
                    & (F.col("c_exact") > F.col("_eb")),
                    1,
                ).otherwise(0)
            )
            == 0
        )
        .cast("int")
        .alias("completeness_ok")
    )
    return (
        joined.filter(F.col("mg_count").isNotNull())
        .crossJoin(F.broadcast(missed))
        .select(
            "user_id",
            "c_exact",
            "mg_count",
            "err_budget",
            (F.col("mg_count") <= F.col("c_exact"))
            .cast("int")
            .alias("lower_ok"),
            (F.col("c_exact") - F.col("mg_count") <= F.col("err_budget"))
            .cast("int")
            .alias("bound_ok"),
            "completeness_ok",
        )
    )


def sketch_mg_merge_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE theorem for the Misra–Gries tier, oracle-checked the
    way sketch_kmv_merge_days checks KMV's: build an independent K-row
    summary per DAY of the event stream, merge them by summing
    guaranteed counts and re-truncating with the merged (K+1)-th
    value, and prove against the exact whole-corpus counts that
      (a) lower_ok:    merged ĉ ≤ c_exact,
      (b) bound_ok:    c_exact − ĉ ≤ Σ_d t_d + t_final (budgets ADD),
      (c) completeness_ok (scalar): every user with
          c_exact > total budget is IN the merged summary —
          the property that makes the day-shard plan safe: a true
          heavy hitter cannot be lost by summarizing per day.
    At 100 TB each day's summary is K rows built from that day's
    partition alone; the merge touches K×days rows. The per-day counts
    relation feeds every downstream view (thresholds, summaries,
    budgets, exact) — materialized ONCE via localCheckpoint so the
    corpus is scanned and shuffled exactly once."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    # ≤ |days| rows, feeds BOTH the summaries join and the budget sum —
    # materialized once so its 3-exchange tournament subtree isn't
    # inlined per consumer (round-14, guide §2.4)
    t_d = _mg_threshold(daily, ["day"], "user_id").localCheckpoint(eager=False)
    summaries = (
        daily.join(t_d, "day")
        .filter(F.col("c") > F.col("t"))
        .select("user_id", (F.col("c") - F.col("t")).alias("g"))
    )
    # Exact side from the SAME checkpointed daily-counts relation (not
    # a fresh events groupBy): one scan+shuffle of the corpus serves
    # every consumer.
    exact = daily.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("c_exact")
    )
    return merge_mg_summaries(summaries, t_d.select("t"), exact)


def _mg_merge_oracle() -> str:
    return f"""
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id, count(*) AS c
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT day, user_id, c,
         row_number() OVER (PARTITION BY day
                            ORDER BY c DESC, user_id) AS rk
  FROM daily
), t_d AS (
  SELECT day,
         CASE WHEN count(*) FILTER (WHERE rk = {MG_K + 1}) = 1
              THEN min(c) FILTER (WHERE rk = {MG_K + 1}) ELSE 0 END AS t
  FROM ranked GROUP BY 1
), pre AS (
  SELECT d.user_id, CAST(sum(d.c - t.t) AS BIGINT) AS c
  FROM daily d JOIN t_d t ON d.day = t.day
  WHERE d.c > t.t GROUP BY 1
), pre_ranked AS (
  SELECT user_id, c,
         row_number() OVER (ORDER BY c DESC, user_id) AS rk
  FROM pre
), budget AS (
  SELECT CAST((SELECT sum(t) FROM t_d) AS BIGINT) +
         (SELECT CASE WHEN count(*) FILTER (WHERE rk = {MG_K + 1}) = 1
                      THEN min(c) FILTER (WHERE rk = {MG_K + 1})
                      ELSE 0 END
          FROM pre_ranked) AS err_budget,
         (SELECT CASE WHEN count(*) FILTER (WHERE rk = {MG_K + 1}) = 1
                      THEN min(c) FILTER (WHERE rk = {MG_K + 1})
                      ELSE 0 END
          FROM pre_ranked) AS t_f
), exact AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS c_exact FROM daily GROUP BY 1
), merged AS (
  SELECT p.user_id, p.c - b.t_f AS mg_count, b.err_budget
  FROM pre p CROSS JOIN budget b
  WHERE p.c > b.t_f
), missed AS (
  SELECT CASE WHEN count(*) = 0 THEN 1 ELSE 0 END AS completeness_ok
  FROM exact e CROSS JOIN budget b
  LEFT JOIN merged m ON e.user_id = m.user_id
  WHERE m.user_id IS NULL AND e.c_exact > b.err_budget
)
SELECT e.user_id, e.c_exact, m.mg_count, m.err_budget,
       CAST(m.mg_count <= e.c_exact AS INT) AS lower_ok,
       CAST(e.c_exact - m.mg_count <= m.err_budget AS INT) AS bound_ok,
       x.completeness_ok
FROM exact e JOIN merged m ON e.user_id = m.user_id
CROSS JOIN missed x
"""


QUERY_DEFS = [
    QueryDef("sketch_countmin_users", sketch_countmin_users, _countmin_oracle()),
    QueryDef("sketch_kmv_users", sketch_kmv_users, _kmv_users_oracle()),
    QueryDef("sketch_kmv_jaccard", sketch_kmv_jaccard, _kmv_jaccard_oracle()),
    QueryDef("sketch_kmv_merge_days", sketch_kmv_merge_days, _kmv_merge_oracle()),
    QueryDef("sketch_bloom_filter_join", sketch_bloom_filter_join, _bloom_oracle()),
    QueryDef("sketch_quantile_hist", sketch_quantile_hist, _quantile_hist_oracle()),
    QueryDef(
        "q_quantile_exact_twophase",
        q_quantile_exact_twophase,
        _quantile_exact_oracle(),
    ),
    QueryDef(
        "sketch_quantile_tolerance",
        sketch_quantile_tolerance,
        QT_TOLERANCE_ORACLE,
    ),
    QueryDef("sketch_mg_topk", sketch_mg_topk, _mg_topk_oracle()),
    QueryDef("sketch_mg_merge_days", sketch_mg_merge_days, _mg_merge_oracle()),
]
