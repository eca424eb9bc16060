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
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_domain',
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT), count(*)
FROM lineitem
UNION ALL
SELECT 'lineitem_quantity_positive',
       CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT), count(*)
FROM lineitem
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly SAMPLE_PER_STRATUM customers per market segment, chosen
    by md5-of-key order: deterministic, uniform-ish, and identical
    across engines (unlike seeded RNG sampling, which is
    engine-specific — `df.sample(seed=)` is the rows-only path).
    Runs as the two-level tournament (functions.topk_per_key): the md5
    order is total, so the 5-segment key never funnels the customer
    table through 5 reducers."""
    from ai_data_pipeline_spark.functions import topk_per_key

    c = load_table(spark, sf_dir, "customer")
    h = F.md5(F.col("c_custkey").cast("string").cast("binary"))
    return topk_per_key(
        c.select("c_mktsegment", "c_custkey"),
        ["c_mktsegment"],
        [h.asc(), F.col("c_custkey").asc()],
        SAMPLE_PER_STRATUM,
    ).select("c_mktsegment", "c_custkey", F.col("rk").alias("sample_rank"))


STRATIFIED_ORACLE = f"""
SELECT c_mktsegment, c_custkey, sample_rank FROM (
  SELECT c_mktsegment, c_custkey,
    row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS sample_rank
  FROM customer
) WHERE sample_rank <= {SAMPLE_PER_STRATUM}
"""


DRIFT_CUTOFF = "2024-01-15 00:00:00"
DRIFT_COLS = ["user_id", "event_type", "value", "props"]


def schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two time-slices of the events stream:
    per column, row/null/distinct counts before and after a cutoff, plus
    an integer-exact drift flag (null-rate change beyond 1% — compared
    as cross-multiplied integers so no float epsilon enters the oracle).

    This is the reference's profiler turned into a *monitor*: the same
    per-column aggregates, computed per partition-slice and diffed. At
    100 TB the slices are partition-pruned scans (ingest-date
    partitioning), each side one multi-aggregate pass; the Expand from
    multi-column exact distincts is the cost — the sketch tier swaps in
    approx_count_distinct for monitoring (exact kept for the oracle)."""
    e = load_table(spark, sf_dir, "events")

    def side(df: DataFrame, tag: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n")]
        for c in DRIFT_COLS:
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
            aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
        row = df.agg(*aggs)
        per_col = row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column_name"),
                            F.col("n").alias(f"n_{tag}"),
                            F.col(f"nulls_{c}").alias(f"nulls_{tag}"),
                            F.col(f"dist_{c}").alias(f"dist_{tag}"),
                        )
                        for c in DRIFT_COLS
                    ]
                )
            ).alias("s")
        ).select("s.*")
        return per_col

    a = side(e.filter(F.col("ts") < F.lit(DRIFT_CUTOFF)), "a")
    b = side(e.filter(F.col("ts") >= F.lit(DRIFT_CUTOFF)), "b")
    joined = a.join(b, "column_name")
    # |nulls_a/n_a - nulls_b/n_b| > 0.01  ⇔  100*|nulls_a*n_b - nulls_b*n_a| > n_a*n_b
    drift = (
        F.abs(F.col("nulls_a") * F.col("n_b") - F.col("nulls_b") * F.col("n_a")) * 100
        > F.col("n_a") * F.col("n_b")
    )
    return joined.select(
        "column_name", "n_a", "nulls_a", "dist_a", "n_b", "nulls_b", "dist_b",
        drift.cast("int").alias("null_rate_drift"),
    )


def _drift_oracle() -> str:
    def side(tag: str, pred: str) -> str:
        rows = " UNION ALL ".join(
            f"SELECT '{c}' AS column_name, count(*) AS n_{tag}, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_{tag}, "
            f"count(DISTINCT {c}) AS dist_{tag} FROM events WHERE {pred}"
            for c in DRIFT_COLS
        )
        return rows

    return f"""
WITH a AS ({side('a', f"ts < TIMESTAMP '{DRIFT_CUTOFF}'")}),
     b AS ({side('b', f"ts >= TIMESTAMP '{DRIFT_CUTOFF}'")})
SELECT column_name, n_a, nulls_a, dist_a, n_b, nulls_b, dist_b,
       CAST(abs(nulls_a * n_b - nulls_b * n_a) * 100 > n_a * n_b AS INT)
         AS null_rate_drift
FROM a JOIN b USING (column_name)
"""


import math

BENFORD_EXPECTED = {d: math.log10(1 + 1 / d) for d in range(1, 10)}


def dq_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data screen: observed leading-digit rates vs log10(1+1/d)
    expectations (inlined as constants, so no engine log() involved).
    One groupBy over the digit projection; the 9-row result joins a
    broadcast literal table of expectations."""
    o = load_table(spark, sf_dir, "orders")
    digits = o.select(
        F.substring(
            F.col("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    expected = F.create_map(
        *[x for d, p in BENFORD_EXPECTED.items() for x in (F.lit(d), F.lit(p))]
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("observed_rate", F.round(F.col("n") / F.col("total"), 6))
        .withColumn("expected_rate", F.round(expected[F.col("digit")], 6))
        .withColumn(
            "abs_deviation",
            F.round(F.abs(F.col("n") / F.col("total") - expected[F.col("digit")]), 6),
        )
        .select("digit", "n", "observed_rate", "expected_rate", "abs_deviation")
    )


def _benford_oracle() -> str:
    exp_rows = " UNION ALL ".join(
        f"SELECT {d} AS digit, CAST({p!r} AS DOUBLE) AS exp_p"
        for d, p in BENFORD_EXPECTED.items()
    )
    return f"""
WITH counts AS (
  -- explicit floor: DuckDB's double->bigint cast rounds, Spark's truncates
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*) AS n
  FROM orders GROUP BY 1
), tot AS (SELECT sum(n) AS total FROM counts),
exp AS ({exp_rows})
SELECT c.digit, c.n,
       round(CAST(c.n AS DOUBLE) / total, 6) AS observed_rate,
       round(exp_p, 6) AS expected_rate,
       round(abs(CAST(c.n AS DOUBLE) / total - exp_p), 6) AS abs_deviation
FROM counts c CROSS JOIN tot JOIN exp ON c.digit = exp.digit
"""


K_ANON = 5  # minimum group size for the quasi-identifier partition


def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (privacy gate before a dataset release): group
    by the quasi-identifier tuple (nation, market segment), flag every
    equivalence class smaller than K_ANON, and carry the class's share
    of the table in exact per-million fixed point.

    Scale: one map-side-combined aggregation on the QI tuple; the
    global row count rides along as a broadcast scalar. Skewed QI
    combinations don't matter — output cardinality is the QI domain."""
    c = load_table(spark, sf_dir, "customer")
    total = c.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("class_size"))
        .crossJoin(F.broadcast(total))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            (F.col("class_size") < K_ANON).cast("int").alias("flag_below_k"),
            F.floor(F.col("class_size") * 1_000_000 / F.col("n_total")).alias(
                "share_ppm"
            ),
        )
    )


K_ANON_ORACLE = f"""
WITH total AS (SELECT count(*) AS n_total FROM customer)
SELECT c_nationkey, c_mktsegment, count(*) AS class_size,
       CAST(count(*) < {K_ANON} AS INT) AS flag_below_k,
       CAST(floor(CAST(count(*) * 1000000 AS DOUBLE) / n_total) AS BIGINT)
         AS share_ppm
FROM customer CROSS JOIN total
GROUP BY c_nationkey, c_mktsegment, n_total
"""


L_DIV = 3  # minimum sensitive-value diversity per QI class
SENS_BAND = 1000  # account-balance band width (the sensitive attribute)


def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the homogeneity-attack check k-anonymity
    misses (Machanavajjhala et al. 2007): a QI class can be large
    (k-anonymous) yet leak its sensitive attribute if every member
    shares the same value. For the same QI tuple as dq_k_anonymity
    (nation, market segment) and the account-balance band as the
    sensitive attribute, reports each class's distinct-l, the
    dominant value's share in exact ppm (the attacker's best-guess
    confidence), and the below-l flag.

    Scale: two keyed aggregates, both map-side combined — one on
    (QI, sensitive-band), one rollup on QI. No join, no window; the
    first shuffle's cardinality is the (QI × band) domain, not the
    table. Band = floor(acctbal / SENS_BAND) in double — identical
    IEEE ops both engines, exact for these magnitudes."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / SENS_BAND).cast("long")
    per_value = (
        c.select("c_nationkey", "c_mktsegment", band.alias("sens_band"))
        .groupBy("c_nationkey", "c_mktsegment", "sens_band")
        .agg(F.count(F.lit(1)).alias("n_sv"))
    )
    return (
        per_value.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("n_sv").alias("class_size"),
            F.count(F.lit(1)).alias("l_distinct"),
            F.max("n_sv").alias("top_value_n"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            "l_distinct",
            (F.col("l_distinct") < L_DIV).cast("int").alias("flag_below_l"),
            F.expr("(top_value_n * 1000000) div class_size").alias(
                "top_share_ppm"
            ),
        )
    )


L_DIVERSITY_ORACLE = f"""
WITH per_value AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / {SENS_BAND}) AS BIGINT) AS sens_band,
         count(*) AS n_sv
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment,
       CAST(sum(n_sv) AS BIGINT) AS class_size,
       count(*) AS l_distinct,
       CAST(count(*) < {L_DIV} AS INT) AS flag_below_l,
       (CAST(max(n_sv) AS BIGINT) * 1000000) // CAST(sum(n_sv) AS BIGINT)
         AS top_share_ppm
FROM per_value
GROUP BY 1, 2
"""


# (child table, FK column, parent table, PK column) — the declared
# relational skeleton of the testdata (TESTDATA.md); dq check counts
# orphans per edge.
_FK_EDGES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the schema's FK graph: for each
    child→parent edge, the child row count and the number of orphan
    rows (FK values with no parent). The complement of fk_inference —
    that DISCOVERS the edges, this ENFORCES them, which is the check a
    warehouse DQ gate runs per load.

    Scale: ONE scan per child table regardless of how many edges leave
    it — every parent's distinct key set left-joins in (dimension
    parents broadcast, fact-fact edges shuffle on the key once) and a
    single aggregation counts rows plus per-edge null parents; the
    per-edge rows then unpivot from that one stats row. The naive
    shape (an anti-join + a count scan per edge) reads the fact table
    2× per edge — 6× lineitem at this schema."""
    by_child: dict[str, list[tuple[str, str, str]]] = {}
    for child, fk, parent, pk in _FK_EDGES:
        by_child.setdefault(child, []).append((fk, parent, pk))
    parts = []
    for child, edges in by_child.items():
        df = load_table(spark, sf_dir, child).select(
            *{fk for fk, _, _ in edges}
        )
        for i, (fk, parent, pk) in enumerate(edges):
            p = (
                load_table(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"__pk{i}"))
                .distinct()
            )
            df = df.join(p, F.col(fk) == F.col(f"__pk{i}"), "left")
        stats = df.agg(
            F.count(F.lit(1)).alias("n_child"),
            *[
                F.sum(F.col(f"__pk{i}").isNull().cast("long")).alias(f"o{i}")
                for i in range(len(edges))
            ],
        )
        # one explode, not one select per edge — a per-edge select would
        # re-execute the join/agg subtree once per union branch
        edge_structs = [
            F.struct(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("relationship"),
                F.col("n_child"),
                F.col(f"o{i}").alias("n_orphans"),
            )
            for i, (fk, parent, pk) in enumerate(edges)
        ]
        parts.append(
            stats.select(F.explode(F.array(*edge_structs)).alias("s")).select("s.*")
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def _ref_integrity_oracle() -> str:
    selects = []
    for child, fk, parent, pk in _FK_EDGES:
        selects.append(
            f"SELECT '{child}.{fk}->{parent}.{pk}' AS relationship, "
            f"(SELECT count(*) FROM {child}) AS n_child, "
            f"(SELECT count(*) FROM {child} c WHERE NOT EXISTS "
            f"(SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})) AS n_orphans"
        )
    return "\nUNION ALL\n".join(selects)


FANOUT_EDGES = [
    # FK edges (parent unique) plus one deliberate many-to-many pair —
    # the join every analyst eventually writes by accident
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("events", "user_id", "orders", "o_custkey"),  # m:n — explodes
]
FANOUT_FLAG_FACTOR = 2  # flag when est rows > factor × max(input sides)


def dq_join_fanout_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-explosion pre-check — the guard a query gateway runs BEFORE
    admitting a join at 100 TB: for each candidate join edge, compute
    both sides' per-key multiplicities and the EXACT join cardinality
    Σₖ n_left(k)·n_right(k) from key-count sketches alone (never
    executing the join), plus max multiplicities and a flag when the
    estimate exceeds FANOUT_FLAG_FACTOR × the larger input. A
    many-to-many edge (events.user_id ⋈ orders.o_custkey here) shows
    the blowup the guard exists to catch.

    Scale: per edge, two keyed count aggregates (map-side partials)
    reduce each side to its distinct-key profile; the profiles join on
    the key — work proportional to distinct keys, not rows, which is
    the entire point: the 10¹⁴-row product is priced from two
    relation-sized-in-keys inputs."""
    parts = []
    for lt, lk, rt, rk in FANOUT_EDGES:
        lc = (
            load_table(spark, sf_dir, lt)
            .groupBy(F.col(lk).alias("k"))
            .agg(F.count(F.lit(1)).alias("nl"))
        )
        rc = (
            load_table(spark, sf_dir, rt)
            .groupBy(F.col(rk).alias("k"))
            .agg(F.count(F.lit(1)).alias("nr"))
        )
        # ONE full-outer join of the two key profiles per edge: side
        # totals are sums over the profile itself (each table scans
        # once), side maxima cover ALL keys (a hot unmatched key is
        # still a hazard the guard should surface), and the exact join
        # cardinality sums nl*nr over the matched keys only.
        prof = lc.join(rc, "k", "full_outer").agg(
            F.coalesce(F.sum("nl"), F.lit(0)).alias("n_left"),
            F.coalesce(F.sum("nr"), F.lit(0)).alias("n_right"),
            F.coalesce(F.sum(F.col("nl") * F.col("nr")), F.lit(0)).alias(
                "est_join_rows"
            ),
            F.coalesce(F.max("nl"), F.lit(0)).alias("max_left_mult"),
            F.coalesce(F.max("nr"), F.lit(0)).alias("max_right_mult"),
        )
        parts.append(
            prof.select(
                F.lit(f"{lt}.{lk}x{rt}.{rk}").alias("edge"),
                "n_left",
                "n_right",
                "est_join_rows",
                "max_left_mult",
                "max_right_mult",
                (
                    F.col("est_join_rows")
                    > FANOUT_FLAG_FACTOR * F.greatest("n_left", "n_right")
                )
                .cast("int")
                .alias("flag_explosive"),
            )
        )
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), parts)


def _fanout_oracle() -> str:
    branches = []
    for lt, lk, rt, rk in FANOUT_EDGES:
        branches.append(f"""
SELECT '{lt}.{lk}x{rt}.{rk}' AS edge,
       coalesce(CAST(sum(nl) AS BIGINT), 0) AS n_left,
       coalesce(CAST(sum(nr) AS BIGINT), 0) AS n_right,
       coalesce(CAST(sum(nl * nr) AS BIGINT), 0) AS est_join_rows,
       coalesce(max(nl), 0) AS max_left_mult,
       coalesce(max(nr), 0) AS max_right_mult,
       CAST(coalesce(CAST(sum(nl * nr) AS BIGINT), 0) >
            {FANOUT_FLAG_FACTOR} * greatest(coalesce(CAST(sum(nl) AS BIGINT), 0),
                                            coalesce(CAST(sum(nr) AS BIGINT), 0))
            AS INT) AS flag_explosive
FROM (SELECT {lk} AS k, count(*) AS nl FROM {lt} GROUP BY 1) lc
FULL OUTER JOIN (SELECT {rk} AS k, count(*) AS nr FROM {rt} GROUP BY 1) rc
  USING (k)
""")
    return "\nUNION ALL\n".join(branches)


# Partition-health anomaly screen: trailing window width and the
# deviation threshold (percent of the trailing mean) for flagging.
ANOM_PRIOR_DAYS = 7
ANOM_DEV_PCT = 50


def dq_partition_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-health anomaly screen — the monitor a lake runs on
    every ingest partition before downstream jobs trust it: per
    CALENDAR day between the first and last observed event, row volume
    and distinct-user reach are compared against the trailing
    {ANOM_PRIOR_DAYS}-calendar-day mean, and a partition deviating
    more than {ANOM_DEV_PCT}% (either direction — a half-empty
    partition is a failed ingest, a doubled one is a replay) is
    flagged. The per-day stats join onto a generated calendar SPINE,
    so a fully-missing day appears as an n_rows=0 row and flags —
    the most severe failure (100% loss) would otherwise be the one
    the monitor structurally could not see; and the trailing window
    is a RANGE frame over the day ordinal, so it always spans exactly
    the prior {ANOM_PRIOR_DAYS} calendar days even around gaps (a
    ROWS frame would silently dilate across them) — both round-10
    review findings. Days with no history (the stream's first
    partitions) report prior_days = 0 and are never flagged —
    absence of a baseline is not an anomaly.

    The deviation predicate is integer-exact on both engines with no
    division: |n·k − S|·100 > {ANOM_DEV_PCT}·S, where k/S are the
    trailing day count/sum — algebraically |n − S/k| > S/k · dev%,
    with n·k bounded by rows·{ANOM_PRIOR_DAYS} (no overflow at any
    corpus).

    Scale: the corpus reduces to ONE row per day in a single keyed
    aggregate (map-side combines; the exact distinct is the only
    Expand — swap approx_count_distinct at 100 TB, same monitor); the
    spine is generated from a 1-row bound aggregate, and the trailing
    windows run over the calendar-bounded day relation — never over
    data."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    per = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
    )
    spine = per.agg(F.min("d").alias("lo"), F.max("d").alias("hi")).select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    days = spine.join(per, "d", "left").select(
        "d",
        F.datediff("d", F.lit("1970-01-01").cast("date")).alias("day_num"),
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("n_users", F.lit(0)).alias("n_users"),
    )
    w = Window.orderBy("day_num").rangeBetween(-ANOM_PRIOR_DAYS, -1)
    cur = days.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_rows",
        "n_users",
        F.count(F.lit(1)).over(w).alias("prior_days"),
        F.coalesce(F.sum("n_rows").over(w), F.lit(0)).alias("sum_prior_rows"),
        F.coalesce(F.sum("n_users").over(w), F.lit(0)).alias("sum_prior_users"),
    )

    def dev_flag(n: str, s: str) -> F.Column:
        return (
            (F.col("prior_days") > 0)
            & (
                F.abs(F.col(n) * F.col("prior_days") - F.col(s)) * 100
                > ANOM_DEV_PCT * F.col(s)
            )
        ).cast("int")

    return cur.select(
        "*",
        dev_flag("n_rows", "sum_prior_rows").alias("flag_volume_anomaly"),
        dev_flag("n_users", "sum_prior_users").alias("flag_users_anomaly"),
    )


PARTITION_ANOMALY_ORACLE = f"""
WITH per AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n_rows,
         count(DISTINCT user_id) AS n_users
  FROM events GROUP BY 1
), bounds AS (
  SELECT min(d) AS lo, max(d) AS hi FROM per
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds WHERE lo IS NOT NULL
), days AS (
  SELECT s.d, date_diff('day', DATE '1970-01-01', s.d) AS day_num,
         coalesce(p.n_rows, 0) AS n_rows,
         coalesce(p.n_users, 0) AS n_users
  FROM spine s LEFT JOIN per p ON s.d = p.d
), trail AS (
  SELECT strftime(d, '%Y-%m-%d') AS day, n_rows, n_users,
         count(*) OVER w AS prior_days,
         CAST(coalesce(sum(n_rows) OVER w, 0) AS BIGINT) AS sum_prior_rows,
         CAST(coalesce(sum(n_users) OVER w, 0) AS BIGINT) AS sum_prior_users
  FROM days
  WINDOW w AS (ORDER BY day_num RANGE BETWEEN {ANOM_PRIOR_DAYS} PRECEDING
               AND 1 PRECEDING)
)
SELECT *,
       CAST(prior_days > 0 AND
            abs(n_rows * prior_days - sum_prior_rows) * 100
              > {ANOM_DEV_PCT} * sum_prior_rows AS INT)
         AS flag_volume_anomaly,
       CAST(prior_days > 0 AND
            abs(n_users * prior_days - sum_prior_users) * 100
              > {ANOM_DEV_PCT} * sum_prior_users AS INT)
         AS flag_users_anomaly
FROM trail
"""


QUERY_DEFS = [
    QueryDef("dq_benford_check", dq_benford_check, _benford_oracle()),
    QueryDef("dq_join_fanout_guard", dq_join_fanout_guard, _fanout_oracle()),
    QueryDef("dq_k_anonymity", dq_k_anonymity, K_ANON_ORACLE),
    QueryDef(
        "dq_partition_anomaly", dq_partition_anomaly, PARTITION_ANOMALY_ORACLE
    ),
    QueryDef("dq_l_diversity", dq_l_diversity, L_DIVERSITY_ORACLE),
    QueryDef("dq_checks", dq_checks, DQ_ORACLE),
    QueryDef("q_stratified_sample", q_stratified_sample, STRATIFIED_ORACLE),
    QueryDef("schema_drift", schema_drift, _drift_oracle()),
    QueryDef(
        "dq_referential_integrity",
        dq_referential_integrity,
        _ref_integrity_oracle(),
    ),
]
