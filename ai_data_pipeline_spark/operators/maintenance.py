"""Table-maintenance operators: MERGE-style upsert (SCD1) and the
skew-salted join as a contract query.

The reference persists nothing (empty ``database/`` package —
SURVEY.md §2.1 sinks row); these cover the two maintenance patterns a
production lake runs daily:

- q_upsert_merge: MERGE INTO semantics (update matched, insert
  unmatched, pass through the rest) expressed as a full outer join +
  coalesce — the engine-agnostic upsert plan. At 100 TB the join
  shuffles on the merge key exactly like the format-native MERGE of
  Delta/Iceberg would; partition pruning on the base side comes free
  when the key correlates with layout (see partitioned_roundtrip_events).
- q_salted_join_revenue: the skew-salting utility (operators/skew.py,
  result-equality pinned by tests/test_skew.py) run as a real query:
  lineitem⋈supplier on (key, salt) with the small side exploded
  n_salt ways. The aggregated result is salt-invariant, which is what
  the oracle (plain join + group) checks; the per-row salt assignment
  itself is partition-layout-dependent by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.functions import dec_sum
from ai_data_pipeline_spark.operators.skew import salted_join
from ai_data_pipeline_spark.registry import QueryDef

UPSERT_NEW_KEY_OFFSET = 10_000_000


def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 upsert: a deterministic update set (every 10th customer gets
    a balance bump; every 97th spawns a new key) merged into the base
    table. WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT /
    carry-through, as one full outer join."""
    c = load_table(spark, sf_dir, "customer")
    bumps = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("k"),
        (F.col("c_acctbal") + 100).alias("bal"),
    )
    inserts = c.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + UPSERT_NEW_KEY_OFFSET).alias("k"),
        F.col("c_acctbal").alias("bal"),
    )
    updates = bumps.unionByName(inserts)
    merged = c.join(updates, c["c_custkey"] == updates["k"], "full_outer")
    return merged.select(
        F.coalesce(F.col("k"), F.col("c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("bal"), F.col("c_acctbal")).alias("c_acctbal"),
        F.when(F.col("c_custkey").isNull(), "inserted")
        .when(F.col("k").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
    )


Q_UPSERT_ORACLE = f"""
WITH updates AS (
  SELECT c_custkey AS k, c_acctbal + 100 AS bal
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + {UPSERT_NEW_KEY_OFFSET}, c_acctbal
  FROM customer WHERE c_custkey % 97 = 0
)
SELECT COALESCE(u.k, c.c_custkey) AS c_custkey,
       COALESCE(u.bal, c.c_acctbal) AS c_acctbal,
       CASE WHEN c.c_custkey IS NULL THEN 'inserted'
            WHEN u.k IS NULL THEN 'unchanged'
            ELSE 'updated' END AS merge_action
FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.k
"""


def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier nation through the salted join: the big
    (fact) side shuffles on (l_suppkey, salt), the supplier side is
    replicated n_salt ways, so a dominant supplier key spreads over 8
    tasks instead of hot-spotting one."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    joined = salted_join(l, s, "l_suppkey", "s_suppkey", n_salt=8)
    return joined.groupBy("s_nationkey").agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q_SALTED_ORACLE = """
SELECT s_nationkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply with deletes — the change-log MERGE a lakehouse table
    maintenance job runs (Debezium/Delta CDF shape): a deterministic
    change log over orders carries sequenced INSERT / UPDATE / DELETE
    ops; applying it means latest-op-per-key wins, DELETE removes the
    row, UPDATE overwrites the price, INSERT adds a new key.

    Change log (derived from the base table so both engines agree):
    seq 1 UPDATE price+10 for o_orderkey % 7 == 0; seq 2 DELETE for
    o_orderkey % 21 == 0; seq 1 INSERT key+UPSERT_NEW_KEY_OFFSET for
    o_orderkey % 11 == 0.

    Scale shape: the log collapses to one winner per key via a
    ``max_by`` keyed aggregate (map-side partials — no per-key window),
    then a single full-outer equi-join applies it to the base. Both
    stages hash-partition on the key; at 100 TB this is exactly the
    Delta/Iceberg MERGE topology (AQE handles skewed keys)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    log = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit(1).alias("seq"),
            F.lit("U").alias("op"),
            (F.col("o_totalprice") + 10).alias("price"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 21 == 0).select(
                F.col("o_orderkey").alias("k"),
                F.lit(2).alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("price"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 11 == 0).select(
                (F.col("o_orderkey") + UPSERT_NEW_KEY_OFFSET).alias("k"),
                F.lit(1).alias("seq"),
                F.lit("I").alias("op"),
                F.col("o_totalprice").alias("price"),
            )
        )
    )
    winner = log.groupBy("k").agg(
        F.max_by(F.struct("op", "price"), "seq").alias("w")
    ).select("k", F.col("w.op").alias("op"), F.col("w.price").alias("price"))
    merged = o.join(winner, o["o_orderkey"] == winner["k"], "full_outer")
    return (
        merged.filter((F.col("op").isNull()) | (F.col("op") != "D"))
        .select(
            F.coalesce("k", "o_orderkey").alias("o_orderkey"),
            F.coalesce("price", "o_totalprice").alias("o_totalprice"),
            F.coalesce("op", F.lit("-")).alias("last_op"),
        )
    )


Q_CDC_APPLY_ORACLE = f"""
WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
log AS (
  SELECT o_orderkey AS k, 1 AS seq, 'U' AS op,
         CAST(o_totalprice + 10 AS DOUBLE) AS price
  FROM o WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, 2, 'D', CAST(NULL AS DOUBLE) FROM o WHERE o_orderkey % 21 = 0
  UNION ALL
  SELECT o_orderkey + {UPSERT_NEW_KEY_OFFSET}, 1, 'I',
         CAST(o_totalprice AS DOUBLE)
  FROM o WHERE o_orderkey % 11 = 0
),
winner AS (
  SELECT k, op, price FROM (
    SELECT k, op, price,
           row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
    FROM log
  ) WHERE rn = 1
)
SELECT COALESCE(w.k, o.o_orderkey) AS o_orderkey,
       COALESCE(w.price, o.o_totalprice) AS o_totalprice,
       COALESCE(w.op, '-') AS last_op
FROM o FULL OUTER JOIN winner w ON o.o_orderkey = w.k
WHERE w.op IS NULL OR w.op <> 'D'
"""


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the audit that validates a MERGE: diff
    the base orders snapshot against the CDC-applied snapshot
    (``q_cdc_apply``) and classify every key as added / removed /
    changed / unchanged, emitting per-class counts and key checksums.
    Run after any bulk maintenance, this is how a lakehouse proves the
    change log did exactly what it claimed — the class counts must
    reconcile with the log's op counts.

    Scale: one full-outer equi-join on the key with a row-hash
    comparison, then a 4-row aggregate with map-side partials; the
    standard data-reconciliation topology (at 100 TB both snapshots
    hash-partition on the key; AQE handles skew)."""
    v1 = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k1"), F.col("o_totalprice").alias("p1")
    )
    v2 = q_cdc_apply(spark, sf_dir).select(
        F.col("o_orderkey").alias("k2"), F.col("o_totalprice").alias("p2")
    )
    classified = v1.join(v2, v1["k1"] == v2["k2"], "full_outer").select(
        F.coalesce("k1", "k2").alias("k"),
        F.when(F.col("k1").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .when(F.col("p1") != F.col("p2"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return classified.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("k").alias("sum_keys")
    )


def _table_diff_oracle() -> str:
    return f"""
WITH v2 AS ({Q_CDC_APPLY_ORACLE}),
classified AS (
  SELECT COALESCE(o.o_orderkey, v2.o_orderkey) AS k,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN v2.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_totalprice <> v2.o_totalprice THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM orders o FULL OUTER JOIN v2 ON o.o_orderkey = v2.o_orderkey
)
SELECT status, count(*) AS n_rows, CAST(sum(k) AS BIGINT) AS sum_keys
FROM classified GROUP BY status
"""


SCD2_BASE_FROM = "2020-01-01"  # valid_from of the initial dimension load
SCD2_EFFECTIVE = "2024-06-01"  # effective date of the incoming change batch


def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 MERGE — the close-and-insert versioning step a
    dimension table runs per load (vs ``q_scd2_status_history``, which
    rebuilds history from an event log, and ``q_upsert_merge``, which
    overwrites SCD1-style): an incoming change batch (every 10th
    customer's balance moves) closes the current version at the
    effective date and inserts a new open-ended version; untouched
    customers pass through. Emits the full post-merge version table
    (key, balance, valid_from, valid_to, is_current).

    Scale: one equi-join of the dimension against the (much smaller)
    change batch plus a union — the exact plan a Delta/Iceberg SCD2
    MERGE compiles to; the dimension shuffles once on the key (or not
    at all when the change batch broadcasts, as AQE chooses here)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("bal")
    )
    changes = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("k"), (F.col("bal") + 100).alias("new_bal")
    )
    base = c.join(changes, c["c_custkey"] == changes["k"], "left")
    existing = base.select(
        "c_custkey",
        "bal",
        F.lit(SCD2_BASE_FROM).cast("date").alias("valid_from"),
        F.when(F.col("k").isNotNull(), F.lit(SCD2_EFFECTIVE).cast("date")).alias(
            "valid_to"
        ),
        F.col("k").isNull().cast("int").alias("is_current"),
    )
    inserted = changes.select(
        F.col("k").alias("c_custkey"),
        F.col("new_bal").alias("bal"),
        F.lit(SCD2_EFFECTIVE).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    return existing.unionByName(inserted)


Q_SCD2_MERGE_ORACLE = f"""
WITH c AS (SELECT c_custkey, c_acctbal AS bal FROM customer),
changes AS (
  SELECT c_custkey AS k, bal + 100 AS new_bal FROM c WHERE c_custkey % 10 = 0
)
SELECT c.c_custkey, c.bal,
       DATE '{SCD2_BASE_FROM}' AS valid_from,
       CASE WHEN ch.k IS NOT NULL THEN DATE '{SCD2_EFFECTIVE}' END AS valid_to,
       CAST(ch.k IS NULL AS INT) AS is_current
FROM c LEFT JOIN changes ch ON c.c_custkey = ch.k
UNION ALL
SELECT k, new_bal, DATE '{SCD2_EFFECTIVE}', NULL, 1 FROM changes
"""


BUCKETED_N = 8  # bucket count for the co-located join demonstration


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple:
    """Persist orders and lineitem as bucketed+sorted parquet tables on
    the join key and return the catalog-backed reads. Table names are
    (sf, pid)-scoped so concurrent sessions never collide; the paths
    live under the atexit-cleaned scratch root.

    Memoized per (session, sf_dir) — round-14: the bucketed LAYOUT is
    the operator's whole premise ('the join shuffle is paid ONCE at
    write time and amortized across every downstream join'), yet every
    call re-wrote both tables, so the measured query was two table
    writes plus the join it exists to demonstrate. The layout is a
    deterministic function of the immutable sf_dir (the stream-fixture
    memo discipline, streaming/advanced.py); the query now measures
    the co-located join reading it."""
    import hashlib
    import os as _os

    from ai_data_pipeline_spark.session import session_scoped_cache
    from ai_data_pipeline_spark.sources.readers import scratch_dir

    cache = session_scoped_cache(spark, "bucketed_tables")
    if sf_dir in cache:
        return cache[sf_dir]

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = scratch_dir("bucketed_")

    def persist(name: str, df: DataFrame, key: str) -> DataFrame:
        tbl = f"{name}_{tag}_{_os.getpid()}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.bucketBy(BUCKETED_N, key)
            .sortBy(key)
            .option("path", f"{base}/{tbl}")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tbl)
        )
        return spark.table(tbl)

    cache[sf_dir] = (
        persist("orders_bkt", o, "o_orderkey"),
        persist("lineitem_bkt", li, "l_orderkey"),
    )
    return cache[sf_dir]


def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: persist orders and lineitem as
    bucketed+sorted tables (`bucketBy(8, key).sortBy(key)`), read them
    back, and join on the bucket key — the physical plan carries NO
    Exchange on either join input (pinned by
    tests/test_plans.py::test_bucketed_join_has_no_join_exchange):
    Spark's bucketing-aware SortMergeJoin reads co-located buckets
    directly, so the join shuffle is paid ONCE at write time and
    amortized across every downstream join on the same key.

    This is the core 100 TB layout decision for repeated fact-fact
    joins (orders⋈lineitem runs in half the TPC-H suite): at cluster
    scale the bucketed write replaces a per-query exchange of the
    larger table with a one-time layout, exactly like Hive/Iceberg
    bucket transforms. The aggregated result is bucket-invariant,
    which is what the oracle (plain join + group) checks.

    The reference persists nothing (empty ``database/`` package), so
    this is reconstruction of its storage intent in lakehouse form —
    the same family as compaction_roundtrip_events / q_zorder_layout."""
    ob, lb = _bucketed_tables(spark, sf_dir)
    return (
        lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


BUCKETED_JOIN_ORACLE = """
SELECT o_orderpriority,
       count(DISTINCT o_orderkey) AS n_orders,
       count(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# --- zone-map / data-skipping layout audit --------------------------------

ZONE_SPAN = 1000  # orderkeys per zone in the clustered layout

# The audited predicate set: one range on the clustering key (where
# zone maps SHOULD skip), and three on non-clustered columns (where an
# orderkey-clustered layout predicts ~zero skipping — the honest
# answer the audit exists to surface before anyone pays for a rewrite).
_ZONE_PREDS = [
    (1, "okey_range"),  # l_orderkey BETWEEN 1200 AND 3399
    (2, "qty_high"),  # l_quantity >= 48
    (3, "price_low"),  # l_extendedprice < 2000
    (4, "qty_low"),  # l_quantity <= 2
]


def zonemap_skip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data-skipping effectiveness audit — the layout-planning
    query run before choosing a clustering key (Delta/Iceberg file
    stats, ClickHouse mark ranges, ORC row-group indexes all skip on
    per-zone min/max): simulate two layouts of lineitem — CLUSTERED
    (zone = l_orderkey div ZONE_SPAN, contiguous key ranges per zone,
    what an orderkey-sorted rewrite would give) and SCATTERED (zone =
    l_orderkey mod n_zones, the hash-placement status quo) — compute
    each zone's min/max statistics, and report per (layout, predicate)
    how many zones and rows the stats would prune.

    The expected shape IS the finding: the key-range predicate prunes
    almost everything under the clustered layout and nothing under the
    scattered one; the non-key predicates prune ~nothing under either
    (their values are uniform within every zone) — quantifying exactly
    why sorting pays for key-range scans and does not rescue
    unclustered filters.

    Scale: one pass per layout (two keyed min/max aggregates over the
    fact table, map-side combined, zone-count output cardinality) and
    the predicate sweep over the tiny zone-stats relation. The n_zones
    scalar the scattered layout needs is derived from the CLUSTERED
    zone-stats relation (constant-size), not a third fact-table scan.
    The fact table is never joined or windowed; at 100 TB this is two
    aggregate scans — the audit costs less than one of the queries it
    plans for."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )

    def zone_stats(rel, zid):
        return rel.groupBy(zid.alias("zone")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_ok"),
            F.max("l_orderkey").alias("max_ok"),
            F.min("l_quantity").alias("min_q"),
            F.max("l_quantity").alias("max_q"),
            F.min("l_extendedprice").alias("min_p"),
        )

    # constant-size relation, consumed twice (n_zones + the union) —
    # materialize so the clustered aggregate scans the fact table once
    clustered = zone_stats(
        li, F.expr(f"l_orderkey div {ZONE_SPAN}")
    ).localCheckpoint()
    nz = clustered.agg(
        F.expr(
            f"(max(max_ok) + {ZONE_SPAN}) div {ZONE_SPAN}"
        ).alias("n_zones")
    )
    scattered = zone_stats(
        li.crossJoin(F.broadcast(nz)),
        F.col("l_orderkey") % F.col("n_zones"),
    )
    zs = clustered.withColumn("layout", F.lit("clustered")).unionByName(
        scattered.withColumn("layout", F.lit("scattered"))
    )
    preds = zs.crossJoin(
        F.broadcast(
            spark.createDataFrame(_ZONE_PREDS, "pred_id int, pred string")
        )
    ).withColumn(
        "skipped",
        F.when(
            F.col("pred_id") == 1,
            (F.col("max_ok") < 1200) | (F.col("min_ok") > 3399),
        )
        .when(F.col("pred_id") == 2, F.col("max_q") < 48)
        .when(F.col("pred_id") == 3, F.col("min_p") >= 2000)
        .otherwise(F.col("min_q") > 2)
        .cast("long"),
    )
    return preds.groupBy("layout", "pred_id", "pred").agg(
        F.count(F.lit(1)).alias("n_zones"),
        F.sum("skipped").alias("zones_skipped"),
        F.sum(F.col("skipped") * F.col("n_rows")).alias("rows_skipped"),
        F.expr(
            "(sum(skipped) * 1000000) div count(1)"
        ).alias("skip_ppm"),
    )


def _zonemap_oracle() -> str:
    pred_rows = " UNION ALL ".join(
        f"SELECT {pid} AS pred_id, '{name}' AS pred" for pid, name in _ZONE_PREDS
    )
    return f"""
WITH nz AS (
  SELECT CAST((max(l_orderkey) + {ZONE_SPAN}) // {ZONE_SPAN} AS BIGINT)
           AS n_zones
  FROM lineitem
), zs AS (
  SELECT 'clustered' AS layout, l_orderkey // {ZONE_SPAN} AS zone,
         count(*) AS n_rows,
         min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
         min(l_quantity) AS min_q, max(l_quantity) AS max_q,
         min(l_extendedprice) AS min_p
  FROM lineitem GROUP BY 1, 2
  UNION ALL
  SELECT 'scattered' AS layout, l_orderkey % (SELECT n_zones FROM nz) AS zone,
         count(*) AS n_rows,
         min(l_orderkey), max(l_orderkey),
         min(l_quantity), max(l_quantity),
         min(l_extendedprice)
  FROM lineitem GROUP BY 1, 2
), preds AS ({pred_rows}),
flagged AS (
  SELECT zs.*, p.pred_id, p.pred,
         CAST(CASE WHEN p.pred_id = 1 THEN (max_ok < 1200 OR min_ok > 3399)
                   WHEN p.pred_id = 2 THEN max_q < 48
                   WHEN p.pred_id = 3 THEN min_p >= 2000
                   ELSE min_q > 2 END AS BIGINT) AS skipped
  FROM zs CROSS JOIN preds p
)
SELECT layout, pred_id, pred,
       count(*) AS n_zones,
       CAST(sum(skipped) AS BIGINT) AS zones_skipped,
       CAST(sum(skipped * n_rows) AS BIGINT) AS rows_skipped,
       (CAST(sum(skipped) AS BIGINT) * 1000000) // count(*) AS skip_ppm
FROM flagged GROUP BY 1, 2, 3
"""


QUERY_DEFS = [
    QueryDef("q_upsert_merge", q_upsert_merge, Q_UPSERT_ORACLE),
    QueryDef("zonemap_skip_audit", zonemap_skip_audit, _zonemap_oracle()),
    QueryDef(
        "bucketed_colocated_join", bucketed_colocated_join, BUCKETED_JOIN_ORACLE
    ),
    QueryDef("q_cdc_apply", q_cdc_apply, Q_CDC_APPLY_ORACLE),
    QueryDef("q_table_diff", q_table_diff, _table_diff_oracle()),
    QueryDef("q_scd2_merge", q_scd2_merge, Q_SCD2_MERGE_ORACLE),
    QueryDef("q_salted_join_revenue", q_salted_join_revenue, Q_SALTED_ORACLE),
]
