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


QUERY_DEFS = [
    QueryDef("q_upsert_merge", q_upsert_merge, Q_UPSERT_ORACLE),
    QueryDef("q_salted_join_revenue", q_salted_join_revenue, Q_SALTED_ORACLE),
]
