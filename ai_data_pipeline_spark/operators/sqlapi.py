"""SQL-string entry path: the same engine through ``spark.sql`` over
registered views — users who live in SQL need no DataFrame code. The
SQL text is shared with the DuckDB oracle where the dialects agree,
which also demonstrates the ANSI-portable subset."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

# Portable ANSI text: runs verbatim in Spark SQL AND DuckDB.
Q1_SQL_PORTABLE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

TOP_SEGMENT_SQL_PORTABLE = """
SELECT c_mktsegment, n_orders, total
FROM (
  SELECT c_mktsegment, count(*) AS n_orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
    rank() OVER (ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) DESC) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
) t WHERE rnk <= 3
"""


GROUPING_SETS_SQL_PORTABLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# Recursive CTE (Spark 4 WITH RECURSIVE == DuckDB's): a synthetic
# decimal-digit forest over real customer keys (parent = k div 10, roots
# = single-digit keys) walked to transitive closure, rolled up by depth.
# Scale note: Spark executes each recursion step as one distributed
# join against the previous level (UnionLoop) — level width, not total
# closure size, bounds memory; depth here is ~log10(keys) ≈ 6 at 100 TB.
RECURSIVE_CHAIN_SQL_PORTABLE = """
WITH RECURSIVE chain AS (
  SELECT c_custkey AS k, c_custkey AS root, 0 AS depth
  FROM customer WHERE c_custkey <= 9
  UNION ALL
  SELECT c.c_custkey AS k, ch.root AS root, ch.depth + 1 AS depth
  FROM customer c JOIN chain ch
    ON CAST(floor(c.c_custkey / 10.0) AS BIGINT) = ch.k
  WHERE c.c_custkey > 9
)
SELECT depth, count(*) AS n_nodes, count(DISTINCT root) AS n_roots,
       min(k) AS min_key, max(k) AS max_key
FROM chain GROUP BY depth
"""


def _sql_query(sql: str, tables: list[str]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return run


QUERY_DEFS = [
    QueryDef("sql_q1_portable", _sql_query(Q1_SQL_PORTABLE, ["lineitem"]), Q1_SQL_PORTABLE),
    QueryDef(
        "sql_top_segments",
        _sql_query(TOP_SEGMENT_SQL_PORTABLE, ["orders", "customer"]),
        TOP_SEGMENT_SQL_PORTABLE,
    ),
    QueryDef(
        "sql_grouping_sets",
        _sql_query(GROUPING_SETS_SQL_PORTABLE, ["lineitem"]),
        GROUPING_SETS_SQL_PORTABLE,
    ),
    QueryDef(
        "sql_recursive_closure",
        _sql_query(RECURSIVE_CHAIN_SQL_PORTABLE, ["customer"]),
        RECURSIVE_CHAIN_SQL_PORTABLE,
    ),
]
