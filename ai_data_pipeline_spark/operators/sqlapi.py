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
]
