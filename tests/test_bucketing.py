"""Bucketed tables: a join on the bucket key must read both sides
pre-partitioned — no Exchange on either input. This is the co-located
join strategy for repeated big-big joins at scale (bucket once at ingest,
join shuffle-free forever after)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    for name in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", str(tmp_path / "b_orders"))
        .saveAsTable("b_orders")
    )
    (
        c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", str(tmp_path / "b_customer"))
        .saveAsTable("b_customer")
    )
    j = spark.table("b_orders").join(
        spark.table("b_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    # and the join is still correct
    assert j.count() == o.join(c, o["o_custkey"] == c["c_custkey"]).count()
    for name in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_contract_bucketed_join_is_shuffle_free(spark, no_broadcast):
    """The contract query's bucketed tables must join with NO exchange
    on either input (the write-once/join-forever co-location), and the
    aggregated result must be bucket-invariant (equal to the plain
    join over the raw parquet)."""
    from ai_data_pipeline_spark.operators.maintenance import (
        _bucketed_tables,
        bucketed_colocated_join,
    )

    ob, lb = _bucketed_tables(spark, SF_DIR)
    j = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan

    got = {
        r.o_orderpriority: (r.n_orders, r.n_items, r.revenue)
        for r in bucketed_colocated_join(spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    want = {
        r.o_orderpriority: (r.n_orders, r.n_items, r.revenue)
        for r in li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    }
    assert got == want
