"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     — flagship: profile the customer table at sf0.001.
queries()        — one entry per implemented operator (SURVEY.md §2 keys).
oracle_sql()     — DuckDB-equivalent SQL for each query (correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ai_data_pipeline_spark.catalog import TABLES, load_table
from ai_data_pipeline_spark.operators import (
    analytic,
    analytic2,
    clustering,
    corpus,
    dedup,
    linkage,
    maintenance,
    multimodal,
    pipeline,
    quality,
    redact,
    relational,
    sketches,
    sqlapi,
    stats,
    similarity,
    temporal,
    text,
    tpch_extra,
    tpch_extra2,
    udf_surface,
    vault,
)
from ai_data_pipeline_spark.sources import advanced as sources_advanced
from ai_data_pipeline_spark.sources import readers
from ai_data_pipeline_spark.streaming import advanced as streaming_advanced
from ai_data_pipeline_spark.streaming import windows as streaming_windows
from ai_data_pipeline_spark.profiling.profiler import profile_summary, profile_table
from ai_data_pipeline_spark.profiling.oracle import (
    profile_oracle_sql,
    profile_summary_oracle_sql,
)

QUERY_DEF_MODULES = [
    analytic,
    analytic2,
    clustering,
    corpus,
    dedup,
    linkage,
    maintenance,
    multimodal,
    pipeline,
    quality,
    redact,
    relational,
    similarity,
    sketches,
    sqlapi,
    stats,
    temporal,
    text,
    tpch_extra,
    tpch_extra2,
    udf_surface,
    vault,
    readers,
    sources_advanced,
    streaming_windows,
    streaming_advanced,
]

PROFILED_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full semantic profile of the customer table."""
    df = load_table(spark, "/root/testdata/sf0.001", "customer")
    return profile_table(df, TABLES["customer"])


def _profile_query(table: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return profile_table(load_table(spark, sf_dir, table), TABLES[table])

    return run


def _summary_query(table: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return profile_summary(profile_table(load_table(spark, sf_dir, table), TABLES[table]))

    return run


def _profile_approx_query(table: str) -> Callable[[SparkSession, str], DataFrame]:
    """100 TB-tier profile: HLL approx_count_distinct instead of the exact
    Expand-based distinct. Declared rows-only (no oracle) — sketches are
    not bit-comparable across engines by design."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return profile_table(
            load_table(spark, sf_dir, table), TABLES[table], exact_distinct=False
        )

    return run


def _profile_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse sweep: profile every table in the catalog in one query
    (one aggregation pass per table; the union is metadata-sized — one
    row per column — so a 10,000-table lake reduces to a small profile
    relation that is itself queryable)."""
    from functools import reduce
    from pyspark.sql import functions as F

    parts = [
        profile_table(load_table(spark, sf_dir, t), TABLES[t]).select(
            F.lit(t).alias("table_name"), "*"
        )
        for t in PROFILED_TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def _profile_catalog_oracle() -> str:
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, * FROM ({profile_oracle_sql(t, TABLES[t])})"
        for t in PROFILED_TABLES
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for t in PROFILED_TABLES:
        q[f"profile_{t}"] = _profile_query(t)
    q["profile_summary_customer"] = _summary_query("customer")
    q["profile_summary_events"] = _summary_query("events")
    q["profile_lineitem_approx"] = _profile_approx_query("lineitem")
    q["profile_catalog"] = _profile_catalog
    for mod in QUERY_DEF_MODULES:
        for d in mod.QUERY_DEFS:
            q[d.name] = d.fn
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    for t in PROFILED_TABLES:
        o[f"profile_{t}"] = profile_oracle_sql(t, TABLES[t])
    o["profile_summary_customer"] = profile_summary_oracle_sql("customer", TABLES["customer"])
    o["profile_summary_events"] = profile_summary_oracle_sql("events", TABLES["events"])
    o["profile_catalog"] = _profile_catalog_oracle()
    for mod in QUERY_DEF_MODULES:
        for d in mod.QUERY_DEFS:
            if d.oracle is not None:
                o[d.name] = d.oracle
    return o
