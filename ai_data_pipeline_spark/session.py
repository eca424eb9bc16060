"""SparkSession factory with scale-appropriate defaults.

Local test posture: ``local[N]`` single JVM. Cluster posture (100 TB):
the same configs apply — AQE handles runtime re-planning (partition
coalescing, skew-join splitting), shuffle partitions sized to cores,
UTC session timezone so timestamp semantics match the DuckDB oracle and
any downstream engine.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import SparkSession

# Session-scoped operator caches (shared materialized intermediates like
# localCheckpoint'd shingle/token tables). Keyed WEAKLY on the live
# SparkSession object — never on id(spark): CPython reuses ids after GC,
# which could hand a new session a DataFrame bound to a dead context,
# and id-keyed entries leak across sessions in long-lived processes
# (CLI, pytest). Entries die with their session.
_SESSION_CACHES: WeakKeyDictionary = WeakKeyDictionary()


def session_scoped_cache(spark: SparkSession, namespace: str) -> dict:
    """Return a mutable dict cache bound to this SparkSession's lifetime.

    A stopped-but-still-referenced session has its caches dropped on
    access (its checkpointed blocks are gone with the context), so a
    rebuild against the stopped session fails with Spark's own clear
    error instead of returning stale handles."""
    sc = spark.sparkContext
    if getattr(sc, "_jsc", None) is None:  # context stopped
        _SESSION_CACHES.pop(spark, None)
    caches = _SESSION_CACHES.get(spark)
    if caches is None:
        caches = {}
        _SESSION_CACHES[spark] = caches
    return caches.setdefault(namespace, {})


def get_spark(app_name: str = "ai_data_pipeline_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 4, 32)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Pinned, not inherited: several queries cast decimal(38,0) sums to
        # BIGINT and document "overflow fails loudly" as the safety
        # argument. That guarantee must not be configurable away by an
        # env/conf override flipping Spark 4's ANSI default — a non-ANSI
        # session would turn an overflowing cast into a silent NULL.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # CPU-bound ops (regex profiling) need more input splits than the
        # 128MB default gives on small-ish compressed parquet; 16MB keeps
        # all cores busy locally and is still coarse enough at cluster scale.
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
