"""SparkSession factory with scale-appropriate defaults.

Local test posture: ``local[N]`` single JVM. Cluster posture (100 TB):
the same configs apply — AQE handles runtime re-planning (partition
coalescing, skew-join splitting), shuffle partitions sized to cores,
UTC session timezone so timestamp semantics match the DuckDB oracle and
any downstream engine.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


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
