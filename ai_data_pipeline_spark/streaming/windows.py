"""Structured Streaming operators over the events stream.

The reference has no streaming surface (Celery/Redis queueing intent
only, SURVEY.md §2.8); this is the Spark-native extension (§7.5):
event-time tumbling windows with watermark late-data policy, and session
windows. Semantics are defined by batch equivalence: the streaming
aggregation over a finite input must equal the corresponding batch
aggregation (tests/test_streaming.py), which is also what the
oracle-checked batch query ``q_events_window`` pins down.

Scale posture: watermark bounds state; windowed agg state is keyed by
(window, event_type) — low cardinality; file source here, Kafka in
production (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (parquet NANOS)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based streaming source over the events parquet (one file =
    one micro-batch under availableNow); nanos handled as in catalog."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def windowed_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Event-time tumbling 5-minute windows with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_counts_batch(events: DataFrame) -> DataFrame:
    """Batch-equivalent of windowed_counts_stream (same window origin:
    Spark's window() aligns tumbling windows to the epoch)."""
    return (
        events.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_windows_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (inactivity gap) — streaming-native
    equivalent of the batch sessionize operator."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
            "n_events",
        )
    )


def run_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain a finite stream with availableNow into a memory sink and
    return the materialized result (complete mode for aggregations)."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
