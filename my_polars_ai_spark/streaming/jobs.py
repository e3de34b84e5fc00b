"""Structured Streaming counterparts of the batch time-window operators
(SURVEY.md §2b streaming extension; the reference has no streaming at all
— this is the designated extension surface over the events table).

Each job reads the events parquet as a stream (file source — in
production this is Kafka with identical downstream code), applies
watermarked windowed aggregation, and drains through a memory sink via
processAllAvailable() so batch tests can assert on the result. The
*semantics* (window assignment, session merge) are oracle-checked in
batch mode by my_polars_ai_spark.operators.timeseries — these jobs reuse
the same expressions, adding watermarks for late data.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet physical schema (ts stored as TIMESTAMP(NANOS) => read as
# long under nanosAsLong, converted to a real timestamp below).
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        # the file stream source requires a directory; select just the
        # events file out of the corpus dir with a glob filter
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def _drain_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Run the streaming query to completion over the available files and
    return the materialized result as a batch DataFrame."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.table(name)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str, gap: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per event type (streaming twin of
    operators.timeseries.tumbling_window_hourly)."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", gap).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    return _drain_to_memory(agg, "complete")


def stream_session_windows(spark: SparkSession, sf_dir: str, gap: str = "10 minutes") -> DataFrame:
    """Watermarked per-user session windows (streaming twin of
    operators.timeseries.session_window_10m)."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "30 minutes")
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    return _drain_to_memory(agg, "complete")


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup on (user_id, event_type) within the watermark
    horizon — the streaming member of the dedup family."""
    events = read_events_stream(spark, sf_dir)
    deduped = events.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    counted = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_first_touch"))
    return _drain_to_memory(counted, "complete")
