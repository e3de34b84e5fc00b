"""Structured Streaming jobs drained through the memory sink must agree
with their oracle-checked batch twins (operators.timeseries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_polars_ai_spark.operators.timeseries import session_window_10m, tumbling_window_hourly
from my_polars_ai_spark.streaming.jobs import (
    stream_dedup_within_watermark,
    stream_session_windows,
    stream_tumbling_counts,
)


def test_stream_tumbling_matches_batch(spark, sf_dir):
    streamed = stream_tumbling_counts(spark, sf_dir)
    batch = tumbling_window_hourly(spark, sf_dir)
    s = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in streamed.collect()}
    b = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()}
    assert s == b


def test_stream_sessions_match_batch(spark, sf_dir):
    streamed = stream_session_windows(spark, sf_dir)
    batch = session_window_10m(spark, sf_dir)
    s = {(r.user_id, r.session_start): r.n_events for r in streamed.collect()}
    b = {(r.user_id, r.session_start): r.n_events for r in batch.collect()}
    assert s == b


def test_stream_dedup_first_touch(spark, sf_dir):
    result = stream_dedup_within_watermark(spark, sf_dir)
    rows = {r.event_type: r.n_first_touch for r in result.collect()}
    # each (user, type) pair appears exactly once post-dedup
    from my_polars_ai_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    expected = (
        e.select("user_id", "event_type").distinct().groupBy("event_type").count().collect()
    )
    assert rows == {r.event_type: r["count"] for r in expected}


def test_stream_stateful_ema_matches_batch(spark, sf_dir):
    from my_polars_ai_spark.streaming.jobs import ema_batch, stream_ema_stateful

    streamed = stream_ema_stateful(spark, sf_dir)
    batch = ema_batch(spark, sf_dir)
    s = {(r.user_id): (r.n_events, r.ema_value) for r in streamed.collect()}
    b = {(r.user_id): (r.n_events, r.ema_value) for r in batch.collect()}
    assert s == b
