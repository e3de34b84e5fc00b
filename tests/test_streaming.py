"""Structured Streaming jobs drained through the memory sink must agree
with their oracle-checked batch twins (operators.timeseries)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from my_polars_ai_spark.operators.timeseries import (
    session_window_10m,
    sliding_window_1h_30m,
    tumbling_window_hourly,
)
from my_polars_ai_spark.streaming.jobs import (
    stream_dedup_within_watermark,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
)


def test_stream_tumbling_matches_batch(spark, sf_dir):
    streamed = stream_tumbling_counts(spark, sf_dir)
    batch = tumbling_window_hourly(spark, sf_dir)
    s = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in streamed.collect()}
    b = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()}
    assert s == b


def test_stream_sliding_matches_batch(spark, sf_dir):
    streamed = stream_sliding_counts(spark, sf_dir)
    batch = sliding_window_1h_30m(spark, sf_dir)
    s = {r.window_start_epoch: (r.n, r.sum_value) for r in streamed.collect()}
    b = {r.window_start_epoch: (r.n, r.sum_value) for r in batch.collect()}
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


def test_watermark_drops_late_rows_across_microbatches(spark, tmp_path):
    """Real late-data semantics across micro-batches (maxFilesPerTrigger=1).

    Append-mode subtlety (observed on Spark 4): a late row is only
    guaranteed to be DROPPED once the window's state has been evicted —
    if the state is still live the row merges despite being older than
    the watermark. So: batch 1 fills the 10:00 window, batch 2 advances
    the watermark past the window end (evicting + emitting it), batch 3
    delivers a very late row for that window — which must be dropped and
    must NOT re-emit the window."""
    import time
    import uuid

    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    d = str(tmp_path / "stream_src")

    def write_batch(rows, mode):
        spark.createDataFrame(rows, ["ts_s", "v"]).select(
            F.col("ts_s").cast("timestamp").alias("ts"), "v"
        ).coalesce(1).write.mode(mode).parquet(d)
        time.sleep(1.1)  # file source orders batches by modification time

    write_batch([("2024-01-01 10:00:00", 1), ("2024-01-01 10:30:00", 2)], "overwrite")
    # raises max event time to 12:00 -> watermark becomes 11:50 AFTER this batch
    write_batch([("2024-01-01 12:00:00", 3)], "append")
    # runs WITH watermark 11:50 -> evicts + emits the [10:00, 11:00) window
    write_batch([("2024-01-01 12:05:00", 4)], "append")
    # very late row for the ALREADY-EVICTED window + an on-time row
    write_batch([("2024-01-01 10:05:00", 100), ("2024-01-01 12:10:00", 5)], "append")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("v").alias("total"))
        .select(F.col("w.start").alias("ws"), "total")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = [(str(r.ws), r.total) for r in spark.table(name).collect()]
    # the 10:00 window was emitted exactly once, without the late v=100 row
    assert emitted.count(("2024-01-01 10:00:00", 3)) == 1, emitted
    assert not any(ws == "2024-01-01 10:00:00" and total != 3 for ws, total in emitted), emitted


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    from my_polars_ai_spark.streaming.jobs import enrich_batch, stream_static_enrich

    got = sorted(map(tuple, stream_static_enrich(spark, sf_dir).collect()))
    want = sorted(map(tuple, enrich_batch(spark, sf_dir).collect()))
    assert got == want
    assert len(got) > 0


class _FakeGroupState:
    def __init__(self, value=None):
        self._value = value
        self.updates = []

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updates.append(v)
        self._value = v


def test_ema_state_update_empty_batch_leaves_state_untouched():
    """Regression: an empty batch iterator (timeout fire before data) must
    NOT seed state with (0, 0.0) — the next real batch would blend its
    first value against the spurious zero."""
    from my_polars_ai_spark.streaming.jobs import EMA_ALPHA, _ema_state_update

    state = _FakeGroupState()
    out = list(_ema_state_update((7,), iter([]), state))
    assert out == [] and state.updates == [] and not state.exists

    # first real batch after the empty fire seeds from its own first value
    batch = pd.DataFrame({"ts": [1, 2], "event_id": [1, 2], "value": [10.0, 20.0]})
    (emitted,) = _ema_state_update((7,), iter([batch]), state)
    expected = EMA_ALPHA * 20.0 + (1 - EMA_ALPHA) * 10.0
    assert state.updates == [(2, expected)]
    assert emitted["ema_value"].iloc[0] == round(expected, 6)


def test_stream_stream_attribution_matches_batch(spark, sf_dir):
    """Stream-stream interval join (watermarked both sides) must emit
    exactly the batch join's matches under availableNow."""
    from my_polars_ai_spark.streaming.jobs import (
        attribution_batch,
        stream_stream_attribution,
    )

    batch = {tuple(r) for r in attribution_batch(spark, sf_dir).collect()}
    stream = {tuple(r) for r in stream_stream_attribution(spark, sf_dir).collect()}
    assert batch, "corpus should produce at least one attribution pair"
    assert stream == batch


def test_python_stream_source_emits_exact_rows(spark, tmp_path):
    """Custom Python streaming source (SimpleDataSourceStreamReader):
    micro-batches must cover exactly [0, max_rows) with no dupes or
    gaps, matching the driver-side row formula."""
    from my_polars_ai_spark.sources.python_datasource import (
        register_synth_stream_source,
        synth_row,
    )

    register_synth_stream_source(spark)
    df = (
        spark.readStream.format("synth_stream")
        .option("batch_rows", 10)
        .option("max_rows", 30)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("synth_stream_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(tuple(r) for r in spark.table("synth_stream_mem").collect())
    assert rows == [synth_row(i) for i in range(30)]


def test_transform_with_state_totals_match_batch(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 arbitrary-state API): final
    per-user totals must equal the batch aggregation exactly (integer
    1e-4 value units make the comparison exact, not approximate).
    Skipped where the host python lacks the protobuf runtime the
    transformWithState runner requires (this container)."""
    import pytest

    from my_polars_ai_spark.streaming.jobs import (
        stream_totals_tws,
        totals_batch,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf runtime unavailable; transformWithState runner cannot start")

    batch = {r.user_id: (r.n_events, r.sum_value_e4) for r in totals_batch(spark, sf_dir).collect()}
    # update-mode sink may hold one row per key per micro-batch; the final
    # state for a key is its row with the highest running n_events
    final = {}
    for r in stream_totals_tws(spark, sf_dir).collect():
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.sum_value_e4)
    assert final == batch


def test_stream_session_bounce_matches_batch(spark, sf_dir):
    from my_polars_ai_spark.streaming.jobs import bounce_batch, stream_session_bounce

    got = {
        r.day: (r.n_sessions, r.n_bounce)
        for r in stream_session_bounce(spark, sf_dir).collect()
    }
    want = {
        r.day: (r.n_sessions, r.n_bounce)
        for r in bounce_batch(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_foreachbatch_pointer_swap_store_matches_batch(spark, sf_dir, tmp_path):
    """The foreachBatch epoch-dir + pointer-swap store must equal the
    batch aggregation, and the pointer must resolve to a complete
    epoch directory."""
    import json

    from my_polars_ai_spark.streaming.jobs import (
        stream_foreachbatch_upsert,
        user_totals_batch,
    )

    store = str(tmp_path / "store")
    got = {
        r.user_id: (r.n_events, r.cents)
        for r in stream_foreachbatch_upsert(spark, sf_dir, store).collect()
    }
    want = {
        r.user_id: (r.n_events, r.cents)
        for r in user_totals_batch(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0

    pointer = json.load(open(f"{store}/_POINTER.json"))
    assert pointer["current"].startswith("epoch=")


def test_stream_ohlc_matches_batch(spark, sf_dir):
    from my_polars_ai_spark.operators.timeseries import ohlc_bars_hourly
    from my_polars_ai_spark.streaming.jobs import stream_ohlc_hourly

    streamed = stream_ohlc_hourly(spark, sf_dir)
    batch = ohlc_bars_hourly(spark, sf_dir)
    s = {
        (r.hour, r.event_type): (r.open, r.high, r.low, r.close, r.n_events)
        for r in streamed.collect()
    }
    b = {
        (r.hour, r.event_type): (r.open, r.high, r.low, r.close, r.n_events)
        for r in batch.collect()
    }
    assert s == b


def test_stream_dlq_split_quarantines_rejects_losslessly(spark, tmp_path):
    """main + DLQ must partition the input exactly: nothing dropped,
    nothing double-counted, reasons attached to rejects."""
    import datetime as dt

    from my_polars_ai_spark.streaming.jobs import stream_dlq_split

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        (1, t0, 1, "view", 10.0, "{}"),
        (2, t0, 1, "view", -5.0, "{}"),       # negative -> DLQ
        (3, t0, 2, "click", 7.0, "oops"),     # bad props -> DLQ
        (4, t0, 2, "view", 1.0, '{"k": 1}'),
        (5, t0, 3, "view", None, "{}"),       # NULL value -> DLQ, not dropped
        (6, t0, 3, "view", 2.0, None),        # NULL props -> DLQ, not dropped
    ]
    # the corpus stores events.parquet as a single FILE (the stream
    # source glob-filters on that name), so write one directly
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(src / "events.parquet"))
    main, dlq = stream_dlq_split(spark, str(src), str(tmp_path / "store"))
    assert sorted(r.event_id for r in main.collect()) == [1, 4]
    rejects = {r.event_id: r.reject_reason for r in dlq.collect()}
    assert rejects == {
        2: "invalid_value",
        3: "bad_props",
        5: "invalid_value",
        6: "bad_props",
    }
    assert main.count() + dlq.count() == 6


def test_stream_dynamic_gap_sessions_match_batch(spark, sf_dir):
    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.streaming.jobs import stream_session_dynamic_gap

    streamed = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in stream_session_dynamic_gap(spark, sf_dir).collect()
    }
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in all_ops()["session_window_dynamic_gap"].fn(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_stream_neardup_vs_corpus_matches_batch(spark, sf_dir):
    """The streaming incremental dedup (foreachBatch screen of the new-doc
    stream against the static corpus index) must produce exactly the
    batch op's drop-list: same contaminated doc ids, same partner
    counts, same best Jaccard."""
    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.streaming.jobs import stream_neardup_vs_corpus

    want = {
        r.doc_id: (r.n_dup_partners, r.best_jaccard)
        for r in all_ops()["dedup_incremental_minhash"].fn(spark, sf_dir).collect()
    }
    got = {
        r.doc_id: (r.n_dup_partners, r.best_jaccard)
        for r in stream_neardup_vs_corpus(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_stream_quality_gate_matches_batch(spark, sf_dir):
    """The ingest-time streaming Gopher gate must emit exactly the
    batch decision table: same flags, same keep bit, every doc."""
    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.streaming.jobs import stream_quality_gate

    cols = (
        "n_tokens", "flag_word_count", "flag_mean_word_len",
        "flag_stopwords", "flag_distinct_frac", "flag_top_token", "keep",
    )
    want = {
        r.doc_id: tuple(getattr(r, c) for c in cols)
        for r in all_ops()["gopher_quality_flags"].fn(spark, sf_dir).collect()
    }
    got = {
        r.doc_id: tuple(getattr(r, c) for c in cols)
        for r in stream_quality_gate(spark, sf_dir).collect()
    }
    assert got == want and len(got) == 500
    assert any(v[-1] == 0 for v in got.values())  # the gate actually drops
