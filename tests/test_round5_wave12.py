"""Known-value tests for session_window_dynamic_gap (per-event gap
semantics, boundary exclusivity) and apply_in_arrow_center (exact
grouped centering)."""

from __future__ import annotations

import datetime as dt

from my_polars_ai_spark.operators import all_ops


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, user_id, event_type, ts)."""
    spark.createDataFrame(
        [(eid, ts, uid, et, 1.0, "{}") for (eid, uid, et, ts) in rows],
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))


def test_dynamic_gap_purchase_extends_session(spark, tmp_path):
    # view@0 (gap 10m), view@9m (merges; end 19m), purchase@15m (merges;
    # its 30m gap extends the session end to 45m), view@46m (>= 45m ->
    # NEW session). A fixed 10m gap would have split after the purchase.
    t0 = dt.datetime(2001, 1, 1)
    m = dt.timedelta(minutes=1)
    _write_events(
        spark,
        tmp_path,
        [
            (1, 1, "view", t0),
            (2, 1, "view", t0 + 9 * m),
            (3, 1, "purchase", t0 + 15 * m),
            (4, 1, "view", t0 + 46 * m),
        ],
    )
    row = all_ops()["session_window_dynamic_gap"].fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_sessions, row.n_events) == (2, 4)


def test_dynamic_gap_boundary_is_inclusive(spark, tmp_path):
    # Spark's session merge is boundary-INCLUSIVE: an event landing
    # EXACTLY at the previous session's end merges into it; one
    # microsecond later starts a new session. The corpus's continuous
    # microsecond timestamps never land on the boundary, so only this
    # hand test can pin the rule.
    t0 = dt.datetime(2001, 1, 1)
    _write_events(
        spark,
        tmp_path,
        [
            (1, 2, "view", t0),
            (2, 2, "view", t0 + dt.timedelta(minutes=10)),
            (3, 3, "view", t0),
            (4, 3, "view", t0 + dt.timedelta(minutes=10, microseconds=1)),
        ],
    )
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in all_ops()["session_window_dynamic_gap"].fn(spark, str(tmp_path)).collect()
    }
    assert got[2] == (1, 2)
    assert got[3] == (2, 2)


def test_apply_in_arrow_center_exact(spark, tmp_path):
    spark.createDataFrame(
        [
            (1, 0, 10.00),
            (2, 0, 20.00),
            (3, 0, 40.00),
            (4, 1, -5.00),
        ],
        "c_custkey bigint, c_nationkey bigint, c_acctbal double",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    got = {
        r.c_custkey: (r.n_in_group, r.dev_cents_x_n)
        for r in all_ops()["apply_in_arrow_center"].fn(spark, str(tmp_path)).collect()
    }
    # nation 0: S = 7000 cents, n = 3 -> dev = 3*x - 7000.
    assert got[1] == (3, 3 * 1000 - 7000)
    assert got[2] == (3, 3 * 2000 - 7000)
    assert got[3] == (3, 3 * 4000 - 7000)
    # singleton group centers to zero.
    assert got[4] == (1, 0)
