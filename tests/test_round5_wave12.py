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


def test_ts_decompose_constant_series(spark, tmp_path):
    # 14 days of constant $100 revenue: trend = 10000 cents wherever the
    # 7-day window is full (days 4..11), detrended = 0, seasonal = 0,
    # residual = 0; the 3 edge days each side carry NULL trend/residual.
    import datetime as dt

    t0 = dt.datetime(2001, 1, 1)
    spark.createDataFrame(
        [(i, 1, "O", 100.00, t0 + dt.timedelta(days=i), "1-URGENT") for i in range(14)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    rows = sorted(
        all_ops()["ts_decompose_daily"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.day,
    )
    assert len(rows) == 14
    for i, r in enumerate(rows):
        assert r.revenue_cents == 10000
        if 3 <= i <= 10:
            assert r.trend_cents == 10000
            assert r.seasonal_cents == 0
            assert r.residual_cents == 0
            # additive identity reconstructs exactly
            assert r.trend_cents + r.seasonal_cents + r.residual_cents == r.revenue_cents
        else:
            assert r.trend_cents is None and r.residual_cents is None


def test_collated_group_merges_case_variants(spark, tmp_path):
    spark.createDataFrame(
        [(1, "widget", "BrandA"), (2, "widget", "BrandA"), (3, "gadget", "BrandA"), (4, "widget", "BrandA")],
        "p_partkey bigint, p_type string, p_brand string",
    ).write.parquet(str(tmp_path / "part.parquet"))
    got = {
        r.p_type_lc: r.n
        for r in all_ops()["collated_group_count"].fn(spark, str(tmp_path)).collect()
    }
    # odd keys upper-cased to WIDGET/GADGET; collation folds them back.
    assert got == {"widget": 3, "gadget": 1}


def test_twap_weights_by_holding_duration(spark, tmp_path):
    # value 100.00 held for 6h (00:00->06:00), value 200.00 held for 18h
    # (06:00->midnight): TWAP = (100*6 + 200*18) / 24 = 175.00 — a plain
    # avg() would say 150.
    t0 = dt.datetime(2001, 1, 1)
    spark.createDataFrame(
        [
            (1, t0, 1, "view", 100.00, "{}"),
            (2, t0 + dt.timedelta(hours=6), 1, "view", 200.00, "{}"),
        ],
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    row = all_ops()["twap_daily_value"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_events == 2
    assert row.covered_us == 24 * 3600 * 1_000_000
    assert row.twap_cents == 17500.0


def test_nearest_centroid_confusion_known(spark, tmp_path):
    # label 0 clusters at (0, ~0), label 1 at (1, ~1); one mislabeled
    # point sits inside cluster 1 -> predicted 1 though labeled 0.
    spark.createDataFrame(
        [
            (1, [0.0, 0.0], 0),
            (2, [0.0, 0.2], 0),
            (3, [1.0, 1.0], 1),
            (4, [1.0, 0.8], 1),
            (5, [1.0, 1.0], 0),
        ],
        "vec_id bigint, embedding array<double>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        (r.actual_label, r.predicted_label): r.n_vecs
        for r in all_ops()["nearest_centroid_confusion"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {(0, 0): 2, (1, 1): 2, (0, 1): 1}


def test_pca_power_step_finds_dominant_axis(spark, tmp_path):
    # All variance lives on dim 1 (values 1..4), dim 2 is constant ->
    # C has a single nonzero entry C11, so v1 is exactly axis 1: the
    # dominant component gets |v1_rel| = 1, the dead axis exactly 0.
    spark.createDataFrame(
        [(i, [float(i), 5.0], i % 2) for i in range(1, 5)],
        "vec_id bigint, embedding array<double>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        r.dim: r.v1_rel
        for r in all_ops()["pca_power_iteration_step"].fn(spark, str(tmp_path)).collect()
    }
    assert abs(got[1]) == 1.0
    assert got[2] == 0.0


def test_mmr_demotes_exact_duplicate(spark, tmp_path):
    # d3 has the highest BM25 (rare 'join', tf 4) -> pick 1. d1 and d2
    # are exact duplicates, both diverse from d3 -> pick 2 goes to d1
    # (tie-break), and the duplicate d2 arrives LAST carrying
    # max_sim_micro = 1e6 (full Jaccard overlap with d1) — the
    # redundancy penalty doing its job.
    spark.createDataFrame(
        [
            (1, "hash stream", "en", "s", 11),
            (2, "hash stream", "en", "s", 11),
            (3, "join join join join", "en", "s", 19),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r.pick_order: r for r in all_ops()["mmr_diversified_topk"].fn(spark, str(tmp_path)).collect()}
    assert rows[1].doc_id == 3 and rows[1].max_sim_micro == 0
    assert rows[2].doc_id == 1
    assert rows[3].doc_id == 2 and rows[3].max_sim_micro == 1_000_000


def test_markov_p3_deterministic_chain(spark, tmp_path):
    # Deterministic cycle view -> click -> purchase -> view ... :
    # P is a permutation matrix, so P^3 = I and p3(start->purchase) is
    # 1e6 exactly when start == purchase, else 0.
    t0 = dt.datetime(2024, 1, 1)
    cyc = ["view", "click", "purchase"]
    rows = [
        (i, 1, cyc[i % 3], t0 + dt.timedelta(minutes=i)) for i in range(31)
    ]
    _write_events(spark, tmp_path, [(eid, uid, et, ts) for (eid, uid, et, ts) in rows])
    got = {
        r.start_type: r.p3_purchase_micro
        for r in all_ops()["markov_3step_purchase"].fn(spark, str(tmp_path)).collect()
    }
    # sparse result: zero-probability paths are simply absent rows
    assert got.get("purchase", 0) == 1_000_000
    assert got.get("view", 0) == 0 and got.get("click", 0) == 0


def test_ece_perfectly_calibrated_is_zero_like(spark, tmp_path):
    # All-marker en docs (score 1.0, all en) and no-marker fr docs
    # (score 0.0, none en): both bins perfectly calibrated -> ECE 0.
    spark.createDataFrame(
        [
            (1, "the of", "en", "s", 6),
            (2, "the a", "en", "s", 5),
            (3, "xx yy", "fr", "s", 5),
            (4, "zz ww", "fr", "s", 5),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = all_ops()["ece_langid"].fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_docs, row.n_bins, row.ece) == (4, 2, 0.0)


def test_lcc_triangle_of_duplicates(spark, tmp_path):
    # Three identical docs form a near-dup triangle: each node has
    # degree 2, 1 triangle, lcc = 1.0 (1e6 micro). An unrelated doc has
    # no edges and is absent from the output.
    text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    spark.createDataFrame(
        [
            (1, text, "en", "s", len(text)),
            (2, text, "en", "s", len(text)),
            (3, text, "en", "s", len(text)),
            (4, "totally different words here nothing shared at all", "en", "s", 50),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.degree, r.n_triangles, r.lcc_micro)
        for r in all_ops()["local_clustering_coefficient"].fn(spark, str(tmp_path)).collect()
    }
    assert 4 not in got
    assert got == {1: (2, 1, 1_000_000), 2: (2, 1, 1_000_000), 3: (2, 1, 1_000_000)}


def test_markov_conditional_entropy_deterministic_chain_is_zero(spark, tmp_path):
    # A deterministic cycle has H(next|prev) = 0: the previous event
    # fully determines the next one.
    t0 = dt.datetime(2024, 1, 1)
    cyc = ["view", "click", "purchase"]
    _write_events(
        spark,
        tmp_path,
        [(i, 1, cyc[i % 3], t0 + dt.timedelta(minutes=i)) for i in range(30)],
    )
    row = all_ops()["markov_conditional_entropy"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_transitions == 29
    assert row.h_cond_nats == 0.0


def test_loo_influence_hand_computed(spark, tmp_path):
    # balances: n1 = {100}, n2 = {200, 300}; global mean 200.
    # LOO(n1) = 250 -> influence +50; LOO(n2) = 100 -> influence -100.
    spark.createDataFrame(
        [(1, 1, "B", 100.0), (2, 2, "B", 200.0), (3, 2, "B", 300.0)],
        "c_custkey bigint, c_nationkey bigint, c_mktsegment string, c_acctbal double",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, "n1", 1), (2, "n2", 1)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    got = {
        r.n_name: (r.loo_mean_cents, r.influence_cents)
        for r in all_ops()["loo_nation_mean_influence"].fn(spark, str(tmp_path)).collect()
    }
    assert got["n1"] == (25000.0, 5000.0)
    assert got["n2"] == (10000.0, -10000.0)


def _write_orders_daily(spark, tmp_path, day_to_dollars):
    t0 = dt.datetime(2001, 1, 1)
    spark.createDataFrame(
        [
            (i, 1, "O", float(v), t0 + dt.timedelta(days=d), "1-URGENT")
            for i, (d, v) in enumerate(day_to_dollars.items())
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))


def test_theil_sen_recovers_linear_slope(spark, tmp_path):
    # revenue = 100 + 5*day dollars -> every pairwise slope is exactly
    # 500 cents/day -> median 500e6 micro-cents/day.
    _write_orders_daily(spark, tmp_path, {d: 100 + 5 * d for d in range(5)})
    row = all_ops()["theil_sen_daily_slope"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_pairs == 10
    assert row.theil_sen_slope_micro == 500_000_000.0


def test_seasonal_strength_pure_weekly_pattern_is_one(spark, tmp_path):
    # Revenue depends ONLY on day-of-week over 3 full weeks: the 7-day
    # centered MA is constant, residuals vanish -> strength 1.0.
    pattern = [100, 120, 90, 110, 105, 95, 80]
    _write_orders_daily(
        spark, tmp_path, {d: pattern[d % 7] for d in range(21)}
    )
    row = all_ops()["seasonal_strength_daily"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_days == 15  # 21 minus 3 edge days each side
    assert row.seasonal_strength == 1.0


def test_seasonal_strength_constant_series_is_null(spark, tmp_path):
    _write_orders_daily(spark, tmp_path, {d: 100 for d in range(10)})
    row = all_ops()["seasonal_strength_daily"].fn(spark, str(tmp_path)).collect()[0]
    assert row.seasonal_strength is None


def test_hits_separates_authorities_from_hubs(spark, tmp_path):
    # B is the concatenation of A and C (an anthology): A and C are
    # contained in B. After one HITS iteration A and C are the
    # authorities (auth2 = out-degree of their container = 2) and B is
    # the hub (hub2 = sum of its contents' in-degrees = 2).
    a_text = " ".join(f"a{i}" for i in range(20))
    c_text = " ".join(f"c{i}" for i in range(20))
    b_text = a_text + " " + c_text
    spark.createDataFrame(
        [
            (1, a_text, "en", "s", len(a_text)),
            (2, b_text, "en", "s", len(b_text)),
            (3, c_text, "en", "s", len(c_text)),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.auth2, r.hub2)
        for r in all_ops()["hits_containment_step"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 0), 3: (2, 0), 2: (0, 2)}


def test_assortativity_regular_graph_is_null(spark, tmp_path):
    # A triangle of identical docs is 2-regular: endpoint degrees are
    # constant -> correlation undefined -> NULL, with 6 edge-ends.
    text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    spark.createDataFrame(
        [(i, text, "en", "s", len(text)) for i in (1, 2, 3)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = all_ops()["degree_assortativity"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_edge_ends == 6
    assert row.assortativity is None


def test_cross_clip_overlap_detects_trimmed_copy(spark, tmp_path):
    # clip B is clip A with its first 64 chars (4 frames) trimmed: the
    # surviving sampled frames of B all appear in A at shifted indices
    # ONLY if the trim preserves frame alignment — trim exactly
    # 4*FRAME_LEN chars so frames realign. A 3rd unrelated clip shares
    # nothing.
    base = "".join(chr(97 + (i % 26)) for i in range(256))  # 16 frames
    trimmed = base[64:]  # drops frames 0-3, keeps alignment
    other = "".join(chr(65 + (i % 26)) for i in range(256))
    spark.createDataFrame(
        [
            (1, base, "en", "s", len(base)),
            (2, trimmed, "en", "s", len(trimmed)),
            (3, other, "en", "s", len(other)),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = all_ops()["cross_clip_frame_overlap"].fn(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b): r for r in rows}
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    # base period 26 vs frame 16 -> every frame distinct; sampled = idx
    # 0,4,8,12 of each. trimmed's sampled frames (old idx 4,8,12) all
    # exist in A's FULL frame set, but only those at idx%4==0 in BOTH
    # samplings collide: old 4,8,12 -> new 0,4,8 -> hashes of old 4,8,12
    # which ARE sampled in A -> 3 shared.
    assert r.n_shared_frames == 3
    assert r.n_frames_a == 4


def test_attribution_three_models_disagree_correctly(spark, tmp_path):
    # Journey: view@0, click@1h, purchase@2h. First-touch credits view,
    # last-touch credits click, linear splits 500000 micro each.
    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    _write_events(
        spark,
        tmp_path,
        [
            (1, 1, "view", t0),
            (2, 1, "click", t0 + h),
            (3, 1, "purchase", t0 + 2 * h),
        ],
    )
    got = {
        r.channel: (r.n_first_touch, r.n_last_touch, r.linear_credit_micro)
        for r in all_ops()["attribution_models_compare"].fn(spark, str(tmp_path)).collect()
    }
    assert got["view"] == (1, 0, 500_000)
    assert got["click"] == (0, 1, 500_000)


def test_stratified_ate_recovers_planted_effect(spark, tmp_path):
    # One band: treated rows (discount .08) buy 2 more units than
    # control -> band_effect == weighted_contrib == +2.0.
    ship = dt.datetime(2001, 1, 1)
    rows = [(i, 1, 1, 1, 5.0, 100.0, 0.08, 0.0, "N", "O", ship) for i in range(3)]
    rows += [(10 + i, 1, 1, 1, 3.0, 100.0, 0.01, 0.0, "N", "O", ship) for i in range(3)]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    row = all_ops()["stratified_ate_discount"].fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_treated, row.n_control) == (3, 3)
    assert row.band_effect == 2.0
    assert row.weighted_contrib == 2.0


def test_rbo_identical_rankings_near_one(spark, tmp_path):
    # A corpus where only distinct single-term docs match: both
    # rankings order them identically -> every depth agrees fully and
    # RBO equals the truncated weight mass sum(w_i) ~ 0.9948.
    docs = []
    for i in range(10):
        # identical tf and length for each doc of the same term pattern
        docs.append((i, "hash " + " ".join(f"x{i}_{j}" for j in range(i + 1)), "en", "s", 20))
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = all_ops()["rbo_rankings"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_common == 10
    # both lists contain the same 10 docs; whatever the internal order
    # disagreement, X_i == i wherever both prefixes coincide fully at
    # the end, so rbo <= mass. Exact equality only when orders match:
    # here density ranks by tf/len (doc 0 highest) and bm25 by idf*sat
    # (also doc 0 highest, same monotone length penalty) -> identical.
    import math
    expected = sum(
        round(w * i * 1_000_000.0 / i) for i, w in zip(range(1, 11), row_weights())
    ) + sum(
        round(w * 10 * 1_000_000.0 / i)
        for i, w in zip(range(11, 51), row_weights()[10:])
    )
    assert row.rbo_micro == expected


def row_weights():
    p = 0.9
    return [round((1 - p) * p ** (i - 1), 12) for i in range(1, 51)]


def test_image_ahash_finds_one_bit_perturbation(spark, tmp_path):
    # B differs from A in ONE pixel far from the mean boundary -> their
    # fingerprints differ in at most 1 bit -> pair found with small
    # hamming. C is a different pattern entirely -> no pair with A.
    base = ("az" * 32)          # alternating bright/dark, 64 px
    onebit = "zz" + base[2:]    # flip pixel 1 from dark to bright
    # NOTE: aHash is contrast-invariant — "mn"*32 would produce the
    # SAME alternating bit pattern as "az"*32. A different PATTERN
    # (period 4 vs period 2) is what makes an image different here.
    other = ("aazz" * 16)
    spark.createDataFrame(
        [
            (1, base, "en", "s", 64),
            (2, onebit, "en", "s", 64),
            (3, other, "en", "s", 64),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = all_ops()["image_ahash_pairs"].fn(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert (1, 2) in got
    assert got[(1, 2)] <= 2
    assert (1, 3) not in got


def test_topk_with_ties_keeps_tied_rows(spark, tmp_path):
    # 12 orders: two tie at the 10th-place value -> WITH TIES semantics
    # returns 11 rows where row_number-based top-10 would return 10.
    t0 = dt.datetime(2001, 1, 1)
    vals = [100, 95, 90, 85, 80, 75, 70, 65, 60, 55, 55, 10]
    spark.createDataFrame(
        [(i, 1, "O", float(v), t0, "1-URGENT") for i, v in enumerate(vals)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    rows = all_ops()["topk_with_ties"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 11
    assert min(r.cents for r in rows) == 5500


def test_normalized_dedup_catches_case_and_whitespace_variants(spark, tmp_path):
    spark.createDataFrame(
        [
            (1, "Hello  World", "en", "s", 12),
            (2, "hello world", "en", "s", 11),
            (3, "  HELLO WORLD  ", "en", "s", 15),
            (4, "different text", "en", "s", 14),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = all_ops()["dedup_normalized_text"].fn(spark, str(tmp_path)).collect()[0]
    # docs 1-3 normalize identically -> one survivor + doc 4.
    assert (row.n_docs, row.n_survivors, row.n_normalized_texts) == (4, 2, 2)
