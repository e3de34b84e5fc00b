"""Known-value tests for operators/classic_ml.py (auc_langid_score,
ols_price_on_qty_discount) — hand-computed answers on tiny synthetic
tables, independent of the DuckDB oracle harness."""

from __future__ import annotations

import datetime as dt

from my_polars_ai_spark.operators import all_ops


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang)."""
    spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for (i, t, lang) in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))


def test_auc_perfect_separation(spark, tmp_path):
    # en docs all markers (score 1.0), others none (score 0.0) -> AUC 1.
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "the of and", "en"),
            (2, "the the", "en"),
            (3, "xx yy zz", "fr"),
            (4, "aa bb", "de"),
        ],
    )
    row = all_ops()["auc_langid_score"].fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_pos, row.n_neg, row.auc) == (2, 2, 1.0)


def test_auc_with_ties_hand_computed(spark, tmp_path):
    # pos scores {1.0, 0.0}, neg scores {0.0}: doubled rank-sum
    # R1x2 = 3 + 6 = 9, U1x2 = 9 - 2*3 = 3, AUC = 3 / (2*2*1) = 0.75.
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "the the", "en"),
            (2, "xx yy", "en"),
            (3, "qq rr", "fr"),
        ],
    )
    row = all_ops()["auc_langid_score"].fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_pos, row.n_neg, row.auc) == (2, 1, 0.75)


def _write_lineitem(spark, tmp_path, rows):
    """rows: (flag, qty, discount, extendedprice_dollars)."""
    ship = dt.datetime(2001, 1, 1)
    spark.createDataFrame(
        [
            (i, i, i, 1, float(q), float(p), float(d), 0.0, flag, "O", ship)
            for i, (flag, q, d, p) in enumerate(rows)
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))


def test_ols_recovers_exact_planted_betas(spark, tmp_path):
    # y_cents = 200*qty + 100*disc_pct exactly (price = 2*qty + 1*pct
    # dollars), so the closed-form solve must return the planted betas.
    rows = [
        ("N", 1, 0.00, 2 * 1 + 0),
        ("N", 2, 0.01, 2 * 2 + 1),
        ("N", 3, 0.05, 2 * 3 + 5),
        ("N", 4, 0.02, 2 * 4 + 2),
    ]
    _write_lineitem(spark, tmp_path, rows)
    out = {
        r.l_returnflag: r
        for r in all_ops()["ols_price_on_qty_discount"].fn(spark, str(tmp_path)).collect()
    }
    assert out["N"].n_rows == 4
    assert out["N"].beta_qty_cents == 200.0
    assert out["N"].beta_disc_cents == 100.0


def test_ols_collinear_group_yields_null(spark, tmp_path):
    # Constant discount -> singular normal equations -> NULL betas.
    rows = [
        ("A", 1, 0.03, 10.0),
        ("A", 2, 0.03, 14.0),
        ("A", 3, 0.03, 18.0),
    ]
    _write_lineitem(spark, tmp_path, rows)
    row = all_ops()["ols_price_on_qty_discount"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_rows == 3
    assert row.beta_qty_cents is None and row.beta_disc_cents is None


def test_naive_bayes_langid_known_corpus(spark, tmp_path):
    # Separable vocab: 'the' only in en docs, 'le' only in fr docs ->
    # resubstitution classifies all perfectly. The empty 'de' doc gets
    # the prior-only argmax: en/fr priors tie at 2/5, tie-break lang
    # asc -> 'en'.
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "the cat", "en"),
            (2, "the dog", "en"),
            (3, "le chat", "fr"),
            (4, "le chien", "fr"),
            (5, "", "de"),
        ],
    )
    got = {
        (r.actual_lang, r.predicted_lang): r.n_docs
        for r in all_ops()["naive_bayes_langid"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {("en", "en"): 2, ("fr", "fr"): 2, ("de", "en"): 1}


def test_decision_stump_perfect_split(spark, tmp_path):
    # 10 cheap non-urgent + 10 expensive urgent orders: the band edge
    # between them separates perfectly -> weighted Gini 0 at $25k.
    t0 = dt.datetime(2001, 1, 1)
    rows = [(i, 1, "O", 10_000.0, t0, "5-LOW") for i in range(10)] + [
        (100 + i, 1, "O", 60_000.0, t0, "1-URGENT") for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    row = all_ops()["decision_stump_train"].fn(spark, str(tmp_path)).collect()[0]
    assert row.threshold_cents == 2_500_000
    assert (row.n_left, row.n_right) == (10, 10)
    assert row.weighted_gini == 0.0


def test_item_item_cf_support_and_cosine(spark, tmp_path):
    # A,B co-occur in 3 orders (support kept); A,C and B,C only once
    # (pruned). deg(A)=deg(B)=3 -> cosine 3/sqrt(9) = 1.0 both ways.
    ship = dt.datetime(2001, 1, 1)
    rows = [
        (1, 101), (1, 102), (1, 103),
        (2, 101), (2, 102),
        (3, 101), (3, 102),
    ]
    spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship) for (o, p) in rows],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        (r.part, r.partner): (r.n_ab, r.cosine, r.rnk)
        for r in all_ops()["item_item_cf_topk"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {(101, 102): (3, 1.0, 1), (102, 101): (3, 1.0, 1)}


def test_basket_triples_counted_once_in_canonical_order(spark, tmp_path):
    # Orders 1-3 each contain brands A,B,C -> triple (A,B,C) support 3,
    # generated exactly once per order; order 4 has only a pair.
    ship = dt.datetime(2001, 1, 1)
    li = []
    for o in (1, 2, 3):
        for i, pk in enumerate((101, 102, 103)):
            li.append((o, pk))
    li += [(4, 101), (4, 102)]
    spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship) for (o, p) in li],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(101, "tA", "A"), (102, "tB", "B"), (103, "tC", "C")],
        "p_partkey bigint, p_type string, p_brand string",
    ).write.parquet(str(tmp_path / "part.parquet"))
    got = {
        (r.brand_1, r.brand_2, r.brand_3): r.support
        for r in all_ops()["basket_triple_support"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {("A", "B", "C"): 3}


def test_business_days_excludes_weekends(spark, tmp_path):
    # 2001-01-01 is a Monday. Fri 01-05 -> Mon 01-08 spans only {Fri}
    # as a weekday in [order, ship): 1 business day though 3 calendar
    # days. Sat 01-06 -> Mon 01-08 is 0. Mon -> next Mon is 5.
    def order(ok, d):
        return (ok, 1, "O", 100.0, dt.datetime(2001, 1, d), "1-URGENT")

    spark.createDataFrame(
        [order(1, 5), order(2, 6), order(3, 1)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    ships = {1: 8, 2: 8, 3: 8}
    spark.createDataFrame(
        [
            (ok, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", dt.datetime(2001, 1, sd))
            for ok, sd in ships.items()
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    row = all_ops()["business_days_lead_time"].fn(spark, str(tmp_path)).collect()[0]
    # bdays: Fri->Mon = 1, Sat->Mon = 0, Mon->Mon = 5 -> total 6 over 3.
    assert row.n_lineitems == 3
    assert row.total_bdays == 6
    assert row.avg_bdays == 2.0


def test_cohens_kappa_hand_computed(spark, tmp_path):
    # a=2 (en pred en), c=1 (en pred other), d=1 (other pred other):
    # po = 3/4, pe_num = (a+b)(a+c) + (c+d)(b+d) = 2*3 + 2*1 = 8,
    # kappa = (4*3 - 8) / (16 - 8) = 0.5.
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "the the", "en"),
            (2, "the of", "en"),
            (3, "zz ww", "en"),
            (4, "xx yy", "fr"),
        ],
    )
    row = all_ops()["cohens_kappa_langid"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_docs == 4
    assert row.po == 0.75
    assert row.pe == 0.5
    assert row.kappa == 0.5


def test_rrf_fusion_ranks_and_micro_terms(spark, tmp_path):
    # doc 1 is pure query terms -> density rank 1; doc 3 has no query
    # terms -> absent entirely. rrf_micro must equal the half-up micro
    # sum of 1/(60+r) over the doc's present ranks.
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "hash hash hash", "en"),
            (2, "hash join aa bb cc dd", "en"),
            (3, "yy zz", "en"),
        ],
    )
    rows = all_ops()["rrf_fusion_topk"].fn(spark, str(tmp_path)).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert 3 not in by_doc
    assert by_doc[1].r_density == 1

    def term(r):
        return 0 if r is None else (2 * 1_000_000 + (60 + r)) // (2 * (60 + r))

    for r in rows:
        assert r.rrf_micro == term(r.r_bm25) + term(r.r_density)


def test_information_gain_separating_vs_useless_feature(spark, tmp_path):
    # source perfectly predicts y (en docs in src_en, others in src_xx)
    # -> IG(source) = H(y) = ln 2 for a 2/4 split... here 2 en / 2 fr
    # -> H(y) = ln 2 ~ 693147 micro-nats. All docs share the same
    # length/diversity band -> IG = 0 for both other features.
    spark.createDataFrame(
        [
            (1, "aa bb", "en", "src_en", 100),
            (2, "cc dd", "en", "src_en", 100),
            (3, "ee ff", "fr", "src_xx", 100),
            (4, "gg hh", "fr", "src_xx", 100),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.feature: r.info_gain_micro_nats
        for r in all_ops()["feature_information_gain"].fn(spark, str(tmp_path)).collect()
    }
    assert got["source"] == 693147
    assert got["length_band"] == 0
    assert got["diversity_band"] == 0


def test_ipf_row_step_hits_uniform_lang_marginal(spark, tmp_path):
    # 3 en docs (2 src_a, 1 src_b) + 1 fr doc: after the row step each
    # language's weights sum to N/L = 2, and within-lang source RATIOS
    # are preserved (2:1).
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "aa", "en"),
            (2, "bb", "en"),
            (3, "cc", "en"),
            (4, "dd", "fr"),
        ],
    )
    # _write_docs pins source='src0' for all rows; rewrite with mixed
    # sources for this test instead.
    import shutil

    shutil.rmtree(str(tmp_path / "documents.parquet"))
    spark.createDataFrame(
        [
            (1, "aa", "en", "src_a", 2),
            (2, "bb", "en", "src_a", 2),
            (3, "cc", "en", "src_b", 2),
            (4, "dd", "fr", "src_a", 2),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = all_ops()["ipf_raking_step"].fn(spark, str(tmp_path)).collect()
    w = {(r.lang, r.source): r.w for r in rows}
    # en: n_l=3, target 2 -> w = n * 4 / (2*3): src_a 2 docs -> 4/3,
    # src_b 1 doc -> 2/3. fr: 1 doc -> w = 4/(2*1) = 2.
    assert w[("en", "src_a")] == round(4 / 3, 6)
    assert w[("en", "src_b")] == round(2 / 3, 6)
    assert w[("fr", "src_a")] == 2.0
    assert abs(sum(v for (l, _), v in w.items() if l == "en") - 2.0) < 2e-6
    assert round(w[("en", "src_a")] / w[("en", "src_b")], 4) == 2.0


def test_binary_hamming_exact_distances(spark, tmp_path):
    # 3 vectors with hand-packable sign patterns across both words:
    # v1 = +,+ ; v2 = +,- ; v3 = -,- on (dim1, dim33).
    spark.createDataFrame(
        [
            (0, [1.0] + [0.0] * 31 + [1.0] + [0.0] * 31, 0),
            (1, [1.0] + [0.0] * 31 + [-1.0] + [0.0] * 31, 0),
            (2, [-1.0] + [0.0] * 31 + [-1.0] + [0.0] * 31, 0),
        ],
        "vec_id bigint, embedding array<double>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        (r.q_id, r.neighbor_id): (r.hamming, r.rnk)
        for r in all_ops()["binary_hamming_topk"].fn(spark, str(tmp_path)).collect()
    }
    # q0: v1 differs on dim33 only (1), v2 on dim1+dim33 (2).
    assert got[(0, 1)] == (1, 1)
    assert got[(0, 2)] == (2, 2)
    # q2: v1 differs on dim33 (1), v0 on both (2).
    assert got[(2, 1)] == (1, 1)
    assert got[(2, 0)] == (2, 2)


def test_qi_ladder_picks_minimal_safe_level(spark, tmp_path):
    # nation n1 has 2 customers in BUILDING (k0=2 < 5); its region r1
    # pools 5 (k1=5 -> level 1). nation n2's class alone has 5 -> level 0.
    custs = [(i, 1, "BUILDING", 100.0) for i in range(2)]
    custs += [(10 + i, 2, "BUILDING", 100.0) for i in range(3)]
    custs += [(20 + i, 3, "BUILDING", 100.0) for i in range(5)]
    spark.createDataFrame(
        custs, "c_custkey bigint, c_nationkey bigint, c_mktsegment string, c_acctbal double"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, "n1", 1), (2, "n2", 1), (3, "n3", 2)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(1, "r1"), (2, "r2")], "r_regionkey bigint, r_name string"
    ).write.parquet(str(tmp_path / "region.parquet"))
    got = {
        r.n_name: (r.k0, r.k1, r.k2, r.min_safe_level)
        for r in all_ops()["qi_generalization_ladder"].fn(spark, str(tmp_path)).collect()
    }
    assert got["n1"] == (2, 5, 10, 1)
    assert got["n2"] == (3, 5, 10, 1)
    assert got["n3"] == (5, 5, 10, 0)


def test_hypothetical_rank_counts_strictly_below(spark, tmp_path):
    spark.createDataFrame(
        [(1, 1, "B", 1000.0), (2, 1, "B", 5000.0), (3, 1, "B", 9000.0)],
        "c_custkey bigint, c_nationkey bigint, c_mktsegment string, c_acctbal double",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, "n1", 1)], "n_nationkey bigint, n_name string, n_regionkey bigint"
    ).write.parquet(str(tmp_path / "nation.parquet"))
    row = all_ops()["hypothetical_rank_of_value"].fn(spark, str(tmp_path)).collect()[0]
    # only the 1000 balance is strictly below 5000 -> rank 2 (ties at
    # the hypothetical value do not push it down).
    assert (row.n_customers, row.hypothetical_rank) == (3, 2)


def test_ucb1_scores_match_formula(spark, tmp_path):
    import math

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "A", 150.0 if i < 2 else 50.0, "{}") for i in range(4)]
    rows.append((10, t0, 2, "B", 50.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: r
        for r in all_ops()["ucb1_variant_scores"].fn(spark, str(tmp_path)).collect()
    }
    ln5_micro = round(math.log(5) * 1_000_000)
    assert got["A"].wins == 2
    assert got["A"].ucb1 == round(0.5 + math.sqrt(2.0 * ln5_micro / (1e6 * 4)), 6)
    assert got["B"].ucb1 == round(0.0 + math.sqrt(2.0 * ln5_micro / (1e6 * 1)), 6)


def test_decision_stump_weighted_gini_scale(spark, tmp_path):
    # Impure split: left band has 1 urgent among 4, right band is pure
    # (4 urgent). weighted Gini = (2*1*3/4 + 0) / 8 = 0.1875 — the
    # metric must be the [0, 0.5] impurity, not a count-scaled sum.
    t0 = dt.datetime(2001, 1, 1)
    rows = [(i, 1, "O", 10_000.0, t0, "5-LOW") for i in range(3)]
    rows += [(10, 1, "O", 10_000.0, t0, "1-URGENT")]
    rows += [(20 + i, 1, "O", 60_000.0, t0, "1-URGENT") for i in range(4)]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    row = all_ops()["decision_stump_train"].fn(spark, str(tmp_path)).collect()[0]
    assert row.threshold_cents == 2_500_000
    assert (row.n_left, row.n_right) == (4, 4)
    assert row.weighted_gini == 0.1875


def test_woe_iv_separating_bands(spark, tmp_path):
    import math

    # band 0 ($10k) all completed (5 good), band 1 ($30k) all open
    # (5 bad). With Laplace smoothing and 2 bands:
    # woe0 = round(ln(6/7)*1e6) - round(ln(1/7)*1e6), woe1 mirrored.
    t0 = dt.datetime(2001, 1, 1)
    rows = [(i, 1, "F", 10_000.0, t0, "1-URGENT") for i in range(5)]
    rows += [(10 + i, 1, "O", 30_000.0, t0, "1-URGENT") for i in range(5)]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.band: r
        for r in all_ops()["woe_iv_encoding"].fn(spark, str(tmp_path)).collect()
    }
    woe0 = round(math.log(6 / 7) * 1e6) - round(math.log(1 / 7) * 1e6)
    assert got[0].woe_micro_nats == woe0
    assert got[1].woe_micro_nats == -woe0
    assert got[0].iv_contrib > 0 and got[1].iv_contrib > 0


def test_conformal_constant_series_zero_width(spark, tmp_path):
    t0 = dt.datetime(2001, 1, 1)
    spark.createDataFrame(
        [
            (i, 1, "O", 100.0, t0 + dt.timedelta(days=i), "1-URGENT")
            for i in range(14)
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    row = all_ops()["conformal_daily_interval"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_scored_days == 7
    assert row.q95_abs_err_cents == 0.0
    assert row.n_covered == 7


def test_suppression_pools_small_cells_preserving_total(spark, tmp_path):
    # nation n1 x BUILDING has 6 (kept); n1 x AUTO has 2 and n2 x AUTO
    # has 3 (both suppressed -> pooled into one __OTHER__ cell of 5,
    # merging 2 cells). Totals are preserved exactly.
    custs = [(i, 1, "BUILDING", 1.0) for i in range(6)]
    custs += [(10 + i, 1, "AUTOMOBILE", 1.0) for i in range(2)]
    custs += [(20 + i, 2, "AUTOMOBILE", 1.0) for i in range(3)]
    spark.createDataFrame(
        custs, "c_custkey bigint, c_nationkey bigint, c_mktsegment string, c_acctbal double"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, "n1", 1), (2, "n2", 1)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    got = {
        (r.n_name, r.segment): (r.n_customers, r.n_cells_merged)
        for r in all_ops()["suppressed_release_histogram"].fn(spark, str(tmp_path)).collect()
    }
    assert got[("n1", "BUILDING")] == (6, 1)
    assert got[("__OTHER__", "__OTHER__")] == (5, 2)
    assert sum(v for (v, _) in got.values()) == 11


def test_ess_uniform_weights_equal_n(spark, tmp_path):
    # A corpus already at the uniform language marginal gets weight 1
    # everywhere -> ESS == N exactly, ess_ratio == 1.
    docs = [(i, "aa", "en", "s1", 2) for i in range(3)]
    docs += [(10 + i, "bb", "fr", "s1", 2) for i in range(3)]
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = all_ops()["ess_after_raking"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_docs == 6
    assert row.ess == 6.0
    assert row.ess_ratio == 1.0


def test_qte_reads_planted_distributional_shift(spark, tmp_path):
    # control quantities {1..4}; treated = control + 10 shift -> QTE is
    # exactly 10 at every quantile.
    ship = dt.datetime(2001, 1, 1)
    rows = [(i, 1, 1, 1, float(q), 10.0, 0.01, 0.0, "N", "O", ship)
            for i, q in enumerate([1, 2, 3, 4])]
    rows += [(10 + i, 1, 1, 1, float(q + 10), 10.0, 0.08, 0.0, "N", "O", ship)
             for i, q in enumerate([1, 2, 3, 4])]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {r.quantile: r.qte for r in all_ops()["qte_discount_quantiles"].fn(spark, str(tmp_path)).collect()}
    assert got == {0.25: 10.0, 0.5: 10.0, 0.75: 10.0}


def test_nb_macro_f1_perfect_and_missed_class(spark, tmp_path):
    # Same separable corpus as the NB test: en and fr classify
    # perfectly (F1 = 1); 'de' (one empty doc) is predicted as en ->
    # tp=0, n_act=1, n_pred(de)=0 -> F1 = 0; en's F1 dips below 1
    # because it absorbs the de doc (tp=2, n_pred=3, n_act=2 -> 0.8).
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "the cat", "en"),
            (2, "the dog", "en"),
            (3, "le chat", "fr"),
            (4, "le chien", "fr"),
            (5, "", "de"),
        ],
    )
    got = {r.lang: r.f1 for r in all_ops()["nb_macro_f1"].fn(spark, str(tmp_path)).collect()}
    assert got["fr"] == 1.0
    assert got["en"] == 0.8
    assert got["de"] == 0.0


def test_dp_noise_matches_pure_python_laplace_inverse_cdf(spark, sf_dir):
    """The Laplace noise must be the exact seeded inverse-CDF value —
    recomputed here with hashlib + math only, no Spark/DuckDB — and the
    released value must decompose as count*1e6 + noise."""
    import hashlib
    import math

    from my_polars_ai_spark.operators.classic_ml import dp_noisy_counts

    rows = dp_noisy_counts(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        h = int(hashlib.md5(f"dp:{r.n_name}".encode()).hexdigest()[:15], 16)
        u = (float(h) + 0.5) / float(2**60)
        sign = 1 if u >= 0.5 else -1
        arg = max(1.0 - 2 * abs(u - 0.5), 1e-18)
        expect = round(sign * -math.log(arg) * 1000000)
        assert r.noise_micro == expect
        assert r.noisy_count_micro == r.n_customers * 1000000 + r.noise_micro
        assert r.epsilon_micro == 1000000
    # the mechanism must actually perturb: not every cell at zero noise
    assert any(r.noise_micro != 0 for r in rows)


def test_caliper_matching_picks_nearest_and_drops_out_of_caliper(spark, tmp_path):
    """Hand-built fixture: treated A ($100.00) must match control C
    ($100.50, |d|=50c) over control B ($99.00, |d|=100c); treated D
    ($500.00) has no control within $100 and stays unmatched."""
    t0 = dt.datetime(2024, 1, 1)
    orders = [
        (1, 1, "O", 100.00, t0, "1-URGENT"),   # A
        (2, 1, "O", 99.00, t0, "5-LOW"),       # B  lead 4
        (3, 1, "O", 100.50, t0, "5-LOW"),      # C  lead 9
        (4, 1, "O", 500.00, t0, "1-URGENT"),   # D  out of caliper
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    lines = [(1, 2), (2, 4), (3, 9), (4, 30)]
    spark.createDataFrame(
        [
            (k, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", t0 + dt.timedelta(days=d))
            for k, d in lines
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    row = all_ops()["caliper_matching_att"].fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_treated, row.n_control, row.n_matched) == (2, 2, 1)
    # A(lead 2) matched to C(lead 9): ATT = 2 - 9 = -7
    assert row.att_days == -7.0
    # naive: mean(2, 30) - mean(4, 9) = 16 - 6.5 = 9.5
    assert row.naive_diff_days == 9.5
