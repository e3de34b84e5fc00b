"""Known-value tests for the round-5 wave-3 operators
(concurrency_duration_profile, js_divergence_sources, sql_lateral_topk)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from my_polars_ai_spark.operators import all_ops


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, user_id, ts)."""
    spark.createDataFrame(
        [(eid, ts, uid, "view", 1.0, "{}") for (eid, uid, ts) in rows],
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))


def test_concurrency_profile_known(spark, tmp_path):
    # u1 session [00:00, 00:10), u2 session [00:05, 00:15):
    # level 1 for [00:00,00:05) + [00:10,00:15) = 600s, level 2 for
    # [00:05,00:10) = 300s.
    t0 = dt.datetime(2001, 1, 1, 0, 0, 0)
    _write_events(
        spark, tmp_path,
        [(1, 1, t0), (2, 2, t0 + dt.timedelta(minutes=5))],
    )
    got = {r.concurrency: r.total_micros
           for r in all_ops()["concurrency_duration_profile"].fn(spark, str(tmp_path)).collect()}
    assert got == {1: 600_000_000, 2: 300_000_000}


def test_concurrency_profile_includes_idle_gap(spark, tmp_path):
    # Two disjoint sessions an hour apart: the gap between them is
    # level-0 time (50 min between first session end and second start).
    t0 = dt.datetime(2001, 1, 1, 0, 0, 0)
    _write_events(
        spark, tmp_path,
        [(1, 1, t0), (2, 1, t0 + dt.timedelta(minutes=60))],
    )
    got = {r.concurrency: r.total_micros
           for r in all_ops()["concurrency_duration_profile"].fn(spark, str(tmp_path)).collect()}
    assert got == {1: 1_200_000_000, 0: 3_000_000_000}


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, source)."""
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for (i, t, s) in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))


def test_js_divergence_identical_and_disjoint(spark, tmp_path):
    # srcA == srcB token distribution -> JS = 0.
    # srcA vs srcC disjoint vocab -> JS = ln 2.
    _write_docs(spark, tmp_path, [
        (1, "x y", "sA"),
        (2, "x y", "sB"),
        (3, "p q", "sC"),
    ])
    got = {(r.source_a, r.source_b): r.js_micro_nats
           for r in all_ops()["js_divergence_sources"].fn(spark, str(tmp_path)).collect()}
    assert got[("sA", "sB")] == 0
    assert got[("sA", "sC")] == pytest.approx(round(math.log(2) * 1e6), abs=2)
    assert set(got) == {("sA", "sB"), ("sA", "sC"), ("sB", "sC")}


def test_sql_lateral_topk_known(spark, tmp_path):
    spark.createDataFrame(
        [(1, "c1", 1, 0.0, "BUILDING"), (2, "c2", 1, 0.0, "BUILDING")],
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    orders = [
        (10, 1, 50.0), (11, 1, 70.0), (12, 1, 60.0),  # cust 1: top2 = 11,12
        (20, 2, 10.0),                                 # cust 2: only one
    ]
    spark.createDataFrame(
        [(k, c, "O", p, dt.datetime(1995, 1, 1), "1-URGENT") for (k, c, p) in orders],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    rows = all_ops()["sql_lateral_topk"].fn(spark, str(tmp_path)).collect()
    got = {(r.c_custkey, r.o_orderkey) for r in rows}
    assert got == {(1, 11), (1, 12), (2, 20)}


def test_sql_lateral_topk_plan_is_window_not_probe(spark, sf_dir):
    """Catalyst must decorrelate the LATERAL limit into a partitioned
    window/rank, not a nested-loop per-customer probe."""
    plan = (
        all_ops()["sql_lateral_topk"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_recall_report_consistency(spark, sf_dir):
    """Recall must equal |ann ∩ brute@k| / k computed independently from
    the two underlying ops' own outputs."""
    from my_polars_ai_spark.operators.similarity import TOP_K

    ops = all_ops()
    brute = {(r.q_id, r.neighbor_id)
             for r in ops["cosine_topk_brute"].fn(spark, sf_dir).collect()}
    ann = {(r.q_id, r.neighbor_id)
           for r in ops["ann_lsh_cosine"].fn(spark, sf_dir).collect()}
    report = {r.q_id: (r.n_hits, r.recall)
              for r in ops["ann_recall_report"].fn(spark, sf_dir).collect()}
    for q in {q for (q, _) in brute}:
        hits = len({(a, b) for (a, b) in brute if a == q} & ann)
        assert report[q][0] == hits
        assert report[q][1] == pytest.approx(hits / TOP_K, abs=1e-6)


def test_pq_distortion_nonnegative_and_complete(spark, sf_dir):
    from my_polars_ai_spark.operators.similarity import PQ_M

    rows = all_ops()["pq_distortion_report"].fn(spark, sf_dir).collect()
    assert {r.m for r in rows} == set(range(PQ_M))
    n0 = rows[0].n_vectors
    for r in rows:
        assert r.avg_d2 >= 0
        assert r.n_vectors == n0  # every subspace covers every vector


def test_pivot_multi_agg_zero_count_is_zero_not_null(spark, tmp_path):
    # No 'P'-status rows in the fixture: n_P must be 0 (not NULL) to
    # match the SQL count() contract; qty_P stays NULL (sum of nothing).
    spark.createDataFrame(
        [(1, 1, 1, 1, 2.0, 10.0, 0.0, 0.0, "N", "O", dt.datetime(1995, 1, 1)),
         (2, 1, 1, 1, 3.0, 10.0, 0.0, 0.0, "N", "F", dt.datetime(1995, 1, 1))],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    r = all_ops()["pivot_multi_agg"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.n_F, r.n_O, r.n_P) == (1, 1, 0)
    assert r.qty_P is None
    assert r.qty_F == pytest.approx(3.0)


def test_l_diversity_stricter_than_k(spark, tmp_path):
    # A group that is k-fine (size 5) but all-same sensitive band must
    # violate l-diversity while passing the size check.
    spark.createDataFrame(
        [(i, f"c{i}", 7, 100.0, "BUILDING") for i in range(5)]   # all 'low'
        + [(10 + i, f"d{i}", 8, float(v), "MACHINERY")           # mixed bands
           for i, v in enumerate([-10.0, 100.0, 9000.0])],
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    got = {(r.c_nationkey, r.c_mktsegment): (r.group_size, r.n_distinct_sensitive, r.violates_l)
           for r in all_ops()["l_diversity_audit"].fn(spark, str(tmp_path)).collect()}
    assert got[(7, "BUILDING")] == (5, 1, 1)   # uniform band leaks
    assert got[(8, "MACHINERY")] == (3, 3, 0)


def test_cohort_payback_known(spark, tmp_path):
    # One user, $3k in month 0 and $2.5k in month 2: cumulative crosses
    # the $5k/user line at month 2.
    orders = [
        (1, 1, 3000.0, dt.datetime(1995, 1, 10)),
        (2, 1, 2500.0, dt.datetime(1995, 3, 5)),
    ]
    spark.createDataFrame(
        [(k, c, "O", p, ts, "1-URGENT") for (k, c, p, ts) in orders],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    r = all_ops()["cohort_payback_month"].fn(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert (r[0].n_users, r[0].payback_month) == (1, 2)


def test_kendall_tau_perfect_and_inverse(spark, tmp_path):
    # 3 nations; revenue order == balance order -> tau_b = 1.
    spark.createDataFrame(
        [(i, f"N{i}", i) for i in range(3)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(i, f"c{i}", i, 100.0 * (i + 1), "BUILDING") for i in range(3)],
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(i, i, "F", 1000.0 * (i + 1), dt.datetime(1995, 1, 1), "1-URGENT")
         for i in range(3)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    r = all_ops()["kendall_tau_nation_metrics"].fn(spark, str(tmp_path)).collect()[0]
    assert r.n_pairs == 3
    assert r.concordant_minus_discordant == 3
    assert r.tau_b == pytest.approx(1.0, abs=1e-6)


def test_cochran_armitage_no_trend_is_zero(spark, tmp_path):
    # Equal completion rate in every scored group -> T = 0 -> z = 0.
    rows = []
    k = 0
    for prio in ("1-URGENT", "2-HIGH", "3-MEDIUM"):
        for status in ("F", "O"):
            rows.append((k, 1, status, 100.0, dt.datetime(1995, 1, 1), prio))
            k += 1
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    r = all_ops()["cochran_armitage_trend"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.n_rows, r.n_success) == (6, 3)
    assert r.z_trend == pytest.approx(0.0, abs=1e-6)


def test_pairwise_proportions_symmetric_counts(spark, sf_dir):
    rows = all_ops()["pairwise_proportion_tests"].fn(spark, sf_dir).collect()
    assert len(rows) == 10  # 5 choose 2
    for r in rows:
        assert r.grp_a < r.grp_b
        assert 0 <= r.x_a <= r.n_a and 0 <= r.x_b <= r.n_b
        if r.z is not None:
            assert (abs(r.z) > 2.807) == bool(r.significant)


def test_matryoshka_prefix_recall_bounds(spark, sf_dir):
    rows = all_ops()["matryoshka_prefix_recall"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_hits <= r.k == 3
        assert r.recall == pytest.approx(r.n_hits / 3, abs=1e-6)


def test_vs_peers_exclude_current_semantics(spark, tmp_path):
    # Day with totals {100, 200, 600} (keys 50,100,150 so the %50
    # output filter keeps them): vs_peer(600) = 600 - (100+200)/2 = 450.
    orders = [(50, 100.0), (100, 200.0), (150, 600.0), (200, 999.0)]
    spark.createDataFrame(
        [(k, 1, "O", p,
          dt.datetime(1995, 1, 1) if k != 200 else dt.datetime(1995, 2, 2),
          "1-URGENT") for (k, p) in orders],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {r.o_orderkey: r.vs_peer_avg_cents
           for r in all_ops()["vs_peers_daily"].fn(spark, str(tmp_path)).collect()}
    assert got[150] == pytest.approx(45000.0, abs=1e-4)   # cents
    assert got[50] == pytest.approx(10000 - 40000, abs=1e-4)
    assert got[200] is None  # alone on its day


def test_intra_doc_divergence_extremes(spark, tmp_path):
    # doc 1: identical halves -> JS 0. doc 2: disjoint halves -> ln 2.
    import math

    _write_docs(spark, tmp_path, [
        (1, "a b c d a b c d", "s"),
        (2, "a a b b x x y y", "s"),
    ])
    got = {r.doc_id: r.js_micro_nats
           for r in all_ops()["intra_doc_halves_divergence"].fn(spark, str(tmp_path)).collect()}
    assert got[1] == 0
    assert got[2] == pytest.approx(round(math.log(2) * 1e6), abs=2)


def test_rls_masked_view_policy(spark, sf_dir):
    rows = all_ops()["rls_masked_view"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.c_nationkey in (1, 5, 9, 13, 17, 21)
        assert len(r.name_token) == 8
        assert r.acctbal_band in ("negative", "low", "high")
    cols = set(all_ops()["rls_masked_view"].fn(spark, sf_dir).columns)
    assert "c_name" not in cols and "c_acctbal" not in cols


def test_retrieval_metrics_consistency(spark, sf_dir):
    """nDCG/MRR/P@k must agree with an independent recomputation from
    the brute-force ranking + labels."""
    import math

    from pyspark.sql import functions as F

    from my_polars_ai_spark.sources.tables import load_table

    ops = all_ops()
    labels = {r.vec_id: r.label
              for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()}
    brute = ops["cosine_topk_brute"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in brute:
        by_q.setdefault(r.q_id, []).append((r.rank, labels[r.neighbor_id]))
    got = {r.q_id: r for r in ops["retrieval_metrics_at_k"].fn(spark, sf_dir).collect()}
    idcg = sum(round(1 / math.log2(i + 2) * 1e6) for i in range(3))
    for q, ranked in by_q.items():
        rel = {rank: int(lab == labels[q]) for rank, lab in ranked}
        n_rel = sum(rel.values())
        dcg = sum(round(rel[rank] / math.log2(rank + 1) * 1e6) for rank in rel)
        first = min((rank for rank in rel if rel[rank]), default=None)
        assert got[q].n_relevant == n_rel
        assert got[q].precision_at_k == pytest.approx(n_rel / 3, abs=1e-6)
        assert got[q].mrr == pytest.approx(0.0 if first is None else 1 / first, abs=1e-6)
        assert got[q].ndcg == pytest.approx(dcg / idcg, abs=2e-6)


def test_pipe_syntax_plan_equals_classic_select(spark, sf_dir):
    """Spark 4 pipe SQL must optimize to the IDENTICAL logical plan as
    the classic SELECT (modulo expression ids) — the new surface is
    syntax, not a new execution path."""
    import re

    ops = all_ops()
    pipe = ops["sql_pipe_syntax_agg"].fn(spark, sf_dir)
    classic = spark.sql(
        "SELECT o_orderpriority, count(*) AS n_orders,"
        " round(sum(o_totalprice), 2) AS sum_price"
        " FROM orders_pipe_v WHERE o_orderstatus = 'F'"
        " GROUP BY o_orderpriority"
    )
    strip = lambda p: re.sub(r"#\d+L?", "#", p)
    p1 = strip(pipe._jdf.queryExecution().optimizedPlan().toString())
    p2 = strip(classic._jdf.queryExecution().optimizedPlan().toString())
    assert p1 == p2


def test_execute_immediate_parameter_is_value_not_text(spark, sf_dir):
    """The EXECUTE IMMEDIATE parameter must bind as a VALUE: nation 7's
    count equals the plain filter, and a hostile 'value' cannot widen
    the result (it just matches no nation)."""
    from pyspark.sql import functions as F

    from my_polars_ai_spark.sources.tables import load_table

    ops = all_ops()
    got = sum(r.n_customers
              for r in ops["sql_execute_immediate"].fn(spark, sf_dir).collect())
    expected = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") == 7
    ).count()
    assert got == expected
