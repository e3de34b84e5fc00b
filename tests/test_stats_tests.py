"""Known-value tests for operators/stats_tests.py.

The DuckDB oracle harness proves Spark==SQL; these prove both equal the
STATISTICS — hand-computed D/U/z/F on fixtures small enough to verify on
paper, plus an independent pure-python (hashlib) recomputation for the
hash-split leakage audit. A shared bug in the op and its oracle cannot
survive these."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest

from my_polars_ai_spark.operators import all_ops


def _write_orders(spark, tmp_path, rows):
    """rows: (orderkey, totalprice, priority[, orderdate])."""
    full = []
    for r in rows:
        k, tp, prio = r[0], r[1], r[2]
        when = r[3] if len(r) > 3 else dt.datetime(1995, 1, 1) + dt.timedelta(days=int(k))
        full.append((int(k), 1, "O", float(tp), when, prio))
    spark.createDataFrame(
        full,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))


def test_ks_known_value(spark, tmp_path):
    # urgent totals {1,2,3}, low totals {3,4,5}: D = max|F1-F2| = 2/3.
    rows = [
        (1, 1.0, "1-URGENT"),
        (2, 2.0, "1-URGENT"),
        (3, 3.0, "1-URGENT"),
        (4, 3.0, "5-LOW"),
        (5, 4.0, "5-LOW"),
        (6, 5.0, "5-LOW"),
        (7, 9.0, "3-MEDIUM"),  # other priorities must be excluded
    ]
    _write_orders(spark, tmp_path, rows)
    r = all_ops()["ks_test_priority_totals"].fn(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert (r[0].n_urgent, r[0].n_low) == (3, 3)
    assert r[0].ks_d == pytest.approx(2 / 3, abs=1e-6)


def test_mannwhitney_known_value(spark, tmp_path):
    # A = {1,2}, B = {3,4}: R1 = 3, U1 = 0, z = -2/sqrt(5/3) / ... =
    # (2*U1 - n1*n2) / (2*sigma) with sigma^2 = n1*n2*(N+1)/12 = 5/3.
    rows = [
        (1, 1.0, "1-URGENT"),
        (2, 2.0, "1-URGENT"),
        (3, 3.0, "5-LOW"),
        (4, 4.0, "5-LOW"),
    ]
    _write_orders(spark, tmp_path, rows)
    r = all_ops()["mannwhitney_priority_totals"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.n_urgent, r.n_low, r.u1_x2) == (2, 2, 0)
    assert r.z == pytest.approx(-2 / (5 / 3) ** 0.5, abs=1e-6)


def test_mannwhitney_all_tied_u(spark, tmp_path):
    # Identical samples: every comparison ties, U1 = n1*n2/2, z = 0.
    rows = [
        (1, 7.0, "1-URGENT"),
        (2, 7.0, "1-URGENT"),
        (3, 7.0, "5-LOW"),
        (4, 7.0, "5-LOW"),
    ]
    _write_orders(spark, tmp_path, rows)
    r = all_ops()["mannwhitney_priority_totals"].fn(spark, str(tmp_path)).collect()[0]
    assert r.u1_x2 == 4  # 2*U1 = n1*n2 = 4
    assert r.z is None  # sigma = 0 when ALL values tie -> z undefined


def test_anova_known_value(spark, tmp_path):
    # groups {1,2,3},{2,3,4},{3,4,5}: SSB=6 (df 2), SSW=6 (df 6) -> F=3.
    vals = {"1-URGENT": [1, 2, 3], "2-HIGH": [2, 3, 4], "3-MEDIUM": [3, 4, 5]}
    rows = [
        (10 * i + j, float(v), prio)
        for i, (prio, vs) in enumerate(vals.items())
        for j, v in enumerate(vs)
    ]
    _write_orders(spark, tmp_path, rows)
    r = all_ops()["anova_f_priority_totals"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.n_groups, r.n_rows) == (3, 9)
    assert r.f_stat == pytest.approx(3.0, abs=1e-6)


def test_brown_forsythe_equal_spread_is_zero(spark, tmp_path):
    # {1,3,5} and {11,13,15}: both groups deviate {4,0,4} (doubled) from
    # their medians -> zero between-group variance in the deviations,
    # nonzero within -> F = 0 exactly.
    rows = [
        (1, 1.0, "1-URGENT"),
        (2, 3.0, "1-URGENT"),
        (3, 5.0, "1-URGENT"),
        (4, 11.0, "5-LOW"),
        (5, 13.0, "5-LOW"),
        (6, 15.0, "5-LOW"),
    ]
    _write_orders(spark, tmp_path, rows)
    r = all_ops()["brown_forsythe_priority"].fn(spark, str(tmp_path)).collect()[0]
    assert r.f_stat == pytest.approx(0.0, abs=1e-6)


def test_acf_linear_series_is_one(spark, tmp_path):
    # One order per day with linearly increasing totals: the lagged
    # series is a perfect affine function of the original -> r = 1 at
    # every lag.
    rows = [
        (k, 100.0 + 10.0 * k, "1-URGENT", dt.datetime(1995, 1, 1) + dt.timedelta(days=k))
        for k in range(30)
    ]
    _write_orders(spark, tmp_path, rows)
    got = {r.lag: (r.n_days, r.acf)
           for r in all_ops()["acf_daily_revenue"].fn(spark, str(tmp_path)).collect()}
    assert set(got) == set(range(1, 8))
    for lag, (n_days, acf) in got.items():
        assert n_days == 30 - lag
        assert acf == pytest.approx(1.0, abs=1e-6)


def test_one_hot_row_sum_invariant(spark, sf_dir):
    rows = all_ops()["one_hot_segment_matrix"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        total = (r.seg_automobile + r.seg_building + r.seg_furniture
                 + r.seg_household + r.seg_machinery)
        assert total == r.n_customers


def test_target_encode_known_value(spark, tmp_path):
    # brand A: 2 items of 100.00 -> sum 20000 cents; brand B: 2 of
    # 200.00 -> 40000 cents. prior = 15000 cents, m = 10:
    # encA = (20000 + 10*15000)/12, encB = (40000 + 10*15000)/12.
    spark.createDataFrame(
        [(1, "Brand#A"), (2, "Brand#B")], "p_partkey bigint, p_brand string"
    ).write.parquet(str(tmp_path / "part.parquet"))
    li = [
        (1, 1, 100.0),
        (2, 1, 100.0),
        (3, 2, 200.0),
        (4, 2, 200.0),
    ]
    spark.createDataFrame(
        [(k, pk, 1, 1, 1.0, price, 0.0, 0.0, "N", "O", dt.datetime(1995, 1, 1))
         for (k, pk, price) in li],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {r.brand: r.encoded_cents
           for r in all_ops()["target_encode_brand"].fn(spark, str(tmp_path)).collect()}
    assert got["Brand#A"] == pytest.approx(170000 / 12, abs=1e-6)
    assert got["Brand#B"] == pytest.approx(190000 / 12, abs=1e-6)


def test_kfold_shares_sum_to_one(spark, sf_dir):
    rows = all_ops()["kfold_stratified_assign"].fn(spark, sf_dir).collect()
    assert rows
    by_lang: dict[str, float] = {}
    for r in rows:
        assert 0 <= r.fold < 5
        by_lang[r.lang] = by_lang.get(r.lang, 0.0) + r.fold_share
    for lang, s in by_lang.items():
        assert s == pytest.approx(1.0, abs=5e-6), lang


def test_feature_hash_total_tokens(spark, sf_dir):
    from pyspark.sql import functions as F

    from my_polars_ai_spark.sources.tables import load_table

    rows = all_ops()["feature_hash_buckets"].fn(spark, sf_dir).collect()
    assert rows and all(0 <= r.bucket < 64 for r in rows)
    d = load_table(spark, sf_dir, "documents")
    expected = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .count()
    )
    assert sum(r.n_tokens for r in rows) == expected


def test_split_leakage_matches_pure_python(spark, tmp_path):
    # Independent recomputation with hashlib: same 60-bit md5 rule, same
    # fingerprints — the op must agree exactly, including forced
    # duplicate texts that land on both sides of the split.
    texts = [f"doc text {i % 7}" for i in range(40)]  # 7 distinct, heavy dup
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    train: dict[str, int] = {}
    test: dict[str, int] = {}
    for i, t in enumerate(texts):
        fp = hashlib.md5(t.encode()).hexdigest()
        side = train if h60(f"split:{i}") % 10 < 8 else test
        side[fp] = side.get(fp, 0) + 1
    shared = set(train) & set(test)
    r = all_ops()["split_leakage_audit"].fn(spark, str(tmp_path)).collect()[0]
    assert r.n_train == sum(train.values())
    assert r.n_test == sum(test.values())
    assert r.leaked_fingerprints == len(shared)
    assert r.leaked_pairs == sum(train[f] * test[f] for f in shared)


def test_welch_t_identical_groups(spark, tmp_path):
    # Identical samples: t = 0; df = (2v)^2 / (2*v^2/2) = 4 = n1+n2-2.
    rows = [
        (1, 1.0, "1-URGENT"), (2, 2.0, "1-URGENT"), (3, 3.0, "1-URGENT"),
        (4, 1.0, "5-LOW"), (5, 2.0, "5-LOW"), (6, 3.0, "5-LOW"),
    ]
    _write_orders(spark, tmp_path, rows)
    r = all_ops()["welch_t_priority_totals"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.n_urgent, r.n_low) == (3, 3)
    assert r.t_stat == pytest.approx(0.0, abs=1e-6)
    assert r.df == pytest.approx(4.0, abs=1e-6)


def test_robust_scale_known_values(spark, tmp_path):
    # balances {0,100,200,300,400}: median 200, IQR 200 ->
    # scaled(400) = 1, scaled(0) = -1, scaled(200) = 0.
    spark.createDataFrame(
        [(i + 1, f"c{i}", 1, 100.0 * i, "BUILDING") for i in range(5)],
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    got = {r.c_custkey: r.scaled
           for r in all_ops()["robust_scale_acctbal"].fn(spark, str(tmp_path)).collect()}
    assert got[1] == pytest.approx(-1.0, abs=1e-6)
    assert got[3] == pytest.approx(0.0, abs=1e-6)
    assert got[5] == pytest.approx(1.0, abs=1e-6)


def _write_docs(spark, tmp_path, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    spark.createDataFrame(
        [(i, t, langs[i], "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))


def test_token_frequency_spectrum_known(spark, tmp_path):
    _write_docs(spark, tmp_path, ["a a b", "a c"])
    got = {r.occurrences: r.n_token_types
           for r in all_ops()["token_frequency_spectrum"].fn(spark, str(tmp_path)).collect()}
    assert got == {3: 1, 1: 2}  # a:3; b,c:1


def test_lang_sampling_temperature_known(spark, tmp_path):
    # counts en=4, de=1: p = .8/.2, sqrt-weights 2e6/1e6 -> 2/3, 1/3.
    _write_docs(spark, tmp_path, ["x"] * 5, langs=["en"] * 4 + ["de"])
    got = {r.lang: (r.p_share, r.sampled_share)
           for r in all_ops()["lang_sampling_temperature"].fn(spark, str(tmp_path)).collect()}
    assert got["en"][0] == pytest.approx(0.8, abs=1e-6)
    assert got["en"][1] == pytest.approx(2 / 3, abs=1e-6)
    assert got["de"][1] == pytest.approx(1 / 3, abs=1e-6)


def test_pack_windows_fragmentation_invariant(spark, tmp_path):
    # Two 600-token docs concat-packed into 512-token windows: tokens
    # [0,600) and [600,1200) each straddle exactly one boundary
    # regardless of which doc the shuffle puts first.
    _write_docs(spark, tmp_path, [" ".join(["t"] * 600), " ".join(["u"] * 600)])
    rows = all_ops()["pack_windows_concat"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs == 2
    assert r.n_tokens == 1200
    assert r.n_crossing_docs == 2
    assert r.total_fragments == 4
    assert r.avg_fragments == pytest.approx(2.0, abs=1e-6)


def test_bh_stepup_includes_ranks_above_last_hit(spark, sf_dir):
    """BH is step-UP: every rank at or above the deepest threshold
    crossing is significant, and the flag set must be a superset of
    Bonferroni's (rank-1 threshold IS the Bonferroni critical value)."""
    from my_polars_ai_spark.operators import all_ops

    bh = {(r.grp_a, r.grp_b): r for r in all_ops()["bh_fdr_pairwise"].fn(spark, sf_dir).collect()}
    bonf = {
        (r.grp_a, r.grp_b): r.significant
        for r in all_ops()["pairwise_proportion_tests"].fn(spark, sf_dir).collect()
    }
    sig_ranks = sorted(r.rnk for r in bh.values() if r.significant_bh)
    # contiguous prefix of ranks
    assert sig_ranks == list(range(1, len(sig_ranks) + 1))
    # superset of Bonferroni
    for pair, b in bonf.items():
        if b:
            assert bh[pair].significant_bh == 1


def test_sprt_crossing_points_hand_computed(spark, tmp_path):
    """6 straight successes cross +ln19 at index 6 (6*510826 >= 2944439);
    9 straight failures cross -ln19 at index 9; a short mixed arm never
    crosses and reports continue/NULL."""
    import datetime as dt

    from my_polars_ai_spark.operators import all_ops

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(6):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, "A", 150.0, "{}"))
    for i in range(9):
        rows.append((100 + i, t0 + dt.timedelta(minutes=i), 1, "B", 50.0, "{}"))
    rows.append((200, t0, 1, "C", 150.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: (r.crossing_index, r.decision)
        for r in all_ops()["sprt_boundary_crossing"].fn(spark, str(tmp_path)).collect()
    }
    assert got["A"] == (6, "accept_h1")
    assert got["B"] == (9, "accept_h0")
    assert got["C"] == (None, "continue")


def test_wasserstein_uniform_shift_equals_shift(spark, tmp_path):
    """A pure translation: LOW = {100, 200}, URGENT = {150, 250} (same
    shape, +$50) -> W1 must be exactly the shift, 5000 cents."""
    import datetime as dt

    from my_polars_ai_spark.operators import all_ops

    t0 = dt.datetime(2001, 1, 1)
    rows = [
        (1, 1, "O", 150.0, t0, "1-URGENT"),
        (2, 1, "O", 250.0, t0, "1-URGENT"),
        (3, 1, "O", 100.0, t0, "5-LOW"),
        (4, 1, "O", 200.0, t0, "5-LOW"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    row = all_ops()["wasserstein_1d_priority"].fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_urgent, row.n_low) == (2, 2)
    assert row.w1_cents == 5000.0


def test_poisson_bootstrap_ci_brackets_point_and_replays_draws(spark, sf_dir):
    """The 95% CI must bracket the point estimate on any non-degenerate
    sample, and the md5 inverse-CDF draw must match an independent
    hashlib recomputation (the portability contract the oracle shares)."""
    import math

    from my_polars_ai_spark.operators.stats_tests import (
        _POIS1_CDF,
        poisson_bootstrap_ci,
    )

    row = poisson_bootstrap_ci(spark, sf_dir).collect()[0]
    assert row.n_replicas == 100
    assert row.ci_lo_cents < row.mean_cents < row.ci_hi_cents
    assert row.n_orders > 0
    # replay a handful of draws in pure python
    thresholds = [float(t) for t in _POIS1_CDF]
    for b, key in ((0, 1), (57, 42), (99, 7)):
        h = int(hashlib.md5(f"pb{b}:{key}".encode()).hexdigest()[:15], 16)
        u = (float(h) + 0.5) / float(2**60)
        w = next((k for k, t in enumerate(thresholds) if u < t), 9)
        assert 0 <= w <= 9
        # weight distribution sanity: mean of Poisson(1) is 1, so the
        # thresholds must put >60% of mass on w in {0, 1}
        assert thresholds[1] > 0.7
    assert math.isclose(
        sum(math.exp(-1) / math.factorial(k) for k in range(9)),
        thresholds[8],
        rel_tol=1e-12,
    )


def test_neyman_allocation_recomputes_and_sums_to_target(spark, sf_dir):
    from fractions import Fraction

    from my_polars_ai_spark.operators.stats_tests import (
        _NEYMAN_TOTAL,
        neyman_allocation_plan,
    )

    rows = neyman_allocation_plan(spark, sf_dir).collect()
    assert len(rows) >= 2
    denom = sum(r.n_rows * r.sd_micro for r in rows)
    nn = sum(r.n_rows for r in rows)
    for r in rows:
        assert r.neyman_n >= 0 and r.proportional_n >= 0
        # exact half-up recomputation of both allocations
        for got, num in (
            (r.neyman_n, Fraction(_NEYMAN_TOTAL * r.n_rows * r.sd_micro, denom)),
            (r.proportional_n, Fraction(_NEYMAN_TOTAL * r.n_rows, nn)),
        ):
            frac = num - int(num)
            expect = int(num) + (1 if 2 * frac >= 1 else 0)
            assert got == expect
    # rounding drift is at most half a doc per stratum
    assert abs(sum(r.neyman_n for r in rows) - _NEYMAN_TOTAL) <= len(rows)
    assert abs(sum(r.proportional_n for r in rows) - _NEYMAN_TOTAL) <= len(rows)
