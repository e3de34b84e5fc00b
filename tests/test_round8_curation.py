"""Hand-built geometry tests for the round-8 curation wave:
gopher_quality_flags (rule-attributed keep/drop), epoch_allocation_plan
(budget -> epochs under the repetition cap), ngram_novelty_score
(per-doc unique-gram fraction), quality_classifier_gd_step (integer
full-batch GD update invariants)."""

from __future__ import annotations

from my_polars_ai_spark.operators import all_ops


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))


def test_gopher_flags_attribute_each_rule(spark, tmp_path):
    """Four docs, each failing exactly the rule it was built to fail
    (plus one passing all five), so the decision table's attribution is
    pinned rule by rule."""
    # 52 varied tokens incl. 2 stopwords, mean len ~4 -> passes all.
    good = " ".join(["the", "a"] + [f"tok{i % 25}" for i in range(50)])
    short = "the a word list far too small"                 # n=7 < 50
    # 50 x the same token: distinct 1/50 < 20%, top 50/50 > 20%,
    # 0 stopwords -> fails three rules at once, word count passes.
    degenerate = " ".join(["batch"] * 50)
    # 52 tokens of length 12 -> mean word len 12 > 10.
    longwords = " ".join(["the", "a"] + ["verylongtoken"] * 50)
    rows = [
        (1, good, "en", "a", len(good)),
        (2, short, "en", "a", len(short)),
        (3, degenerate, "en", "a", len(degenerate)),
        (4, longwords, "en", "a", len(longwords)),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.doc_id: r
        for r in all_ops()["gopher_quality_flags"].fn(spark, str(tmp_path)).collect()
    }
    assert out[1].keep == 1 and all(
        getattr(out[1], f) == 1
        for f in (
            "flag_word_count",
            "flag_mean_word_len",
            "flag_stopwords",
            "flag_distinct_frac",
            "flag_top_token",
        )
    )
    assert out[2].flag_word_count == 0 and out[2].keep == 0
    assert out[3].flag_word_count == 1
    assert out[3].flag_distinct_frac == 0
    assert out[3].flag_top_token == 0
    assert out[3].flag_stopwords == 0
    assert out[3].keep == 0
    assert out[4].flag_mean_word_len == 0 and out[4].keep == 0


def test_epoch_allocation_caps_small_sources(spark, tmp_path):
    """Two sources, 10 vs 100 tokens. Budget = 3x110 = 330, equal
    target 165 each. The small source caps at 4 epochs (alloc 40,
    125 stranded); the big one takes its full target at 1.65 epochs."""
    small = " ".join(f"s{i}" for i in range(10))
    big = " ".join(f"b{i}" for i in range(100))
    rows = [(1, small, "en", "tiny", len(small)), (2, big, "en", "huge", len(big))]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.source: r
        for r in all_ops()["epoch_allocation_plan"].fn(spark, str(tmp_path)).collect()
    }
    t = out["tiny"]
    assert (t.src_tokens, t.target_tokens, t.alloc_tokens) == (10, 165, 40)
    assert (t.epochs_raw, t.epochs_eff) == (16.5, 4.0)
    assert (t.unallocated_tokens, t.capped) == (125, 1)
    h = out["huge"]
    assert (h.src_tokens, h.target_tokens, h.alloc_tokens) == (100, 165, 165)
    assert (h.epochs_raw, h.epochs_eff) == (1.65, 1.65)
    assert (h.unallocated_tokens, h.capped) == (0, 0)


def test_ngram_novelty_counts_shared_run_once_per_doc(spark, tmp_path):
    """Docs 1 and 2 share exactly one verbatim 8-token window (their
    only common gram); doc 3 is entirely unique. 16-token docs carry 9
    grams -> novelty 8/9; the 12-token unique doc is 5/5 = 1.0."""
    shared = " ".join(f"s{i}" for i in range(8))
    d1 = " ".join(f"a{i}" for i in range(8)) + " " + shared
    d2 = shared + " " + " ".join(f"b{i}" for i in range(8))
    d3 = " ".join(f"c{i}" for i in range(12))
    rows = [(1, d1, "en", "x", len(d1)), (2, d2, "en", "x", len(d2)),
            (3, d3, "en", "x", len(d3))]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.doc_id: r
        for r in all_ops()["ngram_novelty_score"].fn(spark, str(tmp_path)).collect()
    }
    for doc in (1, 2):
        assert (out[doc].n_grams, out[doc].n_novel) == (9, 8)
        assert out[doc].novelty_frac == 0.888889  # round_half_up(8/9 @ 6)
    assert (out[3].n_grams, out[3].n_novel, out[3].novelty_frac) == (5, 5, 1.0)


def test_gd_step_update_is_exact_and_directed(spark, tmp_path):
    """All-stopword docs are labeled y=1 with scores near 1/2, so every
    populated bucket's residual sum is negative and the update can only
    move weights UP; empty buckets must ship unchanged with a zero
    gradient, and the full 32-bucket weight vector must be emitted."""
    text = " ".join(["the", "a", "of", "and"] * 5)  # y=1, 20 tokens
    rows = [(i, text, "en", "x", len(text)) for i in range(1, 4)]
    _write_docs(spark, tmp_path, rows)
    out = all_ops()["quality_classifier_gd_step"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 32
    assert {r.bucket for r in out} == set(range(32))
    total_tokens = sum(r.n_tokens for r in out)
    assert total_tokens == 60  # 3 docs x 20 tokens, spine loses nothing
    for r in out:
        assert r.n_docs == 3
        assert r.w1_micro == r.w0_micro - r.delta_micro
        if r.n_tokens == 0:
            assert r.grad_micro == 0 and r.delta_micro == 0
        else:
            # y=1e6, p <= 1e6 and strictly < 1e6 here (|z| < 2e6/4
            # given 20 init weights in [-1e5, 1e5]) -> negative grad.
            assert r.grad_micro < 0
            assert r.delta_micro <= 0
            assert r.w1_micro >= r.w0_micro


def test_curation_funnel_stages_drop_the_engineered_docs(spark, tmp_path):
    """Seven docs, one engineered casualty per funnel stage: a
    quality reject, an exact-dup loser, a 2-gram-repetitive doc, the
    src0 benchmark doc itself plus a training doc sharing a trigram
    with it, and two clean survivors. Doc counts per stage are then
    fully determined: [7, 6, 5, 4, 2]."""
    def prose(prefix, k=50):
        # 50 distinct prefixed tokens + terminal "the a" stopword pair
        return " ".join([f"{prefix}{i}" for i in range(k)] + ["the", "a"])

    d1 = prose("gram")                                # survives all
    d2 = "way too short"                              # fails word count
    dup = prose("dupe")                               # d3 keeps, d4 drops
    # repetition: 46 fillers + "pp qq" x10 + stopwords -> n=68,
    # top1=10 <= 13.6 (passes Gopher) but top2 10/67 > 1/10 (fails rep)
    d5 = " ".join([f"fill{i}" for i in range(46)] + ["pp", "qq"] * 10 + ["the", "a"])
    bench = prose("bench") + " sha1 sha2 sha3"        # src0 slice itself
    d7 = prose("uniq") + " sha1 sha2 sha3"            # contaminated
    rows = [
        (1, d1, "en", "srcA", len(d1)),
        (2, d2, "en", "srcA", len(d2)),
        (3, dup, "en", "srcA", len(dup)),
        (4, dup, "en", "srcB", len(dup)),
        (5, d5, "en", "srcA", len(d5)),
        (6, bench, "en", "src0", len(bench)),
        (7, d7, "en", "srcA", len(d7)),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.stage_idx: r
        for r in all_ops()["curation_funnel_report"].fn(spark, str(tmp_path)).collect()
    }
    assert [out[k].stage for k in range(5)] == [
        "raw", "quality_rules", "exact_dedup", "repetition", "decontaminated"
    ]
    assert [out[k].n_docs for k in range(5)] == [7, 6, 5, 4, 2]
    assert out[0].pct_docs == 1.0 and out[0].pct_tokens == 1.0
    # token accounting: stage-4 tokens = the two 52-token survivors
    assert out[4].n_tokens == 104
    # monotone, never increasing
    for k in range(1, 5):
        assert out[k].n_docs <= out[k - 1].n_docs
        assert out[k].n_tokens <= out[k - 1].n_tokens


def test_minhash_calibration_identical_pair_lands_at_16_matches(spark, tmp_path):
    """Docs 4 and 12 are verbatim copies (the pair hash 'cal:4:12' is
    in the 1/16 audit sample); every other doc is token-disjoint so no
    other band collision exists. The calibration table must be exactly
    one row: 16/16 matching perms, est 1.0, exact Jaccard 1.0, zero
    error."""
    twin = " ".join(f"t{i}" for i in range(20))
    rows = [(4, twin, "en", "x", len(twin)), (12, twin, "en", "x", len(twin))]
    # band-disjoint fillers (unique vocabularies)
    for i in (30, 40):
        filler = " ".join(f"z{i}_{j}" for j in range(20))
        rows.append((i, filler, "en", "x", len(filler)))
    _write_docs(spark, tmp_path, rows)
    out = all_ops()["minhash_jaccard_calibration"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_matching_perms, r.n_pairs) == (16, 1)
    assert (r.est_jaccard, r.avg_exact_jaccard, r.avg_err) == (1.0, 1.0, 0.0)


def test_context_waste_curve_exact_small_geometry(spark, tmp_path):
    """Three docs of 10/100/300 tokens against the 128..2048 grid:
    every cell is hand-checkable integer arithmetic. At ctx=128 the
    300-token doc splits into 3 windows (84 pad) and the others pad to
    one window each (the 100-token doc FITS in 128); at ctx>=512
    nothing splits and waste is 3*ctx - 410."""
    rows = []
    for i, k in ((1, 10), (2, 100), (3, 300)):
        text = " ".join(f"t{j}" for j in range(k))
        rows.append((i, text, "en", "x", len(text)))
    _write_docs(spark, tmp_path, rows)
    out = {
        r.ctx_len: r
        for r in all_ops()["context_length_waste_curve"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {128, 256, 512, 1024, 2048}
    r128 = out[128]
    assert (r128.n_windows, r128.padded_tokens, r128.n_split_docs) == (
        5, 5 * 128 - 410, 1,  # 1 + 1 + 3 windows; only the 300-token doc splits
    )
    for ctx in (512, 1024, 2048):
        r = out[ctx]
        assert (r.n_windows, r.padded_tokens, r.n_split_docs) == (3, 3 * ctx - 410, 0)
        assert r.split_frac == 0.0
    # waste grows monotonically with ctx once nothing splits
    assert out[512].waste_ratio < out[1024].waste_ratio < out[2048].waste_ratio


def test_semdedup_sweep_agrees_with_keep_list_at_deployed_eps(spark, tmp_path):
    """The sweep row at eps = SEMDEDUP_EPS must reproduce the deployed
    keep-list's drop count exactly (same dominance relation, same
    rounding), and keep-rate must be monotone non-decreasing in eps."""
    import random

    rng = random.Random(8)
    rows = []
    for i in range(40):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, [float(x) for x in base], i % 3))
        if i % 4 == 0:  # plant near-duplicates
            rows.append(
                (100 + i, [float(x + rng.uniform(-0.01, 0.01)) for x in base], i % 3)
            )
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    ops = all_ops()
    from my_polars_ai_spark.operators.similarity import SEMDEDUP_EPS

    keep = ops["semdedup_keep_list"].fn(spark, str(tmp_path))
    n_dropped_deployed = keep.filter("kept = 0").count()
    sweep = {r.eps: r for r in
             ops["semdedup_threshold_sweep"].fn(spark, str(tmp_path)).collect()}
    assert sweep[SEMDEDUP_EPS].n_dropped == n_dropped_deployed > 0
    eps_sorted = sorted(sweep)
    rates = [sweep[e].keep_rate for e in eps_sorted]
    assert rates == sorted(rates)  # higher eps can only keep more
    for r in sweep.values():
        assert r.n_kept + r.n_dropped == r.n_kept + r.n_dropped  # schema sanity
        assert r.n_kept >= 0 and r.n_dropped >= 0


def test_gd_convergence_loss_decreases_on_separable_labels(spark, tmp_path):
    """Half the docs are all-stopword (y=1), half all-rare-token (y=0),
    in disjoint hash buckets — a separable problem where damped
    masked-subgradient descent must strictly reduce MSE each step."""
    pos = " ".join(["the", "a", "of", "and"] * 6)
    neg = " ".join([f"rare{i}" for i in range(24)])
    rows = []
    for i in range(6):
        rows.append((i, pos, "en", "x", len(pos)))
        rows.append((100 + i, neg, "en", "x", len(neg)))
    _write_docs(spark, tmp_path, rows)
    out = sorted(
        all_ops()["quality_classifier_gd_convergence"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.step,
    )
    assert [r.step for r in out] == [0, 1, 2]
    assert all(r.n_docs == 12 for r in out)
    assert out[0].mse > out[1].mse > out[2].mse
