"""Round-10 additions: t-closeness audit (the EMD rung of the privacy
ladder), token-frequency Gini, DoReMi-shape domain excess-loss weights,
cross-source gram Jaccard, and the live streaming deployment of the
trained quality classifier."""

from __future__ import annotations

from my_polars_ai_spark.operators import all_ops


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))


def _write_customers(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "c_custkey bigint, c_nationkey int, c_mktsegment string, c_acctbal double"
    ).write.parquet(str(tmp_path / "customer.parquet"))


def test_t_closeness_exact_emd_on_constructed_classes(spark, tmp_path):
    """Three QI classes with hand-computable EMDs: an all-negative
    class and an all-high class each sit at EMD 0.5 from the 50/50
    global distribution (and violate t=0.2); a class that mirrors the
    global mix exactly sits at EMD 0 (and does not)."""
    rows = []
    k = 0
    for _ in range(4):  # class A: all negative
        rows.append((k, 1, "AUTO", -50.0)); k += 1
    for _ in range(4):  # class B: all high
        rows.append((k, 2, "BLDG", 9000.0)); k += 1
    # class C: one negative + one high = the global 50/50 mix
    rows.append((k, 3, "MACH", -50.0)); k += 1
    rows.append((k, 3, "MACH", 9000.0)); k += 1
    _write_customers(spark, tmp_path, rows)
    out = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in all_ops()["t_closeness_audit"].fn(spark, str(tmp_path)).collect()
    }
    assert len(out) == 3
    a, b, c = out[(1, "AUTO")], out[(2, "BLDG")], out[(3, "MACH")]
    assert (a.emd, a.violates_t, a.group_size) == (0.5, 1, 4)
    assert (b.emd, b.violates_t, b.group_size) == (0.5, 1, 4)
    assert (c.emd, c.violates_t, c.group_size) == (0.0, 0, 2)


def test_t_closeness_is_strictly_stronger_than_l_diversity(spark, tmp_path):
    """The motivating counterexample: a class with 2 distinct bands
    (passes l-diversity at l=2) whose mix is still far from the global
    distribution must be flagged by t-closeness."""
    rows = []
    k = 0
    # skewed class: 9 negative + 1 low -> 2 distinct bands, l-diverse
    for _ in range(9):
        rows.append((k, 1, "AUTO", -50.0)); k += 1
    rows.append((k, 1, "AUTO", 100.0)); k += 1
    # the rest of the population is all high
    for _ in range(90):
        rows.append((k, 2, "BLDG", 9000.0)); k += 1
    _write_customers(spark, tmp_path, rows)
    ld = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in all_ops()["l_diversity_audit"].fn(spark, str(tmp_path)).collect()
    }
    tc = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in all_ops()["t_closeness_audit"].fn(spark, str(tmp_path)).collect()
    }
    assert ld[(1, "AUTO")].violates_l == 0  # l-diversity passes it
    assert tc[(1, "AUTO")].violates_t == 1  # t-closeness catches it


def test_token_gini_uniform_zero_and_skew_exact(spark, tmp_path):
    """Uniform token frequencies give Gini exactly 0; the 4-token
    corpus 'a a a b' gives the hand-computed 0.25."""
    _write_docs(spark, tmp_path, [(1, "t1 t2 t3 t4", "en", "x", 11)])
    g0 = all_ops()["token_gini_concentration"].fn(spark, str(tmp_path)).collect()[0]
    assert (g0.n_vocab, g0.n_tokens, g0.gini) == (4, 4, 0.0)
    _write_docs(spark, tmp_path / "s2", [(1, "a a a b", "en", "x", 7)])
    g1 = (
        all_ops()["token_gini_concentration"]
        .fn(spark, str(tmp_path / "s2"))
        .collect()[0]
    )
    # freqs asc: b=1 (rank 1), a=3 (rank 2); G = (2*7 - 3*4) / (2*4)
    assert (g1.n_vocab, g1.n_tokens, g1.gini) == (2, 4, 0.25)


def test_domain_excess_weights_order_and_normalization(spark, tmp_path):
    """A source made of corpus-common tokens is the min-NLL domain
    (excess 0, weight 0); a source of rare tokens carries all the
    excess (weight 1). Weights sum to 1 whenever any excess exists."""
    common = " ".join(["the"] * 20)
    rare = " ".join(f"rare{i}" for i in range(20))
    _write_docs(
        spark,
        tmp_path,
        [(1, common, "en", "easy", 10), (2, rare, "en", "hard", 10)],
    )
    out = {
        r.source: r
        for r in all_ops()["domain_excess_loss_weights"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out["easy"].excess_micro == 0 and out["easy"].weight == 0.0
    assert out["hard"].excess_micro > 0 and out["hard"].weight == 1.0
    assert out["easy"].avg_nll_micro < out["hard"].avg_nll_micro


def test_domain_excess_weights_degenerate_single_source_is_null(spark, tmp_path):
    """With one domain there is no excess signal: weight must be NULL,
    not 0/0 or 1."""
    _write_docs(spark, tmp_path, [(1, "a b c", "en", "only", 5)])
    out = all_ops()["domain_excess_loss_weights"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].excess_micro == 0 and out[0].weight is None


def test_source_gram_jaccard_mirror_and_disjoint(spark, tmp_path):
    """Two sources sharing their full gram set score Jaccard 1.0; a
    disjoint third source produces no pair rows at all (the join is
    shared-gram-driven, not a cross product)."""
    text = "t1 t2 t3 t4"  # grams: t1_t2_t3, t2_t3_t4
    _write_docs(
        spark,
        tmp_path,
        [
            (1, text, "en", "a", 11),
            (2, text, "en", "b", 11),
            (3, "z1 z2 z3", "en", "c", 8),
        ],
    )
    out = all_ops()["source_gram_jaccard_matrix"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b) == ("a", "b")
    assert (r.shared_grams, r.grams_a, r.grams_b, r.jaccard) == (2, 2, 2, 1.0)


def test_audio_vad_segments_geometry(spark, sf_dir):
    """VAD islands must be well-formed: per-doc segment indices dense
    from 1, frames within the clip's 4-frame range, non-overlapping
    and ordered, each segment's energy at least n_frames * threshold,
    and every segment consistent with the frame-features table it is
    derived from (voiced frames exactly partition into segments)."""
    from my_polars_ai_spark.operators.multimodal import (
        PCM_FRAME,
        PCM_SAMPLES,
        VAD_SUMSQ,
    )

    ops = all_ops()
    segs = ops["audio_vad_segments"].fn(spark, sf_dir).collect()
    feats = ops["audio_frame_features"].fn(spark, sf_dir).collect()
    n_frames_per_clip = PCM_SAMPLES // PCM_FRAME
    voiced = {
        (r.doc_id, r.frame_idx) for r in feats if r.sum_sq >= VAD_SUMSQ
    }
    by_doc: dict[int, list] = {}
    covered = set()
    for s in segs:
        assert 0 <= s.start_frame <= s.end_frame < n_frames_per_clip
        assert s.n_frames == s.end_frame - s.start_frame + 1
        assert s.energy >= s.n_frames * VAD_SUMSQ
        for f in range(s.start_frame, s.end_frame + 1):
            assert (s.doc_id, f) in voiced
            covered.add((s.doc_id, f))
        by_doc.setdefault(s.doc_id, []).append(s)
    assert covered == voiced  # segments exactly partition voiced frames
    for doc_segs in by_doc.values():
        doc_segs.sort(key=lambda s: s.seg_idx)
        assert [s.seg_idx for s in doc_segs] == list(range(1, len(doc_segs) + 1))
        for a, b in zip(doc_segs, doc_segs[1:]):
            assert a.end_frame + 1 < b.start_frame  # maximal islands


def test_contrastive_triplets_consistent_with_dedup_pairs(spark, sf_dir):
    """Triplet geometry: every positive is a verified near-dup pair
    from `dedup_minhash_lsh` (and the anchor's BEST one), every hard
    negative scores strictly below the dedup threshold, neg ranks are
    dense from 1, and no anchor pairs itself."""
    from my_polars_ai_spark.operators.dedup import (
        MINHASH_THRESHOLD,
        TRIPLET_NEG_K,
    )

    ops = all_ops()
    trips = ops["contrastive_triplet_mining"].fn(spark, sf_dir).collect()
    assert trips, "sf0.001 corpus must yield at least one triplet"
    dup_pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ops["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    by_anchor: dict[int, list] = {}
    for t in trips:
        assert t.anchor_id not in (t.pos_id, t.neg_id) and t.pos_id != t.neg_id
        pair = (min(t.anchor_id, t.pos_id), max(t.anchor_id, t.pos_id))
        assert pair in dup_pairs and dup_pairs[pair] == t.pos_jaccard
        assert t.neg_jaccard < MINHASH_THRESHOLD
        by_anchor.setdefault(t.anchor_id, []).append(t)
    for anchor, ts in by_anchor.items():
        ts.sort(key=lambda t: t.neg_rank)
        assert [t.neg_rank for t in ts] == list(range(1, len(ts) + 1))
        assert len(ts) <= TRIPLET_NEG_K
        # one positive per anchor, and it is the anchor's best
        assert len({t.pos_id for t in ts}) == 1
        anchor_dups = [
            (j, a if b == anchor else b)
            for (a, b), j in dup_pairs.items()
            if anchor in (a, b)
        ]
        best = max(anchor_dups, key=lambda t: (t[0], -t[1]))
        assert ts[0].pos_jaccard == best[0]
        # negatives ordered hardest-first
        assert all(
            x.neg_jaccard >= y.neg_jaccard for x, y in zip(ts, ts[1:])
        )


def test_quantile_normalize_is_monotone_and_idempotent_on_pool(spark, sf_dir):
    """Quantile-map geometry: within a source the mapping is monotone
    nondecreasing in the input value, CDFs are in (0, 1], every
    normalized value exists in the pooled value domain, and the
    TOP value of each source maps to the pooled maximum (cdf 1 matches
    the pooled total exactly)."""
    rows = all_ops()["quantile_normalize_lengths"].fn(spark, sf_dir).collect()
    assert rows
    pool_values = {r.n_chars for r in rows}
    pool_max = max(pool_values)
    by_src: dict[str, list] = {}
    for r in rows:
        assert 0 < r.cdf <= 1
        assert r.normalized_chars in pool_values
        by_src.setdefault(r.source, []).append(r)
    for rs in by_src.values():
        rs.sort(key=lambda r: r.n_chars)
        for a, b in zip(rs, rs[1:]):
            assert a.normalized_chars <= b.normalized_chars
        assert rs[-1].cdf == 1.0
        assert rs[-1].normalized_chars == pool_max


def test_holt_fold_replays_the_recurrence(spark, sf_dir):
    """The JVM fold must walk exactly the integer Holt recurrence:
    replay l_t = half_away((x_t + l + b)/2), b_t = half_away((l_t - l
    + b)/2) in Python over the op's own daily inputs and require
    bit-identical levels/trends, plus forecast_next == level + trend."""

    def half_away2(v: int) -> int:
        return -((-v + 1) // 2) if v < 0 else (v + 1) // 2

    rows = sorted(
        all_ops()["holt_linear_daily_revenue"].fn(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert len(rows) > 100
    lvl = trd = None
    for r in rows:
        if lvl is None:
            lvl, trd = r.cents, 0
        else:
            new_l = half_away2(r.cents + lvl + trd)
            trd = half_away2(new_l - lvl + trd)
            lvl = new_l
        assert (r.level, r.trend) == (lvl, trd), r.day
        assert r.forecast_next == r.level + r.trend


def test_salting_plan_caps_rows_per_salt(spark, sf_dir):
    """The plan's whole point: after salting, no partition of any key
    exceeds the per-task budget; factors are minimal (factor-1 keys
    are exactly those within budget) and the needs-salt bit matches."""
    from my_polars_ai_spark.operators.extras import SALT_TARGET_ROWS

    rows = all_ops()["salting_plan"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rows_per_salt <= SALT_TARGET_ROWS
        assert r.needs_salt == (1 if r.n > SALT_TARGET_ROWS else 0)
        assert r.salt_factor >= 1
        if r.salt_factor > 1:
            # minimality: one fewer salt would blow the budget
            assert (r.n + r.salt_factor - 2) // (r.salt_factor - 1) \
                > SALT_TARGET_ROWS


def test_zonemap_prune_soundness(spark, sf_dir):
    """Zone-map identity: a file flagged can_skip has ZERO matches for
    the range predicate (skipping is sound), match counts are bounded
    by row counts, min <= max, and the flag is exactly the min/max
    comparison it claims to be."""
    from my_polars_ai_spark.operators.extras import PRUNE_HI, PRUNE_LO

    rows = all_ops()["zonemap_prune_stats"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.min_price <= r.max_price
        assert 0 <= r.n_match <= r.n_rows
        expected_skip = int(r.max_price < PRUNE_LO or r.min_price > PRUNE_HI)
        assert r.can_skip == expected_skip
        if r.can_skip:
            assert r.n_match == 0


def test_cross_shard_dup_rate_counts_the_dedup_pair_set(spark, sf_dir):
    """The feasibility report must audit exactly the verified pair set
    (n_pairs == dedup_minhash_lsh's row count), bound n_same_shard by
    it, and carry the analytic 1/S null as its comparison column."""
    ops = all_ops()
    r = ops["cross_shard_dup_rate"].fn(spark, sf_dir).collect()[0]
    n_pairs = ops["dedup_minhash_lsh"].fn(spark, sf_dir).count()
    assert r.n_pairs == n_pairs
    assert 0 <= r.n_same_shard <= r.n_pairs
    assert r.expected_same_frac == 0.125
    assert abs(r.same_shard_frac - r.n_same_shard / r.n_pairs) < 1e-6


def test_nelson_aalen_shares_km_risk_sets(spark, sf_dir):
    """NA and KM must agree on the event grid exactly (shared
    churn_week_counts definition), the cumulative hazard and variance
    must be nondecreasing, and the final all-churn week — where KM's
    survival hits 0 — must appear in NA as an ordinary d/r = 1
    increment (+1e6 micro)."""
    ops = all_ops()
    na = sorted(
        ops["nelson_aalen_hazard"].fn(spark, sf_dir).collect(),
        key=lambda r: r.week,
    )
    km = sorted(
        ops["kaplan_meier_churn"].fn(spark, sf_dir).collect(),
        key=lambda r: r.week,
    )
    assert [(r.week, r.n_churned, r.n_at_risk) for r in na] == [
        (r.week, r.n_churned, r.n_at_risk) for r in km
    ]
    for a, b in zip(na, na[1:]):
        assert b.cum_hazard_micro >= a.cum_hazard_micro
        assert b.cum_var_micro >= a.cum_var_micro
    last, prev = na[-1], na[-2]
    assert km[-1].survival_is_zero == 1 and last.n_churned == last.n_at_risk
    assert last.cum_hazard_micro - prev.cum_hazard_micro == 1_000_000


def test_stream_trained_classifier_registered_with_batch_oracle():
    ops = all_ops()
    assert "stream_trained_classifier" in ops
    assert ops["stream_trained_classifier"].oracle, (
        "the live deploy twin must carry the batch consumer's oracle"
    )


def test_stream_trained_classifier_equals_batch_twin(spark, sf_dir):
    """Train offline, serve online: the streaming scorer's output must
    equal the batch `quality_classifier_trained_scores` bit-for-bit —
    same weights, same hard-sigmoid fold, different execution engine."""
    ops = all_ops()
    live = ops["stream_trained_classifier"].fn(spark, sf_dir)
    batch = ops["quality_classifier_trained_scores"].fn(spark, sf_dir)
    assert live.exceptAll(batch).count() == 0
    assert batch.exceptAll(live).count() == 0
