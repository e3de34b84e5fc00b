"""Round-11 additions: the triplet export manifest (the packed
training record a contrastive loader reads) and the VAD chunker (the
bounded ASR windows cut from voiced segments)."""

from __future__ import annotations

import hashlib

from my_polars_ai_spark.operators import all_ops


def test_triplet_export_manifest_packs_the_miner_output(spark, sf_dir):
    """Manifest geometry: exactly one record per anchor; the negative
    id list is the miner's negatives comma-joined in rank order;
    n_negs, the margin (pos Jaccard minus the hardest negative's), the
    shard range, and the md5 record checksum are all consistent with
    the triplet table the manifest packs."""
    from my_polars_ai_spark.operators.base import RDZV_SHARDS

    ops = all_ops()
    trips = ops["contrastive_triplet_mining"].fn(spark, sf_dir).collect()
    manifest = ops["triplet_export_manifest"].fn(spark, sf_dir).collect()
    assert manifest, "sf0.001 corpus must yield at least one record"

    by_anchor: dict[int, list] = {}
    for t in trips:
        by_anchor.setdefault(t.anchor_id, []).append(t)
    assert len(manifest) == len(by_anchor)  # one packed record per anchor

    for m in manifest:
        ts = sorted(by_anchor[m.anchor_id], key=lambda t: t.neg_rank)
        assert m.pos_id == ts[0].pos_id
        assert m.pos_jaccard == ts[0].pos_jaccard
        assert m.n_negs == len(ts)
        expect_ids = ",".join(str(t.neg_id) for t in ts)
        assert m.neg_ids == expect_ids
        # rank 1 is the hardest negative, so the margin uses ts[0]
        assert m.margin == round(m.pos_jaccard - ts[0].neg_jaccard, 6)
        assert 0 <= m.shard < RDZV_SHARDS
        canonical = f"{m.anchor_id}|{m.pos_id}|{expect_ids}"
        assert m.record_md5 == hashlib.md5(canonical.encode()).hexdigest()


def test_audio_vad_chunks_tile_the_segments_exactly(spark, sf_dir):
    """Chunk geometry: per (doc, segment) the chunk indices are dense
    from 0, chunks tile the segment's frame range in order without
    overlap, no chunk exceeds the VAD_CHUNK_FRAMES budget, and the
    chunk frame counts and EXACT energies sum back to the segment's —
    nothing is prorated or dropped at the split."""
    from my_polars_ai_spark.operators.multimodal import VAD_CHUNK_FRAMES

    ops = all_ops()
    segs = {
        (s.doc_id, s.seg_idx): s
        for s in ops["audio_vad_segments"].fn(spark, sf_dir).collect()
    }
    chunks = ops["audio_vad_chunks"].fn(spark, sf_dir).collect()
    assert chunks

    by_seg: dict[tuple, list] = {}
    for c in chunks:
        by_seg.setdefault((c.doc_id, c.seg_idx), []).append(c)
    assert set(by_seg) == set(segs)  # every segment chunked, none invented

    for key, cs in by_seg.items():
        seg = segs[key]
        cs.sort(key=lambda c: c.chunk_idx)
        assert [c.chunk_idx for c in cs] == list(range(len(cs)))
        assert cs[0].chunk_start == seg.start_frame
        assert cs[-1].chunk_end == seg.end_frame
        for a, b in zip(cs, cs[1:]):
            assert b.chunk_start == a.chunk_end + 1  # ordered, gap-free
        for c in cs:
            assert 1 <= c.n_frames <= VAD_CHUNK_FRAMES
            assert c.n_frames == c.chunk_end - c.chunk_start + 1
        assert sum(c.n_frames for c in cs) == seg.n_frames
        assert sum(c.energy for c in cs) == seg.energy


def test_doremi_sampling_manifest_realizes_the_weights(spark, sf_dir):
    """The manifest must be consistent with the weights table it
    consumes and with its own draw contract: the weight-0 (best-NLL)
    source keeps nothing, capped sources keep everything, docs_kept
    respects the deterministic hash draw per source, achieved token
    shares sum to 1 over the kept corpus, and every uncapped source's
    kept tokens undershoot-or-meet expectation only through the draw
    (kept <= inventory)."""
    from my_polars_ai_spark.operators.dedup import portable_hash60  # noqa: F401
    from my_polars_ai_spark.operators.text import DOREMI_BUDGET_DEN

    ops = all_ops()
    weights = {
        r.source: r for r in ops["domain_excess_loss_weights"].fn(spark, sf_dir).collect()
    }
    rows = ops["doremi_sampling_manifest"].fn(spark, sf_dir).collect()
    assert rows and len(rows) == len(weights)

    total_tokens = sum(w.n_tokens for w in weights.values())
    budget = total_tokens // DOREMI_BUDGET_DEN
    kept_total = sum(r.tokens_kept for r in rows)
    assert 0 < kept_total <= total_tokens

    for r in rows:
        w = weights[r.source]
        assert r.n_tokens == w.n_tokens
        assert 0 <= r.docs_kept <= r.n_docs
        assert 0 <= r.tokens_kept <= r.n_tokens
        if w.excess_micro == 0:
            # the best-scoring source has weight 0 -> keeps nothing
            assert r.keep_prob == 0.0 and r.docs_kept == 0
        if r.capped == 1:
            # target exceeds inventory -> the whole source is kept
            assert r.keep_prob == 1.0
            assert r.docs_kept == r.n_docs and r.tokens_kept == r.n_tokens
        if r.keep_prob is not None and r.capped == 0:
            # keep_prob is the exact rational budget*excess/(tot*n)
            tot = sum(x.excess_micro for x in weights.values())
            exact = budget * w.excess_micro / (tot * w.n_tokens)
            assert abs(r.keep_prob - exact) < 1e-6

    # achieved shares audit the kept mix and sum to ~1 (per-source
    # half-up rounding at 1e-6 can drift the sum by n_sources ulps)
    ach = sum(r.achieved_weight for r in rows if r.achieved_weight is not None)
    assert abs(ach - 1.0) < 1e-4

    # deterministic: same session, same plan, same fate per doc
    again = {r.source: r.docs_kept for r in ops["doremi_sampling_manifest"].fn(spark, sf_dir).collect()}
    assert again == {r.source: r.docs_kept for r in rows}


def test_ann_index_manifest_composes_the_three_artifacts(spark, sf_dir):
    """The index record must agree with the artifact definitions it
    packs: the IVF cell matches ivf's own assignment semantics (every
    cell in range), the PQ code string is pq_adc's argmin codes in
    subspace order, maxabs_micro matches int8_quantize_embeddings, the
    shard is the deterministic hash placement, and the checksum covers
    exactly (vec_id|cell|codes|maxabs)."""
    import hashlib

    from my_polars_ai_spark.operators.base import RDZV_SHARDS
    from my_polars_ai_spark.operators.similarity import N_CELLS, PQ_K, PQ_M

    ops = all_ops()
    rows = ops["ann_index_manifest"].fn(spark, sf_dir).collect()
    assert rows

    int8 = {
        r.vec_id: r.maxabs_micro
        for r in ops["int8_quantize_embeddings"].fn(spark, sf_dir).collect()
    }
    # one record per vector, same population as the quantizer's
    assert {r.vec_id for r in rows} == set(int8)

    for r in rows:
        assert 0 <= r.cell < N_CELLS
        assert r.n_subspaces == PQ_M
        codes = [int(c) for c in r.pq_codes.split(",")]
        assert len(codes) == PQ_M and all(0 <= c < PQ_K for c in codes)
        assert r.maxabs_micro == int8[r.vec_id]
        assert 0 <= r.shard < RDZV_SHARDS
        canonical = f"{r.vec_id}|{r.cell}|{r.pq_codes}|{r.maxabs_micro}"
        assert r.record_md5 == hashlib.md5(canonical.encode()).hexdigest()


def test_curation_attributes_manifest_agrees_with_the_funnel(spark, sf_dir):
    """The per-doc attributes file must be the funnel's own rows: its
    stage_reached histogram reproduces curation_funnel_report's
    survivor counts exactly (docs AND tokens), drop_reason names the
    first failing gate consistently with the stage index (NULL iff
    kept), the benchmark slice itself is labeled benchmark_slice while
    contaminated training docs get decontamination, and the shard /
    md5 record fields follow the ship-manifest contract."""
    import hashlib

    from my_polars_ai_spark.operators.base import RDZV_SHARDS

    ops = all_ops()
    rows = ops["curation_attributes_manifest"].fn(spark, sf_dir).collect()
    assert rows

    funnel = {
        r.stage_idx: r
        for r in ops["curation_funnel_report"].fn(spark, sf_dir).collect()
    }
    # stage k of the funnel counts docs with stage_reached >= k
    for k in range(5):
        docs = sum(1 for r in rows if r.stage_reached >= k)
        toks = sum(r.n_tokens for r in rows if r.stage_reached >= k)
        assert docs == funnel[k].n_docs, f"stage {k} doc count"
        assert toks == funnel[k].n_tokens, f"stage {k} token count"

    reason_for = {
        0: "quality_rules",
        1: "exact_dedup",
        2: "repetition",
    }
    for r in rows:
        assert r.kept == (r.stage_reached == 4)
        if r.stage_reached == 4:
            assert r.drop_reason is None
        elif r.stage_reached == 3:
            assert r.drop_reason in ("benchmark_slice", "decontamination")
        else:
            assert r.drop_reason == reason_for[r.stage_reached]
        assert 0 <= r.shard < RDZV_SHARDS
        canonical = f"{r.doc_id}|{r.stage_reached}|{r.drop_reason or ''}"
        assert r.record_md5 == hashlib.md5(canonical.encode()).hexdigest()

    # the held-out slice (source src0) never survives and is labeled as
    # the slice itself, not as a contaminated training doc
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src0 = {d.doc_id for d in docs.filter("source = 'src0'").collect()}
    labeled = {r.doc_id: r.drop_reason for r in rows if r.doc_id in src0}
    assert labeled and all(
        v in ("quality_rules", "exact_dedup", "repetition", "benchmark_slice")
        for v in labeled.values()
    )
    assert any(v == "benchmark_slice" for v in labeled.values())


def test_curation_attributes_pin_the_engineered_casualties(spark, tmp_path):
    """Same engineered corpus as the funnel's stage test (one casualty
    per gate), but asserting the PER-DOC attribution: each doc gets
    exactly the drop_reason it was built to earn, the dedup loser is
    the higher doc_id, the benchmark doc is labeled as the slice
    itself (not as a contaminated training doc), and survivors carry a
    NULL reason."""

    def prose(prefix, k=50):
        return " ".join([f"{prefix}{i}" for i in range(k)] + ["the", "a"])

    d1 = prose("gram")
    d2 = "way too short"
    dup = prose("dupe")
    d5 = " ".join([f"fill{i}" for i in range(46)] + ["pp", "qq"] * 10 + ["the", "a"])
    bench = prose("bench") + " sha1 sha2 sha3"
    d7 = prose("uniq") + " sha1 sha2 sha3"
    rows = [
        (1, d1, "en", "srcA", len(d1)),
        (2, d2, "en", "srcA", len(d2)),
        (3, dup, "en", "srcA", len(dup)),
        (4, dup, "en", "srcB", len(dup)),
        (5, d5, "en", "srcA", len(d5)),
        (6, bench, "en", "src0", len(bench)),
        (7, d7, "en", "srcA", len(d7)),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {
        r.doc_id: r
        for r in all_ops()["curation_attributes_manifest"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert len(out) == 7
    assert out[1].kept and out[1].drop_reason is None
    assert out[2].drop_reason == "quality_rules" and out[2].stage_reached == 0
    # exact dedup keeps the LOWEST doc_id of the identical pair
    assert out[3].kept and out[3].drop_reason is None
    assert out[4].drop_reason == "exact_dedup" and out[4].stage_reached == 1
    assert out[5].drop_reason == "repetition" and out[5].stage_reached == 2
    assert out[6].drop_reason == "benchmark_slice" and out[6].stage_reached == 3
    assert out[7].drop_reason == "decontamination" and out[7].stage_reached == 3
    # token counts are the whitespace token counts the funnel uses
    assert out[1].n_tokens == 52 and out[2].n_tokens == 3
