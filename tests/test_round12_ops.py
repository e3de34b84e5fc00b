"""Round-12 additions: the ANN serve step (queries against the packed
index manifest) and the audio chunk export manifest (byte-addressed
export records for VAD chunks)."""

from __future__ import annotations

import hashlib

from my_polars_ai_spark.operators import all_ops


def test_ann_manifest_query_topk_serves_from_the_index(spark, sf_dir):
    """Serve geometry: per query the ranks are dense from 1 and ordered
    by descending cosine (neighbor-id tiebreak), every returned
    neighbor's MANIFEST cell lies in the query's N_PROBE probed cells
    (the IVF routing contract — a neighbor outside the probed cells
    would mean the serve path ignored the index), no self-matches, and
    every reported cosine equals the brute-force cosine recomputed from
    the raw embeddings (the exact-rerank contract)."""
    from pyspark.sql import functions as F

    from my_polars_ai_spark.operators.similarity import (
        N_PROBE,
        N_QUERIES,
        ROUND_RATIO,
        TOP_K,
        _ivf_ranked_cells,
    )

    ops = all_ops()
    rows = ops["ann_manifest_query_topk"].fn(spark, sf_dir).collect()
    assert rows, "sf0.001 corpus must yield results"

    cells = {
        r.vec_id: r.cell
        for r in ops["ann_index_manifest"].fn(spark, sf_dir).select("vec_id", "cell").collect()
    }
    corpus, ranked_cells = _ivf_ranked_cells(spark, sf_dir)
    probed = {
        r.q_id: set(r.cells)
        for r in corpus.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.slice(ranked_cells, 1, N_PROBE)["cell"].alias("cells"),
        )
        .collect()
    }
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in corpus.sparkSession.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }

    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        # rank is assigned over RAW cosine (id tiebreak), the output
        # column is rounded — so only cos monotonicity is assertable
        # here: two rounded-equal neighbors may sit in raw-cos order,
        # not id order
        for a, b in zip(rs, rs[1:]):
            assert a.cos >= b.cos
        for r in rs:
            assert r.neighbor_id != q_id
            assert cells[r.neighbor_id] in probed[q_id], (
                f"neighbor {r.neighbor_id} (cell {cells[r.neighbor_id]}) "
                f"outside query {q_id}'s probed cells {probed[q_id]}"
            )
            qv, nv = vecs[q_id], vecs[r.neighbor_id]
            dot = sum(x * y for x, y in zip(qv, nv))
            nq = sum(x * x for x in qv) ** 0.5
            nn = sum(x * x for x in nv) ** 0.5
            assert r.cos == round(dot / (nq * nn), ROUND_RATIO)


def test_audio_chunk_export_manifest_slices_the_payload(spark, sf_dir):
    """Export geometry: one record per chunk with pass-through bounds
    and energy; sample_idx dense from 1 per doc in chunk_start order;
    the byte range follows the PCM16-LE frame geometry; the shard is in
    range and the md5 record checksum matches. End-to-end: re-deriving
    the samples the byte range addresses (the md5 PCM rule) and summing
    their squares reproduces the record's EXACT energy — the byte range
    really does slice the chunk's audio out of the payload."""
    from my_polars_ai_spark.operators.base import RDZV_SHARDS
    from my_polars_ai_spark.operators.multimodal import (
        PCM_BYTES_PER_SAMPLE,
        PCM_FRAME,
    )

    ops = all_ops()
    chunks = {
        (c.doc_id, c.seg_idx, c.chunk_idx): c
        for c in ops["audio_vad_chunks"].fn(spark, sf_dir).collect()
    }
    manifest = ops["audio_chunk_export_manifest"].fn(spark, sf_dir).collect()
    assert len(manifest) == len(chunks)

    by_doc: dict[int, list] = {}
    for m in manifest:
        by_doc.setdefault(m.doc_id, []).append(m)
    for doc_id, ms in by_doc.items():
        ms.sort(key=lambda m: m.chunk_start)
        assert [m.sample_idx for m in ms] == list(range(1, len(ms) + 1))

    bytes_per_frame = PCM_FRAME * PCM_BYTES_PER_SAMPLE
    for m in manifest[:25]:
        c = chunks[(m.doc_id, m.seg_idx, m.chunk_idx)]
        assert (m.chunk_start, m.chunk_end, m.n_frames, m.energy) == (
            c.chunk_start,
            c.chunk_end,
            c.n_frames,
            c.energy,
        )
        assert m.byte_start == m.chunk_start * bytes_per_frame
        assert m.n_bytes == m.n_frames * bytes_per_frame
        assert 0 <= m.shard < RDZV_SHARDS
        canonical = (
            f"{m.doc_id}|{m.seg_idx}|{m.chunk_idx}|{m.chunk_start}|"
            f"{m.chunk_end}|{m.n_frames}|{m.energy}"
        )
        assert m.record_md5 == hashlib.md5(canonical.encode()).hexdigest()
        # the byte range addresses samples [byte_start/2, ...): re-derive
        # them with the synth rule and check the energy to the bit
        s0 = m.byte_start // PCM_BYTES_PER_SAMPLE
        n_samples = m.n_bytes // PCM_BYTES_PER_SAMPLE
        energy = 0
        for i in range(s0, s0 + n_samples):
            h = hashlib.md5(f"pcm:{m.doc_id}:{i}".encode()).hexdigest()
            smp = (int(h[:15], 16) % 65536) - 32768
            energy += smp * smp
        assert energy == m.energy
