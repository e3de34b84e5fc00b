"""Round-14 consumer additions: invariants the DuckDB oracle cannot
express for the three new ship/audit ops — conservation (the cell
audit partitions the corpus exactly), artifact identity (the weights
manifest fingerprints the SAME model the streaming deploy freezes),
and byte-geometry soundness (the int8 export's shard files are
gap-free, contiguous and co-sharded with the ANN index)."""

from __future__ import annotations

import hashlib

from my_polars_ai_spark.operators import all_ops


def test_ann_cell_balance_partitions_the_corpus_exactly(spark, sf_dir):
    ops = all_ops()
    rows = ops["ann_cell_balance_stats"].fn(spark, sf_dir).collect()
    manifest = ops["ann_index_manifest"].fn(spark, sf_dir)
    total = manifest.count()
    # conservation: the per-cell counts sum to the manifest record
    # count (every shipped vector audited exactly once)...
    assert sum(r.n_vectors for r in rows) == total
    # ...over exactly the manifest's cells, each counted once
    cells = [r.cell for r in rows]
    assert len(cells) == len(set(cells))
    assert set(cells) == {
        r.cell for r in manifest.select("cell").distinct().collect()
    }
    # skew is against uniform: the UNWEIGHTED mean over cells
    # telescopes to (N_CELLS/total)*sum(n_i)/n_cells = 1 exactly in
    # the unrounded rational when every cell is populated; per-cell
    # half-up rounding at 1e-6 leaves it within an ulp. The
    # count-WEIGHTED mean is the imbalance index sum(n_i^2)*C/total^2,
    # >= 1 by Cauchy-Schwarz with equality only at perfect balance —
    # assert the bound, not equality
    from my_polars_ai_spark.operators.similarity import N_CELLS

    assert len(rows) == N_CELLS  # every cell populated at this SF
    unweighted = sum(r.skew_x_uniform for r in rows) / len(rows)
    assert abs(unweighted - 1.0) < 1e-4
    weighted = sum(r.skew_x_uniform * r.n_vectors for r in rows) / total
    assert weighted >= 1.0 - 1e-6
    # the hot flag is exactly the documented cross-multiplied predicate
    for r in rows:
        assert r.is_hot == int(r.n_vectors * N_CELLS > 2 * total)


def test_qgd_weights_manifest_fingerprints_the_trained_model(spark, sf_dir):
    from my_polars_ai_spark.operators.classic_ml import (
        QGD_DIM,
        qgd_train_artifacts,
    )

    ops = all_ops()
    rows = ops["qgd_weights_manifest"].fn(spark, sf_dir).collect()
    # one record per hash bucket, no gaps — a loader indexes by b
    assert len(rows) == QGD_DIM
    assert sorted(r.b for r in rows) == list(range(QGD_DIM))
    # the shipped weights ARE the trainer's weights (same artifact the
    # streaming deploy freezes — no second training definition)
    _, _, w = qgd_train_artifacts(spark, sf_dir)
    trained = {r.b: r.w for r in w.collect()}
    assert {r.b: r.w_micro for r in rows} == trained
    # every row carries the SAME model fingerprint, and it is the md5
    # of the b-ordered weight vector (recomputed here from scratch)
    fps = {r.model_md5 for r in rows}
    assert len(fps) == 1
    expected = hashlib.md5(
        ",".join(f"{b}:{trained[b]}" for b in sorted(trained)).encode()
    ).hexdigest()
    assert fps == {expected}
    # record checksums bind (b, w) per row
    for r in rows:
        assert (
            r.record_md5
            == hashlib.md5(f"qgdw:{r.b}|{r.w_micro}".encode()).hexdigest()
        )


def test_int8_export_byte_ranges_are_contiguous_and_co_sharded(spark, sf_dir):
    ops = all_ops()
    rows = ops["int8_vector_export_manifest"].fn(spark, sf_dir).collect()
    # byte geometry: within each shard file, ordinals are 1..n and the
    # records tile the file — record k starts exactly where k-1 ended
    # (a loader can seek blind; a gap or overlap corrupts every read
    # after it)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, recs in by_shard.items():
        recs.sort(key=lambda r: r.export_ordinal)
        assert [r.export_ordinal for r in recs] == list(
            range(1, len(recs) + 1)
        ), shard
        offset = 0
        for r in recs:
            assert r.byte_start == offset, (shard, r.vec_id)
            assert r.n_bytes > 8  # dims + 8-byte maxabs header
            offset += r.n_bytes
    # co-sharding: the rerank store lands on the SAME shard as the ANN
    # index record for every vector ('vec:' rendezvous salt shared) —
    # a serve node's probe and its rerank reads are both local
    ann_shards = {
        r.vec_id: r.shard
        for r in ops["ann_index_manifest"].fn(spark, sf_dir)
        .select("vec_id", "shard")
        .collect()
    }
    for r in rows:
        assert r.shard == ann_shards[r.vec_id], r.vec_id


def test_cell_balance_audit_over_the_written_manifest(spark, sf_dir, tmp_path):
    """The audit's 100 TB story is that it runs on the WRITTEN
    (shard, cell)-partitioned manifest parquet, where its group-by
    keys are the partition keys (partition-local counting). Pin that
    the same audit computed from the read-back parquet equals the
    registered op's output — the in-session frame is a bench-scale
    convenience, the file is the contract (the serve-side twin of
    test_ann_serve_round_trips_through_written_manifest)."""
    from pyspark.sql import functions as F

    from my_polars_ai_spark.operators.base import ratio_round
    from my_polars_ai_spark.operators.similarity import N_CELLS

    ops = all_ops()
    manifest = ops["ann_index_manifest"].fn(spark, sf_dir)
    path = str(tmp_path / "ann_manifest_for_audit")
    manifest.write.partitionBy("shard", "cell").parquet(path)

    read_back = spark.read.parquet(path)
    counts = read_back.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    tot = counts.agg(F.sum("n_vectors").cast("long").alias("total"))
    audited_rt = sorted(
        map(
            tuple,
            counts.crossJoin(F.broadcast(tot))
            .select(
                F.col("cell").cast("int").alias("cell"),
                "n_vectors",
                ratio_round(
                    F.col("n_vectors").cast("decimal(38,0)") * N_CELLS,
                    F.col("total"),
                ).alias("skew_x_uniform"),
                (F.col("n_vectors") * N_CELLS > 2 * F.col("total"))
                .cast("int")
                .alias("is_hot"),
            )
            .collect(),
        )
    )
    audited_mem = sorted(
        map(tuple, ops["ann_cell_balance_stats"].fn(spark, sf_dir).collect())
    )
    assert audited_rt == audited_mem
    assert audited_mem, "audit must return rows at sf0.001"


def test_probe_recall_curve_is_monotone_and_agrees_with_ivf_topk(spark, sf_dir):
    """The curve's invariants the oracle hash cannot articulate: recall
    is NON-DECREASING in probe depth (candidates at depth p are a
    superset of depth p-1 — a decrease means the fan-out or ranking is
    wrong), and the deepest point of the curve must agree with the
    standalone `ivf_cosine_topk` (same N_PROBE cells, same ranking):
    the curve is those ops' tuning generalization, not a rival
    definition."""
    from my_polars_ai_spark.operators.similarity import N_PROBE, TOP_K

    ops = all_ops()
    rows = sorted(
        ops["ivf_probe_recall_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r.probe_depth,
    )
    assert [r.probe_depth for r in rows] == list(range(1, N_PROBE + 1))
    recalls = [r.recall for r in rows]
    assert recalls == sorted(recalls), recalls
    assert all(r.n_truth == rows[0].n_truth for r in rows)
    # depth-N_PROBE hits == |ivf_cosine_topk ∩ brute| recomputed raw
    brute = {
        (r.q_id, r.neighbor_id)
        for r in ops["cosine_topk_brute"].fn(spark, sf_dir).collect()
    }
    ivf = {
        (r.q_id, r.neighbor_id)
        for r in ops["ivf_cosine_topk"].fn(spark, sf_dir).collect()
    }
    assert rows[-1].n_hits == len(brute & ivf)
    assert rows[0].n_truth == len(brute)
    assert len(brute) > 0 and rows[-1].n_hits <= rows[0].n_truth
