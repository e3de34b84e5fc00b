"""Invariant tests for the near-dup graph-analytics wave — properties
the DuckDB value-hash can't express: Adamic-Adar candidates are true
non-edges with real common neighbors, BFS hop levels satisfy the
frontier recurrence, and the label-propagation vote is a plurality."""

from __future__ import annotations

from collections import defaultdict

from my_polars_ai_spark.operators.graph import (
    BLAST_HOPS,
    _edges,
    contamination_blast_radius,
    neardup_adamic_adar,
    neardup_label_consistency,
)
from my_polars_ai_spark.operators.text import benchmark_contamination


def _adj(spark, sf_dir):
    adj = defaultdict(set)
    for r in _edges(spark, sf_dir).collect():
        adj[r.src].add(r.dst)
    return adj


def test_adamic_adar_candidates_are_nonedges_with_common_neighbors(spark, sf_dir):
    adj = _adj(spark, sf_dir)
    rows = neardup_adamic_adar(spark, sf_dir).collect()
    assert rows, "corpus has near-dup clusters, closure must find candidates"
    for r in rows:
        # never an existing edge (the left-anti join has teeth)
        assert r.doc_b not in adj[r.doc_a]
        # n_common matches the recomputed middle-vertex count
        assert r.n_common == len(adj[r.doc_a] & adj[r.doc_b])
        assert r.n_common >= 1 and r.aa_micro > 0


def test_blast_radius_levels_satisfy_bfs_recurrence(spark, sf_dir):
    adj = _adj(spark, sf_dir)
    seeds = {r.doc_id for r in benchmark_contamination(spark, sf_dir).collect()}
    hops = {r.doc_id: r.hops for r in contamination_blast_radius(spark, sf_dir).collect()}
    assert {d for d, h in hops.items() if h == 0} == seeds
    for d, h in hops.items():
        assert 0 <= h <= BLAST_HOPS
        if h > 0:
            # a node at level h must have a neighbor at level h-1
            assert any(hops.get(n) == h - 1 for n in adj[d])
    # completeness at depth 1: every neighbor of a seed is reached
    for s in seeds:
        for n in adj[s]:
            assert n in hops and hops[n] <= 1


def test_label_vote_is_plurality_with_deterministic_tiebreak(spark, sf_dir):
    adj = _adj(spark, sf_dir)
    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    rows = neardup_label_consistency(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == {d for d in adj if adj[d]}
    for r in rows:
        votes = defaultdict(int)
        for n in adj[r.doc_id]:
            votes[langs[n]] += 1
        assert r.n_neighbors == sum(votes.values())
        assert r.n_agree == votes.get(r.lang, 0)
        best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert r.voted_lang == best
