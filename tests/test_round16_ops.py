"""Round-16 consumer addition: invariants the DuckDB oracle cannot
express for the audio export's loader-side integrity audit —
detector teeth (each integrity counter provably FIRES on a tampered
manifest, not just reads zero on a healthy one), the contiguity
identity that ties the seek profile to the chunk geometry, and the
zero-added-exchange plan contract over the producer."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from my_polars_ai_spark.operators import all_ops

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def audit_rows(spark, sf_dir):
    return {
        r.doc_id: r
        for r in all_ops()["audio_manifest_integrity"].fn(spark, sf_dir).collect()
    }


@pytest.fixture(scope="module")
def manifest_rows(spark, sf_dir):
    return sorted(
        all_ops()["audio_chunk_export_manifest"].fn(spark, sf_dir).collect(),
        key=lambda r: (r.doc_id, r.sample_idx),
    )


def test_integrity_matches_python_recompute(audit_rows, manifest_rows):
    """Every audit column recomputed in pure Python from the shipped
    manifest rows — the audit must describe the artifact, not a
    re-derivation of the chunker."""
    from my_polars_ai_spark.operators.multimodal import AUDIO_PAYLOAD_BYTES

    by_doc: dict[int, list] = {}
    for r in manifest_rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(audit_rows) == set(by_doc)
    for doc_id, rows in by_doc.items():
        a = audit_rows[doc_id]
        assert a.n_chunks == len(rows)
        assert a.bytes_exported == sum(r.n_bytes for r in rows)
        assert a.payload_bytes == AUDIO_PAYLOAD_BYTES
        assert abs(a.coverage - a.bytes_exported / AUDIO_PAYLOAD_BYTES) < 1e-6
        gaps = [
            rows[i].byte_start - (rows[i - 1].byte_start + rows[i - 1].n_bytes)
            for i in range(1, len(rows))
        ]
        assert a.n_oob == sum(
            1
            for r in rows
            if r.byte_start < 0 or r.byte_start + r.n_bytes > AUDIO_PAYLOAD_BYTES
        )
        assert a.n_overlaps == sum(1 for g in gaps if g < 0)
        assert a.n_ordinal_breaks == 0  # row_number-built ordinals are dense
        assert a.n_gaps == sum(1 for g in gaps if g > 0), doc_id
        assert a.seek_bytes == sum(g for g in gaps if g > 0), doc_id
        assert a.max_gap_bytes == max([g for g in gaps if g > 0], default=0)


def test_healthy_manifest_audits_clean_with_gap_teeth(audit_rows):
    """On the shipped manifest every integrity counter is zero (the
    export is sound) while the SEEK profile is non-trivial — some doc
    must show a real gap, or the gap columns are untested
    decoration."""
    assert audit_rows
    for a in audit_rows.values():
        assert a.n_oob == 0 and a.n_overlaps == 0 and a.n_ordinal_breaks == 0
        # contiguity identity: the covered span equals exported bytes
        # plus skipped bytes on a gap-only (no-overlap) manifest
        assert 0 < a.bytes_exported <= a.payload_bytes
        assert a.max_gap_bytes <= a.seek_bytes
    assert any(a.n_gaps > 0 for a in audit_rows.values())
    assert any(a.coverage < 1.0 for a in audit_rows.values())


def test_detectors_fire_on_tampered_manifest(spark):
    """The oracle can only show the detectors reading zero on healthy
    data; this is the other half — each corruption class a loader
    fears, injected into a manifest-shaped frame, must light up
    EXACTLY its own counter (stats body parameterized over the
    manifest, the `_ann_serve_topk` pattern)."""
    from my_polars_ai_spark.operators.multimodal import (
        AUDIO_PAYLOAD_BYTES,
        _audio_manifest_integrity_stats,
    )

    rows = [
        # doc 1: healthy — two contiguous chunks then a gap
        (1, 1, 0, 128),
        (1, 2, 128, 128),
        (1, 3, 384, 128),
        # doc 2: second chunk overlaps the first
        (2, 1, 0, 128),
        (2, 2, 64, 128),
        # doc 3: byte range escapes the payload
        (3, 1, AUDIO_PAYLOAD_BYTES - 64, 128),
        # doc 4: ordinal sequence broken (starts at 2, then skips)
        (4, 2, 0, 128),
        (4, 4, 256, 128),
    ]
    m = spark.createDataFrame(
        rows, "doc_id bigint, sample_idx int, byte_start long, n_bytes long"
    )
    out = {r.doc_id: r for r in _audio_manifest_integrity_stats(m).collect()}
    healthy = out[1]
    assert (healthy.n_oob, healthy.n_overlaps, healthy.n_ordinal_breaks) == (0, 0, 0)
    assert (healthy.n_gaps, healthy.seek_bytes, healthy.max_gap_bytes) == (1, 128, 128)
    assert out[2].n_overlaps == 1 and out[2].n_oob == 0
    assert out[3].n_oob == 1 and out[3].n_overlaps == 0
    assert out[4].n_ordinal_breaks == 2  # bad start AND a skip
    assert out[4].n_gaps == 1 and out[4].seek_bytes == 128


def test_integrity_plan_adds_zero_exchanges(spark, sf_dir):
    """The audit's scale contract: its lag window and final aggregate
    are both satisfied by the manifest's own doc_id partitioning, so
    the physical plan has EXACTLY as many exchanges as the producer's
    — an extra hashpartitioning means the manifest grain got
    re-shuffled. (Structural assertion against Spark's plan
    rendering; refresh on a Spark upgrade, keep the equality.)"""
    ops = all_ops()
    audit = ops["audio_manifest_integrity"].fn(spark, sf_dir)
    prod = ops["audio_chunk_export_manifest"].fn(spark, sf_dir)
    pa = audit._jdf.queryExecution().executedPlan().toString()
    pp = prod._jdf.queryExecution().executedPlan().toString()
    assert pa.count("Exchange") == pp.count("Exchange"), pa
    assert "SortMergeJoin" not in pa or "SortMergeJoin" in pp


def test_audit_round_trips_through_written_manifest(spark, sf_dir, tmp_path):
    """The ANN/classifier round-trip pattern extended to the audio
    family's audit: at 100 TB the audit runs over the WRITTEN
    manifest (a different process, shard-partitioned parquet), not
    the in-session producer chain. Write the manifest the way the
    export ships it, read it back, run the parameterized audit body
    on the read rows, and assert row-identical output against the
    registered op — the file is the contract."""
    from my_polars_ai_spark.operators.multimodal import (
        _audio_manifest_integrity_stats,
    )

    ops = all_ops()
    path = str(tmp_path / "audio_chunk_export_manifest")
    ops["audio_chunk_export_manifest"].fn(spark, sf_dir).write.partitionBy(
        "shard"
    ).parquet(path)
    read_back = spark.read.parquet(path).select(
        "doc_id", "sample_idx", "byte_start", "n_bytes"
    )
    audited = {
        r.doc_id: r for r in _audio_manifest_integrity_stats(read_back).collect()
    }
    registered = {
        r.doc_id: r
        for r in ops["audio_manifest_integrity"].fn(spark, sf_dir).collect()
    }
    assert audited == registered


_IDX_START = st.integers(min_value=1, max_value=3)
_IDX_STEP = st.integers(min_value=1, max_value=2)
# byte_start spans negative, in-payload, and past-payload (512 B) so
# every branch of the oob predicate is reachable; n_bytes >= 1 keeps
# the coverage ratio in ratio_round's non-negative contract.
_CHUNK = st.tuples(
    _IDX_STEP,
    st.integers(min_value=-100, max_value=700),
    st.integers(min_value=1, max_value=256),
)
_DOC = st.tuples(_IDX_START, st.lists(_CHUNK, min_size=1, max_size=6))


@given(docs=st.lists(_DOC, min_size=1, max_size=4))
@_SETTINGS
def test_integrity_stats_match_pure_python_on_arbitrary_manifests(spark, docs):
    """The audit body against a pure-Python reference over ARBITRARY
    manifest shapes — dense and broken ordinals, negative starts,
    past-payload ranges, overlaps and gaps in every combination — not
    just the healthy export plus four hand-picked corruptions. Mirrors
    the int8-export quantization property test: the loader-facing
    contract, independent of the DuckDB oracle's relational
    formulation."""
    from my_polars_ai_spark.operators.multimodal import (
        AUDIO_PAYLOAD_BYTES,
        _audio_manifest_integrity_stats,
    )

    rows = []
    for doc_id, (start, chunks) in enumerate(docs):
        idx = start
        for step, byte_start, n_bytes in chunks:
            rows.append((doc_id, idx, byte_start, n_bytes))
            idx += step
    m = spark.createDataFrame(
        rows, "doc_id bigint, sample_idx int, byte_start long, n_bytes long"
    )
    got = {r.doc_id: r for r in _audio_manifest_integrity_stats(m).collect()}

    assert set(got) == set(range(len(docs)))
    for doc_id in range(len(docs)):
        mine = sorted(
            ((i, bs, nb) for d, i, bs, nb in rows if d == doc_id),
            key=lambda t: t[0],
        )
        n_oob = sum(
            1 for _, bs, nb in mine if bs < 0 or bs + nb > AUDIO_PAYLOAD_BYTES
        )
        n_overlaps = n_breaks = n_gaps = seek = max_gap = 0
        prev_end = prev_idx = None
        for i, bs, nb in mine:
            if (prev_idx is None and i != 1) or (
                prev_idx is not None and i != prev_idx + 1
            ):
                n_breaks += 1
            if prev_end is not None and bs < prev_end:
                n_overlaps += 1
            if prev_end is not None and bs > prev_end:
                n_gaps += 1
                seek += bs - prev_end
                max_gap = max(max_gap, bs - prev_end)
            prev_end, prev_idx = bs + nb, i
        total = sum(nb for _, _, nb in mine)
        a = got[doc_id]
        assert (a.n_chunks, a.bytes_exported) == (len(mine), total)
        # half-up at scale 6, the ratio_round identity
        assert a.coverage == (
            (2 * 10**6 * total + AUDIO_PAYLOAD_BYTES) // (2 * AUDIO_PAYLOAD_BYTES)
        ) / 10**6
        assert (a.n_oob, a.n_overlaps, a.n_ordinal_breaks) == (
            n_oob,
            n_overlaps,
            n_breaks,
        )
        assert (a.n_gaps, a.seek_bytes, a.max_gap_bytes) == (n_gaps, seek, max_gap)


def test_oracle_nests_the_export_sql_verbatim():
    """One-definition discipline, one level up: the audit's oracle
    must embed the export's registered SQL as its `man` CTE verbatim,
    so the audited artifact and the audit cannot drift."""
    from my_polars_ai_spark.operators.multimodal import (
        _AUDIO_EXPORT_SQL,
        _AUDIO_INTEGRITY_ORACLE,
    )

    assert _AUDIO_EXPORT_SQL in _AUDIO_INTEGRITY_ORACLE
