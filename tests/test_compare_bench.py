"""Drift-wire semantics of tools/compare_bench.py (round 12).

The wire must fire only on apples-to-apples moves: isolated-vs-isolated
(or stable in-bench-vs-in-bench) beyond the threshold. A pairing of an
isolated min-of-5 with an untagged in-bench sample is a measurement
artifact — reported informationally, exit 0 — because that mixing is
exactly how rounds 5-11 spent a PERF.md adjudication per round on
`pq_adc_topk` / `dedup_minhash_lsh` without any plan change.
"""

import json
import subprocess
import sys
import os

TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools", "compare_bench.py")


def _run(tmp_path, old, new):
    old_p, new_p = tmp_path / "old.json", tmp_path / "new.json"
    old_p.write_text(json.dumps(old))
    new_p.write_text(json.dumps(new))
    return subprocess.run(
        [sys.executable, TOOL, str(old_p), str(new_p)],
        capture_output=True, text=True,
    )


def test_pinned_transition_does_not_fire(tmp_path):
    # old artifact predates isolation tags (the r11 shape); the new one
    # pins the bimodal query — 1.5x move, but a one-time pinned
    # transition: exit 0.
    old = {"queries": {"pq_adc_topk": 1.3, "scan": 0.5}}
    new = {"queries": {"pq_adc_topk": 2.0, "scan": 0.52},
           "isolated": ["pq_adc_topk"],
           "isolated_pinned": ["pq_adc_topk"]}
    r = _run(tmp_path, old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "pinned transition" in r.stdout
    assert "drifted beyond" not in r.stdout


def test_dynamic_top5_entrant_still_fires(tmp_path):
    # a NON-pinned query whose regression pushed it into the dynamic
    # top-5 must not ride the mixed-sample transition unflagged — the
    # membership flip is evidence its time moved
    old = {"queries": {"q": 1.0}, "isolated": [], "isolated_pinned": []}
    new = {"queries": {"q": 2.8}, "isolated": ["q"], "isolated_pinned": []}
    r = _run(tmp_path, old, new)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "mixed-sample: re-measure isolated first" in r.stdout


def test_isolated_vs_isolated_fires(tmp_path):
    old = {"queries": {"pq_adc_topk": 1.3}, "isolated": ["pq_adc_topk"]}
    new = {"queries": {"pq_adc_topk": 2.0}, "isolated": ["pq_adc_topk"]}
    r = _run(tmp_path, old, new)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "drifted beyond" in r.stdout


def test_in_bench_drift_still_fires(tmp_path):
    # a light query outside both isolation sets keeps the old strict wire
    old = {"queries": {"scan": 0.5}, "isolated": []}
    new = {"queries": {"scan": 0.9}, "isolated": []}
    r = _run(tmp_path, old, new)
    assert r.returncode == 1, r.stdout + r.stderr


def test_sub_150ms_noise_ignored(tmp_path):
    old = {"queries": {"tiny": 0.08}, "isolated": []}
    new = {"queries": {"tiny": 0.14}, "isolated": []}
    r = _run(tmp_path, old, new)
    assert r.returncode == 0, r.stdout + r.stderr


def test_driver_bench_artifact_shape(tmp_path):
    # the driver wraps bench output under "parsed"
    old = {"parsed": {"queries": {"q": 1.0}, "isolated": ["q"]}}
    new = {"queries": {"q": 1.0}, "isolated": ["q"]}
    r = _run(tmp_path, old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "1.00x" in r.stdout


def test_bench_isolated_remeasure_set_is_in_headline():
    # the pinned always-isolated queries must stay headline members,
    # else HEADLINE.index in bench.py raises at runtime
    sys.path.insert(0, os.path.dirname(TOOL).rsplit(os.sep, 1)[0])
    import bench

    src = open(bench.__file__).read()
    for name in ("dedup_minhash_lsh", "pq_adc_topk",
                 "repeated_span_excision", "repeated_span_stats",
                 "ann_index_manifest"):
        assert name in bench.HEADLINE
        assert f'"{name}",' in src


def test_uniform_ambient_shift_does_not_fire(tmp_path):
    # 12 queries all 1.30x slower (session-wide shift): the median
    # normalization cancels it — no per-query flags, but the
    # session-level guard fires because the median itself is past the
    # threshold (a global regression must not hide behind the median)
    old = {"queries": {f"q{i}": 1.0 for i in range(12)}, "isolated": []}
    new = {"queries": {f"q{i}": 1.3 for i in range(12)}, "isolated": []}
    r = _run(tmp_path, old, new)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "session-level drift" in r.stdout
    assert r.stdout.count("<-- drift") == 0


def test_outlier_against_ambient_shift_fires(tmp_path):
    # 11 queries at a 1.10x ambient shift + one at 1.60x: only the
    # outlier fires (1.60/1.10 > 1.25), the shifted majority does not
    old = {"queries": {f"q{i}": 1.0 for i in range(11)} | {"bad": 1.0},
           "isolated": []}
    new = {"queries": {f"q{i}": 1.1 for i in range(11)} | {"bad": 1.6},
           "isolated": []}
    r = _run(tmp_path, old, new)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "'bad'" in r.stdout
    assert r.stdout.count("<-- drift") == 1


def test_small_common_set_uses_raw_ratios(tmp_path):
    # below 10 common queries the median is meaningless — raw behavior
    old = {"queries": {"a": 1.0, "b": 1.0}, "isolated": []}
    new = {"queries": {"a": 1.6, "b": 1.6}, "isolated": []}
    r = _run(tmp_path, old, new)
    assert r.returncode == 1, r.stdout + r.stderr
    assert r.stdout.count("<-- drift") == 2


# ---- round-13 additions: artifact recovery + ambient corroboration ----

def test_null_parsed_artifact_recovered_from_tail(tmp_path):
    # the round-12 failure shape: driver tail-truncation ate the leading
    # "metric"/"value" keys, parsed is null — the tool must recover the
    # per-query pairs (name-filtered, dropping the half-truncated leading
    # name) instead of crashing with a TypeError
    tail = ('_q1_pricing_summary": 0.536, "tpch_q3_shipping_priority": 0.74, '
            '"dedup_minhash_lsh": 0.919, "pq_adc_topk": 1.742}, '
            '"isolated": ["dedup_minhash_lsh", "pq_adc_topk"], '
            '"isolated_pinned": ["dedup_minhash_lsh", "pq_adc_topk"], "sf": 0.1}')
    old = {"queries": {"tpch_q3_shipping_priority": 0.74,
                       "dedup_minhash_lsh": 0.9, "pq_adc_topk": 1.7},
           "isolated": ["dedup_minhash_lsh", "pq_adc_topk"]}
    new = {"n": 1, "rc": 0, "tail": tail, "parsed": None}
    r = _run(tmp_path, old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "recovered 3 queries from tail" in r.stdout  # truncated name dropped
    assert "tpch_q3_shipping_priority" in r.stdout


def test_summary_parsed_artifact_recovered_from_bench_last(tmp_path):
    # the round-13 two-line output: the driver parses the SHORT summary
    # (no queries map); the sibling BENCH_LAST.json with a matching
    # run_id supplies the full detail
    full = {"metric": "headline_queries_total_runtime", "value": 2.0,
            "queries": {"a": 1.0, "b": 1.0}, "isolated": [], "run_id": "42"}
    (tmp_path / "BENCH_LAST.json").write_text(json.dumps(full))
    old = {"queries": {"a": 1.0, "b": 1.0}, "isolated": []}
    new = {"n": 1, "rc": 0, "tail": "…",
           "parsed": {"metric": "headline_queries_total_runtime", "value": 2.0,
                      "n_queries": 2, "run_id": "42"}}
    r = _run(tmp_path, old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "recovered from BENCH_LAST.json" in r.stdout
    assert "1.00x" in r.stdout


def test_uncorroborated_session_shift_fires(tmp_path):
    # the round-12 advice blind zone: a uniform 1.2x in-bench shift
    # (below the 1.25x session threshold, so the old guard was silent)
    # with FLAT pinned isolated numbers is a code/config or composition
    # regression, not ambient — the corroboration wire must fire
    qs_old = {f"q{i}": 1.0 for i in range(12)} | {"pq_adc_topk": 2.0}
    qs_new = {f"q{i}": 1.2 for i in range(12)} | {"pq_adc_topk": 2.0}
    old = {"queries": qs_old, "isolated": ["pq_adc_topk"],
           "isolated_pinned": ["pq_adc_topk"]}
    new = {"queries": qs_new, "isolated": ["pq_adc_topk"],
           "isolated_pinned": ["pq_adc_topk"]}
    r = _run(tmp_path, old, new)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "__session_uncorroborated__" in r.stdout
    assert "NOT corroborated" in r.stdout


def test_corroborated_session_shift_passes(tmp_path):
    # same 1.2x shift, but the pinned isolated pair moved with it — a
    # true ambient machine shift; no wire fires
    qs_old = {f"q{i}": 1.0 for i in range(12)} | {"pq_adc_topk": 2.0}
    qs_new = {f"q{i}": 1.2 for i in range(12)} | {"pq_adc_topk": 2.36}
    old = {"queries": qs_old, "isolated": ["pq_adc_topk"],
           "isolated_pinned": ["pq_adc_topk"]}
    new = {"queries": qs_new, "isolated": ["pq_adc_topk"],
           "isolated_pinned": ["pq_adc_topk"]}
    r = _run(tmp_path, old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "corroborated as ambient" in r.stdout


def test_isolated_pairs_face_raw_threshold(tmp_path):
    # an isolated-vs-isolated regression must NOT hide behind the
    # in-bench ambient median: 11 light queries at 1.15x would normalize
    # a 1.30x isolated move down to ~1.13x — the raw threshold applies
    # to isolated pairs instead, and 1.30x on a pinned plan fires
    qs_old = {f"q{i}": 1.0 for i in range(11)} | {"pq_adc_topk": 2.0}
    qs_new = {f"q{i}": 1.15 for i in range(11)} | {"pq_adc_topk": 2.6}
    old = {"queries": qs_old, "isolated": ["pq_adc_topk"],
           "isolated_pinned": ["pq_adc_topk"]}
    new = {"queries": qs_new, "isolated": ["pq_adc_topk"],
           "isolated_pinned": ["pq_adc_topk"]}
    r = _run(tmp_path, old, new)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "pq_adc_topk" in r.stdout and "<-- drift" in r.stdout


def test_assume_old_isolated_applies_strict_wire(tmp_path):
    # round-12 advice: when the old artifact's numbers are KNOWN to be
    # isolated samples that merely predate the tag, --assume-old-isolated
    # backfills the tag and the strict isolated-vs-isolated wire applies
    # on the transition round instead of the informational exemption
    old = {"queries": {"pq_adc_topk": 1.3, "scan": 0.5}}
    new = {"queries": {"pq_adc_topk": 2.0, "scan": 0.52},
           "isolated": ["pq_adc_topk"], "isolated_pinned": ["pq_adc_topk"]}
    old_p, new_p = tmp_path / "old.json", tmp_path / "new.json"
    old_p.write_text(json.dumps(old))
    new_p.write_text(json.dumps(new))
    r = subprocess.run(
        [sys.executable, TOOL, str(old_p), str(new_p),
         "--assume-old-isolated=pinned"],
        capture_output=True, text=True,
    )
    assert r.returncode == 1, r.stdout + r.stderr
    assert "pinned transition" not in r.stdout
    assert "drifted beyond" in r.stdout


def test_bench_prints_summary_line_last():
    # the tail-truncation defense is an ordering contract on bench.py's
    # source: the detail json.dumps must precede the summary print.
    # Since r17 the summary DOES embed a per-query map — rounded to 2
    # decimals with a 1950-char degrade guard, so the whole line always
    # fits the driver's 2000-char tail window (the r16 judge's item 2:
    # PERF_r16 lost per-query data to tail truncation of the
    # full-precision detail line).
    src = open(os.path.join(os.path.dirname(TOOL), "..", "bench.py")).read()
    assert src.index('"queries": timings') < src.index('"n_queries"')
    assert "BENCH_LAST.json" in src
    # the degrade guard exists and bounds the summary line
    assert "1950" in src
    assert 'summary.pop("queries", None)' in src
    # cold-path visibility: the first shared-loop sample is recorded
    assert '"cold_first_iter": cold_first_iter' in src


def test_summary_parsed_artifact_without_bench_last_recovers_from_tail(tmp_path):
    # two-line era, worst case: the parsed summary has no queries map
    # AND no sibling BENCH_LAST.json survives (or its run_id mismatches)
    # — the front-truncated detail line plus the summary line sit in the
    # tail, and recovery must extract the per-query pairs from there
    # without double-counting keys from the summary line
    tail = ('minhash_lsh": 0.989, "pq_adc_topk": 2.076}, '
            '"isolated": ["dedup_minhash_lsh", "pq_adc_topk"], '
            '"isolated_pinned": ["dedup_minhash_lsh", "pq_adc_topk"], '
            '"sf": 0.1, "run_id": "7"}\n'
            '{"metric": "headline_queries_total_runtime", "value": 58.2, '
            '"unit": "sec", "sf": 0.1, "n_queries": 57, "run_id": "7", '
            '"detail": "BENCH_LAST.json"}')
    # stale sibling with a DIFFERENT run_id must be ignored
    (tmp_path / "BENCH_LAST.json").write_text(json.dumps(
        {"queries": {"pq_adc_topk": 99.0}, "run_id": "stale"}))
    old = {"queries": {"pq_adc_topk": 2.0}, "isolated": ["pq_adc_topk"],
           "isolated_pinned": ["pq_adc_topk"]}
    new = {"n": 1, "rc": 0, "tail": tail,
           "parsed": {"metric": "headline_queries_total_runtime",
                      "value": 58.2, "n_queries": 57, "run_id": "7"}}
    r = _run(tmp_path, old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "recovered 1 queries from tail" in r.stdout  # truncated name dropped
    assert "pq_adc_topk: 2.000 -> 2.076" in r.stdout    # not the stale 99.0


def test_tail_recovery_denylists_artifact_keys_without_headline():
    """When bench.HEADLINE is unimportable (valid=None), the regex
    fallback must still refuse summary keys — otherwise "sf"/"value"/
    "n_queries" become phantom queries that silently enter ratio
    comparison (r13 advice item)."""
    import importlib
    import types

    cb = importlib.import_module("tools.compare_bench")
    real = sys.modules.get("bench")
    sys.modules["bench"] = types.ModuleType("bench")  # no HEADLINE attr
    try:
        tail = ('truncated... "tpch_q1_pricing_summary": 0.41, '
                '"dedup_minhash_lsh": 0.87}, "sf": 0.1, "value": 50.603, '
                '"n_queries": 57, "rc": 0}')
        rec = cb._recover_from_tail(tail)
    finally:
        if real is not None:
            sys.modules["bench"] = real
        else:
            sys.modules.pop("bench", None)
    assert rec is not None
    assert set(rec["queries"]) == {"tpch_q1_pricing_summary",
                                   "dedup_minhash_lsh"}


def test_corroborated_ambient_normalizes_isolated_pairs(tmp_path):
    """A pinned isolated pair that tracks a corroborated ambient shift
    (plus >0.15s delta) must not fire the drift wire while the session
    is simultaneously reported ambient (r13 advice item): during a
    corroborated shift, isolated pairs are normalized by the OTHER
    pinned pairs' median (leave-one-out) instead of facing raw
    ratios. Three pinned pairs all riding the same machine shift
    cancel each other out."""
    light_old = {f"q{i}": 1.0 for i in range(12)}
    light_new = {f"q{i}": 1.15 for i in range(12)}  # ambient band shift
    pins = ["pq_adc_topk", "repeated_span_stats", "dedup_minhash_lsh"]
    old = {"queries": dict(light_old, pq_adc_topk=1.4,
                           repeated_span_stats=2.0, dedup_minhash_lsh=1.0),
           "isolated": pins, "isolated_pinned": pins}
    new = {"queries": dict(light_new, pq_adc_topk=1.82,   # 1.30x raw
                           repeated_span_stats=2.56,      # 1.28x raw
                           dedup_minhash_lsh=1.15),       # 1.15x raw
           "isolated": pins, "isolated_pinned": pins}
    r = _run(tmp_path, old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "corroborated as ambient" in r.stdout
    assert "inside the corroborated ambient band" in r.stdout
    assert "drifted beyond" not in r.stdout


def test_isolated_outlier_fires_even_during_corroborated_shift(tmp_path):
    """The normalization must not become a loophole: an isolated move
    far beyond the pinned population's own shift is a real plan change
    and still fires during a corroborated ambient session."""
    light_old = {f"q{i}": 1.0 for i in range(12)}
    light_new = {f"q{i}": 1.15 for i in range(12)}
    old = {"queries": dict(light_old, pq_adc_topk=1.4, ann_index_manifest=1.0),
           "isolated": ["pq_adc_topk", "ann_index_manifest"],
           "isolated_pinned": ["pq_adc_topk"]}
    new = {"queries": dict(light_new, pq_adc_topk=1.61,  # 1.15x, tracks shift
                           ann_index_manifest=1.9),       # 1.9x raw, 1.65x norm
           "isolated": ["pq_adc_topk", "ann_index_manifest"],
           "isolated_pinned": ["pq_adc_topk"]}
    r = _run(tmp_path, old, new)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "ann_index_manifest" in r.stdout and "drifted beyond" in r.stdout


def test_summary_parsed_artifact_recovers_from_run_archive(tmp_path):
    """BENCH_LAST.json holds only the LATEST run, so a newer local
    bench overwrites the detail that recovers the previous round's
    summary-parsed driver artifact (observed live in round 14). The
    per-run_id archive under cache/bench_runs/ is checked by run_id
    before the partial tail fallback."""
    detail = {"metric": "headline_queries_total_runtime", "value": 1.5,
              "queries": {"q_a": 1.0, "q_b": 0.5}, "isolated": [],
              "isolated_pinned": [], "run_id": "424242"}
    runs = tmp_path / "cache" / "bench_runs"
    runs.mkdir(parents=True)
    (runs / "424242.json").write_text(json.dumps(detail))
    # a NEWER run owns BENCH_LAST — run_id does not match the artifact
    (tmp_path / "BENCH_LAST.json").write_text(
        json.dumps(dict(detail, run_id="999999",
                        queries={"q_a": 9.0, "q_b": 9.0})))
    old = {"parsed": {"metric": "headline_queries_total_runtime",
                      "value": 1.5, "n_queries": 2, "run_id": "424242"},
           "tail": "truncated beyond recovery"}
    new = {"queries": {"q_a": 1.05, "q_b": 0.52}}
    old_p, new_p = tmp_path / "old.json", tmp_path / "new.json"
    old_p.write_text(json.dumps(old))
    new_p.write_text(json.dumps(new))
    r = subprocess.run([sys.executable, TOOL, str(old_p), str(new_p)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "recovered from the bench_runs archive" in r.stdout
    # the archive's numbers (1.0/0.5), not BENCH_LAST's stale 9.0s
    assert "q_a: 1.000 -> 1.050" in r.stdout
