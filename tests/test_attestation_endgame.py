"""The post-R13 attestation endgame contract (round-12 groundwork):
tools/attestation_status.py --endgame asserts full-registry driver
coverage with the sketch trio as the only sanctioned non-green rows,
then reports freshness (the oldest driver round) as the headline."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.attestation_status import ROWS_ONLY_BY_DESIGN, endgame_check


OPS = ["a", "b", "approx_distinct", "c"]


def test_endgame_happy_path_reports_freshness():
    latest = {"a": 3, "b": 7, "approx_distinct": 13, "c": 3}
    green = {"a": True, "b": True, "approx_distinct": False, "c": True}
    ok, report = endgame_check(OPS, latest, green, set())
    assert ok
    assert "full-registry attested; oldest row: r3" in report
    assert "a" in report and "c" in report  # the r3 holders are named


def test_endgame_rejects_red_outside_sketch_trio():
    latest = {"a": 3, "b": 7, "approx_distinct": 13, "c": 3}
    green = {"a": True, "b": False, "approx_distinct": False, "c": True}
    ok, report = endgame_check(OPS, latest, green, set())
    assert not ok
    assert "b" in report


def test_endgame_rejects_missing_and_pending():
    latest = {"a": 3, "b": 7, "approx_distinct": 13}
    green = {"a": True, "b": True, "approx_distinct": False}
    ok, report = endgame_check(OPS, latest, green, set())
    assert not ok and "never attested" in report
    latest["c"] = 3
    green["c"] = True
    ok, report = endgame_check(OPS, latest, green, {"c"})
    assert not ok and "staged window" in report


def test_sketch_trio_is_the_documented_set():
    assert ROWS_ONLY_BY_DESIGN == {
        "approx_distinct",
        "approx_quantiles",
        "kmeans_segments",
    }


def test_correctness_files_sort_by_round_number():
    # r100 must process AFTER r99 so the latest verdict wins (the
    # lexicographic hazard: "r100" < "r99" as strings)
    from tools.attestation_status import round_of

    files = ["CORRECTNESS_r100.json", "CORRECTNESS_r99.json",
             "CORRECTNESS_r02.json", "CORRECTNESS_r13.json"]
    assert sorted(files, key=round_of) == [
        "CORRECTNESS_r02.json", "CORRECTNESS_r13.json",
        "CORRECTNESS_r99.json", "CORRECTNESS_r100.json",
    ]


def test_r13_window_is_sufficient_for_endgame():
    """Simulate the R13 driver rows landing on the REAL ledger: overlay
    the live window as green (the sketch trio as its sanctioned
    rows-only non-green) onto the actual CORRECTNESS files and assert
    endgame_check passes — i.e., no registry op outside the R13 window
    is still missing a driver row. If someone registers an op without a
    staged slot, or drops a never-attested name from the window, this
    fails before the driver does."""
    import glob
    import json
    import re

    from my_polars_ai_spark.operators import _PRIORITY, all_ops
    from tools.attestation_status import round_of

    ops = list(all_ops())
    latest: dict[str, int] = {}
    green: dict[str, bool] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
                   key=round_of)
    for f in files:
        rnd = round_of(f)
        for name, row in json.load(open(f)).items():
            ok = all(row.get(k) in (True, None)
                     for k in ("rows_match", "schema_match", "hash_match")
                     ) and row.get("err") in (None, "")
            green[name] = ok
            latest[name] = max(latest.get(name, 0), rnd)
    r13 = max((round_of(f) for f in files), default=12) + 1
    for name in _PRIORITY:  # the live window's rows land in round r13
        latest[name] = r13
        green[name] = name not in ROWS_ONLY_BY_DESIGN
    ok, report = endgame_check(ops, latest, green, set())
    assert ok, report
    assert "full-registry attested" in report


def test_endgame_gate_is_green_on_the_real_ledger():
    """The STANDING per-round gate (r13 verdict item 3, wired in round
    14): run the real `--endgame` CLI against the actual CORRECTNESS
    ledger and the live registry — no overlay, no simulation. A red
    latest-row outside the sketch trio, a never-attested op, or an op
    parked in a staged window without a ledger row fails the suite
    here, before the driver ever sees it."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=root)
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "attestation_status.py"),
         "--endgame"],
        capture_output=True, text=True, env=env, cwd=root,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "full-registry attested; oldest row:" in proc.stdout


def test_endgame_sanctions_live_window_pending_only():
    """Round-14 contract evolution: a pending op in the LIVE window is
    a sanctioned new-op addition (first row lands at this round's
    driver run); a pending op parked anywhere else still fails."""
    latest = {"a": 3, "b": 7, "approx_distinct": 13, "c": 3}
    green = {"a": True, "b": True, "approx_distinct": False, "c": True}
    ops = OPS + ["new_op"]
    ok, report = endgame_check(ops, latest, green, {"new_op"},
                               live_window={"new_op", "a"})
    assert ok, report
    assert "pending in the LIVE window" in report and "new_op" in report
    assert "full-registry attested; oldest row: r3" in report
    ok, report = endgame_check(ops, latest, green, {"new_op"},
                               live_window={"a"})
    assert not ok
    assert "not the live one" in report
