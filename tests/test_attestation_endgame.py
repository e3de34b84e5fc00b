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
