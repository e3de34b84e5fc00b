"""Diff two bench artifacts (BENCH_r{N}.json or raw bench.py output).

Usage: python tools/compare_bench.py OLD NEW [drift_threshold]

Prints per-query ratios sorted worst-first, the common-set totals, and
exits 1 if any common query drifted beyond the threshold (default
1.25x) in BOTH directions of the comparison — the signal the round-6
verdict asked to keep pinned as the headline set grows.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        return d["queries"]
    if "parsed" in d and "queries" in d["parsed"]:  # driver BENCH_r{N} shape
        return d["parsed"]["queries"]
    raise SystemExit(f"{path}: no 'queries' map found")


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    old, new = _load(old_path), _load(new_path)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    rows = sorted(
        ((new[q] / old[q] if old[q] else float("inf"), q) for q in common),
        reverse=True,
    )
    drifted = []
    for ratio, q in rows:
        flag = ""
        if ratio > threshold and new[q] - old[q] > 0.15:  # ignore sub-150ms noise
            flag = "  <-- drift"
            drifted.append(q)
        print(f"  {ratio:5.2f}x  {q}: {old[q]:.3f} -> {new[q]:.3f}{flag}")
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"\ncommon={len(common)} total {t_old:.2f}s -> {t_new:.2f}s "
          f"({t_new / t_old:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new-only:", {q: new[q] for q in only_new})
    if drifted:
        print(f"\n{len(drifted)} queries drifted beyond {threshold}x: {drifted}")
        print("add them to bench.py's isolated min-of-5 re-measure set if "
              "the drift survives an isolated re-run")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
