"""Diff two bench artifacts (BENCH_r{N}.json or raw bench.py output).

Usage: python tools/compare_bench.py OLD NEW [drift_threshold]

Prints per-query ratios sorted worst-first, the common-set totals, and
exits 1 if any common query drifted beyond the threshold (default
1.25x) — the signal the round-6 verdict asked to keep pinned as the
headline set grows.

Round 12: the drift wire now reads the isolation tags bench.py emits
("isolated": [query, ...]). A query's recorded number is either an
isolated min-of-5 after clearCache (steady-state) or an in-bench
min-of-3 from the shared loop (rides whatever cache/GC pressure the
preceding ~50 queries left behind). Comparing one of each is how the
wire spent rounds 5-11 firing on `pq_adc_topk`/`dedup_minhash_lsh`
measurement artifacts that PERF.md then hand-adjudicated with manual
isolated re-runs. Now:

- isolated(old) vs isolated(new): steady-state vs steady-state — a
  >threshold move is a real plan change; the wire fires.
- mixed or in-bench on either side for a query in either artifact's
  isolation set: not apples-to-apples — reported as "mixed-sample"
  informationally, wire does NOT fire. (One transition round per query
  at most; once both artifacts carry the tag the strict path applies.)
- in-bench vs in-bench for queries outside both isolation sets:
  unchanged behavior — these are the light queries whose shared-loop
  samples have been stable within the ambient 1.04-1.19x band.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> tuple[dict[str, float], set[str]]:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d and "queries" in d.get("parsed", {}):  # driver BENCH_r{N}
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' map found")
    return d["queries"], set(d.get("isolated", ()))


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    (old, old_iso), (new, new_iso) = _load(old_path), _load(new_path)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    rows = sorted(
        ((new[q] / old[q] if old[q] else float("inf"), q) for q in common),
        reverse=True,
    )
    drifted, mixed = [], []
    for ratio, q in rows:
        flag = ""
        if ratio > threshold and new[q] - old[q] > 0.15:  # ignore sub-150ms noise
            in_iso_old, in_iso_new = q in old_iso, q in new_iso
            if (in_iso_old or in_iso_new) and not (in_iso_old and in_iso_new):
                flag = "  <-- mixed-sample (isolated vs in-bench; informational)"
                mixed.append(q)
            else:
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
    if mixed:
        print(f"\n{len(mixed)} mixed-sample comparisons (not drift): {mixed}")
        print("these pair an isolated min-of-5 with an in-bench sample; the "
              "next round compares isolated-vs-isolated and the strict wire "
              "applies")
    if drifted:
        print(f"\n{len(drifted)} queries drifted beyond {threshold}x: {drifted}")
        print("isolated-vs-isolated (or stable in-bench) moves — investigate "
              "as real plan changes")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
