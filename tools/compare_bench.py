"""Diff two bench artifacts (BENCH_r{N}.json or raw bench.py output).

Usage: python tools/compare_bench.py OLD NEW [drift_threshold]

Prints per-query ratios sorted worst-first, the common-set totals, and
exits 1 if any common query drifted beyond the threshold (default
1.25x) — the signal the round-6 verdict asked to keep pinned as the
headline set grows.

Round 12: the drift wire reads the isolation tags bench.py emits
("isolated": every query measured as an isolated min-of-5 after
clearCache; "isolated_pinned": the ISOLATED_REMEASURE subset pinned in
bench.py because its in-bench samples proved bimodal across rounds with
no code change). A query's recorded number is either an isolated
steady-state or an in-bench shared-loop sample, and comparing one of
each is how the wire spent rounds 5-11 firing on
`pq_adc_topk`/`dedup_minhash_lsh` measurement artifacts that PERF.md
then hand-adjudicated. The rules:

- isolated(old) vs isolated(new): steady-state vs steady-state — a
  >threshold move is a real plan change; the wire FIRES.
- mixed pairing on a PINNED query: the one-time transition from an
  untagged artifact — reported informationally, wire does not fire
  (at most one such round per pinned query; afterwards both sides
  carry the tag and the strict path applies).
- mixed pairing on a NON-pinned query (it entered or left the dynamic
  top-5): the membership flip is itself evidence the query's time
  moved, and exempting it would let a real regression ride the
  transition unflagged — the wire FIRES, annotated as mixed-sample so
  the adjudicator knows to re-measure isolated before chasing a plan.
- in-bench vs in-bench outside both isolation sets: unchanged strict
  behavior (the light queries, stable within the ambient band).

Ambient normalization (round 12, late): a session-wide uniform shift
(VM noise, thermal state — measured 1.04-1.21x across six same-code
runs in one day) moves EVERY light query by the same factor and the
flat threshold then flags 8-12 of them spuriously. With >= 10 common
queries, per-query ratios are therefore normalized by the session
MEDIAN ratio before the threshold applies — a real plan regression is
an OUTLIER against the session shift, which the median cancels. The
global-regression case stays covered: if the median itself exceeds the
threshold, the tool reports session-level drift and exits 1 (that is
either a machine problem or a global plan/config regression — both
need adjudication). Below 10 common queries the raw ratios apply
(a median over a handful of queries is meaningless).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> tuple[dict[str, float], set[str], set[str]]:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d and "queries" in d.get("parsed", {}):  # driver BENCH_r{N}
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' map found")
    return d["queries"], set(d.get("isolated", ())), set(d.get("isolated_pinned", ()))


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    (old, old_iso, old_pin), (new, new_iso, new_pin) = _load(old_path), _load(new_path)
    pinned = old_pin | new_pin
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    rows = sorted(
        ((new[q] / old[q] if old[q] else float("inf"), q) for q in common),
        reverse=True,
    )
    finite = sorted(r for r, _ in rows if r != float("inf"))
    med = finite[len(finite) // 2] if len(finite) >= 10 else 1.0
    drifted, transition = [], []
    for ratio, q in rows:
        flag = ""
        if ratio / med > threshold and new[q] - old[q] > 0.15:  # ignore sub-150ms noise
            in_iso_old, in_iso_new = q in old_iso, q in new_iso
            mixed = (in_iso_old or in_iso_new) and not (in_iso_old and in_iso_new)
            if mixed and q in pinned:
                flag = "  <-- pinned transition (isolated vs in-bench; informational)"
                transition.append(q)
            elif mixed:
                flag = "  <-- drift (mixed-sample: re-measure isolated first)"
                drifted.append(q)
            else:
                flag = "  <-- drift"
                drifted.append(q)
        print(f"  {ratio:5.2f}x  {q}: {old[q]:.3f} -> {new[q]:.3f}{flag}")
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"\ncommon={len(common)} total {t_old:.2f}s -> {t_new:.2f}s "
          f"({t_new / t_old:.2f}x); session median ratio {med:.2f}x"
          + (" (ambient-normalized thresholds)" if med != 1.0 else ""))
    if med > threshold:
        print(f"\nsession-level drift: median ratio {med:.2f}x drifted beyond "
              f"{threshold}x — machine problem or GLOBAL plan/config "
              f"regression; adjudicate before trusting per-query ratios")
        drifted.append("__session_median__")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new-only:", {q: new[q] for q in only_new})
    if transition:
        print(f"\n{len(transition)} pinned-transition comparisons (not drift): "
              f"{transition}")
        print("these pair a pinned query's isolated min-of-5 with a pre-tag "
              "in-bench sample; the next round compares isolated-vs-isolated "
              "and the strict wire applies")
    if drifted:
        print(f"\n{len(drifted)} queries drifted beyond {threshold}x: {drifted}")
        print("isolated-vs-isolated (or stable in-bench) moves fire as real "
              "plan changes; mixed-sample entries need an isolated re-measure "
              "before adjudication")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
