"""Diff two bench artifacts (BENCH_r{N}.json or raw bench.py output).

Usage: python tools/compare_bench.py OLD NEW [drift_threshold]
       [--assume-old-isolated=q1,q2,... | --assume-old-isolated=pinned]

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
  >threshold move is a real plan change; the wire FIRES. These pairs
  use RAW ratios (round 13): an isolated min-of-5 by construction does
  not carry the in-bench ambient shift, so dividing it by the session
  median would let in-bench noise mask a real isolated-plan move.
- mixed pairing on a PINNED query: the one-time transition from an
  untagged artifact — reported informationally, wire does not fire
  (at most one such round per pinned query; afterwards both sides
  carry the tag and the strict path applies). The transition can be
  skipped entirely with --assume-old-isolated when the old artifact's
  numbers are KNOWN to be isolated samples that merely predate the
  tag (PERF.md records which — the round-12 advice ask).
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
in-bench queries, per-query in-bench ratios are therefore normalized
by the session MEDIAN in-bench ratio before the threshold applies — a
real plan regression is an OUTLIER against the session shift, which
the median cancels. Isolated-vs-isolated pairs are excluded from both
the median and the normalization (round 13, closing the round-12
advice blind zone). Below 10 in-bench common queries the raw ratios
apply (a median over a handful of queries is meaningless).

Session-median corroboration (round 13): median normalization could
absorb a REAL global regression up to the threshold — a config change
slowing every query 20% reads as "ambient shift". The pinned
isolated-vs-isolated pairs measure machine state nearly free of plan
and cache effects, so they corroborate: when the in-bench median
shifts past SESSION_GUARD (1.10x) but the pinned isolated median did
not move with it (less than half the shift), the shift is NOT ambient
— it is a global code/config regression and the wire fires
("__session_uncorroborated__"). A median past the full threshold
still fires unconditionally as before. With no pinned
isolated-vs-isolated pair available (legacy untagged artifact and no
--assume-old-isolated), the shift is reported as unadjudicable but
does not fire — the per-query wires still apply.

Driver-artifact recovery (round 13): a BENCH_r{N}.json whose "parsed"
is null (the round-12 tail-truncation failure) or is the new SHORT
summary line (no "queries" map) is recovered by, in order: (a) a
sibling BENCH_LAST.json whose run_id matches the summary's — the full
detail bench.py now writes alongside stdout; (b) a complete detail
line surviving in the captured tail; (c) best-effort regex extraction
of per-query pairs from the truncated tail, name-filtered against
bench.HEADLINE (drops a half-truncated leading name) and always
against the ARTIFACT_KEYS denylist (summary keys like "sf"/"value"/
"n_queries" must not become phantom queries even when the HEADLINE
import is unavailable — r14), flagged "partial" in the output.

Corroborated-ambient isolated normalization (round 14): isolated
min-of-5 samples face raw ratios because they carry no SHARED-LOOP
ambient, but a machine-state shift (thermal, VM neighbors) moves
every sample, isolated included — that is precisely what pinned
corroboration detects. So when the session IS corroborated as ambient
(guard < median <= threshold, pinned median moved >= half the shift),
isolated pairs are normalized by the PINNED isolated median — their
own population's shift — instead of raw; a raw-over-threshold move
that lands inside the band is annotated, not fired. The normalizer is
LEAVE-ONE-OUT (the other pinned pairs' median): a lone pinned pair
must never self-normalize, or a plan regression in it would both
"corroborate" the shift and mask itself — with no other pinned pair
the raw rule stands, as it does outside a corroborated shift
(round 13).
"""

from __future__ import annotations

import json
import os
import re
import sys

SESSION_GUARD = 1.10  # ambient shifts past this need pinned corroboration

# Summary/envelope keys that share the artifact tail with the queries
# map. The regex recovery path must never surface these as phantom
# queries: when bench.HEADLINE is importable they fail the allowlist,
# but on a checkout where that import breaks (valid=None) they would
# otherwise silently enter ratio comparison (r13 advice item).
ARTIFACT_KEYS = frozenset(
    {"metric", "value", "unit", "sf", "n_queries", "rc", "n", "total",
     "run_id", "cpus", "queries", "isolated", "isolated_pinned"}
)


def _recover_from_tail(tail: str) -> dict | None:
    """Best-effort per-query recovery from a driver artifact's captured
    stdout tail (see module docstring, recovery steps b/c)."""
    for m in re.finditer(r'\{"metric"', tail):
        line = tail[m.start():].splitlines()[0]
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "queries" in d:
            return d
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        import bench  # stdlib-only at import time; HEADLINE filters names
        valid = set(bench.HEADLINE)
    except Exception:
        valid = None
    seg = tail.split('"queries": {', 1)[-1]
    qs: dict[str, float] = {}
    for m in re.finditer(r'"([a-z0-9_]+)": ([0-9]+(?:\.[0-9]+)?)', seg):
        if m.group(1) in ARTIFACT_KEYS:
            continue  # summary keys are never queries, allowlist or not
        if valid is None or m.group(1) in valid:
            qs[m.group(1)] = float(m.group(2))
    if not qs:
        return None
    out: dict = {"queries": qs, "_recovered_partial": True}
    for key in ("isolated", "isolated_pinned"):
        am = re.search(r'"%s": \[([^\]]*)\]' % key, tail)
        if am:
            out[key] = re.findall(r'"([a-z0-9_]+)"', am.group(1))
    return out


def _load(path: str) -> tuple[dict[str, float], set[str], set[str]]:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d:  # driver BENCH_r{N} wrapper
        p = d.get("parsed") or {}
        if "queries" in p:
            d = p
        else:
            rec = None
            tail = d.get("tail") or ""
            run_id = p.get("run_id")
            if not run_id:  # parsed: null (r12 shape) — mine the tail
                m = re.search(r'"run_id": "(\d+)"', tail)
                run_id = m.group(1) if m else None
            here = os.path.dirname(os.path.abspath(path))
            sibling = os.path.join(here, "BENCH_LAST.json")
            if run_id and os.path.exists(sibling):
                with open(sibling) as fh:
                    full = json.load(fh)
                if full.get("run_id") == run_id and "queries" in full:
                    rec = full
                    print(f"note: {path} recovered from BENCH_LAST.json "
                          f"(run_id {run_id})")
            # BENCH_LAST holds only the latest run — a newer local bench
            # overwrites it, so older rounds' details live in the
            # per-run_id archive bench.py writes (round 14)
            archive = os.path.join(here, "cache", "bench_runs",
                                   f"{run_id}.json") if run_id else None
            if rec is None and archive and os.path.exists(archive):
                with open(archive) as fh:
                    full = json.load(fh)
                if "queries" in full:
                    rec = full
                    print(f"note: {path} recovered from the bench_runs "
                          f"archive (run_id {run_id})")
            if rec is None:
                rec = _recover_from_tail(d.get("tail") or "")
                if rec is None:
                    raise SystemExit(
                        f"{path}: artifact unparsed (parsed: null/summary) and "
                        f"no queries recoverable from tail")
                note = ("PARTIAL (front-truncated tail)"
                        if rec.get("_recovered_partial") else "complete")
                print(f"note: {path} parsed payload missing; recovered "
                      f"{len(rec['queries'])} queries from tail [{note}]")
            d = rec
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' map found")
    return d["queries"], set(d.get("isolated", ())), set(d.get("isolated_pinned", ()))


def main() -> int:
    assumed_old_iso: set[str] = set()
    pos: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--assume-old-isolated"):
            val = a.split("=", 1)[1] if "=" in a else "pinned"
            assumed_old_iso = {"__pinned__"} if val == "pinned" else set(val.split(","))
        else:
            pos.append(a)
    old_path, new_path = pos[0], pos[1]
    threshold = float(pos[2]) if len(pos) > 2 else 1.25
    (old, old_iso, old_pin), (new, new_iso, new_pin) = _load(old_path), _load(new_path)
    pinned = old_pin | new_pin
    if "__pinned__" in assumed_old_iso:
        assumed_old_iso = set(pinned)
    if assumed_old_iso:
        print(f"assuming old-side isolated tags for: {sorted(assumed_old_iso)}")
        old_iso |= assumed_old_iso
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    both_iso = {q for q in common if q in old_iso and q in new_iso}
    rows = sorted(
        ((new[q] / old[q] if old[q] else float("inf"), q) for q in common),
        reverse=True,
    )
    # session median over IN-BENCH pairs only: isolated min-of-5 samples
    # carry no shared-loop ambient and would dilute (or be masked by) it
    finite = sorted(r for r, q in rows if r != float("inf") and q not in both_iso)
    med = finite[len(finite) // 2] if len(finite) >= 10 else 1.0
    pinned_iso_ratios = sorted(
        new[q] / old[q] for q in both_iso if q in pinned and old[q]
    )
    pinned_med = (pinned_iso_ratios[len(pinned_iso_ratios) // 2]
                  if pinned_iso_ratios else None)
    # When the in-bench median shifted past the guard AND the pinned
    # isolated pairs moved with it (>= half the shift), the machine
    # itself drifted — isolated min-of-5 samples DO carry that kind of
    # shift (thermal/VM state affects every sample). Raw ratios on
    # isolated pairs would then fire the wire on the same ambient move
    # the session was just corroborated for (r13 advice item), so
    # isolated pairs are normalized by the PINNED isolated median —
    # their own population's shift, never the in-bench median, which
    # still carries shared-loop cache effects. Outside a corroborated
    # shift, isolated pairs keep facing raw ratios (round 13).
    ambient_corroborated = (
        SESSION_GUARD < med <= threshold
        and pinned_med is not None
        and pinned_med >= 1 + (med - 1) * 0.5
    )

    def _loo_pinned_med(q: str) -> float | None:
        # leave-one-out: a query must never be normalized by a median
        # it dominates — with one pinned pair, self-normalization would
        # both corroborate the shift and mask the pair's own regression
        rest = sorted(new[p] / old[p] for p in both_iso
                      if p in pinned and p != q and old[p])
        return rest[len(rest) // 2] if rest else None

    drifted, transition = [], []
    for ratio, q in rows:
        flag = ""
        # isolated-vs-isolated pairs face the RAW threshold (normalized
        # by the OTHER pinned pairs' median during a corroborated
        # ambient shift); in-bench pairs are ambient-normalized by the
        # session median
        if q in both_iso:
            loo = _loo_pinned_med(q) if ambient_corroborated else None
            eff = ratio / loo if loo is not None else ratio
            if loo is not None and ratio > threshold >= eff:
                flag = ("  <-- isolated move inside the corroborated "
                        "ambient band (normalized by pinned median)")
        else:
            eff = ratio / med
        if eff > threshold and new[q] - old[q] > 0.15:  # ignore sub-150ms noise
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
        iso_mark = " [iso]" if q in both_iso else ""
        print(f"  {ratio:5.2f}x  {q}: {old[q]:.3f} -> {new[q]:.3f}{iso_mark}{flag}")
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(f"\ncommon={len(common)} total {t_old:.2f}s -> {t_new:.2f}s "
          f"({t_new / t_old:.2f}x); session median ratio {med:.2f}x"
          + (" (ambient-normalized in-bench thresholds)" if med != 1.0 else "")
          + (f"; pinned isolated median {pinned_med:.2f}x"
             if pinned_med is not None else ""))
    if med > threshold:
        print(f"\nsession-level drift: median ratio {med:.2f}x drifted beyond "
              f"{threshold}x — machine problem or GLOBAL plan/config "
              f"regression; adjudicate before trusting per-query ratios")
        drifted.append("__session_median__")
    elif med > SESSION_GUARD:
        # a sub-threshold session shift is "ambient" only if the pinned
        # isolated pairs (machine state, nearly free of plan/cache
        # effects) moved with it — at least half the shift
        if pinned_med is None:
            print(f"\nsession median {med:.2f}x exceeds the {SESSION_GUARD}x "
                  f"ambient guard but no pinned isolated-vs-isolated pair is "
                  f"available to corroborate (legacy untagged artifact?); "
                  f"pass --assume-old-isolated if the old numbers are known-"
                  f"isolated, else adjudicate by re-running bench")
        elif pinned_med < 1 + (med - 1) * 0.5:
            print(f"\nsession median {med:.2f}x NOT corroborated by the pinned "
                  f"isolated set (median {pinned_med:.2f}x did not move with "
                  f"it) — NOT ambient machine shift: either a global "
                  f"code/config regression or a shared-loop composition "
                  f"change (did HEADLINE grow a heavy query?); the "
                  f"normalization must not absorb it unadjudicated")
            drifted.append("__session_uncorroborated__")
        else:
            print(f"\nsession median {med:.2f}x corroborated as ambient by the "
                  f"pinned isolated median {pinned_med:.2f}x (isolated pairs "
                  f"normalized by the pinned median for this comparison)")
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
