"""Plan-lint sweep: run the scale-killer linter over every registered
op's physical plan in one session, attribute every warning to its op,
and check each against the documented bounded-input allowlist
(plans/lint_allowlist.py).

Usage: PYTHONPATH=/root/repo python tools/lint_all.py [sf_dir]

Exit code 1 if any warning has NO allowlist justification — a new op
may not park a scale-killer shape in the advisory noise; it must either
lose the warning or document why the flagged input is bounded.

Exit code 1 ALSO if any allowlist entry did not fire in the sweep
(round 12: a stale allowlist is how a future real regression of the
same kind would hide behind a dead justification). Entries listed in
lint_allowlist.CACHE_CONDITIONAL are warm-sweep-exempt but are
re-linted in ISOLATION after clearCache() — they must fire cold, or
they too fail the gate. Nothing in the allowlist can rot silently.

The staleness gate is enforced only at the default GATE_SF (warning
shapes are plan-dependent and some fire only at that SF — broadcast
thresholds and row counts shift with data size); at any other sf_dir
not-firing entries are printed as info and do not affect the exit
code, so `lint_all.py /root/testdata/sf0.1` stays usable as an
attribution check without spurious reds.

The same sweep runs inside pytest (tests/test_lint_gate.py) so an
unattributed warning can never ship on a green test suite — the
round-8 postmortem (a red lint gate at HEAD because the script lived
outside pytest) made this structural.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sweep(spark, sf_dir: str, ops: dict | None = None):
    """Lint every op's plan and attribute warnings against the
    allowlist. Returns (clean, warned, errored, unattributed) where
    warned maps name -> warning list and unattributed is a list of
    (name, kind) pairs with no documented justification."""
    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.plans.guardrails import lint_plan
    from my_polars_ai_spark.plans.lint_allowlist import ALLOWLIST, kind_of

    clean, warned, errored = [], {}, {}
    for name, op_ in (ops or all_ops()).items():
        try:
            warnings = lint_plan(op_.fn(spark, sf_dir))
        except Exception as exc:  # plan build failure is a real finding
            errored[name] = repr(exc)
            continue
        if warnings:
            warned[name] = warnings
        else:
            clean.append(name)

    unattributed: list[tuple[str, str]] = []
    for name, ws in sorted(warned.items()):
        for w in ws:
            kind = kind_of(w)
            if ALLOWLIST.get((name, kind)) is None:
                unattributed.append((name, kind))
    return clean, warned, errored, unattributed


GATE_SF = "/root/testdata/sf0.001"  # the SF where staleness is enforced


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else GATE_SF

    from my_polars_ai_spark.plans.lint_allowlist import ALLOWLIST, kind_of
    from my_polars_ai_spark.session import get_spark

    spark = get_spark("lint_all", master="local[8]", shuffle_partitions=8)
    clean, warned, errored, unattributed = sweep(spark, sf_dir)

    fired: set[tuple[str, str]] = set()
    bad = set(unattributed)
    for name, ws in sorted(warned.items()):
        for w in ws:
            kind = kind_of(w)
            fired.add((name, kind))
            if (name, kind) in bad:
                print(f"  ✗ UNATTRIBUTED {name} [{kind}]: {w.split(':')[0]}")
            else:
                print(f"  ⚠ {name} [{kind}]: {ALLOWLIST[(name, kind)]}")
    for name, err in sorted(errored.items()):
        print(f"  ✗ {name}: {err}")

    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.plans.guardrails import lint_plan
    from my_polars_ai_spark.plans.lint_allowlist import CACHE_CONDITIONAL

    not_fired = sorted(k for k in ALLOWLIST if k not in fired)
    stale: list[tuple[str, str]] = []
    ops = all_ops()
    for name, kind in not_fired:
        if (name, kind) not in CACHE_CONDITIONAL:
            stale.append((name, kind))
            continue
        # conditional entries must still fire against a COLD cache —
        # re-lint in isolation so a conditional entry cannot rot either
        spark.catalog.clearCache()
        try:
            cold = lint_plan(ops[name].fn(spark, sf_dir))
        except Exception as exc:
            print(f"  ✗ conditional entry {name} failed cold re-lint: {exc!r}")
            stale.append((name, kind))
            continue
        if any(kind_of(w) == kind for w in cold):
            print(f"  ⚠ {name} [{kind}]: cache-conditional — absorbed by "
                  f"warm-sweep caches, verified firing against a cold cache")
        else:
            stale.append((name, kind))
    enforce_stale = sf_dir.rstrip("/") == GATE_SF.rstrip("/")
    if stale:
        label = "STALE" if enforce_stale else "not firing at this SF (info only)"
        print(f"\n{label} allowlist entries ({len(stale)}):")
        for name, kind in stale:
            print(f"  {'✗' if enforce_stale else '-'} {name} [{kind}]")
    print(
        f"\nclean={len(clean)} warned={len(warned)} "
        f"unattributed={len(unattributed)} errored={len(errored)} "
        f"stale={len(stale) if enforce_stale else 0}"
    )
    return 1 if unattributed or errored or (stale and enforce_stale) else 0


if __name__ == "__main__":
    raise SystemExit(main())
