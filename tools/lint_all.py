"""Plan-lint sweep: run the scale-killer linter over every registered
op's physical plan in one session and summarize.

Usage: PYTHONPATH=/root/repo python tools/lint_all.py [sf_dir]

Exit code 0 always (the lint is advisory); the output is the artifact —
ops with warnings should either lose them or document why the shape is
intentional (e.g. 1-row broadcast cross joins, dim-table-only exact ops).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.plans.guardrails import lint_plan
    from my_polars_ai_spark.session import get_spark

    spark = get_spark("lint_all", master="local[8]", shuffle_partitions=8)
    clean, warned, errored = [], {}, {}
    for name, op_ in all_ops().items():
        try:
            warnings = lint_plan(op_.fn(spark, sf_dir))
        except Exception as exc:  # plan build failure is a real finding
            errored[name] = repr(exc)
            continue
        if warnings:
            warned[name] = warnings
        else:
            clean.append(name)
    for name, ws in sorted(warned.items()):
        for w in ws:
            print(f"  ⚠ {name}: {w.split(':')[0]}")
    for name, err in sorted(errored.items()):
        print(f"  ✗ {name}: {err}")
    print(f"\nclean={len(clean)} warned={len(warned)} errored={len(errored)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
