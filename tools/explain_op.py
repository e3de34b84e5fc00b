"""Plan audit for one registry op: formatted physical plan, structural
summary, and scale-killer lint.

Usage: PYTHONPATH=/root/repo python tools/explain_op.py <op_name> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.plans.guardrails import lint_plan
    from my_polars_ai_spark.plans.inspect import explain_str, plan_summary
    from my_polars_ai_spark.session import get_spark

    ops = all_ops()
    if name not in ops:
        print(f"unknown op {name!r}; known: {', '.join(sorted(ops))}")
        return 2
    spark = get_spark("explain_op")
    df = ops[name].fn(spark, sf_dir)
    print(explain_str(df, mode="formatted"))
    print("summary:", plan_summary(df))
    warnings = lint_plan(df)
    for w in warnings:
        print(f"LINT: {w}")
    if not warnings:
        print("LINT: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
