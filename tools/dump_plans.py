"""Dump .explain("formatted") for headline queries to plans/<tag>/<name>_<suffix>.txt.

Usage: PYTHONPATH=/root/repo python tools/dump_plans.py <tag> <suffix> [op ...]

With no ops listed, dumps every bench HEADLINE query. Plans are captured
at sf0.1 (the bench SF) so exchange counts / join strategies match what
the bench times. Driver-side only (no job execution) except that ops
whose plan depends on memoized artifacts will build them.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    from bench import HEADLINE
    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.plans.inspect import explain_str
    from my_polars_ai_spark.session import get_spark

    if not names:
        names = list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    ops = all_ops()
    for name in names:
        df = ops[name].fn(spark, sf_dir)
        text = explain_str(df, mode="formatted")
        # Strip per-run expression ids so before/after diffs show structure.
        n_exch = len(re.findall(r"\bExchange\b", text))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"{name}: exchanges={n_exch} -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
