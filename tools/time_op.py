"""Isolated steady-state timing for registry ops (bench.py's isolated
protocol, standalone): per op — clearCache, one warm run that refills
only this op's own diamond caches, then min/median of N noop-sink runs.

Usage: PYTHONPATH=/root/repo python tools/time_op.py <op> [<op> ...] [--n 5]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 5
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_op")
    ops = all_ops()
    for name in args:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"warm {name}")
        t0 = time.perf_counter()
        ops[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        samples = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name} iter {i}")
            t0 = time.perf_counter()
            ops[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        print(
            f"{name}: cold={cold:.3f} min={min(samples):.3f} "
            f"median={statistics.median(samples):.3f} n={n}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
