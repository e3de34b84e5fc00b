"""Empirical scaling probe: run an op's SPARK side at sf0.001/0.01/0.1
and report wall-clock plus the log10 scaling ratio between adjacent SFs
(1.0 = perfectly linear in rows, <1 sublinear/fixed-overhead-dominated,
>1 superlinear — the smell worth investigating before 100 TB).

Usage: PYTHONPATH=/root/repo python tools/scale_probe.py op1 [op2 ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.001", "0.01", "0.1"]


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    names = sys.argv[1:]

    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.session import get_spark

    spark = get_spark("scale_probe")
    ops = all_ops()
    bad = [n for n in names if n not in ops]
    if bad:
        print(f"unknown ops: {bad}")
        return 2

    print(f"{'op':40s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} "
          f"{'exp(1->2)':>9s} {'exp(2->3)':>9s}")
    for name in names:
        times = []
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            # warm the input listing, then take the better of two runs
            best = math.inf
            for _ in range(2):
                t0 = time.perf_counter()
                df = ops[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        e12 = math.log10(times[1] / times[0]) if times[0] > 0 else float("nan")
        e23 = math.log10(times[2] / times[1]) if times[1] > 0 else float("nan")
        print(f"{name:40s} {times[0]:8.2f} {times[1]:8.2f} {times[2]:8.2f} "
              f"{e12:9.2f} {e23:9.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
