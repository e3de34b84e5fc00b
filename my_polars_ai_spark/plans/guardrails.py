"""Plan linting: flag the scale-killers before they reach a cluster.

The correctness gate can't see a slow plan — a vocab² nested-loop join or
a global window returns the right rows and still melts at 100 TB. This
linter inspects the physical plan for the known killer shapes; SparkAI
runs it on every DataFrame produced by generated code and surfaces the
warnings in its logs, and library users can call ``lint_plan`` directly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from my_polars_ai_spark.plans.inspect import explain_str

# A window with no PARTITION BY compiles to Exchange SinglePartition ->
# Sort -> Window: the whole input funnels through one task. Simple-mode
# plans omit the partition bracket entirely for global windows, so the
# SinglePartition exchange alongside a Window operator is the signal.
# (Bounded inputs — e.g. a pre-aggregated histogram — trip this too; the
# warning is advisory and such plans should say so where they're built.)
def _has_global_window(text: str) -> bool:
    return "Exchange SinglePartition" in text and re.search(r"\bWindow \[", text) is not None


def lint_plan(df: DataFrame) -> list[str]:
    """Return human-readable warnings for scale-hostile plan shapes.

    Empty list == nothing suspicious. Heuristics, not proofs: a
    BroadcastNestedLoopJoin is legitimate when one side is tiny (the
    brute-force k-NN pattern) — the warning says so instead of guessing.
    """
    text = explain_str(df, mode="simple")
    warnings: list[str] = []
    if "CartesianProduct" in text:
        warnings.append(
            "CartesianProduct: an un-broadcast cross join shuffles |A|x|B| rows; "
            "add a join key, a blocking/bucket key, or broadcast the small side"
        )
    if "BroadcastNestedLoopJoin" in text:
        warnings.append(
            "BroadcastNestedLoopJoin: fine if one side is small (brute-force "
            "scoring pattern); a scale-killer if both sides grow — consider a "
            "blocking key to make it an equi-join"
        )
    if _has_global_window(text):
        warnings.append(
            "Window with no PARTITION BY: every row funnels through one task; "
            "partition by a key or use an approximate/bucketed formulation"
        )
    if "BatchEvalPython" in text and "UDTF" not in text:
        warnings.append(
            "row-at-a-time Python UDF: per-row serde, no vectorization; prefer "
            "built-in functions or an Arrow-batched pandas_udf"
        )
    if text.count("SortMergeJoin") >= 3:
        warnings.append(
            f"{text.count('SortMergeJoin')} sort-merge joins in one plan: check "
            "whether dims can broadcast or inputs can be bucketed to share a "
            "partitioning"
        )
    return warnings
