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

def _top_level_groups(s: str) -> list[str]:
    """Split ``[a], [b, [c]], [d]`` into its top-level bracket groups."""
    groups: list[str] = []
    depth, start = 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]" and depth > 0:
            depth -= 1
            if depth == 0:
                groups.append(s[start + 1 : i])
    return groups


# A window with no PARTITION BY compiles to Exchange SinglePartition ->
# Sort -> Window: the whole input funnels through one task. A simple-mode
# Window node prints ``Window [exprs], [partition], [order]`` and OMITS
# the partition group entirely when it is empty, so a Window line with
# only two top-level groups is the global-window signal. (Checking the
# node itself — not "a SinglePartition exchange exists somewhere in the
# plan" — keeps a keyed window from being blamed for an unrelated scalar
# aggregate's exchange. Bounded inputs — e.g. a pre-aggregated histogram
# — still trip this; the warning is advisory and such plans should say so
# where they're built.)
def _has_global_window(text: str) -> bool:
    for line in text.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if m is None:
            continue
        groups = _top_level_groups(m.group(1))
        if len(groups) >= 3:
            if groups[-2].strip() == "":  # explicit empty partition spec
                return True
        elif len(groups) == 2:
            # two groups is ambiguous: [exprs], [order] (global ordered —
            # the killer) vs [exprs], [partition] (partitioned, unordered
            # — fine). Order specs carry sort directions; partition specs
            # are bare columns.
            if re.search(r"\b(ASC|DESC)\b", groups[1]):
                return True
        elif len(groups) == 1:  # no partition, no order: one task
            return True
    return False


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
