"""Pandas-backed fallbacks for operators whose semantics exceed built-in
DataFrame ops (the (b) tier of the custom-operator preference order:
compose built-ins first, applyInPandas second, mapPartitions last).

Kept as *fallbacks*: the primary as-of join implementation is the pure
DataFrame union trick in operators.asof (one shuffle, no Arrow crossing).
This variant ships each key group through Arrow and runs pd.merge_asof —
simpler to extend (nearest/forward strategies, tolerance) but pays the
Python boundary; state is bounded by the largest group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """applyInPandas as-of join supporting pandas' full strategy surface
    (backward/forward/nearest + tolerance) — the fallback when the union
    trick's backward-only semantics aren't enough."""
    l_tagged = left.withColumn("__is_left", F.lit(True))
    r_tagged = right.select(by, on, *value_cols).withColumn("__is_left", F.lit(False))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    left_cols = left.columns
    out_fields = []
    for f in left.schema.fields:
        out_fields.append(f"{f.name} {f.dataType.simpleString()}")
    for f in right.select(*value_cols).schema.fields:
        out_fields.append(f"{f.name} {f.dataType.simpleString()}")
    out_schema = ", ".join(out_fields)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["__is_left"]].sort_values(on)[left_cols]
        rpdf = pdf[~pdf["__is_left"]].sort_values(on)[[on, *value_cols]]
        if lpdf.empty:
            return pd.DataFrame(columns=[*left_cols, *value_cols])
        merged = pd.merge_asof(
            lpdf, rpdf, on=on, direction=direction, tolerance=tolerance
        )
        return merged[[*left_cols, *value_cols]]

    return unioned.groupBy(by).applyInPandas(merge, schema=out_schema)
