"""Operator registry: one named, oracle-checked query per SURVEY.md §2b row.

``all_ops()`` aggregates every module's OPS dict; ``__spark_entry__.py``
exposes them to the driver as ``queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

from my_polars_ai_spark.operators.base import Op

_MODULES = (
    "relational",
    "windows",
    "reshape",
    "scalar_funcs",
    "timeseries",
    "asof",
    "ml",
    "dedup",
    "similarity",
    "text",
    "multimodal",
    "udfs",
    "sql_api",
    "extras",
    "fuzzy",
)


def all_ops() -> dict[str, Op]:
    import importlib

    merged: dict[str, Op] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(f"my_polars_ai_spark.operators.{mod_name}")
        except ModuleNotFoundError:
            continue  # module not written yet (incremental build)
        for name, op_ in mod.OPS.items():
            if name in merged:
                raise ValueError(f"duplicate op {name!r} from {mod_name}")
            merged[name] = op_
    return merged
