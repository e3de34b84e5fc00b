"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator registry
(my_polars_ai_spark.operators — one entry per SURVEY.md §2b row, each a
deterministic PySpark callable with, where SQL-expressible, a DuckDB
oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from my_polars_ai_spark.operators import all_ops  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ops = all_ops()
    return ops["flagship_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: op_.fn for name, op_ in all_ops().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL (DuckDB) for every SQL-expressible query."""
    return {name: op_.oracle for name, op_ in all_ops().items() if op_.oracle is not None}
