"""Operator registry plumbing.

Every operator from SURVEY.md §2b is a named ``Op``: a deterministic
PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs on
the same parquet tables. The driver compares the two by row-count +
schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded (ROUND_MONEY / ROUND_RATIO
  decimal places) on both sides so independent summation orders can't
  flip the hash;
- ties in any top-k / limit are broken by a unique key on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Rounding conventions applied on BOTH the Spark and the oracle side.
ROUND_MONEY = 2  # currency-scale sums (values up to ~1e10)
ROUND_RATIO = 6  # averages, ratios, correlations, cosines

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def make_registrar(ops: dict[str, Op]):
    """Per-module decorator factory: ``@op("name", oracle=..., tags=...)``."""

    def op(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
        def deco(fn: QueryFn) -> QueryFn:
            if name in ops:
                raise ValueError(f"duplicate operator name {name!r}")
            ops[name] = Op(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
            return fn

        return deco

    return op
