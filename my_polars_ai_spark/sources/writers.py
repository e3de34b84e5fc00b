"""Table sinks (SURVEY.md §2b sinks: Polars write_csv/write_parquet).

Thin, explicit wrappers: partitioned parquet is the default at scale
(predicate-prunable layout); CSV is for small exports. The engine's
sandbox bans generated code from writing — sinks are host-code-only by
design (reference gated them the same way by whitelisting no IO libs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 8,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (CLUSTERED BY ... INTO n BUCKETS).

    The co-located-join layout: two tables bucketed by the same key into
    the same bucket count join WITHOUT a shuffle — at 100 TB this turns
    every recurring fact-fact join on the bucket key into a zero-exchange
    sort-merge join (see tests/test_sources_functions.py for the plan
    proof). Requires saveAsTable (bucket metadata lives in the catalog,
    not the files); sort_by within buckets removes the join's sort step
    too."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)
