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
