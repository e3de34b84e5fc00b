"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM (``local[N]``); the same configs translate to a
real cluster: AQE handles runtime re-planning (partition coalescing, skew
joins, dynamic broadcast), and the shuffle-partition count is sized to the
available parallelism rather than Spark's legacy default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are correctness-relevant (timezone pinned to UTC so results
# compare bit-for-bit against the DuckDB oracle, which is UTC-naive) or
# scale-relevant (AQE family). They are safe on any cluster size.
DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: vectorized reader + pushdown are on by default; keep
    # explicit so a misconfigured cluster can't silently disable them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Joins with small dims should broadcast; AQE can also convert at runtime.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "64m",
    # Runtime filters (spark.sql.optimizer.runtime.bloomFilter.enabled /
    # runtimeFilter.semiJoinReduction.enabled) are deliberately NOT set:
    # measured at sf0.1 local[32] they ballooned the 28-query bench from
    # ~7 min to >16 min (bloom build aggregates injected into joins whose
    # sides are already tiny). At real fact-fact scale enable them per
    # job; the hand-built pattern is operators/extras.py
    # bloom_filter_semi_join.
    # Quiet the UI for headless runs.
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "my_polars_ai_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured. ``shuffle_partitions`` defaults
    to the local core count — on a real cluster leave it unset and let AQE
    coalesce from a higher initial value.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    confs.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
