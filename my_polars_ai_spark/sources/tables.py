"""Access to the TPC-H-ish test corpus (TESTDATA.md).

Tables are plain parquet files; at 100 TB these would be
partitioned/bucketed tables behind a catalog, but the access pattern is
identical: ``spark.read.parquet`` with Catalyst doing column pruning and
predicate pushdown into the scan.

``DIM_TABLES`` marks relations that stay small at any scale factor
(region/nation are fixed-cardinality; supplier grows slowly) — joins
against them should broadcast, never shuffle the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Fixed/slow-growing cardinality at any SF -> always broadcast-join these.
DIM_TABLES = frozenset({"region", "nation", "supplier"})


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Coerce the events ``ts`` column to session-tz TIMESTAMP regardless
    of how the parquet stored it (nanos-as-long vs native micros)."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":  # TIMESTAMP(NANOS) file read under nanosAsLong
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if dtype == "timestamp_ntz":  # TIMESTAMP(MICROS) file, no tz marker
        # Session tz is pinned to UTC above, so this cast is
        # wall-clock-preserving and matches what DuckDB reads.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, min_partitions: int | None = None
) -> DataFrame:
    """Read one corpus table.

    ``min_partitions``: the local fixture files are single-row-group
    parquet (one input split — Spark can split a parquet file only at row
    group boundaries), which caps every pre-shuffle stage at one task.
    Pass a target to round-robin repartition after the scan when the
    narrow phase dominates (UDF decode, per-row parsing, tokenize/md5
    gram hashing). It costs one shuffle, so leave it off for ops whose
    first step is a groupBy/join — AQE re-partitions there anyway.

    Scale-adaptive (r16, guide §2.5 "input skew — repartition
    immediately after the read"): the repartition is applied only when
    the scan actually produces fewer partitions than requested, so on
    a production table with healthy ~128 MB row groups the scan
    already parallelizes and NO extra corpus shuffle is planned — the
    knob self-disables at 100 TB and only fires on unsplittable
    inputs, exactly the guide's prescription.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Oracle comparisons need UTC wall-times regardless of who built the
    # session (the driver harness supplies its own SparkSession).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Corpus generations have stored events.ts as either parquet
        # TIMESTAMP(NANOS) (unsupported by Spark's reader -> read nanos as
        # long and convert losslessly) or TIMESTAMP(MICROS) (read natively
        # as timestamp_ntz). Normalize both to session-tz TIMESTAMP so
        # every downstream operator and the DuckDB oracle see identical
        # UTC wall-times. Runtime conf so it works under any
        # caller-provided session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df = normalize_events_ts(df)
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the SQL API / the engine."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
