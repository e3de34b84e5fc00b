"""Tests for the data-skipping manifest table format
(sources/manifest_format.py): correctness equals a plain filter, AND
the manifest provably skips files the predicate excludes."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from my_polars_ai_spark.sources.manifest_format import (
    MANIFEST_NAME,
    read_manifest_table,
    write_manifest_table,
)


@pytest.fixture()
def orders_df(spark):
    rows = [
        (k, k % 7, "O", 100.0 * (k + 1),
         dt.datetime(1995, 1 + (k % 12), 1 + (k % 27)), "1-URGENT")
        for k in range(200)
    ]
    return spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_roundtrip_equals_plain_filter(spark, tmp_path, orders_df):
    df = orders_df.withColumn("month", F.month("o_orderdate"))
    path = str(tmp_path / "mt")
    write_manifest_table(df, path, "month", ("o_orderdate", "o_totalprice"))

    lo, hi = dt.datetime(1995, 3, 1), dt.datetime(1995, 5, 31)
    got, report = read_manifest_table(spark, path, "o_orderdate", lo, hi)
    expected = df.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi))
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in expected.collect()
    )
    # months 3,4,5 survive out of 12 — the manifest really pruned
    assert report["buckets_total"] == 12
    assert report["buckets_read"] == 3
    assert report["rows_skipped"] > 0


def test_reader_touches_only_surviving_files(spark, tmp_path, orders_df):
    df = orders_df.withColumn("month", F.month("o_orderdate"))
    path = str(tmp_path / "mt")
    write_manifest_table(df, path, "month", ("o_orderdate",))
    got, _ = read_manifest_table(
        spark, path, "o_orderdate", dt.datetime(1995, 7, 1), dt.datetime(1995, 7, 31)
    )
    files = {
        r.f for r in got.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files and all("__bucket=7" in f for f in files)


def test_numeric_stats_prune_correctly(spark, tmp_path, orders_df):
    # numeric predicate: 9 < "10" lexicographically — native compare must win
    df = orders_df.withColumn("kb", (F.col("o_orderkey") % 15).cast("int"))
    path = str(tmp_path / "mt")
    write_manifest_table(df, path, "kb", ("o_totalprice",))
    got, report = read_manifest_table(spark, path, "o_totalprice", 150.0, 1050.0)
    expected = df.filter((F.col("o_totalprice") >= 150.0) & (F.col("o_totalprice") <= 1050.0))
    assert got.count() == expected.count()


def test_unknown_stats_column_raises(spark, tmp_path, orders_df):
    df = orders_df.withColumn("month", F.month("o_orderdate"))
    path = str(tmp_path / "mt")
    write_manifest_table(df, path, "month", ("o_orderdate",))
    with pytest.raises(ValueError, match="no stats"):
        read_manifest_table(spark, path, "o_totalprice", 0.0, 1.0)


def test_manifest_written_last(spark, tmp_path, orders_df):
    df = orders_df.withColumn("month", F.month("o_orderdate"))
    path = str(tmp_path / "mt")
    write_manifest_table(df, path, "month", ("o_orderdate",))
    m = json.load(open(os.path.join(path, MANIFEST_NAME)))
    assert set(m["buckets"]) == {str(i) for i in range(1, 13)}
    assert sum(b["rows"] for b in m["buckets"].values()) == 200


def test_stream_ingest_then_pruned_read_equals_batch(spark, sf_dir, tmp_path):
    """Stream events into the manifest format, then a stats-pruned read
    must equal the plain batch filter — and actually skip buckets."""
    from my_polars_ai_spark.sources.manifest_format import read_manifest_table
    from my_polars_ai_spark.sources.tables import load_table
    from my_polars_ai_spark.streaming.jobs import stream_manifest_ingest

    table_dir = str(tmp_path / "events_mt")
    manifest = stream_manifest_ingest(spark, sf_dir, table_dir)
    assert manifest["buckets"]

    batch = load_table(spark, sf_dir, "events")
    total = batch.count()
    assert sum(b["rows"] for b in manifest["buckets"].values()) == total

    bounds = batch.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    import datetime as dt
    lo = bounds.lo + dt.timedelta(hours=2)
    hi = lo + dt.timedelta(hours=3)
    got, report = read_manifest_table(spark, table_dir, "ts", lo, hi)
    expected = batch.filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).count()
    assert got.count() == expected
    assert report["buckets_read"] < report["buckets_total"]
    assert report["rows_skipped"] > 0


def test_replayed_commit_is_noop(spark, tmp_path, orders_df):
    """At-least-once replay: writing the same commit_id twice must not
    duplicate rows or double-merge stats."""
    df = orders_df.withColumn("month", F.month("o_orderdate"))
    path = str(tmp_path / "mt")
    m1 = write_manifest_table(df, path, "month", ("o_orderdate",),
                              mode="append", commit_id=7)
    m2 = write_manifest_table(df, path, "month", ("o_orderdate",),
                              mode="append", commit_id=7)  # replay
    assert m2 == m1
    got, _ = read_manifest_table(spark, path)
    assert got.count() == 200
    assert sum(b["rows"] for b in m2["buckets"].values()) == 200
    # a NEW commit does apply
    m3 = write_manifest_table(df, path, "month", ("o_orderdate",),
                              mode="append", commit_id=8)
    assert sum(b["rows"] for b in m3["buckets"].values()) == 400
    got3, _ = read_manifest_table(spark, path)
    assert got3.count() == 400


def test_time_travel_read_as_of_commit(spark, tmp_path, orders_df):
    """AS-OF reads reconstruct each historical snapshot exactly from the
    per-commit directories — no copy-on-write, no stats dependence."""
    from my_polars_ai_spark.sources.manifest_format import read_manifest_as_of

    df = orders_df.withColumn("month", F.month("o_orderdate"))
    path = str(tmp_path / "mt")
    first = df.filter(F.col("o_orderkey") < 80)
    second = df.filter((F.col("o_orderkey") >= 80) & (F.col("o_orderkey") < 150))
    third = df.filter(F.col("o_orderkey") >= 150)
    for cid, batch in ((1, first), (2, second), (3, third)):
        write_manifest_table(batch, path, "month", ("o_orderdate",),
                             mode="append", commit_id=cid)
    assert read_manifest_as_of(spark, path, 1).count() == 80
    as_of_2 = read_manifest_as_of(spark, path, 2)
    assert as_of_2.count() == 150
    assert as_of_2.agg(F.max("o_orderkey")).collect()[0][0] == 149
    assert read_manifest_as_of(spark, path, 3).count() == 200
    # latest snapshot == the ordinary read
    full, _ = read_manifest_table(spark, path)
    assert full.count() == 200
    with pytest.raises(ValueError, match="unknown commit"):
        read_manifest_as_of(spark, path, 99)


def test_time_travel_requires_commit_history(spark, tmp_path, orders_df):
    from my_polars_ai_spark.sources.manifest_format import read_manifest_as_of

    df = orders_df.withColumn("month", F.month("o_orderdate"))
    path = str(tmp_path / "mt_nohist")
    write_manifest_table(df, path, "month", ("o_orderdate",))
    with pytest.raises(ValueError, match="no commit history"):
        read_manifest_as_of(spark, path, 1)
