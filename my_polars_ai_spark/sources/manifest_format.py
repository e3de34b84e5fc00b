"""Poor-man's table format with DATA SKIPPING: partitioned parquet plus
a JSON manifest of per-partition column statistics (min/max/rows), and a
reader that prunes partitions whose stat range cannot satisfy the
predicate — the zone-map / Delta-file-stats idea, implemented with
nothing but parquet + one JSON file.

Why this matters at 100 TB: predicate pushdown inside a parquet file
only skips ROW GROUPS after the file is opened; manifest-level stats
skip entire FILES before any task is scheduled. On a time-partitioned
fact table a narrow date predicate turns a full-table scan into a
handful of partitions — the single biggest IO lever a query planner
has. (Production systems get this from Delta/Iceberg manifests; the
mechanism is identical.)

Not a full transaction log — but the streaming path IS replay-safe:
``commit_id`` writes land in their own ``__commit=<id>`` directory
(overwrite-idempotent) and the manifest records applied commit ids, so
an at-least-once foreachBatch replay neither duplicates rows nor
double-merges stats. The manifest is always written LAST, so a crashed
write is invisible. The jsonl_sink DataSource (python_datasource.py)
demonstrates the two-phase-commit flavor at the task level.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"


def write_manifest_table(
    df: DataFrame,
    path: str,
    bucket_col: str,
    stats_cols: tuple[str, ...],
    mode: str = "overwrite",
    commit_id: int | str | None = None,
) -> dict:
    """Write ``df`` as parquet partitioned by ``bucket_col``, plus a
    manifest of per-bucket stats for ``stats_cols``.

    The input is persisted for the duration of the call: the stats
    aggregation and the parquet write are two actions over the same
    plan, and without pinning them to one materialization a
    non-deterministic input could write data that disagrees with its
    own stats (a pruning correctness hazard). The manifest is written
    LAST so a partial write is never readable. Bucket values must be
    path-safe scalars (ints/dates cast to string).

    ``mode="append"`` (the streaming-foreachBatch ingestion path)
    appends the parquet files and MERGES the new batch's stats into the
    existing manifest (min of mins, max of maxes, rows summed) —
    exactly how Delta/Iceberg accrete file stats per commit. Pass
    ``commit_id`` (e.g. the foreachBatch batch_id) to make the append
    REPLAY-SAFE: the batch's files land in their own ``__commit=<id>``
    directory (overwritten, hence idempotent, on retry) and its stats
    merge exactly once — a replayed commit_id is a no-op."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode {mode!r}")
    if commit_id is not None and mode != "append":
        raise ValueError("commit_id requires mode='append'")

    manifest_path = os.path.join(path, MANIFEST_NAME)
    prev: dict | None = None
    if mode == "append" and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prev = json.load(f)
        if prev["bucket_col"] != bucket_col or prev["stats_cols"] != list(stats_cols):
            raise ValueError("append with a different bucket/stats layout")
        if commit_id is not None and str(commit_id) in prev.get("commits", []):
            return prev  # replayed micro-batch: already fully applied

    df = df.persist()
    try:
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in stats_cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        stats_rows = (
            df.groupBy(F.col(bucket_col).cast("string").alias("__bucket"))
            .agg(*aggs)
            .collect()
        )

        bucketed = df.withColumn("__bucket", F.col(bucket_col).cast("string"))
        if commit_id is not None:
            # own directory per commit: a retry overwrites ITS files only
            data_dir = os.path.join(path, "data", f"__commit={commit_id}")
            bucketed.write.mode("overwrite").partitionBy("__bucket").parquet(data_dir)
        else:
            bucketed.write.mode(mode).partitionBy("__bucket").parquet(
                os.path.join(path, "data")
            )
    finally:
        df.unpersist()

    def _plain(v):
        return v if isinstance(v, (int, float, str, type(None))) else str(v)

    buckets: dict = dict(prev["buckets"]) if prev is not None else {}
    commits: list = list(prev.get("commits", [])) if prev is not None else []

    def _merge(old, new, fn):
        if old is None:
            return new
        if new is None:
            return old
        try:
            return fn(old, new)
        except TypeError:
            return fn(str(old), str(new))

    for r in stats_rows:
        b = r["__bucket"]
        fresh = {
            "rows": r["__rows"],
            **{
                f"{kind}_{c}": _plain(r[f"{kind}_{c}"])
                for c in stats_cols
                for kind in ("min", "max")
            },
        }
        if b in buckets:
            old = buckets[b]
            merged = {"rows": old["rows"] + fresh["rows"]}
            for c in stats_cols:
                merged[f"min_{c}"] = _merge(old[f"min_{c}"], fresh[f"min_{c}"], min)
                merged[f"max_{c}"] = _merge(old[f"max_{c}"], fresh[f"max_{c}"], max)
            buckets[b] = merged
        else:
            buckets[b] = fresh

    manifest = {
        "bucket_col": bucket_col,
        "stats_cols": list(stats_cols),
        "buckets": buckets,
    }
    if commit_id is not None or commits:
        if commit_id is not None:
            commits.append(str(commit_id))
        manifest["commits"] = commits
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_manifest_table(
    spark: SparkSession,
    path: str,
    predicate_col: str | None = None,
    lo=None,
    hi=None,
) -> tuple[DataFrame, dict]:
    """Read a manifest table, pruning buckets whose [min,max] stats for
    ``predicate_col`` do not overlap [lo, hi]. Returns (df, skip_report).

    The returned DataFrame still carries the predicate as a normal
    filter (stat pruning is an IO optimization, never a correctness
    device — a bucket may straddle the range). skip_report records how
    many buckets/rows the manifest eliminated, for observability."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    buckets = manifest["buckets"]
    if predicate_col is None:
        keep = sorted(buckets)
    else:
        if f"min_{predicate_col}" not in next(iter(buckets.values()), {}):
            raise ValueError(f"no stats for column {predicate_col!r} in manifest")

        def _gt(a, b):
            # native comparison when types align (numbers, ISO strings);
            # stringified timestamps/dates compare correctly as ISO text
            try:
                return a > b
            except TypeError:
                return str(a) > str(b)

        keep = sorted(
            b
            for b, s in buckets.items()
            if not (
                (hi is not None and s[f"min_{predicate_col}"] is not None
                 and _gt(s[f"min_{predicate_col}"], hi))
                or (lo is not None and s[f"max_{predicate_col}"] is not None
                    and _gt(lo, s[f"max_{predicate_col}"]))
            )
        )
    skip_report = {
        "buckets_total": len(buckets),
        "buckets_read": len(keep),
        "rows_skipped": sum(
            s["rows"] for b, s in buckets.items() if b not in set(keep)
        ),
    }
    if not keep:
        raise ValueError("predicate prunes every bucket; no files to read")
    base = os.path.join(path, "data")
    if manifest.get("commits"):
        # commit layout: data/__commit=<id>/__bucket=<b>/...
        paths = [os.path.join(base, "__commit=*", f"__bucket={b}") for b in keep]
    else:
        paths = [os.path.join(base, f"__bucket={b}") for b in keep]
    df = spark.read.option("basePath", base).parquet(*paths)
    if predicate_col is not None:
        if lo is not None:
            df = df.filter(F.col(predicate_col) >= lo)
        if hi is not None:
            df = df.filter(F.col(predicate_col) <= hi)
    drop_cols = [c for c in ("__bucket", "__commit") if c in df.columns]
    return df.drop(*drop_cols), skip_report


def read_manifest_as_of(spark: SparkSession, path: str, as_of_commit: int | str) -> DataFrame:
    """Time-travel read: the table AS OF ``as_of_commit`` (inclusive) —
    the Delta/Iceberg `VERSION AS OF` idea on this format. Works
    because every commit's files live in their own ``__commit=<id>``
    directory and the manifest's ``commits`` list is append-ordered:
    the snapshot at commit k is exactly the union of the first k
    commit directories, reconstructed WITHOUT any copy-on-write.
    Stats-based pruning is deliberately unavailable here: the manifest
    merges bucket stats cumulatively (min/max are not invertible), so
    historical reads scan their commit dirs and filter normally —
    correctness never depended on stats anyway. Raises on an unknown
    commit id, and on a table written without commit ids (no history
    to travel)."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    commits = manifest.get("commits")
    if not commits:
        raise ValueError("table has no commit history (written without commit_id)")
    want = str(as_of_commit)
    if want not in commits:
        raise ValueError(f"unknown commit {want!r}; history: {commits}")
    keep = commits[: commits.index(want) + 1]
    base = os.path.join(path, "data")
    paths = [os.path.join(base, f"__commit={c}") for c in keep]
    df = spark.read.option("basePath", base).parquet(*paths)
    drop_cols = [c for c in ("__bucket", "__commit") if c in df.columns]
    return df.drop(*drop_cols)
