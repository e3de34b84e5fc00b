"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference reads only files/objects the host hands it (reference
polarsai/__init__.py source surface); this module covers the *connector*
case: data that lives behind an API/generator rather than on disk. The
DataSource API is the PySpark-native answer — the planner asks
``partitions()`` for the split list and fans ``read(partition)`` out as
one task per split, so a thousand-executor cluster pulls a thousand
splits concurrently with no driver bottleneck.

The demo source generates rows *deterministically* (md5-derived payload,
the same portable-hash trick as operators/dedup.py), which keeps even a
Python-connector scan fully DuckDB-oracle-checkable: the oracle re-derives
the identical rows from generate_series.

At 100 TB the same class wraps any sliced upstream (REST cursor ranges,
kafka offset ranges, object-store listings): partitions() returns the
slice descriptors, read() yields one slice, and Spark owns retry/locality/
parallelism. Arrow note: read() may also yield pyarrow.RecordBatch for
bulk transfer — row tuples are fine at this fixture size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SYNTH_SCHEMA = "row_id BIGINT, key STRING, h60 BIGINT"
DEFAULT_ROWS = 1000
DEFAULT_SLICES = 8


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


def synth_row(row_id: int) -> tuple[int, str, int]:
    """One deterministic row: key cycles mod 7; h60 is the 60-bit integer
    from md5('seed:'||row_id) — bit-identical to the DuckDB expression
    ('0x' || substr(md5('seed:' || row_id), 1, 15))::BIGINT."""
    digest = hashlib.md5(f"seed:{row_id}".encode()).hexdigest()
    return row_id, f"k{row_id % 7}", int(digest[:15], 16)


class SynthSource(DataSource):
    """``spark.read.format("synth").option("rows", N).option("slices", P)``"""

    @classmethod
    def name(cls) -> str:
        return "synth"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> "SynthReader":
        return SynthReader(
            int(self.options.get("rows", DEFAULT_ROWS)),
            int(self.options.get("slices", DEFAULT_SLICES)),
            self.options.get("arrow", "false").lower() == "true",
        )


class SynthReader(DataSourceReader):
    def __init__(self, n_rows: int, n_slices: int, arrow: bool = False) -> None:
        self.n_rows = n_rows
        self.n_slices = max(1, min(n_slices, n_rows or 1))
        self.arrow = arrow

    def partitions(self) -> Sequence[_RangePartition]:
        per = -(-self.n_rows // self.n_slices)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        if self.arrow:
            # Bulk path: one pyarrow.RecordBatch per slice — Spark takes
            # the columnar batch whole instead of pickling row tuples
            # (the option for high-volume connectors).
            import pyarrow as pa

            rows = [synth_row(i) for i in range(partition.start, partition.end)]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in rows], type=pa.int64()),
                    pa.array([r[1] for r in rows], type=pa.string()),
                    pa.array([r[2] for r in rows], type=pa.int64()),
                ],
                names=["row_id", "key", "h60"],
            )
            return
        for row_id in range(partition.start, partition.end):
            yield synth_row(row_id)


def register_synth_source(spark: SparkSession) -> None:
    """Idempotent registration of the ``synth`` format on a session."""
    spark.dataSource.register(SynthSource)


class SynthStreamSource(DataSource):
    """Streaming flavor: ``spark.readStream.format("synth_stream")`` emits
    the same deterministic rows in micro-batches of ``batch_rows``,
    stopping at ``max_rows`` — an offset-tracked Python stream source
    (the kafka-without-kafka shape). Offsets are plain dicts checkpointed
    by Spark, so a restarted query resumes exactly where it stopped."""

    @classmethod
    def name(cls) -> str:
        return "synth_stream"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def simpleStreamReader(self, schema) -> "SynthStreamReader":
        return SynthStreamReader(
            int(self.options.get("batch_rows", 100)),
            int(self.options.get("max_rows", DEFAULT_ROWS)),
        )


class SynthStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader contract: initialOffset/read/commit.
    read(start) returns (rows, next_offset); Spark persists offsets in
    the checkpoint log, giving exactly-once across restarts."""

    def __init__(self, batch_rows: int, max_rows: int) -> None:
        self.batch_rows = batch_rows
        self.max_rows = max_rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        lo = start["row"]
        hi = min(lo + self.batch_rows, self.max_rows)
        # iter(list), not a bare list or generator: Spark's prefetch
        # cache calls next() on the result AND copy.copy()s it
        # (datasource_internal.add_result_to_cache / getCache) — a list
        # isn't an iterator, a generator can't be copied; a list_iterator
        # satisfies both via __reduce__.
        return iter([synth_row(i) for i in range(lo, hi)]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_row(i) for i in range(start["row"], end["row"])])

    def commit(self, end: dict) -> None:
        pass


def register_synth_stream_source(spark: SparkSession) -> None:
    spark.dataSource.register(SynthStreamSource)


class _PartFile(WriterCommitMessage):
    def __init__(self, tmp_path: str, final_name: str, n_rows: int) -> None:
        self.tmp_path = tmp_path
        self.final_name = final_name
        self.n_rows = n_rows


class JsonlSink(DataSource):
    """Writer flavor of the Python DataSource API —
    ``df.write.format("jsonl_sink").option("path", dir).save()``: each
    task streams its partition to an ATTEMPT-UNIQUE temp file
    (``.tmp-part-*``, invisible to ``part-*.jsonl`` readers) and
    returns a commit message; the DRIVER's ``commit()`` renames every
    temp to its final ``part-<pid>.jsonl`` name and only then writes
    the ``_MANIFEST.json``. That rename step is what makes the sink
    transactional: a crashed or speculative task's half-written file
    keeps its temp name forever, so readers (glob or manifest) never
    see it — the same two-phase protocol as Hadoop FileOutputCommitter
    / Iceberg snapshot commit. ``abort()`` removes the temp files of
    tasks that did report in."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def schema(self) -> str:  # not used on the write path
        return SYNTH_SCHEMA

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options["path"], [f.name for f in schema.fields])


class JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, columns: list[str]) -> None:
        self.path = path
        self.columns = columns

    def write(self, iterator: Iterator) -> _PartFile:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        # attempt-unique temp name: concurrent speculative attempts of
        # the same partition can never clobber each other, and a crashed
        # attempt's partial file never matches the part-*.jsonl glob
        tmp = os.path.join(self.path, f".tmp-part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.columns, row))) + "\n")
                n += 1
        return _PartFile(tmp, f"part-{pid:05d}.jsonl", n)

    def commit(self, messages: Sequence[_PartFile]) -> None:
        import json
        import os

        for m in messages:
            os.replace(m.tmp_path, os.path.join(self.path, m.final_name))
        manifest = {
            "parts": sorted(
                ({"path": m.final_name, "n_rows": m.n_rows} for m in messages),
                key=lambda p: p["path"],
            ),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages: Sequence[_PartFile]) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


def register_jsonl_sink(spark: SparkSession) -> None:
    spark.dataSource.register(JsonlSink)
