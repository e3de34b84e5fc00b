"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode/feature-extract as Arrow-batched Pandas UDFs (training-data
pipeline extension; BASELINE.json).

The container has no image/audio codec libraries, so the image format
used is netpbm P6 (PPM) — a public format trivially encodable/decodable
in pure Python — which lets the decode step be REAL: a parser that reads
the magic number, dimensions, and pixel bytes out of a binary column.
The Spark-side shape is what matters at 100 TB: binary columns flow
through mapInPandas in Arrow batches, schemas are explicit, and nothing
ever collects to the driver; swapping the PPM parser body for PIL/av
changes nothing about the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_polars_ai_spark.operators.base import Op, make_registrar
from my_polars_ai_spark.sources.tables import load_table as _t

OPS: dict[str, Op] = {}
op = make_registrar(OPS)

PPM_WIDTH = 16  # pixels per row in the synthesized images (3 bytes/pixel)

DECODE_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, n_px_bytes bigint, mean_px double"
)


@op(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata columns: documents' text re-encoded as an
    opaque binary column (stand-in for image/audio bytes), with byte
    length and content digest — the metadata layer a multimodal table
    keeps alongside the blob."""
    d = _t(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5("text").alias("content_md5"),
    )


def _fake_decode_batches(batches) -> Iterator:
    """STUB image decode (no codecs in this container).

    Deterministic fake: 'decodes' each payload into width/height/mean-pixel
    derived from its md5. A real deployment replaces the body with e.g.
    PIL/av decode — signature, schema, and Arrow batch flow stay identical.
    """
    import hashlib

    import pandas as pd

    for pdf in batches:
        digests = [hashlib.md5(b).digest() for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in pdf["payload"]],
                "fake_width": [16 + d[0] % 64 for d in digests],
                "fake_height": [16 + d[1] % 64 for d in digests],
                "fake_mean_px": [d[2] / 255.0 for d in digests],
            }
        )


@op(
    "multimodal_decode_stub",
    oracle=None,  # decode itself is a stub; plumbing is unit-tested instead
    tags=("multimodal", "udf", "stub"),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pipeline over binary payloads (STUB decode body,
    real plumbing: Arrow batches of binary columns in, typed feature
    columns out, fully distributed)."""
    # decode is the narrow hot path and the fixture file is one split —
    # fan out so mapInPandas runs one Arrow stream per core
    d = _t(spark, sf_dir, "documents", min_partitions=spark.sparkContext.defaultParallelism)
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(_fake_decode_batches, schema=DECODE_SCHEMA)


FRAME_LEN = 16   # bytes per "frame" of the opaque payload
FRAME_STRIDE = 4  # keep every 4th frame


@op(
    "frame_sample_chunks",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id,
               unnest(range(0, CAST(ceil(len(text) / {FRAME_LEN}.0) AS BIGINT))) AS frame_idx,
               text
        FROM documents
    )
    SELECT doc_id, frame_idx,
           md5(substr(text, CAST(frame_idx * {FRAME_LEN} + 1 AS INTEGER), {FRAME_LEN})) AS frame_hash
    FROM frames
    WHERE frame_idx % {FRAME_STRIDE} = 0
    """,
    tags=("multimodal", "sample", "frames"),
)
def frame_sample_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque payload: chunk each document into
    fixed-length frames and keep every FRAME_STRIDE-th — the video
    keyframe-sampling shape, expressed entirely in JVM expressions
    (sequence/explode/substring/md5; the decode-the-frame step is where
    a codec UDF would slot in, cf. multimodal_decode_stub). Frame count
    scales with payload size, never with corpus size, and the explode is
    a narrow operation."""
    d = _t(spark, sf_dir, "documents")
    n_frames = F.ceil(F.length("text") / F.lit(float(FRAME_LEN))).cast("long")
    frames = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0).cast("long"), n_frames - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % FRAME_STRIDE == 0)
    chunk = F.substring(
        F.col("text"), (F.col("frame_idx") * FRAME_LEN + 1).cast("int"), FRAME_LEN
    )
    return frames.select("doc_id", "frame_idx", F.md5(chunk).alias("frame_hash"))
