"""Ingestion paths mirroring the reference's sources (SURVEY.md §2b scans).

Reference surface: CSV with header+inference (examples/from_csv.py:8),
Excel sheets (helpers/from_excel.py:11-24 — which inconsistently returned a
pandas frame; here everything lands as a Spark DataFrame), in-memory
dict-of-lists (examples/data/sample_dataframe.py:3-29), and the parquet /
json readers reachable through the sandbox.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def from_csv(spark: SparkSession, path: str, header: bool = True, infer_schema: bool = True, **options: Any) -> DataFrame:
    """CSV scan with header + type inference (reference: examples/from_csv.py:8).

    At scale prefer an explicit schema — inference is a full extra pass.
    """
    return (
        spark.read.option("header", header)
        .option("inferSchema", infer_schema)
        .options(**options)
        .csv(path)
    )


def from_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def from_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def from_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Arrow IPC (Feather v2) file -> Spark DataFrame (SURVEY.md §2b
    "Parquet/IPC/JSON" row; Polars scan_ipc surface).

    Spark has no native IPC data source, so this is a driver-side
    pyarrow read handed to Spark via Arrow conversion — right for the
    dim/interchange files IPC is used for. A 100 TB fact table should be
    parquet; for bulk IPC ingest, convert file-per-task via mapInPandas
    over a file-list DataFrame instead.
    """
    import pyarrow as pa
    import pyarrow.ipc as ipc

    try:
        with ipc.open_file(path) as reader:  # random-access (Feather v2) layout
            table = reader.read_all()
    except pa.ArrowInvalid:
        with ipc.open_stream(path) as reader:  # streaming IPC layout
            table = reader.read_all()
    return spark.createDataFrame(table.to_pandas())


def from_json(spark: SparkSession, path: str, schema: Any = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def from_excel(spark: SparkSession, path: str, sheet_name: str | int = 0) -> DataFrame:
    """Excel sheet -> Spark DataFrame (reference: helpers/from_excel.py:11-24).

    Driver-side read (sheets are small by nature), then Arrow conversion.
    Fixes the reference's inconsistency of returning a pandas frame from a
    Polars API. Prefers pandas+openpyxl; without openpyxl it falls back to
    the stdlib OOXML reader (sources/xlsx.py), so .xlsx ingestion works in
    minimal environments too.
    """
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name)
        return spark.createDataFrame(pdf)
    except ImportError:
        pass  # pandas or openpyxl absent — stdlib fallback below
    from my_polars_ai_spark.sources.xlsx import read_xlsx

    header, rows = read_xlsx(path, sheet_name=sheet_name)
    return spark.createDataFrame([tuple(r) for r in rows], schema=header)


def from_records(
    spark: SparkSession,
    data: Mapping[str, Sequence[Any]] | Sequence[Mapping[str, Any]],
    schema: Any = None,
) -> DataFrame:
    """In-memory table (reference: examples/data/sample_dataframe.py:3-29).

    Accepts dict-of-lists (column-major, the reference's shape) or a list
    of dicts (row-major).
    """
    if isinstance(data, Mapping):
        cols = list(data)
        n = len(next(iter(data.values()), []))
        rows = [tuple(data[c][i] for c in cols) for i in range(n)]
        return spark.createDataFrame(rows, schema=schema or cols)
    return spark.createDataFrame(list(data), schema=schema)


def from_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-asset ingestion for multimodal pipelines: Spark's built-in
    ``binaryFile`` source yields (path, modificationTime, length, content)
    with ``content`` as an opaque binary column — the entry point that
    feeds operators/multimodal.py's Arrow-batched decode stages. Reads are
    distributed (one task per file split-group); nothing collects to the
    driver."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
