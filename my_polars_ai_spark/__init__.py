"""my_polars_ai_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of ``slackroo/my-polars-ai``
(reference surveyed in SURVEY.md) on Apache Spark:

- ``engine``     — the conversational NL -> PySpark-code engine
  (prompting, sandboxing, execution, retry, caching, charts), the
  Spark-first counterpart of the reference's orchestration layer
  (reference: polarsai/__init__.py:214-341).
- ``operators``  — a deterministic, oracle-checked operator library
  covering the full data-processing surface the reference exposes
  (SURVEY.md §2b) plus large-scale pipeline extensions (dedup,
  similarity search, text analysis, multimodal plumbing).
- ``sources``    — ingestion (parquet/csv/json/excel/in-memory).
- ``functions``  — scalar function families (string/date/math/array/json).
- ``plans``      — plan inspection + scale helpers (broadcast, AQE, skew).
- ``streaming``  — Structured Streaming counterparts of the batch
  time-window operators.

Everything here is public-knowledge PySpark; nothing is copied from the
reference implementation.
"""

__version__ = "0.1.0"

from my_polars_ai_spark.engine.core import SparkAI  # noqa: F401
from my_polars_ai_spark.engine.llm import CallableLLM, FakeLLM, LangChainLLM  # noqa: F401
from my_polars_ai_spark.engine.providers import (  # noqa: F401
    AzureOpenAILLM,
    FalconLLM,
    GooglePalmLLM,
    OpenAILLM,
    OpenAssistantLLM,
    StarcoderLLM,
    load_llm,
)
from my_polars_ai_spark.session import get_spark  # noqa: F401
