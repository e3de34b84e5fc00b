"""UDF / UDAF surface (SURVEY.md §2b UDF rows): the three Python
execution paths, each oracle-checked against the same closed-form SQL —
demonstrating that dropping to Python preserves semantics, and in what
order to prefer the paths:

1. built-in F.* expressions         (JVM, codegen — everywhere else)
2. @pandas_udf                      (Arrow-vectorized scalar path)
3. applyInPandas                    (grouped-map UDAF path)
4. row-at-a-time @udf               (kept ONLY as the documented anti-
                                     pattern — ~10-100x slower than 2)
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from my_polars_ai_spark.operators.base import ROUND_RATIO, Op, make_registrar
from my_polars_ai_spark.sources.tables import load_table as _t

OPS: dict[str, Op] = {}
op = make_registrar(OPS)

ROUND_WIN = 4


@op(
    "pandas_udf_sigmoid",
    oracle=f"""
    SELECT event_id,
           round(1.0 / (1.0 + exp(-(value / 50.0 - 1.0))), {ROUND_RATIO}) AS sigmoid_score
    FROM events
    """,
    tags=("udf", "pandas_udf"),
)
def pandas_udf_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf (the preferred Python path when
    F.* can't express the logic; here it can — the oracle proves the UDF
    matches the closed form)."""

    @F.pandas_udf(T.DoubleType())
    def sigmoid(v: pd.Series) -> pd.Series:
        import numpy as np

        return 1.0 / (1.0 + np.exp(-(v / 50.0 - 1.0)))

    # NOTE: the fixture file is one input split, but a repartition here is
    # a measured net loss — the sigmoid is too cheap to amortize the
    # shuffle (bench +0.4s at sf0.1). Fan-out pays only for heavy UDFs;
    # see multimodal_decode for the pattern.
    e = _t(spark, sf_dir, "events")
    return e.select("event_id", F.round(sigmoid("value"), ROUND_RATIO).alias("sigmoid_score"))


@op(
    "apply_in_pandas_zscore",
    oracle=f"""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), {ROUND_WIN}) AS zscore
    FROM events
    """,
    tags=("udf", "applyInPandas", "udaf"),
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the UDAF-equivalent path): per-group
    z-score computed with pandas inside each group, matching the pure-SQL
    window formulation. Groups arrive as whole Arrow batches — state is
    bounded by the largest group, so partition by a high-cardinality key
    at scale."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": ((pdf["value"] - mean) / std).round(ROUND_WIN),
            }
        )

    e = _t(spark, sf_dir, "events")
    return e.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        zscore, schema="event_id bigint, event_type string, zscore double"
    )


@op(
    "row_udf_label",
    oracle="""
    SELECT event_id,
           event_type || ':' || CAST(floor(value) AS BIGINT) AS label
    FROM events
    """,
    tags=("udf", "row_udf", "anti-pattern"),
)
def row_udf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the documented ANTI-PATTERN (per-row
    serde, no vectorization; ~10-100x slower than pandas_udf). Kept for
    surface parity with the reference's arbitrary-Python capability
    (reference polarsai/__init__.py:421-427 strips only imports/overwrites,
    so generated code could always define row fns)."""

    @F.udf(T.StringType())
    def label(event_type: str, value: float) -> str:
        return f"{event_type}:{math.floor(value)}"

    e = _t(spark, sf_dir, "events")
    return e.select("event_id", label("event_type", "value").alias("label"))


@op(
    "ema_per_user",
    # Recursive EMA expressed as a DuckDB recursive CTE: one walk row per
    # user advances rn -> rn+1 applying ema' = a*v + (1-a)*ema, exactly
    # pandas ewm(adjust=False). `ordered` is MATERIALIZED so each
    # iteration joins the window result instead of recomputing it.
    # Validated 0 mismatches vs ewm at all three SFs.
    oracle="""
    WITH RECURSIVE ordered AS MATERIALIZED (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_ev
        FROM events
    ), walk AS (
        SELECT user_id, rn, n_ev, value AS ema FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.rn, o.n_ev, 0.3 * o.value + 0.7 * w.ema
        FROM walk w
        JOIN ordered o ON o.user_id = w.user_id AND o.rn = w.rn + 1
    )
    SELECT user_id, n_ev AS n_events, round(ema, 6) AS ema_value
    FROM walk WHERE rn = n_ev
    """,
    tags=("udf", "applyInPandas", "timeseries", "stateful"),
)
def ema_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average (recursive/iterative operator —
    the applyInPandas batch twin of the applyInPandasWithState streaming
    job in my_polars_ai_spark.streaming.jobs). Stream-vs-batch equality
    is additionally asserted in tests/test_streaming.py."""
    from my_polars_ai_spark.streaming.jobs import ema_batch

    return ema_batch(spark, sf_dir)


@op(
    "udtf_bigrams",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT t.doc_id, w[i] || ' ' || w[i + 1] AS bigram, CAST(i AS INTEGER) AS pos
    FROM t, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
    """,
    tags=("udf", "udtf"),
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one input row fans out to
    N-1 word-bigram rows via LATERAL — the row-expanding UDF surface the
    reference reached through generated explode logic (SURVEY.md §2b UDTF
    row, previously marked optional). The plan is a single
    BatchEvalPythonUDTF over the scan; at 100 TB this parallelizes per
    input split like any narrow stage."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string, pos: int")
    class Bigrams:
        def eval(self, text: str):
            words = (text or "").split(" ")
            for i in range(len(words) - 1):
                yield (words[i] + " " + words[i + 1], i + 1)

    d = _t(spark, sf_dir, "documents")
    view = "udtf_bigrams_docs"
    d.select("doc_id", "text").createOrReplaceTempView(view)
    spark.udtf.register("bigrams_udtf", Bigrams)
    return spark.sql(
        f"SELECT d.doc_id, b.bigram, b.pos FROM {view} d, LATERAL bigrams_udtf(d.text) b"
    )


@op(
    "grouped_agg_sum_squares",
    oracle="""
    WITH v AS (
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(28,6)) * 100 AS HUGEINT) AS cents
        FROM events
    )
    SELECT user_id, CAST(sum(cents * cents) AS BIGINT) AS sum_sq_cents
    FROM v GROUP BY user_id
    """,
    tags=("udf", "pandas_udf", "udaf"),
)
def grouped_agg_sum_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the custom-aggregate (UDAF) flavor of
    the Python surface, completing the scalar (pandas_udf_sigmoid) /
    grouped-map (apply_in_pandas_zscore) / table (udtf_bigrams) set.
    The aggregate is the per-user second moment sum(cents^2): the input
    is converted to exact integer cents JVM-side (DECIMAL cast) so the
    Python body is pure int64 numpy and the result hash-matches SQL.
    Spark plans this as an aggregate node (ArrowAggregatePython after
    one shuffle+sort on the grouping key) that streams Arrow batches
    through the UDF — bounded state per group, never the whole-group
    materialization of applyInPandas."""

    @F.pandas_udf("long")
    def sum_sq(cents: pd.Series) -> int:
        import numpy as np

        a = cents.to_numpy(dtype="int64")
        return int(np.sum(a * a))

    e = _t(spark, sf_dir, "events")
    cents = (
        (F.col("value").cast("decimal(28,6)") * 100)
        .cast("decimal(38,0)").cast("long").alias("cents")
    )
    return (
        e.select("user_id", cents)
        .groupBy("user_id")
        .agg(sum_sq("cents").alias("sum_sq_cents"))
    )


@op(
    "arrow_doc_meta",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_arrow,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_arrow
    FROM documents
    """,
    tags=("udf", "arrow"),
)
def arrow_doc_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the fourth Python execution surface (after scalar
    pandas_udf, GROUPED_AGG, and grouped-map applyInPandas): the UDF
    receives raw ``pyarrow.RecordBatch`` objects and answers with
    RecordBatches, skipping the pandas conversion entirely — the
    zero-copy path for metadata-extraction passes over huge batches.
    The body is pure Arrow compute kernels (utf8_length /
    binary_length), so the only Python cost is orchestration; the
    oracle pins the semantics to plain SQL length functions."""
    import pyarrow as pa

    def batch_meta(batches):
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                ],
                names=["doc_id", "n_chars_arrow", "n_bytes_arrow"],
            )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        batch_meta, schema="doc_id bigint, n_chars_arrow bigint, n_bytes_arrow bigint"
    )


@op(
    "udtf_ngrams_polymorphic",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT t.doc_id,
           w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram,
           CAST(i AS INTEGER) AS pos
    FROM t, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) r
    """,
    tags=("udf", "udtf", "spark4"),
)
def udtf_ngrams_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 `analyze()` API): the output
    schema is computed at plan time from the call's literal arguments
    — here the gram size n=3 names the output column — instead of
    being hard-coded like udtf_bigrams' returnType string. analyze()
    runs on the DRIVER during resolution (AnalyzeResult carries the
    schema), so Catalyst sees precise output columns for pruning; the
    executor-side eval() fan-out is the same narrow row-expanding
    stage. The oracle states trigrams in plain SQL."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType

    class NGrams:
        @staticmethod
        def analyze(text, n):
            from pyspark.sql.functions import AnalyzeResult

            return AnalyzeResult(
                StructType()
                .add("gram", StringType())
                .add("pos", IntegerType())
            )

        def eval(self, text: str, n: int):
            words = (text or "").split(" ")
            for i in range(len(words) - n + 1):
                yield (" ".join(words[i : i + n]), i + 1)

    NGramsUdtf = udtf(NGrams)
    d = _t(spark, sf_dir, "documents")
    view = "udtf_ngrams_docs"
    d.select("doc_id", "text").createOrReplaceTempView(view)
    spark.udtf.register("ngrams_udtf", NGramsUdtf)
    return spark.sql(
        f"SELECT d.doc_id, g.gram, g.pos "
        f"FROM {view} d, LATERAL ngrams_udtf(d.text, 3) g"
    )


@op(
    "arrow_scalar_udf_margin",
    oracle=f"""
    SELECT o_orderkey,
           round(CAST(o_totalprice AS DOUBLE)
                 / (1 + exp(-(CAST(o_totalprice AS DOUBLE) / 100000))), {ROUND_WIN})
               AS margin_score
    FROM orders WHERE o_orderkey % 100 = 0
    """,
    tags=("udf", "arrow"),
)
def arrow_scalar_udf_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED scalar Python UDF (Spark 4 `@udf(useArrow=True)`)
    — the middle rung of the Python-path ladder this module documents:
    row-at-a-time @udf (anti-pattern, row_udf_label) < Arrow-optimized
    @udf (this op: same per-ROW Python function, but batches cross the
    JVM boundary as Arrow so serialization stops dominating) <
    @pandas_udf (pandas_udf_sigmoid: vectorized per-BATCH compute too).
    Same closed-form oracle discipline as the rest of the ladder; the
    modulo filter keeps the Python-side row count bounded."""
    from pyspark.sql.functions import udf

    @udf(returnType=T.DoubleType(), useArrow=True)
    def margin(total: float) -> float:
        return round(total / (1 + math.exp(-(total / 100000))), ROUND_WIN)

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        margin(F.col("o_totalprice").cast("double")).alias("margin_score"),
    )


@op(
    "apply_in_arrow_center",
    oracle="""
    WITH c AS (
        SELECT c_custkey, c_nationkey,
               CAST(CAST(c_acctbal AS DECIMAL(28,6)) * 100 AS BIGINT) AS cents
        FROM customer
    )
    SELECT c_custkey,
           CAST(count(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_in_group,
           CAST(count(*) OVER (PARTITION BY c_nationkey) * cents
                - sum(cents) OVER (PARTITION BY c_nationkey) AS BIGINT)
               AS dev_cents_x_n
    FROM c
    """,
    tags=("udf", "arrow", "spark4"),
)
def apply_in_arrow_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GroupedData.applyInArrow`` (Spark 4) — the grouped-map twin of
    mapInArrow (arrow_doc_meta): the whole group arrives as ONE
    ``pyarrow.Table`` and the body runs pure Arrow compute kernels, no
    pandas materialization. Demonstrated on per-nation mean-centering
    of customer balances kept exact: the emitted deviation is the
    integer ``n*x - S`` (cents scaled by group size), so no float mean
    ever exists and the oracle is plain window SQL. Group state is one
    nation's customers — dimension-bounded; the scale caveat of any
    grouped-map (a whole group in one Arrow buffer) is exactly why the
    windowed-SQL formulation in the oracle is the 100 TB default and
    this op documents the API, not the preferred plan."""
    import pyarrow as pa

    def center(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = table.num_rows
        cents = table.column("cents")
        s = pc.sum(cents).as_py() or 0
        dev = pc.subtract(
            pc.multiply(cents, pa.scalar(n, pa.int64())), pa.scalar(s, pa.int64())
        )
        return pa.Table.from_arrays(
            [
                table.column("c_custkey"),
                pa.array([n] * n, pa.int64()),
                pc.cast(dev, pa.int64()),
            ],
            names=["c_custkey", "n_in_group", "dev_cents_x_n"],
        )

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal").cast("decimal(28,6)") * 100)
        .cast("long")
        .alias("cents"),
    )
    return c.groupBy("c_nationkey").applyInArrow(
        center, schema="c_custkey bigint, n_in_group bigint, dev_cents_x_n bigint"
    )
