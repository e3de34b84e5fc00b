"""Reshaping operators: pivot (long->wide), unpivot (wide->long), explode
(SURVEY.md §2b reshaping rows; Polars pivot/melt/explode surface).

Scale notes: pivot with an explicit value list avoids the extra
distinct-collect job Spark otherwise runs to discover pivot values;
explode is a narrow transformation (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_polars_ai_spark.operators.base import ROUND_MONEY, Op, make_registrar
from my_polars_ai_spark.sources.tables import load_table as _t

OPS: dict[str, Op] = {}
op = make_registrar(OPS)


@op(
    "pivot_status_qty",
    oracle=f"""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), {ROUND_MONEY}) AS qty_F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), {ROUND_MONEY}) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("reshape", "pivot"),
)
def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long->wide with an explicit value list (no value-discovery job)."""
    li = _t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), ROUND_MONEY))
    )
    return piv.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


@op(
    "unpivot_metrics",
    oracle=f"""
    WITH wide AS (
        SELECT l_returnflag,
               round(sum(l_quantity), {ROUND_MONEY}) AS sum_qty,
               round(sum(l_extendedprice), {ROUND_MONEY}) AS sum_price
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide->long (Polars melt surface; Spark df.unpivot)."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), ROUND_MONEY).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), ROUND_MONEY).alias("sum_price"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@op(
    "explode_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (
        SELECT unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    WHERE token != ''
    GROUP BY token
    """,
    tags=("reshape", "explode", "text"),
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode + count — list-column to rows (Polars explode
    surface), also the first stage of every text-analysis pipeline."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
