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


_SEG_STATUSES = ("F", "O", "P")


@op(
    "pivot_multi_agg",
    oracle=f"""
    SELECT l_returnflag,
           {", ".join(
               f"round(sum(CASE WHEN l_linestatus = '{s}' THEN l_quantity END), {ROUND_MONEY}) AS qty_{s}, "
               f"CAST(count(CASE WHEN l_linestatus = '{s}' THEN 1 END) AS BIGINT) AS n_{s}"
               for s in _SEG_STATUSES
           )}
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("reshape", "pivot", "agg"),
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per pivot value (Polars
    pivot(values=[...], aggregate_function=...) with several measures):
    qty sum AND row count per line status, wide per return flag. The
    explicit value list skips Spark's distinct-discovery job, and the
    result columns are renamed to a stable contract (qty_F/n_F/...)
    because Spark's default `{{value}}_{{agg}}` names would leak agg
    aliases into the schema. One shuffle; each CASE-style pivot cell is
    map-side combinable."""
    li = _t(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", list(_SEG_STATUSES))
        .agg(
            F.round(F.sum("l_quantity"), ROUND_MONEY).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    cols = [F.col("l_returnflag")]
    for s in _SEG_STATUSES:
        cols.append(F.col(f"{s}_qty").alias(f"qty_{s}"))
        # count over zero rows: pivot yields NULL, the oracle's
        # count(CASE...) yields 0 — normalize to 0
        cols.append(F.coalesce(F.col(f"{s}_n"), F.lit(0)).cast("long").alias(f"n_{s}"))
    return pv.select(*cols)
