"""As-of join — the one reference-surface operator with no single Spark
verb (Polars join_asof, SURVEY.md §7 hard part #3).

Spark-first strategy (the "union trick"): tag both sides, union them,
and carry the right side's latest value forward with
``last(..., ignorenulls=True)`` over a per-key ordered window. One
shuffle on the join key, bounded state, no per-group Python — this is the
scalable pattern (the applyInPandas + pd.merge_asof alternative ships
every group through Arrow and is kept only as a fallback in
my_polars_ai_spark.functions.pandas_fallbacks).

Semantics: backward as-of (right.ts <= left.ts), inclusive, per key —
matching Polars join_asof(strategy="backward") and DuckDB ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_polars_ai_spark.operators.base import Op, make_registrar
from my_polars_ai_spark.sources.tables import load_table as _t

OPS: dict[str, Op] = {}
op = make_registrar(OPS)

ROUND_WIN = 4


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic backward as-of join: for each left row, attach the most
    recent right row with ``right.on <= left.on`` within the same ``by``
    group. Returns the left columns plus ``value_cols`` from the right.

    Right-side ties on ``on`` are resolved to the row that sorts last
    (callers wanting full determinism should pre-dedupe the right side).
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        by, on, *value_cols
    ).withColumn("__side", F.lit(0))
    unioned = l.unionByName(r, allowMissingColumns=True)
    # Right rows sort before left rows at equal timestamps => inclusive match.
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols]
    out = unioned.select(*lcols, F.col("__side"), *carried)
    return out.filter(F.col("__side") == 1).drop("__side")


@op(
    "asof_join_backward",
    oracle=f"""
    WITH views AS (
        SELECT user_id, ts AS view_ts, value AS view_value
        FROM (
            SELECT user_id, ts, value,
                   row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ) WHERE rn = 1
    ), purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           v.view_ts AS last_view_ts,
           round(v.view_value, {ROUND_WIN}) AS last_view_value
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    """,
    tags=("join", "asof"),
)
def asof_join_purchases_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent prior (or simultaneous)
    view — backward as-of join via the union trick."""
    e = _t(spark, sf_dir, "events")
    # Deduplicate right side per (user, ts) so ties are deterministic.
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    views = (
        e.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.round("value", ROUND_WIN).alias("last_view_value"),
        )
        .withColumn("ts", F.col("view_ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = asof_join_backward(
        purchases,
        views.select("user_id", "ts", "view_ts", "last_view_value"),
        on="ts",
        by="user_id",
        value_cols=["view_ts", "last_view_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("view_ts").alias("last_view_ts"),
        "last_view_value",
    )
