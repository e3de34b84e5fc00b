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


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """Forward as-of join: for each left row, attach the EARLIEST right
    row with ``right.on >= left.on`` within the same ``by`` group —
    Polars join_asof(strategy="forward"). Same union trick as backward,
    mirrored: first(ignorenulls) over (current row, unbounded following),
    with left rows sorting before right rows at equal timestamps so the
    match stays inclusive."""
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    r = right.select(by, on, *value_cols).withColumn("__side", F.lit(0))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = [F.first(c, ignorenulls=True).over(w).alias(c) for c in value_cols]
    out = unioned.select(*lcols, F.col("__side"), *carried)
    return out.filter(F.col("__side") == 1).drop("__side")


def _views_deduped(e: DataFrame, ts_alias: str, value_alias: str) -> DataFrame:
    """view events deduped per (user, ts) so as-of ties are deterministic."""
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return (
        e.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias(ts_alias),
            F.round("value", ROUND_WIN).alias(value_alias),
        )
        .withColumn("ts", F.col(ts_alias))
    )


@op(
    "asof_join_forward",
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
           v.view_ts AS next_view_ts,
           round(v.view_value, {ROUND_WIN}) AS next_view_value
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts <= v.view_ts
    """,
    tags=("join", "asof"),
)
def asof_join_purchases_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's next view at-or-after it — forward
    as-of join (Polars strategy='forward')."""
    e = _t(spark, sf_dir, "events")
    views = _views_deduped(e, "view_ts", "next_view_value")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    joined = asof_join_forward(
        purchases,
        views.select("user_id", "ts", "view_ts", "next_view_value"),
        on="ts",
        by="user_id",
        value_cols=["view_ts", "next_view_value"],
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("view_ts").alias("next_view_ts"), "next_view_value"
    )


@op(
    "asof_join_nearest",
    oracle="""
    WITH views AS (
        SELECT user_id, ts AS view_ts
        FROM (
            SELECT user_id, ts,
                   row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ) WHERE rn = 1
    ), purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), paired AS (
        SELECT p.event_id, p.user_id, p.ts,
               vb.view_ts AS back_ts, vf.view_ts AS fwd_ts
        FROM purchases p
        ASOF LEFT JOIN views vb ON p.user_id = vb.user_id AND p.ts >= vb.view_ts
        ASOF LEFT JOIN views vf ON p.user_id = vf.user_id AND p.ts <= vf.view_ts
    )
    SELECT event_id, user_id, ts,
           CASE
             WHEN back_ts IS NULL THEN fwd_ts
             WHEN fwd_ts IS NULL THEN back_ts
             WHEN epoch_us(ts) - epoch_us(back_ts) <= epoch_us(fwd_ts) - epoch_us(ts) THEN back_ts
             ELSE fwd_ts
           END AS nearest_view_ts,
           least(coalesce(epoch_us(ts) - epoch_us(back_ts), 9223372036854775807),
                 coalesce(epoch_us(fwd_ts) - epoch_us(ts), 9223372036854775807)) AS delta_us
    FROM paired
    WHERE back_ts IS NOT NULL OR fwd_ts IS NOT NULL
    """,
    tags=("join", "asof"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (Polars strategy='nearest'): closest view in
    either direction, ties broken backward. Composed from the backward +
    forward union-trick joins — still one shuffle key (user_id), no
    Python."""
    e = _t(spark, sf_dir, "events")
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    views = (
        e.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("ts").alias("view_ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    back = asof_join_backward(
        purchases, views.select("user_id", "ts", F.col("view_ts").alias("back_ts")),
        on="ts", by="user_id", value_cols=["back_ts"],
    )
    both = asof_join_forward(
        back, views.select("user_id", "ts", F.col("view_ts").alias("fwd_ts")),
        on="ts", by="user_id", value_cols=["fwd_ts"],
    )
    # exact integer microseconds on both engines (DuckDB epoch() is
    # fractional and CAST rounds while Spark truncates — off-by-one traps)
    d_back = F.unix_micros("ts") - F.unix_micros("back_ts")
    d_fwd = F.unix_micros("fwd_ts") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("back_ts").isNull(), F.col("fwd_ts"))
        .when(F.col("fwd_ts").isNull(), F.col("back_ts"))
        .when(d_back <= d_fwd, F.col("back_ts"))
        .otherwise(F.col("fwd_ts"))
    )
    big = F.lit(9223372036854775807)
    delta = F.least(F.coalesce(d_back, big), F.coalesce(d_fwd, big)).cast("bigint")
    return (
        both.filter(F.col("back_ts").isNotNull() | F.col("fwd_ts").isNotNull())
        .select("event_id", "user_id", "ts", nearest.alias("nearest_view_ts"), delta.alias("delta_us"))
    )
