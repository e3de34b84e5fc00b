"""Fuzzy matching + deterministic sampling + ordered string aggregation
(rounding out the text/dedup toolbox with fully oracle-checked ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_polars_ai_spark.operators.base import Op, make_registrar
from my_polars_ai_spark.operators.dedup import portable_hash60
from my_polars_ai_spark.sources.tables import load_table as _t

OPS: dict[str, Op] = {}
op = make_registrar(OPS)


@op(
    "fuzzy_levenshtein_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
    tags=("fuzzy", "dedup", "string"),
)
def fuzzy_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-match pairs by edit distance over the distinct name
    vocabulary — the entity-resolution primitive. Pairing happens on the
    DISTINCT values (vocab, not corpus) under a LOSSLESS length-bucket
    blocking key: edit distance <= 4 bounds |len(a)-len(b)| <= 4, so with
    buckets of width 8 a qualifying pair's buckets differ by at most 1;
    side b fans out to {bk-1, bk, bk+1} and the join is a plain equi-join
    on the bucket — no BroadcastNestedLoopJoin over vocab^2.  Because the
    blocking provably loses no pairs, the oracle stays the unblocked
    all-pairs SQL and the match certifies losslessness.  Each qualifying
    pair matches on exactly one key (the three fan-out keys are distinct),
    so no dedup pass is needed.  At 100 TB, bucket-key cardinality (a few
    length bands) caps join parallelism — compose with a second lossless
    key (e.g. PassJoin segment signatures) or salt the bucket."""
    p = _t(spark, sf_dir, "part")
    names = p.select("p_name").distinct().cache()
    bk = F.floor(F.length("p_name") / 8).cast("long")
    a = names.select(F.col("p_name").alias("name_a"), bk.alias("bk"))
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.explode(F.array(bk - 1, bk, bk + 1)).alias("bk"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "bk")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b", dist.alias("edit_dist"))
        .filter(F.col("edit_dist") <= 4)
    )


@op(
    "hash_sample",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
    """,
    tags=("sample",),
)
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by key hash — reproducible across engines
    and runs, unlike rand()-based sampling; the pattern that keeps samples
    consistent between pipeline stages at 100 TB (same key => same fate)."""
    e = _t(spark, sf_dir, "events")
    return e.filter(
        portable_hash60(F.col("event_id").cast("string")) % 10 == 0
    ).select("event_id", "user_id", "event_type")


@op(
    "string_agg_per_group",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
           CAST(count(DISTINCT l_linestatus) AS INTEGER) AS n_statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "string"),
)
def string_agg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (group_concat/string_agg surface):
    collect_set + array_sort + array_join keeps the result deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    statuses = F.array_sort(F.collect_set("l_linestatus"))
    return li.groupBy("l_returnflag").agg(
        F.array_join(statuses, ",").alias("statuses"),
        F.size(F.collect_set("l_linestatus")).alias("n_statuses"),
    )
