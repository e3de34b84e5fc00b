"""Text analysis operators: language ID, quality scoring, token counting
(training-data pipeline extensions over the documents table).

All heuristics are deterministic closed-form expressions (JVM-side
functions only) so every one is oracle-checked; swap the scoring
constants freely — the plumbing is what matters at 100 TB (narrow
projections, no shuffle until the final aggregate if any).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_polars_ai_spark.operators.base import ROUND_RATIO, Op, make_registrar
from my_polars_ai_spark.sources.tables import load_table as _t

OPS: dict[str, Op] = {}
op = make_registrar(OPS)

# English-ish stopword markers for the n-gram/stopword language heuristic.
_EN_MARKERS = ("the", "a", "of", "and", "to", "in", "is")
_MARKERS_SQL = "(" + ", ".join(f"'{m}'" for m in _EN_MARKERS) + ")"


@op(
    "lang_id_heuristic",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ') AS ts
        FROM documents
    )
    SELECT doc_id,
           round(len(list_filter(ts, x -> x IN {_MARKERS_SQL})) * 1.0
                 / greatest(len(ts), 1), {ROUND_RATIO}) AS en_marker_ratio,
           CASE WHEN len(list_filter(ts, x -> x IN {_MARKERS_SQL})) * 1.0
                     / greatest(len(ts), 1) >= 0.05
                THEN 'en' ELSE 'other' END AS pred_lang
    FROM t
    """,
    tags=("text", "langid"),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: fraction of tokens that are English
    function words; >= 5% => 'en'. A real pipeline swaps in per-language
    marker sets / char n-gram profiles — same shape, still one narrow
    projection."""
    d = _t(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    markers = F.array(*[F.lit(m) for m in _EN_MARKERS])
    n_marker = F.size(F.filter(ts, lambda x: F.array_contains(markers, x)))
    ratio = n_marker / F.greatest(F.size(ts), F.lit(1))
    return d.select(
        "doc_id",
        F.round(ratio, ROUND_RATIO).alias("en_marker_ratio"),
        F.when(ratio >= 0.05, "en").otherwise("other").alias("pred_lang"),
    )


@op(
    "quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars,
               string_split(text, ' ') AS ts
        FROM documents
    ), m AS (
        SELECT doc_id, n_chars,
               len(ts) AS n_tokens,
               len(list_distinct(ts)) AS n_distinct
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(n_chars * 1.0 / greatest(n_tokens, 1), {ROUND_RATIO}) AS avg_token_len,
           round(n_distinct * 1.0 / greatest(n_tokens, 1), {ROUND_RATIO}) AS distinct_ratio,
           round(0.5 * least(n_tokens / 100.0, 1.0)
                 + 0.5 * (n_distinct * 1.0 / greatest(n_tokens, 1)), {ROUND_RATIO}) AS quality
    FROM m
    """,
    tags=("text", "quality"),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length component + lexical-diversity
    component (the punctuation/stopword-ratio features every LLM-data
    quality filter uses; this corpus has no punctuation so diversity and
    length carry the signal)."""
    d = _t(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    n_tokens = F.size(ts)
    n_distinct = F.size(F.array_distinct(ts))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    diversity = n_distinct / safe_tokens
    quality = 0.5 * F.least(n_tokens / F.lit(100.0), F.lit(1.0)) + 0.5 * diversity
    return d.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(F.col("n_chars") / safe_tokens, ROUND_RATIO).alias("avg_token_len"),
        F.round(diversity, ROUND_RATIO).alias("distinct_ratio"),
        F.round(quality, ROUND_RATIO).alias("quality"),
    )


@op(
    "token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS n_re_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS INTEGER) AS n_bpe_ish,
           n_chars
    FROM documents
    """,
    tags=("text", "tokens"),
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, word regex, and a
    BPE-ish bounded-piece regex (max-4-char chunks approximate subword
    counts without a tokenizer model)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.regexp_count("text", F.lit("[a-z0-9]+")).alias("n_re_tokens"),
        F.regexp_count("text", F.lit("[a-z0-9]{1,4}")).alias("n_bpe_ish"),
        "n_chars",
    )


@op(
    "tfidf_top_terms",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, tok, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok != ''
        GROUP BY doc_id, tok
    ), df AS (
        SELECT tok, count(*) AS df FROM tf GROUP BY tok
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.tok,
               round(tf.tf * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0),
                     {ROUND_RATIO}) AS tfidf
        FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT doc_id, tok, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, tok) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
    tags=("text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed TF-IDF
    (idf = ln((1+N)/(1+df)) + 1, the sklearn-style smooth variant) — the
    standard relevance/topic signal for corpus filtering. Shape: one
    shuffle on (doc, tok) for TF, a partial-agg DF over the (small) vocab
    broadcast back onto it, the corpus size as a broadcast scalar, and a
    per-doc window for the top-3 — no global sort, no Python. Ties broken
    on the token so the top-3 is deterministic on both engines."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0),
                ROUND_RATIO,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "tok", "tfidf", F.col("rk").cast("int").alias("rk"))
    )


@op(
    "training_data_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_tokens,
               round(0.5 * least(len(string_split(text, ' ')) / 100.0, 1.0)
                     + 0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0
                              / greatest(len(string_split(text, ' ')), 1)),
                     {ROUND_RATIO}) AS quality
        FROM documents
    ), filtered AS (
        SELECT * FROM scored WHERE quality >= 0.5 AND n_tokens >= 10
    ), deduped AS (
        SELECT doc_id, n_tokens, quality
        FROM (
            SELECT doc_id, n_tokens, quality,
                   row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM filtered
        ) WHERE rn = 1
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality
    FROM deduped
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
    """,
    tags=("text", "pipeline", "dedup", "sample"),
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation in one plan: quality filter ->
    exact dedup (first doc per text) -> deterministic 50% hash sample.
    The composition every LLM-data pipeline runs, expressed as a single
    Catalyst plan: the quality filter pushes below the dedup shuffle, the
    dedup is one shuffle on the text key, and the hash sample is a narrow
    filter that stays reproducible across engines and runs (same doc ->
    same fate, the property that keeps pipeline stages consistent)."""
    from my_polars_ai_spark.operators.dedup import portable_hash60

    d = _t(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    n_tokens = F.size(ts)
    diversity = F.size(F.array_distinct(ts)) / F.greatest(n_tokens, F.lit(1))
    quality = F.round(
        0.5 * F.least(n_tokens / F.lit(100.0), F.lit(1.0)) + 0.5 * diversity, ROUND_RATIO
    )
    scored = d.select("doc_id", "text", n_tokens.alias("n_tokens"), quality.alias("quality"))
    filtered = scored.filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10))
    w = Window.partitionBy("text").orderBy("doc_id")
    deduped = (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_tokens", "quality")
    )
    return deduped.filter(
        portable_hash60(F.col("doc_id").cast("string")) % 2 == 0
    ).select("doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"), "quality")


@op(
    "top_tokens",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM toks
    WHERE tok != ''
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
    tags=("text", "topk", "vocab"),
)
def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: global top-20 tokens by frequency (tiebreak on the
    token for determinism). Explode -> partial-agg count -> top-k compiles
    to TakeOrderedAndProject: each partition keeps its own top-20, the
    driver merges — no global sort of the vocabulary at any corpus size."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


# BM25 constants (Robertson/Sparck Jones defaults).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("hash", "join", "stream")
_BM25_QUERY_SQL = "(" + ", ".join(f"'{t}'" for t in BM25_QUERY) + ")"


@op(
    "bm25_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks WHERE tok != '' GROUP BY 1
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               sum(dl) * 1.0 / count(*) AS avgdl
        FROM dl
    ), tf AS (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        FROM toks WHERE tok IN {_BM25_QUERY_SQL} GROUP BY 1, 2
    ), df AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), scored AS (
        SELECT tf.doc_id,
               sum(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * ({BM25_K1} + 1.0)
                   / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                                           + {BM25_B} * dl.dl / s.avgdl))) AS score
        FROM tf
        JOIN df USING (tok)
        JOIN dl USING (doc_id)
        CROSS JOIN stats s
        GROUP BY 1
    )
    SELECT doc_id, round(score, {ROUND_RATIO}) AS bm25
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
    tags=("text", "search", "bm25"),
)
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text relevance ranking: BM25 top-20 docs for a fixed query
    (k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5))) — TF-IDF's
    production successor and the classic retrieval baseline. The term
    filter prunes the exploded token stream to query terms BEFORE the TF
    shuffle (at 100 TB the scan emits only query-term hits); doc lengths
    are one narrow aggregate; df and the corpus stats ride broadcasts;
    top-20 compiles to TakeOrderedAndProject."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", F.round("score", ROUND_RATIO).alias("bm25"))
    )
