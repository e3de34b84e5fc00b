"""Session-memo self-healing after an external spark.catalog.clearCache().

The LSH candidate pipeline (dedup._LSH_PAIRED) and the GD trainer's
corpus tables (classic_ml._QGD_XY) are memoized per (session, sf_dir)
so every consumer in a long-lived session shares ONE set of cache
fills. An external clearCache() (bench.py's isolated re-measure, a
user resetting the session) unregisters those plans from the
CacheManager without the memo knowing; before rearm_cached, every
subsequent execution recomputed the full lineage — the LSH diamond
re-executed its signature subtree once per self-join side (measured
12.7s vs 1.1s at sf0.1 in BENCH terms). These tests pin the
self-heal: after clearCache, one memo-hit call re-registers the cache
marks (storageLevel lookup is a CacheManager probe, no job) and the
results stay identical.
"""

from __future__ import annotations


def _is_registered(df) -> bool:
    lvl = df.storageLevel
    return bool(lvl.useMemory or lvl.useDisk)


def test_lsh_memo_rearms_after_clearcache(spark, sf_dir):
    from my_polars_ai_spark.operators import dedup

    before = dedup.minhash_lsh_pairs(spark, sf_dir)
    n_before = before.count()

    key = next(k for k in dedup._LSH_PAIRED if k[0] is spark and k[1] == sf_dir)
    _, cached_subtrees = dedup._LSH_PAIRED[key]
    assert all(_is_registered(f) for f in cached_subtrees)

    spark.catalog.clearCache()
    assert not any(_is_registered(f) for f in cached_subtrees)

    after = dedup.minhash_lsh_pairs(spark, sf_dir)
    # the memo hit must have re-registered the cache marks...
    assert all(_is_registered(f) for f in cached_subtrees)
    # ...and the op's result is unchanged
    assert after.count() == n_before


def test_qgd_memo_rearms_after_clearcache(spark, sf_dir):
    from my_polars_ai_spark.operators import classic_ml

    x, y = classic_ml._qgd_xy(spark, sf_dir)
    n_x = x.count()
    assert _is_registered(x) and _is_registered(y)

    spark.catalog.clearCache()
    assert not _is_registered(x) and not _is_registered(y)

    # an artifact-memo hit routes through _qgd_xy, so even the trainer
    # entry point self-heals
    classic_ml.qgd_train_artifacts(spark, sf_dir)
    x2, y2 = classic_ml._qgd_xy(spark, sf_dir)
    assert x2 is x and y2 is y
    assert _is_registered(x) and _is_registered(y)
    assert x.count() == n_x
