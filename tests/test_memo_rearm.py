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


class _DeadContext:
    _jsc = None


class _DeadSession:
    """Mimics a stopped classic SparkSession: sparkContext._jsc is None."""

    sparkContext = _DeadContext()


class _UnreachableSession:
    """Mimics a torn-down session whose context raises on access."""

    @property
    def sparkContext(self):
        raise RuntimeError("SparkContext stopped")


class _ConnectLikeSession:
    """Mimics a LIVE Spark Connect session: sparkContext access raises
    PySparkNotImplementedError (a NotImplementedError subclass), and
    liveness is exposed via ``is_stopped`` instead (r14 advice — the
    API being unavailable must not read as the session being dead)."""

    def __init__(self, stopped: bool = False):
        self.is_stopped = stopped

    @property
    def sparkContext(self):
        raise NotImplementedError("sparkContext is not implemented on Connect")


class _BrokenProbeSession:
    """Mimics a Connect session whose ``is_stopped`` property ITSELF
    raises (dropped client connection). The r15 advice case: the
    raising probe must read as stopped/unreachable, not escape the
    eviction pass and break every memo getter."""

    @property
    def sparkContext(self):
        raise NotImplementedError("sparkContext is not implemented on Connect")

    @property
    def is_stopped(self):
        raise RuntimeError("client connection lost")


class _ProbelessRaisingSession:
    """Mimics a session class whose sparkContext raises AttributeError
    and which exposes NO ``is_stopped`` at all: no liveness signal
    remains, so it must be evicted rather than assumed live forever
    (the r13 pin-forever leak the r15 advice flagged as quietly
    reintroduced for this class)."""

    @property
    def sparkContext(self):
        raise AttributeError("no sparkContext on this session class")


def test_evict_stopped_sessions_drops_dead_keys_keeps_live(spark):
    from my_polars_ai_spark.operators.base import evict_stopped_sessions

    live_connect = _ConnectLikeSession(stopped=False)
    memo = {
        (spark, "/sf"): "live",
        (_DeadSession(), "/sf"): "dead",
        (_UnreachableSession(), "/sf", 64, 16): "unreachable",
        (live_connect, "/sf"): "live-connect",
        (_ConnectLikeSession(stopped=True), "/sf"): "stopped-connect",
        (_BrokenProbeSession(), "/sf"): "broken-probe",
        (_ProbelessRaisingSession(), "/sf"): "probe-less",
    }
    evict_stopped_sessions(memo)
    assert list(memo.values()) == ["live", "live-connect"]


def test_memo_getters_evict_dead_session_entries(spark, sf_dir):
    """Every session-memo getter evicts stopped-session entries on
    access (r13 advice: a stopped session's entry pins JVM-backed
    DataFrames — including cache-marked subtrees — forever in a
    long-lived multi-session process)."""
    from my_polars_ai_spark.operators import classic_ml, dedup, similarity

    dead_keys = [
        (similarity._ANN_FRAMES, (_DeadSession(), "/dead/sf")),
        (dedup._LSH_PAIRED, (_DeadSession(), "/dead/sf", 64, 16, 0.95, 1)),
        (classic_ml._QGD_XY, (_DeadSession(), "/dead/sf")),
        (classic_ml._QGD_ARTIFACTS, (_DeadSession(), "/dead/sf")),
    ]
    for memo, key in dead_keys:
        memo[key] = ("sentinel",)
    # touch each getter with the live session; the dead entry must go
    similarity._ann_index_frames(spark, sf_dir)
    dedup.minhash_lsh_pairs(spark, sf_dir)
    classic_ml.qgd_train_artifacts(spark, sf_dir)
    for memo, key in dead_keys:
        assert key not in memo, key
        # the live session's entry survives the eviction pass
        assert any(k[0] is spark for k in memo), memo.keys()
