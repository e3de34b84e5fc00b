"""Property-based operator correctness (SURVEY.md §5 test plan row 4):
random small frames -> the same relational operation in Spark and DuckDB
must agree. Integer domains keep the comparison exact (float rounding
conventions are covered by the oracle harness instead)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

KEYS = st.sampled_from(["a", "b", "c", "d"])
ROWS = st.lists(
    st.tuples(KEYS, st.integers(min_value=-1000, max_value=1000)),
    min_size=0,
    max_size=50,
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _to_pdf(rows):
    return pd.DataFrame(rows, columns=["k", "v"]) if rows else pd.DataFrame({"k": pd.Series(dtype="object"), "v": pd.Series(dtype="int64")})


@given(rows=ROWS, threshold=st.integers(min_value=-1000, max_value=1000))
@_SETTINGS
def test_filter_count_matches_duckdb(spark, rows, threshold):
    pdf = _to_pdf(rows)
    sdf = spark.createDataFrame(pdf) if len(pdf) else spark.createDataFrame(pdf, schema="k string, v long")
    got = sdf.filter(F.col("v") > threshold).count()
    con = duckdb.connect()
    con.register("t", pdf)
    (want,) = con.execute("SELECT count(*) FROM t WHERE v > ?", [threshold]).fetchone()
    assert got == want


@given(rows=ROWS)
@_SETTINGS
def test_group_agg_matches_duckdb(spark, rows):
    pdf = _to_pdf(rows)
    sdf = spark.createDataFrame(pdf) if len(pdf) else spark.createDataFrame(pdf, schema="k string, v long")
    got = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in sdf.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            "SELECT k, CAST(sum(v) AS BIGINT), count(*), min(v), max(v) FROM t GROUP BY k"
        ).fetchall()
    }
    assert got == want


@given(left=ROWS, right=ROWS)
@_SETTINGS
def test_inner_join_count_matches_duckdb(spark, left, right):
    lp, rp = _to_pdf(left), _to_pdf(right)
    ls = spark.createDataFrame(lp) if len(lp) else spark.createDataFrame(lp, schema="k string, v long")
    rs = (spark.createDataFrame(rp) if len(rp) else spark.createDataFrame(rp, schema="k string, v long")).withColumnRenamed("v", "w")
    got = ls.join(rs, "k").count()
    con = duckdb.connect()
    con.register("l", lp)
    con.register("r", rp)
    (want,) = con.execute("SELECT count(*) FROM l JOIN r USING (k)").fetchone()
    assert got == want


@given(rows=ROWS)
@_SETTINGS
def test_distinct_and_sort_match_duckdb(spark, rows):
    pdf = _to_pdf(rows)
    sdf = spark.createDataFrame(pdf) if len(pdf) else spark.createDataFrame(pdf, schema="k string, v long")
    got = [tuple(r) for r in sdf.select("k", "v").distinct().orderBy("k", "v").collect()]
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute("SELECT DISTINCT k, v FROM t ORDER BY k, v").fetchall()
    assert got == [tuple(r) for r in want]


def test_ratio_round_matches_exact_half_up(spark):
    """base.ratio_round must equal exact rational half-up rounding for a
    wide sweep of numerators/denominators (including half-way ties, the
    cases where round(double, s) diverges between engines), and its
    DuckDB twin must agree value-for-value."""
    import random
    from fractions import Fraction

    from my_polars_ai_spark.operators.base import oracle_ratio_round, ratio_round

    rng = random.Random(7)
    pairs = [(rng.randint(0, 10**12), rng.randint(1, 10**9)) for _ in range(150)]
    # deliberate half-way ties at scale 6: num/den = x.xxxxxx5 exactly
    pairs += [(15, 2 * 10**7), (25, 2 * 10**7), (3, 2 * 10**6), (1, 2)]

    sdf = spark.createDataFrame(pairs, "num long, den long")
    got = {
        (r.num, r.den): r.q
        for r in sdf.select("num", "den", ratio_round(F.col("num"), F.col("den")).alias("q")).collect()
    }
    con = duckdb.connect()
    dd = {
        (num, den): con.execute(
            f"SELECT {oracle_ratio_round(str(num), str(den))}"
        ).fetchone()[0]
        for num, den in pairs
    }
    for num, den in pairs:
        scaled = Fraction(num, den) * 10**6
        expected = int(scaled) + (1 if scaled - int(scaled) >= Fraction(1, 2) else 0)
        expected /= 10**6
        assert got[(num, den)] == expected, (num, den)
        assert dd[(num, den)] == expected, (num, den)


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=1, max_value=10**12),
        ),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_ratio_round_is_decimal_half_up(spark, pairs):
    """base.ratio_round must equal Decimal ROUND_HALF_UP at scale 6 for
    any non-negative integer ratio whose scaled value stays inside
    double's 2^53 integer range (the documented contract — beyond it
    both engines take the identical nearest-double value, which is
    engine-portable but no longer decimal-exact; hypothesis found the
    num/den ~ 4e14 edge)."""
    from decimal import ROUND_HALF_UP, Decimal

    from my_polars_ai_spark.operators.base import ratio_round

    pdf = pd.DataFrame(pairs, columns=["num", "den"])
    sdf = spark.createDataFrame(pdf)
    got = [
        r.r for r in
        sdf.select(ratio_round(F.col("num"), F.col("den")).alias("r")).collect()
    ]
    want = [
        float((Decimal(2 * 10**6 * n + d) // (2 * Decimal(d))) / Decimal(10**6))
        for n, d in pairs
    ]
    for g, w, (n, d) in zip(got, want, pairs):
        ref = (Decimal(n) / Decimal(d)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        assert g == w == float(ref), (n, d, g, w, ref)


@given(
    ab=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_zorder_interleave_roundtrips(spark, ab):
    """The generated Morton SQL must match bit interleaving exactly and
    be invertible (de-interleave recovers both inputs)."""
    from my_polars_ai_spark.operators.extras import _zorder_interleave_sql

    pdf = pd.DataFrame(ab, columns=["a", "b"])
    sdf = spark.createDataFrame(pdf)
    got = [
        r.z for r in
        sdf.select(F.expr(_zorder_interleave_sql("a", "b", "DIV")).alias("z")).collect()
    ]

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    def deinterleave(z):
        a = b = 0
        for i in range(16):
            a |= ((z >> (2 * i)) & 1) << i
            b |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    for z, (a, b) in zip(got, ab):
        assert z == morton(a, b)
        assert deinterleave(z) == (a, b)


@given(xs=st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=40))
@_SETTINGS
def test_log2_bucket_matches_bit_length(spark, xs):
    from my_polars_ai_spark.operators.extras import _log2_bucket_sql

    pdf = pd.DataFrame({"x": xs})
    sdf = spark.createDataFrame(pdf)
    got = [r.b for r in sdf.select(F.expr(_log2_bucket_sql("x", 41)).alias("b")).collect()]
    want = [x.bit_length() - 1 if x > 0 else -1 for x in xs]
    assert got == want


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=-(10**9), max_value=10**9),
            st.integers(min_value=1, max_value=10**12),
        ),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_signed_ratio_round_matches_decimal(spark, pairs):
    """base.signed_ratio_round == Decimal ROUND_HALF_UP (half away from
    zero) for signed numerators inside the 2^53 contract domain."""
    from decimal import ROUND_HALF_UP, Decimal

    from my_polars_ai_spark.operators.base import signed_ratio_round

    pdf = pd.DataFrame(pairs, columns=["num", "den"])
    sdf = spark.createDataFrame(pdf)
    got = [
        r.r for r in
        sdf.select(signed_ratio_round(F.col("num"), F.col("den")).alias("r")).collect()
    ]
    for g, (n, d) in zip(got, pairs):
        ref = (Decimal(n) / Decimal(d)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        assert g == float(ref), (n, d, g, ref)


@given(
    xs=st.lists(
        st.floats(min_value=-10.0, max_value=10.0, width=32,
                  allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_ieee_floor_micro_conversion_is_engine_identical(spark, xs):
    """The sign-split floor(abs(x)*1e6 + 0.5) micro conversion (used by
    int8_quantize_embeddings) must agree between Spark and DuckDB for
    arbitrary float32 inputs — the portable alternative to
    double->DECIMAL casts, which diverge on shortest-repr rounding."""
    pdf = pd.DataFrame({"x": pd.array(xs, dtype="float32")})
    sdf = spark.createDataFrame(pdf)
    got = [
        r.vm for r in sdf.select(
            (F.when(F.col("x") < 0, -1).otherwise(1)
             * F.floor(F.abs(F.col("x").cast("double")) * 1000000 + F.lit(0.5))
             ).cast("long").alias("vm")
        ).collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    want = [r[0] for r in con.execute(
        "SELECT (CASE WHEN x < 0 THEN -1 ELSE 1 END)"
        " * CAST(floor(abs(CAST(x AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
        " FROM t"
    ).fetchall()]
    assert got == want


@given(
    sets=st.lists(
        st.frozensets(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_prefix_filter_bound_is_lossless(sets):
    """The prefix-filtering theorem behind dedup_prefix_filter_jaccard,
    property-tested in pure Python: under ANY document-frequency-
    consistent total token order, two sets with Jaccard >= 0.95 must
    share at least one token within each other's prefix of length
    n - ceil(0.95*n) + 1 (computed with the exact integer ceil the
    operator uses). If this ever fails, the operator's candidate join
    has a recall hole."""
    from collections import Counter
    from fractions import Fraction

    df = Counter()
    for s in sets:
        for tok in s:
            df[tok] += 1
    order = sorted(df, key=lambda t: (df[t], t))
    rank = {t: i for i, t in enumerate(order)}
    t95 = Fraction(95, 100)
    for i, a in enumerate(sets):
        for b in sets[i + 1 :]:
            inter = len(a & b)
            union = len(a | b)
            if Fraction(inter, union) < t95:
                continue
            # exact integer prefix length: n - ceil(95n/100) + 1
            pa = sorted(a, key=rank.__getitem__)[: len(a) - (95 * len(a) + 99) // 100 + 1]
            pb = sorted(b, key=rank.__getitem__)[: len(b) - (95 * len(b) + 99) // 100 + 1]
            # the operator equi-joins PREFIX against PREFIX, so the claim
            # it stands on is the stronger one: the two prefixes intersect
            assert set(pa) & set(pb), (a, b, pa, pb)
            # ...which implies the per-set form of the theorem too
            assert any(x in b for x in pa), (a, b, pa)
            assert any(x in a for x in pb), (a, b, pb)


@given(
    m=st.integers(min_value=0, max_value=10**9),
    n=st.integers(min_value=1, max_value=10**9),
)
@_SETTINGS
def test_half_up_micro_identity(m, n):
    """The (2*1e6*m + n) // (2n) spelling used across the session-2 ops
    (RRF terms, linear attribution shares, density ranks, LCC, WOE
    weights) IS round-half-up(1e6 * m / n) — checked against exact
    Fraction arithmetic, no floats anywhere."""
    from fractions import Fraction

    got = (2 * 10**6 * m + n) // (2 * n)
    x = Fraction(10**6 * m, n)
    frac = x - (x.numerator // x.denominator)
    want = x.numerator // x.denominator + (1 if frac >= Fraction(1, 2) else 0)
    assert got == want


@given(
    e1=st.integers(min_value=0, max_value=40_000),
    delta=st.integers(min_value=0, max_value=4_000),
)
@_SETTINGS
def test_business_day_closed_form_matches_brute_loop(e1, delta):
    """business_days_lead_time's closed form f(b) - f(a) with
    f(d) = 5*(m//7) + min(m%7, 5), m = epoch_day + 3, must equal the
    brute count of weekdays in [a, b) for arbitrary epoch-day ranges."""
    import datetime as dt

    e2 = e1 + delta

    def f(e):
        m = e + 3
        return 5 * (m // 7) + min(m % 7, 5)

    got = f(e2) - f(e1)
    d0 = dt.date(1970, 1, 1)
    want = sum(
        1
        for e in range(e1, e2)
        if (d0 + dt.timedelta(days=e)).weekday() < 5
    )
    assert got == want


@given(
    n=st.integers(min_value=1, max_value=5000),
    k=st.sampled_from([10]),
)
@settings(max_examples=200, deadline=None)
def test_bucketed_ntile_arithmetic_matches_definition(n, k):
    """The closed-form tile assignment used by gains_chart_langid's
    two-pass scheme (first n%k tiles get floor(n/k)+1 rows, the rest
    floor(n/k)) must equal ntile-by-construction for every rank at any
    N — pure integer arithmetic, no Spark needed."""
    base, rem = divmod(n, k)
    # ntile by construction: deal rows into k tiles left to right
    sizes = [base + 1 if t < rem else base for t in range(k)]
    want = []
    for tile, sz in enumerate(sizes, start=1):
        want.extend([tile] * sz)
    safe_base = max(base, 1)
    for g in range(1, n + 1):  # g = 1-indexed global rank
        cutoff = rem * (base + 1)
        if g <= cutoff:
            got = (g + base) // (base + 1)
        else:
            got = rem + (g - cutoff + safe_base - 1) // safe_base
        assert got == want[g - 1], (n, k, g)


@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
                max_codepoint=0x10FFF,
            ),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
@_SETTINGS
def test_portable_hash60_matches_duckdb_on_arbitrary_unicode(spark, words):
    """portable_hash60 is the keystone every banded/bucketed oracle
    comparison stands on: Spark's conv(substr(md5)) and DuckDB's
    ('0x'||substr(md5))::BIGINT must agree on ARBITRARY unicode, not
    just the five hand-picked words of the unit test (md5 operates on
    UTF-8 bytes in both engines; this pins the encoding seam)."""
    from my_polars_ai_spark.operators.dedup import portable_hash60

    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {r.w: r.h for r in df.select("w", portable_hash60(F.col("w")).alias("h")).collect()}
    con = duckdb.connect()
    for w in words:
        (want,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [w]
        ).fetchone()
        assert got[w] == want, f"hash mismatch on {w!r}"


# ---------------------------------------------------------------------------
# Round-8 Gopher decision table: random token documents -> the Spark
# rule projection must equal a direct pure-Python evaluation of the
# same integer rules (catches any drift between the cross-multiplied
# column expressions and the intended rule semantics).

_GOPHER_TOKENS = st.sampled_from(
    ["the", "a", "of", "spark", "batch", "merge", "xx", "verylongtokenword",
     "q", "table", "window", "join"]
)
_GOPHER_DOCS = st.lists(
    st.lists(_GOPHER_TOKENS, min_size=1, max_size=120), min_size=1, max_size=8
)


def _gopher_ref(tokens):
    from my_polars_ai_spark.operators.text import (
        _EN_MARKERS,
        GOPHER_FRAC_DEN,
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
    )

    n = len(tokens)
    sum_len = sum(len(t) for t in tokens)
    n_stop = sum(t in _EN_MARKERS for t in tokens)
    n_distinct = len(set(tokens))
    top_cnt = max(tokens.count(t) for t in set(tokens))
    f = (
        int(GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS),
        int(GOPHER_MIN_MEAN_LEN * n <= sum_len <= GOPHER_MAX_MEAN_LEN * n),
        int(n_stop >= GOPHER_MIN_STOPWORDS),
        int(GOPHER_FRAC_DEN * n_distinct >= n),
        int(GOPHER_FRAC_DEN * top_cnt <= n),
    )
    return (n, *f, int(all(f)))


@given(docs=_GOPHER_DOCS)
@_SETTINGS
def test_gopher_flags_match_pure_python_reference(spark, docs):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(toks) for toks in docs],
            "lang": "en",
            "source": "srcX",
            "n_chars": [len(" ".join(toks)) for toks in docs],
        }
    )
    sdf = spark.createDataFrame(pdf)
    from my_polars_ai_spark.operators.text import gopher_flags_frame

    got = {
        r.doc_id: (
            r.n_tokens, r.flag_word_count, r.flag_mean_word_len,
            r.flag_stopwords, r.flag_distinct_frac, r.flag_top_token, r.keep,
        )
        for r in gopher_flags_frame(sdf).collect()
    }
    want = {i: _gopher_ref(toks) for i, toks in enumerate(docs)}
    assert got == want


VEC = st.lists(
    st.floats(min_value=-10.0, max_value=10.0,
              allow_nan=False, allow_infinity=False, width=32),
    min_size=2, max_size=8,
)


@given(vecs=st.lists(VEC, min_size=1, max_size=6))
@_SETTINGS
def test_int8_export_quantization_matches_pure_python(spark, vecs, tmp_path_factory):
    """The int8 export manifest's array-fold quantization against a
    pure-Python reference over arbitrary float vectors: the record's
    code CSV must equal the sign-split half-away-from-zero micro
    conversion followed by the exact absmax rational (|q| <= 127;
    zero-maxabs vectors excluded), and the byte geometry must be
    n_dims + 8 — the loader-facing contract, independent of the
    DuckDB oracle's relational formulation."""
    import math
    import os

    pdf = pd.DataFrame({
        "vec_id": list(range(len(vecs))),
        "embedding": [[float(x) for x in v] for v in vecs],
    })
    tmp = tmp_path_factory.mktemp("i8prop")
    path = os.path.join(str(tmp), "embeddings.parquet")
    spark.createDataFrame(pdf, schema="vec_id long, embedding array<double>").write.mode(
        "overwrite"
    ).parquet(path)

    def micro(x: float) -> int:
        s = -1 if x < 0 else 1
        return s * math.floor(abs(x) * 1000000 + 0.5)

    expected: dict[int, tuple[str, int, int]] = {}
    for vid, v in enumerate(vecs):
        vm = [micro(x) for x in v]
        maxabs = max(abs(m) for m in vm)
        if maxabs <= 0:
            continue  # unquantizable — the op must drop it
        qs = [
            (-1 if m < 0 else 1) * ((2 * abs(m) * 127 + maxabs) // (2 * maxabs))
            for m in vm
        ]
        assert all(abs(q) <= 127 for q in qs)
        expected[vid] = (",".join(str(q) for q in qs), maxabs, len(v) + 8)

    from my_polars_ai_spark.operators import all_ops

    rows = all_ops()["int8_vector_export_manifest"].fn(spark, str(tmp)).collect()
    got = {r.vec_id: r for r in rows}
    assert set(got) == set(expected)
    import hashlib

    for vid, (csv, maxabs, n_bytes) in expected.items():
        r = got[vid]
        assert r.maxabs_micro == maxabs, vid
        assert r.n_bytes == n_bytes, vid
        assert r.record_md5 == hashlib.md5(
            f"i8:{vid}|{maxabs}|{csv}".encode()
        ).hexdigest(), vid
