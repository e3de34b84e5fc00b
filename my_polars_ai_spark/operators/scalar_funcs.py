"""Scalar function families: string / regex / date-time / math / array /
struct-map / JSON (SURVEY.md §2b scalar functions; Polars str/dt/arr
namespaces + whitelisted datetime/json/math libs, reference
helpers/constants.py:69-83).

All expressions are built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen; no Python UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_polars_ai_spark.operators.base import ROUND_RATIO, Op, make_registrar
from my_polars_ai_spark.sources.tables import load_table as _t

OPS: dict[str, Op] = {}
op = make_registrar(OPS)


@op(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_name, 1, 5) AS name_head,
           contains(p_name, 'widget') AS is_widget,
           replace(p_name, ' ', '_') AS name_snake,
           split_part(p_name, ' ', 1) AS first_word,
           concat_ws('|', p_brand, p_type) AS brand_type,
           trim(concat(' ', p_name, ' ')) AS trimmed,
           starts_with(p_name, 'small') AS is_small,
           p_name LIKE '%bolt%' AS like_bolt
    FROM part
    """,
    tags=("scalar", "string"),
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, slice, contains, replace, split,
    concat, trim, prefix, LIKE."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.col("p_name").contains("widget").alias("is_widget"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.col("p_name").startswith("small").alias("is_small"),
        F.col("p_name").like("%bolt%").alias("like_bolt"),
    )


@op(
    "regex_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '[0-9]+') AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(p_type, '^(ECONOMY|PROMO)$') AS is_cheap_tier
    FROM part
    """,
    tags=("scalar", "regex"),
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract, global replace, full/partial match."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_type").rlike("^(ECONOMY|PROMO)$").alias("is_cheap_tier"),
    )


@op(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mon,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM orders
    """,
    tags=("scalar", "date"),
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: component extraction, arithmetic, truncation
    (the reference's loan fixture needs M/d/yyyy parsing — covered by
    sources.readers + engine tests; here the corpus timestamps)."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).alias("days_since"),
        F.date_add(d, 30).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
    )


@op(
    "math_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), {ROUND_RATIO}) AS qty_sqrt,
           round(pow(l_quantity, 2), {ROUND_RATIO}) AS qty_sq,
           round(ln(l_extendedprice), {ROUND_RATIO}) AS price_ln,
           round(log10(l_extendedprice), {ROUND_RATIO}) AS price_log10,
           round(exp(l_discount), {ROUND_RATIO}) AS disc_exp,
           round(abs(l_quantity - 25.0), {ROUND_RATIO}) AS qty_dev,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS qty_mod
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: sqrt/pow/ln/log10/exp/abs/floor/ceil/mod."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), ROUND_RATIO).alias("qty_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2)), ROUND_RATIO).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), ROUND_RATIO).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), ROUND_RATIO).alias("price_log10"),
        F.round(F.exp("l_discount"), ROUND_RATIO).alias("disc_exp"),
        F.round(F.abs(F.col("l_quantity") - 25.0), ROUND_RATIO).alias("qty_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )


@op(
    "array_funcs",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
           CAST(len(list(l_linenumber)) AS INTEGER) AS n_lines,
           list_contains(list(l_linenumber), 3) AS has_line3,
           list_sort(list(l_linenumber))[1] AS first_line
    FROM lineitem
    GROUP BY l_orderkey
    """,
    tags=("scalar", "array"),
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: collect_list (sorted for determinism), size, contains,
    element access. The collected array is surfaced as a ','-joined
    string on BOTH sides — the driver's pandas canonicalizer cannot
    factorize list-valued columns (same hazard as misc_scalar_funcs)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.array_sort(F.collect_list("l_linenumber")), ",").alias("line_numbers"),
        F.size(F.collect_list("l_linenumber")).alias("n_lines"),
        F.array_contains(F.collect_list("l_linenumber"), 3).alias("has_line3"),
        F.element_at(F.array_sort(F.collect_list("l_linenumber")), 1).alias("first_line"),
    )


@op(
    "higher_order_array_funcs",
    oracle=f"""
    SELECT l_orderkey,
           round(list_sum(list_transform(prices, x -> x * 1.1)), {ROUND_RATIO}) AS taxed_total,
           CAST(len(list_filter(prices, x -> x > 10000.0)) AS INTEGER) AS n_expensive
    FROM (
        SELECT l_orderkey, list_sort(list(l_extendedprice)) AS prices
        FROM lineitem GROUP BY l_orderkey
    )
    """,
    tags=("scalar", "array", "lambda"),
)
def higher_order_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / aggregate — the
    JVM-side alternative to Python UDFs for array columns (also the
    building block of the embedding dot products in similarity ops)."""
    li = _t(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_extendedprice")).alias("prices")
    )
    taxed_sum = F.aggregate(
        F.transform("prices", lambda x: x * 1.1),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return grouped.select(
        "l_orderkey",
        F.round(taxed_sum, ROUND_RATIO).alias("taxed_total"),
        F.size(F.filter("prices", lambda x: x > 10000.0)).alias("n_expensive"),
    )


@op(
    "struct_map_access",
    oracle=f"""
    SELECT event_id,
           event_type AS s_type,
           round(value, {ROUND_RATIO}) AS s_value,
           round(value * 2, {ROUND_RATIO}) AS m_double
    FROM events
    """,
    tags=("scalar", "struct", "map"),
)
def struct_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map construction + field access (round-trips through
    struct()/create_map() so nested types are exercised even though the
    output is flat for oracle comparison)."""
    e = _t(spark, sf_dir, "events")
    nested = e.select(
        "event_id",
        F.struct(F.col("event_type").alias("t"), F.col("value").alias("v")).alias("s"),
        F.create_map(F.lit("double"), F.col("value") * 2).alias("m"),
    )
    return nested.select(
        "event_id",
        F.col("s.t").alias("s_type"),
        F.round(F.col("s.v"), ROUND_RATIO).alias("s_value"),
        F.round(F.element_at("m", "double"), ROUND_RATIO).alias("m_double"),
    )


@op(
    "json_funcs",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column + aggregation (whitelisted-json
    surface, reference helpers/constants.py:78)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@op(
    "string_pad_funcs",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_zfill,
           rpad(p_brand, 12, '.') AS brand_padded,
           reverse(p_name) AS name_reversed,
           repeat('-', p_size % 5) AS size_dashes
    FROM part
    """,
    tags=("scalar", "string"),
)
def string_pad_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding family: lpad (zfill), rpad, reverse, repeat."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_zfill"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.reverse("p_name").alias("name_reversed"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("size_dashes"),
    )


@op(
    "array_set_ops",
    oracle="""
    WITH per_status AS (
        SELECT l_orderkey,
               list_sort(list(DISTINCT l_linenumber) FILTER (l_linestatus = 'O')) AS lines_o,
               list_sort(list(DISTINCT l_linenumber) FILTER (l_linestatus = 'F')) AS lines_f
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           coalesce(array_to_string(list_sort(list_intersect(coalesce(lines_o, []), coalesce(lines_f, []))), ','), '') AS in_both,
           coalesce(array_to_string(list_sort(list_distinct(list_concat(coalesce(lines_o, []), coalesce(lines_f, [])))), ','), '') AS in_either,
           list_has_all(coalesce(lines_o, []), coalesce(lines_f, [])) AS o_covers_f
    FROM per_status
    """,
    tags=("scalar", "array", "setop"),
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect/union/containment) on per-group
    collected arrays — the JVM-side way to compare sets without exploding
    back to rows. Set-valued outputs are ','-joined strings on both
    sides (driver-canonicalizer list hazard)."""
    li = _t(spark, sf_dir, "lineitem")
    empty = F.array().cast("array<int>")
    per_status = li.groupBy("l_orderkey").agg(
        F.coalesce(
            F.array_sort(F.array_distinct(F.collect_list(F.when(F.col("l_linestatus") == "O", F.col("l_linenumber"))))),
            empty,
        ).alias("lines_o"),
        F.coalesce(
            F.array_sort(F.array_distinct(F.collect_list(F.when(F.col("l_linestatus") == "F", F.col("l_linenumber"))))),
            empty,
        ).alias("lines_f"),
    )
    return per_status.select(
        "l_orderkey",
        F.array_join(F.array_sort(F.array_intersect("lines_o", "lines_f")), ",").alias("in_both"),
        F.array_join(F.array_sort(F.array_union("lines_o", "lines_f")), ",").alias("in_either"),
        (F.size(F.array_except("lines_f", "lines_o")) == 0).alias("o_covers_f"),
    )


@op(
    "misc_scalar_funcs",
    oracle="""
    SELECT p_partkey,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), ' ') AS words,
           translate(p_brand, '#', '-') AS brand_dashed,
           CAST(ascii(p_name) AS INTEGER) AS first_char_code,
           least(p_size, 25) AS size_capped,
           greatest(p_size, 5) AS size_floored
    FROM part
    """,
    tags=("scalar", "string", "misc"),
)
def misc_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misc scalar family: regexp_extract_all (list of matches),
    translate, ascii, row-wise least/greatest (clip/clamp surface).

    The match list is re-joined to a space-delimited string on BOTH
    sides: the driver's pandas canonicalizer sorts/factorizes column
    values and cannot hash Python lists, so array-typed output columns
    are a harness hazard even when values agree (round-5 driver red)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.array_join(
            F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0), " "
        ).alias("words"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.ascii("p_name").alias("first_char_code"),
        F.least("p_size", F.lit(25)).alias("size_capped"),
        F.greatest("p_size", F.lit(5)).alias("size_floored"),
    )


@op(
    "bit_aggregates",
    oracle="""
    SELECT l_returnflag,
           bit_and(CAST(l_quantity AS BIGINT)) AS qty_bit_and,
           bit_or(CAST(l_quantity AS BIGINT)) AS qty_bit_or,
           bit_xor(CAST(l_quantity AS BIGINT)) AS qty_bit_xor
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "bitwise"),
)
def bit_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and/bit_or/bit_xor) — flag-mask
    consolidation in one hash aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(q).alias("qty_bit_and"),
        F.bit_or(q).alias("qty_bit_or"),
        F.bit_xor(q).alias("qty_bit_xor"),
    )


@op(
    "variant_json_funcs",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
           CAST(sum(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json", "variant"),
)
def variant_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    parse_json once into a columnar variant, then variant_get typed
    path extraction — the modern replacement for per-path
    get_json_object string re-parsing (json_funcs above is the legacy
    twin). try_variant_get on an absent path returns NULL instead of
    erroring, the pattern for schema-drifting event payloads. At 100 TB
    variant decode is one pass per row regardless of how many paths are
    extracted."""
    e = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    with_v = e.select("event_type", v.alias("pv"))
    k = F.variant_get(F.col("pv"), "$.k", "bigint")
    missing = F.try_variant_get(F.col("pv"), "$.missing", "bigint")
    return with_v.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_large"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias("n_missing"),
    )


@op(
    "try_arithmetic_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE round(CAST(l_extendedprice AS DOUBLE) / l_discount, 6)
           END AS price_per_discount,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(l_quantity AS VARCHAR) AS INTEGER) AS qty_as_int,
           round(CAST(l_extendedprice AS DOUBLE) + l_tax, 6) AS try_sum
    FROM lineitem
    WHERE l_orderkey % 500 = 0
    """,
    tags=("scalar", "ansi", "null-safety"),
)
def try_arithmetic_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode `try_` escape hatches (Spark 4 runs ANSI by
    default, so 1/0 and bad casts THROW — see the divide-by-zero guards
    all over this repo): try_divide / try_cast return NULL instead of
    failing the job, the difference between one poison row killing a
    100 TB pipeline and a NULL you can quarantine downstream.
    try_cast('N' AS INT) exercises the parse-failure path; the
    quantity string round-trip exercises the success path (TPC-H
    quantities are integral); try_add on doubles is overflow-free here
    and matches plain addition."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice").cast("double"), F.col("l_discount")),
            6,
        ).alias("price_per_discount"),
        F.try_to_number("l_returnflag", F.lit("999")).cast("int").alias("flag_as_int"),
        F.col("l_quantity").cast("double").cast("string").cast("double").cast("int").alias("qty_as_int"),
        F.round(
            F.try_add(F.col("l_extendedprice").cast("double"), F.col("l_tax")), 6
        ).alias("try_sum"),
    )


@op(
    "collated_group_count",
    oracle="""
    WITH p AS (
        SELECT CASE WHEN p_partkey % 2 = 1 THEN upper(p_type) ELSE p_type END
                   AS p_type_cased
        FROM part
    )
    SELECT lower(p_type_cased) AS p_type_lc, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY 1
    """,
    tags=("string", "spark4", "collation"),
)
def collated_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string COLLATION: group part types case-insensitively by
    collating the key to UTF8_LCASE — comparison/grouping semantics
    move into the TYPE, so the plan needs no lower() wrapper and an
    equality filter on the collated column can still push down. The
    mixed-case input is synthesized deterministically (odd part keys
    upper-cased) because the corpus is uniformly cased; the output
    reports lower(key) so the group representative (which Spark picks
    arbitrarily among case variants) never reaches the result. Oracle
    states the classic lower()-normalize formulation."""
    p = _t(spark, sf_dir, "part").select(
        F.when(F.col("p_partkey") % 2 == 1, F.upper("p_type"))
        .otherwise(F.col("p_type"))
        .alias("p_type_cased")
    )
    g = p.groupBy(
        F.collate(F.col("p_type_cased"), "UTF8_LCASE").alias("k")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return g.select(
        F.lower(F.col("k").cast("string")).alias("p_type_lc"), "n"
    )
