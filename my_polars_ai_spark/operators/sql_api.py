"""SQL-API operators: queries expressed through spark.sql over temp views
(entry point parity — the engine's generated code may use either the
DataFrame API or SQL; Catalyst produces the same plans), plus patterns
only reachable via SQL (GROUPING SETS) and explicit scale patterns
(salted two-stage aggregation for skewed keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_polars_ai_spark.operators.base import ROUND_MONEY, ROUND_RATIO, Op, make_registrar
from my_polars_ai_spark.sources.tables import load_table as _t

OPS: dict[str, Op] = {}
op = make_registrar(OPS)

N_SALTS = 8


@op(
    "sql_api_revenue",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), {ROUND_MONEY}) AS sum_price
    FROM orders
    WHERE o_orderstatus <> 'P'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "agg"),
)
def sql_api_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: temp view + spark.sql — identical Catalyst
    plan to the DataFrame formulation."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        f"""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), {ROUND_MONEY}) AS sum_price
        FROM orders_v
        WHERE o_orderstatus <> 'P'
        GROUP BY o_orderpriority
        """
    )


@op(
    "grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), {ROUND_MONEY}) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    tags=("sql", "agg", "grouping_sets"),
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — only expressible through SQL in Spark; one pass,
    expand + single hash aggregation (not a union of scans)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), {ROUND_MONEY}) AS sum_qty,
               count(*) AS n
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@op(
    "salted_group_agg",
    oracle=f"""
    SELECT l_returnflag,
           round(sum(l_extendedprice), {ROUND_MONEY}) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "skew", "salting"),
)
def salted_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation: salt the hot key into N_SALTS
    sub-keys, pre-aggregate, then merge — same answer as the direct
    groupBy (the oracle), but no single reducer ever owns a whole hot key.

    l_returnflag has ~3 distinct values over the whole fact table — the
    canonical skewed aggregation. (For *joins* on skewed keys, prefer
    AQE's skewJoin, already enabled in session.py.)

    The salt must be deterministic for the oracle compare; a production
    pipeline would use F.rand(seed) or a hash of a high-cardinality column
    (as here).
    """
    li = _t(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", (F.crc32(F.col("l_orderkey").cast("string")) % N_SALTS))
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.sum("l_extendedprice").alias("partial_sum"),
        F.count(F.lit(1)).alias("partial_n"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.round(F.sum("partial_sum"), ROUND_MONEY).alias("sum_price"),
        F.sum("partial_n").alias("n"),
    )


@op(
    "boxplot_stats",
    oracle=f"""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), {ROUND_RATIO}) AS q1,
           round(quantile_cont(o_totalprice, 0.5), {ROUND_RATIO}) AS median,
           round(quantile_cont(o_totalprice, 0.75), {ROUND_RATIO}) AS q3,
           round(min(o_totalprice), {ROUND_RATIO}) AS lo,
           round(max(o_totalprice), {ROUND_RATIO}) AS hi
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "chart", "quantile"),
)
def boxplot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped boxplot statistics (reference boxplot shortcut upstream agg,
    helpers/shortcuts.py:243-293): quartiles + extremes per group; the
    driver-side matplotlib render consumes exactly this."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.25), ROUND_RATIO).alias("q1"),
        F.round(F.percentile("o_totalprice", 0.5), ROUND_RATIO).alias("median"),
        F.round(F.percentile("o_totalprice", 0.75), ROUND_RATIO).alias("q3"),
        F.round(F.min("o_totalprice"), ROUND_RATIO).alias("lo"),
        F.round(F.max("o_totalprice"), ROUND_RATIO).alias("hi"),
    )


@op(
    "join_salted_skew",
    oracle=f"""
    SELECT l.l_returnflag,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), {ROUND_MONEY}) AS revenue,
           count(*) AS n
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY l.l_returnflag
    """,
    tags=("join", "skew", "salting"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join: the manual skew-mitigation pattern, oracle-proved
    equivalent to the plain join. The probe side's key is salted with a
    deterministic hash; the build side replicates each row across all
    N_SALTS sub-keys (explode of a literal range), so a hot key's rows
    spread over N_SALTS reducers instead of one. Same result as the
    unsalted join — the oracle states the plain join. In production
    prefer AQE skew-join (enabled in session.py) and reach for manual
    salting only when AQE's split granularity isn't enough."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    salt = (F.crc32(F.col("l_linenumber").cast("string")) % N_SALTS).cast("int")
    probe = li.withColumn("__salt", salt)
    build = o.select(
        "o_orderkey", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)])).alias("__salt")
    )
    joined = probe.join(build, (probe.l_orderkey == build.o_orderkey) & (probe.__salt == build.__salt))
    return joined.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), ROUND_MONEY).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


_RECURSIVE_CLIMB = """
    WITH RECURSIVE e AS (
        SELECT a.c_custkey AS node, a.c_custkey DIV 10 AS parent,
               (b.c_custkey IS NOT NULL) AS has_parent
        FROM {customer} a
        LEFT JOIN {customer} b ON b.c_custkey = a.c_custkey DIV 10
    ), climb AS (
        SELECT node AS c_custkey, node AS cur, 0 AS depth FROM e
        UNION ALL
        SELECT c.c_custkey, e.parent, c.depth + 1
        FROM climb c JOIN e ON e.node = c.cur
        WHERE c.cur >= 10 AND e.has_parent
    )
    SELECT c.c_custkey, CAST(c.cur AS BIGINT) AS root_key,
           CAST(c.depth AS INT) AS depth
    FROM climb c JOIN e ON e.node = c.cur
    WHERE c.cur < 10 OR NOT e.has_parent
"""


@op(
    "recursive_cte_hierarchy",
    # DuckDB spells integer division //; Spark spells it DIV
    oracle=_RECURSIVE_CLIMB.replace("{customer}", "customer").replace("DIV", "//"),
    tags=("sql", "recursive", "spark4"),
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497):
    the same root/depth hierarchy climb as `hierarchy_rollup`, but the
    recursion is declared in SQL and Catalyst owns the loop — the
    UnionLoop operator repeats the anchor∪step until fixpoint instead
    of a driver-side iteration. Keep both: `hierarchy_rollup` is the
    pre-4.x engine-idiomatic pattern (and the shape you tune by hand —
    pointer-doubling, checkpointing); this one is the declarative
    surface a SQL user will reach for first. Identical text runs on
    DuckDB modulo the integer-division spelling (DIV vs //)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(_RECURSIVE_CLIMB.replace("{customer}", "customer_v"))


@op(
    "sql_scripting_above_avg",
    oracle="""
    WITH t AS (
        SELECT count(*) AS n,
               sum(CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 1000000
                        AS HUGEINT)) AS total
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_above_avg
    FROM orders CROSS JOIN t
    WHERE CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 1000000 AS HUGEINT) * t.n
          > t.total
    GROUP BY o_orderpriority
    """,
    tags=("sql", "scripting", "spark4"),
)
def sql_scripting_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4's BEGIN/DECLARE/SET blocks,
    SPARK-48338): a procedural script declares session variables,
    fills them from one query, and uses them in the next — the
    migration path for stored-procedure workloads. The threshold
    comparison is cross-multiplied exact integers (price_micro * n >
    total_micro), never a float average, so the script's branch-free
    arithmetic hash-matches the oracle's plain-SQL restatement.
    Catalyst compiles each statement separately; the variable is a
    literal by the time the final query plans, so the scan still gets
    its pushdown."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_script_v")
    return spark.sql(
        """
        BEGIN
          DECLARE n_rows BIGINT;
          DECLARE total_micro DECIMAL(38,0);
          SET n_rows = (SELECT count(*) FROM orders_script_v);
          SET total_micro = (
              SELECT sum(CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 1000000
                              AS DECIMAL(38,0)))
              FROM orders_script_v);
          SELECT o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n_above_avg
          FROM orders_script_v
          WHERE CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 1000000
                     AS DECIMAL(38,0)) * n_rows > total_micro
          GROUP BY o_orderpriority;
        END
        """
    )


@op(
    "sql_parameterized_query",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
    tags=("sql", "spark4", "security"),
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (spark.sql(query, args={...}) with named
    markers) — the injection-safe way to template values into
    generated SQL, which is exactly what an LLM-driven engine should
    emit instead of f-string splicing. The markers bind as literals at
    parse time, so pushdown and constant folding see real constants
    (same plan as the inlined query)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_param_v")
    return spark.sql(
        """
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
        FROM orders_param_v
        WHERE o_totalprice > :min_price AND o_orderpriority = :prio
        GROUP BY o_orderstatus
        """,
        args={"min_price": 150000.0, "prio": "1-URGENT"},
    )


@op(
    "sql_lateral_topk",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.total_cents
    FROM customer c
    JOIN LATERAL (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 100 AS BIGINT)
                   AS total_cents
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY total_cents DESC, o_orderkey
        LIMIT 2
    ) o ON true
    WHERE c.c_custkey <= 500
    """,
    tags=("sql", "lateral", "topk"),
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 SQL surface): top-2 orders
    per customer expressed as `JOIN LATERAL (... ORDER BY ... LIMIT 2)`
    — the SQL-native spelling of window_topk_per_group. Catalyst
    rewrites the correlated limit into a partitioned rank filter, so the
    physical plan is the same shuffle-once window top-k, not N
    per-customer probes; ties break on the unique order key on both
    engines. The custkey cap keeps the driver-compare output bounded —
    the plan shape is customer-count-independent."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lv")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lv")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.total_cents
        FROM customer_lv c
        JOIN LATERAL (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 100 AS BIGINT)
                       AS total_cents
            FROM orders_lv
            WHERE o_custkey = c.c_custkey
            ORDER BY total_cents DESC, o_orderkey
            LIMIT 2
        ) o
        WHERE c.c_custkey <= 500
        """
    )


@op(
    "sql_pipe_syntax_agg",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), {ROUND_MONEY}) AS sum_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "pipe", "agg"),
)
def sql_pipe_syntax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's `|>` operator chain — the
    GoogleSQL-pipes surface): FROM ... |> WHERE ... |> AGGREGATE reads
    top-to-bottom like a DataFrame chain but stays pure SQL. Catalyst
    compiles it to the identical plan as the classic SELECT the oracle
    states — the point of the op is proving the new surface is
    plan-equivalent, not a new execution path."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe_v")
    return spark.sql(
        f"""
        FROM orders_pipe_v
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), {ROUND_MONEY}) AS sum_price
           GROUP BY o_orderpriority
        """
    )


@op(
    "sql_execute_immediate",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    WHERE c_nationkey = 7
    GROUP BY c_mktsegment
    """,
    tags=("sql", "dynamic"),
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL via EXECUTE IMMEDIATE with a positional parameter
    (Spark 4 surface) — the stored-procedure-style entry point that
    pairs with sql_parameterized_query's named markers: the query text
    is assembled at runtime but the VALUE rides a parameter, never
    string interpolation (injection-safe by construction)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_ei_v")
    stmt = (
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers "
        "FROM customer_ei_v WHERE c_nationkey = ? GROUP BY c_mktsegment"
    )
    return spark.sql("EXECUTE IMMEDIATE :q USING 7", args={"q": stmt})


@op(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 100 AS HUGEINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY ALL
    """,
    tags=("sql", "spark4"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — the grouping keys are inferred from the
    non-aggregate select list, so generated SQL can't drift between
    the projection and the GROUP BY clause (the classic LLM-codegen
    slip this engine's SQL path would otherwise have to lint for).
    Both engines support the identical text; the plan is the ordinary
    hash aggregate."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 100
                             AS DECIMAL(38,0))) AS BIGINT) AS cents
        FROM orders_gba_v GROUP BY ALL
        """
    )


@op(
    "sql_identifier_clause",
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("sql", "spark4", "security"),
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``IDENTIFIER(:param)`` (Spark 4) — parameterized TABLE and
    COLUMN names, completing the injection-safe templating story:
    sql_parameterized_query binds VALUES, this binds IDENTIFIERS, so
    generated SQL never string-splices either. The identifier resolves
    at parse time — the optimized plan is the same broadcast join the
    hand-written query gets. Oracle states the resolved query."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_id_v")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_id_v")
    return spark.sql(
        """
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers
        FROM IDENTIFIER(:fact) JOIN IDENTIFIER(:dim)
          ON IDENTIFIER(:fact || '.s_nationkey') = IDENTIFIER(:dim || '.n_nationkey')
        GROUP BY n_name
        """,
        args={"fact": "supplier_id_v", "dim": "nation_id_v"},
    )


# Fixed keyset cursor: "the page after ($150,000.00, order 0)" — a
# LITERAL the client got from the previous page's last row, so the
# query shape is SF-independent.
_KEYSET_PRICE = 150000.0
_KEYSET_PAGE = 10

_KEYSET_SQL = f"""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 100 AS BIGINT) AS cents
    FROM orders
    WHERE o_totalprice < {_KEYSET_PRICE}
       OR (o_totalprice = {_KEYSET_PRICE} AND o_orderkey > 0)
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT {_KEYSET_PAGE}
"""


@op("keyset_pagination_page", oracle=_KEYSET_SQL, tags=("sql", "pagination", "topk"))
def keyset_pagination_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYSET (seek-method) pagination — the scalable replacement for
    OFFSET: the next page is `WHERE sort_key < cursor ORDER BY sort_key
    LIMIT n`, so the engine does a pushdown-able filter plus
    TakeOrderedAndProject no matter how deep the page, where
    `OFFSET 1000000` must still produce and discard a million rows on
    every request. The cursor is the (price, key) pair of the previous
    page's last row — carried by the client as a literal AGAINST THE
    STORED COLUMN (not a derived expression, which would defeat
    pushdown — plan-asserted), with the composite tie-break spelled as
    the classic OR so the filter stays sargable on the leading column. Deep-pagination OFFSET is the
    documented anti-pattern this op exists to name."""
    o = _t(spark, sf_dir, "orders")
    page = o.filter(
        (F.col("o_totalprice") < _KEYSET_PRICE)
        | ((F.col("o_totalprice") == _KEYSET_PRICE) & (F.col("o_orderkey") > 0))
    )
    return (
        page.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(_KEYSET_PAGE)
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(28,6)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )


@op(
    "sql_unpivot_syntax",
    oracle="""
    WITH s AS (
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS val FROM s
    UNION ALL
    SELECT o_orderstatus, 'n_customers' AS metric, n_customers AS val FROM s
    """,
    tags=("sql", "reshape"),
)
def sql_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard ``UNPIVOT`` clause (Spark 3.4+) — wide-to-long
    in the query text itself, the spelling a SQL-emitting LLM should
    use instead of the stack() incantation (the DataFrame unpivot/melt
    twin is unpivot_metrics). The oracle states the desugared UNION
    ALL, which is exactly Catalyst's expansion — same plan, two
    spellings."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_unp_v")
    return spark.sql(
        """
        SELECT o_orderstatus, metric, val FROM (
            SELECT o_orderstatus,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
            FROM orders_unp_v GROUP BY o_orderstatus
        ) UNPIVOT (val FOR metric IN (n_orders, n_customers))
        """
    )


@op(
    "sql_offset_pagination",
    oracle=f"""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 100 AS BIGINT) AS cents
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT {_KEYSET_PAGE} OFFSET 20
    """,
    tags=("sql", "pagination", "antipattern"),
)
def sql_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET pagination — kept as the documented ANTI-PATTERN exhibit
    next to keyset_pagination_page (the row_udf_label of pagination):
    page 3 via `ORDER BY ... LIMIT 10 OFFSET 20` must still order and
    discard every earlier row, so cost grows linearly with page depth
    — at page 100,000 of a 100 TB table the cluster sorts and throws
    away a million rows per request, where the keyset filter stays a
    pushdown + TakeOrderedAndProject forever. Correct, portable, and
    exactly what not to generate for deep pages."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(20)
        .limit(_KEYSET_PAGE)
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(28,6)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )


_TIES_K = 10

_TIES_SQL = f"""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(28,6)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    )
    SELECT o_orderkey, o_custkey, cents
    FROM o
    QUALIFY rank() OVER (ORDER BY cents DESC) <= {_TIES_K}
"""


@op("topk_with_ties", oracle=_TIES_SQL, tags=("sql", "topk", "rank"))
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES — the SQL-standard `FETCH FIRST k ROWS WITH
    TIES` semantics: every row tying the k-th value is kept, so the
    result is deterministic WITHOUT inventing a tie-break column (the
    honest answer to 'top 10 orders by value' when three orders share
    10th place; row_number-based top-k silently drops two of them).
    Neither engine ships the
    standard clause (Spark has no WITH TIES; DuckDB rejects it too),
    so the portable spelling is rank() <= k — equal keys share a rank,
    so the filter admits exactly the standard's row set; the oracle
    states it as QUALIFY.
    The window is a documented top-k global sort (WindowGroupLimit
    prunes per partition before the single ordered merge)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(28,6)") * 100)
        .cast("long")
        .alias("cents"),
    )
    w = Window.orderBy(F.desc("cents"))
    return (
        o.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= _TIES_K)
        .drop("rnk")
    )


@op(
    "sql_udf_declared_function",
    oracle=f"""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), {ROUND_MONEY})
               AS disc_revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("sql", "udf", "spark4"),
)
def sql_udf_declared_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-declared scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN
    expr`) — reusable business logic WITHOUT a Python boundary:
    Catalyst inlines the function body into the calling plan, so the
    aggregation below is whole-stage-codegen JVM work, indistinguishable
    from writing the expression inline (the oracle states it inline).
    This is the 100 TB answer to 'we need a shared disc_price()
    everywhere': a catalog object, not a row-at-a-time callback."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sqludf_v")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d)
        """
    )
    return spark.sql(
        f"""
        SELECT l_returnflag,
               round(sum(disc_price(l_extendedprice, l_discount)), {ROUND_MONEY})
                   AS disc_revenue,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem_sqludf_v
        GROUP BY l_returnflag
        """
    )


@op(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_urgentish,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    WHERE o_totalprice > 100000.0
    GROUP BY o_orderpriority
    """,
    tags=("sql", "pipe", "spark4"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `FROM t |> WHERE ... |> AGGREGATE`) —
    the linear top-to-bottom SQL dialect that reads like a DataFrame
    chain. Pure parser surface: Catalyst produces the identical
    filter->aggregate plan the classic formulation gets (the oracle
    states the classic form), so pushdown and partial aggregation
    behave exactly the same at any scale."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe_v")
    return spark.sql(
        """
        FROM orders_pipe_v
        |> WHERE o_totalprice > 100000.0
        |> AGGREGATE count(*) AS n_urgentish,
                     count(DISTINCT o_custkey) AS n_custs
           GROUP BY o_orderpriority
        """
    )
