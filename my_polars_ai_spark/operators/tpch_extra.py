"""TPC-H tail: the remaining query shapes (Q2, Q7, Q8, Q9, Q11, Q12,
Q13, Q16, Q20, Q21), adapted to this corpus's columns — there is no
partsupp table, so Q2/Q9/Q11/Q16/Q20 re-base their part-supplier
relationships on lineitem, and missing columns (shipmode, commitdate,
receiptdate, mfgr, phone) get documented stand-ins. Together with the
shapes in relational.py (Q1/Q3/Q4/Q5/Q6/Q10/Q14/Q15/Q17/Q18/Q19/Q22)
this completes all 22 TPC-H query *structures* over the corpus.

Reference evidence: the reference's query surface is the free-form Polars
expression space reachable from its sandbox (reference
polarsai/__init__.py:439-440); TPC-H is the canonical basis set covering
that space's relational shapes.

Scale notes (100 TB discipline):
- Every dim side (part 2k, supplier 100, nation, region, 1-row scalar
  aggregates) is explicitly broadcast; fact-fact joins shuffle on their
  keys and AQE owns the physical strategy.
- The EXISTS/NOT EXISTS pairs (Q21) decorrelate to LEFT SEMI / LEFT ANTI
  hash joins — never a correlated per-row subquery.
- Aggregate-then-join ordering everywhere a HAVING precedes a join
  (Q20): lineitem collapses to per-supplier totals BEFORE touching
  supplier.
- Money sums are exact DECIMAL(28,6) micro-units; ratios use the
  multiply-through integer pattern (no float division) so results hash
  identically on both engines at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_polars_ai_spark.operators.base import (
    Op,
    exact_floor_div,
    make_registrar,
    oracle_ratio_round,
    ratio_round,
)
from my_polars_ai_spark.sources.tables import load_table as _t

OPS: dict[str, Op] = {}
op = make_registrar(OPS)

_DEC = "decimal(28,6)"


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _rev_micro(col=None):
    """Exact micro-unit revenue sum (order-independent, hash-stable)."""
    c = col if col is not None else _revenue()
    return (F.sum(c.cast(_DEC)) * 1000000).cast("decimal(38,0)")


@op(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 1000000
                        AS BIGINT)) AS cost_micro
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ), eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ), pf AS (
        SELECT p_partkey FROM part
        WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 25
    ), best AS (
        SELECT c.l_partkey, min(c.cost_micro) AS best_micro
        FROM cost c
        JOIN eu ON eu.s_suppkey = c.l_suppkey
        JOIN pf ON pf.p_partkey = c.l_partkey
        GROUP BY c.l_partkey
    )
    SELECT eu.s_acctbal, eu.s_name, eu.n_name,
           b.l_partkey AS p_partkey, c.cost_micro
    FROM cost c
    JOIN best b ON b.l_partkey = c.l_partkey AND c.cost_micro = b.best_micro
    JOIN eu ON eu.s_suppkey = c.l_suppkey
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 100
    """,
    tags=("tpch", "join", "argmin", "scalar-subquery"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier, adapted: no partsupp, so
    a (part, supplier)'s cost is the minimum observed lineitem price,
    in exact integer micro-units). The correlated MIN subquery
    decorrelates into aggregate-then-self-equi-join on the exact
    integer cost — ties surface identically on both engines. Supplier/
    nation/region collapse to a tiny broadcast dim; the part filter
    semi-joins the cost table BEFORE the per-part minimum so only
    relevant groups aggregate. Top-100 by (acctbal, partkey, name) is a
    total order -> TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 1000000).cast("bigint")
        ).alias("cost_micro")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pf = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 25)
    ).select("p_partkey")
    eu_cost = cost.join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey).join(
        F.broadcast(pf), cost.l_partkey == pf.p_partkey, "leftsemi"
    )
    best = eu_cost.groupBy("l_partkey").agg(F.min("cost_micro").alias("best_micro"))
    return (
        eu_cost.join(
            best.withColumnRenamed("l_partkey", "b_partkey"),
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("cost_micro") == F.col("best_micro")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "cost_micro",
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(100)
    )


@op(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(28,6))) * 1000000 AS HUGEINT)
                AS BIGINT) AS revenue_micro
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by ship year. The same dim table (nation) joins TWICE under
    different roles — both broadcast — and the either-direction pair
    predicate rides as a post-join residual. Shipdate range pushes to
    the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(_rev_micro().cast("long").alias("revenue_micro"))
    )


@op(
    "tpch_q8_market_share",
    oracle="""
    WITH sales AS (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) AS vol,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders    ON o_orderkey = l_orderkey
        JOIN part      ON p_partkey = l_partkey
        JOIN supplier  ON s_suppkey = l_suppkey
        JOIN customer  ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region    ON r_regionkey = cn.n_regionkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ), sums AS (
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol
                             ELSE 0 END) * 1000000 AS HUGEINT) AS nation_micro,
               CAST(sum(vol) * 1000000 AS HUGEINT) AS total_micro
        FROM sales GROUP BY o_year
    )
    SELECT o_year,
           CAST((2*10000*100*nation_micro + total_micro) // (2*total_micro)
                AS DOUBLE) / 10000 AS mkt_share_pct
    FROM sums
    """,
    tags=("tpch", "join", "agg", "ratio"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of ECONOMY-
    part revenue sold into EUROPE, by order year. The conditional and
    total sums come out of ONE aggregation pass (no second scan, no
    join of two aggregates), and the share is integer half-up at scale
    4 — the multiply-through pattern, no float division. Six dim joins,
    all broadcast; the only shuffles are the two fact-fact key
    exchanges and the final per-year aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _revenue().cast(_DEC)
    sums = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            _rev_micro(
                F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
                    F.lit(0).cast(_DEC)
                )
            ).alias("nation_micro"),
            _rev_micro(vol).alias("total_micro"),
        )
    )
    share = (
        exact_floor_div(
            2 * 10000 * 100 * F.col("nation_micro") + F.col("total_micro"),
            2 * F.col("total_micro"),
        ).cast("double")
        / 10000
    )
    return sums.select("o_year", share.alias("mkt_share_pct"))


@op(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              - 0.5 * p_retailprice * l_quantity
                              AS DECIMAL(28,6))) * 1000000 AS HUGEINT)
                AS BIGINT) AS profit_micro
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit, adapted: no partsupp, so
    supply cost is modeled as half the part's retail price per unit —
    deterministic and column-derived). Profit per supplier nation per
    order year over parts matching a name substring. The LIKE pushes to
    the (broadcast) part scan; per-item profit is computed in one
    expression and summed as exact micro-units."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = _revenue() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_rev_micro(profit).cast("long").alias("profit_micro"))
    )


@op(
    "tpch_q11_important_parts",
    oracle="""
    WITH val AS (
        SELECT l_partkey,
               CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(28,6))) * 1000000 AS HUGEINT)
                    AS BIGINT) AS value_micro
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    ), tot AS (
        SELECT CAST(sum(value_micro) AS HUGEINT) AS total_micro FROM val
    )
    SELECT l_partkey AS p_partkey, value_micro
    FROM val, tot
    WHERE CAST(value_micro AS HUGEINT) * 10000 > total_micro
    """,
    tags=("tpch", "agg", "scalar-subquery"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock, adapted: no partsupp, so a
    part's 'value' in a nation is its lineitem revenue from that
    nation's suppliers). Parts worth more than 0.01% of the national
    total. The global threshold is a broadcast 1-row aggregate and the
    fraction compare is MULTIPLIED THROUGH (value*10000 > total) —
    exact integers, no division, no cross-engine drift."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "leftsemi")
        .groupBy("l_partkey")
        .agg(_rev_micro().cast("long").alias("value_micro"))
    )
    tot = val.agg(F.sum("value_micro").alias("total_micro"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_micro") * 10000 > F.col("total_micro"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_micro")
    )


@op(
    "tpch_q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    tags=("tpch", "join", "agg", "conditional"),
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority, adapted: no l_shipmode/
    commitdate/receiptdate — groups by l_linestatus and 'late' means
    shipped 60+ days after the order date). The high/low priority split
    is conditional aggregation in ONE pass; the cross-table lateness
    predicate rides the join while the shipdate range pushes to the
    scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@op(
    "tpch_q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "join", "outer", "agg"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): histogram of per-customer
    order counts, zeros included. The filter lives IN the left-outer
    join condition (not a WHERE — that would turn it inner and drop the
    zero bucket), then two cascaded aggregations; the second input is
    tiny (one row per customer) and AQE coalesces its shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c_orders = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@op(
    "tpch_q16_supplier_part_stats",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 15, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "join", "anti", "distinct", "agg"),
)
def tpch_q16_supplier_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship, adapted: the
    part-supplier relation is the DISTINCT (partkey, suppkey) pairs
    observed in lineitem; 'complaint' suppliers are those with negative
    account balance). The NOT IN decorrelates to a LEFT ANTI join
    against a broadcast exclusion list; the count-distinct shuffles
    once on the (brand, type, size) group key."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 15, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "leftanti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@op(
    "tpch_q20_top_shippers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS red_qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 300
    )
    SELECT s_name, s_acctbal, CAST(red_qty AS BIGINT) AS red_qty
    FROM shipped
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
    """,
    tags=("tpch", "semi", "having", "agg"),
)
def tpch_q20_top_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion, adapted: no partsupp/
    availqty, so the 'excess stock' condition becomes suppliers who
    shipped more than a threshold quantity of red parts in a year;
    region stands in for the nation filter). Aggregate-then-join: the
    HAVING collapses lineitem to qualifying suppliers BEFORE touching
    the supplier dim; the part name filter is a broadcast LEFT SEMI
    join (the IN-subquery shape)."""
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "leftsemi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("red_qty"))
        .filter(F.col("red_qty") > 300)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        shipped.join(F.broadcast(s), shipped.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "s_acctbal", "red_qty")
    )


@op(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
          )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("tpch", "semi", "anti", "agg"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting, adapted:
    'late' = shipped 60+ days after the order date of a finalized
    order). The EXISTS / NOT EXISTS pair decorrelates to a LEFT SEMI
    then LEFT ANTI join of the late set against (a) all other-supplier
    lines and (b) other-supplier LATE lines — both hash joins on the
    order key, never a correlated loop. Supplier is broadcast; top-100
    by (numwait, name) is a total order."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    waiting = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "leftsemi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "leftanti",
        )
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


_BASKET_LIFT_SQL = f"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), n AS (
        SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob
    ), per AS (
        SELECT p_brand, count(*) AS n_b FROM ob GROUP BY 1
    ), pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
           {oracle_ratio_round('n_ab * n.n_orders', 'pa.n_b * pb.n_b')} AS lift
    FROM pairs
    JOIN per pa ON pa.p_brand = brand_a
    JOIN per pb ON pb.p_brand = brand_b
    CROSS JOIN n
"""


@op(
    "basket_lift_brand_pairs",
    oracle=_BASKET_LIFT_SQL,
    tags=("analytics", "basket", "tpch"),
)
def basket_lift_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between part brands: for every brand pair,
    the co-occurrence lift P(ab)/(P(a)P(b)) = n_ab*N/(n_a*n_b) over
    order baskets — an exact integer rational, so the classic
    association-rule score hash-matches across engines. Plan shape:
    distinct (order, brand) via one shuffle (fan-in per order bounded
    by the 25-brand dimension), pair generation as a self-equi-join ON
    THE ORDER KEY (never a brand cross product), per-brand counts and
    the 1-row total broadcast onto the bounded 300-pair output."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    ob = (
        li.join(pa.select("p_partkey", "p_brand"), li.l_partkey == pa.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = ob.select(F.countDistinct("l_orderkey").alias("n_orders"))
    per = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_b"))
    a = ob.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    pa_c = per.select(F.col("p_brand").alias("brand_a"), F.col("n_b").alias("na"))
    pb_c = per.select(F.col("p_brand").alias("brand_b"), F.col("n_b").alias("nb"))
    return (
        pairs.join(F.broadcast(pa_c), "brand_a")
        .join(F.broadcast(pb_c), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            ratio_round(
                F.col("n_ab") * F.col("n_orders"), F.col("na") * F.col("nb")
            ).alias("lift"),
        )
    )


_PRICE_INDEX_SQL = f"""
    WITH li AS (
        SELECT l_partkey,
               CAST(l_shipdate AS DATE) < DATE '1998-06-01' AS is_base,
               -- IEEE-portable micro conversion (property-tested seam):
               -- double->DECIMAL casts disagree on 1e-6 ties across engines
               CAST(floor(l_extendedprice / l_quantity * 1000000 + 0.5)
                    AS HUGEINT) AS unit_micro,
               CAST(CAST(l_quantity AS DECIMAL(28,6)) AS HUGEINT) AS q
        FROM lineitem WHERE l_quantity > 0
    ), per_part AS (
        SELECT l_partkey,
               sum(CASE WHEN is_base THEN unit_micro END) AS sp0,
               sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS n0,
               sum(CASE WHEN NOT is_base THEN unit_micro END) AS sp1,
               sum(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN is_base THEN q ELSE 0 END) AS q0
        FROM li GROUP BY 1
    ), priced AS (
        -- per-part mean unit prices, micro-rounded ONCE (the documented
        -- per-item rounding point: sums of rationals with differing
        -- denominators), then exact integer basket arithmetic
        SELECT l_partkey, q0,
               (2*sp0 + n0) // (2*n0) AS p0_micro,
               (2*sp1 + n1) // (2*n1) AS p1_micro
        FROM per_part WHERE n0 > 0 AND n1 > 0 AND q0 > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(q0 * p0_micro) AS BIGINT) AS base_basket_micro,
           CAST(sum(q0 * p1_micro) AS BIGINT) AS current_basket_micro,
           {{orr}} AS laspeyres_index
    FROM priced
""".replace("{orr}", oracle_ratio_round("sum(q0 * p1_micro)", "sum(q0 * p0_micro)"))


@op(
    "price_index_laspeyres",
    oracle=_PRICE_INDEX_SQL,
    tags=("analytics", "econ", "tpch"),
)
def price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index: the cost of the BASE period's basket
    (base-half quantities) at current-half prices over its cost at
    base prices — the inflation measure across the part catalog.
    Per-part mean unit prices are half-up micro integers (rounded
    once — the one documented rounding point, since per-part rationals
    have different denominators); the basket sums and the final index
    are then exact integer arithmetic. Only parts traded in BOTH
    halves enter (the matched-sample rule). One lineitem aggregation
    on the part key; everything after is part-dimension-bounded."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    cut = F.lit("1998-06-01").cast("date")
    d38 = "decimal(38,0)"
    base = F.to_date("l_shipdate") < cut
    unit_micro = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 1000000 + F.lit(0.5)
    ).cast(d38)
    q = F.col("l_quantity").cast("decimal(28,6)").cast(d38)
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.when(base, unit_micro)).alias("sp0"),
        F.sum(base.cast("int")).alias("n0"),
        F.sum(F.when(~base, unit_micro)).alias("sp1"),
        F.sum((~base).cast("int")).alias("n1"),
        F.sum(F.when(base, q).otherwise(F.lit(0).cast(d38))).alias("q0"),
    )
    priced = per_part.filter(
        (F.col("n0") > 0) & (F.col("n1") > 0) & (F.col("q0") > 0)
    ).select(
        "q0",
        exact_floor_div(2 * F.col("sp0") + F.col("n0").cast(d38), 2 * F.col("n0").cast(d38)).alias("p0_micro"),
        exact_floor_div(2 * F.col("sp1") + F.col("n1").cast(d38), 2 * F.col("n1").cast(d38)).alias("p1_micro"),
    )
    return priced.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.col("q0") * F.col("p0_micro")).cast("long").alias("base_basket_micro"),
        F.sum(F.col("q0") * F.col("p1_micro")).cast("long")
        .alias("current_basket_micro"),
        ratio_round(
            F.sum(F.col("q0") * F.col("p1_micro")),
            F.sum(F.col("q0") * F.col("p0_micro")),
        ).alias("laspeyres_index"),
    )
