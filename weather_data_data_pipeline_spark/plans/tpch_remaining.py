"""The remaining TPC-H query shapes (Q2/Q6/Q7/Q8/Q9/Q15/Q16/Q18/Q20/Q21),
completing 22/22 coverage of the classic ad-hoc decision-support surface.

The reference pipeline itself only exercises two hash aggregates and one
anti-join (SURVEY.md §2.3-2.4); these shapes prove the engine handles every
standard relational pattern a user migrating off the reference could write:
correlated scalar subqueries (Q2), nation-pair OR joins (Q7), market-share
ratio aggregation (Q8), multi-way profit rollup (Q9), view + scalar-max
selection (Q15), distinct-count with NOT-IN exclusion (Q16), HAVING-driven
semi-join (Q18), quantity-threshold supplier promotion (Q20), and the
"only achiever of the order's max" multi-exists pattern (Q21).

Adaptation note: the driver's test schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns (TESTDATA.md), so Q2/Q9/Q16/Q20
derive the part↔supplier relation from ``SELECT DISTINCT l_partkey,
l_suppkey FROM lineitem`` and Q21 replaces the "received late" predicate
with "shipped last in the order". The *plan shapes* — what the optimizer
must do — are preserved.

Float determinism: money sums accumulate in DECIMAL (order-independent)
and surface as rounded doubles, exactly like relational_queries.py.

100 TB posture: nation/region are always broadcast; supplier/part carry no
hint so AQE picks broadcast at small SF and shuffle at scale; every
orderkey-keyed join shuffles on the same key so Exchange reuse kicks in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.plans.relational_queries import (
    _REVENUE_SQL,
    _revenue,
)
from weather_data_data_pipeline_spark.registry import register
from weather_data_data_pipeline_spark.sources.tables import load


def _dec(c: str, scale: int = 2):
    return F.col(c).cast(f"decimal(18,{scale})")


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan-filter-sum, zero joins, one group. Every "
    "predicate is parquet-pushable (shipdate range, discount band, "
    "quantity cap), so at 100 TB this is a min/max-statistics row-group "
    "skip plus a single-column decimal sum — the cheapest full-table "
    "query in the suite and the canonical pushdown benchmark.",
    tags=("relational", "aggregate", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(round(sum({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: bidirectional nation-pair trade volume by year. The "
    "disjunctive cross-nation predicate cannot be pushed into either "
    "single-nation filter alone, but each side's IN ('NATION_1', "
    "'NATION_2') residual can — the engine pre-filters both dimension "
    "paths before the big join, then applies the pair predicate post-join. "
    "nation is broadcast twice under different aliases.",
    tags=("relational", "join", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    n1 = load(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    n2 = load(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    # Pre-filter the fact paths with the pushable half of the predicate:
    # only suppliers/customers in one of the two nations survive the scan.
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == n1.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == n2.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_2'
                               THEN volume ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
        SELECT year(o.o_orderdate) AS o_year,
               CAST({_REVENUE_SQL} AS DECIMAL(38,4)) AS volume,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8: national market share = conditional sum / total sum in "
    "one aggregate pass over an 8-table join. The CASE-WHEN numerator "
    "rides the same HashAggregate as the denominator (no second scan, no "
    "self-join). Ratio computed in double from exact decimal sums so both "
    "engines divide identical operands.",
    tags=("relational", "join", "aggregate", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation")
    n2 = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = _revenue().cast("decimal(38,4)")
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(
                n2.select(
                    F.col("n_nationkey").alias("s_nkey"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            s.s_nationkey == F.col("s_nkey"),
        )
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    zero = F.lit(0).cast("decimal(38,4)")
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double"),
            4,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           CAST(round(sum(CAST({_REVENUE_SQL} AS DECIMAL(38,6))
                          - CAST(0.1 AS DECIMAL(18,1))
                            * CAST(p.p_retailprice AS DECIMAL(18,2))
                            * CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape (adapted: no partsupp table in the test schema, so "
    "the supply-cost term is 10% of p_retailprice × quantity instead of "
    "ps_supplycost × quantity — same expression tree, same join shape "
    "minus one table). Profit by supplier nation and order year with a "
    "non-pushable LIKE '%red%' part filter: the optimizer must still prune "
    "part columns and broadcast the filtered dim.",
    tags=("relational", "join", "aggregate", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = _revenue().cast("decimal(38,6)") - (
        F.lit(0.1).cast("decimal(18,1)") * _dec("p_retailprice") * _dec("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(round(sum({_REVENUE_SQL}), 2) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15: quarterly revenue view + scalar-max subquery selecting "
    "the top supplier(s). The Spark plan computes the per-supplier "
    "aggregate once, derives the global max as a 1-row broadcast, and "
    "joins on revenue equality — no window-over-unpartitioned-data (which "
    "would serialize all rows through one task at scale). Revenue equality "
    "is exact because both sides round identical decimal sums.",
    tags=("relational", "aggregate", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_revenue()), 2).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (adapted: the part↔supplier relation is derived "
    "as DISTINCT (l_partkey, l_suppkey) from lineitem since the test "
    "schema has no partsupp). Distinct supplier count per part attribute "
    "with a NOT-IN exclusion of negative-balance suppliers — the NOT IN "
    "compiles to a broadcast left-anti join (s_suppkey is non-nullable so "
    "anti-join and NOT IN agree).",
    tags=("relational", "aggregate", "subquery", "tpch"),
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad_supp), ps.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_totalprice,
           CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18: large-volume orders via a HAVING-filtered IN subquery "
    "→ semi-join. The aggregate-then-filter subquery shuffles lineitem "
    "once on l_orderkey; the semi-join and the outer join reuse that "
    "partitioning (Exchange reuse), and the final top-100 is "
    "TakeOrderedAndProject with a deterministic (totalprice DESC, "
    "orderkey) tie-break — no global sort.",
    tags=("relational", "join", "subquery", "topk", "tpch"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q20_promo_part_suppliers",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(l.l_quantity) > 30
    )
    """,
    doc="TPC-H Q20 shape (adapted: shipped-quantity threshold replaces the "
    "partsupp availability comparison — same semi-join-into-HAVING plan). "
    "Suppliers who moved >30 units of any PROMO part in 1997: lineitem "
    "aggregates per (suppkey, partkey) behind a pushed date filter, the "
    "HAVING filter feeds a semi-join against supplier, nation broadcasts "
    "for the name lookup.",
    tags=("relational", "join", "subquery", "tpch"),
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    movers = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 30)
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(movers, s.s_suppkey == movers.l_suppkey, "semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


@register(
    "q21_last_shipper_wait",
    oracle="""
    WITH per_supp AS (
        SELECT l.l_orderkey, l.l_suppkey, max(l.l_shipdate) AS supp_last
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey, l.l_suppkey
    ),
    per_order AS (
        SELECT l_orderkey,
               max(supp_last) AS order_last,
               count(*) AS n_suppliers,
               count(*) FILTER (WHERE supp_last = order_last_w) AS n_latest
        FROM (
            SELECT *, max(supp_last) OVER (PARTITION BY l_orderkey) AS order_last_w
            FROM per_supp
        )
        GROUP BY l_orderkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM per_supp ps
    JOIN per_order po ON ps.l_orderkey = po.l_orderkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE po.n_suppliers >= 2
      AND po.n_latest = 1
      AND ps.supp_last = po.order_last
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape (adapted: the test schema has no "
    "l_commitdate/l_receiptdate, so 'kept the order waiting' becomes "
    "'sole latest shipper in a multi-supplier F-order' — the same "
    "exists(other supplier) AND not-exists(other equally-late supplier) "
    "double-correlation, expressed as one grouped pass instead of two "
    "self-joins). per-(order,supplier) max ships shuffle once on "
    "l_orderkey; the per-order rollup reuses that partitioning; supplier "
    "is a broadcast lookup. At 100 TB this is 1 wide shuffle vs the "
    "textbook plan's 3 lineitem self-joins.",
    tags=("relational", "join", "window", "subquery", "tpch"),
)
def q21_last_shipper_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    per_supp = (
        l.join(o, l.l_orderkey == o.o_orderkey, "semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.max("supp_last").alias("order_last"),
        F.count("*").alias("n_suppliers"),
    )
    # n_latest: how many suppliers achieved the order's max ship date.
    latest_counts = (
        per_supp.join(per_order, "l_orderkey")
        .where(F.col("supp_last") == F.col("order_last"))
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_latest"))
    )
    s = load(spark, sf_dir, "supplier")
    return (
        per_supp.join(per_order, "l_orderkey")
        .join(latest_counts, "l_orderkey")
        .where(
            (F.col("n_suppliers") >= 2)
            & (F.col("n_latest") == 1)
            & (F.col("supp_last") == F.col("order_last"))
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q2_min_balance_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    candidates AS (
        SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM part p
        JOIN ps       ON ps.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
    )
    SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_brand
    FROM candidates c
    WHERE c.s_acctbal = (
        SELECT min(c2.s_acctbal) FROM candidates c2
        WHERE c2.p_partkey = c.p_partkey
    )
    """,
    doc="TPC-H Q2 shape (adapted: part↔supplier relation from DISTINCT "
    "lineitem pairs; min s_acctbal stands in for min ps_supplycost). "
    "Correlated scalar-min subquery decorrelated into a per-part min "
    "aggregate joined back on (p_partkey, value) — the standard "
    "Catalyst rewrite, done explicitly so the plan is 2 scans of the "
    "small candidate set rather than a per-row subquery.",
    tags=("relational", "join", "subquery", "tpch"),
)
def q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    candidates = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
    ).cache()
    per_part_min = candidates.groupBy(F.col("p_partkey").alias("mp")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        candidates.join(
            F.broadcast(per_part_min),
            (candidates.p_partkey == F.col("mp"))
            & (candidates.s_acctbal == F.col("min_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
    )
