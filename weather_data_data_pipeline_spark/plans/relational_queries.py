"""Relational engine surface: the full join family, sorts/top-k, window
functions, set operations, distinct/rollup/cube aggregates.

The reference only ships one join (left-anti, J1) and two hash aggregates
(SURVEY.md §2.3-2.4); a complete engine must provide the standard family
— and the north-star dedup/similarity operators are built on semi/anti
joins and windows. TPC-H-shaped queries double as the benchmark suite.

Float determinism: all money sums go through dsum/davg (exact DECIMAL
accumulation, rounded double out) so results hash-match the oracle no
matter how partial aggregation orders the additions — mandatory at
cluster scale where partition order is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.operators.aggregates import davg, dsum
from weather_data_data_pipeline_spark.registry import register
from weather_data_data_pipeline_spark.sources.tables import load

# Exact decimal revenue term: l_extendedprice * (1 - l_discount), computed in
# DECIMAL so sums are order-independent (see module docstring).
def _revenue():
    # Built lazily: Column construction needs an active SparkContext.
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum({_REVENUE_SQL}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum({_REVENUE_SQL} * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 2) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice), 2) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape — the flagship scan-heavy aggregate: 1 pass over "
    "lineitem, 8 aggregates, partial+final HashAggregate, filter pushed to "
    "the parquet scan. The plan at 100 TB: scan parallelism = file splits, "
    "one shuffle of ~6 grouped rows per partition.",
    tags=("relational", "aggregate", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum(_revenue()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_revenue() * (one + dec("l_tax"))), 2)
            .cast("double")
            .alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", out_scale=4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_orderpriority,
           CAST(round(sum({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter → 3-way join → agg → "
    "deterministic top-k (revenue DESC, key ASC tie-break). customer is "
    "broadcast (small after the segment filter); orders⋈lineitem shuffles "
    "on orderkey. TakeOrderedAndProject avoids a global sort.",
    tags=("relational", "join", "topk", "bench"),
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
        .withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    oracle=f"""
    SELECT n.n_name,
           CAST(round(sum({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    doc="TPC-H Q5 shape: 6-table star join. supplier/nation/region are "
    "broadcast dims; only customer⋈orders⋈lineitem shuffle. The "
    "c_nationkey = s_nationkey 'local supplier' predicate rides the "
    "supplier broadcast.",
    tags=("relational", "join", "bench"),
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "left_join_segment_rollup",
    oracle="""
    SELECT c.c_mktsegment,
           count(DISTINCT c.c_custkey) AS n_customers,
           count(o.o_orderkey) AS n_orders,
           CAST(round(sum(coalesce(CAST(o.o_totalprice AS DECIMAL(18,2)), 0)), 2) AS DOUBLE) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="LEFT OUTER join + null-aware aggregation (customers with no "
    "orders still count). Distinct-count + conditional count + exact sum "
    "in one HashAggregate pass.",
    tags=("relational", "join"),
)
def left_join_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.sum(F.coalesce(F.col("o_totalprice").cast("decimal(18,2)"), F.lit(0).cast("decimal(18,2)"))), 2
            )
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    doc="LEFT SEMI join (EXISTS): customers having at least one big order. "
    "Semi joins never duplicate the probe side — the dedup family's "
    "building block.",
    tags=("relational", "join"),
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "full_outer_nation_supplier",
    oracle="""
    SELECT n.n_nationkey, n.n_name, s.s_suppkey, s.s_name
    FROM nation n
    FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
    """,
    doc="FULL OUTER join: null-extending both sides (nations without "
    "suppliers and vice versa).",
    tags=("relational", "join"),
)
def full_outer_nation_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "full_outer").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@register(
    "cross_join_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    doc="Cartesian product of two fixed-size dims (125 rows at any SF) — "
    "BroadcastNestedLoopJoin; the only safe cross-join shape at scale.",
    tags=("relational", "join"),
)
def cross_join_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


@register(
    "window_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    doc="Window function top-k-per-group: row_number over "
    "(partition by customer, order by price desc). One shuffle on "
    "o_custkey; rank predicate applied before any further join.",
    tags=("relational", "window"),
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_running_user_total",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER w, 2) AS running_total,
           round(value - lag(value) OVER w, 2) AS delta_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Running aggregate + lag in one window pass: per-user cumulative "
    "value and delta vs previous event. Frame order is fully "
    "deterministic (ts, event_id tie-break) so float results reproduce.",
    tags=("relational", "window"),
)
def window_running_user_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_total"),
        F.round(F.col("value") - F.lag("value").over(wl), 2).alias("delta_prev"),
    )


@register(
    "event_value_global_deciles",
    oracle="""
    SELECT decile, count(*) AS n,
           min(value) AS min_value, max(value) AS max_value
    FROM (SELECT value,
                 CAST(ntile(10) OVER (ORDER BY value, event_id) AS BIGINT)
                   AS decile
          FROM events)
    GROUP BY decile
    """,
    doc="Global ntile(10) over a TOTAL order — the window shape Spark "
    "can only express natively as a single-partition window (a 100 TB "
    "dead end). Engine side is the distributed formulation "
    "(operators/ranking.py): repartitionByRange + local sort + "
    "per-partition offsets + Arrow-batched rank assignment, then "
    "arithmetic ntile from the global row number. Unique (value, "
    "event_id) tie-break makes the bucketing deterministic; NULL sort "
    "keys would need explicit null-order alignment (Spark NULLS FIRST "
    "vs DuckDB NULLS LAST) — filtered upstream here.",
    tags=("relational", "window", "bench"),
)
def event_value_global_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_data_data_pipeline_spark.operators.ranking import global_ntile

    ev = load(spark, sf_dir, "events").select("event_id", "value")
    d = global_ntile(ev, ["value", "event_id"], 10, out_col="decile")
    return d.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "distinct_parts_per_flag",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_suppliers,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Multi distinct-aggregate: Catalyst expands to a two-phase "
    "Expand+Aggregate plan; no driver-side distinct.",
    tags=("relational", "aggregate"),
)
def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.count("*").alias("n_rows"),
    )


@register(
    "rollup_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets: (flag,status), (flag), () subtotals in one "
    "Expand+Aggregate pass.",
    tags=("relational", "aggregate"),
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows")
    )


@register(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets: all 4 grouping combinations in one pass.",
    tags=("relational", "aggregate"),
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows")
    )


@register(
    "set_ops_nationkeys",
    oracle="""
    SELECT 'customer_only' AS side, nationkey FROM (
      SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
      EXCEPT
      SELECT CAST(s_nationkey AS INTEGER) FROM supplier
    )
    UNION ALL
    SELECT 'both' AS side, nationkey FROM (
      SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
      INTERSECT
      SELECT CAST(s_nationkey AS INTEGER) FROM supplier
    )
    """,
    doc="Set operations (EXCEPT / INTERSECT / UNION ALL) over nationkey "
    "domains — Catalyst rewrites to anti/semi joins.",
    tags=("relational", "setop"),
)
def set_ops_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    only = c.subtract(s)  # EXCEPT (distinct) — rewritten to a left-anti join
    both = c.intersect(s)  # INTERSECT (distinct) — rewritten to a left-semi join
    return only.withColumn("side", F.lit("customer_only")).unionByName(
        both.withColumn("side", F.lit("both"))
    ).select("side", "nationkey")


@register(
    "bag_set_ops_nationkeys",
    oracle="""
    SELECT 'customer_minus_supplier' AS side, nationkey FROM (
      SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
      EXCEPT ALL
      SELECT CAST(s_nationkey AS INTEGER) FROM supplier
    )
    UNION ALL
    SELECT 'both' AS side, nationkey FROM (
      SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
      INTERSECT ALL
      SELECT CAST(s_nationkey AS INTEGER) FROM supplier
    )
    """,
    doc="Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL): "
    "multiplicity-aware difference and intersection. Catalyst rewrites "
    "both to a per-key count aggregate + generate (replicate min/diff "
    "counts) — no raw-row sort, shuffles only per-key counts.",
    tags=("relational", "setop"),
)
def bag_set_ops_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    only = c.exceptAll(s)
    both = c.intersectAll(s)
    return (
        only.withColumn("side", F.lit("customer_minus_supplier"))
        .unionByName(both.withColumn("side", F.lit("both")))
        .select("side", "nationkey")
    )


@register(
    "lineitem_metrics_unpivot",
    oracle="""
    WITH a AS (
      SELECT l_returnflag,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS qty,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS price,
             CAST(count(*) AS DOUBLE) AS n_rows
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty' AS metric, qty AS value FROM a
    UNION ALL
    SELECT l_returnflag, 'price' AS metric, price AS value FROM a
    UNION ALL
    SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM a
    """,
    doc="Unpivot (melt): wide per-flag metric columns to long "
    "(flag, metric, value) rows via DataFrame.unpivot — an Expand node, "
    "one pass, no join; the inverse of the pivot query. Oracle is the "
    "portable UNION ALL formulation.",
    tags=("relational", "reshape"),
)
def lineitem_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("qty"),
        dsum("l_extendedprice").alias("price"),
        F.count("*").cast("double").alias("n_rows"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["qty", "price", "n_rows"], "metric", "value"
    )


@register(
    "order_priority_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS → left-semi join on orderkey, "
    "then count by priority.",
    tags=("relational", "join", "bench"),
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    late = o.join(
        l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi"
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             / 7.0 AS avg_yearly,
           count(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN per_part a ON a.l_partkey = l.l_partkey
    WHERE p.p_size <= 5
      AND l.l_quantity < a.half_avg_qty
    """,
    doc="TPC-H Q17 shape — correlated scalar aggregate subquery "
    "(quantity below half the part's average) decorrelated into a "
    "per-part aggregate + join. The small dimension filter (p_size) "
    "broadcasts; the per-part average is a partial+final agg reused "
    "via one join instead of re-evaluating the subquery per row.",
    tags=("relational", "join", "subquery", "bench"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_size") <= 5).select("p_partkey")
    per_part = l.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(per_part, "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
    )
    return joined.agg(
        (
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            / 7.0
        ).alias("avg_yearly"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    doc="TPC-H Q13 shape — two stacked aggregations: orders per customer "
    "(LEFT join keeps zero-order customers, the filter lives in the join "
    "condition so those customers still count as 0) then the histogram "
    "of those counts. Second agg groups a tiny domain — its shuffle is "
    "negligible; the first is the real one, on c_custkey.",
    tags=("relational", "join", "aggregate"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q22_dormant_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           count(*) AS n_cust,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape — scalar aggregate subquery (global average "
    "balance, broadcast as a 1-row literal join) + NOT EXISTS "
    "decorrelated to a left-anti join on custkey (here: customers whose "
    "order history starts 1996+, i.e. the new-customer cohort), then a "
    "segment rollup. The anti join is the same primitive as the "
    "engine's idempotent-append dedup (J1).",
    tags=("relational", "join", "subquery"),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    rich = c.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("a"))
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_bal"),
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           count(*) FILTER (o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape — conditional counting: one join, one "
    "aggregation computing two differently-filtered counts in a single "
    "pass (CASE/FILTER inside the aggregate, not two scans).",
    tags=("relational", "join", "aggregate"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_ratio",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                         FILTER (p.p_type = 'PROMO') AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape — ratio of a conditionally-filtered aggregate "
    "to the total in the same pass: promo revenue share of one month. "
    "The part dimension broadcasts; both sums are exact decimal.",
    tags=("relational", "join", "aggregate"),
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


@register(
    "q10_top_returning_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape — returned-item revenue per customer, top 20: "
    "three joins (nation broadcasts), filter pushed to both scans, "
    "aggregate, then a global top-k which Spark executes as "
    "TakeOrderedAndProject — per-partition heaps, no full sort.",
    tags=("relational", "join", "topk"),
)
def q10_top_returning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_type = 'PROMO'    AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity >= 25)
       OR (p.p_type = 'STANDARD' AND p.p_size BETWEEN 5 AND 25 AND l.l_quantity < 15)
       OR (p.p_type = 'ECONOMY'  AND p.p_size BETWEEN 20 AND 40 AND l.l_quantity BETWEEN 10 AND 30)
    """,
    doc="TPC-H Q19 shape — disjunctive multi-column join predicates: "
    "three OR'd (type, size, quantity) bands. Catalyst keeps the "
    "partkey equi-join (broadcast for the dimension) and evaluates the "
    "disjunction as a post-join filter with the common partkey "
    "conjunct extracted — the classic OR-predicate join test.",
    tags=("relational", "join", "filter"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type", "p_size")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    band = (
        ((F.col("p_type") == "PROMO") & F.col("p_size").between(1, 10) & (F.col("l_quantity") >= 25))
        | ((F.col("p_type") == "STANDARD") & F.col("p_size").between(5, 25) & (F.col("l_quantity") < 15))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(20, 40) & F.col("l_quantity").between(10, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(band)
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "lineitem_quality_report",
    oracle="""
    WITH base AS (
      SELECT count(*) AS n_rows,
             count(*) FILTER (l_quantity IS NULL) AS nulls_l_quantity,
             count(*) FILTER (l_shipdate IS NULL) AS nulls_l_shipdate,
             count(*) FILTER (l_extendedprice <= 0) AS bad_price_positive,
             count(*) FILTER (l_discount < 0 OR l_discount > 1)
               AS bad_discount_unit_range,
             count(*) FILTER (l_tax < 0) AS bad_tax_nonnegative
      FROM lineitem
    ),
    dup AS (
      SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS rows_in_duplicate_keys
      FROM (SELECT count(*) AS n FROM lineitem
            GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
    )
    SELECT * FROM base CROSS JOIN dup
    """,
    doc="Data-quality gate over lineitem: null counts, range violations "
    "(positive price, discount in [0,1], non-negative tax), and "
    "duplicate-(orderkey, linenumber) row count — every metric from ONE "
    "scan (plus the uniqueness shuffle), not one job per check.",
    tags=("relational", "quality"),
)
def lineitem_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_data_data_pipeline_spark.operators.quality import constraint_report

    li = load(spark, sf_dir, "lineitem")
    return constraint_report(
        li,
        not_null=["l_quantity", "l_shipdate"],
        violations={
            "price_positive": F.col("l_extendedprice") <= 0,
            "discount_unit_range": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 1),
            "tax_nonnegative": F.col("l_tax") < 0,
        },
        unique_key=["l_orderkey", "l_linenumber"],
    )


@register(
    "grouping_sets_flag_priority",
    oracle="""
    SELECT l.l_returnflag, o.o_orderpriority,
           CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY GROUPING SETS ((l_returnflag, o_orderpriority),
                            (l_returnflag), (o_orderpriority))
    """,
    doc="Arbitrary GROUPING SETS (neither rollup nor cube: both 1-d "
    "margins plus the 2-d cell, no grand total) via the SQL surface — "
    "one Expand + single HashAggregate pass over the join, not three "
    "separate aggregation jobs. Exercises spark.sql parity with the "
    "DataFrame registry.",
    tags=("relational", "aggregate", "sql"),
)
def grouping_sets_flag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT l.l_returnflag, o.o_orderpriority,
               CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY GROUPING SETS ((l_returnflag, o_orderpriority),
                                (l_returnflag), (o_orderpriority))
        """
    )


@register(
    "daily_event_type_pivot",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(round(sum(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS click,
           CAST(round(sum(CASE WHEN event_type = 'error'    THEN CAST(value AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS error,
           CAST(round(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS purchase,
           CAST(round(sum(CASE WHEN event_type = 'signup'   THEN CAST(value AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS signup,
           CAST(round(sum(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS view
    FROM events
    GROUP BY day
    """,
    doc="Pivot (long → wide): daily sum of event value per event type as "
    "columns. The value list is EXPLICIT — with it, Spark compiles pivot "
    "to conditional aggregates in one HashAggregate pass; without it, a "
    "distinct-values collect job must run first (unbounded output width "
    "at scale). Decimal sums keep every cell order-independent.",
    tags=("relational", "aggregate"),
)
def daily_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", types)
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
        )
    )


@register(
    "bloom_pruned_urgent_revenue",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           CAST(round(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_orderkey
    """,
    doc="Runtime bloom-filter join pruning (functions/bloom.py): a 16 KB "
    "bloom built in one pass over the urgent orders' keys prunes the "
    "lineitem probe side BEFORE the shuffle — at 100 TB only the "
    "~matching fraction of the fact table reaches the join. The exact "
    "join after the filter removes false positives, so the result is "
    "IDENTICAL to the unfiltered join (no false negatives by "
    "construction) and the oracle is the plain join. The filter probe "
    "is a pure codegen'd Column expression (element_at + bit ops on a "
    "literal word array) — no UDF.",
    tags=("relational", "join", "scale-pattern"),
)
def bloom_pruned_urgent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_data_data_pipeline_spark.functions.bloom import bloom_prune

    urgent = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pruned = bloom_prune(
        load(spark, sf_dir, "lineitem"), urgent, "l_orderkey", "o_orderkey"
    )
    return (
        pruned.join(urgent.select("o_orderkey"), pruned.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
    )


@register(
    "part_basket_lift",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    top_parts AS (
      SELECT l_partkey, count(*) AS n_orders
      FROM li GROUP BY l_partkey
      ORDER BY n_orders DESC, l_partkey LIMIT 40
    ),
    rt AS (
      SELECT li.l_orderkey, li.l_partkey, tp.n_orders
      FROM li JOIN top_parts tp USING (l_partkey)
    ),
    total AS (SELECT count(DISTINCT l_orderkey) AS n_total FROM lineitem),
    co AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             a.n_orders AS n_a, b.n_orders AS n_b,
             count(*) AS n_both
      FROM rt a JOIN rt b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2, 3, 4
    )
    SELECT part_a, part_b, n_both,
           round(CAST(n_both AS DOUBLE) * n_total
                 / (CAST(n_a AS DOUBLE) * n_b), 4) AS lift
    FROM co CROSS JOIN total
    WHERE n_both >= 3
    """,
    doc="Market-basket co-purchase lift over the 40 most-ordered parts: "
    "P(a,b together) / (P(a)·P(b)) per pair — the relational twin of "
    "term_cooccurrence_lift (same vocabulary-restricted self-join "
    "shape: restricting to the top-k head BEFORE the pair join bounds "
    "the quadratic at k²/2 regardless of order count, and the "
    "order-keyed join shuffles only the restricted postings). The "
    "n>=3 support floor mirrors standard association-rule mining.",
    tags=("relational", "aggregate", "join"),
)
def part_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).dropDuplicates()
    top_parts = (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("l_partkey"))
        .limit(40)
    )
    rt = li.join(F.broadcast(top_parts), "l_partkey").select(
        "l_orderkey", "l_partkey", "n_orders"
    )
    total = load(spark, sf_dir, "lineitem").agg(
        F.count_distinct("l_orderkey").alias("n_total")
    )
    a = rt.select(
        F.col("l_orderkey"),
        F.col("l_partkey").alias("part_a"),
        F.col("n_orders").alias("n_a"),
    )
    b = rt.select(
        F.col("l_orderkey"),
        F.col("l_partkey").alias("part_b"),
        F.col("n_orders").alias("n_b"),
    )
    co = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_both"))
    )
    return (
        co.crossJoin(F.broadcast(total))
        .where(F.col("n_both") >= 3)
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(
                F.col("n_both") * F.col("n_total")
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )
