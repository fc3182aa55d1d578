"""Table-maintenance and validation queries: MERGE upsert, SCD Type 2,
cross-table referential integrity, and the full window-function family.

These complete the engine's write-path and audit surface beyond the
reference's single append-with-anti-join primitive (cites in
`operators/merge.py`). All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.operators.merge import (
    merge_upsert,
    orphan_count,
    scd2_snapshot,
    table_diff,
)
from weather_data_data_pipeline_spark.registry import register
from weather_data_data_pipeline_spark.sources.tables import load


def _version_writers() -> int:
    """Writers per version delta for the scratch versioned layouts —
    env-parameterised (SPARK_GRAFT_VERSION_WRITERS, local default 1 →
    one file per delta, the measured-best bench layout). Production
    sizes this to delta_bytes / target_file_size; the salted >1 path is
    exercised by tests/test_layout.py's pathological-skew unit."""
    import os

    return int(os.environ.get("SPARK_GRAFT_VERSION_WRITERS", "1"))


@register(
    "merge_upsert_orders",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders
    ),
    source AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               CAST(round(price * CAST('1.05' AS DECIMAL(4,2)), 2) AS DOUBLE)
                 AS o_totalprice
        FROM base WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 1000000000, o_custkey, 'N' AS o_orderstatus,
               CAST(price AS DOUBLE) AS o_totalprice
        FROM base WHERE o_orderkey % 13 = 0
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM source
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, CAST(price AS DOUBLE)
    FROM base o
    WHERE NOT EXISTS (SELECT 1 FROM source s
                      WHERE s.o_orderkey = o.o_orderkey)
    """,
    doc="MERGE INTO semantics as one anti-join + union: a derived source "
    "(price-bumped updates for orderkey%7, new keys for orderkey%13) "
    "upserted into orders. Matched keys take the source row, unmatched "
    "source rows insert, the rest of the target passes through — no "
    "full-outer join, no window, one shuffle (or broadcast) on the key.",
    tags=("relational", "maintenance", "bench"),
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Price arithmetic in DECIMAL: double×1.05 rounds differently across
    # engines at .005 representation boundaries; decimal math is exact
    # and both engines round decimals half-away-from-zero.
    price = F.col("o_totalprice").cast("decimal(18,2)")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        price.cast("double").alias("o_totalprice"),
    )
    updates = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey", "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            F.round(price * F.lit("1.05").cast("decimal(4,2)"), 2)
            .cast("double")
            .alias("o_totalprice"),
        )
    )
    inserts = (
        orders.where(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 1000000000)
        .withColumn("o_orderstatus", F.lit("N"))
    )
    source = updates.unionByName(inserts)
    return merge_upsert(orders, source, ["o_orderkey"])


@register(
    "scd2_user_values",
    oracle="""
    SELECT user_id, event_id,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current,
           CAST(row_number() OVER w AS BIGINT) AS version
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD Type 2 from a change stream: each user's events become "
    "versioned rows with [valid_from, valid_to) intervals, is_current "
    "on the open-ended last version, and a version sequence. lead() "
    "and row_number() share one window spec → one shuffle, one sort.",
    tags=("relational", "maintenance", "window", "bench"),
)
def scd2_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return scd2_snapshot(
        ev, ["user_id"], "ts", tiebreak_cols=["event_id"]
    ).select(
        "user_id", "event_id", "valid_from", "valid_to", "is_current",
        F.col("version").cast("long").alias("version"),
    )


@register(
    "referential_integrity_checks",
    oracle="""
    SELECT 'orders_custkey_orphans' AS check_name,
           CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
             AS n_violations
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_custkey IS NOT NULL
    UNION ALL
    SELECT 'lineitem_orderkey_orphans',
           CAST(count(*) FILTER (WHERE ord.o_orderkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN orders ord ON l.l_orderkey = ord.o_orderkey
    WHERE l.l_orderkey IS NOT NULL
    UNION ALL
    SELECT 'supplier_nationkey_orphans',
           CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_nationkey IS NOT NULL
    """,
    doc="Cross-table referential integrity audit: orphaned foreign keys "
    "counted with left-anti joins (NULL FKs exempt, per SQL semantics). "
    "Small parents broadcast; a 100 TB child probes a bloom filter of "
    "the parent key set before shuffling anything.",
    tags=("relational", "quality"),
)
def referential_integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    checks = [
        ("orders_custkey_orphans", orders, customer, "o_custkey", "c_custkey"),
        ("lineitem_orderkey_orphans", lineitem, orders, "l_orderkey", "o_orderkey"),
        ("supplier_nationkey_orphans", supplier, nation, "s_nationkey", "n_nationkey"),
    ]
    out = None
    for name, child, parent, fk, pk in checks:
        one = orphan_count(child, parent, fk, pk).select(
            F.lit(name).alias("check_name"), "n_violations"
        )
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "window_function_suite",
    oracle="""
    SELECT event_id, user_id,
           round(lead(value) OVER w - value, 2) AS next_delta,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cume,
           round(nth_value(value, 2) OVER w, 2) AS second_value,
           round(first_value(value) OVER w, 2) AS first_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="The remaining analytic window family in one pass: lead, "
    "percent_rank, cume_dist, nth_value, first_value — all sharing a "
    "single (user, time) window spec, so Catalyst plans one Window "
    "node: one shuffle on user_id, one sort. Completes coverage next "
    "to lag/rank/row_number/ntile elsewhere in the registry.",
    tags=("relational", "window", "bench"),
)
def window_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.lead("value").over(w) - F.col("value"), 2).alias("next_delta"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.round(F.nth_value("value", 2).over(w), 2).alias("second_value"),
        F.round(F.first("value").over(w), 2).alias("first_val"),
    )


@register(
    "table_diff_orders",
    oracle="""
    WITH r AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 101 = 0
                    THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 103 = 0
    )
    SELECT coalesce(l.o_orderkey, r.o_orderkey) AS o_orderkey,
           CASE WHEN r.o_orderkey IS NULL THEN 'only_left'
                WHEN l.o_orderkey IS NULL THEN 'only_right'
                ELSE 'changed' END AS diff_status
    FROM orders l FULL OUTER JOIN r USING (o_orderkey)
    WHERE r.o_orderkey IS NULL OR l.o_orderkey IS NULL
       OR l.o_custkey IS DISTINCT FROM r.o_custkey
       OR l.o_orderstatus IS DISTINCT FROM r.o_orderstatus
       OR l.o_totalprice IS DISTINCT FROM r.o_totalprice
       OR l.o_orderdate IS DISTINCT FROM r.o_orderdate
       OR l.o_orderpriority IS DISTINCT FROM r.o_orderpriority
    """,
    doc="Symmetric table diff (operators/merge.py: table_diff) between "
    "orders and a deterministically drifted replica (keys % 97 dropped, "
    "% 101 repriced, % 103 re-keyed as inserts): one (key, row-hash) "
    "projection per side, one full-outer join on the key, identical "
    "rows filtered before leaving the join — the anti-entropy check "
    "for replica reconciliation and migration cutover, with shuffle "
    "bytes proportional to keys, not payload width.",
    tags=("maintenance", "audit"),
)
def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    drifted = (
        orders.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
        .select(*cols)
        .unionByName(
            orders.where(F.col("o_orderkey") % 103 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                *cols[1:],
            )
        )
    )
    return table_diff(orders, drifted, ["o_orderkey"])


@register(
    "jdbc_roundtrip",
    # The destination-table math is pure relational, so the oracle runs
    # it straight on the parquet nation table: if the JDBC write, the
    # idempotent re-append (anti-join must add 0 rows), or the JDBC read
    # corrupts anything — row loss, duplication, type mangling — the
    # region aggregate diverges and the hash check fails.
    oracle="""
    SELECT n_regionkey AS region_key,
           count(*) AS n_nations,
           CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
           min(n_name) AS first_name
    FROM nation GROUP BY n_regionkey
    """,
    doc="Live JDBC append + idempotent re-append + read-back inside the "
    "correctness gate (VERDICT r2 #4 — SURVEY §2.1 S5/S6 driver row): "
    "writes the nation table to an embedded Apache Derby database (the "
    "JDBC engine shipping in Spark's own jars; MySQL is unreachable in "
    "this sandbox — ref weather_report_data_full_load_pipeline.py:146-171), "
    "re-appends the same batch behind the reference's anti-join dedup "
    "(must add zero rows), reads the destination back over JDBC, and "
    "aggregates per region. Hash-checked against the same aggregate on "
    "the parquet source: any loss/duplication/type-mangling in the JDBC "
    "path diverges the result.",
    tags=("maintenance", "jdbc"),
)
def jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from weather_data_data_pipeline_spark.operators.joins import anti_join_dedup
    from weather_data_data_pipeline_spark.sources import jdbc

    import os

    tmp = tempfile.mkdtemp(prefix="jdbc_roundtrip_")
    try:
        # keep derby.log out of the process cwd — but only claim the
        # process-global JVM property if nobody set it, and point it at
        # a STABLE singleton dir, not this call's scratch (ADVICE r3: a
        # registered gate query must not mutate global state per call,
        # and Derby's logger re-creates whatever dir the property names)
        jvm_sys = spark.sparkContext._jvm.java.lang.System
        if jvm_sys.getProperty("derby.system.home") is None:
            home = os.path.join(tempfile.gettempdir(), "derby_system_home")
            os.makedirs(home, exist_ok=True)
            jvm_sys.setProperty("derby.system.home", home)
    except Exception:
        pass
    url = f"jdbc:derby:{tmp}/roundtrip;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    try:
        nation = load(spark, sf_dir, "nation")
        jdbc.append(nation, url, "nation_dest", props)
        # the reference's idempotency contract: re-running the load must
        # not duplicate destination rows (anti-join on the key first)
        existing = jdbc.read_table(spark, url, "nation_dest", props)
        fresh = anti_join_dedup(nation, existing, ["n_nationkey"])
        jdbc.append(fresh, url, "nation_dest", props)
        back = jdbc.read_table(spark, url, "nation_dest", props)
        # materialize the aggregate (5 rows) BEFORE tearing the scratch
        # database down, so the returned DataFrame no longer needs Derby
        return back.groupBy(F.col("n_regionkey").alias("region_key")).agg(
            F.count("*").alias("n_nations"),
            F.sum("n_nationkey").alias("sum_key"),
            F.min("n_name").alias("first_name"),
        ).localCheckpoint(eager=True)
    finally:
        try:
            # embedded Derby signals a CLEAN shutdown with SQLException
            # 08006 — reaching the exception handler is the success path
            spark.sparkContext._jvm.java.sql.DriverManager.getConnection(
                f"jdbc:derby:{tmp}/roundtrip;shutdown=true"
            )
        except Exception:
            pass
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "scd2_point_in_time_join",
    oracle="""
    WITH dim AS (
      SELECT user_id, event_id, ts AS valid_from,
             lead(ts) OVER w AS valid_to,
             row_number() OVER w AS version
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    dim1 AS (
      -- unique version per (user, valid_from): duplicate-timestamp
      -- changes collapse to the LAST version at that instant
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, valid_from
                                     ORDER BY event_id DESC) AS rr
        FROM dim) WHERE rr = 1
    ),
    probe AS (
      SELECT event_id AS probe_id, user_id,
             ts - INTERVAL 30 MINUTE AS asof
      FROM events WHERE event_id % 17 = 0
    )
    SELECT p.probe_id, p.user_id, p.asof,
           d.valid_from AS matched_valid_from,
           d.event_id AS version_event_id,
           CAST(d.version AS BIGINT) AS version
    FROM probe p
    LEFT JOIN dim1 d
      ON d.user_id = p.user_id
     AND d.valid_from <= p.asof
     AND (d.valid_to IS NULL OR d.valid_to > p.asof)
    """,
    doc="Point-in-time enrichment against an SCD Type 2 dimension: every "
    "probe (user, as-of timestamp) picks up the dimension version VALID "
    "at that instant — the time-travel lookup feature stores and "
    "backtest pipelines run constantly. The naive plan (equi-join on "
    "key + interval filter) explodes by versions-per-key before "
    "filtering; this rides operators/timeseries.py:asof_join's "
    "merge-scan instead — union + one window pass, one shuffle on the "
    "key, cost independent of version count (a 10^5-version hot key "
    "costs its row count, not probes x versions). Probes older than "
    "the first version surface with NULL version (left semantics). "
    "The oracle expresses the same lookup as the validity-interval "
    "join; equivalence of the two formulations is the correctness "
    "argument for the merge-scan.",
    tags=("relational", "maintenance", "timeseries", "bench"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_data_data_pipeline_spark.operators.timeseries import asof_join

    ev = load(spark, sf_dir, "events")
    dim = scd2_snapshot(ev, ["user_id"], "ts", tiebreak_cols=["event_id"])
    # unique version per (user, valid_from): duplicate-timestamp changes
    # collapse to the last version at that instant (asof_join contract)
    w = Window.partitionBy("user_id", "valid_from").orderBy(F.desc("event_id"))
    dim1 = (
        dim.withColumn("_rr", F.row_number().over(w))
        .where(F.col("_rr") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("version_event_id"),
            "valid_from",
            F.col("version").cast("long").alias("version"),
        )
    )
    probe = ev.where(F.col("event_id") % 17 == 0).select(
        F.col("event_id").alias("probe_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("asof"),
    )
    return asof_join(
        probe,
        dim1,
        keys=["user_id"],
        left_ts="asof",
        right_ts="valid_from",
        right_cols=["version_event_id", "version"],
    ).select(
        "probe_id",
        "user_id",
        "asof",
        F.col("matched_valid_from"),
        "version_event_id",
        "version",
    )


@register(
    "data_expectations_report",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
           count(*) AS n_rows
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_complete',
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT), count(*)
    FROM orders
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                AS BIGINT), count(*)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_price_positive',
           CAST(count(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT), count(*)
    FROM lineitem
    UNION ALL
    SELECT 'events_ts_complete',
           CAST(count(*) FILTER (WHERE ts IS NULL) AS BIGINT), count(*)
    FROM events
    UNION ALL
    SELECT 'documents_text_nonempty',
           CAST(count(*) FILTER (WHERE text IS NULL OR text = '') AS BIGINT),
           count(*)
    FROM documents
    """,
    doc="Declarative data-quality expectations (the Deequ/Great-"
    "Expectations shape): primary-key uniqueness, completeness, and "
    "value-range checks as one conditional-aggregate pass per table — "
    "each check is a count FILTER, so a table contributes ONE "
    "partial+final aggregate regardless of how many checks it carries, "
    "and a 100 TB fact pays one scan for its whole expectation suite. "
    "Complements referential_integrity_checks (cross-table) and the "
    "in-flight observe() metrics (sources/observability.py) with the "
    "batch audit surface.",
    tags=("relational", "quality", "maintenance"),
)
def data_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")
    documents = load(spark, sf_dir, "documents")

    def report(df, name: str, violation_col) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.sum(F.when(violation_col, 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
            F.count("*").alias("n_rows"),
        )

    pk = orders.agg(
        F.lit("orders_pk_unique").alias("check_name"),
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("n_violations"),
        F.count("*").alias("n_rows"),
    )
    checks = [
        pk,
        report(orders, "orders_custkey_complete", F.col("o_custkey").isNull()),
        report(
            lineitem,
            "lineitem_qty_range",
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        report(
            lineitem, "lineitem_price_positive", F.col("l_extendedprice") <= 0
        ),
        report(events, "events_ts_complete", F.col("ts").isNull()),
        report(
            documents,
            "documents_text_nonempty",
            F.col("text").isNull() | (F.col("text") == ""),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "dataset_card_by_source",
    oracle="""
    WITH dup AS (
      SELECT md5(text) AS digest, source, count(*) AS n
      FROM documents GROUP BY 1, 2
    ),
    dupes AS (
      SELECT source, CAST(sum(n - 1) AS BIGINT) AS n_exact_dups
      FROM dup GROUP BY source
    ),
    stats AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> '')))
                  AS BIGINT) AS total_tokens,
             round(avg(n_chars), 2) AS avg_chars,
             round(CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE)
                   / count(*), 4) AS pct_en,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents GROUP BY source
    )
    SELECT s.source, s.n_docs, s.total_tokens, s.avg_chars, s.pct_en,
           s.n_langs, coalesce(d.n_exact_dups, 0) AS n_exact_dups
    FROM stats s LEFT JOIN dupes d USING (source)
    """,
    doc="Dataset-card generator: the per-source summary a training-data "
    "release ships — document and token counts, average length, "
    "language mix, and the exact-duplicate count (md5-digest groupBy, "
    "the same one-shuffle dedup primitive as dedup_exact). One "
    "aggregate over the corpus plus one digest aggregate; every metric "
    "is a partial+final combine, so the card costs two scans at any "
    "corpus size.",
    tags=("llm", "text", "quality"),
)
def dataset_card_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    )
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).cast("long").alias("total_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count("*"),
            4,
        ).alias("pct_en"),
        F.countDistinct("lang").alias("n_langs"),
    )
    dupes = (
        docs.groupBy(F.md5("text").alias("digest"), F.col("source"))
        .agg(F.count("*").alias("n"))
        .groupBy("source")
        .agg(F.sum(F.col("n") - 1).cast("long").alias("n_exact_dups"))
    )
    return stats.join(dupes, "source", "left").select(
        "source",
        "n_docs",
        "total_tokens",
        "avg_chars",
        "pct_en",
        "n_langs",
        F.coalesce("n_exact_dups", F.lit(0)).alias("n_exact_dups"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, last_order, frequency, monetary,
             ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_quartile,
             ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_quartile,
             ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_quartile
      FROM base
    )
    SELECT o_custkey, last_order, frequency, monetary,
           CAST(r_quartile AS BIGINT) AS r_quartile,
           CAST(f_quartile AS BIGINT) AS f_quartile,
           CAST(m_quartile AS BIGINT) AS m_quartile,
           CASE WHEN r_quartile = 4 AND f_quartile = 4 AND m_quartile = 4
                  THEN 'champion'
                WHEN r_quartile >= 3 AND f_quartile >= 3 THEN 'loyal'
                WHEN r_quartile <= 1 AND f_quartile >= 3 THEN 'at_risk'
                ELSE 'standard' END AS segment
    FROM scored
    """,
    doc="RFM customer segmentation: recency (last order date), frequency "
    "(order count), monetary (exact DECIMAL revenue) per customer, each "
    "quartiled INDEPENDENTLY with the distributed global ntile "
    "(operators/ranking.py — range-partitioned total order, never a "
    "one-partition window; three ntiles = three range exchanges over "
    "the small per-customer aggregate, not the orders table), then the "
    "classic champion/loyal/at-risk segmentation. Deterministic under "
    "ties via the custkey tiebreak, hence hash-checkable.",
    tags=("relational", "aggregate", "window"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_data_data_pipeline_spark.operators.aggregates import dsum
    from weather_data_data_pipeline_spark.operators.ranking import global_ntile

    orders = load(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    r = global_ntile(base, ["last_order", "o_custkey"], 4, out_col="r_quartile")
    f = global_ntile(r, ["frequency", "o_custkey"], 4, out_col="f_quartile")
    m = global_ntile(f, ["monetary", "o_custkey"], 4, out_col="m_quartile")
    seg = (
        F.when(
            (F.col("r_quartile") == 4)
            & (F.col("f_quartile") == 4)
            & (F.col("m_quartile") == 4),
            "champion",
        )
        .when((F.col("r_quartile") >= 3) & (F.col("f_quartile") >= 3), "loyal")
        .when((F.col("r_quartile") <= 1) & (F.col("f_quartile") >= 3), "at_risk")
        .otherwise("standard")
    )
    return m.select(
        "o_custkey", "last_order", "frequency", "monetary",
        "r_quartile", "f_quartile", "m_quartile", seg.alias("segment"),
    )


@register(
    "snapshot_read_as_of",
    # Recompute-at-version straight over the parquet events view: the
    # snapshot read of the v<=cut deltas must equal filtering the source
    # to the same version prefix and replaying the upsert (latest row
    # per key). Any divergence — a lost/duplicated delta partition, a
    # wrong version predicate, a non-deterministic winner — diverges
    # the rollup hash.
    oracle="""
    WITH v AS (
      SELECT user_id, event_type, ts, event_id, value,
             CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS v
      FROM events
    ),
    mn AS (SELECT min(v) AS vmin FROM v),
    cut AS (
      SELECT v.* FROM v CROSS JOIN mn WHERE v.v <= vmin + 2
    ),
    latest AS (
      SELECT user_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY v DESC, ts DESC, event_id DESC) AS rn
      FROM cut
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CAST(round(CAST(value AS DECIMAL(38,15)), 6)
                         AS DECIMAL(18,6))) AS DECIMAL(38,6))::DOUBLE
             AS sum_latest_value
    FROM latest WHERE rn = 1 GROUP BY event_type
    """,
    doc="Snapshot/time-travel read over the versioned delta layout "
    "(VERDICT r9 ask #7): events are written as weekly ``v=<version>`` "
    "delta partitions (sources/layout.py:write_versioned — the same "
    "replay-safe layout streaming/incremental.py's sinks produce), then "
    "read back AS OF an old version (read_as_of) with upsert semantics "
    "— latest row per (user_id, event_type) by (v, ts, event_id) via "
    "ONE compacting struct-argmax — and rolled up per event_type. The "
    "oracle recomputes the same snapshot directly from the source "
    "table, so read-at-version == recompute-at-version is hash-checked "
    "end-to-end through the physical layout. The version predicate "
    "hits the partition column: newer deltas prune BEFORE IO, so at "
    "100 TB an old snapshot costs its own bytes, not the table's "
    "(the unit suite additionally pins overwrite-then-read-old: "
    "rewriting v=N leaves every v<N snapshot byte-identical).",
    tags=("maintenance", "timetravel", "bench"),
)
def snapshot_read_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from weather_data_data_pipeline_spark.sources.layout import (
        cluster_versions,
        read_as_of,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    week = F.floor(F.unix_timestamp("ts") / 604800)
    tmp = tempfile.mkdtemp(prefix="snapshot_as_of_")
    try:
        # one partitioned write of all version deltas (a producer would
        # write_versioned per batch; the layout on disk is identical).
        # cluster_versions clusters each version into ONE write task so
        # the layout is one file per delta instead of input_partitions ×
        # versions tiny ones (guide §6 small-files: the read-back side
        # was paying ~119 open+schema costs for ~7 versions of data —
        # measured 0.70× same-session on the diff twin); a huge delta
        # passes writers_per_version > 1 with a deterministic salt
        # (layout.cluster_versions, r16 — skew unit in test_layout.py)
        cluster_versions(
            ev.withColumn("v", week), "v", _version_writers(),
            salt_cols=("event_id",),
        ).write.mode("overwrite").partitionBy("v").parquet(
            f"{tmp}/events_versioned"
        )
        vmin = (
            ev.agg(F.min(week).alias("m")).collect()[0]["m"]
        )
        snap = read_as_of(
            spark,
            f"{tmp}/events_versioned",
            int(vmin) + 2,
            key_cols=["user_id", "event_type"],
            order_cols=["ts", "event_id"],
        )
        out = snap.groupBy("event_type").agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum(
                F.round(F.col("value").cast("decimal(38,15)"), 6).cast(
                    "decimal(18,6)"
                )
            )
            .cast("decimal(38,6)")
            .cast("double")
            .alias("sum_latest_value"),
        )
        # materialize (25 rows) BEFORE tearing the scratch layout down
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "snapshot_version_diff",
    # Recompute BOTH snapshots straight over the parquet events view and
    # classify keys with a full outer join — any divergence in either
    # snapshot read, the version predicates, or the winner selection
    # diverges the per-type counts.
    oracle="""
    WITH v AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS v
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    mn AS (SELECT min(v) AS vmin FROM v),
    snap1 AS (
      SELECT user_id, event_type, ts, event_id
      FROM (SELECT v.*, row_number() OVER (
              PARTITION BY user_id, event_type
              ORDER BY v DESC, ts DESC, event_id DESC) AS rn
            FROM v CROSS JOIN mn WHERE v.v <= vmin + 1)
      WHERE rn = 1
    ),
    snap2 AS (
      SELECT user_id, event_type, ts, event_id
      FROM (SELECT v.*, row_number() OVER (
              PARTITION BY user_id, event_type
              ORDER BY v DESC, ts DESC, event_id DESC) AS rn
            FROM v CROSS JOIN mn WHERE v.v <= vmin + 2)
      WHERE rn = 1
    ),
    j AS (
      SELECT coalesce(s2.event_type, s1.event_type) AS event_type,
             CASE WHEN s1.event_id IS NULL THEN 'added'
                  WHEN s2.event_id IS NULL THEN 'removed'
                  WHEN s1.event_id <> s2.event_id THEN 'changed'
                  ELSE 'unchanged' END AS kind
      FROM snap1 s1
      FULL OUTER JOIN snap2 s2
        ON s1.user_id = s2.user_id AND s1.event_type = s2.event_type
    )
    SELECT event_type,
           CAST(sum(CASE WHEN kind = 'added' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(sum(CASE WHEN kind = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(sum(CASE WHEN kind = 'unchanged' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unchanged,
           CAST(sum(CASE WHEN kind = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed
    FROM j GROUP BY event_type
    """,
    doc="CDC-style diff between two snapshot versions of the upsert "
    "layout (r10, extends VERDICT r9 ask #7): per event_type, how many "
    "(user_id, event_type) keys the v+1→v+2 delta ADDED, CHANGED "
    "(latest winner moved to a newer event), or left untouched — the "
    "audit a pipeline runs before promoting a new snapshot to serving "
    "('this weekly delta rewrote 40% of keys' is an incident, not a "
    "release). n_removed is the report's own self-check: an append-"
    "only versioned layout can never remove a key, so the column must "
    "be 0. Both sides are read_as_of partition-pruned reads off the "
    "SAME written layout (one write, two pruned scans + struct-argmax "
    "upserts + one key-space join) — at 100 TB the diff costs the two "
    "snapshots' key spaces, never the event history. Oracle recomputes "
    "both snapshots from the source table, so layout reads AND diff "
    "classification are hash-checked end-to-end.",
    tags=("maintenance", "timetravel", "bench"),
)
def snapshot_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from weather_data_data_pipeline_spark.sources.layout import (
        cluster_versions,
        read_as_of,
    )

    # NULL-keyed rows leave the diff on BOTH engines: a NULL key never
    # matches itself in either engine's equality join, so it would read
    # as one added + one removed phantom pair — excluded explicitly and
    # identically (classification below keys off the join-side
    # event_id, which is non-NULL by table contract, never the data)
    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .where(
            F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
        )
    )
    week = F.floor(F.unix_timestamp("ts") / 604800)
    tmp = tempfile.mkdtemp(prefix="snapshot_diff_")
    try:
        # one file per version delta (see snapshot_read_as_of: measured
        # 0.70× same-session vs the unclustered write whose read-back
        # scanned ~119 tiny files); salted N-writer path for huge
        # deltas via layout.cluster_versions (r16)
        cluster_versions(
            ev.withColumn("v", week), "v", _version_writers(),
            salt_cols=("event_id",),
        ).write.mode("overwrite").partitionBy("v").parquet(
            f"{tmp}/events_versioned"
        )
        vmin = int(ev.agg(F.min(week).alias("m")).collect()[0]["m"])

        def snap(cut: int) -> DataFrame:
            return read_as_of(
                spark,
                f"{tmp}/events_versioned",
                cut,
                key_cols=["user_id", "event_type"],
                order_cols=["ts", "event_id"],
            ).select("user_id", "event_type", "event_id")

        s1 = snap(vmin + 1)
        s2 = snap(vmin + 2)
        j = s1.alias("a").join(
            s2.alias("b"), ["user_id", "event_type"], "full_outer"
        )
        kind = (
            F.when(F.col("a.event_id").isNull(), F.lit("added"))
            .when(F.col("b.event_id").isNull(), F.lit("removed"))
            .when(F.col("a.event_id") != F.col("b.event_id"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
        )
        out = (
            j.select("event_type", kind.alias("kind"))
            .groupBy("event_type")
            .agg(
                *[
                    F.sum(F.when(F.col("kind") == k, 1).otherwise(0))
                    .cast("bigint")
                    .alias(f"n_{k}")
                    for k in ("added", "changed", "unchanged", "removed")
                ]
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
