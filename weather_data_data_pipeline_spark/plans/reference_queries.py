"""Reference-surface queries (SURVEY.md §2) bound to the driver's tables.

Each query reproduces one operator family of the reference pipeline
(``/root/reference/src/weather_report_pipeline/*.py``) on the synthetic
``events``/``lineitem`` tables, with a DuckDB oracle twin. The weather-domain
versions of the same operators live in ``pipeline/weather.py`` (exercised by
unit tests on canned payloads; the driver tables have no weather columns).

Scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.operators.aggregates import range_avg, weekly_avg
from weather_data_data_pipeline_spark.operators.joins import anti_join_dedup
from weather_data_data_pipeline_spark.operators.transforms import (
    date_between,
    format_timestamp,
    kelvin_to_celsius,
    ms_to_kmh,
    recency_filter,
    round2,
)
from weather_data_data_pipeline_spark.registry import register
from weather_data_data_pipeline_spark.sources.tables import load


@register(
    "weekly_avg_value",
    oracle="""
    SELECT event_type,
           CAST(weekofyear(ts) AS INTEGER) AS week,
           round(avg(value), 2) AS average_value
    FROM events
    GROUP BY event_type, week
    """,
    doc="A1 (ref full_load:86-94): ISO-week expression-key hash aggregate.",
    tags=("reference", "aggregate"),
)
def weekly_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Partial+final HashAggregate; one shuffle on (event_type, week).
    ev = load(spark, sf_dir, "events")
    return weekly_avg(ev, ["event_type"], "ts", "value")


@register(
    "weekly_avg_incremental_merge",
    oracle="""
    SELECT event_type,
           CAST(weekofyear(ts) AS INTEGER) AS week,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(value), 2) AS average_value
    FROM events
    GROUP BY event_type, week
    """,
    doc="Incremental-view-maintenance twin of weekly_avg_value: the "
    "input is split into 'history' and 'new batch' (event_id parity), "
    "each reduced to a mergeable (decimal sum, count) state "
    "(operators/state.py), states merged, then finalized. Exact "
    "decimal state makes the merge associative, so hourly batches fold "
    "into the report reading O(groups) state instead of re-scanning "
    "all history — the scale-correct form of the reference's "
    "recompute-everything hourly pipeline (inc_load:102-129). Oracle "
    "is the full single-pass recompute: both must hash-match exactly.",
    tags=("reference", "aggregate", "incremental"),
)
def weekly_avg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_data_data_pipeline_spark.operators.state import (
        avg_state,
        finalize_avg,
        merge_avg_states,
    )

    ev = load(spark, sf_dir, "events").withColumn(
        "week", F.weekofyear("ts").cast("int")
    )
    keys = ["event_type", "week"]
    history = ev.where(F.pmod("event_id", F.lit(2)) == 0)
    batch = ev.where(F.pmod("event_id", F.lit(2)) == 1)
    merged = merge_avg_states(
        [avg_state(history, keys, "value"), avg_state(batch, keys, "value")],
        keys,
    )
    return finalize_avg(merged, keys)


@register(
    "avg_value_in_range",
    oracle="""
    SELECT event_type,
           round(avg(value), 2) AS average_value,
           DATE '2024-01-08' AS start_date,
           DATE '2024-01-21' AS end_date
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-21'
    GROUP BY event_type
    """,
    doc="A2+P7+P8 (ref full_load:97-115): inclusive date-range filtered avg "
    "with lit() range columns. Filter sits below the agg → pushed to scan.",
    tags=("reference", "aggregate", "filter"),
)
def avg_value_in_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = range_avg(
        ev,
        ["event_type"],
        date_between("ts", "2024-01-08", "2024-01-21"),
        "value",
    )
    return out.withColumn("start_date", F.lit("2024-01-08").cast("date")).withColumn(
        "end_date", F.lit("2024-01-21").cast("date")
    )


@register(
    "scalar_transforms",
    oracle="""
    SELECT event_id,
           event_type,
           round(value - 273.15, 2) AS value_celsius,
           round(value * 3.6, 2) AS speed_kmh,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    """,
    doc="P1+P2+P4+P5+P6+P12 (ref full_load:63-81): unit conversions, "
    "rounding, projection, typed timestamp formatting — all codegen'd "
    "Column expressions, zero Python per row.",
    tags=("reference", "scalar"),
)
def scalar_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        round2(kelvin_to_celsius("value")).alias("value_celsius"),
        round2(ms_to_kmh("value")).alias("speed_kmh"),
        format_timestamp("ts").alias("ts_str"),
    )


@register(
    "recency_filter_last_hour",
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
    """,
    doc="P9-P11 (ref inc_load:86-95), corrected: trailing-window incremental "
    "filter anchored on the dataset max (deterministic) instead of the "
    "reference's self-referential now()-vs-now() no-op. At scale this "
    "predicate partition-prunes a ts-partitioned layout.",
    tags=("reference", "incremental"),
)
def recency_filter_last_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return recency_filter(ev, "ts", hours=1).select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )


@register(
    "anti_join_dedup",
    oracle="""
    SELECT n.l_orderkey, n.l_partkey, n.l_suppkey, n.l_linenumber,
           round(n.l_quantity, 2) AS l_quantity
    FROM lineitem n
    WHERE n.l_linenumber <> 1
      AND NOT EXISTS (
        SELECT 1 FROM lineitem d
        WHERE d.l_linenumber = 1
          AND d.l_orderkey = n.l_orderkey
          AND d.l_partkey = n.l_partkey
          AND d.l_suppkey = n.l_suppkey
      )
    """,
    doc="J1 (ref full_load:163-167): composite-3-key left-anti dedup join — "
    "the reference's idempotent-append primitive. 'Destination' = line 1 "
    "rows, 'new batch' = the rest. Catalyst/AQE picks broadcast-anti when "
    "the key set is small.",
    tags=("reference", "join"),
)
def anti_join_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dest = li.where(F.col("l_linenumber") == 1)
    new = li.where(F.col("l_linenumber") != 1)
    out = anti_join_dedup(new, dest, ["l_orderkey", "l_partkey", "l_suppkey"])
    return out.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        F.round("l_quantity", 2).alias("l_quantity"),
    )


@register(
    "events_props_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    doc="North-star MapType parsing (SURVEY.md §7 phase 4): from_json the "
    "events.props JSON into map<string,int> and aggregate a key — "
    "executor-side JSON decode, no driver involvement.",
    tags=("reference", "semistructured"),
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    props = F.from_json("props", "map<string,int>")
    return (
        ev.select("event_type", props.getItem("k").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n_events"))
    )


@register(
    "events_props_variant",
    oracle="""
    SELECT event_type,
           count(CAST(json_extract(props, '$.k') AS INTEGER)) AS n_with_k,
           round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 2) AS avg_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER)
             AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured ingestion on the VARIANT type (Spark 4): "
    "parse_json once into the binary variant encoding, then typed "
    "variant_get path extraction — the schema-on-read path for payloads "
    "too heterogeneous for a declared from_json schema (the from_json "
    "twin is events_props_extract). Extraction is JVM-side columnar; at "
    "100 TB VARIANT shredding in parquet keeps path reads "
    "column-pruned.",
    tags=("reference", "semistructured"),
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "tumbling_window_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n_events,
           round(avg(value), 2) AS avg_value
    FROM events
    GROUP BY window_start, event_type
    """,
    doc="Batch twin of the Structured Streaming tumbling-window aggregate "
    "(streaming/incremental.py runs the same plan over readStream with a "
    "watermark). F.window keeps the group key a typed struct.",
    tags=("reference", "window", "streaming-twin"),
)
def tumbling_window_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 2).alias("avg_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )
