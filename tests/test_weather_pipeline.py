"""End-to-end tests of the weather pipeline on canned OpenWeatherMap
payloads (FIXTURES.md A4) — no network. Covers reference parity
(column names, conversions, rounding, aggregates) and the core
contract: double-run idempotency of the anti-join append."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.pipeline import weather as W


def _payload(city: str, country: str, lat: float, lon: float, start_epoch: int,
             n: int = 40, temp0: float = 290.0):
    return {
        "list": [
            {
                "dt": start_epoch + i * 3 * 3600,  # 3-hourly steps
                "main": {"temp": temp0 + (i % 7), "humidity": 40 + (i % 50)},
                "wind": {"speed": 1.5 + (i % 10)},
                "weather": [{"description": f"desc{i % 5}"}],
            }
            for i in range(n)
        ],
        "city": {"name": city, "country": country, "coord": {"lat": lat, "lon": lon}},
    }


# 2023-12-28 00:00:00 UTC — spans the ISO year boundary (week 52 → week 1)
YEAR_BOUNDARY_EPOCH = 1703721600


@pytest.fixture(scope="module")
def payloads():
    return [
        _payload("Houston", "US", 29.76, -95.37, YEAR_BOUNDARY_EPOCH),
        _payload("Berlin", "DE", 52.52, 13.40, YEAR_BOUNDARY_EPOCH, temp0=270.0),
    ]


@pytest.fixture(scope="module")
def fact(spark, payloads):
    raw = W.payloads_to_df(spark, payloads)
    return W.transform_weather(
        W.flatten_forecast(raw), job_ts=F.lit("2024-01-02 00:00:00").cast("timestamp")
    ).cache()


def test_flatten_shape_and_types(spark, payloads):
    flat = W.flatten_forecast(W.payloads_to_df(spark, payloads))
    assert flat.count() == 80  # 40 forecasts × 2 cities
    types = dict(flat.dtypes)
    assert types["weatherDate"] == "timestamp"
    assert types["Temperature"] == "double"
    assert types["Humidity"] == "int"
    first = flat.where(
        (F.col("city") == "Houston")
        & (F.col("weatherDate") == dt.datetime(2023, 12, 28, 0, 0))
    ).collect()
    assert len(first) == 1
    assert first[0]["WeatherDescription"] == "desc0"
    assert first[0]["country"] == "US"


def test_transform_matches_reference_semantics(fact):
    assert list(fact.columns) == list(W.FACT_COLUMNS)
    row = fact.where(
        (F.col("city") == "Houston")
        & (F.col("weatherDate") == dt.datetime(2023, 12, 28, 0, 0))
    ).collect()[0]
    # K→°C rounded 2dp (full:67,72): 290.0 - 273.15 = 16.85
    assert row["Temperature_in_Celsius"] == 16.85
    # m/s→km/h rounded 2dp (full:67-68,73): 1.5 * 3.6 = 5.4
    assert row["WindSpeed_km_per_hour"] == 5.4


def test_weekly_avg_temperature_iso_week_boundary(fact):
    out = W.calculate_avg_temperature(fact)
    weeks = {r["week"] for r in out.where(F.col("city") == "Houston").collect()}
    # 2023-12-28 is ISO week 52; 2024-01-01+ is ISO week 1
    assert weeks == {52, 1}
    hou52 = out.where((F.col("city") == "Houston") & (F.col("week") == 52)).collect()[0]
    # week 52 = Dec 25-31 → i in 0..31 (32 three-hourly rows from Dec 28):
    # avg(16.85 + i%7) = 16.85 + 90/32 = 19.6625 → 19.66
    assert hou52["average_temperature"] == pytest.approx(19.66, abs=0.005)
    assert set(out.columns) == {"country", "city", "week", "average_temperature"}


def test_avg_humidity_range_inclusive(fact):
    out = W.calculate_avg_humidity(fact, "2023-12-28", "2023-12-29")
    rows = {r["city"]: r for r in out.collect()}
    assert set(rows) == {"Houston", "Berlin"}
    # inclusive both ends: 16 rows of 3-hourly steps over the 2 days
    sub = fact.where(
        (F.to_date("weatherDate") >= "2023-12-28")
        & (F.to_date("weatherDate") <= "2023-12-29")
        & (F.col("city") == "Houston")
    )
    expected = round(
        sum(r["Humidity"] for r in sub.collect()) / sub.count(), 2
    )
    assert rows["Houston"]["average_humidity"] == pytest.approx(expected, abs=0.01)
    assert rows["Houston"]["start_date"] == dt.date(2023, 12, 28)


def test_append_is_idempotent(spark, fact, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("weather") / "weather_report_data")
    W.append_idempotent(fact, dest, spark)
    n1 = spark.read.parquet(dest).count()
    # Second run with the same batch: anti-join must keep everything out.
    W.append_idempotent(fact, dest, spark)
    n2 = spark.read.parquet(dest).count()
    assert n1 == fact.count()
    assert n2 == n1, "double-run appended duplicates — idempotency broken"
    # A genuinely new batch still lands.
    extra = W.transform_weather(
        W.flatten_forecast(
            W.payloads_to_df(
                spark,
                [_payload("Paris", "FR", 48.85, 2.35, YEAR_BOUNDARY_EPOCH, n=5)],
            )
        ),
        job_ts=F.lit("2024-01-02 01:00:00").cast("timestamp"),
    )
    W.append_idempotent(extra, dest, spark)
    assert spark.read.parquet(dest).count() == n1 + 5


def test_anti_join_no_destination_keys_survive(spark, fact):
    dest = fact.limit(30)
    out = W.rows_to_append(fact, dest)
    # property: appended keys ∩ destination keys = ∅
    inter = out.join(dest, on=W.DEDUP_KEYS, how="inner")
    assert inter.count() == 0
    assert out.count() == fact.count() - 30


def test_incremental_filter_trailing_window(spark, payloads):
    raw = W.flatten_forecast(W.payloads_to_df(spark, payloads))
    old = W.transform_weather(raw, job_ts=F.lit("2024-01-01 00:00:00").cast("timestamp"))
    new = W.transform_weather(raw, job_ts=F.lit("2024-01-01 10:30:00").cast("timestamp"))
    both = old.unionByName(new)
    kept = W.incremental_filter(
        both, hours=1, now=F.lit("2024-01-01 11:00:00").cast("timestamp")
    )
    assert kept.count() == new.count()
    assert kept.select(F.min("jobdate")).collect()[0][0] == dt.datetime(2024, 1, 1, 10, 30)


def test_flatten_survives_corrupt_payloads(spark, payloads):
    import json

    rows = [(json.dumps(payloads[0]),), ("{not valid json",), (None,),
            ('{"city": {"name": "X"}}',)]
    raw = spark.createDataFrame(rows, "payload string")
    out = W.flatten_forecast(raw)
    # corrupt/null/list-less payloads contribute zero rows (from_json →
    # NULL → explode drops), valid ones flatten fully — a bad document
    # never poisons the batch
    assert out.count() == 40
    assert out.where(F.col("city") == "Houston").count() == 40


def test_full_load_runs_end_to_end(spark, payloads, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("weather_e2e"))
    W.run_full_load(
        spark, payloads, dest, "2023-12-28", "2023-12-29",
        job_ts=F.lit("2024-01-02 00:00:00").cast("timestamp"),
    )
    assert spark.read.parquet(f"{dest}/weather_report_data").count() == 80
    assert spark.read.parquet(f"{dest}/weekly_avg_temp_report_data").count() == 4
    hum = spark.read.parquet(f"{dest}/weather_avg_humidity_report_data")
    assert hum.count() == 2
    # re-run: reports append (by design, audit-stamped), fact does not duplicate
    W.run_full_load(
        spark, payloads, dest, "2023-12-28", "2023-12-29",
        job_ts=F.lit("2024-01-02 02:00:00").cast("timestamp"),
    )
    assert spark.read.parquet(f"{dest}/weather_report_data").count() == 80


def test_fetch_forecasts_executor_fanout(spark, payloads):
    """S1 at scale: per-city fetch via mapInPandas with an injectable
    transport; failures isolate to their row instead of failing the job."""
    canned = {p["city"]["name"]: p for p in payloads}

    def transport(api_key, city):
        if city == "Atlantis":
            raise ConnectionError("no such city")
        return canned[city]

    cities = spark.createDataFrame(
        [("Houston",), ("Berlin",), ("Atlantis",)], "city string"
    ).repartition(3)
    fetched = W.fetch_forecasts(cities, transport).cache()
    ok = fetched.filter(F.col("fetch_error").isNull())
    bad = fetched.filter(F.col("fetch_error").isNotNull()).collect()
    assert ok.count() == 2
    assert len(bad) == 1 and bad[0]["city"] == "Atlantis"
    assert "ConnectionError" in bad[0]["fetch_error"]
    # The fetched frame feeds the standard flatten unchanged.
    flat = W.flatten_forecast(ok)
    assert flat.count() == sum(
        len(canned[r["city"]]["list"]) for r in ok.select("city").collect()
    )
    assert set(flat.select("city").distinct().toPandas()["city"]) == {
        "Houston",
        "Berlin",
    }
    fetched.unpersist()


def test_weatherapi_python_datasource_end_to_end(spark):
    """Spark 4 Python DataSource for the REST source (S1): one input
    partition per city, per-city failure isolation, and the resulting
    frame flows through the standard flatten → transform pipeline."""
    from weather_data_data_pipeline_spark.pipeline.weather import (
        flatten_forecast,
        transform_weather,
    )
    from weather_data_data_pipeline_spark.sources import weather_datasource as W

    W.register(spark)
    df = (
        spark.read.format("weatherapi")
        .option("cities", "Hyderabad, Houston ,Berlin")
        .option(
            "transport",
            "weather_data_data_pipeline_spark.sources.weather_datasource:canned_transport",
        )
        .load()
    )
    # fetch fan-out: the task layout is one partition per city
    assert df.rdd.getNumPartitions() == 3
    rows = {r["city"]: r for r in df.collect()}
    assert set(rows) == {"Hyderabad", "Houston", "Berlin"}
    assert all(r["fetch_error"] is None for r in rows.values())

    flat = flatten_forecast(df.where(F.col("payload").isNotNull()))
    fact = transform_weather(flat, job_ts=F.lit("2024-01-01 00:00:00").cast("timestamp"))
    assert fact.count() == 3 * 8  # 8 forecast entries per city
    got = {
        (r["city"], r["Temperature_in_Celsius"])
        for r in fact.where(F.col("weatherDate") == F.timestamp_seconds(F.lit(1700000000))).collect()
    }
    # K→°C conversion on the canned temps: 273.15 + h − 273.15 = h
    import json as _json

    for city in ("Hyderabad", "Houston", "Berlin"):
        h = sum(city.encode()) % 40
        assert (city, float(h)) in got


def test_weatherapi_datasource_isolates_failures(spark):
    from weather_data_data_pipeline_spark.sources import weather_datasource as W

    W.register(spark)
    df = (
        spark.read.format("weatherapi")
        .option("cities", "Good, __BOOM__")
        .option(
            "transport",
            "tests.failing_transport:transport",
        )
        .load()
    )
    rows = {r["city"]: r for r in df.collect()}
    assert rows["Good"]["fetch_error"] is None
    assert rows["__BOOM__"]["payload"] is None
    assert "RuntimeError" in rows["__BOOM__"]["fetch_error"]


def test_weatherapi_filter_pushdown_prunes_fetches(spark):
    """city = 'X' pushes into the source: only X's endpoint is fetched,
    visible as a single-partition scan (one partition per fetched city)."""
    from weather_data_data_pipeline_spark.sources import weather_datasource as W

    W.register(spark)
    df = (
        spark.read.format("weatherapi")
        .option("cities", "Hyderabad,Houston,Berlin")
        .option(
            "transport",
            "weather_data_data_pipeline_spark.sources.weather_datasource:canned_transport",
        )
        .load()
    )
    flt = df.where(F.col("city") == "Houston")
    assert [r["city"] for r in flt.collect()] == ["Houston"]
    assert flt.rdd.getNumPartitions() == 1


def test_weatherapi_stream_reader_polls(spark, tmp_path):
    from weather_data_data_pipeline_spark.sources import weather_datasource as W

    W.register(spark)
    stream = (
        spark.readStream.format("weatherapi")
        .option("cities", "Hyderabad,Houston")
        .option(
            "transport",
            "weather_data_data_pipeline_spark.sources.weather_datasource:canned_transport",
        )
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("weather_poll")
        .option("checkpointLocation", str(tmp_path / "ckpt_wx"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("weather_poll")
    assert sorted(r["city"] for r in got.collect()) == ["Houston", "Hyderabad"]
    assert got.where(F.col("payload").isNull()).count() == 0
