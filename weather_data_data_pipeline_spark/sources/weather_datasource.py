"""``spark.read.format("weatherapi")`` — a Spark 4 Python DataSource for
the OpenWeatherMap forecast endpoint (SURVEY §2.1 S1; ref
weather_report_data_full_load_pipeline.py:8-12).

The reference fetches ONE city on the driver with requests + a Python
loop. This is the engine-native version: a registered data source whose
reader plans ONE INPUT PARTITION PER CITY, so a fleet of cities fetches
executor-parallel with per-row failure isolation, and the result is a
first-class DataFrame (``city, payload, fetch_error``) that flows into
the same flatten → transform → report pipeline
(``pipeline/weather.py``). Filter pushdown, column pruning etc. apply
above it like any source.

Options:
- ``cities``: comma-separated city names (required).
- ``apiKey``: forwarded to the transport.
- ``transport``: dotted ``module:function`` path resolved ON THE
  EXECUTOR — ``(api_key, city) -> dict``. Defaults to the stdlib
  urllib fetcher; tests inject :func:`canned_transport`. A dotted path
  (not a callable) because DataSource options are strings and the
  reader is pickled to executors.

Streaming twin: :class:`WeatherForecastStreamReader` (a
``SimpleDataSourceStreamReader``) polls the same endpoint per
micro-batch with a monotonically increasing poll-count offset, so
``spark.readStream.format("weatherapi")`` works alongside the batch
reader (exercised in tests/test_streaming.py).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)

API_URL = "https://api.openweathermap.org/data/2.5/forecast"


def default_transport(api_key: str, city: str) -> dict:
    """Stdlib HTTP fetcher (no extra dependency): GET forecast JSON."""
    import urllib.parse
    import urllib.request

    url = f"{API_URL}?q={urllib.parse.quote(city)}&appid={api_key}"
    with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


def canned_transport(api_key: str, city: str) -> dict:
    """Deterministic offline payload in the OpenWeatherMap shape — the
    injectable test/demo transport (network-free)."""
    h = sum(city.encode()) % 40
    return {
        "city": {
            "name": city,
            "country": "XX",
            "coord": {"lat": float(h), "lon": float(-h)},
        },
        "list": [
            {
                "dt": 1700000000 + i * 10800,
                "main": {"temp": 273.15 + h + i, "humidity": 40 + (h + i) % 50},
                "wind": {"speed": float(i % 9)},
                "weather": [{"description": f"sky-{i % 3}"}],
            }
            for i in range(8)
        ],
    }


def _resolve_transport(path: str):
    import importlib

    mod, _, fn = path.partition(":")
    return getattr(importlib.import_module(mod), fn)


class _CityPartition(InputPartition):
    def __init__(self, city: str):
        self.city = city


class WeatherForecastReader(DataSourceReader):
    def __init__(self, options: dict):
        cities = options.get("cities", "")
        self._cities: Sequence[str] = [
            c.strip() for c in cities.split(",") if c.strip()
        ]
        if not self._cities:
            raise ValueError("weatherapi: the 'cities' option is required")
        self._api_key = options.get("apiKey", "")
        self._transport_path = options.get(
            "transport",
            "weather_data_data_pipeline_spark.sources.weather_datasource:default_transport",
        )

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Source-level predicate pushdown: a ``city = 'X'`` or
        ``city IN (...)`` predicate restricts which cities are FETCHED —
        the API-call analog of partition pruning (don't hit endpoints
        whose rows the query would discard). Other filters are returned
        for Spark to apply above the scan."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("city",):
                self._cities = [c for c in self._cities if c == f.value]
            elif isinstance(f, In) and f.attribute == ("city",):
                wanted = set(f.values)
                self._cities = [c for c in self._cities if c in wanted]
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per city → the fetch fan-out IS the task layout
        return [_CityPartition(c) for c in self._cities]

    def read(self, partition: _CityPartition) -> Iterator[tuple]:
        transport = _resolve_transport(self._transport_path)
        city = partition.city
        try:
            yield (city, json.dumps(transport(self._api_key, city)), None)
        except Exception as exc:  # noqa: BLE001 — per-city isolation
            yield (city, None, f"{type(exc).__name__}: {exc}")


class WeatherForecastStreamReader(SimpleDataSourceStreamReader):
    """Poll-per-micro-batch streaming twin: each trigger fetches every
    configured city once; the offset is a monotone poll counter. With a
    deterministic transport recovery replays exactly; with live HTTP a
    replayed batch re-fetches (at-least-once payload semantics — pair
    with the anti-join/near-dedup sinks for idempotent delivery, which
    is the engine's standard pattern anyway)."""

    def __init__(self, options: dict):
        self._batch = WeatherForecastReader(options)

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _fetch_all(self):
        for p in self._batch.partitions():
            yield from self._batch.read(p)

    def read(self, start: dict):
        return iter(list(self._fetch_all())), {"poll": start["poll"] + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._fetch_all()))


class WeatherForecastDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weatherapi"

    def schema(self) -> str:
        return "city string, payload string, fetch_error string"

    def reader(self, schema) -> WeatherForecastReader:
        return WeatherForecastReader(self.options)

    def simpleStreamReader(self, schema) -> WeatherForecastStreamReader:
        return WeatherForecastStreamReader(self.options)


def register(spark) -> None:
    """Register the source on a session: then
    ``spark.read.format('weatherapi').option('cities', 'Hyderabad,…')``."""
    spark.dataSource.register(WeatherForecastDataSource)
