"""Executor-importable transport that fails for one city — exercises the
weatherapi data source's per-city failure isolation."""

from weather_data_data_pipeline_spark.sources.weather_datasource import (
    canned_transport,
)


def transport(api_key: str, city: str) -> dict:
    if city == "__BOOM__":
        raise RuntimeError("endpoint down")
    return canned_transport(api_key, city)
