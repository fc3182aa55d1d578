"""Named-query registry: the engine's public query surface.

Every operator from SURVEY.md §2 (and every north-star extension) registers
here as a (spark_fn, oracle_sql) pair. ``__spark_entry__.py`` re-exports
this for the correctness driver; tests iterate it for local oracle parity.

Contract (driver): each spark_fn takes (spark, sf_dir) and returns a
DataFrame whose column NAMES match the oracle SQL's output columns —
the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL twin for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "weather_data_data_pipeline_spark.plans.reference_queries",
    "weather_data_data_pipeline_spark.plans.relational_queries",
    "weather_data_data_pipeline_spark.plans.tpch_remaining",
    "weather_data_data_pipeline_spark.plans.llm_queries",
    "weather_data_data_pipeline_spark.plans.corpus_queries",
    "weather_data_data_pipeline_spark.plans.maintenance_queries",
    "weather_data_data_pipeline_spark.plans.timeseries_queries",
    "weather_data_data_pipeline_spark.plans.weather_queries",
)

_loaded = False


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in _REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}


def query_names() -> list[str]:
    _ensure_loaded()
    return list(_REGISTRY)


def get_query(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]
