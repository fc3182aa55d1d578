"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over the engine's named-query registry
(``weather_data_data_pipeline_spark.registry``): every operator from
SURVEY.md §2 plus the LLM-pipeline extensions registers a (spark_fn,
oracle_sql) pair there; this module re-exports them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from weather_data_data_pipeline_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return registry.queries()["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator query; (spark, sf_dir) → DataFrame."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for every SQL-expressible query."""
    return registry.oracle_sql()
