"""Parquet table sources for the driver's synthetic star schema.

Primary scan path of the engine (SURVEY.md §2.1 S4): ``spark.read.parquet``
so Catalyst gets predicate pushdown, column pruning, and (on partitioned
layouts) partition pruning for free. At 100 TB these tables would be
date/key-partitioned parquet; the loaders keep that contract by never
collecting to the driver and never inferring schemas row-by-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.session import apply_runtime_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the events nanos timestamp.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark only
    reads via ``nanosAsLong``; we convert to microsecond TimestampType
    (DuckDB's comparison precision) with integral division so no precision
    is lost crossing int64 → timestamp.
    """
    apply_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all tables as temp views so every query is runnable via
    ``spark.sql`` too (engine requirement: SQL-or-DataFrame parity)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
