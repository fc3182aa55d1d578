"""JDBC connector (SURVEY.md §2.1 S4/S5) — the reference's primary
storage, kept here as a secondary sink/source behind the parquet-first
design.

Fixes reproduced-intent defects from the reference (SURVEY §0): the
reference passed a bare ``SELECT *`` string as the ``table`` argument
(full:135,160), which Spark rejects — reads here take a table name or
wrap a query as a parenthesized aliased subquery.

No MySQL exists in this environment, but the connector is integration-
tested against a LIVE database: Apache Derby, whose embedded JDBC driver
ships inside the Spark distribution's own jars
(tests/test_jdbc_derby.py — write/read round-trip, subquery reads,
anti-join append idempotency, and filter pushdown into the external
engine, visible as PushedFilters in the scan). The read path gets
Catalyst's JDBC predicate pushdown (``pushDownPredicate`` defaults
true). At scale, use ``partition_column``/``num_partitions`` so the
read parallelizes instead of funneling through one connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str],
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a JDBC table (full:160-161, corrected). For parallel reads
    pass a numeric partition column + bounds; otherwise the scan is a
    single partition — fine for dims, wrong for facts."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def read_query(
    spark: SparkSession, url: str, query: str, properties: dict[str, str]
) -> DataFrame:
    """Read the result of a SQL query over JDBC — wraps it as the aliased
    subquery Spark requires (the reference's bare-string bug, full:135)."""
    return read_table(spark, url, f"({query}) AS q", properties)


def append(
    df: DataFrame, url: str, table: str, properties: dict[str, str]
) -> None:
    """Append sink (full:146-148,155-157,170-171)."""
    df.write.jdbc(url=url, table=table, mode="append", properties=properties)
