"""Catalog DDL (SURVEY.md §2.1 S6): the engine-side equivalent of the
reference's MySQL table creation (/root/reference/src/db_scripts/
weather_table_creation.py:23-58), executed against the Spark session
catalog as parquet tables.

Types are corrected per SURVEY §0: weatherDate is TIMESTAMP (the
reference declared DATE but wrote datetime strings — silent truncation).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

WEATHER_REPORT_DATA_DDL = """
CREATE TABLE IF NOT EXISTS {db}.weather_report_data (
  country STRING,
  city STRING,
  latitude DOUBLE,
  longitude DOUBLE,
  weatherDate TIMESTAMP,
  Temperature_in_Celsius DOUBLE,
  WindSpeed_km_per_hour DOUBLE,
  Humidity INT,
  WeatherDescription STRING,
  jobdate TIMESTAMP
) USING parquet
PARTITIONED BY (weather_day DATE)
"""

WEEKLY_AVG_TEMP_DDL = """
CREATE TABLE IF NOT EXISTS {db}.weekly_avg_temp_report_data (
  country STRING,
  city STRING,
  week INT,
  average_temperature DOUBLE,
  jobdate TIMESTAMP
) USING parquet
"""

AVG_HUMIDITY_DDL = """
CREATE TABLE IF NOT EXISTS {db}.weather_avg_humidity_report_data (
  country STRING,
  city STRING,
  average_humidity DOUBLE,
  start_date DATE,
  end_date DATE,
  jobdate TIMESTAMP
) USING parquet
"""


def create_weather_tables(spark: SparkSession, db: str = "weather_db") -> None:
    """EP3 (weather_table_creation.py:10-77) on the session catalog."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for ddl in (WEATHER_REPORT_DATA_DDL, WEEKLY_AVG_TEMP_DDL, AVG_HUMIDITY_DDL):
        spark.sql(ddl.format(db=db))


def drop_weather_tables(spark: SparkSession, db: str = "weather_db") -> None:
    for t in (
        "weather_report_data",
        "weekly_avg_temp_report_data",
        "weather_avg_humidity_report_data",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {db}.{t}")


def analyze_tables(
    spark: SparkSession, tables: list[str], columns: bool = True
) -> None:
    """Collect CBO statistics (row counts, sizes, per-column NDV/min/max)
    for catalog tables: ``ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL
    COLUMNS]``.

    With ``spark.sql.cbo.enabled`` (set by session.get_spark), these
    stats drive join reordering and build-side selection at plan time —
    the compile-time complement to AQE's runtime re-planning. At 100 TB
    stats are what keep an 8-table join from picking a pathological
    order before the first byte is read; refresh them after bulk loads
    or compaction.
    """
    for t in tables:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
        if columns:
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")


def table_stats(spark: SparkSession, table: str) -> dict:
    """Collected statistics for a table as a dict (rowCount/sizeInBytes
    when analyzed) — test/inspection hook for the CBO path."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    out = {}
    stats = info.get("Statistics", "")
    for part in stats.split(","):
        part = part.strip()
        if part.endswith("bytes"):
            out["sizeInBytes"] = int(part.split()[0])
        elif part.endswith("rows"):
            out["rowCount"] = int(part.split()[0])
    return out
