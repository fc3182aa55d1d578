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
