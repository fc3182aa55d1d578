from weather_data_data_pipeline_spark.sources.tables import TABLES, load, load_all

__all__ = ["TABLES", "load", "load_all"]
