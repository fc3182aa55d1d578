"""Observation-based in-flight metrics (sources/observability.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.sources.observability import (
    audit_metrics,
    observed_append,
    with_observation,
)
from weather_data_data_pipeline_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_metrics_match_direct_aggregate(spark):
    ev = load(spark, SF_DIR, "events")
    observed, obs = with_observation(
        ev,
        "ev_audit",
        audit_metrics(null_cols=["value", "props"], ts_col="ts", value_col="value"),
    )
    n = observed.count()  # the action that materializes the observation
    got = dict(obs.get)
    want = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("nulls_value"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("nulls_props"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.sum("value").alias("sum_value"),
    ).collect()[0]
    assert got["n_rows"] == n == want["n_rows"]
    for k in ("nulls_value", "nulls_props", "min_ts", "max_ts"):
        assert got[k] == want[k]
    assert got["sum_value"] == want["sum_value"]


def test_observed_append_writes_and_reports(spark, tmp_path):
    ev = load(spark, SF_DIR, "events").limit(100)
    dest = str(tmp_path / "dest")
    got = observed_append(
        ev, dest, audit_metrics(null_cols=["value"], ts_col="ts")
    )
    assert got["n_rows"] == 100
    assert spark.read.parquet(dest).count() == 100
    # Second append observes only its own batch (per-action metrics).
    got2 = observed_append(
        ev.limit(40), dest, audit_metrics(null_cols=["value"], ts_col="ts")
    )
    assert got2["n_rows"] == 40
    assert spark.read.parquet(dest).count() == 140
