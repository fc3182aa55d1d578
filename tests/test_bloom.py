"""Bloom-filter runtime join pruning: completeness (no false negatives),
useful selectivity, and exact end-to-end join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from weather_data_data_pipeline_spark.functions.bloom import (
    bloom_prune,
    build_bloom,
    might_contain,
)
from weather_data_data_pipeline_spark.sources.tables import load


def test_no_false_negatives_and_low_fp_rate(spark):
    build = spark.range(0, 2000).select(F.col("id").alias("k"))
    words = build_bloom(build, "k")
    # every inserted key passes
    members = build.where(might_contain(words, F.col("k")))
    assert members.count() == 2000
    # disjoint foreign keys mostly rejected (m=2^17, n=2000, k=5 → fp ≪ 1%)
    foreign = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = foreign.where(might_contain(words, F.col("k"))).count()
    assert fp / 20_000 < 0.01, f"false-positive rate collapsed: {fp}/20000"


def test_pruned_join_equals_plain_join(spark):
    orders = load(spark, SF_DIR, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    lineitem = load(spark, SF_DIR, "lineitem")
    pruned = bloom_prune(lineitem, orders, "l_orderkey", "o_orderkey")
    exact = lineitem.join(
        orders.select("o_orderkey"), lineitem.l_orderkey == F.col("o_orderkey")
    )
    via_bloom = pruned.join(
        orders.select("o_orderkey"), pruned.l_orderkey == F.col("o_orderkey")
    )
    assert via_bloom.count() == exact.count()
    # and the filter actually prunes: fewer probe rows than the full table
    assert pruned.count() < lineitem.count()
