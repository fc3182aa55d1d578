"""Units for MERGE upsert, SCD Type 2, and referential-integrity checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.operators.merge import (
    merge_upsert,
    orphan_count,
    scd2_snapshot,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_upsert_update_insert_passthrough(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    source = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], ["k", "s", "v"]
    )
    got = _rows(merge_upsert(target, source, ["k"]).select("k", "s", "v"))
    assert got == [(1, "a", 10.0), (2, "b2", 99.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_merge_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    source = spark.createDataFrame([(2, 99.0), (3, 30.0)], ["k", "v"])
    once = merge_upsert(target, source, ["k"])
    twice = merge_upsert(once, source, ["k"])
    assert _rows(once.select("k", "v")) == _rows(twice.select("k", "v"))


def test_scd2_versions_and_intervals(spark):
    changes = spark.createDataFrame(
        [(7, 100, "x"), (7, 200, "y"), (7, 300, "z"), (8, 150, "only")],
        ["k", "ts", "attr"],
    )
    got = {
        (r.k, r.version): (r.valid_from, r.valid_to, r.is_current, r.attr)
        for r in scd2_snapshot(changes, ["k"], "ts").collect()
    }
    assert got[(7, 1)] == (100, 200, False, "x")
    assert got[(7, 2)] == (200, 300, False, "y")
    assert got[(7, 3)] == (300, None, True, "z")
    assert got[(8, 1)] == (150, None, True, "only")
    # intervals tile: each valid_to equals the next valid_from per key
    assert len(got) == 4


def test_orphan_count_null_fk_exempt(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], ["id", "fk"]
    )
    parent = spark.createDataFrame([(10,)], ["pk"])
    n = orphan_count(child, parent, "fk", "pk").collect()[0].n_violations
    assert n == 1  # fk=99 orphaned; fk=NULL exempt


def test_table_diff_statuses_and_null_safety(spark):
    from weather_data_data_pipeline_spark.operators.merge import table_diff

    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, None, 3.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    right = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 0.0), (3, "", 3.0), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["diff_status"] for r in table_diff(left, right, ["k"]).collect()}
    # k=1 identical → absent; NULL vs 0.0 and NULL vs '' must read changed.
    assert got == {2: "changed", 3: "changed", 4: "only_left", 5: "only_right"}


def test_table_diff_identical_tables_is_empty(spark):
    from tests.conftest import SF_DIR
    from weather_data_data_pipeline_spark.operators.merge import table_diff
    from weather_data_data_pipeline_spark.sources.tables import load

    orders = load(spark, SF_DIR, "orders")
    assert table_diff(orders, orders, ["o_orderkey"]).count() == 0


def test_table_diff_null_position_shift_detected(spark):
    """(NULL,'x') vs ('x',NULL): Spark hash exprs skip NULL fields, so a
    naive struct hash collides on value shifts across a NULL. The
    null-flag-perturbed hash must report these keys as changed."""
    from weather_data_data_pipeline_spark.operators.merge import table_diff

    left = spark.createDataFrame(
        [(1, None, "x"), (2, "y", None)], "k long, a string, b string"
    )
    right = spark.createDataFrame(
        [(1, "x", None), (2, None, "y")], "k long, a string, b string"
    )
    got = {r["k"]: r["diff_status"] for r in table_diff(left, right, ["k"]).collect()}
    assert got == {1: "changed", 2: "changed"}
