"""Regression tests for typed oracle comparison (VERDICT r3 ask #2).

Round 3 shipped one red driver row (`audio_dedup_fingerprint`) whose values
were correct but whose oracle returned DuckDB HUGEINT (sum(BIGINT) widens)
where Spark returned long — the driver hashes TYPED values, and the local
mirror's ``fetchall()`` coerced both to Python int, so it said green. These
tests pin the Arrow-level comparison that closes the escape hatch.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from tests.conftest import SF_DIR

from weather_data_data_pipeline_spark.oracle_types import (
    canon_arrow,
    canon_spark,
    type_mismatches,
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _arrow_schema(con, sql):
    return con.execute(sql).arrow().schema


def test_hugeint_vs_long_is_a_mismatch(con):
    """The exact bug class that shipped r3's red row: DuckDB sum(BIGINT)
    widens to HUGEINT → arrow decimal128(38,0); Spark returns long. The
    typed comparison must flag it even though every value is equal."""
    schema = _arrow_schema(
        con, "SELECT sum(CAST(x AS BIGINT)) AS s FROM (VALUES (1), (2)) t(x)"
    )
    spark_schema = T.StructType([T.StructField("s", T.LongType())])
    mis = type_mismatches(spark_schema, schema, ["s"])
    assert mis and "decimal(38,0)" in mis[0] and "int" in mis[0]


def test_cast_to_bigint_fixes_it(con):
    schema = _arrow_schema(
        con,
        "SELECT CAST(sum(CAST(x AS BIGINT)) AS BIGINT) AS s"
        " FROM (VALUES (1), (2)) t(x)",
    )
    spark_schema = T.StructType([T.StructField("s", T.LongType())])
    assert type_mismatches(spark_schema, schema, ["s"]) == []


def test_audio_dedup_oracle_no_longer_widens(con):
    """End-to-end pin on the fixed query: the registered oracle's Arrow
    schema must canon-match the Spark query's schema (s0..s3 int, not
    decimal). Runs the oracle against a 10-row stand-in documents view —
    only the SCHEMA matters here; value parity is test_oracle_parity's job."""
    from weather_data_data_pipeline_spark import registry

    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        "SELECT CAST(range AS BIGINT) AS doc_id, 'x' AS text,"
        " 'en' AS lang, 'web' AS source FROM range(10)"
    )
    sql = registry.oracle_sql()["audio_dedup_fingerprint"]
    schema = _arrow_schema(con, sql)
    for c in ("s0", "s1", "s2", "s3", "n_copies", "rep_doc_id"):
        assert canon_arrow(schema.field(c).type) == "int", (
            c,
            schema.field(c).type,
        )


def test_widths_collapse_but_families_do_not(con):
    """int32 vs int64 and string vs large_string are driver-invisible
    (both flatten to the same Python objects) — they must NOT flag;
    decimal vs int and float vs int MUST."""
    schema = _arrow_schema(
        con,
        "SELECT CAST(1 AS INTEGER) AS i, 'a' AS s,"
        " CAST(1.5 AS DOUBLE) AS f, [1, 2] AS arr",
    )
    spark_schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("f", T.FloatType()),
            T.StructField("arr", T.ArrayType(T.IntegerType())),
        ]
    )
    assert type_mismatches(spark_schema, schema, ["i", "s", "f", "arr"]) == []
    wrong = T.StructType(
        [
            T.StructField("i", T.DoubleType()),
            T.StructField("arr", T.ArrayType(T.DoubleType())),
        ]
    )
    mis = type_mismatches(wrong, schema, ["i", "arr"])
    assert len(mis) == 2


def test_nested_decimal_flagged(con):
    schema = _arrow_schema(
        con, "SELECT [sum(CAST(x AS BIGINT))] AS arr FROM (VALUES (1)) t(x)"
    )
    spark_schema = T.StructType(
        [T.StructField("arr", T.ArrayType(T.LongType()))]
    )
    mis = type_mismatches(spark_schema, schema, ["arr"])
    assert mis and "decimal" in mis[0]


def test_canon_spark_families():
    assert canon_spark(T.ShortType()) == canon_spark(T.LongType()) == "int"
    assert canon_spark(T.FloatType()) == canon_spark(T.DoubleType()) == "float"
    assert canon_spark(T.DecimalType(38, 0)) == "decimal(38,0)"
    assert canon_spark(T.TimestampType()) == "timestamp"
    assert (
        canon_spark(T.ArrayType(T.StructType([T.StructField("a", T.IntegerType())])))
        == "list<struct<a:int>>"
    )


def test_no_registered_query_surfaces_decimal(spark, monkeypatch):
    """The r9 surface-type lint (VERDICT r8 ask #2): DECIMAL is an
    internal exactness device only — no registered query (oracle-bearing
    OR rows-only) may surface a decimal-typed column, directly or nested.
    Across the r7-r8 driver gates 14/15 decimal-surfaced rows were
    hash-red (vs 0/35 double-surfaced) while bit-exact under the local
    bit-strict mirror at two SFs, so the decimal SURFACE itself is the
    gate hazard; small-mantissa decimal→double casts are measured
    bit-identical between engines, so pin → round → CAST AS DOUBLE last
    preserves the exactness contract. Plan-build only, no execution of
    the final action (some plans run bounded seed jobs during build)."""
    from pyspark.sql import DataFrame

    from weather_data_data_pipeline_spark import registry
    from weather_data_data_pipeline_spark.oracle_types import (
        decimal_surfaced_cols,
    )

    # This is a SCHEMA lint: demote eager localCheckpoints to LAZY so
    # plan building keeps its lineage truncation (an identity patch was
    # measured worse — deep composed builders rely on the truncation to
    # keep analysis cheap) while every index/signature materialization
    # JOB is skipped — the lint never executes anything. Schema is
    # identical either way.
    _orig_ckpt = DataFrame.localCheckpoint
    monkeypatch.setattr(
        DataFrame,
        "localCheckpoint",
        lambda self, eager=True: _orig_ckpt(self, eager=False),
    )

    sf_dir = SF_DIR
    offenders = {}
    for name, fn in registry.queries().items():
        cols = decimal_surfaced_cols(fn(spark, sf_dir).schema)
        if cols:
            offenders[name] = cols
    assert not offenders, (
        "decimal-typed SURFACE columns (gate-red class; cast the final "
        f"rounded decimal to DOUBLE on both sides): {offenders}"
    )
