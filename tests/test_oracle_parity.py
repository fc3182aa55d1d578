"""Oracle-differential tests: every registered query with a DuckDB oracle
must match it at sf0.001 — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle
from weather_data_data_pipeline_spark import registry


def _oracle_cases():
    return sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, duck, name):
    fn = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(fn(spark, SF_DIR), duck, sql)


def _rows_only_cases():
    q = registry.queries()
    return sorted(set(q) - set(registry.oracle_sql()))


@pytest.mark.parametrize("name", _rows_only_cases())
def test_rows_only_query_runs_and_is_deterministic(spark, name):
    fn = registry.queries()[name]
    df1 = fn(spark, SF_DIR)
    rows1 = sorted(map(tuple, df1.collect()))
    rows2 = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert rows1 == rows2, f"{name} is nondeterministic across runs"
