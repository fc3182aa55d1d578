"""SQL-surface tests: the engine's operators are plain Catalyst plans, so
each must be expressible through spark.sql over registered views and
produce identical results to the DataFrame-API form. (The DuckDB oracle
checks cross-engine SQL; this checks OUR SQL surface.)"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from weather_data_data_pipeline_spark import registry
from weather_data_data_pipeline_spark.sources.tables import TABLES, load


@pytest.fixture(scope="module")
def views(spark):
    for t in TABLES:
        load(spark, SF_DIR, t).createOrReplaceTempView(t)
    return spark


# DataFrame-API query name → equivalent Spark SQL. The oracle strings are
# DuckDB-dialect; these are Spark-dialect twins of representative shapes
# (aggregate, window, anti-join, sessionization-style windows, HOFs).
SQL_TWINS = {
    "weekly_avg_value": """
        SELECT event_type, weekofyear(ts) AS week,
               round(avg(value), 2) AS average_value
        FROM events GROUP BY event_type, weekofyear(ts)
    """,
    "dedup_exact": """
        SELECT sha2(text, 256) AS digest,
               min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY sha2(text, 256)
    """,
    "q13_customer_order_distribution": """
        WITH per_cust AS (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
        SELECT c_count, count(*) AS custdist
        FROM per_cust GROUP BY c_count
    """,
    "user_sessions": """
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR unix_timestamp(ts) - unix_timestamp(lag(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        numbered AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM flagged)
        SELECT user_id, session_seq, min(ts) AS session_start,
               max(ts) AS session_end, count(*) AS n_events,
               unix_timestamp(max(ts)) - unix_timestamp(min(ts)) AS duration_s
        FROM numbered GROUP BY user_id, session_seq
    """,
}


@pytest.mark.parametrize("name", sorted(SQL_TWINS))
def test_sql_twin_matches_dataframe_api(views, name):
    spark = views
    df_api = registry.queries()[name](spark, SF_DIR)
    df_sql = spark.sql(SQL_TWINS[name])
    cols = sorted(df_api.columns)
    assert sorted(df_sql.columns) == cols
    rows_api = sorted(tuple(r[c] for c in cols) for r in df_api.collect())
    rows_sql = sorted(tuple(r[c] for c in cols) for r in df_sql.collect())
    assert rows_api == rows_sql
