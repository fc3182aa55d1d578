"""Edge-case unit tests for the time-series operators (tiny frames):
as-of tie/no-match semantics, range-join boundary inclusivity,
session gap boundaries."""

from __future__ import annotations

import datetime as dt

from weather_data_data_pipeline_spark.operators.timeseries import (
    asof_join,
    range_join_bucketed,
    session_stats,
    sessionize,
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_matches_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(30)), (2, _ts(5))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 200.0)],
        "k long, ts timestamp, v double",
    )
    got = {
        (r["k"], r["ts"]): (r["matched_ts"], r["v"])
        for r in asof_join(left, right, ["k"], right_cols=["v"]).collect()
    }
    # tie: right at exactly left.ts matches (inclusive)
    assert got[(1, _ts(10))] == (_ts(10), 100.0)
    # later left picks the latest preceding right, not the first
    assert got[(1, _ts(30))] == (_ts(20), 200.0)
    # no right row for the key → left row kept with nulls
    assert got[(2, _ts(5))] == (None, None)


def test_asof_no_future_match(spark):
    left = spark.createDataFrame([(1, _ts(1))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(2), 9.0)], "k long, ts timestamp, v double"
    )
    rows = asof_join(left, right, ["k"], right_cols=["v"]).collect()
    assert rows[0]["v"] is None, "matched a right row from the future"


def test_range_join_boundaries_half_open(spark):
    points = spark.createDataFrame(
        [(_ts(10),), (_ts(15),), (_ts(20),), (_ts(9, 59),)], "ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("i1", _ts(10), _ts(20))], "iid string, start_ts timestamp, end_ts timestamp"
    )
    got = sorted(
        r["ts"]
        for r in range_join_bucketed(
            points, intervals, "ts", "start_ts", "end_ts", bucket_seconds=300
        ).collect()
    )
    # start inclusive, end exclusive; 09:59 outside
    assert got == [_ts(10), _ts(15)]


def test_range_join_interval_spanning_many_buckets(spark):
    # interval 10× the bucket width must still catch a point mid-way
    points = spark.createDataFrame([(_ts(25),)], "ts timestamp")
    intervals = spark.createDataFrame(
        [("i1", _ts(0), _ts(50))], "iid string, start_ts timestamp, end_ts timestamp"
    )
    got = range_join_bucketed(
        points, intervals, "ts", "start_ts", "end_ts", bucket_seconds=300
    ).collect()
    assert len(got) == 1


def test_sessionize_gap_boundary(spark):
    # gaps: 1800s exactly (same session) and 1801s (new session)
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, dt.datetime(2024, 1, 1, 0, 30)),
         (1, dt.datetime(2024, 1, 1, 1, 0, 1))],
        "user_id long, ts timestamp",
    )
    seqs = [
        r["session_seq"]
        for r in sessionize(df, ["user_id"], "ts", 1800)
        .orderBy("ts")
        .collect()
    ]
    assert seqs == [1, 1, 2]


def test_session_stats_rollup(spark):
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, dt.datetime(2024, 1, 1, 2, 0))],
        "user_id long, ts timestamp",
    )
    rows = {
        r["session_seq"]: (r["n_events"], r["duration_s"])
        for r in session_stats(df, ["user_id"], "ts", 1800).collect()
    }
    assert rows == {1: (2, 600), 2: (1, 0)}


def test_asof_join_forward_ties_and_boundaries(spark):
    """Forward as-of: earliest right row with ts >= left ts; ties at the
    exact timestamp match; left rows after the last observation get
    NULLs (left semantics)."""
    from pyspark.sql import functions as F

    from weather_data_data_pipeline_spark.operators.timeseries import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, 5), (1, 7), (1, 100)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 3, "a"), (1, 7, "b"), (1, 12, "c")], "k long, ts long, v string"
    )
    out = {
        r["ts"]: (r["matched_ts"], r["v"])
        for r in asof_join_forward(left, right, ["k"]).collect()
    }
    assert out[5] == (7, "b")      # nearest following
    assert out[7] == (7, "b")      # tie at equal ts matches
    assert out[100] == (None, None)  # nothing follows → NULL


def test_resample_deterministic_under_equal_ts_duplicates(spark):
    """ADVICE r3: with tiebreak_col=None, duplicate (key, ts) rows must
    resolve deterministically — the max VALUE wins (struct(ts, value)
    ordering), not whichever row the scan saw last."""

    from pyspark.sql import functions as F

    from weather_data_data_pipeline_spark.operators.timeseries import (
        resample_interpolate,
        resample_locf,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("k", t0, 5.0),
        ("k", t0, 9.0),  # same key, same ts, different value
        ("k", t0, 1.0),
        ("k", t0 + dt.timedelta(seconds=60), 2.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    for fn, vcol in (
        (resample_locf, "value"),
        (resample_interpolate, "value_interp"),
    ):
        outs = [
            sorted(
                (r["grid_ts"], r[vcol])
                for r in fn(
                    df.orderBy(F.rand(seed)), ["key"], "ts", "value", 30
                ).collect()
            )
            for seed in (1, 2, 3)
        ]
        assert outs[0] == outs[1] == outs[2]
        # the t0 grid point carries the max duplicate value, 9.0
        assert outs[0][0] == (t0, 9.0)


def test_ohlc_open_close_deterministic_under_ts_ties(spark, tmp_path):
    """events_ohlc_15min's open/close come from struct argmin/argmax
    over (ts, event_id, value): with several rows on the SAME timestamp
    the unique event_id breaks the tie, so the candle is deterministic
    under any partitioning — pinned here on a crafted frame where the
    tie actually occurs, plus a cross-bucket boundary row."""
    from weather_data_data_pipeline_spark.plans.timeseries_queries import (
        events_ohlc_15min,
    )

    rows = [
        # bucket 00:00–00:15, all 'click': two rows share the opening
        # timestamp (ids 2 < 5) and two share the closing one (7 < 9)
        (2, "2024-01-01 00:00:01", 1, "click", 10.0, "{}"),
        (5, "2024-01-01 00:00:01", 2, "click", 99.0, "{}"),
        (3, "2024-01-01 00:07:00", 3, "click", 55.0, "{}"),
        (7, "2024-01-01 00:14:59", 4, "click", 20.0, "{}"),
        (9, "2024-01-01 00:14:59", 5, "click", 1.0, "{}"),
        # next bucket starts exactly on the boundary
        (11, "2024-01-01 00:15:00", 6, "click", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    )
    src = str(tmp_path / "ohlc")
    df.write.parquet(f"{src}/events.parquet")
    got = {
        str(r["bucket_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in events_ohlc_15min(spark, src).collect()
    }
    assert got["2024-01-01 00:00:00"] == (10.0, 99.0, 1.0, 1.0, 5)
    assert got["2024-01-01 00:15:00"] == (7.0, 7.0, 7.0, 7.0, 1)
