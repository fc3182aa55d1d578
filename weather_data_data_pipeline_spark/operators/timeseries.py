"""Time-series operators the reference lacks but an engine needs:
as-of join, interval (range) join, sessionization.

The reference (`/root/reference/src/weather_report_pipeline/`) only ever
joins on exact keys (anti-join, full_load:163-167) and windows time with
a recency filter (inc_load:86-95). Real time-series workloads over the
same data model need point-in-time semantics. Each operator here is a
composition of built-in DataFrame ops — no UDFs, no per-key driver
loops — chosen for its shuffle shape at 100 TB:

- as-of join:   union + one window sort per key. NO range explosion and
                NO per-row binary search; cost = one shuffle+sort of
                (left ∪ right), the same as a sort-merge join.
- range join:   bucketize the time axis so the interval predicate
                becomes an equi-join on bucket id + a residual filter.
                Without this, Spark plans a broadcast-nested-loop join —
                quadratic, dead at scale.
- sessionize:   lag + cumulative-sum windows, one shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the most recent
    right row of the same key with ``right.ts <= left.ts`` (inclusive).

    Implementation: tag the sides, union, and run `last(..., ignorenulls)`
    over a window ordered by (ts, side) — right rows sort before left
    rows at equal timestamps so ties match. One shuffle+sort on the key,
    independent of how many right rows precede each left row; this is
    the merge-scan formulation of as-of, not a range join.

    ``right`` should hold at most one row per (keys, right_ts) — pre-
    aggregate if necessary — so the match is deterministic.
    Right columns surface under their own names; the matched right
    timestamp surfaces as ``matched_{right_ts}``.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    matched_ts = f"matched_{right_ts}"
    r = right.select(
        *keys,
        F.col(right_ts).alias(left_ts),
        F.col(right_ts).alias(matched_ts),
        *right_cols,
        F.lit(0).alias("_side"),
    )
    l = left.withColumn("_side", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(left_ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in [matched_ts, *right_cols]
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_m_{c}").alias(c) for c in [matched_ts, *right_cols]
    ]
    return filled.where(F.col("_side") == 1).select(*out_cols)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Join points to intervals containing them (``start <= ts < end``)
    via time-bucketing: both sides map to epoch//bucket_seconds bucket
    ids (intervals explode to every bucket they overlap), the join runs
    as a hash equi-join on bucket id, and the exact interval predicate
    filters the residue.

    Pick ``bucket_seconds`` near the typical interval length: each
    interval then lands in ~2 buckets and the candidate set stays linear.
    Catalyst alone would execute the inequality-only join as a
    broadcast-nested-loop — this rewrite is what makes range joins
    feasible at scale.
    """
    pb = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds)
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds),
            )
        ),
    )
    return (
        pb.join(ib, "_bucket")
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_bucket")
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the gap
    since the key's previous event exceeds ``gap_seconds``.

    lag → boundary flag → running sum, all on one window (single shuffle
    on the key). Emits the input rows plus ``session_seq`` (1-based per
    key). Aggregate downstream for session-level rollups.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Session-level rollup over :func:`sessionize`: start, end, event
    count and duration per (key, session)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds)
    return s.groupBy(*key_cols, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_s"),
    )


def resample_locf(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Regular-grid resampling with last-observation-carried-forward —
    the gap-fill operator every sensor/metrics pipeline needs (the
    reference's weather observations are exactly this shape: irregular
    fetch times → a regular reporting grid).

    Per key: a grid of timestamps from floor(min ts) to max ts at
    ``step_seconds``, each grid point carrying the latest observation at
    or before it. Physical shape, all relational:

    - grid generation: one per-key (min, max) aggregate, then
      ``sequence()`` + explode — executor-side, never a driver loop;
      grid size is bounded by span/step per key.
    - observation dedup: at most one row per (key, ts) via
      ``max_by(value, tiebreak)``; with no tiebreak column the
      ordering defaults to struct(ts, value), so equal-timestamp
      duplicates resolve to the max value deterministically.
    - the fill itself is :func:`asof_join`'s union + last-ignorenulls
      merge-scan — ONE shuffle on the key, cost independent of how many
      observations precede each grid point. A naive
      grid × observations range join would explode by observation
      count; this never does.

    Grid start is floored to the step boundary so grids are phase-
    aligned across keys (cross-key joins on grid_ts line up).
    """
    # Deterministic under equal-timestamp duplicates (ADVICE r3): with
    # no tiebreak column the ordering key is struct(ts, value) — ts ties
    # within the group, so the max VALUE wins reproducibly instead of
    # whichever row the scan happened to see last.
    tiebreak = (
        F.col(tiebreak_col)
        if tiebreak_col is not None
        else F.struct(F.col(ts_col), F.col(value_col))
    )
    obs = df.groupBy(*keys, F.col(ts_col).alias("_ots")).agg(
        F.max_by(value_col, tiebreak).alias(value_col)
    )
    spans = df.groupBy(*keys).agg(
        F.min(ts_col).alias("_min_ts"), F.max(ts_col).alias("_max_ts")
    )
    step = F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
    floor_start = F.timestamp_seconds(
        (F.unix_timestamp("_min_ts") / step_seconds).cast("long")
        * step_seconds
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(floor_start, F.col("_max_ts"), step)
        ).alias("grid_ts"),
    )
    filled = asof_join(
        grid,
        obs.select(*keys, F.col("_ots").alias("obs_ts"), value_col),
        keys=keys,
        left_ts="grid_ts",
        right_ts="obs_ts",
        right_cols=[value_col],
    )
    return filled


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Forward as-of join: for every left row, attach the EARLIEST right
    row of the same key with ``right.ts >= left.ts`` (inclusive) — the
    mirror of :func:`asof_join`, same merge-scan shape (union + one
    window over (ts DESC, side), one shuffle on the key, no range
    explosion). Ties at equal timestamps match, as in the backward
    form. Matched right timestamp surfaces as ``matched_{right_ts}``."""
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    matched_ts = f"matched_{right_ts}"
    r = right.select(
        *keys,
        F.col(right_ts).alias(left_ts),
        F.col(right_ts).alias(matched_ts),
        *right_cols,
        F.lit(0).alias("_side"),
    )
    l = left.withColumn("_side", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(left_ts).desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in [matched_ts, *right_cols]
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_m_{c}").alias(c) for c in [matched_ts, *right_cols]
    ]
    return filled.where(F.col("_side") == 1).select(*out_cols)


def resample_interpolate(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Regular-grid resampling with LINEAR interpolation between the
    bracketing observations — :func:`resample_locf`'s smooth sibling
    (sensor fusion, gap-free model features). Grid points outside the
    observed range on either side yield NULL (no extrapolation —
    fabricate data explicitly if you want it, never silently).

    Same scale shape as LOCF: per-key sequence grid, then TWO merge-
    scans (backward :func:`asof_join` + forward
    :func:`asof_join_forward`) — two key shuffles total, cost
    independent of observations-per-grid-point. The interpolation
    itself is a codegen'd arithmetic projection on microsecond epochs
    (exact: both engines compute the same doubles from the same
    integer micros)."""
    # Deterministic under equal-timestamp duplicates (ADVICE r3): with
    # no tiebreak column the ordering key is struct(ts, value) — ts ties
    # within the group, so the max VALUE wins reproducibly instead of
    # whichever row the scan happened to see last.
    tiebreak = (
        F.col(tiebreak_col)
        if tiebreak_col is not None
        else F.struct(F.col(ts_col), F.col(value_col))
    )
    obs = df.groupBy(*keys, F.col(ts_col).alias("_ots")).agg(
        F.max_by(value_col, tiebreak).alias(value_col)
    )
    spans = df.groupBy(*keys).agg(
        F.min(ts_col).alias("_min_ts"), F.max(ts_col).alias("_max_ts")
    )
    step = F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
    floor_start = F.timestamp_seconds(
        (F.unix_timestamp("_min_ts") / step_seconds).cast("long")
        * step_seconds
    )
    grid = spans.select(
        *keys,
        F.explode(F.sequence(floor_start, F.col("_max_ts"), step)).alias(
            "grid_ts"
        ),
    )
    prev = asof_join(
        grid,
        obs.select(
            *keys, F.col("_ots").alias("prev_ts"), F.col(value_col).alias("_pv")
        ),
        keys=keys,
        left_ts="grid_ts",
        right_ts="prev_ts",
        right_cols=["_pv"],
    )
    both = asof_join_forward(
        prev,
        obs.select(
            *keys, F.col("_ots").alias("next_ts"), F.col(value_col).alias("_nv")
        ),
        keys=keys,
        left_ts="grid_ts",
        right_ts="next_ts",
        right_cols=["_nv"],
    )
    g = F.unix_micros("grid_ts").cast("double")
    p = F.unix_micros("matched_prev_ts").cast("double")
    n = F.unix_micros("matched_next_ts").cast("double")
    interp = F.when(
        F.col("matched_prev_ts").isNull() | F.col("matched_next_ts").isNull(),
        F.lit(None).cast("double"),
    ).when(n == p, F.col("_pv").cast("double")).otherwise(
        F.col("_pv") + (F.col("_nv") - F.col("_pv")) * (g - p) / (n - p)
    )
    return both.select(
        *keys,
        "grid_ts",
        F.col("matched_prev_ts").alias("prev_ts"),
        F.col("matched_next_ts").alias("next_ts"),
        interp.alias("value_interp"),
    )
