"""Aggregation operators (SURVEY.md §2.4, A1–A2) + exact-sum helpers.

Spark's HashAggregateExec already does partial (map-side) + final
aggregation — groupBy here costs one shuffle of the *partially aggregated*
rows, which is the right shape at 100 TB.

``dsum`` exists because floating-point sums are order-dependent: on a
cluster the partial-aggregation order differs run to run, so a correctness
oracle can never hash-match a raw double sum at scale. Summing in
DECIMAL is associative and exact, then we surface a rounded double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, out_scale: int = 2) -> Column:
    """Order-independent exact sum of a money-like double column.

    Cast each value to DECIMAL(18,scale) (exact, associative sum), round,
    surface as double.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(f"decimal(18,{scale})")), out_scale).cast("double")


def davg(col: Column | str, scale: int = 2, out_scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum / exact count, in
    double, rounded. Identical bit pattern on any engine that sums the
    same decimals."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c), out_scale
    )


def weekly_avg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    out_col: str = "average_value",
) -> DataFrame:
    """A1 (ref full_load:86-94): group by natural keys + ISO-week
    expression key, average a measure, round to 2 dp."""
    return df.groupBy(
        *keys, F.weekofyear(ts_col).alias("week")
    ).agg(F.round(F.avg(value_col), 2).alias(out_col))


def range_avg(
    df: DataFrame,
    keys: list[str],
    predicate: Column,
    value_col: str,
    out_col: str = "average_value",
) -> DataFrame:
    """A2 (ref full_load:97-106): filter-before-aggregate average.

    The filter sits below the aggregate so Catalyst pushes it to the scan
    (partition pruning on a date-partitioned layout).
    """
    return df.where(predicate).groupBy(*keys).agg(
        F.round(F.avg(value_col), 2).alias(out_col)
    )


# --- shared OHLC candle fragment (r10, VERDICT r9 ask #5) -------------
# One definition of the candle math, compiled by BOTH the batch
# ``events_ohlc_15min`` query and the streaming ``ohlc_candle_sink`` so
# the two paths cannot drift. The partial state (struct-argmin/argmax
# open/close carriers, exact decimal volume sum) is ASSOCIATIVE, so
# merging per-micro-batch partials equals the one-pass batch aggregate
# bit-for-bit — the property the stream==batch equality test pins.


def ohlc_bucket(ts: Column | str = "ts", interval_sec: int = 900) -> Column:
    """Time bucket = floor(epoch/interval)*interval as a timestamp —
    works for ANY interval, unlike date_trunc's fixed units."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(
        (c.cast("long") / int(interval_sec)).cast("long") * int(interval_sec)
    )


def ohlc_raw_aggs(
    value: str = "value", ts: str = "ts", id_col: str = "event_id"
) -> list[Column]:
    """Aggregate expressions raw rows → one PARTIAL candle per group:
    open/close ride as (ts, id, value) structs (deterministic under
    same-timestamp ties via the unique id), high/low plain min/max,
    volume as an exact decimal sum. Surfacing happens in
    :func:`ohlc_surface`; keep the state mergeable until then."""
    s = F.struct(F.col(ts), F.col(id_col), F.col(value))
    return [
        F.count("*").cast("bigint").alias("n_events"),
        F.min(s).alias("open_s"),
        F.max(F.col(value)).alias("high"),
        F.min(F.col(value)).alias("low"),
        F.max(s).alias("close_s"),
        F.sum(F.col(value).cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("sum_v"),
    ]


def ohlc_merge_aggs() -> list[Column]:
    """Merge PARTIAL candles (the output of :func:`ohlc_raw_aggs`) into
    combined candle state — every expression is the associative
    combiner of its raw counterpart."""
    return [
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.min("open_s").alias("open_s"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max("close_s").alias("close_s"),
        F.sum("sum_v").cast("decimal(38,2)").alias("sum_v"),
    ]


def ohlc_surface(df: DataFrame, value: str = "value") -> DataFrame:
    """Final candle columns from (merged) candle state: open/close are
    the struct carriers' value field (raw stored doubles — zero
    arithmetic), the volume sum rounds in the decimal domain and
    surfaces DOUBLE (engine-proof)."""
    keys = [c for c in df.columns if c not in
            {"n_events", "open_s", "high", "low", "close_s", "sum_v"}]
    return df.select(
        *keys,
        "n_events",
        F.col("open_s")[value].alias("open"),
        "high",
        "low",
        F.col("close_s")[value].alias("close"),
        F.round(F.col("sum_v"), 2).cast("double").alias("sum_value"),
    )
