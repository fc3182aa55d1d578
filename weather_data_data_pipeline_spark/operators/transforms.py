"""Scalar/projection operators (SURVEY.md §2.2, P1–P12).

All pure Column expressions — they stay inside whole-stage codegen and
constant-fold under Catalyst; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KELVIN_OFFSET = 273.15
MS_TO_KMH = 3.6


def kelvin_to_celsius(col: Column | str) -> Column:
    """P1 (ref full_load:67): unit conversion K→°C."""
    return F.col(col) - F.lit(KELVIN_OFFSET) if isinstance(col, str) else col - F.lit(KELVIN_OFFSET)


def ms_to_kmh(col: Column | str) -> Column:
    """P2 (ref full_load:67-68): unit conversion m/s→km/h."""
    c = F.col(col) if isinstance(col, str) else col
    return c * F.lit(MS_TO_KMH)


def round2(col: Column | str) -> Column:
    """P4 (ref full_load:72-73): round to 2 decimal places (half-up)."""
    return F.round(col, 2)


def with_audit_timestamp(df: DataFrame, col_name: str = "jobdate") -> DataFrame:
    """P3 (ref full_load:69): audit column = job submission time."""
    return df.withColumn(col_name, F.current_timestamp())


def epoch_to_timestamp(col: Column | str) -> Column:
    """P12 (ref full_load:25-26): epoch seconds → typed timestamp.

    The reference does this on the driver with ``datetime.utcfromtimestamp``
    + strftime into a *string*; we keep it executor-side and typed.
    """
    return F.timestamp_seconds(F.col(col) if isinstance(col, str) else col)


def format_timestamp(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """String rendering of a timestamp (the reference's storage format)."""
    return F.date_format(col, fmt)


def date_between(col: Column | str, start: str, end: str) -> Column:
    """P7 (ref full_load:101): inclusive date-range predicate.

    The reference compares strings lexicographically; we compare typed
    dates so partition pruning on a date-partitioned layout still fires.
    """
    c = F.to_date(col if isinstance(col, Column) else F.col(col))
    return (c >= F.lit(start).cast("date")) & (c <= F.lit(end).cast("date"))


def recency_filter(
    df: DataFrame, ts_col: str, hours: int = 1, reference_ts: Column | None = None
) -> DataFrame:
    """P9–P11 (ref inc_load:86-95), corrected.

    The reference computed ``time_diff`` against an audit column it had just
    set to now() (a no-op filter — SURVEY.md §0). The intent is "only rows
    within the trailing window"; at scale this predicate is what prunes
    partitions on a ts-partitioned layout. ``reference_ts`` defaults to the
    dataset max so results are deterministic; pass
    ``F.current_timestamp()`` for wall-clock semantics.
    """
    if reference_ts is None:
        # Scalar aggregate broadcast-joined in — no driver collect, one tiny
        # extra stage, and the comparison stays a pushable predicate.
        bound = df.agg(
            (F.max(ts_col) - F.expr(f"INTERVAL {int(hours)} HOURS")).alias("__bound")
        )
        return (
            df.join(F.broadcast(bound))
            .where(F.col(ts_col) >= F.col("__bound"))
            .drop("__bound")
        )
    return df.where(F.col(ts_col) >= reference_ts - F.expr(f"INTERVAL {int(hours)} HOURS"))
