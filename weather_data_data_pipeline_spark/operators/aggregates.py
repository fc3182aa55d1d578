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
