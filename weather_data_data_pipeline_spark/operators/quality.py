"""Data-quality constraint checking — the validation gate of a pipeline.

One aggregate pass computes every constraint metric simultaneously
(null counts, range violations, uniqueness) instead of one job per
check: at 100 TB, N separate validation scans are N times the cost of
this single partial+final aggregate. Uniqueness is the only check that
needs its own shuffle (count-distinct of the key), and it rides the
same job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_count(col: str) -> Column:
    return F.count(F.when(F.col(col).isNull(), 1)).alias(f"nulls_{col}")


def violation_count(name: str, predicate: Column) -> Column:
    """Rows violating an expectation (predicate = the VIOLATION)."""
    return F.count(F.when(predicate, 1)).alias(f"bad_{name}")


def constraint_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    violations: dict[str, Column] | None = None,
    unique_key: Sequence[str] | None = None,
) -> DataFrame:
    """One-row report: total rows, per-column null counts, per-rule
    violation counts, and (optionally) how many rows share a duplicated
    key. All metrics come out of one scan."""
    aggs = [F.count("*").alias("n_rows")]
    aggs += [null_count(c) for c in not_null]
    for name, pred in (violations or {}).items():
        aggs.append(violation_count(name, pred))
    report = df.agg(*aggs)
    if unique_key:
        dups = (
            df.groupBy(*unique_key)
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > 1)
            .agg(
                F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias(
                    "rows_in_duplicate_keys"
                )
            )
        )
        report = report.crossJoin(dups)
    return report
