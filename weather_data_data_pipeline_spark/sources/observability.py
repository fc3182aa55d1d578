"""In-flight pipeline metrics via ``DataFrame.observe`` (CollectMetrics).

`operators/quality.py: constraint_report` is the standalone validation
JOB; this module is the zero-extra-pass variant: metrics accumulate ON
the production action itself (the write), so a 100 TB load emits row
counts, null rates, and freshness bounds without a second scan. This is
the mechanism behind write-audit-publish gates: observe on the write,
check the metrics, then publish/rollback.

CollectMetrics aggregates on the executors and merges per-task partials
on the driver — cost is one tiny accumulator per task, independent of
data volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def audit_metrics(
    count_col: str | None = None,
    null_cols: Sequence[str] = (),
    ts_col: str | None = None,
    value_col: str | None = None,
) -> list[Column]:
    """Canned metric bundle: row count, per-column null counts, event-time
    freshness bounds (min/max of ``ts_col``), and value totals."""
    out = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        out.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}")
        )
    if ts_col is not None:
        out.append(F.min(ts_col).alias("min_ts"))
        out.append(F.max(ts_col).alias("max_ts"))
    if value_col is not None:
        out.append(F.sum(value_col).alias(f"sum_{value_col}"))
    if count_col is not None:
        out.append(F.count(count_col).alias(f"present_{count_col}"))
    return out


def with_observation(
    df: DataFrame, name: str, metrics: Sequence[Column]
) -> tuple[DataFrame, Observation]:
    """Attach an Observation; read ``obs.get`` AFTER the first action on
    the returned frame (it blocks until the action finishes)."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def observed_append(
    df: DataFrame,
    path: str,
    metrics: Sequence[Column],
    fmt: str = "parquet",
    name: str = "write_audit",
) -> dict:
    """Write-audit: append ``df`` while collecting ``metrics`` on the same
    pass; returns the observed metric dict for the gate decision."""
    observed, obs = with_observation(df, name, metrics)
    observed.write.format(fmt).mode("append").save(path)
    return dict(obs.get)
