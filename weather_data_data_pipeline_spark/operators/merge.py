"""Table-maintenance operators: MERGE-style upsert and SCD Type 2.

The reference's only write-maintenance primitive is append-with-anti-join
dedup (`/root/reference/src/weather_report_pipeline/
weather_report_data_full_load_pipeline.py:163-171`). A complete engine
also needs the other two canonical maintenance shapes:

- **merge_upsert** — MERGE INTO semantics (source wins on key match,
  unmatched source rows insert, unmatched target rows survive).
- **scd2_snapshot** — slowly-changing-dimension type 2: a change stream
  becomes versioned rows with validity intervals.

Scale design: upsert is ONE left-anti join (shuffle or broadcast,
Catalyst's choice) + a union — no full-outer join, no window. SCD2 is
one window pass partitioned by the business key; state per key is just
its change history, so the shuffle is keyed and skew-safe unless one
key dominates (then salt the partition column upstream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Whole-row MERGE: for each key, the source row replaces the target
    row if present (WHEN MATCHED THEN UPDATE SET *), otherwise inserts
    (WHEN NOT MATCHED THEN INSERT *); target rows without a source match
    pass through. Equivalent to ``source ∪ (target ANTI JOIN source)``.

    The source must be unique per key (standard MERGE precondition —
    multiple source matches per target row are rejected by real MERGE
    implementations; here the duplicate would simply survive, so
    enforce uniqueness upstream with exact_dedup).
    """
    return source.unionByName(target.join(source, list(keys), "left_anti"))


def scd2_snapshot(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change stream: each change
    row becomes a version with ``valid_from`` (its own timestamp),
    ``valid_to`` (the next change's timestamp, NULL for the current
    version), ``is_current``, and a 1-based ``version`` number.

    One window pass: lead() and row_number() share the same
    (key, order) window spec, so Catalyst evaluates both in a single
    sort within a single shuffle.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.row_number().over(w))
    )


def orphan_count(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Referential-integrity metric: child rows whose foreign key has no
    parent — a left-anti join count (broadcast when the parent key set
    is small; at 100 TB, a bloom-filter pre-probe shrinks the shuffle).
    NULL foreign keys are not orphans (SQL FK semantics)."""
    return (
        child.where(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)), fk, "left_anti")
        .agg(F.count("*").alias("n_violations"))
    )
