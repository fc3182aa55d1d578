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


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Symmetric data diff by key: one row per divergent key with status
    ``only_left`` / ``only_right`` / ``changed``.

    The anti-entropy primitive for replica reconciliation, migration
    validation, and CDC backfill checks. Non-key columns collapse to ONE
    64-bit xxhash per side before the join, so the shuffle carries
    (key, hash) — not row payloads — and the comparison is a single
    full-outer join on the key regardless of column count.

    NULL handling: Spark hash expressions SKIP null inputs (a null
    leaves the accumulator unchanged), so hashing bare columns would
    make (NULL,'x') and ('x',NULL) collide — a false "unchanged" in the
    exact tool meant to catch drift. Each column therefore contributes
    an explicit is-null flag ahead of its value, which disambiguates
    null-position shifts; NULL vs '' vs 0 are likewise distinct. (As
    with any 64-bit content hash, a random collision — p ≈ 2⁻⁶⁴ per
    key — is the accepted trade for the fixed-width shuffle.)

    Identical keys (hash-equal) are filtered out BEFORE leaving the
    join, so output size is bounded by the drift, not the table.
    """
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]
    key_cols = [F.col(k) for k in keys]

    def hashed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            *key_cols,
            F.xxhash64(
                *[
                    e
                    for c in compare_cols
                    for e in (F.col(c).isNull(), F.col(c))
                ]
            ).alias(f"_h_{side}"),
        )

    joined = hashed(left, "l").join(hashed(right, "r"), list(keys), "full_outer")
    status = (
        F.when(F.col("_h_r").isNull(), F.lit("only_left"))
        .when(F.col("_h_l").isNull(), F.lit("only_right"))
        .when(F.col("_h_l") != F.col("_h_r"), F.lit("changed"))
    )
    return (
        joined.withColumn("diff_status", status)
        .where(F.col("diff_status").isNotNull())
        .select(*keys, "diff_status")
    )
