"""Physical data layout for 100 TB: partitioned writes, bucketed tables,
and skew salting.

The reference appends everything to unpartitioned MySQL tables over JDBC
(full_load:146-171) — re-reading "the whole destination" per run
(full_load:160) is the first thing that dies at scale. The engine's
primary layout is:

- **date/key-partitioned parquet** so time predicates prune whole
  directories before any IO (the corrected form of the reference's
  last-hour filter, inc_load:86-95, becomes a partition filter);
- **bucketed tables on join keys** so repeated fact⋈fact joins and
  anti-join dedup co-locate without a shuffle — the bucket spec is a
  persisted hash-partitioning both join sides share;
- **salting** for the keys AQE's skew handling can't fix (e.g. a
  single pathological key inside one partition of a shuffled join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet write. Partition columns become
    directory levels; any equality/range predicate on them prunes at
    planning time (static) or runtime (dynamic partition pruning on
    join keys). Keep partition cardinality in the thousands — a
    per-key directory for a high-cardinality key creates a small-file
    storm, the opposite failure mode."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-ordered) catalog table.

    Both sides of a recurring join bucketed on the join key with the
    same bucket count join WITHOUT any Exchange — the shuffle was paid
    once at write time and amortizes over every subsequent join. This is
    the layout for the engine's idempotent-append anti-join at scale:
    bucket the destination on the dedup key."""
    w = df.write.bucketBy(int(num_buckets), *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).format("parquet").saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread each left key over ``salt`` synthetic
    sub-keys, replicate the right side ``salt``× , join on key+salt.

    For a key holding p% of the left side, the hottest task shrinks from
    p% of all rows to p/salt % — at the cost of replicating the (small)
    right side. Use when one known key dominates; prefer AQE skew-join
    for garden-variety skew (it splits oversized partitions without
    replication). Left salt is a hash of the whole row (deterministic,
    no Python), so identical duplicate rows share a salt — fine, since
    salting only needs to spread *distinct* rows of a hot key."""
    salt_col = F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    l_salted = left.withColumn("_salt", salt_col)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l_salted.join(
        r_salted, on=[*keys, "_salt"], how=how
    ).drop("_salt")


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan as text — used by tests to assert
    shuffle-free bucketed joins and partition pruning."""
    return df._jdf.queryExecution().executedPlan().toString()
