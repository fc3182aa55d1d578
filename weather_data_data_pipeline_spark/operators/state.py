"""Incremental aggregate-state maintenance (mergeable partial aggregates).

The reference's incremental pipeline recomputes every report from the
full destination table each hour (inc_load:102-129 rebuilds the weekly
averages over everything it can read). The scale-correct form keeps a
small mergeable STATE per group — (decimal sum, count) for an average —
and folds each new batch in:

    state(history) ⊕ state(batch₁) ⊕ state(batch₂) ... → finalize

Decimal sums are exact and associative, so ⊕ is order- and
grouping-insensitive: merging hourly states gives bit-identical results
to one full recompute (property-tested), while reading only the new
batch + the compact state table — O(groups), not O(history rows).
This is the same partial/final split Spark's own HashAggregate performs
inside one job, lifted to a persistent cross-run contract.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUM_COL = "state_sum"
COUNT_COL = "state_n"


def avg_state(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """Mergeable average state per key: exact decimal sum + non-null count."""
    return df.groupBy(*keys).agg(
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias(SUM_COL),
        F.count(value_col).alias(COUNT_COL),
    )


def merge_avg_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Fold any number of state tables into one: union + re-sum.

    Associative and commutative (decimal sums), so batches can arrive in
    any order and states can be pre-merged hierarchically (per-hour →
    per-day → total) without changing the result.
    """
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    return unioned.groupBy(*keys).agg(
        F.sum(SUM_COL).alias(SUM_COL), F.sum(COUNT_COL).alias(COUNT_COL)
    )


def finalize_avg(
    state: DataFrame,
    keys: Sequence[str],
    out_col: str = "average_value",
    scale: int = 2,
) -> DataFrame:
    """State → presentation: rounded double average (davg formulation)."""
    return state.select(
        *keys,
        F.round(
            F.col(SUM_COL).cast("double") / F.col(COUNT_COL), scale
        ).alias(out_col),
    )
