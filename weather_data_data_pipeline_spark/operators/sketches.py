"""Sketch aggregates: the sub-linear-memory answers at 100 TB.

Exact count-distinct of a high-cardinality key shuffles every distinct
value; exact percentiles sort the world. At scale both are answered with
bounded-error sketches instead: HyperLogLog++ for cardinality (Spark's
``approx_count_distinct``, mergeable across partitions, fixed KB of
state per group) and a Greenwald-Khanna/KLL-style quantile sketch
(``percentile_approx``). Error bounds are part of the operator contract
and regression-tested against exact answers in tests/test_sketches.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_count_distinct(col: Column | str, rsd: float = 0.02) -> Column:
    """HyperLogLog++ distinct count with relative standard deviation
    ``rsd`` (default 2%). State is O(1/rsd²) bytes per group regardless
    of input size — the only count-distinct that survives a 100 TB
    groupBy. Partial sketches merge associatively, so the aggregation
    stays map-side-partial like any sum."""
    c = F.col(col) if isinstance(col, str) else col
    return F.approx_count_distinct(c, rsd)


def quantile_sketch(
    col: Column | str, probabilities: Sequence[float], accuracy: int = 10000
) -> Column:
    """Approximate quantiles at the given probabilities; rank error is
    ≤ 1/accuracy of the row count. Mergeable per-partition state —
    no global sort, no full shuffle of the measure."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(c, list(probabilities), accuracy)


def cardinality_report(
    df: DataFrame, group_cols: Sequence[str], key_col: str, rsd: float = 0.02
) -> DataFrame:
    """Distinct-``key_col`` cardinality per group via HLL++, alongside
    the exact row count. The canonical 'distinct users per day' shape."""
    return df.groupBy(*group_cols).agg(
        hll_count_distinct(key_col, rsd).alias(f"approx_n_{key_col}"),
        F.count("*").alias("n_rows"),
    )


def value_distribution(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group quantile profile of a measure (p50/p90/p99 by default),
    one sketch pass, no sort."""
    qs = quantile_sketch(value_col, probabilities, accuracy)
    out = df.groupBy(*group_cols).agg(qs.alias("_qs"), F.count("*").alias("n_rows"))
    return out.select(
        *group_cols,
        *[
            F.round(F.col("_qs")[i], 2).alias(f"p{int(p * 100)}")
            for i, p in enumerate(probabilities)
        ],
        "n_rows",
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    capacity: int = 256,
) -> DataFrame:
    """Misra-Gries heavy hitters: every item with true frequency
    > N/capacity is guaranteed present; reported counts are
    underestimates by at most N/capacity (the classic MG bound, which
    survives the merge because a sum of per-partition underestimates is
    an underestimate with the summed bound).

    Completes the mergeable-sketch trio (HLL cardinality, KLL
    quantiles, MG frequency): one pass, O(capacity) state per
    partition, shuffle of ≤ capacity rows per partition — never a
    per-distinct-key shuffle like the exact top-k count. Per-partition
    summaries are built batch-wise (pandas value_counts folds each
    Arrow batch into the summary — vectorized per distinct item, not
    per row), then merged with one tiny groupBy-sum.

    Output: (item, min_count) for the merged summary's top items,
    ``min_count`` being the guaranteed lower bound.
    """

    def summarize(batches):
        import pandas as pd

        counts: dict = {}
        for b in batches:
            for item, c in b["item"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            # Misra-Gries compression: keep ≤ capacity counters by
            # subtracting the (capacity+1)-th largest count from all.
            if len(counts) > capacity:
                cut = sorted(counts.values(), reverse=True)[capacity]
                counts = {
                    k: v - cut for k, v in counts.items() if v - cut > 0
                }
        yield pd.DataFrame(
            {"item": list(counts), "min_count": list(counts.values())}
        )

    summaries = df.select(F.col(item_col).alias("item")).mapInPandas(
        summarize, "item string, min_count long"
    )
    return (
        summaries.groupBy("item")
        .agg(F.sum("min_count").alias("min_count"))
        .orderBy(F.desc("min_count"), F.asc("item"))
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 1 << 12,
    depth: int = 5,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of key frequencies: a (depth × width) counter
    grid where row d increments cell xxhash64(d, key) mod width. Point
    estimate = min over rows — always an OVERestimate (collisions only
    add), off by at most εN with ε = e/width at confidence 1-e^-depth.

    The CMS completes the mergeable-sketch family (HLL cardinality, KLL
    quantiles, Misra-Gries heavy hitters): unlike MG it answers point
    queries for ARBITRARY keys after the fact, and two sketches merge by
    cell-wise addition — the shape that rolls up daily sketches into
    weekly ones without touching raw data.

    Built with one explode (depth rows per input) + one partial+final
    SUM per occupied cell; the result is at most depth × width rows of
    (d, cell, count) — a few hundred KB regardless of input size. At
    100 TB this is the frequency index you can afford to keep per
    partition/day.
    """
    rows = [
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(
                F.xxhash64(F.lit(d), F.col(key_col)).bitwiseAND(
                    F.lit(0x7FFFFFFFFFFFFFFF)
                ),
                F.lit(width),
            ).alias("cell"),
        )
        for d in range(depth)
    ]
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    return (
        df.select(F.explode(F.array(*rows)).alias("rc"), w.alias("w"))
        .select(F.col("rc.d").alias("d"), F.col("rc.cell").alias("cell"), "w")
        .groupBy("d", "cell")
        .agg(F.sum("w").alias("count"))
    )


def cms_point_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1 << 12,
    depth: int = 5,
) -> DataFrame:
    """Estimated frequency for each key in ``keys``: join the key's
    depth cells against the sketch, take the min. Missing cells count 0
    (the key was never seen). The sketch side is tiny — broadcast."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            F.xxhash64(F.lit(d), F.col(key_col)).bitwiseAND(
                                F.lit(0x7FFFFFFFFFFFFFFF)
                            ),
                            F.lit(width),
                        ).alias("cell"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("pc"),
    ).select(key_col, F.col("pc.d").alias("d"), F.col("pc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["d", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("count", F.lit(0))).alias("est_count"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-shape sketches by cell-wise addition — estimates
    from the merged sketch bound the union's true counts exactly like a
    sketch built over the union directly."""
    return (
        a.select("d", "cell", "count")
        .unionByName(b.select("d", "cell", "count"))
        .groupBy("d", "cell")
        .agg(F.sum("count").alias("count"))
    )
