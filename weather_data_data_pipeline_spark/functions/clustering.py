"""Distributed k-means (Lloyd's algorithm) over embedding columns.

Complements the sampled driver-side quantizer in ``similarity.py``
(`train_ivf_centroids`, which trains on a bounded sample): here every
iteration aggregates over the FULL corpus, so the result is the true
Lloyd's fixed point, not a sample approximation.

Scale shape (the part that matters at 100 TB):
- Centroids are broadcast as literal column expressions — no join, no
  shuffle of the corpus for assignment; distance math is JVM-side
  higher-order functions in double precision.
- Each iteration is ONE map-side-combinable HashAggregate producing
  k rows of (count, sse, per-dimension running sums). Only
  k × (dim + 2) doubles ever reach the driver per iteration.
- Ties break to the lowest cluster id (struct array_min ordering), so
  assignment is deterministic under any partitioning.

The reference has no clustering operator; this extends the engine for
the training-data-pipeline north star (corpus bucketing / topic
stratification before sampling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _centroid_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def _sq_dist(vec: Column, cent: Column) -> Column:
    """Squared L2 distance, summed in index order (double precision)."""
    return F.aggregate(
        F.zip_with(vec, cent, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """struct(dist2, cluster) of the nearest centroid; ties → lowest id.

    k distance expressions evaluated inline per row (whole-stage
    codegen), argmin via array_min's struct ordering — no join, no UDF.
    """
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _sq_dist(vec, _centroid_lit(c)).alias("dist2"),
                    F.lit(i).alias("cluster"),
                )
                for i, c in enumerate(centroids)
            ]
        )
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist2): nearest-centroid assignment for every row.

    One narrow projection over the corpus — the centroid table rides
    along as literals, so nothing shuffles and nothing is collected.
    """
    best = nearest_centroid(F.col(vec_col), centroids)
    return df.select(
        F.col(id_col),
        best["cluster"].alias("cluster"),
        best["dist2"].alias("dist2"),
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[float]]:
    """Full-corpus Lloyd's k-means; returns (centroids, inertia_history).

    Init is deterministic: the embeddings of the ``k`` lowest ids.
    Each iteration runs one aggregation job; ``inertia_history[i]`` is
    the SSE under the centroids used for iteration i's assignment, so
    the sequence is non-increasing (monotone convergence, the Lloyd
    invariant the unit tests check). Empty clusters keep their previous
    centroid.
    """
    init = (
        df.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))
        .orderBy("_i")
        .limit(k)
        .collect()
    )
    cents = [[float(x) for x in r["_v"]] for r in init]
    dim = len(cents[0])
    history: list[float] = []
    for _ in range(iters):
        best = nearest_centroid(F.col(vec_col), cents)
        assigned = df.select(
            F.col(vec_col).alias("_v"),
            best["cluster"].alias("cluster"),
            best["dist2"].alias("dist2"),
        )
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                F.sum("dist2").alias("sse"),
                *[
                    F.sum(F.col("_v").getItem(i).cast("double")).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        history.append(float(sum(r["sse"] for r in stats)))
        by_cluster = {r["cluster"]: r for r in stats}
        for c in range(k):
            r = by_cluster.get(c)
            if r is not None and r["n"] > 0:
                cents[c] = [r[f"s{i}"] / r["n"] for i in range(dim)]
    return cents, history


def cluster_profile(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster size and SSE under fixed centroids — the evaluation
    twin of :func:`assign_clusters` (one aggregation, k output rows)."""
    return (
        assign_clusters(df, centroids, id_col, vec_col)
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.sum("dist2"), 4).alias("sse"),
        )
    )


def kcenter_select(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_scale: int = 6,
) -> list[tuple[int, int, "object"]]:
    """Greedy k-center (farthest-point traversal, Gonzalez 1985): pick
    the lowest id as the seed, then ``k - 1`` times pick the point
    farthest (max over the pool of min squared-L2 distance to the
    selected set). Returns ``[(rank, id, dist)]`` where ``dist`` is the
    point's min distance to the previously selected set at the moment
    it was chosen — the running coverage radius (None for the seed).

    The 2-approximation coreset for the k-center objective; as a data
    selector it picks a maximally spread subset (diversity sampling).

    Determinism contract: each candidate's squared distance is computed
    by an index-order double fold (:func:`_sq_dist`), rounded to
    ``dist_scale`` dp and CAST to decimal before any comparison, and
    argmax ties break to the lowest id — so the selection replays
    exactly in any engine that folds doubles in index order.

    Scale shape: each round is ONE map-side-combinable aggregate over
    the pool computing ``max(struct(mind, -id, vec))`` — the new
    center's embedding rides along in the max struct, so no second
    lookup pass. The min-distance column chains via ``least`` on the
    cached pool; total work O(n·k²·d) expression-only, nothing but one
    struct row per round reaches the driver.
    """
    dec = f"decimal(38,{dist_scale})"
    seed = (
        df.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))
        .orderBy("_i")
        .limit(1)
        .collect()[0]
    )
    selected: list[tuple[int, int, object]] = [(1, seed["_i"], None)]
    center = [float(x) for x in seed["_v"]]
    base = (
        df.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))
        .where(F.col("_i") != F.lit(seed["_i"]))
        .persist()
    )
    mind = F.round(_sq_dist(F.col("_v"), _centroid_lit(center)), dist_scale).cast(dec)
    pool = base.select("_i", "_v", mind.alias("_mind"))
    for rank in range(2, k + 1):
        top = pool.agg(
            F.max(
                F.struct(
                    F.col("_mind").alias("d"),
                    (-F.col("_i")).alias("ni"),
                    F.col("_v").alias("v"),
                )
            ).alias("t")
        ).collect()[0]["t"]
        if top is None:  # pool exhausted (k > n)
            break
        chosen_id = -top["ni"]
        selected.append((rank, chosen_id, top["d"]))
        if rank == k:
            break
        center = [float(x) for x in top["v"]]
        d_new = F.round(
            _sq_dist(F.col("_v"), _centroid_lit(center)), dist_scale
        ).cast(dec)
        pool = pool.where(F.col("_i") != F.lit(chosen_id)).select(
            "_i", "_v", F.least(F.col("_mind"), d_new).alias("_mind")
        )
    base.unpersist()
    return selected
