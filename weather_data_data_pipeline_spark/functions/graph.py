"""Iterative graph algorithms over pair/edge DataFrames.

Companion to ``dedup.connected_components`` (min-label propagation):
this module adds PageRank, the standard authority weight for corpus
curation (e.g. domain/document quality weighting before sampling a
training mix from a crawl graph).

Scale shape:
- One iteration = one equi-join (edges ⋈ ranks, shuffle on vertex id)
  plus one map-side-combinable sum aggregate — the same plan as one
  round of label propagation, so everything known about partitioning
  those (co-partition edges and ranks on the join key, AQE skew split
  for celebrity vertices) applies unchanged.
- Dangling mass (vertices with no out-edges) reduces to ONE scalar per
  iteration via an aggregate; the driver never sees per-vertex data.
- Lineage is truncated every iteration (persist + unpersist previous),
  keeping the plan O(1) deep instead of O(iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    damping: float = 0.85,
    iters: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank; returns (node, rank), Σrank = 1.

    ``edges`` is a directed edge list; multi-edges should be
    deduplicated by the caller if unwanted. ``nodes`` optionally widens
    the vertex set beyond edge endpoints (isolated vertices then hold
    teleport + dangling mass only — include them when ranking a corpus
    where most documents have no links). Dangling-vertex mass is
    redistributed uniformly, the standard convention.

    The returned DataFrame is persisted (the last iteration pinned it);
    the caller owns it and should ``unpersist()`` when done. All
    intermediate cached frames are released before returning, including
    on the empty-graph early exit.
    """
    # The edge list may carry an expensive lineage (e.g. a shingle-join
    # similarity graph) and is scanned once per downstream prep step —
    # pin it so that lineage executes exactly once.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    vertex_ids = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    )
    if nodes is not None:
        vertex_ids = vertex_ids.union(nodes.select(F.col("node")))
    vertices = vertex_ids.dropDuplicates().persist()
    n = vertices.count()
    if n == 0:
        empty = vertices.withColumn("rank", F.lit(0.0))
        vertices.unpersist()
        e.unpersist()
        return empty

    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    # (src, dst, outdeg) resolved once — each iteration then only joins
    # the current ranks against this static weighted edge list.
    weighted = e.join(outdeg, "src").persist()

    ranks = vertices.withColumn("rank", F.lit(1.0 / n)).persist()
    ranks.count()
    teleport = (1.0 - damping) / n  # python-float, same as always
    for _ in range(iters):
        contribs = (
            weighted.join(ranks, weighted.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # Mass sitting on vertices with no out-edges, spread uniformly —
        # attached as a BROADCAST 1-row aggregate instead of a driver
        # collect (r10): one action per iteration instead of two. The
        # expression mirrors the old python-float op order
        # ((1-d)/n + (d*dang)/n) term for term, so ranks are
        # bit-identical to the collect form.
        dang = ranks.join(
            outdeg, ranks.node == outdeg.src, "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        # localCheckpoint (eager) BOTH materializes the iteration (the
        # one action) and TRUNCATES lineage — required now that ranks
        # feeds two branches (contribs + dang): persist alone caches
        # data but keeps the logical plan, which would grow
        # exponentially across iterations and OOM the planner's
        # stringification by iteration ~10.
        new_ranks = (
            vertices.join(contribs, vertices.node == contribs.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + (F.lit(damping) * F.col("_dang")) / F.lit(float(n))
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        # unpersist() frees the iteration-0 cached frame; for
        # checkpointed generations it is a no-op (their blocks are not
        # in the cache manager) — those are reclaimed by the
        # ContextCleaner as soon as the previous `ranks` reference
        # drops below, so at most one superseded generation is ever
        # in flight
        ranks.unpersist()
        ranks = new_ranks
    vertices.unpersist()
    outdeg.unpersist()
    weighted.unpersist()
    e.unpersist()
    return ranks
