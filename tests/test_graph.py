"""PageRank vs numpy power iteration (functions/graph.py)."""

from __future__ import annotations

import numpy as np
import pytest


def _numpy_pagerank(n, edge_list, damping=0.85, iters=10, extra_nodes=0):
    """Reference power iteration with uniform dangling redistribution.

    Vertices 0..n-1 (n includes extra isolated nodes).
    """
    outdeg = np.zeros(n)
    for s, _ in edge_list:
        outdeg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in edge_list:
            contrib[d] += r[s] / outdeg[s]
        dangling = r[outdeg == 0].sum()
        r = (1 - damping) / n + damping * (dangling / n + contrib)
    return r


def _spark_pagerank(spark, edge_list, n_nodes=None, **kw):
    from weather_data_data_pipeline_spark.functions.graph import pagerank

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = None
    if n_nodes is not None:
        nodes = spark.createDataFrame(
            [(i,) for i in range(n_nodes)], "node long"
        )
    out = pagerank(edges, nodes=nodes, **kw).collect()
    return {r["node"]: r["rank"] for r in out}


CHAIN = [(0, 1), (1, 2), (2, 3)]
STAR = [(1, 0), (2, 0), (3, 0), (4, 0)]
CYCLE_WITH_TAIL = [(0, 1), (1, 2), (2, 0), (3, 0)]


@pytest.mark.parametrize(
    "edges,n", [(CHAIN, 4), (STAR, 5), (CYCLE_WITH_TAIL, 4)]
)
def test_matches_numpy(spark, edges, n):
    got = _spark_pagerank(spark, edges, n_nodes=n)
    want = _numpy_pagerank(n, edges)
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_ranks_sum_to_one(spark):
    got = _spark_pagerank(spark, CYCLE_WITH_TAIL, n_nodes=6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_isolated_nodes_get_teleport_plus_dangling_share(spark):
    # Node 5 is isolated: its rank must equal the closed-form fixed
    # point of teleport + dangling-share mass, strictly below any
    # linked-to vertex.
    got = _spark_pagerank(spark, STAR, n_nodes=6)
    want = _numpy_pagerank(6, STAR)
    assert got[5] == pytest.approx(want[5], abs=1e-12)
    assert got[0] > got[5]


def test_authority_ordering(spark):
    # Everything points at 0 — it must outrank all its fans.
    got = _spark_pagerank(spark, STAR, n_nodes=5)
    assert got[0] == max(got.values())


def test_partition_invariance(spark):
    edges = spark.createDataFrame(CYCLE_WITH_TAIL, "src long, dst long")
    from weather_data_data_pipeline_spark.functions.graph import pagerank

    a = {
        r["node"]: r["rank"]
        for r in pagerank(edges.repartition(1), iters=8).collect()
    }
    b = {
        r["node"]: r["rank"]
        for r in pagerank(edges.repartition(5), iters=8).collect()
    }
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_empty_graph_releases_caches(spark):
    from weather_data_data_pipeline_spark.functions.graph import pagerank

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(edges)
    assert out.count() == 0
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before, "empty-graph early return leaked cached frames"


def test_doc_pagerank_query_invariants(spark):
    """Runs the REGISTERED rows-only query (ADVICE r9 #2): one rank per
    document, ranks form a probability distribution (sum 1 within the
    surfaced rounding), every rank >= the teleport floor."""
    from weather_data_data_pipeline_spark.plans.llm_queries import (
        doc_pagerank,
    )

    rows = doc_pagerank(spark, "/root/testdata/sf0.001").collect()
    n = len(rows)
    assert n == len({r["doc_id"] for r in rows}) > 0
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-2, total  # 6-dp rounded surfaces
    assert all(r["rank"] >= 0.15 / n * 0.5 for r in rows)
