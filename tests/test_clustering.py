"""Distributed k-means: Lloyd invariants, numpy ground truth, edge cases."""

from __future__ import annotations

import numpy as np
import pytest

from weather_data_data_pipeline_spark.functions.clustering import (
    assign_clusters,
    cluster_profile,
    kmeans_fit,
)
from weather_data_data_pipeline_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    return ids, np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_assign_matches_numpy(emb, emb_np):
    ids, X = emb_np
    cents = X[:4]
    got = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in assign_clusters(emb, [list(c) for c in cents]).collect()
    }
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want_cluster = d2.argmin(axis=1)  # numpy argmin ties → lowest index, same rule
    for i, vid in enumerate(ids):
        assert got[vid][0] == want_cluster[i]
        assert got[vid][1] == pytest.approx(d2[i, want_cluster[i]], rel=1e-9)


def test_fit_inertia_monotone_and_deterministic(emb):
    cents1, hist1 = kmeans_fit(emb, k=4, iters=4)
    cents2, hist2 = kmeans_fit(emb, k=4, iters=4)
    # Lloyd's invariant: SSE never increases between iterations
    for a, b in zip(hist1, hist1[1:]):
        assert b <= a * (1 + 1e-9)
    # same init + same data → bit-identical trajectory
    assert hist1 == hist2
    assert cents1 == cents2


def test_fit_improves_on_init(emb):
    _, hist = kmeans_fit(emb, k=4, iters=4)
    assert hist[-1] < hist[0]


def test_cluster_profile_covers_corpus(emb):
    cents, _ = kmeans_fit(emb, k=4, iters=2)
    prof = cluster_profile(emb, cents).collect()
    assert sum(r["n_members"] for r in prof) == emb.count()
    assert {r["cluster"] for r in prof} <= set(range(4))


def test_empty_cluster_keeps_previous_centroid(spark):
    # 3 distinct points, k=4: init takes ids 0..3 where ids 2,3 duplicate
    # id 1's point → one centroid ends every round empty and must survive.
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [10.0, 10.0]),
        (3, [10.0, 10.0]),
        (4, [0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents, hist = kmeans_fit(df, k=4, iters=3)
    assert len(cents) == 4 and all(len(c) == 2 for c in cents)
    assert all(np.isfinite(v) for c in cents for v in c)
    for a, b in zip(hist, hist[1:]):
        assert b <= a * (1 + 1e-9)


def test_kcenter_matches_numpy_greedy(emb, emb_np):
    from decimal import Decimal

    from weather_data_data_pipeline_spark.functions.clustering import (
        kcenter_select,
    )

    ids, X = emb_np
    got = kcenter_select(emb, k=6)
    # numpy replay with the same contract: 6-dp-rounded squared dists,
    # argmax ties to the lowest id
    sel = [0]  # index of min vec_id (ids sorted ascending)
    mind = None
    want = [(1, ids[0], None)]
    pool = list(range(1, len(ids)))
    d = np.round(((X - X[0]) ** 2).sum(axis=1), 6)
    mind = {i: d[i] for i in pool}
    for rank in range(2, 7):
        best = max(pool, key=lambda i: (mind[i], -ids[i]))
        want.append((rank, ids[best], mind[best]))
        pool.remove(best)
        dn = np.round(((X - X[best]) ** 2).sum(axis=1), 6)
        for i in pool:
            mind[i] = min(mind[i], dn[i])
    for (gr, gi, gd), (wr, wi, wd) in zip(got, want):
        assert (gr, gi) == (wr, wi)
        if wd is None:
            assert gd is None
        else:
            assert float(gd) == pytest.approx(float(wd), abs=2e-6)
    # coverage radius is non-increasing (farthest-point invariant)
    dists = [float(d) for _, _, d in got if d is not None]
    for a, b in zip(dists, dists[1:]):
        assert b <= a + 1e-12
    assert isinstance(got[1][2], Decimal)


def test_kcenter_pool_exhausted(spark):
    from weather_data_data_pipeline_spark.functions.clustering import (
        kcenter_select,
    )

    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kcenter_select(df, k=10)
    assert [i for _, i, _ in got] == [0, 2, 1]
    assert len(got) == 3


def test_embedding_kmeans_clusters_query_invariants(spark):
    """Runs the REGISTERED rows-only query (ADVICE r9 #2): every vector
    lands in exactly one cluster, SSE is non-negative, and the result
    is deterministic across two invocations (seeded init)."""
    from weather_data_data_pipeline_spark.plans.llm_queries import (
        embedding_kmeans_clusters,
    )
    from weather_data_data_pipeline_spark.sources.tables import load

    sf = "/root/testdata/sf0.001"
    rows = embedding_kmeans_clusters(spark, sf).collect()
    assert rows
    n_vecs = load(spark, sf, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n_vecs
    assert all(r["sse"] >= 0 for r in rows)
    again = embedding_kmeans_clusters(spark, sf).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_kcenter_composable_single_partition_equals_exact(spark):
    """On ONE partition the composable form IS the exact greedy: the
    local Gonzalez prefix over the whole pool followed by the driver
    greedy over it replays the k-round traversal pick-for-pick."""
    from weather_data_data_pipeline_spark.functions.clustering import (
        kcenter_select,
        kcenter_select_composable,
    )
    from weather_data_data_pipeline_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").coalesce(1)
    exact = [
        (r, i, None if d is None else round(float(d), 6))
        for r, i, d in kcenter_select(emb, k=8)
    ]
    comp = [
        (r, i, None if d is None else round(float(d), 6))
        for r, i, d in kcenter_select_composable(emb, k=8)
    ]
    assert comp == exact


def test_kcenter_composable_multi_partition_bounded_and_deterministic(spark):
    """Across partitions the composable pick is an approximation with a
    bounded coverage radius (composable-coreset guarantee): its radius
    at k must be within a small constant of the exact greedy's, every
    pick must be a real corpus id, and the result must be identical
    across runs (partition-local greedy + sorted merge are both
    deterministic)."""
    from weather_data_data_pipeline_spark.functions.clustering import (
        kcenter_select,
        kcenter_select_composable,
    )
    from weather_data_data_pipeline_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").repartition(8)
    exact = kcenter_select(emb, k=8)
    comp = kcenter_select_composable(emb, k=8)
    again = kcenter_select_composable(emb, k=8)
    assert comp == again
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert all(i in ids for _, i, _ in comp)
    assert len({i for _, i, _ in comp}) == 8
    # coverage radius at k (the last pick's min-distance): bounded vs
    # exact — on this data the two are near-identical; 2.5x is the
    # generous constant-factor envelope
    r_exact = float(exact[-1][2])
    r_comp = float(comp[-1][2])
    assert r_comp <= 2.5 * r_exact + 1e-9
    # and it cannot be BETTER than the exact greedy's radius by more
    # than rounding (the exact traversal maximizes each pick globally)
    assert r_comp >= r_exact * 0.2
