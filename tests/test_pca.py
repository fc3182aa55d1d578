"""Distributed PCA vs numpy ground truth (functions/pca.py).

The fit must equal numpy PCA on the collected corpus: same spectrum,
orthonormal components, same projections (sign convention fixed), and
the distributed moment reduction must be partitioning-invariant.
"""

from __future__ import annotations

import numpy as np
import pytest

from weather_data_data_pipeline_spark.functions.pca import (
    pca_fit,
    pca_project,
    variance_report,
)
from weather_data_data_pipeline_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"
K = 6


@pytest.fixture(scope="module")
def corpus(spark):
    emb = load(spark, SF_DIR, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return emb, ids, X


@pytest.fixture(scope="module")
def model(corpus):
    emb, _, _ = corpus
    return pca_fit(emb, k=K)


def _numpy_pca(X: np.ndarray, k: int):
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        comps.append(-v if v[pivot] < 0 else v)
    return mean, np.array(comps), evals[order], float(np.trace(cov))


def test_spectrum_matches_numpy(model, corpus):
    _, _, X = corpus
    _, _, evals, trace = _numpy_pca(X, K)
    assert model.n == X.shape[0]
    np.testing.assert_allclose(model.explained_variance, evals, rtol=1e-8)
    np.testing.assert_allclose(model.total_variance, trace, rtol=1e-8)


def test_components_orthonormal_and_match_numpy(model, corpus):
    _, _, X = corpus
    _, comps_np, _, _ = _numpy_pca(X, K)
    W = np.array(model.components)
    np.testing.assert_allclose(W @ W.T, np.eye(K), atol=1e-9)
    np.testing.assert_allclose(W, comps_np, atol=1e-7)


def test_ratios_decreasing_and_bounded(model):
    r = model.explained_variance_ratio
    assert all(a >= b - 1e-12 for a, b in zip(r, r[1:]))
    assert 0.0 < sum(r) <= 1.0 + 1e-9


def test_projection_matches_numpy(model, corpus):
    emb, ids, X = corpus
    proj = pca_project(emb, model, id_col="vec_id")
    got = {
        r["vec_id"]: [r[f"p{j}"] for j in range(K)] for r in proj.collect()
    }
    mean, comps_np, _, _ = _numpy_pca(X, K)
    expected = (X - mean) @ comps_np.T
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[int(vid)], expected[i], atol=1e-6)


def test_fit_partition_invariant(spark, model):
    emb = load(spark, SF_DIR, "embeddings")
    other = pca_fit(emb.repartition(7), k=K)
    np.testing.assert_allclose(
        other.explained_variance, model.explained_variance, rtol=1e-9
    )
    np.testing.assert_allclose(other.mean, model.mean, rtol=1e-9)
    np.testing.assert_allclose(
        np.array(other.components), np.array(model.components), atol=1e-8
    )


def test_variance_report_shape(model, spark):
    rep = variance_report(model, spark).collect()
    assert [r["component"] for r in rep] == list(range(K))
    assert abs(rep[-1]["cum_evr"] - round(sum(model.explained_variance_ratio), 6)) < 1e-6


def test_pca_fit_empty_corpus_raises_value_error(spark):
    import pytest

    from weather_data_data_pipeline_spark.functions.pca import pca_fit

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="no non-null vectors"):
        pca_fit(empty, k=2)


def test_embedding_pca_queries_invariants(spark):
    """Runs BOTH registered rows-only PCA queries (ADVICE r9 #2):
    projections exist for every vector, eigenvalues are non-increasing
    and non-negative, explained-variance ratios sum to <= 1 and the
    cumulative column is their running sum."""
    from weather_data_data_pipeline_spark.plans.llm_queries import (
        embedding_pca_project,
        embedding_pca_variance,
    )
    from weather_data_data_pipeline_spark.sources.tables import load

    sf = "/root/testdata/sf0.001"
    proj = embedding_pca_project(spark, sf).collect()
    n_vecs = load(spark, sf, "embeddings").count()
    assert len(proj) == n_vecs
    assert len({r["vec_id"] for r in proj}) == n_vecs

    var = sorted(
        embedding_pca_variance(spark, sf).collect(),
        key=lambda r: r["component"],
    )
    assert var
    eig = [r["eigenvalue"] for r in var]
    assert all(e >= 0 for e in eig)
    assert all(eig[i] >= eig[i + 1] - 1e-9 for i in range(len(eig) - 1))
    cum = 0.0
    for r in var:
        cum += r["evr"]
        assert abs(r["cum_evr"] - cum) < 1e-4
    assert cum <= 1.0 + 1e-6
