"""Distributed PCA over embedding columns (training-data pipeline op).

Dimensionality reduction is a standard pre-step for large-corpus
embedding work — cheaper ANN indexes, whitened clustering, visualization
exports. The reference has no linear-algebra surface at all; this
extends the engine's embedding family (similarity.py, clustering.py).

Scale shape (what survives 100 TB):
- The only full-corpus pass is a Gram/moment aggregation done with
  ``mapInPandas``: each Arrow batch contributes one partial row
  ``(n, Σx, ΣxᵀX)`` computed by numpy GEMM — the classic treeAggregate
  pattern. Partial size is O(d²) doubles, INDEPENDENT of row count, so
  a 1000-executor scan still reduces to a few thousand tiny rows.
- Partials are combined distributedly (posexplode → sum per position),
  never by collecting per-partition rows to the driver; only the final
  d + d² + 1 cells cross to the driver.
- The eigendecomposition runs on the driver on the d×d covariance —
  d is the embedding width (64 here, ≤4096 in practice), so this is
  microseconds and deliberately NOT distributed.
- Projection is JVM-side whole-stage-codegen arithmetic: component
  vectors ride along as literal arrays (like clustering.nearest_centroid)
  — no join, no shuffle, no Python in the projection path.

Determinism: eigenvectors are sign-fixed so the largest-|loading|
coordinate is positive, making projections reproducible across runs and
comparable to numpy in tests.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_array(vec: list[float]) -> Column:
    # ONE from_json string literal, not per-element F.lit: dim py4j
    # round trips + a dim-child CreateArray per use otherwise (see
    # clustering._centroid_lit — measured ~0.4 s/build on the k×d
    # centroid twin). json float repr round-trips exactly; Catalyst
    # constant-folds to the identical array<double> Literal.
    import json
    import math

    vals = [float(x) for x in vec]
    # loud plan-build failure on non-finite components (ADVICE r15):
    # json NaN/Infinity tokens would silently NULL the whole parsed
    # array in PERMISSIVE from_json — see clustering._centroid_lit
    if not all(math.isfinite(v) for v in vals):
        raise ValueError(f"non-finite component in literal array {vals!r}")
    return F.from_json(F.lit(json.dumps(vals)), "array<double>")


def _dot_lit(vec: Column, w: list[float]) -> Column:
    """⟨vec, w⟩ with w a plan-time literal — JVM fold, no UDF."""
    return F.aggregate(
        F.zip_with(vec, _lit_array(w), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@dataclass
class PCAModel:
    n: int
    mean: list[float]  # d
    components: list[list[float]]  # k × d, rows orthonormal
    explained_variance: list[float]  # k eigenvalues (descending)
    total_variance: float  # trace of the covariance

    @property
    def explained_variance_ratio(self) -> list[float]:
        return [v / self.total_variance for v in self.explained_variance]


def gram_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-Arrow-batch moment partials: one row (n, Σx, flat ΣXᵀX).

    numpy does the d×d GEMM per batch; output volume is one O(d²) row
    per batch regardless of batch size.
    """

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s: np.ndarray | None = None
        g: np.ndarray | None = None
        for pdf in batches:
            col = pdf[vec_col].dropna()
            if col.empty:
                continue
            X = np.vstack(col.to_numpy()).astype(np.float64)
            n += X.shape[0]
            if s is None:
                s = X.sum(axis=0)
                g = X.T @ X
            else:
                s += X.sum(axis=0)
                g += X.T @ X
        if n:
            yield pd.DataFrame(
                [{"n": n, "s": list(s), "g": list(g.ravel())}]
            )

    return df.select(vec_col).mapInPandas(
        part, "n long, s array<double>, g array<double>"
    )


def pca_fit(df: DataFrame, k: int = 8, vec_col: str = "embedding") -> PCAModel:
    """Fit PCA on the full corpus in ONE distributed pass + driver eigh.

    The partial rows are reduced inside Spark (posexplode the
    concatenated [Σx | ΣXᵀX] array, sum per position) so the driver only
    ever sees d + d² scalars — the reduction tree scales with the
    cluster, not with the data.
    """
    partials = gram_partials(df, vec_col)
    # Fold n into position 0 of the same flattened vector so the whole
    # fit is ONE pass over the corpus (no second job re-running the scan).
    cells = (
        partials.select(
            F.posexplode(
                F.concat(F.array(F.col("n").cast("double")), "s", "g")
            ).alias("pos", "val")
        )
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
    )
    flat = {r["pos"]: r["val"] for r in cells.collect()}
    if not flat:
        raise ValueError(
            f"pca_fit: no non-null vectors in corpus column {vec_col!r}"
        )
    total_n = int(flat[0])
    d = int(round((np.sqrt(4 * (len(flat) - 1) + 1) - 1) / 2))  # 1 + d + d²
    s = np.array([flat[1 + i] for i in range(d)])
    g = np.array([flat[1 + d + i] for i in range(d * d)]).reshape(d, d)
    mean = s / total_n
    cov = (g - total_n * np.outer(mean, mean)) / max(total_n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return PCAModel(
        n=int(total_n),
        mean=[float(x) for x in mean],
        components=comps,
        explained_variance=[float(evals[i]) for i in order],
        total_variance=float(np.trace(cov)),
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix: str = "p",
) -> DataFrame:
    """(id, p0..p{k-1}): centered projection onto the top-k components.

    Each score is ⟨x, wⱼ⟩ − ⟨μ, wⱼ⟩ with the second term folded to a
    plan-time constant — one narrow codegen'd projection over the
    corpus, nothing shuffled, nothing collected.
    """
    k = len(model.components) if k is None else k
    cols = [F.col(id_col)]
    for j in range(k):
        w = model.components[j]
        offset = float(np.dot(model.mean, w))
        cols.append(
            (_dot_lit(F.col(vec_col), w) - F.lit(offset)).alias(f"{prefix}{j}")
        )
    return df.select(*cols)


def variance_report(model: PCAModel, spark) -> DataFrame:
    """Model metadata as a tiny DataFrame (component, eigenvalue, ratio,
    cumulative ratio) — driver-created, k rows."""
    rows = []
    cum = 0.0
    for j, (ev, r) in enumerate(
        zip(model.explained_variance, model.explained_variance_ratio)
    ):
        cum += r
        rows.append((j, round(ev, 6), round(r, 6), round(cum, 6)))
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, evr double, cum_evr double"
    )
