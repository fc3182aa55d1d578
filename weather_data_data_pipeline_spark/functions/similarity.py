"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the correctness baseline. Dot products are
  computed with JVM higher-order functions (zip_with + aggregate) in
  double precision — no Python in the loop; the query side is broadcast
  so the corpus never shuffles.
- LSH-bucketed ANN (random hyperplanes): the scale path. Signatures are
  built from deterministic hash-derived hyperplanes (no stored model),
  so the operator is a pure DataFrame transform. Candidates are
  re-ranked with exact cosine.

At 100 TB the corpus side stays partitioned; only O(queries × k) rows
ever leave the executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two array<float> columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_norm(df: DataFrame, vec_col: str, out_col: str = "norm") -> DataFrame:
    return df.withColumn(out_col, _norm(F.col(vec_col)))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Physical shape: broadcast(queries) × corpus → per-row dot product →
    window rank per query. The corpus is scanned once, never shuffled in
    full — only (query, candidate) scores shuffle for ranking, and at
    scale that ranking collapses map-side via TakeOrdered semantics.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q_vec"), F.col("c_vec"))
             / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))).alias("cosine_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_raw"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_raw", 4).alias("cosine"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-duplicate dedup).

    Brute-force O(n²) scoring — correct baseline; use
    :func:`lsh_near_dup_pairs` as the candidate generator at scale.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("va"), F.col("vb"))
             / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("cosine_raw"),
        )
        .where(F.col("cosine_raw") >= threshold)
        .select("id_a", "id_b", F.round("cosine_raw", 4).alias("cosine"))
    )


def _hyperplane_sign(vec: Column, plane_id: int, dim: int) -> Column:
    """Sign of <vec, r_p> for a deterministic pseudo-random hyperplane:
    component j of plane p = (xxhash64(p, j) scaled to [-1, 1]). Computed
    inline with higher-order functions — the 'model' is just a hash seed,
    so signatures are reproducible on any cluster with no stored state."""
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, j: x.cast("double")
            * (F.xxhash64(F.lit(plane_id), j).cast("double") / F.lit(float(1 << 63))),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (proj >= 0).cast("int")


def rhp_signature(
    df: DataFrame, vec_col: str, n_planes: int = 16, dim: int = 64
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) signature as an int bucket:
    bit p = sign(<vec, plane_p>). Cos-similar vectors collide with
    probability (1 - θ/π)^n_planes."""
    bits = [
        _hyperplane_sign(F.col(vec_col), p, dim) * F.lit(1 << p) for p in range(n_planes)
    ]
    acc = bits[0]
    for b in bits[1:]:
        acc = acc + b
    return df.withColumn("bucket", acc.cast("long"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: bucket corpus and queries by random-hyperplane signature,
    rank exactly within the shared bucket. One shuffle on the bucket id
    instead of a full cross product; recall is tuned by n_planes (fewer
    planes → bigger buckets → higher recall, more compute)."""
    cb = rhp_signature(corpus, vec_col, n_planes, dim).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "bucket"
    )
    qb = rhp_signature(queries, vec_col, n_planes, dim).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    scored = (
        cb.join(qb, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("q_vec"), F.col("c_vec"))
             / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))).alias("cosine_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_raw", 4).alias("cosine"),
            F.col("rn").cast("int").alias("rn"),
        )
    )
