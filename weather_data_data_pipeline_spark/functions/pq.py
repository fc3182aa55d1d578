"""Product-quantization ANN (Jégou et al. 2011) — the third
approximate-search family beside LSH and IVF, and the one that actually
carries web-scale vector search (FAISS's IVF-PQ): compress each vector
to ``m`` one-byte codes, then score queries against the CODES with a
per-query lookup table instead of against the raw floats.

Why it matters at 100 TB: a 64-dim float corpus is 256 B/vector; m=8
PQ codes are 8 B/vector — a 32× smaller scan, and ADC scoring costs m
table lookups + adds per candidate instead of D multiplies. The
codebook (m × k_cw × d_sub floats) broadcasts; nothing corpus-sized
ever shuffles.

Spark-first shapes, zero Python in the hot path:

- encode: per subspace, distances to the k_cw codewords are literal
  higher-order-function folds; argmin via ``array_min`` over
  (dist, codeword) structs — lexicographic struct ordering gives the
  lowest-index tie-break for free.
- ADC: the per-query LUT (m × k_cw subspace distances) is computed on
  the QUERY side, broadcast, and folded against each candidate's code
  array with ``zip_with`` + ``aggregate`` — a fixed-order fold, and the
  LUT entries are 6-dp decimals so the m-term sum is exact: the ranking
  key is bit-deterministic under any partitioning (the
  functions/importance.py decimal contract).

Codebooks here are caller-supplied. ``ann_pq_topk_seeded`` feeds the
subvectors of the 16 lowest-id embeddings verbatim (the same
seed-centroid trick as ann_ivf_topk_seeded / embedding_kmeans_assign),
which makes the WHOLE pipeline — encode, LUT, ADC, ranking — replayable
in the DuckDB oracle; a Lloyd-trained codebook (functions/clustering.py
kmeans_fit per subspace) drops in unchanged for the production path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ADC_DECIMAL = "decimal(38,6)"


def split_codebooks(
    seeds: list[list[float]], m: int
) -> list[list[list[float]]]:
    """codebooks[j][c] = subvector j of seed vector c. Every seed must
    have a dimension divisible by ``m``."""
    if not seeds:
        raise ValueError("need at least one seed vector")
    dim = len(seeds[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    return [
        [list(map(float, s[j * d_sub : (j + 1) * d_sub])) for s in seeds]
        for j in range(m)
    ]


def _sub(vec: Column, j: int, d_sub: int) -> Column:
    return F.slice(vec, j * d_sub + 1, d_sub)


def _sqdist_to_lit(sub: Column, codeword: list[float]) -> Column:
    """Squared L2 distance from a (float) subvector column to a literal
    codeword — a fixed-order JVM fold, deterministic to the bit."""
    cw = F.array(*[F.lit(x) for x in codeword])
    return F.aggregate(
        F.zip_with(
            sub,
            cw,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """(id, codes) — codes[j] = index of the nearest codeword of
    subspace j (squared-L2, ties to the lowest index via struct
    ordering). One narrow projection over the corpus; the codebook is
    a literal in the plan."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    code_cols = []
    for j in range(m):
        sub = _sub(F.col(vec_col), j, d_sub)
        cands = F.array(
            *[
                F.struct(
                    _sqdist_to_lit(sub, cw).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c, cw in enumerate(codebooks[j])
            ]
        )
        code_cols.append(F.array_min(cands)["c"])
    return df.select(
        F.col(id_col), F.array(*code_cols).alias("codes")
    )


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, neighbor_id, adc_dist, rn).

    The per-query LUT — round(sqdist(q_j, codeword), 6) as decimal — is
    built on the (tiny) query side and broadcast; each candidate costs
    one zip_with/aggregate fold over its m codes. adc_dist surfaces as
    the exact decimal sum cast straight to double (no re-rounding), and
    the ranking orders by that exact decimal, so top-k membership never
    depends on float summation order."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    lut = F.array(
        *[
            F.array(
                *[
                    F.round(
                        _sqdist_to_lit(
                            _sub(F.col("q_vec"), j, d_sub), cw
                        ),
                        6,
                    ).cast(_ADC_DECIMAL)
                    for cw in codebooks[j]
                ]
            )
            for j in range(m)
        ]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
    ).select("query_id", lut.alias("_lut"))
    scored = (
        corpus_codes.select(
            F.col(id_col).alias("neighbor_id"), "codes"
        )
        .join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    "codes",
                    "_lut",
                    lambda c, row: F.element_at(row, c + F.lit(1)),
                ),
                F.lit(0).cast(_ADC_DECIMAL),
                lambda acc, x: acc + x,
            ).alias("_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("_dist").cast("double").alias("adc_dist"),
            F.col("rn").cast("int").alias("rn"),
        )
    )
