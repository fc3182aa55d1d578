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

Physical shapes:

- encode / LUT build: the per-row math is m × k_cw small GEMM-like
  kernels — exactly the workload the repo's similarity GEMMs run as
  vectorized Arrow-batched numpy (``mapInPandas``), and for the same
  reason: expanding m·k_cw·d_sub distance terms as literal Catalyst
  expressions was measured to blow the whole-stage-codegen 64 KB
  method limit and fall back to per-row interpretation (6× slower than
  the numpy kernel at sf0.1). FAISS makes the same call (BLAS kernels,
  not scalar code).
- ADC scoring + ranking: relational — broadcast the (tiny) per-query
  LUTs, fold each candidate's m codes with an explicit chain of
  ``element_at`` adds (small, codegen-friendly), rank per query.

Determinism contract: every distance is accumulated in a PINNED
sequential order (t₁+t₂+…+t_d for subspace distances, lut₁+…+lut_m for
ADC) in float64 — the same left fold DuckDB's ``list_sum`` and Spark's
``aggregate`` produce — so engines agree on every double, ranking ties
break on ids, and the whole pipeline (encode → LUT → ADC → top-k)
replays in the DuckDB oracle when the codebook is fixed.
``ann_pq_topk_seeded`` feeds the subvectors of the 16 lowest-id
embeddings verbatim (the same seed-centroid trick as
ann_ivf_topk_seeded); a Lloyd-trained codebook
(functions/clustering.py per subspace) drops in unchanged for the
production path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def _subspace_sqdists(X, codebooks):
    """(B, m, k_cw) float64 squared L2 distances from each row's
    subvectors to every codeword, accumulated dimension-by-dimension in
    a PINNED sequential order (t₁+t₂+…): each step is one vectorized
    float64 op across the batch, so the kernel is numpy-fast yet
    bit-identical to a scalar left fold — the module's determinism
    contract."""
    import numpy as np

    m = len(codebooks)
    k_cw = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    out = np.empty((X.shape[0], m, k_cw), dtype=np.float64)
    for j in range(m):
        for c, w in enumerate(codebooks[j]):
            x = X[:, j * d_sub].astype(np.float64) - w[0]
            d = x * x
            for t in range(1, d_sub):
                x = X[:, j * d_sub + t].astype(np.float64) - w[t]
                d = d + x * x
            out[:, j, c] = d
    return out


def _vec_matrix(series):
    import numpy as np

    return np.array(
        [np.asarray(v, dtype=np.float32) for v in series], dtype=np.float32
    )


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """(id, codes) — codes[j] = index of the nearest codeword of
    subspace j (squared-L2; ties to the lowest index, numpy argmin's
    first-minimum rule). One Arrow-batched vectorized pass over the
    corpus; the codebook is a closure constant. Rows with NULL vectors
    are dropped (nothing to encode)."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def encode(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            X = _vec_matrix(pdf[vec_col])
            codes = _subspace_sqdists(X, codebooks).argmin(axis=2)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "codes": list(codes.astype("int32")),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} {id_type}, codes array<int>"
    )


def pq_query_luts(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """(query_id, lut) — the flattened m·k_cw asymmetric-distance
    lookup table per query: lut[j·k_cw + c] = sqdist(q_subⱼ,
    codeword_jc), same pinned-order kernel as the encoder."""
    import pandas as pd

    m = len(codebooks)
    k_cw = len(codebooks[0])
    id_type = queries.schema[id_col].dataType.simpleString()

    def build(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            X = _vec_matrix(pdf[vec_col])
            luts = _subspace_sqdists(X, codebooks).reshape(-1, m * k_cw)
            yield pd.DataFrame(
                {
                    "query_id": pdf[id_col].values,
                    "lut": list(luts),
                }
            )

    return queries.select(id_col, vec_col).mapInPandas(
        build, schema=f"query_id {id_type}, lut array<double>"
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

    The per-query LUTs broadcast; each candidate costs m ``element_at``
    lookups + adds, folded in an explicit left-associated chain (small,
    codegen-friendly, pinned order). Ranking orders by the raw double
    distance with id tie-breaks; ``adc_dist`` surfaces rounded to 4 dp
    for display, like the cosine family."""
    m = len(codebooks)
    k_cw = len(codebooks[0])
    q = pq_query_luts(queries, id_col, vec_col, codebooks)
    dist = F.element_at(F.col("lut"), F.col("codes")[0] + F.lit(1))
    for j in range(1, m):
        dist = dist + F.element_at(
            F.col("lut"), F.col("codes")[j] + F.lit(j * k_cw + 1)
        )
    scored = (
        corpus_codes.select(
            F.col(id_col).alias("neighbor_id"), "codes"
        )
        .join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dist.alias("_dist"))
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
            F.round("_dist", 4).alias("adc_dist"),
            F.col("rn").cast("int").alias("rn"),
        )
    )
