"""Product quantization (functions/pq.py): codebook splitting, encode
tie-breaks, ADC exactness/determinism, and recall sanity against the
brute-force oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.functions.pq import (
    pq_adc_topk,
    pq_encode,
    split_codebooks,
)


def test_split_codebooks_shapes_and_validation():
    seeds = [[float(i * 10 + d) for d in range(8)] for i in range(4)]
    cbs = split_codebooks(seeds, m=2)
    assert len(cbs) == 2 and len(cbs[0]) == 4 and len(cbs[0][0]) == 4
    assert cbs[1][2] == [24.0, 25.0, 26.0, 27.0]
    with pytest.raises(ValueError):
        split_codebooks(seeds, m=3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        split_codebooks([], m=2)


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_encode_picks_nearest_codeword_lowest_index_ties(spark):
    # codebook per subspace: [0,0] and [1,1]; vector [0.4,0.4, 1.0,1.0]
    # → sub0 nearer [0,0] (code 0), sub1 nearer [1,1] (code 1);
    # [0.5,0.5,...] is EQUIDISTANT → tie must break to code 0
    cbs = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]
    df = _vecs(
        spark,
        [(1, [0.4, 0.4, 1.0, 1.0]), (2, [0.5, 0.5, 0.5, 0.5])],
    )
    codes = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(df, "vec_id", "embedding", cbs).collect()
    }
    assert codes[1] == [0, 1]
    assert codes[2] == [0, 0]


def test_adc_equals_hand_computed_lut_sum(spark):
    cbs = [[[0.0, 0.0], [2.0, 2.0]], [[1.0, 0.0], [0.0, 3.0]]]
    corpus = _vecs(spark, [(7, [2.0, 2.0, 0.0, 3.0])])
    queries = _vecs(spark, [(9, [1.0, 1.0, 1.0, 1.0])])
    codes = pq_encode(corpus, "vec_id", "embedding", cbs)
    out = pq_adc_topk(codes, queries, cbs, k=5).collect()
    assert len(out) == 1
    r = out[0]
    # doc 7 encodes to codes [1, 1]; LUT for q: sub0 vs [2,2] = 1+1=2,
    # sub1 vs [0,3] = 1+4=5 → adc = 7.0
    assert (r["query_id"], r["neighbor_id"], r["rn"]) == (9, 7, 1)
    assert math.isclose(r["adc_dist"], 7.0)


def test_adc_ranking_deterministic_under_repartition(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)
    ]
    df = _vecs(spark, rows)
    cbs = split_codebooks([r[1] for r in rows[:8]], m=4)
    codes = pq_encode(df, "vec_id", "embedding", cbs)
    q = df.where(F.col("vec_id") < 3)
    a = sorted(map(tuple, pq_adc_topk(codes, q, cbs, k=5).collect()))
    b = sorted(
        map(
            tuple,
            pq_adc_topk(
                pq_encode(
                    df.repartition(13), "vec_id", "embedding", cbs
                ),
                q,
                cbs,
                k=5,
            ).collect(),
        )
    )
    assert a == b


def test_pq_recall_beats_random_on_clustered_data(spark):
    """Vectors come in 8 tight clusters; PQ with the cluster centers as
    seeds must put same-cluster neighbors in the top-k far more often
    than chance."""
    import random

    rng = random.Random(11)
    centers = [[rng.uniform(-5, 5) for _ in range(16)] for _ in range(8)]
    rows = []
    for i in range(160):
        c = centers[i % 8]
        rows.append(
            (i, [x + rng.uniform(-0.05, 0.05) for x in c])
        )
    df = _vecs(spark, rows)
    cbs = split_codebooks(centers, m=4)
    codes = pq_encode(df, "vec_id", "embedding", cbs)
    q = df.where(F.col("vec_id") < 8)  # one query per cluster
    top = pq_adc_topk(codes, q, cbs, k=10).collect()
    same_cluster = sum(
        1 for r in top if r["neighbor_id"] % 8 == r["query_id"] % 8
    )
    # 10 neighbors × 8 queries; chance level would be ~1/8 of 80 = 10
    assert same_cluster >= 70
