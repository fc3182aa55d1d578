"""ANN quality tests: the approximate paths (IVF, OR-amplified LSH) must
recover most of the exact brute-force top-k — recall is the contract an
ANN operator is sold on, so it is regression-tested, not eyeballed."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from weather_data_data_pipeline_spark.functions.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_topk,
    lsh_near_dup_pairs,
    lsh_topk,
)
from weather_data_data_pipeline_spark.sources.tables import load


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ann_recall_vs_brute_force(spark):
    emb = load(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    exact = _pairs(brute_force_topk(emb, q, k=10))
    assert len(exact) == 100  # 10 queries × k=10

    ivf = _pairs(ivf_topk(emb, q, k=10, n_centroids=16, n_probe=4))
    ivf_recall = len(exact & ivf) / len(exact)
    assert ivf_recall >= 0.7, f"IVF recall@10 collapsed: {ivf_recall}"

    lsh = _pairs(lsh_topk(emb, q, k=10))
    lsh_recall = len(exact & lsh) / len(exact)
    assert lsh_recall >= 0.6, f"LSH recall@10 collapsed: {lsh_recall}"


def test_lsh_near_dup_recall_and_no_false_positives(spark):
    emb = load(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(emb, threshold=0.35).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_dup_pairs(emb, threshold=0.35).collect()
    }
    assert lsh <= exact, "verification must kill every sub-threshold candidate"
    recall = len(exact & lsh) / max(1, len(exact))
    assert recall >= 0.8, f"LSH near-dup recall collapsed: {recall}"

    # The literal-plane variant (the registered, oracle-mirrored plan)
    # carries the same contract: subset of exact, healthy recall.
    from weather_data_data_pipeline_spark.functions.similarity import (
        seeded_sign_planes,
    )

    planes = seeded_sign_planes(n_tables=16, n_planes=4, dim=64)
    lit = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_dup_pairs(
            emb, threshold=0.35, n_planes=4, planes=planes
        ).collect()
    }
    assert lit <= exact
    lit_recall = len(exact & lit) / max(1, len(exact))
    assert lit_recall >= 0.8, f"literal-plane recall collapsed: {lit_recall}"


def test_semantic_dedup_invariants(spark):
    """SemDeDup keep-set contract: (a) every row labeled, reps are
    members of their own component; (b) NO two kept rows in the same
    cluster are near-duplicates of each other (the defining guarantee);
    (c) dropped rows really do have a kept near-dup chain (their rep is
    kept)."""
    from weather_data_data_pipeline_spark.functions.similarity import (
        cosine,
        semantic_dedup,
    )

    emb = load(spark, SF_DIR, "embeddings")
    seeds = emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
    cents = [[float(x) for x in r["embedding"]] for r in seeds]
    out = semantic_dedup(emb, cents, threshold=0.35)
    rows = out.collect()
    assert len(rows) == emb.count()  # total function: every row labeled
    kept = {r["vec_id"] for r in rows if r["kept"]}
    rep_of = {r["vec_id"]: r["rep_id"] for r in rows}
    assert any(not r["kept"] for r in rows), "corpus should have semantic dups"
    # reps are kept, and every drop points at a kept rep
    for vid, rep in rep_of.items():
        assert rep in kept
        assert rep <= vid  # min-id representative
    # no two kept rows in one cluster may be near-dups: re-score them
    kept_df = emb.join(
        out.where(F.col("kept")).select("vec_id", "cluster"), "vec_id"
    )
    a = kept_df.select(
        F.col("vec_id").alias("id_a"), F.col("cluster"), F.col("embedding").alias("va")
    )
    b = kept_df.select(
        F.col("vec_id").alias("id_b"), F.col("cluster"), F.col("embedding").alias("vb")
    )
    offenders = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosine(F.col("va"), F.col("vb")) >= 0.35)
        .count()
    )
    assert offenders == 0, f"{offenders} kept near-dup pairs survived"


def test_lsh_topk_self_equals_two_sided(spark):
    """lsh_topk_self (buckets computed once, queries filtered from the
    corpus bucket table) must return exactly what the general two-sided
    lsh_topk returns for the same planes — it is a plan optimization,
    not a semantic variant."""
    from weather_data_data_pipeline_spark.functions.similarity import (
        lsh_topk_self,
        seeded_sign_planes,
    )

    emb = load(spark, SF_DIR, "embeddings")
    planes = seeded_sign_planes(n_tables=16, n_planes=4, dim=64)
    two_sided = lsh_topk(
        emb, emb.where(F.col("vec_id") < 10), k=10, n_planes=4, planes=planes
    )
    fused = lsh_topk_self(emb, F.col("vec_id") < 10, k=10, n_planes=4, planes=planes)
    key = lambda df: sorted(
        (r["query_id"], r["rn"], r["neighbor_id"], r["cosine"])
        for r in df.collect()
    )
    assert key(two_sided) == key(fused)


def test_lsh_near_dup_chunked_verify_equals_unchunked(spark, monkeypatch):
    """The per-bucket GEMM verifier scores in O(chunk × m) row blocks so a
    degenerate bucket cannot demand an m×m matrix in one Python worker.
    Forcing a tiny chunk on real buckets must change NOTHING about the
    result — chunking is a memory shape, not a semantic."""
    import weather_data_data_pipeline_spark.functions.similarity as sim

    emb = load(spark, SF_DIR, "embeddings").limit(300)

    def run():
        return {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in lsh_near_dup_pairs(emb, threshold=0.35).collect()
        }

    baseline = run()
    assert baseline, "corpus has near-dup pairs at this threshold"
    monkeypatch.setattr(sim, "_VERIFY_CHUNK", 7)  # force many blocks per bucket
    assert run() == baseline


def test_ivf_full_probe_equals_exact(spark):
    # probing every cell degrades IVF to exact brute force — a structural
    # sanity check on the index (no candidates lost by the plumbing)
    emb = load(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    exact = _pairs(brute_force_topk(emb, q, k=5))
    full = _pairs(ivf_topk(emb, q, k=5, n_centroids=8, n_probe=8))
    assert full == exact


def test_gemm_topk_equals_jvm_topk(spark):
    """The BLAS formulation must reproduce the pure-JVM one exactly:
    same neighbors, same ranks, same rounded scores — including on
    multi-partition input where per-batch top-k pruning is active."""
    from weather_data_data_pipeline_spark.functions.similarity import (
        brute_force_topk_gemm,
    )

    emb = load(spark, SF_DIR, "embeddings").repartition(7)
    q = emb.where(F.col("vec_id") < 10)
    key = lambda df: {  # noqa: E731
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cosine"])
        for r in df.collect()
    }
    assert key(brute_force_topk_gemm(emb, q, k=10)) == key(
        brute_force_topk(emb, q, k=10)
    )


def test_int8_quantization_roundtrip_and_recall(spark):
    """int8 quantization contract: per-component error ≤ absmax/254, and
    cosine top-k on reconstructed vectors keeps ≥90% of the exact
    neighbors (the storage transform must not break retrieval)."""
    from weather_data_data_pipeline_spark.functions.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    emb = load(spark, SF_DIR, "embeddings")
    q8 = quantize_embeddings(emb)
    rec = dequantize_embeddings(
        q8.drop("embedding"), out_col="embedding"
    ).select("vec_id", "embedding", "label")

    # per-component reconstruction error bound
    err = (
        q8.select(
            "q_scale",
            F.expr(
                "aggregate(zip_with(embedding, "
                "transform(q_vec, (q, i) -> CAST(q AS DOUBLE) * q_scale / 127), "
                "(x, xr) -> abs(CAST(x AS DOUBLE) - xr)), CAST(0.0 AS DOUBLE), "
                "(acc, e) -> greatest(acc, e))"
            ).alias("max_err"),
        )
        .where(F.col("max_err") > F.col("q_scale") / 254 + 1e-9)
        .count()
    )
    assert err == 0

    q = emb.where(F.col("vec_id") < 10)
    exact = _pairs(brute_force_topk(emb, q, k=10))
    rq = rec.where(F.col("vec_id") < 10)
    approx = _pairs(brute_force_topk(rec, rq, k=10))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"int8 retrieval recall collapsed: {recall}"


def test_persisted_ivf_index_matches_fresh_ivf(spark, tmp_path):
    from weather_data_data_pipeline_spark.functions.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_from_index,
    )
    from weather_data_data_pipeline_spark.sources.tables import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.limit(30)
    path = str(tmp_path / "ivf_index")
    build_ivf_index(emb, path, n_centroids=8)
    got = sorted(
        map(tuple, ivf_topk_from_index(spark, path, queries, k=5, n_probe=3).collect())
    )
    want = sorted(
        map(tuple, ivf_topk(emb, queries, k=5, n_probe=3, n_centroids=8).collect())
    )
    assert got == want
    # Postings are laid out one directory per cell → probing prunes files.
    import os

    cells = [d for d in os.listdir(f"{path}/postings") if d.startswith("cell=")]
    assert len(cells) > 1


def test_group_mean_pairwise_cosine_matches_naive(spark):
    import itertools
    import math

    from weather_data_data_pipeline_spark.functions.similarity import (
        group_mean_pairwise_cosine,
    )

    groups = {
        "tight": [[1.0, 0.1, 0.0], [1.0, 0.0, 0.1], [0.9, 0.1, 0.05]],
        "spread": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
                   [-1.0, 0.0, 0.0]],
        "pair": [[1.0, 2.0, 3.0], [3.0, 2.0, 1.0]],
        "singleton": [[1.0, 1.0, 1.0]],
        "zeros": [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]],
    }
    rows = [(g, [float(x) for x in v]) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, embedding array<float>")
    got = {
        r.grp: (r.n_vectors, r.mean_cosine)
        for r in group_mean_pairwise_cosine(df, "grp").collect()
    }

    def naive(vs):
        us = []
        for v in vs:
            n = math.sqrt(sum(x * x for x in v))
            if n > 0:
                us.append([round(x / n, 8) for x in v])
        pairs = [
            sum(a * b for a, b in zip(u, w))
            for u, w in itertools.permutations(us, 2)
        ]
        return len(us), round(sum(pairs) / len(pairs), 6)

    # singleton dropped (undefined); zeros group loses its zero vector
    # and drops below 2 usable vectors → also absent
    assert set(got) == {"tight", "spread", "pair"}
    for g in got:
        n, want = naive(groups[g])
        assert got[g][0] == n
        assert abs(got[g][1] - want) < 2e-6, (g, got[g], want)
    assert got["tight"][1] > 0.9 and got["spread"][1] < 0


def test_nearest_in_set_zero_norm_vectors_are_inert(spark):
    """ADVICE r7: a zero-norm vector must not poison the GEMM — a zero
    CORPUS vector scores cosine 0 against everything (not NaN), and a
    zero REFERENCE vector never wins an argmax over any ref with a
    positive cosine (np.argmax would otherwise return the NaN index)."""
    from weather_data_data_pipeline_spark.functions.similarity import (
        nearest_in_set,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 0.0]),  # zero-norm corpus vector
        ],
        "vec_id long, embedding array<double>",
    )
    ref = spark.createDataFrame(
        [
            (10, [0.0, 0.0]),  # zero-norm reference vector
            (11, [1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["nearest_id"], r["cosine_raw"])
        for r in nearest_in_set(corpus, ref).collect()
    }
    # corpus 1 aligns with ref 11 (cos 1.0); the zero ref scores 0 and
    # loses; the zero corpus vector scores 0 everywhere and ties break
    # to the LOWEST ref id
    assert got[1] == (11, 1.0)
    assert got[2] == (10, 0.0)
    assert all(v[1] == v[1] for v in got.values())  # no NaNs


def test_nearest_in_set_non_bigint_ids(spark):
    """ADVICE r7: id dtypes follow each side's own schema — int corpus
    ids and string reference ids must round-trip untouched (the old
    int64-hardcoded ref path would crash or corrupt either)."""
    from weather_data_data_pipeline_spark.functions.similarity import (
        nearest_in_set,
    )

    corpus = spark.createDataFrame(
        [(7, [1.0, 0.0]), (8, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    ref = spark.createDataFrame(
        [(100, [1.0, 0.0]), (200, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    out = nearest_in_set(corpus, ref)
    assert out.schema["vec_id"].dataType.simpleString() == "int"
    assert out.schema["nearest_id"].dataType.simpleString() == "int"
    got = {r["vec_id"]: r["nearest_id"] for r in out.collect()}
    assert got == {7: 100, 8: 200}


def test_lsh_topk_fused_equals_two_sided(spark):
    """lsh_topk_fused (single mapInPandas pass: bucket GEMM + collision
    mask + cosine re-rank) must return exactly what the general
    two-sided lsh_topk returns for the same planes — a plan fusion,
    not a semantic variant (r10, VERDICT r9 ask #3)."""
    from weather_data_data_pipeline_spark.functions.similarity import (
        lsh_topk_fused,
        seeded_sign_planes,
    )

    emb = load(spark, SF_DIR, "embeddings")
    planes = seeded_sign_planes(n_tables=16, n_planes=4, dim=64)
    two_sided = lsh_topk(
        emb, emb.where(F.col("vec_id") < 10), k=10, n_planes=4, planes=planes
    )
    fused = lsh_topk_fused(
        emb, emb.where(F.col("vec_id") < 10), k=10, n_planes=4, planes=planes
    )
    key = lambda df: sorted(
        (r["query_id"], r["rn"], r["neighbor_id"], r["cosine"])
        for r in df.collect()
    )
    assert key(two_sided) == key(fused)


def test_lsh_recall_report_fused_equals_composition(spark):
    """The fused recall report (truth and approx ranked from ONE corpus
    GEMM pass) must equal the separate brute_force_topk_gemm + lsh_topk
    composition value-for-value."""
    from weather_data_data_pipeline_spark.functions.similarity import (
        brute_force_topk_gemm,
        lsh_recall_report_fused,
        seeded_sign_planes,
    )

    emb = load(spark, SF_DIR, "embeddings")
    planes = seeded_sign_planes(n_tables=16, n_planes=4, dim=64)
    fused = {
        r["query_id"]: (r["n_true"], r["n_hit"], r["recall"])
        for r in lsh_recall_report_fused(
            emb, emb.where(F.col("vec_id") < 10), k=10, n_planes=4,
            planes=planes,
        ).collect()
    }
    truth = brute_force_topk_gemm(
        emb, emb.where(F.col("vec_id") < 10), k=10
    ).select("query_id", "neighbor_id")
    approx = lsh_topk(
        emb, emb.where(F.col("vec_id") < 10), k=10, n_planes=4,
        planes=planes,
    ).select("query_id", F.col("neighbor_id").alias("a_neighbor"))
    joined = (
        truth.join(
            approx,
            (truth["query_id"] == approx["query_id"])
            & (truth["neighbor_id"] == approx["a_neighbor"]),
            "left",
        )
        .groupBy(truth["query_id"])
        .agg(
            F.count("*").alias("n_true"),
            F.count("a_neighbor").alias("n_hit"),
            F.round(
                F.count("a_neighbor") / F.count("*").cast("double"), 4
            ).alias("recall"),
        )
    )
    want = {
        r["query_id"]: (r["n_true"], r["n_hit"], r["recall"])
        for r in joined.collect()
    }
    assert fused == want


def test_semantic_dedup_fused_equals_unfused_both_branches(spark):
    """semantic_dedup_fused (cell-local union-find inside the scoring
    task) must equal semantic_dedup row-for-row — SemDeDup edges never
    leave a cell, so the fusion is a plan change, not a semantic one.
    Checked on BOTH branches: exact dense enumeration (no cap) and the
    hot-cell star-edge path (cap far below the cell sizes)."""
    from weather_data_data_pipeline_spark.functions.similarity import (
        semantic_dedup,
        semantic_dedup_fused,
    )

    emb = load(spark, SF_DIR, "embeddings")
    seeds = emb.orderBy("vec_id").limit(8).collect()
    cents = [[float(x) for x in r["embedding"]] for r in seeds]
    for cap in (None, 10):
        key = lambda df: sorted(
            (r["vec_id"], r["cluster"], r["rep_id"], r["kept"])
            for r in df.collect()
        )
        assert key(
            semantic_dedup_fused(emb, cents, threshold=0.35, max_cell_size=cap)
        ) == key(
            semantic_dedup(emb, cents, threshold=0.35, max_cell_size=cap)
        ), f"cap={cap}"


def test_query_broadcast_hint_sentinel_skips_probe(spark):
    """ADVICE r11 #3 + ADVICE r12: FORCE_BROADCAST (None) forces
    broadcast WITHOUT the eager limit+count probe job; 0 still opts
    out to the shuffle plan; negative thresholds raise instead of
    silently inverting the pre-r12 opt-out meaning of -1."""
    from unittest.mock import patch

    import pytest
    from pyspark.sql import functions as F

    from weather_data_data_pipeline_spark.functions import similarity as S

    df = spark.range(5)
    with patch.object(df.__class__, "count", side_effect=AssertionError(
        "sentinel must not run a count job"
    )):
        assert S._query_broadcast_hint(df, S.FORCE_BROADCAST) is F.broadcast
        assert S._query_broadcast_hint(df, None) is F.broadcast
        ident = S._query_broadcast_hint(df, 0)
        with pytest.raises(ValueError, match="broadcast_threshold"):
            S._query_broadcast_hint(df, -1)
    out = ident(df)
    assert out is df  # identity, no broadcast hint
