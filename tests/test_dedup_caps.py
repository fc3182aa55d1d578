"""Pathological-skew bounds for the dedup candidate generators (VERDICT
r1 "What's wrong" #2): one hot shingle shared by every document must not
re-create the quadratic all-pairs blow-up the inverted index exists to
avoid, and one degenerate LSH bucket must not emit m(m-1)/2 pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.functions.dedup import (
    connected_components,
    jaccard_pairs,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures_vectorized,
)


def test_stop_shingle_cap_bounds_hot_posting(spark):
    # Every doc opens with the same 3-gram; everything after is unique.
    hot = "alpha beta gamma"
    rows = [
        (i, f"{hot} u{i}a u{i}b u{i}c u{i}d") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # Uncapped: the single hot shingle links every pair — quadratic.
    assert jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.0).count() == 60 * 59 // 2

    # Capped: the df=60 shingle is cut, no pair shares anything else.
    assert (
        jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.0, max_df=10).count()
        == 0
    )


def test_stop_shingle_cap_keeps_exact_jaccard_on_cold_shingles(spark):
    hot = "alpha beta gamma"
    rows = [(i, f"{hot} u{i}a u{i}b u{i}c u{i}d") for i in range(60)]
    # one genuine near-dup pair sharing only cold shingles
    rows += [
        (100, "delta epsilon zeta eta theta"),
        (101, "delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard"])
        for r in jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.0, max_df=10
        ).collect()
    }
    # exact Jaccard over the capped vocabulary: docs 100/101 have 3 cold
    # shingles each, share 2 ("delta epsilon zeta", "epsilon zeta eta")
    assert out == {(100, 101): (2, 0.5)}


def test_minhash_bucket_cap_star_edges_preserve_components(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(i, text) for i in range(50)], "doc_id long, text string"
    )
    sigs = minhash_signatures_vectorized(df, "doc_id", "text").localCheckpoint(
        eager=True
    )

    # Uncapped: one degenerate bucket per band → all pairs.
    assert minhash_lsh_candidates(sigs, "doc_id").count() == 50 * 49 // 2

    # Capped: star edges to the min-id representative — linear.
    capped = minhash_lsh_candidates(sigs, "doc_id", max_bucket_size=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(0, i) for i in range(1, 50)}

    # End-to-end: verification keeps the (identical-text) star edges and
    # connected components still see ONE cluster of all 50 docs.
    pairs = minhash_dedup_pairs(df, "doc_id", "text", max_bucket_size=10)
    cc = connected_components(pairs)
    assert cc.count() == 50
    assert cc.select("cluster_id").distinct().count() == 1


def test_connected_components_driver_and_distributed_paths_equal(spark):
    """The size-adaptive CC must return IDENTICAL labels from the driver
    union-find fast path and the distributed min-label loop — including
    on chains (max diameter), cliques, and singleton-free graphs."""
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain: diameter 3
            (10, 11), (11, 12), (10, 12),    # triangle
            (20, 21),                        # single edge
            (30, 31), (32, 31), (30, 33),    # star-ish
        ],
        "id_a long, id_b long",
    )
    fast = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs, driver_max_edges=0).collect()
    }
    assert fast == dist
    assert {(1, 1), (2, 1), (3, 1), (4, 1)} <= fast  # chain collapses to min
    # empty graph: both paths yield an empty frame with the same schema
    empty = pairs.where(F.lit(False))
    assert connected_components(empty).count() == 0
    assert connected_components(empty, driver_max_edges=0).count() == 0


def test_minhash_bucket_cap_contract_nonidentical_members(spark):
    """Pin the cap's PRECISE contract (ADVICE r2): star edges preserve
    components of the CANDIDATE graph even when bucket members are not
    identical, and post-verification connectivity is approximate — a
    star member whose hub edge fails the Jaccard threshold loses the
    elided dense links."""
    from pyspark.sql import functions as F

    from weather_data_data_pipeline_spark.functions.dedup import (
        verify_jaccard_pairs,
    )

    # (a) candidate-graph preservation with NON-identical signatures:
    # fabricate signatures whose band 0 collides for docs 0,1,2 while
    # every other band is unique per doc (signature values chosen so no
    # cross-doc band hashes collide by accident).
    rows = []
    for d in range(3):
        sig = [1, 2, 3, 4] + [100 * (d + 1) + j for j in range(60)]
        rows.append((d, sig))
    sigs = spark.createDataFrame(rows, "doc_id long, signature array<long>")
    dense = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(sigs, "doc_id").collect()
    }
    assert dense == {(0, 1), (0, 2), (1, 2)}
    star = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            sigs, "doc_id", max_bucket_size=2
        ).collect()
    }
    assert star == {(0, 1), (0, 2)}  # hub = min id, (1,2) elided
    # same components: {0,1,2} connected through the hub in both graphs

    # (b) the documented post-verification caveat, by construction: hub
    # edges (0,1),(0,2) fail the threshold, the elided dense edge (1,2)
    # would have passed — so with star candidates docs 1 and 2 come out
    # DISCONNECTED where dense candidates connect them.
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "one two three four five six seven eight nine ten"),
            (2, "one two three four five six seven eight nine eleven"),
        ],
        "doc_id long, text string",
    )
    star_cand = spark.createDataFrame([(0, 1), (0, 2)], "id_a long, id_b long")
    dense_cand = star_cand.union(
        spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    )
    star_verified = verify_jaccard_pairs(
        docs, star_cand, "doc_id", "text", threshold=0.5
    )
    dense_verified = verify_jaccard_pairs(
        docs, dense_cand, "doc_id", "text", threshold=0.5
    )
    assert star_verified.count() == 0  # both hub edges fail → 1,2 split
    assert {(r["id_a"], r["id_b"]) for r in dense_verified.collect()} == {(1, 2)}


def test_incremental_near_dedup_invariants(spark):
    from weather_data_data_pipeline_spark.functions.dedup import (
        incremental_near_dedup,
        jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    kept = spark.createDataFrame(
        [(1, base), (2, "completely different text about training data pipelines at scale")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # near-dup of kept doc 1 → must be dropped
            (10, base + " today"),
            # two near-dups of each other, unseen in kept → min id kept
            (11, "distributed joins shuffle on their keys and skewed keys hurt a lot"),
            (12, "distributed joins shuffle on their keys and skewed keys hurt plenty"),
            # unique → kept
            (13, "a totally novel document with nothing in common with others"),
        ],
        "doc_id long, text string",
    )
    out = incremental_near_dedup(new, kept, "doc_id", "text", threshold=0.5)
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [11, 13]

    # invariant: the union of kept ∪ survivors has no near-dup pair
    merged = kept.union(out)
    assert jaccard_pairs(merged, "doc_id", "text", threshold=0.5).count() == 0

    # idempotency: replaying the SAME batch against the updated corpus
    # adds nothing (every doc is now a near-dup of itself in kept)
    replay = incremental_near_dedup(new, merged, "doc_id", "text", threshold=0.5)
    assert replay.count() == 0


def test_incremental_near_dedup_empty_kept_equals_batch(spark):
    from weather_data_data_pipeline_spark.functions.dedup import (
        connected_components,
        incremental_near_dedup,
        minhash_dedup_pairs,
    )
    from weather_data_data_pipeline_spark.sources.tables import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents").limit(200)
    inc = incremental_near_dedup(docs, None, "doc_id", "text", threshold=0.5)
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
    cc = connected_components(pairs)
    dropped = {r["doc_id"] for r in cc.collect() if r["doc_id"] != r["cluster_id"]}
    want = {r["doc_id"] for r in docs.collect()} - dropped
    assert {r["doc_id"] for r in inc.collect()} == want


def test_indexed_incremental_dedup_matches_recompute(spark, tmp_path):
    """The persisted-index path must make the same keep/drop decisions
    as recomputing kept-corpus signatures from text, and the buckets
    table must be laid out one directory per band (partition pruning)."""
    import os

    from weather_data_data_pipeline_spark.functions.dedup import (
        append_to_minhash_index,
        build_minhash_index,
        incremental_near_dedup,
        incremental_near_dedup_indexed,
    )
    from weather_data_data_pipeline_spark.sources.tables import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents")
    kept = docs.where("doc_id < 250")
    new = docs.where("doc_id >= 250 AND doc_id < 400")
    idx = str(tmp_path / "mh_index")
    build_minhash_index(kept, idx, "doc_id", "text")

    via_index = incremental_near_dedup_indexed(
        new, kept, idx, "doc_id", "text", threshold=0.5
    )
    recompute = incremental_near_dedup(new, kept, "doc_id", "text", threshold=0.5)
    assert sorted(r["doc_id"] for r in via_index.collect()) == sorted(
        r["doc_id"] for r in recompute.collect()
    )

    bands = [d for d in os.listdir(f"{idx}/buckets") if d.startswith("band=")]
    assert len(bands) == 16  # one directory per band → pruned probes

    # index maintenance: append the surviving batch, then replaying the
    # SAME batch against the grown index drops everything
    append_to_minhash_index(via_index, idx, "doc_id", "text")
    merged_text = kept.union(via_index.select(kept.columns))
    replay = incremental_near_dedup_indexed(
        new, merged_text, idx, "doc_id", "text", threshold=0.5
    )
    survivors_again = {r["doc_id"] for r in replay.collect()}
    assert survivors_again == set(), f"replay kept {len(survivors_again)} docs"


def test_semantic_dedup_hot_cell_cap(spark):
    """VERDICT r3 ask #4: one adversarially hot k-means cell must not turn
    a single applyInPandas task into an unbounded GEMM. Above
    ``max_cell_size`` the cell emits star edges to its min-id hub —
    O(m·d) FLOPs — and the contract mirrors the MinHash bucket cap:
    hub-similar members keep exact components, hub-DISSIMILAR members
    lose their elided dense links (the stated recall trade)."""
    from weather_data_data_pipeline_spark.functions.similarity import (
        semantic_dedup,
    )

    # ONE centroid → every vector lands in the same cell.
    cents = [[1.0, 0.0, 0.0, 0.0]]
    rows = []
    # 50 hub-similar vectors (cosine to hub ≈ 1 ≫ 0.9)
    for i in range(50):
        rows.append((i, [1.0, 0.001 * i, 0.0, 0.0]))
    # a near-dup PAIR that is dissimilar to the hub (cosine to hub = 0,
    # cosine to each other ≈ 0.9998)
    rows.append((100, [0.0, 0.0, 1.0, 0.01]))
    rows.append((101, [0.0, 0.0, 1.0, -0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # Uncapped (exact): everything pairwise — 100/101 merge.
    exact = {
        r["vec_id"]: r["rep_id"]
        for r in semantic_dedup(df, cents, threshold=0.9).collect()
    }
    assert exact[100] == 100 and exact[101] == 100
    assert all(exact[i] == 0 for i in range(50))

    # Capped: star edges only. Hub-similar members keep the SAME
    # component; the hub-dissimilar pair loses its mutual link.
    capped = {
        r["vec_id"]: (r["rep_id"], r["kept"])
        for r in semantic_dedup(
            df, cents, threshold=0.9, max_cell_size=10
        ).collect()
    }
    assert all(capped[i] == (0, i == 0) for i in range(50))
    assert capped[100] == (100, True)  # recall trade, by contract
    assert capped[101] == (101, True)
    # every input row labeled exactly once
    assert len(capped) == 52


def test_portable_minhash_bucket_cap_star_edges(spark):
    """The md5-portable family's bucket cap (added after the r4 volume
    stress) must mirror minhash_lsh_candidates' contract: identical
    docs land in one bucket per band; above the cap the bucket emits
    star edges to the min-id member, and verification (identical text
    → jaccard 1.0) keeps every hub edge, so components survive."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        connected_components,
        minhash_dedup_pairs_portable,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(i, text) for i in range(40)], "doc_id long, text string"
    )
    capped = minhash_dedup_pairs_portable(
        df, "doc_id", "text", max_bucket_size=10
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(0, i) for i in range(1, 40)}  # star edges only
    cc = connected_components(
        spark.createDataFrame(sorted(got), "id_a long, id_b long")
    )
    assert cc.select("cluster_id").distinct().count() == 1

    # uncapped (max_bucket_size=None): full clique of verified pairs
    exact = minhash_dedup_pairs_portable(
        df, "doc_id", "text", max_bucket_size=None
    )
    assert exact.count() == 40 * 39 // 2


def test_lsh_bucket_stats_detects_saturation(spark):
    """The occupancy probe behind SCALE.md's second-decade analysis: on
    a diverse corpus mean occupancy ~1; on a degenerate corpus (every
    doc identical) all banded rows land in ONE bucket per band and the
    probe reports the capped star edges the candidate stage would emit."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        lsh_bucket_stats,
        lsh_candidate_recall,
    )

    diverse = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} q{i}") for i in range(60)],
        ["doc_id", "text"],
    )
    d = lsh_bucket_stats(diverse, "doc_id", "text").collect()[0]
    assert d["banded_rows"] == 60 * 16
    assert d["mean_occupancy"] <= 1.1 and d["star_edges"] == 0

    degenerate = spark.createDataFrame(
        [(i, "a b c d e f") for i in range(60)], ["doc_id", "text"]
    )
    g = lsh_bucket_stats(degenerate, "doc_id", "text").collect()[0]
    assert g["buckets"] == 16  # one bucket per band
    assert g["max_bucket"] == 60
    assert g["dense_pairs"] == 0  # all over the cap
    assert g["star_edges"] == 16 * 59
    assert g["mean_occupancy"] == 60.0

    # the S-curve calculator matches the closed forms quoted in SCALE.md
    assert abs(lsh_candidate_recall(0.5, 32, 16) - (1 - (1 - 0.5**2) ** 16)) < 1e-12
    assert abs(lsh_candidate_recall(0.5, 32, 8) - (1 - (1 - 0.5**4) ** 8)) < 1e-12
    assert lsh_candidate_recall(1.0, 32, 8) == 1.0  # exact dups always collide


def test_band_shape_validation():
    """bands must divide num_perm with >= 1 row per band: r=0 would make
    the S-curve 1.0 everywhere and the probe hash zero columns."""
    import pytest

    from weather_data_data_pipeline_spark.functions.dedup import (
        lsh_candidate_recall,
    )

    for num_perm, bands in ((32, 10), (8, 16), (32, 0)):
        with pytest.raises(ValueError):
            lsh_candidate_recall(0.5, num_perm, bands)
    assert 0 < lsh_candidate_recall(0.5, 32, 8) < 1


def test_lsh_swap_reproduces_exact_pairs_on_corpus(spark):
    """SCALE.md's prescribed saturation remedy — swap jaccard_pairs for
    the capped LSH family — is one line BECAUSE the two agree where it
    matters: on the sf0.001 corpus both minhash families recover exactly
    the exact-Jaccard pair set at threshold 0.5 (the hash family is
    deterministic, so this is a stable pin, not a probabilistic one),
    hence identical connected components and identical kept corpora."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        connected_components,
        minhash_dedup_pairs_portable,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    exact_set = {tuple(r) for r in exact.select("id_a", "id_b").collect()}
    for fn in (minhash_dedup_pairs, minhash_dedup_pairs_portable):
        lsh = fn(docs, "doc_id", "text", n=3, threshold=0.5)
        lsh_set = {tuple(r) for r in lsh.select("id_a", "id_b").collect()}
        assert lsh_set == exact_set
        reps_exact = {
            tuple(r) for r in connected_components(exact).collect()
        }
        reps_lsh = {tuple(r) for r in connected_components(lsh).collect()}
        assert reps_exact == reps_lsh
