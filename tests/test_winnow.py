"""Winnowing fingerprints (functions/winnow.py): the coverage
guarantee, selection density, rightmost-tie robustness, determinism
under repartition, and the stop-fingerprint cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from weather_data_data_pipeline_spark.functions.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
    winnow_summary,
)
from weather_data_data_pipeline_spark.sources.tables import load

K, W = 4, 4


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnowing_theorem_shared_run_shares_fingerprint(spark):
    """Any shared token run of length >= w + k - 1 must surface as a
    shared fingerprint HASH (the winnowing guarantee) — here a 12-token
    copied span inside otherwise-different documents."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = _mk(
        spark,
        [
            (1, "one two three " + shared + " four five six"),
            (2, "seven eight " + shared + " nine ten eleven twelve"),
        ],
    )
    fps = winnow_fingerprints(docs, k=K, w=W)
    h1 = {r["h"] for r in fps.where(F.col("doc_id") == 1).collect()}
    h2 = {r["h"] for r in fps.where(F.col("doc_id") == 2).collect()}
    assert h1 & h2, "copied 12-token span produced no shared fingerprint"
    pairs = winnow_overlap_pairs(docs, k=K, w=W, min_shared=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_every_window_is_covered_and_density_bounded(spark):
    """Per document: at least one selected position in EVERY window of
    w consecutive grams (coverage), and the fingerprint count is
    bounded by the window count (<= G - w + 1 distinct selections)."""
    docs = load(spark, SF_DIR, "documents").limit(50)
    fps = winnow_fingerprints(docs, k=K, w=W)
    summ = {
        r["doc_id"]: (r["n_grams"], r["n_fingerprints"])
        for r in winnow_summary(docs, k=K, w=W).collect()
    }
    by_doc: dict[int, list[int]] = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    for doc_id, (g, nf) in summ.items():
        pos = sorted(by_doc[doc_id])
        assert nf == len(pos)
        n_windows = max(g - W, 0) + 1
        assert nf <= n_windows
        # coverage: consecutive selected positions at most w apart, and
        # the first/last windows are covered
        assert pos[0] <= W - 1 and pos[-1] >= g - W
        assert all(b - a <= W for a, b in zip(pos, pos[1:]))


def test_rightmost_tie_rule(spark):
    """A document whose grams all hash equal (one repeated token) must
    select the RIGHTMOST position of each window — i.e. positions
    w-1, ..., G-1 plus nothing earlier."""
    docs = _mk(spark, [(1, " ".join(["tok"] * 12))])  # 9 grams, all equal
    pos = sorted(
        r["pos"] for r in winnow_fingerprints(docs, k=K, w=W).collect()
    )
    g = 12 - K + 1
    assert pos == list(range(W - 1, g)), pos


def test_deterministic_under_repartition(spark):
    docs = load(spark, SF_DIR, "documents").limit(40)
    a = sorted(map(tuple, winnow_fingerprints(docs, k=K, w=W).collect()))
    b = sorted(
        map(
            tuple,
            winnow_fingerprints(docs.repartition(7), k=K, w=W).collect(),
        )
    )
    assert a == b


def test_stop_fingerprint_cap_bounds_pairs(spark):
    """With max_postings=1 no hash can join two documents — the pair
    set must be empty regardless of real overlap; the uncapped run on
    the same corpus is non-empty (the cap is the only difference)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _mk(
        spark,
        [(i, f"doc{i} filler{i} " + shared) for i in range(1, 5)],
    )
    open_pairs = winnow_overlap_pairs(
        docs, k=K, w=W, min_shared=1, max_postings=64
    ).collect()
    assert open_pairs
    capped = winnow_overlap_pairs(
        docs, k=K, w=W, min_shared=1, max_postings=1
    ).collect()
    assert capped == []


def test_short_and_degenerate_docs(spark):
    """Documents with fewer than k tokens contribute nothing; documents
    with 1 <= G < w grams contribute exactly ONE truncated window."""
    docs = _mk(
        spark,
        [
            (1, "a b c"),              # 3 tokens < k → no grams
            (2, "a b c d e"),          # G = 2 < w → one window
            (3, None),
            (4, ""),
        ],
    )
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    assert {r["doc_id"] for r in fps} == {2}
    assert len(fps) == 1
    summ = winnow_summary(docs, k=K, w=W).collect()
    assert len(summ) == 1 and summ[0]["doc_id"] == 2
    assert summ[0]["n_grams"] == 2 and summ[0]["n_fingerprints"] == 1


def test_winnow_match_sink_equals_batch_probe(spark, tmp_path):
    """Streaming partial-copy screening against a frozen winnowing
    index == the batch probe over the union: fingerprints depend only
    on the document and the index is frozen, so micro-batch boundaries
    cannot change a match row. Also pins replay convergence: re-running
    the stream from a fresh checkpoint dynamic-overwrites the same
    partitions to the same rows."""
    from weather_data_data_pipeline_spark.functions.winnow import (
        build_winnow_index,
        winnow_probe_index,
    )
    from weather_data_data_pipeline_spark.streaming import incremental as S

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    ref = docs.where(F.col("doc_id") % 3 == 0)
    fresh = docs.where(F.col("doc_id") % 3 != 0).limit(120)
    idx = str(tmp_path / "widx")
    build_winnow_index(ref, idx, k=K, w=W, max_postings=64)

    rows = fresh.orderBy("doc_id").collect()
    half = len(rows) // 2
    src = str(tmp_path / "wm_src")
    for lo, hi in ((0, half), (half, len(rows))):
        spark.createDataFrame(rows[lo:hi], fresh.schema).coalesce(
            1
        ).write.mode("append").parquet(src)

    out = str(tmp_path / "wm_out")
    stream = (
        spark.readStream.schema(fresh.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    q = (
        S.winnow_match_sink(
            stream, idx, out, str(tmp_path / "wm_ck"),
            k=K, w=W, min_shared=1,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def key(rows_):
        return sorted((r["doc_id"], r["match_id"], r["n_shared"]) for r in rows_)

    got = key(spark.read.parquet(out).collect())
    want = key(
        winnow_probe_index(
            spark, idx, spark.createDataFrame(rows, fresh.schema),
            k=K, w=W, min_shared=1,
        ).collect()
    )
    assert got == want and len(got) > 0
    assert spark.read.parquet(out).select("batch_id").distinct().count() == 2

    # replay: a second run from a FRESH checkpoint rewrites its own
    # batch partitions and converges to the same bytes
    q2 = (
        S.winnow_match_sink(
            (
                spark.readStream.schema(fresh.schema)
                .format("parquet")
                .option("maxFilesPerTrigger", "1")
                .load(src)
            ),
            idx, out, str(tmp_path / "wm_ck2"),
            k=K, w=W, min_shared=1,
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    assert key(spark.read.parquet(out).collect()) == want


def test_winnow_probe_works_with_different_id_col_than_build(spark, tmp_path):
    """ADVICE r12: canonical (id, h) postings — a probe whose frame
    names its id column differently from the build-side frame must
    still work, and self-matches drop (same semantics as the MEM
    probe)."""
    from weather_data_data_pipeline_spark.functions.winnow import (
        build_winnow_index,
        winnow_probe_index,
    )

    shared = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu"
    )
    ref = spark.createDataFrame(
        [(10, shared + " ref tail words here"), (11, "totally other doc")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "wxcolidx")
    build_winnow_index(ref, idx, "doc_id", "text", k=K, w=W)

    probe = spark.createDataFrame(
        [
            (1, shared + " probe suffix"),
            (10, shared + " ref tail words here"),  # same id as an
            # indexed doc — its self-report row must drop
        ],
        ["item_id", "body"],
    )
    rows = winnow_probe_index(
        spark, idx, probe, "item_id", "body", k=K, w=W, min_shared=1
    ).collect()
    got = {(r["item_id"], r["match_id"]) for r in rows}
    assert (1, 10) in got
    assert (10, 10) not in got


def test_hot_set_guard_shuffle_fallback_matches_broadcast(spark):
    """VERDICT r15 #8 skew unit: the over-cap ("hot") set's broadcast
    is guarded — a STATIC broadcast hint is attached only under the
    attested-small stats posture (AQE off); in the at-scale posture
    (AQE on) the hint is absent and AQE's runtime stats decide, so an
    adversarially huge hot set can never be force-broadcast. Pins (a)
    hint presence/absence per posture in the analyzed plan and (b)
    value equality of both paths, for winnow AND dedup._pair_overlap."""
    from weather_data_data_pipeline_spark.functions import dedup

    # boilerplate in ALL docs (over-cap → hot set non-empty, gets cut);
    # `shared` only in docs 1-2 (under-cap → the surviving pair)
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    boiler = "one two three four five six seven eight"
    docs = _mk(
        spark,
        [(i, f"filler{i} {shared} {boiler}") for i in (1, 2)]
        + [(i, f"filler{i} {boiler}") for i in range(3, 7)],
    )
    def analyzed(df) -> str:
        return df._jdf.queryExecution().analyzed().toString()

    jdocs = docs.withColumnRenamed("doc_id", "id")
    aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # at-scale posture: AQE on → NO static hint, runtime stats guard
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        wdf = winnow_overlap_pairs(
            docs, k=K, w=W, min_shared=1, max_postings=3
        )
        jdf = dedup.jaccard_pairs(
            jdocs, "id", "text", n=2, threshold=0.05, max_df=3
        )
        assert "UnresolvedHint" not in analyzed(wdf)
        assert "ResolvedHint" not in analyzed(wdf)
        assert "ResolvedHint" not in analyzed(jdf)
        base = sorted(tuple(r) for r in wdf.collect())
        jp = sorted(tuple(r) for r in jdf.collect())
        # attested-small posture: AQE off → static broadcast hint
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        wdf2 = winnow_overlap_pairs(
            docs, k=K, w=W, min_shared=1, max_postings=3
        )
        jdf2 = dedup.jaccard_pairs(
            jdocs, "id", "text", n=2, threshold=0.05, max_df=3
        )
        assert "ResolvedHint" in analyzed(wdf2)
        assert "ResolvedHint" in analyzed(jdf2)
        assert base == sorted(tuple(r) for r in wdf2.collect()) and base
        assert jp == sorted(tuple(r) for r in jdf2.collect()) and jp
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe0)
