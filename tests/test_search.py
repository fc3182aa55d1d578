"""Units for BM25 ranking, n-gram contamination, and PII redaction."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.functions.search import (
    bm25_scores,
    bm25_topk,
    ngram_contamination,
)
from weather_data_data_pipeline_spark.functions.text import (
    PII_PATTERNS,
    match_count,
    redact,
)


def _bm25_ref(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_hand_formula(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark join"),
            (2, "join sort merge"),
            (3, "scan filter agg window"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.score
        for r in bm25_scores(docs, "doc_id", "text", ["spark", "join"]).collect()
    }
    avgdl = (3 + 3 + 4) / 3
    exp1 = _bm25_ref(2, 1, 3, 3, avgdl) + _bm25_ref(1, 2, 3, 3, avgdl)
    exp2 = _bm25_ref(1, 2, 3, 3, avgdl)
    assert got.keys() == {1, 2}  # doc 3 matches nothing → omitted
    assert abs(got[1] - exp1) < 1e-9
    assert abs(got[2] - exp2) < 1e-9


def test_bm25_topk_deterministic_order(spark):
    docs = spark.createDataFrame(
        [(i, "spark join") for i in range(10)], ["doc_id", "text"]
    )
    rows = bm25_topk(docs, "doc_id", "text", ["spark"], k=5).collect()
    # identical scores → tie broken by ascending doc_id
    assert [r.doc_id for r in rows] == [0, 1, 2, 3, 4]


def test_contamination_fractions(spark):
    train = spark.createDataFrame(
        [(100, "a b c d e")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame(
        [
            (1, "a b c x y"),   # grams: abc, bcx, cxy → 1/3 contaminated
            (2, "a b c d e"),   # identical → 3/3
            (3, "q r s t"),     # disjoint → 0/2
            (4, "q r"),         # too short → 0 grams
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_ngrams, r.n_contaminated, r.contamination)
        for r in ngram_contamination(train, ev, "doc_id", "text", n=3).collect()
    }
    assert got[1] == (3, 1, 0.3333)
    assert got[2] == (3, 3, 1.0)
    assert got[3] == (2, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_bloom_contamination_equals_plain_and_prunes(spark):
    """ngram_contamination_bloom must return the PLAIN form's result
    exactly (no false negatives; false positives die in the semi-join)
    while its prescreen really prunes the train side before the
    distinct+join."""
    from weather_data_data_pipeline_spark.functions.bloom import (
        build_bloom,
        might_contain,
    )
    from weather_data_data_pipeline_spark.functions.search import (
        hashed_shingles,
        ngram_contamination_bloom,
        shingle_array,
    )
    from weather_data_data_pipeline_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    train = docs.where(F.col("source") != "src0")
    ev = docs.where(F.col("source") == "src0")
    plain = sorted(
        map(tuple, ngram_contamination(train, ev, "doc_id", "text", n=3).collect())
    )
    bloomed = sorted(
        map(
            tuple,
            ngram_contamination_bloom(
                train, ev, "doc_id", "text", n=3
            ).collect(),
        )
    )
    assert bloomed == plain
    # the prescreen itself: with a SMALL eval set the surviving train
    # gram fraction must be well under 1 (here the corpus vocabulary is
    # closed, so overlap is high — use a synthetic disjoint train side
    # to see real pruning)
    t2 = spark.createDataFrame(
        [(i, f"u{i} v{i} w{i} x{i} y{i}") for i in range(200)],
        ["doc_id", "text"],
    )
    ev2 = spark.createDataFrame([(900, "u1 v1 w1 x1 y1")], ["doc_id", "text"])
    ev_h = hashed_shingles(ev2, "doc_id", "text", 3).select("h").dropDuplicates()
    words = build_bloom(ev_h, "h")
    survivors = (
        t2.select(F.explode(shingle_array("text", 3)).alias("g"))
        .select(F.xxhash64("g").alias("h"))
        .where(might_contain(words, F.col("h")))
        .count()
    )
    total = t2.select(F.explode(shingle_array("text", 3))).count()
    assert survivors < total * 0.2  # ≥80% of train grams never shuffle
    # and equality holds on the disjoint-ish fixture too
    assert sorted(
        map(tuple, ngram_contamination_bloom(t2, ev2, "doc_id", "text", 3).collect())
    ) == sorted(
        map(tuple, ngram_contamination(t2, ev2, "doc_id", "text", 3).collect())
    )


def test_redact_and_match_count(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org today"),
            (2, "ssn 123-45-6789 and pin 0042"),
            (3, "clean text only"),
        ],
        ["id", "s"],
    )
    pats = [PII_PATTERNS["email"], PII_PATTERNS["ssn"], PII_PATTERNS["number"]]
    rows = {
        r.id: (r.red, r.n_num)
        for r in df.select(
            "id",
            redact("s", pats, "[X]").alias("red"),
            match_count("s", PII_PATTERNS["number"]).alias("n_num"),
        ).collect()
    }
    assert rows[1] == ("mail me at [X] today", 0)
    # SSN redacted as a unit (most-specific first), pin as a digit run
    assert rows[2] == ("ssn [X] and pin [X]", 4)
    assert rows[3] == ("clean text only", 0)


def test_rrf_fuse_hand_computed(spark):
    from weather_data_data_pipeline_spark.functions.search import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], ["doc_id", "rank"]
    )
    dense = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], ["doc_id", "rank"]
    )
    rows = rrf_fuse([lex, dense], "doc_id", k_rrf=60, topk=10).collect()
    got = {r.doc_id: (r.rrf_score, r.n_lists, r.best_rank) for r in rows}
    assert got == {
        10: (round(1 / 61 + 1 / 63, 6), 2, 1),
        20: (round(1 / 62 + 1 / 61, 6), 2, 1),
        30: (round(1 / 63, 6), 1, 3),
        40: (round(1 / 62, 6), 1, 2),
    }
    # fused order: docs in both lists beat single-list docs; ties on the
    # rounded score break by id asc
    assert [r.doc_id for r in rows] == [20, 10, 40, 30]


def test_rrf_fuse_topk_truncates_deterministically(spark):
    from weather_data_data_pipeline_spark.functions.search import rrf_fuse

    # every doc has the same single-list rank → identical scores; the
    # topk cut must be id-ascending, not partition-order luck
    ranks = spark.createDataFrame(
        [(i, 1) for i in range(9, -1, -1)], ["doc_id", "rank"]
    )
    rows = rrf_fuse([ranks], "doc_id", k_rrf=60, topk=4).collect()
    assert [r.doc_id for r in rows] == [0, 1, 2, 3]


def test_bm25_empty_query_returns_no_rows(spark):
    """An empty (or all-duplicate-collapsed-to-empty) term bag matches
    no document — the expression form must degrade like the explode
    form did instead of indexing a nonexistent first term."""
    from weather_data_data_pipeline_spark.functions.search import (
        bm25_scores,
    )

    docs = spark.createDataFrame(
        [(1, "spark join stream")], "doc_id long, text string"
    )
    assert bm25_scores(docs, "doc_id", "text", []).collect() == []


def test_prescreen_contamination_equals_plain(spark):
    """ngram_contamination_prescreen (the r14 batch replan) must return
    the PLAIN form's result exactly: the broadcast left-semi prescreen
    is EXACT, so it admits precisely the overlapping train grams and
    the output is provably identical — on the closed-vocabulary corpus
    (high overlap) AND on a mostly-disjoint synthetic train side."""
    from weather_data_data_pipeline_spark.functions.search import (
        ngram_contamination_prescreen,
    )
    from weather_data_data_pipeline_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    train = docs.where(F.col("source") != "src0")
    ev = docs.where(F.col("source") == "src0")
    plain = sorted(
        map(tuple, ngram_contamination(train, ev, "doc_id", "text", n=3).collect())
    )
    pre = sorted(
        map(
            tuple,
            ngram_contamination_prescreen(
                train, ev, "doc_id", "text", n=3
            ).collect(),
        )
    )
    assert pre == plain
    t2 = spark.createDataFrame(
        [(i, f"u{i} v{i} w{i} x{i} y{i}") for i in range(200)],
        ["doc_id", "text"],
    )
    ev2 = spark.createDataFrame(
        [(900, "u1 v1 w1 x1 y1"), (901, "only novel grams here now")],
        ["doc_id", "text"],
    )
    assert sorted(
        map(
            tuple,
            ngram_contamination_prescreen(
                t2, ev2, "doc_id", "text", n=3
            ).collect(),
        )
    ) == sorted(
        map(tuple, ngram_contamination(t2, ev2, "doc_id", "text", n=3).collect())
    )
