"""Hand-computed cases for the exact-substring removal transform
(functions/dedup.py: span_dedup_stats — Lee et al. 2022 semantics):
overlapping duplicate spans must MERGE (a run of k consecutive
duplicated 8-grams costs k+7 tokens, not 8k), disjoint duplicate
regions must count as separate islands, and short docs pass through
untouched."""

from __future__ import annotations

from weather_data_data_pipeline_spark.functions.dedup import span_dedup_stats


def _stats(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = span_dedup_stats(df, "doc_id", "text", n=8, min_count=2)
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_tokens"],
            r["kept_tokens"],
            r["n_islands"],
        )
        for r in out.collect()
    }


def test_single_shared_prefix(spark):
    # docs 1 and 2 share exactly one 8-gram (their common prefix); the
    # suffix grams differ, so only the pos-0 span is duplicated.
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h x y"),
    ]
    got = _stats(spark, rows)
    assert got[1] == (10, 8, 2, 1)
    assert got[2] == (10, 8, 2, 1)


def test_consecutive_spans_merge(spark):
    # identical 9-token docs: grams at pos 0 and 1 are both duplicated
    # and OVERLAP — the island costs 9 tokens (max-min+8), not 16.
    text = "p q r s t u v w x"
    got = _stats(spark, [(1, text), (2, text)])
    assert got[1] == (9, 9, 0, 1)
    assert got[2] == (9, 9, 0, 1)


def test_disjoint_islands(spark):
    # shared block A (8 tokens) + unique middle (8 tokens) + shared
    # block C (8 tokens): duplicate grams at pos 0 and pos 16, gap >= 8
    # -> two islands of 8 tokens each, the unique middle survives.
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    c = "c1 c2 c3 c4 c5 c6 c7 c8"
    rows = [
        (1, f"{a} u1 u2 u3 u4 u5 u6 u7 u8 {c}"),
        (2, f"{a} v1 v2 v3 v4 v5 v6 v7 v8 {c}"),
    ]
    got = _stats(spark, rows)
    assert got[1] == (24, 16, 8, 2)
    assert got[2] == (24, 16, 8, 2)


def test_short_and_unique_docs_untouched(spark):
    rows = [
        (1, "too short"),  # < 8 tokens: no grams at all
        (2, "q w e r t y u i o"),  # >= 8 tokens but all grams unique
    ]
    got = _stats(spark, rows)
    assert got[1] == (2, 0, 2, 0)
    assert got[2] == (9, 0, 9, 0)


def test_intra_doc_repeat_counts(spark):
    # min_count counts TOTAL corpus occurrences, including repeats
    # inside one document: a doc that repeats its own 8-gram twice with
    # an 8-token gap is self-duplicated even with no second doc.
    a = "r1 r2 r3 r4 r5 r6 r7 r8"
    got = _stats(spark, [(1, f"{a} m1 m2 m3 m4 m5 m6 m7 m8 {a}")])
    assert got[1] == (24, 16, 8, 2)
