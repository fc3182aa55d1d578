"""Planted-truth cases for INTRA-document exact-substring removal
(functions/dedup.py: self_span_removal / self_span_clean — Lee et al.
2022 suffix-array semantics applied within one document, VERDICT r14
ask #3): a ≥min_tokens substring repeated at two offsets keeps its
EARLIEST occurrence, later occurrences are cut, threshold boundaries
are exact, and periodic (overlapping-diagonal) repeats merge into one
island. Cross-checked against an independent O(n·d) pure-Python
diagonal-scan reference."""

from __future__ import annotations

from weather_data_data_pipeline_spark.functions.dedup import (
    self_span_clean,
    self_span_removal,
)

A12 = " ".join(f"a{i}" for i in range(12))
B11 = " ".join(f"b{i}" for i in range(11))
C10 = " ".join(f"c{i}" for i in range(10))
MID = " ".join(f"m{i}" for i in range(12))


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = self_span_removal(df, "doc_id", "text", n=8, min_tokens=12)
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["cut_tokens"],
            r["kept_tokens"],
            r["n_cut_spans"],
        )
        for r in out.collect()
    }


def test_self_repeat_threshold_and_null(spark):
    rows = [
        (1, f"{A12} {MID} {A12}"),  # 12-token repeat: exactly at threshold
        (2, f"{B11} {MID} {B11}"),  # 11-token repeat: below — keep all
        (3, f"{C10} {C10} {C10}"),  # periodic ×3: one merged cut [10,30)
        (4, " ".join(f"u{i}" for i in range(30))),  # no repeat
        (5, None),  # NULL text: NULL counts, zero cuts
    ]
    got = _stats(spark, rows)
    assert got[1] == (36, 12, 24, 1)
    assert got[2] == (34, 0, 34, 0)
    assert got[3] == (30, 20, 10, 1)
    assert got[4] == (30, 0, 30, 0)
    assert got[5] == (None, 0, None, 0)


def test_self_clean_keeps_earliest_copy(spark):
    rows = [(1, f"{A12} {MID} {A12}"), (2, f"{C10} {C10} {C10}")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in self_span_clean(
            df, "doc_id", "text", n=8, min_tokens=12
        ).collect()
    }
    assert out[1]["clean_text"] == f"{A12} {MID}"
    assert out[1]["kept_tokens"] == 24
    assert out[2]["clean_text"] == C10
    assert out[2]["kept_tokens"] == 10


def _brute_cut_islands(toks, n=8, min_tokens=12):
    """Independent reference: scan every diagonal d for maximal runs of
    positional n-gram self-matches, cut the LATER interval of every
    ≥min_tokens run, return the merged interval union."""
    T = len(toks)
    cuts = []
    for d in range(1, T):
        run, start = 0, None
        for p in range(0, T - d - n + 1):
            if toks[p : p + n] == toks[p + d : p + d + n]:
                if run == 0:
                    start = p
                run += 1
            else:
                if run and run + n - 1 >= min_tokens:
                    cuts.append((start + d, start + d + run + n - 1))
                run = 0
        if run and run + n - 1 >= min_tokens:
            cuts.append((start + d, start + d + run + n - 1))
    merged, last = [], None
    for s, e in sorted(set(cuts)):
        if last is not None and s <= last[1]:
            last = (last[0], max(last[1], e))
            merged[-1] = last
        else:
            last = (s, e)
            merged.append(last)
    return merged


def test_self_removal_matches_brute_force(spark):
    # adversarial shapes: nested periods, repeat-of-a-repeat, tail
    # repeat shorter than its head twin, and interleaved families
    docs = [
        f"{C10} {C10} {A12} {C10} {A12}",
        f"{A12} {A12} {MID} {A12}",
        f"{B11} x0 {B11} x0 {B11}",
        " ".join(f"t{i % 7}" for i in range(40)),  # period 7 < n=8
        " ".join(f"t{i % 13}" for i in range(40)),  # period 13
    ]
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["cut_tokens"], r["n_cut_spans"])
        for r in self_span_removal(
            df, "doc_id", "text", n=8, min_tokens=12
        ).collect()
    }
    for i, t in rows:
        islands = _brute_cut_islands(t.split(" "))
        want = (sum(e - s for s, e in islands), len(islands))
        assert got[i] == want, (i, got[i], want, islands)


def test_self_removal_min_tokens_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="min_tokens"):
        self_span_removal(df, "doc_id", "text", n=8, min_tokens=7).collect()
