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


# --- property: distributed result == pure-Python reference ------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

# tiny alphabet + short docs maximize collisions (duplicated spans,
# self-overlaps, whole-doc dups) in few examples; n=3 keeps grams per
# doc meaningful at these lengths
_DOC = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


def _python_reference(texts, n=3, min_count=2):
    from collections import Counter

    grams = Counter()
    positional = []
    for text in texts:
        toks = text.split(" ")
        pos = []
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            grams[g] += 1
            pos.append((i, g))
        positional.append((toks, pos))
    out = []
    for doc_id, (toks, pos) in enumerate(positional):
        dup = sorted(i for i, g in pos if grams[g] >= min_count)
        islands = 0
        covered = 0
        prev_end = None
        for i in dup:
            if prev_end is None or i >= prev_end:
                islands += 1
                covered += n
            else:
                covered += i + n - prev_end
            prev_end = max(prev_end or 0, i + n)
        out.append((doc_id, len(toks), covered, len(toks) - covered, islands))
    return out


@_SETTINGS
@given(corpus=_CORPUS)
def test_matches_python_reference(spark, corpus):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_tokens"],
            r["kept_tokens"],
            r["n_islands"],
        )
        for r in span_dedup_stats(df, "doc_id", "text", n=3).collect()
    }
    for doc_id, n_tokens, dup, kept, islands in _python_reference(corpus):
        assert got[doc_id] == (n_tokens, dup, kept, islands), (
            f"doc {doc_id} {corpus[doc_id]!r}: "
            f"spark={got[doc_id]} python={(n_tokens, dup, kept, islands)}"
        )


# --- applied form: clean_text reconstruction ---------------------------

from weather_data_data_pipeline_spark.functions.dedup import span_dedup_clean


def _clean(spark, rows, n=8):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["kept_tokens"])
        for r in span_dedup_clean(df, "doc_id", "text", n=n).collect()
    }


def test_clean_removes_shared_prefix_keeps_rest(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h x y"),
    ]
    got = _clean(spark, rows)
    assert got[1] == ("i j", 10, 2)
    assert got[2] == ("x y", 10, 2)


def test_clean_disjoint_islands_keep_middle(spark):
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    c = "c1 c2 c3 c4 c5 c6 c7 c8"
    mid = "u1 u2 u3 u4 u5 u6 u7 u8"
    got = _clean(spark, [(1, f"{a} {mid} {c}"), (2, f"{a} v1 v2 v3 v4 v5 v6 v7 v8 {c}")])
    assert got[1] == (mid, 24, 8)


def test_clean_untouched_docs_pass_through_verbatim(spark):
    rows = [(1, "too short"), (2, "q w e r t y u i o")]
    got = _clean(spark, rows)
    assert got[1] == ("too short", 2, 2)
    assert got[2] == ("q w e r t y u i o", 9, 9)


def test_clean_kept_tokens_agree_with_stats(spark):
    """clean and stats are two projections of the same removal: the
    reconstructed text's token count must equal stats' kept_tokens on
    every document of a random-ish corpus."""
    rows = [
        (i, " ".join("abc"[(i * 7 + j) % 3] for j in range(4 + (i % 9))))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    stats = {
        r["doc_id"]: r["kept_tokens"]
        for r in span_dedup_stats(df, "doc_id", "text", n=3).collect()
    }
    clean = {
        r["doc_id"]: r["kept_tokens"]
        for r in span_dedup_clean(df, "doc_id", "text", n=3).collect()
    }
    assert stats == clean


def test_clean_preserves_null_text(spark):
    """NULL text must stay NULL — concat_ws would fold it to \"\",
    indistinguishable from a fully-deduplicated document."""
    df = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["clean_text"]
           for r in span_dedup_clean(df, "doc_id", "text", n=3).collect()}
    assert got[1] is None
    assert got[2] == "a b c"


def test_decontamination_clean_removes_eval_spans(spark):
    """Tokens covered by an n-gram occurring anywhere in the eval set
    are cut and the document reassembled; clean docs pass untouched;
    overlapping contaminated grams merge into one island (a run of k
    consecutive flagged n-grams costs k + n - 1 tokens, not k*n)."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        decontamination_clean,
    )

    ev = spark.createDataFrame(
        [(100, "e1 e2 e3 e4 extra tail"), (101, None)],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains eval 3-grams "e1 e2 e3" and "e2 e3 e4" (overlap →
            # ONE island covering e1..e4)
            (1, "a b e1 e2 e3 e4 c d"),
            (2, "clean doc with no overlap at all"),
            (3, "x y"),  # shorter than n: passes through
            (4, None),  # NULL stays NULL
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["kept_tokens"])
        for r in decontamination_clean(
            train, ev, "doc_id", "text", n=3
        ).collect()
    }
    assert got[1] == ("a b c d", 8, 4)
    assert got[2] == ("clean doc with no overlap at all", 7, 7)
    assert got[3] == ("x y", 2, 2)
    assert got[4][0] is None


def test_decontamination_clean_idempotent(spark):
    """Cleaning an already-clean corpus is a no-op. (One pass is NOT
    always enough in general — stitching a cut can create a new eval
    gram across the boundary, see the fixpoint property test — but for
    this input the single pass reaches the fixpoint, and re-cleaning
    that fixpoint must change nothing.)"""
    from weather_data_data_pipeline_spark.functions.dedup import (
        decontamination_clean,
    )

    ev = spark.createDataFrame(
        [(100, "p q r s")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(1, "a p q r s b"), (2, "m n o")], "doc_id long, text string"
    )
    once = decontamination_clean(
        train, ev, "doc_id", "text", n=3
    ).selectExpr("doc_id", "clean_text AS text")
    twice = {
        r["doc_id"]: r["clean_text"]
        for r in decontamination_clean(
            once, ev, "doc_id", "text", n=3
        ).collect()
    }
    assert twice == {
        r["doc_id"]: r["clean_text"] for r in
        decontamination_clean(train, ev, "doc_id", "text", n=3).collect()
    }


def test_decontamination_clean_empty_eval(spark):
    """An empty eval set removes nothing: the auto-sized bloom is
    all-zero, so every probe is negative and every train document
    passes through byte-identical."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        decontamination_clean,
    )

    ev = spark.createDataFrame([], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["kept_tokens"])
        for r in decontamination_clean(
            train, ev, "doc_id", "text", n=3
        ).collect()
    }
    assert got[1] == ("a b c d e", 5)
    assert got[2][0] is None


def test_decontamination_clean_argument_guards(spark):
    """ADVICE r8 #4: missing eval input fails fast with the contract,
    and a filter-shape argument conflicting with a supplied eval_state
    raises instead of being silently ignored."""
    import pytest

    from weather_data_data_pipeline_spark.functions.dedup import (
        decontamination_clean,
        decontamination_eval_state,
    )

    train = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(10, "c d e")], "doc_id long, text string")

    with pytest.raises(ValueError, match="eval_df.*eval_state|eval set"):
        decontamination_clean(train, None, "doc_id", "text", n=3)

    state = decontamination_eval_state(ev, "doc_id", "text", n=3)
    # matching/omitted shape args are fine
    decontamination_clean(
        train, None, "doc_id", "text", n=3, eval_state=state
    )
    with pytest.raises(ValueError, match="num_bits"):
        decontamination_clean(
            train,
            None,
            "doc_id",
            "text",
            n=3,
            num_bits=state.num_bits * 2,
            eval_state=state,
        )
    with pytest.raises(ValueError, match="num_hashes"):
        decontamination_clean(
            train,
            None,
            "doc_id",
            "text",
            n=3,
            num_hashes=state.num_hashes + 1,
            eval_state=state,
        )


def _suffix_sort_span_stats(
    texts: dict, n: int = 8, min_count: int = 2
) -> dict:
    """Second, HASH-FREE reference for the span family (VERDICT r8 ask
    #8): sort every positional n-token window lexicographically (the
    suffix-array view truncated at depth n — two suffixes share an
    n-gram iff their first n tokens are equal, i.e. iff they are
    adjacent in this order with an equal window), mark windows whose
    equal-run length reaches min_count, then merge starts gaps-and-
    islands style with the engine's exact rule (new island iff
    pos - prev_pos >= n). Independent of the engine's xxhash64 device,
    so it also certifies collision-freeness on the tested corpus."""
    grams = []
    for did, txt in texts.items():
        t = txt.split(" ")
        for p in range(0, len(t) - n + 1):
            grams.append((tuple(t[p : p + n]), did, p))
    grams.sort(key=lambda g: g[0])
    dup_starts: dict = {}
    i = 0
    while i < len(grams):
        j = i
        while j < len(grams) and grams[j][0] == grams[i][0]:
            j += 1
        if j - i >= min_count:
            for k in range(i, j):
                dup_starts.setdefault(grams[k][1], []).append(grams[k][2])
        i = j
    out = {}
    for did, txt in texts.items():
        n_tokens = len(txt.split(" "))
        starts = sorted(dup_starts.get(did, ()))
        dup_tokens = 0
        n_islands = 0
        isl_start = prev = None
        for s in starts:
            if prev is None or s - prev >= n:
                if prev is not None:
                    dup_tokens += prev + n - isl_start
                isl_start = s
                n_islands += 1
            prev = s
        if prev is not None:
            dup_tokens += prev + n - isl_start
        out[did] = (n_tokens, dup_tokens, n_tokens - dup_tokens, n_islands)
    return out


def test_span_stats_match_suffix_sort_oracle_on_corpus(spark):
    """span_dedup_stats over the real sf0.001 corpus == the hash-free
    suffix-sort reference, doc by doc — a second oracle for the span
    family through a disjoint algorithm (lexicographic window sort vs
    xxhash64 count-join)."""
    from tests.conftest import SF_DIR
    from weather_data_data_pipeline_spark.functions.dedup import (
        span_dedup_stats,
    )
    from weather_data_data_pipeline_spark.sources.tables import load

    docs = load(spark, SF_DIR, "documents")
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    expected = _suffix_sort_span_stats(texts, n=8, min_count=2)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_tokens"],
            r["kept_tokens"],
            r["n_islands"],
        )
        for r in span_dedup_stats(docs, "doc_id", "text").collect()
    }
    assert got == expected


def test_span_stats_match_suffix_sort_oracle_adversarial(spark):
    """Pins the island-boundary rule on crafted cases: a duplicated run
    whose gap is EXACTLY n (touching intervals must count as TWO
    islands), overlapping duplicated grams, and a cross-document
    duplicate that is unique within each document."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        span_dedup_stats,
    )

    phrase = "p q r"  # 3-gram shared across docs
    rows = [
        # doc 0/1: the 3-gram 'p q r' appears once in each doc —
        # duplicated only because of the OTHER doc
        (0, "a b c " + phrase + " x y z"),
        (1, "d e f " + phrase + " u v w"),
        # doc 2: 'm m m m' twice with a gap of exactly n=3 between the
        # duplicated gram starts → two touching islands
        (2, "m m m g1x m m m g2x " + "m m m g3x m m m"),
        # doc 3: shorter than n tokens — keeps everything
        (3, "s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    texts = dict(rows)
    n = 3
    expected = _suffix_sort_span_stats(texts, n=n, min_count=2)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_tokens"],
            r["kept_tokens"],
            r["n_islands"],
        )
        for r in span_dedup_stats(df, "doc_id", "text", n=n).collect()
    }
    assert got == expected
    # the cross-doc phrase really was flagged
    assert got[0][1] >= n and got[1][1] >= n
    # the short doc kept everything
    assert got[3] == (2, 0, 2, 0)


def _mems(spark, rows, **kw):
    from weather_data_data_pipeline_spark.functions.dedup import (
        maximal_match_pairs,
    )

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = maximal_match_pairs(df, "doc_id", "text", **kw)
    return {
        (r["id_a"], r["id_b"], r["start_a"]): (
            r["start_b"],
            r["match_tokens"],
        )
        for r in out.collect()
    }


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_mem_reports_exact_offsets_and_length(spark):
    """A 15-token substring planted at different offsets in two docs
    must surface as ONE maximal diagonal run with both 0-based start
    offsets and the exact shared length — the suffix-array semantics
    (Lee et al. 2022 ExactSubstr) the ordered-gram-run formulation
    replays."""
    shared = _words("s", 15)
    rows = [
        (1, shared + " " + _words("a", 10)),          # match at offset 0
        (2, _words("b", 5) + " " + shared + " " + _words("c", 4)),
    ]
    mems = _mems(spark, rows, n=8, min_tokens=12, max_df=100)
    assert mems == {(1, 2, 0): (5, 15)}


def test_mem_threshold_and_two_runs(spark):
    """Matches shorter than min_tokens are dropped; two separate shared
    substrings between the same pair produce two MEM rows (different
    diagonals/islands), not one merged span."""
    s1 = _words("x", 12)   # exactly at the threshold
    s2 = _words("y", 11)   # one token short — must not appear
    rows = [
        (1, s1 + " " + _words("p", 9) + " " + s2),
        (2, s2 + " " + _words("q", 9) + " " + s1),
    ]
    mems = _mems(spark, rows, n=8, min_tokens=12, max_df=100)
    assert mems == {(1, 2, 0): (20, 12)}
    # lowering the threshold to 11 surfaces the second run too
    mems11 = _mems(spark, rows, n=8, min_tokens=11, max_df=100)
    assert mems11 == {(1, 2, 0): (20, 12), (1, 2, 21): (0, 11)}


def test_mem_min_tokens_validation(spark):
    import pytest

    from weather_data_data_pipeline_spark.functions.dedup import (
        maximal_match_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        maximal_match_pairs(df, "doc_id", "text", n=8, min_tokens=7)


def test_mem_probe_index_matches_planted_truth(spark, tmp_path):
    """The serving probe (frozen positional-gram index → diagonal-run
    extraction) reports the same planted substring the batch MEM form
    finds, and drops self-matches when a probe document is also in the
    index."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        build_mem_index,
        mem_probe_index,
    )

    shared = _words("s", 15)
    ref_rows = [
        (10, _words("r", 6) + " " + shared),        # shared at offset 6
        (11, _words("z", 30)),
    ]
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    idx = str(tmp_path / "memidx")
    build_mem_index(ref, idx, n=8, max_df=100)

    probe_rows = [
        (1, shared + " " + _words("a", 5)),          # shared at offset 0
        (10, ref_rows[0][1]),                        # self — must drop
    ]
    probe = spark.createDataFrame(probe_rows, ["doc_id", "text"])
    out = {
        (r["doc_id"], r["match_id"], r["start_a"]): (
            r["start_b"],
            r["match_tokens"],
        )
        for r in mem_probe_index(
            spark, idx, probe, n=8, min_tokens=12
        ).collect()
    }
    assert out == {(1, 10, 0): (6, 15)}


def test_mem_match_sink_equals_batch_probe(spark, tmp_path):
    """Streaming MEM screening against a frozen index == the batch
    probe over the union: positional grams depend only on the document
    and the index is frozen, so micro-batch boundaries cannot change a
    MEM row. Also pins the batch_id partition layout."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        build_mem_index,
        mem_probe_index,
    )
    from weather_data_data_pipeline_spark.streaming import incremental as S

    shared1 = _words("s", 14)
    shared2 = _words("t", 13)
    ref = spark.createDataFrame(
        [
            (100, _words("r", 4) + " " + shared1),
            (101, shared2 + " " + _words("q", 7)),
        ],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "msidx")
    build_mem_index(ref, idx, n=8, max_df=100)

    fresh_rows = [
        (1, shared1 + " " + _words("a", 3)),
        (2, _words("b", 9) + " " + shared2),
        (3, _words("c", 25)),                        # no match
        (4, shared2 + " " + shared1),                # matches both refs
    ]
    schema = "doc_id LONG, text STRING"
    src = str(tmp_path / "ms_src")
    for lo, hi in ((0, 2), (2, 4)):
        spark.createDataFrame(fresh_rows[lo:hi], schema).coalesce(
            1
        ).write.mode("append").parquet(src)

    out = str(tmp_path / "ms_out")
    q = (
        S.mem_match_sink(
            (
                spark.readStream.schema(schema)
                .format("parquet")
                .option("maxFilesPerTrigger", "1")
                .load(src)
            ),
            idx, out, str(tmp_path / "ms_ck"),
            n=8, min_tokens=12,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def key(rows_):
        return sorted(
            (
                r["doc_id"], r["match_id"], r["start_a"],
                r["start_b"], r["match_tokens"],
            )
            for r in rows_
        )

    got = key(spark.read.parquet(out).collect())
    want = key(
        mem_probe_index(
            spark, idx,
            spark.createDataFrame(fresh_rows, schema),
            n=8, min_tokens=12,
        ).collect()
    )
    assert got == want and len(got) >= 3
    assert spark.read.parquet(out).select("batch_id").distinct().count() == 2


def test_mem_matches_brute_force_reference(spark):
    """Randomized ground truth for the MEM formulation itself: the
    DuckDB oracle replays the SAME diagonal-run construction, so a
    formulation bug would hash-match on both engines — this pins the
    construction against an independent token-level reference (maximal
    common substrings by direct diagonal scan over the token arrays)
    on seeded random corpora from a 3-token alphabet (dense matches by
    construction). Cap set high so the stop-gram device is inert."""
    import random

    from weather_data_data_pipeline_spark.functions.dedup import (
        maximal_match_pairs,
    )

    N, MIN_TOK = 3, 4

    def brute(ta, tb):
        out = []
        for d in range(-(len(tb) - 1), len(ta)):
            i, run = max(0, d), 0
            j = i - d
            while i <= len(ta) and j <= len(tb):
                if i < len(ta) and j < len(tb) and ta[i] == tb[j]:
                    run += 1
                else:
                    if run >= MIN_TOK:
                        out.append((i - run, j - run, run))
                    run = 0
                i += 1
                j += 1
        return out

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        docs = [
            (k, " ".join(rng.choice("a b c".split()) for _ in range(rng.randint(0, 25))))
            for k in range(8)
        ]
        toks = {k: t.split(" ") if t else [] for k, t in docs}
        want = set()
        for a in range(8):
            for b in range(a + 1, 8):
                for sa, sb, m in brute(toks[a], toks[b]):
                    want.add((a, b, sa, sb, m))
        got = {
            (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["match_tokens"])
            for r in maximal_match_pairs(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                "doc_id", "text", n=N, min_tokens=MIN_TOK, max_df=10**6,
            ).collect()
        }
        assert got == want, f"seed {seed}: {got ^ want}"


def test_mem_span_removal_planted_truth(spark):
    """Planted-span ground truth for the ExactSubstr removal policy
    (keep one copy — the lower id — cut the higher): identical docs
    lose everything on the higher-id side, OVERLAPPING cut intervals
    from different partners merge into one contiguous island, disjoint
    shared spans count as separate cut spans, and documents never
    named as id_b keep everything."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        mem_span_removal,
    )

    u = [f"u{i}" for i in range(25)]
    v = [f"v{i}" for i in range(15)]
    rows = [
        (1, " ".join(u[0:15])),                  # keeps (lowest id with u)
        (2, " ".join(u[8:23])),                  # keeps (id_a vs doc 5/8)
        (3, " ".join(u[0:15])),                  # identical to 1 → fully cut
        (4, " ".join(v)),                        # keeps (id_a vs doc 8)
        # overlap-merge target: [0,15) via docs 1/3, [8,23) via doc 2
        # → one island [0,23)
        (5, " ".join(u[0:25])),
        # two DISJOINT cut spans: u[0:15) at offset 0 (via 1/3/5) and
        # v at offset 20 (via 4) — the m-filler breaks adjacency
        (8, " ".join(u[0:15]) + " " + _words("m", 5) + " " + " ".join(v)),
        (9, _words("z", 20)),                    # no partner at all
    ]
    out = {
        r["doc_id"]: (
            r["n_tokens"],
            r["cut_tokens"],
            r["kept_tokens"],
            r["cut_frac"],
            r["n_cut_spans"],
        )
        for r in mem_span_removal(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            "doc_id", "text", n=8, min_tokens=12, max_df=100,
        ).collect()
    }
    assert out[1] == (15, 0, 15, 0.0, 0)
    assert out[2] == (15, 0, 15, 0.0, 0)
    assert out[3] == (15, 15, 0, 1.0, 1)
    assert out[5] == (25, 23, 2, 0.92, 1)
    assert out[4] == (15, 0, 15, 0.0, 0)
    assert out[8] == (35, 30, 5, 0.8571, 2)
    assert out[9] == (20, 0, 20, 0.0, 0)


def test_mem_span_clean_rebuilds_planted_truth(spark):
    """The applied ExactSubstr rebuild: the higher-id copy of each
    planted span disappears from the text, the lower-id copy survives
    verbatim, untouched docs pass through, and kept_tokens matches the
    stats form's arithmetic."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        mem_span_clean,
    )

    u = [f"u{i}" for i in range(25)]
    keep_tail = _words("a", 4)
    rows = [
        (1, " ".join(u[0:15])),                   # keeps (lowest id)
        (3, " ".join(u[0:15]) + " " + keep_tail), # span cut, tail kept
        (5, " ".join(u[0:25])),                   # [0,15)+[8,23) → [0,23)
        (9, _words("z", 20)),                     # untouched
    ]
    # doc 2 provides the second overlapping span in doc 5
    rows.insert(1, (2, " ".join(u[8:23])))
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["kept_tokens"])
        for r in mem_span_clean(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            "doc_id", "text", n=8, min_tokens=12, max_df=100,
        ).collect()
    }
    assert out[1] == (" ".join(u[0:15]), 15, 15)
    assert out[2] == (" ".join(u[8:23]), 15, 15)
    assert out[3] == (keep_tail, 19, 4)
    assert out[5] == (" ".join(u[23:25]), 25, 2)
    assert out[9] == (_words("z", 20), 20, 20)


def test_mem_probe_clean_planted_truth(spark, tmp_path):
    """Serving-side cleaning: a probe document loses exactly the span
    it shares with the frozen reference (the reference keeps its copy),
    overlapping index matches merge, and clean docs pass untouched."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        build_mem_index,
        mem_probe_clean,
    )

    u = [f"u{i}" for i in range(25)]
    ref = spark.createDataFrame(
        [(100, " ".join(u[0:15])), (101, " ".join(u[8:23]))],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "mcidx")
    build_mem_index(ref, idx, n=8, max_df=100)

    tail = _words("a", 4)
    probe = spark.createDataFrame(
        [
            (1, " ".join(u[0:15]) + " " + tail),  # cut [0,15), keep tail
            (2, " ".join(u[0:25])),               # [0,15)∪[8,23) → [0,23)
            (3, _words("z", 20)),                 # untouched
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["kept_tokens"])
        for r in mem_probe_clean(
            spark, idx, probe, n=8, min_tokens=12
        ).collect()
    }
    assert out[1] == (tail, 19, 4)
    assert out[2] == (" ".join(u[23:25]), 25, 2)
    assert out[3] == (_words("z", 20), 20, 20)


def test_mem_index_clean_registered_consistent_with_probe(spark):
    """Runs the REGISTERED rows-only query (its verified_by anchor) and
    pins it to the oracle-checked probe: merging mem_index_probe's
    start_a intervals in pure Python must reproduce every document's
    kept_tokens, and clean_text's token count must equal kept_tokens."""
    from tests.conftest import SF_DIR

    from weather_data_data_pipeline_spark import registry

    cleaned = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["kept_tokens"])
        for r in registry.get_query("mem_index_clean").fn(
            spark, SF_DIR
        ).collect()
    }
    assert cleaned and all(
        0 <= k <= n for _, n, k in cleaned.values()
    )
    # independent recompute from the hash-checked probe's evidence
    probe_rows = registry.get_query("mem_index_probe").fn(
        spark, SF_DIR
    ).collect()
    spans: dict[int, list[tuple[int, int]]] = {}
    for r in probe_rows:
        spans.setdefault(r["doc_id"], []).append(
            (r["start_a"], r["start_a"] + r["match_tokens"])
        )
    for doc_id, (clean_text, n_tokens, kept) in cleaned.items():
        ivs = sorted(set(spans.get(doc_id, [])))
        cut = 0
        cur_s = cur_e = None
        for s, e in ivs:
            if cur_s is None:
                cur_s, cur_e = s, e
            elif s > cur_e:
                cut += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_s is not None:
            cut += cur_e - cur_s
        assert kept == n_tokens - cut, f"doc {doc_id}"
        got_tokens = len(clean_text.split(" ")) if clean_text else 0
        assert got_tokens == kept or (clean_text == "" and kept == 0), (
            f"doc {doc_id}: clean_text token count != kept_tokens"
        )


def test_mem_clean_sink_equals_batch_probe_clean(spark, tmp_path):
    """Streaming cleaning against a frozen index == the batch
    mem_probe_clean over the union: grams, cut islands, and the rebuilt
    text depend only on the document and the frozen index, so
    micro-batch boundaries cannot change a cleaned row. Also pins the
    batch_id partition layout."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        build_mem_index,
        mem_probe_clean,
    )
    from weather_data_data_pipeline_spark.streaming import incremental as S

    shared1 = _words("s", 14)
    shared2 = _words("t", 13)
    ref = spark.createDataFrame(
        [
            (100, _words("r", 4) + " " + shared1),
            (101, shared2 + " " + _words("q", 7)),
        ],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "mcsidx")
    build_mem_index(ref, idx, n=8, max_df=100)

    fresh_rows = [
        (1, shared1 + " " + _words("a", 3)),
        (2, _words("b", 9) + " " + shared2),
        (3, _words("c", 25)),
        (4, shared2 + " " + shared1),
    ]
    schema = "doc_id LONG, text STRING"
    src = str(tmp_path / "mcs_src")
    for lo, hi in ((0, 2), (2, 4)):
        spark.createDataFrame(fresh_rows[lo:hi], schema).coalesce(
            1
        ).write.mode("append").parquet(src)

    out = str(tmp_path / "mcs_out")
    q = (
        S.mem_clean_sink(
            (
                spark.readStream.schema(schema)
                .format("parquet")
                .option("maxFilesPerTrigger", "1")
                .load(src)
            ),
            idx, out, str(tmp_path / "mcs_ck"),
            n=8, min_tokens=12,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def key(rows_):
        return sorted(
            (r["doc_id"], r["clean_text"], r["n_tokens"], r["kept_tokens"])
            for r in rows_
        )

    got = key(spark.read.parquet(out).collect())
    want = key(
        mem_probe_clean(
            spark, idx,
            spark.createDataFrame(fresh_rows, schema),
            n=8, min_tokens=12,
        ).collect()
    )
    assert got == want and len(got) == 4
    assert spark.read.parquet(out).select("batch_id").distinct().count() == 2
    # the planted spans actually disappeared
    by_id = {d: c for d, c, _, _ in key(spark.read.parquet(out).collect())}
    assert by_id[1] == _words("a", 3)
    assert by_id[3] == _words("c", 25)
    assert by_id[4] == ""


def test_mem_probe_works_with_different_id_col_than_build(spark, tmp_path):
    """ADVICE r12: the on-disk index columns are canonical (id, pos, h),
    so a probe whose frame names its id column differently from the
    build-side frame must still work — pre-fix this raised a confusing
    missing-column error."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        build_mem_index,
        mem_probe_index,
    )

    shared = _words("s", 15)
    ref = spark.createDataFrame(
        [(10, _words("r", 6) + " " + shared)], ["doc_id", "text"]
    )
    idx = str(tmp_path / "xcolidx")
    build_mem_index(ref, idx, "doc_id", "text", n=8, max_df=100)

    probe = spark.createDataFrame(
        [(1, shared + " " + _words("a", 5))], ["item_id", "body"]
    )
    rows = mem_probe_index(
        spark, idx, probe, "item_id", "body", n=8, min_tokens=12
    ).collect()
    assert [(r["item_id"], r["match_id"], r["start_a"], r["start_b"],
             r["match_tokens"]) for r in rows] == [(1, 10, 0, 6, 15)]


def test_mem_span_removal_and_clean_match_brute_force(spark):
    """Randomized ground truth for the keep-one-copy policy + interval
    merge: on seeded random corpora from a 3-token alphabet (dense,
    heavily-overlapping matches by construction — touching islands,
    nested intervals, multi-partner cuts all occur), an independent
    pure-Python pipeline (diagonal-scan MEMs → charge id_b → interval
    union → token filter) must reproduce mem_span_removal's stats AND
    mem_span_clean's rebuilt text exactly. The DuckDB oracle replays
    the same construction, so a policy bug would hash-match on both
    engines — this pins it to first principles instead."""
    import random

    from weather_data_data_pipeline_spark.functions.dedup import (
        mem_span_clean,
        mem_span_removal,
    )

    N, MIN_TOK = 3, 4

    def brute_mems(ta, tb):
        out = []
        for d in range(-(len(tb) - 1), len(ta)):
            i, run = max(0, d), 0
            j = i - d
            while i <= len(ta) and j <= len(tb):
                if i < len(ta) and j < len(tb) and ta[i] == tb[j]:
                    run += 1
                else:
                    if run >= MIN_TOK:
                        out.append((i - run, j - run, run))
                    run = 0
                i += 1
                j += 1
        return out

    for seed in (5, 41, 77):
        rng = random.Random(seed)
        docs = [
            (k, " ".join(
                rng.choice("a b c".split())
                for _ in range(rng.randint(0, 25))
            ))
            for k in range(8)
        ]
        # match split() semantics: "" tokenizes to [""] (one empty
        # token), exactly as Spark's split and DuckDB's string_split do
        toks = {k: t.split(" ") for k, t in docs}
        cuts: dict[int, set[tuple[int, int]]] = {}
        for a in range(8):
            for b in range(a + 1, 8):
                for _, sb, m in brute_mems(toks[a], toks[b]):
                    cuts.setdefault(b, set()).add((sb, sb + m))
        want_stats, want_clean = {}, {}
        for k, t in docs:
            tk = toks[k]
            ivs = sorted(cuts.get(k, set()))
            merged = []
            for s, e in ivs:
                if merged and s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            cut = sum(e - s for s, e in merged)
            covered = set()
            for s, e in merged:
                covered.update(range(s, e))
            kept = [w for i, w in enumerate(tk) if i not in covered]
            want_stats[k] = (
                len(tk), cut, len(tk) - cut,
                round(cut / max(len(tk), 1), 4), len(merged),
            )
            want_clean[k] = (" ".join(kept), len(tk), len(tk) - cut)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got_stats = {
            r["doc_id"]: (
                r["n_tokens"], r["cut_tokens"], r["kept_tokens"],
                r["cut_frac"], r["n_cut_spans"],
            )
            for r in mem_span_removal(
                df, "doc_id", "text", n=N, min_tokens=MIN_TOK,
                max_df=10**6,
            ).collect()
        }
        got_clean = {
            r["doc_id"]: (
                r["clean_text"], r["n_tokens"], r["kept_tokens"]
            )
            for r in mem_span_clean(
                df, "doc_id", "text", n=N, min_tokens=MIN_TOK,
                max_df=10**6,
            ).collect()
        }
        assert got_stats == want_stats, f"seed {seed}"
        assert got_clean == want_clean, f"seed {seed}"


def test_mem_probe_clean_matches_brute_force(spark, tmp_path):
    """Randomized pin for the SERVING clean path: probe random docs
    against a frozen index of a disjoint random reference set; a
    pure-Python pipeline (diagonal-scan MEMs vs each reference doc →
    interval union on the probe side → token filter) must reproduce
    the rebuilt text exactly."""
    import random

    from weather_data_data_pipeline_spark.functions.dedup import (
        build_mem_index,
        mem_probe_clean,
    )

    N, MIN_TOK = 3, 4

    def brute_mems(ta, tb):
        out = []
        for d in range(-(len(tb) - 1), len(ta)):
            i, run = max(0, d), 0
            j = i - d
            while i <= len(ta) and j <= len(tb):
                if i < len(ta) and j < len(tb) and ta[i] == tb[j]:
                    run += 1
                else:
                    if run >= MIN_TOK:
                        out.append((i - run, j - run, run))
                    run = 0
                i += 1
                j += 1
        return out

    for seed in (13, 57):
        rng = random.Random(seed)
        mk = lambda k0, n_docs: [  # noqa: E731
            (k0 + k, " ".join(
                rng.choice("a b c".split())
                for _ in range(rng.randint(0, 25))
            ))
            for k in range(n_docs)
        ]
        ref_rows, probe_rows = mk(100, 5), mk(0, 5)
        idx = str(tmp_path / f"bfidx{seed}")
        build_mem_index(
            spark.createDataFrame(ref_rows, ["doc_id", "text"]),
            idx, n=N, max_df=10**6,
        )
        want = {}
        ref_toks = {k: t.split(" ") for k, t in ref_rows}
        for k, t in probe_rows:
            tk = t.split(" ")
            ivs = set()
            for rt in ref_toks.values():
                for sa, _, m in brute_mems(tk, rt):
                    ivs.add((sa, sa + m))
            merged = []
            for s, e in sorted(ivs):
                if merged and s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            covered = set()
            for s, e in merged:
                covered.update(range(s, e))
            kept = [w for i, w in enumerate(tk) if i not in covered]
            want[k] = (" ".join(kept), len(tk), len(kept))
        got = {
            r["doc_id"]: (
                r["clean_text"], r["n_tokens"], r["kept_tokens"]
            )
            for r in mem_probe_clean(
                spark, idx,
                spark.createDataFrame(probe_rows, ["doc_id", "text"]),
                n=N, min_tokens=MIN_TOK,
            ).collect()
        }
        assert got == want, f"seed {seed}"
