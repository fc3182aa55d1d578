"""Distributed BPE trainer pinned EXACTLY against the pure-Python
Sennrich reference (same (freq desc, pair asc) tie-break), plus encoder
round-trip and scale-shape invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.functions.bpe import (
    END,
    bpe_encode_expr,
    bpe_train,
    python_bpe_reference,
    word_frequency_table,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def test_trainer_matches_python_reference_exactly(spark):
    docs = _docs(spark)
    wf = {
        r["word"]: r["cnt"]
        for r in word_frequency_table(docs, "text").collect()
    }
    expect = python_bpe_reference(wf, num_merges=10)
    got = bpe_train(docs, "text", num_merges=10)
    assert got == expect
    # the classic example learns 'est</w>' pieces from newest/widest
    merged = {l + r for l, r, _ in got}
    assert any("est" in m for m in merged)


def test_trainer_deterministic_under_repartition(spark):
    docs = _docs(spark)
    a = bpe_train(docs, "text", num_merges=6)
    b = bpe_train(docs.repartition(7), "text", num_merges=6)
    assert a == b


def test_min_freq_stops_early(spark):
    docs = spark.createDataFrame([(0, "ab cd")], ["doc_id", "text"])
    # every pair occurs once — nothing reaches min_freq=2
    assert bpe_train(docs, "text", num_merges=5) == []


def test_encoder_applies_merges_greedily(spark):
    docs = _docs(spark)
    merges = bpe_train(docs, "text", num_merges=10)
    out = (
        _docs(spark)
        .select(bpe_encode_expr("text", merges).alias("toks"))
        .collect()
    )
    toks = [r["toks"] for r in out]
    # every token stream reconstructs its document exactly
    for text, ts in zip(CORPUS, toks):
        assert "".join(ts).replace(END, " ").strip() == text
    # with 10 merges over this tiny corpus, frequent words collapse to
    # far fewer symbols than their character count
    flat = [t for ts in toks for t in ts]
    assert len(flat) < sum(len(w) + 1 for t in CORPUS for w in t.split())


def test_corpus_touched_once_then_compact(spark):
    """Scale-shape invariant: the merge loop's working table has one row
    per DISTINCT word, not per corpus occurrence."""
    docs = _docs(spark)
    wf = word_frequency_table(docs, "text")
    assert wf.count() == 4  # low lower newest widest
    assert (
        wf.agg(F.sum("cnt")).collect()[0][0]
        == sum(len(t.split()) for t in CORPUS)
    )


def test_vocab_ids_stable_and_encoder_ids_roundtrip(spark):
    from weather_data_data_pipeline_spark.functions.bpe import (
        bpe_encode_ids_expr,
        bpe_token_budget,
        bpe_vocab,
    )

    docs = _docs(spark)
    merges = bpe_train(docs, "text", num_merges=6)
    base = {c for t in CORPUS for w in t.split() for c in w}
    vocab = bpe_vocab(merges, base)
    # stable ids: training more merges never renumbers existing tokens
    more = bpe_train(docs, "text", num_merges=10)
    vocab_more = bpe_vocab(more, base)
    assert all(vocab_more[t] == i for t, i in vocab.items())
    # ids invert back to the string-token encoding; no OOV on the
    # training corpus itself
    inv = {i: t for t, i in vocab_more.items()}
    ids = docs.select(
        bpe_encode_ids_expr("text", more, vocab_more).alias("ids")
    ).collect()
    toks = docs.select(bpe_encode_expr("text", more).alias("t")).collect()
    for ri, rt in zip(ids, toks):
        assert -1 not in ri["ids"]
        assert [inv[i] for i in ri["ids"]] == rt["t"]


def test_token_budget_compresses_vs_character_count(spark):
    from weather_data_data_pipeline_spark.functions.bpe import bpe_token_budget

    docs = _docs(spark).withColumn("source", F.lit("s0"))
    merges = bpe_train(docs, "text", num_merges=10)
    row = bpe_token_budget(docs, "text", merges, ["source"]).collect()[0]
    n_chars_plus_end = sum(len(w) + 1 for t in CORPUS for w in t.split())
    assert row["n_docs"] == len(CORPUS)
    # learned merges compress below the char-level ceiling but cannot
    # go under one token per word
    assert sum(len(t.split()) for t in CORPUS) <= row["bpe_tokens"]
    assert row["bpe_tokens"] < n_chars_plus_end


def test_encoders_propagate_null_text(spark):
    from weather_data_data_pipeline_spark.functions.bpe import (
        bpe_encode_ids_expr,
        bpe_token_budget,
        bpe_vocab,
    )

    merges = bpe_train(_docs(spark), "text", num_merges=4)
    base = {c for t in CORPUS for w in t.split() for c in w}
    vocab = bpe_vocab(merges, base)
    mixed = spark.createDataFrame(
        [(1, "low low", "s0"), (2, None, "s0"), (3, "", "s0")],
        "doc_id long, text string, source string",
    )
    toks = {r["doc_id"]: r["t"] for r in
            mixed.select("doc_id", bpe_encode_expr("text", merges).alias("t")).collect()}
    ids = {r["doc_id"]: r["i"] for r in
           mixed.select("doc_id", bpe_encode_ids_expr("text", merges, vocab).alias("i")).collect()}
    assert toks[2] is None and ids[2] is None
    assert toks[3] == [] and ids[3] == []
    assert toks[1] is not None and len(ids[1]) == len(toks[1])
    # the budget rollup still counts the null-text doc, sums over the rest
    row = bpe_token_budget(mixed, "text", merges, ["source"]).collect()[0]
    assert row["n_docs"] == 3 and row["bpe_tokens"] == len(toks[1])


def test_rank_priority_encode_matches_sequential_reference(spark):
    """ADVICE r4 #3: the encoder switched from sequential learned-order
    application (O(len x num_merges) per word) to rank-priority encode
    (merge the lowest-ranked pair present, repeatedly). For any table
    produced by BPE TRAINING the two are provably identical (each merge
    creates a distinct token string); pin that equivalence on every
    training word, unseen words, affix overlaps, and repeats."""
    from weather_data_data_pipeline_spark.functions.bpe import (
        _make_encoder,
        _rank_encode_word,
        _sequential_encode_word,
    )

    docs = _docs(spark)
    merges = bpe_train(docs, "text", num_merges=10)
    table = [(l, r) for l, r, _ in merges]
    ranks = {p: i for i, p in enumerate(table)}
    words = {w for t in CORPUS for w in t.split()} | {
        "lowest", "newer", "wide", "west", "low", "owlowl", "ll",
        "slowest", "newestnewest", "x", "",
    }
    for w in sorted(words):
        assert _rank_encode_word(w, ranks) == _sequential_encode_word(
            w, table
        ), w
    # and the dispatcher picked the fast path for this trained table
    enc = _make_encoder(table)
    assert enc("low lowest newest") == (
        _sequential_encode_word("low", table)
        + _sequential_encode_word("lowest", table)
        + _sequential_encode_word("newest", table)
    )


def test_duplicate_token_table_falls_back_to_sequential():
    """A hand-built table where two merges yield the same token string
    ('ab'+'c' and 'a'+'bc' both make 'abc') violates the rank-priority
    precondition: the dispatcher must detect it and stay on the exact
    sequential path rather than silently diverge."""
    from weather_data_data_pipeline_spark.functions.bpe import (
        _make_encoder,
        _sequential_encode_word,
    )

    table = [("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc")]
    enc = _make_encoder(table)
    for w in ("abc", "aabbcc", "abcabc", "bca"):
        assert enc(w) == _sequential_encode_word(w, table), w


def test_non_topological_table_falls_back_to_sequential():
    """ADVICE r5 #3: distinct token strings are NOT sufficient for the
    rank path — [("ab","c"), ("a","b")] has distinct tokens ('abc',
    'ab') yet consumes 'ab' before producing it: sequential encodes
    'abc' as ['ab','c'] while rank-priority would yield ['abc']. The
    dispatcher must detect the topological violation and stay exact."""
    from weather_data_data_pipeline_spark.functions.bpe import (
        _make_encoder,
        _rank_path_safe,
        _sequential_encode_word,
    )

    table = [("ab", "c"), ("a", "b")]
    assert not _rank_path_safe(table)
    enc = _make_encoder(table)
    for w in ("abc", "ab", "abcab"):
        assert enc(w) == _sequential_encode_word(w, table), w
    # sanity: the specific divergence the advice names really exists
    assert enc("abc") == ["ab", "c", "</w>"]
    # and a properly ordered version of the same rules takes the fast
    # path and still agrees with sequential application
    ordered = [("a", "b"), ("ab", "c")]
    assert _rank_path_safe(ordered)
    enc2 = _make_encoder(ordered)
    for w in ("abc", "ab", "abcab"):
        assert enc2(w) == _sequential_encode_word(w, ordered), w


def test_encoder_word_memo_is_correct_and_bounded():
    """The per-task word->tokens memo must return the same answer for a
    repeated word (cache hit) as for its first sight, and must stop
    growing at the cap instead of holding an unbounded dict on an
    all-distinct adversarial corpus."""
    import weather_data_data_pipeline_spark.functions.bpe as B

    table = [("l", "o"), ("lo", "w")]
    enc = B._make_encoder(table)
    first = enc("low low low")
    assert first == ["low", B.END] * 3
    assert enc("low") == ["low", B.END]  # hit path
    old = B._ENCODE_CACHE_MAX
    try:
        B._ENCODE_CACHE_MAX = 4
        enc2 = B._make_encoder(table)
        # 10 distinct words; the closure's cache must not exceed the cap
        out = enc2(" ".join(f"w{i}low" for i in range(10)))
        assert len(out) > 0
        caches = [
            c.cell_contents
            for c in enc2.__closure__
            if isinstance(c.cell_contents, dict)
        ]
        assert caches and all(len(c) <= 4 for c in caches)
    finally:
        B._ENCODE_CACHE_MAX = old


def test_batched_trainer_b1_identical_to_sequential(spark):
    """batch_size=1 must reproduce bpe_train EXACTLY — same candidates,
    same tie-break, same stop rule (VERDICT r5 ask #9 pin)."""
    from weather_data_data_pipeline_spark.functions.bpe import (
        bpe_train_batched,
    )

    docs = _docs(spark)
    stats = {}
    got = bpe_train_batched(
        docs, "text", num_merges=10, batch_size=1, stats=stats
    )
    assert got == bpe_train(docs, "text", num_merges=10)
    # one counting round per merge (plus possibly a final stopping round)
    assert stats["rounds"] >= len(got)


def test_batched_trainer_reduces_driver_rounds(spark):
    """The point of batching: ~num_merges/batch_size counting rounds
    instead of one per merge, while every accepted merge still clears
    min_freq and the batch members are mutually symbol-disjoint."""
    from weather_data_data_pipeline_spark.functions.bpe import (
        bpe_train_batched,
    )

    docs = _docs(spark)
    stats = {}
    merges = bpe_train_batched(
        docs, "text", num_merges=10, batch_size=4, stats=stats
    )
    assert len(merges) >= 8  # the corpus supports ~10 merges
    assert stats["rounds"] <= (len(merges) + 3) // 4 + 1
    assert all(f >= 2 for _, _, f in merges)
    # disjointness within each accepted batch is the independence
    # precondition — re-derive batch boundaries from the round count is
    # overkill; instead assert the GLOBAL validity the encoder needs:
    # the table is topologically ordered (operands exist when consumed)
    from weather_data_data_pipeline_spark.functions.bpe import (
        _rank_path_safe,
    )

    assert _rank_path_safe([(l, r) for l, r, _ in merges])


def test_batched_table_encodes_like_sequential_application(spark):
    """Whatever table batching learns, encoding with it must equal
    learned-order sequential application word-for-word (the encoder
    dispatch contract) — and it must actually compress the corpus."""
    from weather_data_data_pipeline_spark.functions.bpe import (
        _make_encoder,
        _sequential_encode_word,
        bpe_train_batched,
    )

    docs = _docs(spark)
    merges = bpe_train_batched(docs, "text", num_merges=10, batch_size=4)
    table = [(l, r) for l, r, _ in merges]
    enc = _make_encoder(table)
    words = {w for t in CORPUS for w in t.split()}
    for w in words:
        assert enc(w) == _sequential_encode_word(w, table), w
    # compression: fewer BPE tokens than characters for the repeated words
    assert all(
        len(enc(w)) < len(w) + 1 for w in ("newest", "widest", "lowest")
        if w in words
    )


def test_bpe_merge_table_query_invariants(spark):
    """Runs the REGISTERED rows-only query (ADVICE r9 #2): ranks are
    1..n consecutive, every merge concatenates its pair, frequencies
    are positive, and the table is deterministic across invocations."""
    from weather_data_data_pipeline_spark.plans.llm_queries import (
        bpe_merge_table,
    )

    rows = sorted(
        bpe_merge_table(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["merged"] == r["left"] + r["right"]
        assert r["freq"] > 0
    again = sorted(
        bpe_merge_table(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["rank"],
    )
    assert list(map(tuple, rows)) == list(map(tuple, again))
