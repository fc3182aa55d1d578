"""DSIR importance resampling (functions/importance.py): separation,
determinism/order-proofness, null degradation, bucket hygiene, and the
Gumbel-top-k selection contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.functions.importance import (
    dsir_log_weights,
    dsir_select_topk,
    hashed_gram_buckets,
)

# two clearly-separated styles: "code-like" target vs "prose" raw
TARGET = ["def foo return x", "def bar return y", "class foo def baz"]
RAW = [
    "the cat sat on the mat",
    "a dog ran in the park",
    "rain falls on the green hill",
    "the quick brown fox jumps",
]


def _docs(spark):
    rows = [(i, t, "code") for i, t in enumerate(TARGET)] + [
        (100 + i, t, "prose") for i, t in enumerate(RAW)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_weights_separate_target_from_raw(spark):
    docs = _docs(spark)
    w = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(
            docs, "doc_id", "text", F.col("kind") == "code", num_buckets=64
        ).collect()
    }
    code = [w[i] for i in range(len(TARGET))]
    prose = [w[100 + i] for i in range(len(RAW))]
    # every code doc must outscore every prose doc on this corpus
    assert min(code) > max(prose)


def test_weights_order_proof_and_deterministic(spark):
    """The decimal-accumulation contract: repartitioning (different
    partial-aggregation order) may never change a single weight."""
    docs = _docs(spark)
    args = ("doc_id", "text", F.col("kind") == "code")
    a = {r["doc_id"]: r for r in dsir_log_weights(docs, *args).collect()}
    b = {
        r["doc_id"]: r
        for r in dsir_log_weights(docs.repartition(7), *args).collect()
    }
    assert all(
        a[i]["log_w"] == b[i]["log_w"] and a[i]["n_grams"] == b[i]["n_grams"]
        for i in a
    )


def test_null_and_empty_text_get_zero_weight(spark):
    docs = spark.createDataFrame(
        [(1, "def foo", "code"), (2, None, "prose"), (3, "", "prose")],
        "doc_id long, text string, kind string",
    )
    got = {
        r["doc_id"]: r
        for r in dsir_log_weights(
            docs, "doc_id", "text", F.col("kind") == "code"
        ).collect()
    }
    assert got[2]["n_grams"] == 0 and got[2]["log_w"] == 0.0
    assert got[3]["n_grams"] == 0 and got[3]["log_w"] == 0.0
    assert got[1]["n_grams"] == 3  # 2 unigrams + 1 bigram


def test_gram_buckets_shape(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = hashed_gram_buckets(docs, "doc_id", "text", num_buckets=16).collect()
    # 3 unigrams + 2 bigrams
    assert len(rows) == 5
    assert all(0 <= r["bucket"] < 16 for r in rows)
    uni_only = hashed_gram_buckets(
        docs, "doc_id", "text", num_buckets=16, include_bigrams=False
    ).collect()
    assert len(uni_only) == 3


def test_gumbel_topk_selects_k_deterministically_and_favors_weight(spark):
    docs = _docs(spark)
    w = dsir_log_weights(
        docs, "doc_id", "text", F.col("kind") == "code", num_buckets=64
    )
    a = dsir_select_topk(w, "doc_id", k=3).collect()
    b = dsir_select_topk(w, "doc_id", k=3).collect()
    assert len(a) == 3
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]  # replayable
    # with this separation the Gumbel noise (stddev ~1.3) cannot bridge
    # a big synthetic gap: inflate code weights and check domination
    inflated = w.withColumn(
        "log_w",
        F.when(F.col("doc_id") < 100, F.col("log_w") + 50).otherwise(
            F.col("log_w")
        ),
    )
    top = dsir_select_topk(inflated, "doc_id", k=3).collect()
    assert {r["doc_id"] for r in top} == {0, 1, 2}
    # different salt -> a (possibly) different sample, same determinism
    alt = dsir_select_topk(w, "doc_id", k=3, salt="other")
    assert alt.count() == 3


def test_topk_is_take_ordered_not_full_sort(spark):
    """Scale contract: the selection must plan TakeOrderedAndProject
    (bounded per-partition heap + driver merge), never a global sort."""
    docs = _docs(spark)
    w = dsir_log_weights(docs, "doc_id", "text", F.col("kind") == "code")
    plan = dsir_select_topk(w, "doc_id", k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_frozen_model_score_matches_fused_fit_and_score(spark):
    """dsir_score_frozen against dsir_model_ratios must reproduce the
    fused dsir_log_weights bit-for-bit — the contract the streaming
    sink's stream==batch equivalence rests on."""
    from weather_data_data_pipeline_spark.functions.importance import (
        dsir_model_ratios,
        dsir_score_frozen,
    )

    docs = _docs(spark)
    tgt = F.col("kind") == "code"
    fused = {
        r["doc_id"]: (r["n_grams"], r["log_w"])
        for r in dsir_log_weights(docs, "doc_id", "text", tgt).collect()
    }
    ratios = dsir_model_ratios(docs, "doc_id", "text", tgt)
    frozen = {
        r["doc_id"]: (r["n_grams"], r["log_w"])
        for r in dsir_score_frozen(docs, ratios, "doc_id", "text").collect()
    }
    assert fused == frozen


def test_frozen_score_counts_unseen_buckets_as_ratio_zero(spark):
    """ADVICE r5 #2: a fresh corpus can hash grams into buckets absent
    from the fit-time model — those grams must score ratio 0 yet still
    count toward n_grams. (An inner join silently dropped them from the
    denominator; the fix is a left join + decimal-0 fill.)"""
    from decimal import Decimal

    from weather_data_data_pipeline_spark.functions.importance import (
        dsir_score_frozen,
    )

    docs = _docs(spark)
    # a frozen model that knows only ONE bucket: every other bucket a
    # gram lands in is "unseen"
    ratios = spark.createDataFrame(
        [(0, Decimal("0.5"))], "bucket bigint, r decimal(28,6)"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["log_w"])
        for r in dsir_score_frozen(
            docs, ratios, "doc_id", "text", num_buckets=64
        ).collect()
    }
    # n_grams must equal the FULL gram count per doc (uni + bigrams),
    # independent of the model's bucket coverage
    full = {
        r["doc_id"]: r["n"]
        for r in hashed_gram_buckets(docs, "doc_id", "text", num_buckets=64)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {k: v[0] for k, v in got.items()} == full
    # log_w = 0.5 * (grams in bucket 0), everything else contributes 0
    in_b0 = {
        r["doc_id"]: r["n"]
        for r in hashed_gram_buckets(docs, "doc_id", "text", num_buckets=64)
        .where(F.col("bucket") == 0)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for doc_id, (_, log_w) in got.items():
        assert abs(log_w - 0.5 * in_b0.get(doc_id, 0)) < 1e-12


def test_frozen_score_independent_of_batch_split(spark):
    """Scoring half the corpus at a time against the frozen model must
    equal scoring it all at once — per-doc weights depend only on the
    model, and the decimal sums close over any partitioning."""
    from weather_data_data_pipeline_spark.functions.importance import (
        dsir_model_ratios,
        dsir_score_frozen,
    )

    docs = _docs(spark)
    ratios = dsir_model_ratios(
        docs, "doc_id", "text", F.col("kind") == "code"
    )
    whole = {
        r["doc_id"]: (r["n_grams"], r["log_w"])
        for r in dsir_score_frozen(docs, ratios, "doc_id", "text").collect()
    }
    split = {}
    for part in (
        docs.where(F.col("doc_id") < 100),
        docs.where(F.col("doc_id") >= 100),
    ):
        for r in dsir_score_frozen(part, ratios, "doc_id", "text").collect():
            split[r["doc_id"]] = (r["n_grams"], r["log_w"])
    assert whole == split


def test_whitespace_only_doc_needs_the_tokenized_gate(spark):
    """ADVICE r7 #4: a document whose text is non-empty WHITESPACE
    tokenizes to zero grams after the empty-token filter, so under
    assume_nonempty=True it silently vanishes — the e2e pipeline must
    therefore gate on tokenized non-emptiness, not text != ''. This
    pins both halves of that contract: the join-back path keeps the doc
    at log_w = 0, and the tokenized gate expression excludes exactly
    the docs whose disappearance assume_nonempty would hide."""
    from decimal import Decimal

    from weather_data_data_pipeline_spark.functions.importance import (
        dsir_score_frozen,
    )

    docs = spark.createDataFrame(
        [(1, "def foo return x"), (2, "  "), (3, "")],
        "doc_id long, text string",
    )
    ratios = spark.createDataFrame(
        [(0, Decimal("0.5"))], "bucket bigint, r decimal(28,6)"
    )
    # default (join-back) path: every doc survives, gram-free ones at 0
    got = {
        r["doc_id"]: (r["n_grams"], r["log_w"])
        for r in dsir_score_frozen(
            docs, ratios, "doc_id", "text", num_buckets=64
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[2] == (0, 0.0) and got[3] == (0, 0.0)
    # assume_nonempty=True DROPS the gram-free docs — the precondition
    # a caller must establish first
    fast = {
        r["doc_id"]
        for r in dsir_score_frozen(
            docs,
            ratios,
            "doc_id",
            "text",
            num_buckets=64,
            assume_nonempty=True,
        ).collect()
    }
    assert fast == {1}
    # the e2e gate expression admits exactly the assume_nonempty-safe set
    gate = F.size(
        F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    ) > 0
    passed = {r["doc_id"] for r in docs.where(gate).collect()}
    assert passed == {1}
