"""Learned quality classifier (functions/classifier.py): separable-
corpus accuracy, same-session determinism (the rows-only driver
contract), NULL-text survival, and scoring parity with a hand-computed
sigmoid over the fitted coefficients."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.functions.classifier import (
    quality_classifier_fit,
    quality_classifier_score,
)

# linearly separable by construction: positives speak "code", negatives
# speak "prose", with zero vocabulary overlap
POS = [
    "def foo return x",
    "class bar def baz",
    "import os def main",
    "return self value def",
    "lambda x return x",
    "def method class init",
]
NEG = [
    "the cat sat on the mat",
    "a dog ran in the park",
    "rain falls on the hill",
    "the quick brown fox jumps",
    "birds sing in the morning",
    "waves crash on the shore",
]


def _corpus(spark):
    rows = [(i, t, 1.0) for i, t in enumerate(POS)] + [
        (100 + i, t, 0.0) for i, t in enumerate(NEG)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_separable_corpus_is_learned(spark):
    docs = _corpus(spark)
    model = quality_classifier_fit(docs, "text", "label", num_features=256)
    scored = {
        r["doc_id"]: r
        for r in quality_classifier_score(
            model, docs, "doc_id", "text"
        ).collect()
    }
    assert all(scored[i]["pred"] == 1 for i in range(len(POS)))
    assert all(scored[100 + i]["pred"] == 0 for i in range(len(NEG)))
    # and with confidence — every positive above every negative
    assert min(scored[i]["prob_pos"] for i in range(len(POS))) > max(
        scored[100 + i]["prob_pos"] for i in range(len(NEG))
    )


def test_same_session_fit_and_scores_deterministic(spark):
    docs = _corpus(spark)
    a = quality_classifier_fit(docs, "text", "label", num_features=256)
    b = quality_classifier_fit(docs, "text", "label", num_features=256)
    ca = a.stages[-1].coefficients.toArray()
    cb = b.stages[-1].coefficients.toArray()
    assert (ca == cb).all()
    sa = sorted(
        map(tuple, quality_classifier_score(a, docs, "doc_id", "text").collect())
    )
    sb = sorted(
        map(tuple, quality_classifier_score(b, docs, "doc_id", "text").collect())
    )
    assert sa == sb


def test_null_text_scores_as_empty_doc(spark):
    docs = _corpus(spark)
    model = quality_classifier_fit(docs, "text", "label", num_features=256)
    with_null = docs.unionByName(
        spark.createDataFrame(
            [(999, None, 0.0)], "doc_id long, text string, label double"
        )
    )
    out = quality_classifier_score(model, with_null, "doc_id", "text")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 999 in rows  # the NULL row survived scoring
    # empty doc → zero feature vector → score is sigmoid(intercept)
    lr = model.stages[-1]
    expected = 1.0 / (1.0 + math.exp(-lr.intercept))
    assert abs(rows[999]["prob_pos"] - round(expected, 6)) <= 1e-6


def test_scores_match_hand_computed_sigmoid(spark):
    """The scoring pass is exactly sigmoid(w·tf(x) + b) over the
    HashingTF features — recompute one document's score from the raw
    coefficient vector and the model's own feature hashing."""
    docs = _corpus(spark)
    model = quality_classifier_fit(docs, "text", "label", num_features=256)
    feats = (
        model.stages[1]
        .transform(model.stages[0].transform(docs.limit(1)))
        .select("doc_id", "_features")
        .collect()[0]
    )
    lr = model.stages[-1]
    z = float(feats["_features"].dot(lr.coefficients)) + lr.intercept
    expected = round(1.0 / (1.0 + math.exp(-z)), 6)
    got = (
        quality_classifier_score(model, docs, "doc_id", "text")
        .where(F.col("doc_id") == feats["doc_id"])
        .collect()[0]["prob_pos"]
    )
    assert abs(got - expected) <= 1e-6


def test_scores_survive_observed_write(spark, tmp_path):
    """VERDICT r5 #1 regression: after any observed write in the session
    the JVM ObservationManager is not Serializable; a fitted model that
    still holds its trainingSummary (→ SparkSession) dies with
    NotSerializableException on the first collect of model.transform
    output. quality_classifier_fit strips the summary via a write/load
    round-trip — scoring must survive an observe-first session."""
    from weather_data_data_pipeline_spark.sources.observability import (
        observed_append,
    )

    docs = _corpus(spark)
    metrics = observed_append(
        docs.select("doc_id", "label"),
        str(tmp_path / "audit_out"),
        [F.count("doc_id").alias("n")],
    )
    assert metrics["n"] == len(POS) + len(NEG)
    model = quality_classifier_fit(docs, "text", "label", num_features=256)
    rows = quality_classifier_score(model, docs, "doc_id", "text").collect()
    assert len(rows) == len(POS) + len(NEG)
    assert all(r["prob_pos"] is not None for r in rows)


def test_registered_query_shape(spark):
    from weather_data_data_pipeline_spark import registry

    df = registry.get_query("quality_classifier_scores").fn(
        spark, "/root/testdata/sf0.001"
    )
    assert [f.name for f in df.schema.fields] == [
        "doc_id",
        "label",
        "prob_pos",
        "pred",
    ]
    rows = df.collect()
    assert len(rows) == 500
    assert all(r["prob_pos"] is not None for r in rows)
