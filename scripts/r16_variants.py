"""Round-16 optimization experiment variants (scratch module for
scripts/shape_ab.py A/Bs). Each variant is (spark, sf_dir) -> DataFrame
computing EXACTLY what the registered query computes — shape changes
only. Accepted variants graduate into the engine; rejected ones stay
recorded in OPTIMIZATION_r16.md with their numbers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.functions.dedup import (
    minhash_dedup_pairs,
    minhash_dedup_pairs_portable,
)
from weather_data_data_pipeline_spark.sources.tables import load, load_fanout


def _wide_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents fanned out to the cluster's full parallelism — a no-op
    whenever the source already has that many partitions (8-core local,
    any real at-scale scan with thousands of splits)."""
    return load_fanout(
        spark,
        sf_dir,
        "documents",
        partitions=spark.sparkContext.defaultParallelism,
    )


def minhash_portable_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_dedup_pairs_portable with the md5×32 signature stage fed
    by cluster-wide partitions instead of the fixed 8 (VERDICT r15 #4:
    the signature job is map-side CPU — 8 input partitions cap it at 8
    cores no matter the cluster)."""
    docs = _wide_docs(spark, sf_dir)
    return minhash_dedup_pairs_portable(docs, "doc_id", "text")


def minhash_pairs_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_dedup_pairs with the same cluster-wide fanout."""
    docs = _wide_docs(spark, sf_dir)
    return minhash_dedup_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).orderBy("id_a", "id_b")


def qc_scores_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRE-r16 quality_classifier_scores shape: MLlib transform
    scoring + the save/load summary strip (baseline side of the
    expression-scoring A/B)."""
    from weather_data_data_pipeline_spark.functions.classifier import (
        quality_classifier_fit,
        quality_classifier_score,
    )
    from weather_data_data_pipeline_spark.functions.text import md5_threshold

    docs = load_fanout(spark, sf_dir, "documents").withColumn(
        "label",
        F.col("source").isin("src0", "src1", "src2", "src3").cast("double"),
    )
    train = docs.where(
        F.md5(F.concat(F.lit("qc-v1|"), F.col("doc_id").cast("string")))
        < F.lit(md5_threshold(0.7))
    )
    model = quality_classifier_fit(train, "text", "label")
    return quality_classifier_score(
        model, docs, "doc_id", "text", keep_cols=("label",)
    )
