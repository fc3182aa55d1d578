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


def _pair_overlap_noguard(df, id_col, text_col, n, max_df):
    """Verbatim pre-r16 _pair_overlap (always-broadcast hot cut, no
    count job) — the baseline side of the guard-cost A/B."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        hashed_shingles,
    )

    sh = hashed_shingles(df, id_col, text_col, n).localCheckpoint(eager=True)
    hot = (
        sh.groupBy("h")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") > max_df)
        .select("h")
    )
    sh = sh.join(F.broadcast(hot), "h", "left_anti")
    counts = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "h")
    b = sh.select(F.col(id_col).alias("id_b"), "h")
    pairs = (
        a.join(b, "h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return pairs.join(ca, "id_a").join(cb, "id_b")


def containment_noguard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ngram_containment_pairs WITHOUT the r16 hot-set count guard
    (always-broadcast, the pre-r16 shape) — isolates the guard job's
    cost on a bench row."""
    docs = load_fanout(spark, sf_dir, "documents")
    overlaps = _pair_overlap_noguard(docs, "doc_id", "text", 3, 100)
    return (
        overlaps.withColumn(
            "containment_a", F.round(F.col("n_common") / F.col("n_a"), 4)
        )
        .withColumn(
            "containment_b", F.round(F.col("n_common") / F.col("n_b"), 4)
        )
        .where(
            F.greatest("containment_a", "containment_b") >= F.lit(0.55)
        )
        .select("id_a", "id_b", "n_common", "containment_a", "containment_b")
    )


def rho_inline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rho_excess_loss_select with the two scalar aggregates (n = total
    tokens, v = vocab size) DERIVED FROM uni via one single-partition
    window instead of two standalone agg+crossJoin chains: total =
    sum(uni.c) and vs = count(uni rows) exactly (integer identities),
    so two broadcast-exchange jobs and their re-run of the explode
    lineage disappear. Value-identical: same doubles into ln, same
    _dec6 pinning, same output."""
    from pyspark.sql import Window

    from weather_data_data_pipeline_spark.plans.selection_queries import (
        _RHO_TOPK,
    )

    docs = load_fanout(spark, sf_dir, "documents")
    arr = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    arrs = docs.select("doc_id", arr.alias("t"))
    toks = arrs.select("doc_id", F.explode("t").alias("tok"))
    w_all = Window.partitionBy()
    uni = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .withColumn("total", F.sum("c").over(w_all))
        .withColumn("vs", F.count("*").over(w_all))
    )
    bi = arrs.where(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.col("t")[i].alias("w1"), F.col("t")[i + 1].alias("w2")
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bg = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))

    def _dec6(loss_col):
        return F.round(loss_col, 6).cast("decimal(38,6)")

    ref = (
        toks.join(uni, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(_dec6(-F.log(F.col("c") / F.col("total"))))
                .cast("double")
                / F.count("*"),
                4,
            ).alias("ref_loss"),
        )
    )
    proxy = (
        bi.join(bg, ["w1", "w2"])
        .join(
            uni.select(F.col("tok").alias("w1"), "c", "vs"), "w1"
        )
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    _dec6(
                        -F.log(
                            (F.col("c2") + F.lit(1.0))
                            / (F.col("c") + F.col("vs"))
                        )
                    )
                )
                .cast("double")
                / F.count("*"),
                4,
            ).alias("proxy_loss"),
        )
    )
    scored = (
        ref.join(proxy, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "ref_loss",
            F.coalesce("proxy_loss", "ref_loss").alias("proxy_loss"),
            F.round(
                F.coalesce("proxy_loss", "ref_loss") - F.col("ref_loss"), 4
            ).alias("excess"),
        )
    )
    w = Window.orderBy(F.desc("excess"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= _RHO_TOPK)
    )
