"""Round-15 optimization experiment variants (scratch module for
scripts/shape_ab.py A/Bs). Each variant is (spark, sf_dir) -> DataFrame
computing EXACTLY what the registered query computes — shape changes
only. Accepted variants graduate into the engine; rejected ones stay
recorded in OPTIMIZATION_r15.md with their numbers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.functions.dedup import (
    jaccard_pairs,
    verify_jaccard_pairs,
    word_shingles,
)
from weather_data_data_pipeline_spark.functions.winnow import (
    winnow_fingerprints,
)
from weather_data_data_pipeline_spark.sources.tables import load, load_fanout

_WINNOW_K = 4
_WINNOW_W = 4
_WINNOW_MIN_SHARED = 2
_WINNOW_MAX_POSTINGS = 64


def winnow_overlap_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """winnowing_overlap_pairs with (a) the distinct fingerprint table
    materialized ONCE (three consumers — sizes, posting side a, posting
    side b — currently re-run the Generate+2-Window fingerprint lineage
    each) and (b) the df-cap as aggregate + broadcast anti-join instead
    of a window count (the jaccard_pairs hot-cut shape: no full sort of
    the posting table)."""
    docs = load_fanout(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs, "doc_id", "text", _WINNOW_K, _WINNOW_W)
    hashes = (
        fps.select("doc_id", "h").dropDuplicates().localCheckpoint(eager=True)
    )
    sizes = hashes.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_fp")
    )
    hot = (
        hashes.groupBy("h")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") > _WINNOW_MAX_POSTINGS)
        .select("h")
    )
    postings = hashes.join(F.broadcast(hot), "h", "left_anti")
    a = postings.select(F.col("doc_id").alias("id_a"), "h")
    b = postings.select(F.col("doc_id").alias("id_b"), "h")
    pairs = (
        a.join(b, "h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_fp").alias("fp_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_fp").alias("fp_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(
                (
                    F.col("n_shared").cast("double")
                    / F.least("fp_a", "fp_b").cast("double")
                ).cast("decimal(38,15)"),
                6,
            )
            .cast("double")
            .alias("overlap_frac"),
        )
    )


def _connected_components_v2(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    driver_max_edges: int = 500_000,
) -> DataFrame:
    """connected_components with the edge symmetrize+dedup shuffle moved
    AFTER the size branch: union-find needs raw pairs only, so the
    driver path materializes the pair list once and never builds the
    2x-row symmetric edge table; only the distributed path pays for it."""
    p = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    p = p.localCheckpoint(eager=True)
    n_pairs = p.count()
    if 2 * n_pairs <= driver_max_edges:
        spark = p.sparkSession
        from pyspark.sql.types import StructField, StructType

        src_type = p.schema["src"].dataType
        schema = StructType(
            [
                StructField("doc_id", src_type, False),
                StructField("cluster_id", src_type, False),
            ]
        )
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in p.collect():
            a, b = r["src"], r["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = [(v, find(v)) for v in parent]
        return spark.createDataFrame(rows, schema)

    edges = (
        p.union(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .dropDuplicates()
        .withColumn("label", F.col("id"))
    )
    for _ in range(max_iter):
        offered = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = labels.join(offered, labels.id == offered.src, "left").select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
            (F.col("nbr_label") < F.col("label")).alias("_changed"),
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.where(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if n_changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_clusters_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fanout(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    return _connected_components_v2(pairs)


def dedup_kept_corpus_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fanout(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    labels = _connected_components_v2(pairs)
    return (
        docs.join(labels, "doc_id", "left")
        .where(F.col("cluster_id").isNull() | (F.col("doc_id") == F.col("cluster_id")))
        .select(
            "doc_id", F.col("cluster_id").isNotNull().alias("was_in_dup_cluster")
        )
    )


def _minhash_sigs_portable_hof(
    df: DataFrame, id_col: str, text_col: str, n: int, num_perm: int
) -> DataFrame:
    """Signature stage as per-document array_min over a transform HOF:
    no explode, no shuffle — each doc's 32 mins computed in one narrow
    map pass. Trades codegen'd md5 (explode+agg) for interpreted
    per-element HOF eval; the A/B decides."""
    from weather_data_data_pipeline_spark.functions.dedup import shingle_array

    arr = shingle_array(text_col, n)
    cols = [
        F.array_min(
            F.transform(F.col("_sh"), lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"h{i}")
        for i in range(num_perm)
    ]
    return (
        df.select(F.col(id_col), arr.alias("_sh"))
        .where(F.size("_sh") > 0)
        .select(id_col, *cols)
    )


def minhash_portable_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_dedup_pairs_portable with the HOF signature stage."""
    from weather_data_data_pipeline_spark.functions import dedup as D

    docs = load_fanout(spark, sf_dir, "documents")
    num_perm, bands, max_bucket_size = 32, 16, 32
    sigs = _minhash_sigs_portable_hof(
        docs, "doc_id", "text", 3, num_perm
    ).localCheckpoint(eager=True)
    rows_per_band = num_perm // bands
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"h{b * rows_per_band + j}")
                        for j in range(rows_per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        F.col("doc_id"), F.explode(F.array(*structs)).alias("bb")
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    w = Window.partitionBy("band", "bucket")
    tagged = (
        banded.withColumn("_m", F.count("*").over(w))
        .withColumn("_rep", F.min("doc_id").over(w))
        .localCheckpoint(eager=True)
    )
    small = tagged.where(F.col("_m") <= max_bucket_size)
    a = small.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = small.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    dense = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    star = tagged.where(
        (F.col("_m") > max_bucket_size) & (F.col("doc_id") != F.col("_rep"))
    ).select(F.col("_rep").alias("id_a"), F.col("doc_id").alias("id_b"))
    cand = dense.union(star).dropDuplicates().localCheckpoint(eager=True)
    return verify_jaccard_pairs(docs, cand, "doc_id", "text", 3, 0.5)


def snapshot_version_diff_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """snapshot_version_diff with the versioned layout written as ONE
    file per version partition (repartition on the partition column
    before the write — guide §6 output sizing): the read-back side then
    scans ~n_versions files instead of input_partitions × versions tiny
    ones."""
    import shutil
    import tempfile

    from weather_data_data_pipeline_spark.sources.layout import read_as_of

    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .where(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
    )
    week = F.floor(F.unix_timestamp("ts") / 604800)
    tmp = tempfile.mkdtemp(prefix="snapshot_diff_")
    try:
        ev.withColumn("v", week).repartition("v").write.mode(
            "overwrite"
        ).partitionBy("v").parquet(f"{tmp}/events_versioned")
        vmin = int(ev.agg(F.min(week).alias("m")).collect()[0]["m"])

        def snap(cut: int) -> DataFrame:
            return read_as_of(
                spark,
                f"{tmp}/events_versioned",
                cut,
                key_cols=["user_id", "event_type"],
                order_cols=["ts", "event_id"],
            ).select("user_id", "event_type", "event_id")

        s1 = snap(vmin + 1)
        s2 = snap(vmin + 2)
        j = s1.alias("a").join(
            s2.alias("b"), ["user_id", "event_type"], "full_outer"
        )
        kind = (
            F.when(F.col("a.event_id").isNull(), F.lit("added"))
            .when(F.col("b.event_id").isNull(), F.lit("removed"))
            .when(F.col("a.event_id") != F.col("b.event_id"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
        )
        out = (
            j.select("event_type", kind.alias("kind"))
            .groupBy("event_type")
            .agg(
                *[
                    F.sum(F.when(F.col("kind") == k, 1).otherwise(0))
                    .cast("bigint")
                    .alias(f"n_{k}")
                    for k in ("added", "changed", "unchanged", "removed")
                ]
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_RHO_TOPK = 25  # matches plans/selection_queries.py


def span_profile_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span_dedup_profile with (a) the hashed-shingle table materialized
    once (freq + shared re-ran the explode lineage) and (b) n_spans
    computed map-side from the distinct-shingle array instead of a
    third pass + an extra left join."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        hashed_shingles,
        shingle_array,
    )

    docs = load_fanout(spark, sf_dir, "documents")
    spans = hashed_shingles(docs, "doc_id", "text", n=8).localCheckpoint(
        eager=True
    )
    freq = spans.groupBy("h").agg(F.count("*").alias("df"))
    shared = (
        spans.join(freq.where(F.col("df") >= 2), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    base = docs.select(
        "doc_id", F.size(shingle_array("text", 8)).alias("_ns")
    )
    return base.join(shared, "doc_id", "left").select(
        "doc_id",
        F.col("_ns").cast("bigint").alias("n_spans"),
        F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
        F.round(
            F.coalesce("n_shared", F.lit(0)).cast("double")
            / F.greatest(F.col("_ns"), F.lit(1)),
            4,
        ).alias("shared_frac"),
    )


def rho_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rho_excess_loss_select with the exploded token/bigram frames
    materialized once: toks fed three consumers (uni, total, ref pass)
    and bi two (bg, proxy pass), each re-running the corpus explode."""
    docs = load_fanout(spark, sf_dir, "documents")
    arr = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    arrs = docs.select("doc_id", arr.alias("t"))
    toks = arrs.select("doc_id", F.explode("t").alias("tok")).localCheckpoint(
        eager=True
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    n = toks.agg(F.count("*").alias("total"))
    bi = (
        arrs.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.struct(
                        F.col("t")[i].alias("w1"), F.col("t")[i + 1].alias("w2")
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        .localCheckpoint(eager=True)
    )
    bg = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    v = uni.agg(F.count("*").alias("vs"))

    def _dec6(loss_col):
        return F.round(loss_col, 6).cast("decimal(38,6)")

    ref = (
        toks.join(uni, "tok")
        .crossJoin(F.broadcast(n))
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
        .join(uni.select(F.col("tok").alias("w1"), "c"), "w1")
        .crossJoin(F.broadcast(v))
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
    scored = ref.join(proxy, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "ref_loss",
        F.coalesce("proxy_loss", "ref_loss").alias("proxy_loss"),
        F.round(
            F.coalesce("proxy_loss", "ref_loss") - F.col("ref_loss"), 4
        ).alias("excess"),
    )
    w = Window.orderBy(F.desc("excess"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= _RHO_TOPK)
    )


def _training_e2e(spark, sf_dir, ckpt_q=True, ckpt_e=True):
    from weather_data_data_pipeline_spark.functions.dedup import (
        connected_components as _cc,
    )
    from weather_data_data_pipeline_spark.functions.text import (
        mean_token_length,
        normalize_for_dedup,
        portable_uniform,
        punct_ratio,
        stopword_ratio,
    )
    from weather_data_data_pipeline_spark.operators.ranking import grouped_topk

    docs = load_fanout(spark, sf_dir, "documents")
    t = F.col("text")
    quality_pass = (
        (F.length(t) >= 50)
        & (F.length(t) <= 100_000)
        & (stopword_ratio(t) >= 0.05)
        & (punct_ratio(t) <= 0.2)
        & (mean_token_length(t) >= 2)
        & (mean_token_length(t) <= 12)
    )
    q = docs.where(quality_pass)
    if ckpt_q:
        q = q.localCheckpoint(eager=True)
    exact_keep = (
        q.groupBy(F.sha2(normalize_for_dedup("text"), 256).alias("_d"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    e = q.join(exact_keep, "doc_id", "left_semi")
    if ckpt_e:
        e = e.localCheckpoint(eager=True)
    pairs = jaccard_pairs(e, "doc_id", "text", n=3, threshold=0.5)
    labels = _cc(pairs)
    nd = (
        e.join(labels, "doc_id", "left")
        .where(F.col("cluster_id").isNull() | (F.col("doc_id") == F.col("cluster_id")))
        .select("doc_id", "source")
    )
    kept = grouped_topk(
        nd.withColumn("_u", portable_uniform("doc_id")),
        ["source"],
        "_u",
        20,
        ascending=True,
        tiebreak_cols=["doc_id"],
    ).select("doc_id")

    def marker(df, name):
        return df.select("doc_id").withColumn(name, F.lit(True))

    return (
        docs.select("doc_id", "source")
        .join(marker(q, "_q"), "doc_id", "left")
        .join(marker(e, "_e"), "doc_id", "left")
        .join(marker(nd, "_n"), "doc_id", "left")
        .join(marker(kept, "_k"), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.when(F.col("_q").isNull(), "quality")
            .when(F.col("_e").isNull(), "exact_dup")
            .when(F.col("_n").isNull(), "near_dup")
            .when(F.col("_k").isNull(), "quota")
            .otherwise("kept")
            .alias("stage"),
        )
    )


def training_e2e_noq(spark, sf_dir):
    """training_pipeline_e2e without the q checkpoint (quality filter is
    a cheap codegen'd predicate over the cached docs scan — recompute 3x
    may beat one materialization job)."""
    return _training_e2e(spark, sf_dir, ckpt_q=False, ckpt_e=True)


def training_e2e_noqe(spark, sf_dir):
    """...without either checkpoint."""
    return _training_e2e(spark, sf_dir, ckpt_q=False, ckpt_e=False)
