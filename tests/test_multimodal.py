"""Multimodal plumbing tests: schema/batch-shape/cardinality of the
mapInPandas media operators, with the deterministic fake codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.multimodal.binary import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_features,
    partition_for_decode,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (f"m{i}", bytes([i] * (100 + i)), "image" if i % 2 == 0 else "video",
         {"mime": "image/png" if i % 2 == 0 else "video/mp4",
          "width": 64, "height": 64,
          "duration_ms": 3500 if i % 2 else None, "sample_rate": None})
        for i in range(10)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_features_shape_and_determinism(media):
    out = decode_features(media, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 10
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows.values())
    assert rows["m0"]["n_bytes"] == 100
    again = {r["media_id"]: r for r in decode_features(media, fake=True).collect()}
    assert rows["m3"]["feature"] == again["m3"]["feature"]


def test_decode_without_codec_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        decode_features(media, fake=False).collect()


def test_resize_updates_meta_and_content(media):
    out = resize_images(media, 8, 8, fake=True)
    assert out.schema == MEDIA_SCHEMA
    r = out.where(F.col("media_id") == "m1").collect()[0]
    assert len(bytes(r["content"])) == 64
    assert r["meta"]["width"] == 8 and r["meta"]["height"] == 8
    assert r["meta"]["duration_ms"] == 3500  # untouched fields survive


def test_sample_frames_cardinality(media):
    out = sample_frames(media, every_ms=1000, fake=True)
    # videos only (duration 3500ms → 3 frames each), images → 0 frames
    counts = {r["media_id"]: r["n"] for r in out.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    assert all(v == 3 for v in counts.values())
    assert set(counts) == {f"m{i}" for i in range(10) if i % 2 == 1}


def test_partition_for_decode_splits(media):
    out = partition_for_decode(media, target_bytes_per_task=300)
    assert out.rdd.getNumPartitions() >= 3
    assert out.count() == 10


def test_image_dhash_known_bits(spark):
    """dHash of a hand-built 9×8 image: a single bright column at x=3
    sets exactly the (x=2 rising) bits and clears the (x=3 falling)
    comparisons — recompute the four band ints by hand."""
    import numpy as np

    from weather_data_data_pipeline_spark.multimodal import codecs
    from weather_data_data_pipeline_spark.multimodal.binary import (
        image_dhash_signatures,
    )

    luma = np.zeros((8, 9), dtype=np.uint8)
    luma[:, 3] = 100
    px = np.repeat(luma[:, :, None], 3, axis=2)
    media = spark.createDataFrame(
        [("1", bytearray(codecs.encode_ppm(px)))],
        "media_id string, content binary",
    )
    row = image_dhash_signatures(media).collect()[0]
    # per row: bit x=2 (luma[3] > luma[2]) set, all others clear
    bits = [1 if x == 2 else 0 for x in range(8)]
    want = []
    flat = bits * 8  # 8 identical rows, bit index y*8+x
    for j in range(4):
        want.append(sum(b << i for i, b in enumerate(flat[16 * j : 16 * (j + 1)])))
    assert [row["b0"], row["b1"], row["b2"], row["b3"]] == want


def test_image_dhash_banding_complete_vs_all_pairs(spark):
    """The banded candidate join must find EXACTLY the pairs an
    all-pairs Hamming ≤ 3 scan finds (4-band pigeonhole guarantee) —
    including pairs differing in 3 bits spread over 3 bands."""
    import itertools

    import numpy as np

    from weather_data_data_pipeline_spark.multimodal import codecs
    from weather_data_data_pipeline_spark.multimodal.binary import (
        image_dhash_near_dup_pairs,
        image_dhash_signatures,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 200, size=(8, 9)).astype(np.uint8)
    variants = {0: base}
    for i, cells in enumerate(
        [[(0, 1)], [(2, 4), (5, 7)], [(1, 2), (3, 5), (6, 8)], [(0, 1), (1, 3), (4, 5), (7, 7)]],
        start=1,
    ):
        v = base.copy()
        for (y, x) in cells:
            v[y, x] = (int(v[y, x]) + 120) % 200
        variants[i] = v
    rows = [
        (str(i), bytearray(codecs.encode_ppm(np.repeat(v[:, :, None], 3, axis=2))))
        for i, v in variants.items()
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    sigs = image_dhash_signatures(media).withColumn(
        "media_id", F.col("media_id").cast("long")
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_dhash_near_dup_pairs(sigs, "media_id").collect()
    )
    sig_rows = {r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
                for r in sigs.collect()}
    want = []
    for a, b in itertools.combinations(sorted(sig_rows), 2):
        h = sum(bin(x ^ y).count("1")
                for x, y in zip(sig_rows[a], sig_rows[b]))
        if h <= 3:
            want.append((a, b, h))
    assert got == sorted(want)
    assert len(got) >= 1  # the fixture really produces near-dup pairs


def test_image_dhash_band_bucket_cap_preserves_components(spark):
    """max_band_bucket: a flood of identical images exceeds the cap, so
    its bucket emits star edges instead of m² dense pairs — the pair
    LIST shrinks but the connected components (what dedup clustering
    consumes) must be identical to the uncapped run."""
    import numpy as np

    from weather_data_data_pipeline_spark.multimodal import codecs
    from weather_data_data_pipeline_spark.multimodal.binary import (
        image_dhash_near_dup_pairs,
        image_dhash_signatures,
    )

    rng = np.random.default_rng(13)
    flood = rng.integers(0, 200, size=(8, 9)).astype(np.uint8)
    other = rng.integers(0, 200, size=(8, 9)).astype(np.uint8)
    rows = []
    for i in range(12):  # one 12-member flood bucket
        rows.append((str(i), bytearray(codecs.encode_ppm(
            np.repeat(flood[:, :, None], 3, axis=2)))))
    for i in range(100, 103):  # a separate small group
        rows.append((str(i), bytearray(codecs.encode_ppm(
            np.repeat(other[:, :, None], 3, axis=2)))))
    media = spark.createDataFrame(rows, "media_id string, content binary")
    sigs = image_dhash_signatures(media).withColumn(
        "media_id", F.col("media_id").cast("long")
    )

    def components(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs:
            a, b = find(r["id_a"]), find(r["id_b"])
            if a != b:
                parent[max(a, b)] = min(a, b)
        groups = {}
        for x in list(parent):
            groups.setdefault(find(x), set()).add(x)
        # a SET of frozensets — sorted() would compare frozensets by
        # the subset partial order, which is not a total order
        return {frozenset(g) for g in groups.values()}

    uncapped = image_dhash_near_dup_pairs(sigs, "media_id").collect()
    capped = image_dhash_near_dup_pairs(
        sigs, "media_id", max_band_bucket=4
    ).collect()
    assert len(capped) < len(uncapped)  # the cap really elided pairs
    # star edges in the flood bucket: exactly m-1 edges from the hub
    flood_capped = [r for r in capped if r["id_a"] < 100 and r["id_b"] < 100]
    assert len(flood_capped) == 11
    assert all(r["id_a"] == 0 for r in flood_capped)
    assert components(capped) == components(uncapped)
