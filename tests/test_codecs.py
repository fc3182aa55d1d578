"""Round-trip and real-decode tests for the pure-Python media codecs
(PPM / 24-bit BMP / PCM16 WAV / PPM-stream) and their wiring into the
multimodal operators — the bytes are real, no imaging/audio libraries."""

from __future__ import annotations

import numpy as np
import pytest

from weather_data_data_pipeline_spark.multimodal import codecs
from weather_data_data_pipeline_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    decode_features,
    resize_images,
    sample_frames,
)

RNG = np.random.RandomState(7)


def _img(h=5, w=9):
    return RNG.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_ppm_roundtrip_and_comment_header():
    px = _img()
    data = codecs.encode_ppm(px)
    w, h, out = codecs.decode_ppm(data)
    assert (w, h) == (9, 5)
    assert np.array_equal(out, px)
    # header comments per netpbm spec
    commented = b"P6\n# a comment\n9 5\n255\n" + data[len(b"P6\n9 5\n255\n") :]
    w2, h2, out2 = codecs.decode_ppm(commented)
    assert (w2, h2) == (9, 5) and np.array_equal(out2, px)


def test_bmp_roundtrip_with_row_padding():
    # width 9 → 27-byte rows padded to 28: exercises the stride logic
    px = _img(h=4, w=9)
    data = codecs.encode_bmp(px)
    w, h, out = codecs.decode_bmp(data)
    assert (w, h) == (9, 4)
    assert np.array_equal(out, px)


def test_wav_roundtrip_mono_and_stereo():
    mono = (RNG.randint(-32768, 32767, size=301)).astype(np.int16)
    rate, ch, out = codecs.decode_wav(codecs.encode_wav(mono, 8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out[:, 0], mono)

    stereo = (RNG.randint(-32768, 32767, size=(200, 2))).astype(np.int16)
    rate, ch, out = codecs.decode_wav(codecs.encode_wav(stereo, 44100))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, stereo)


def test_ppm_stream_walk():
    frames = [_img(3, 4) for _ in range(5)]
    stream = codecs.encode_ppm_stream(frames)
    got = list(codecs.iter_ppm_stream(stream))
    assert [i for i, _ in got] == [0, 1, 2, 3, 4]
    for (_, blob), src in zip(got, frames):
        _, _, px = codecs.decode_ppm(blob)
        assert np.array_equal(px, src)


def test_sniff():
    assert codecs.sniff(codecs.encode_ppm(_img())) == "ppm"
    assert codecs.sniff(codecs.encode_bmp(_img())) == "bmp"
    assert codecs.sniff(codecs.encode_wav(np.zeros(4, np.int16), 8000)) == "wav"
    assert codecs.sniff(b"\xff\xd8\xff random bytes") is None


def _media_df(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_features_real_formats(spark):
    px = _img(6, 6)
    wav = (np.sin(np.linspace(0, 40, 800)) * 20000).astype(np.int16)
    rows = [
        ("ppm1", bytearray(codecs.encode_ppm(px)), "image", None),
        ("bmp1", bytearray(codecs.encode_bmp(px)), "image", None),
        ("wav1", bytearray(codecs.encode_wav(wav, 8000)), "audio", None),
    ]
    got = {
        r["media_id"]: r
        for r in decode_features(_media_df(spark, rows), fake=False).collect()
    }
    assert set(got) == {"ppm1", "bmp1", "wav1"}
    # PPM and BMP carry identical pixels → identical features
    assert got["ppm1"]["feature"] == got["bmp1"]["feature"]
    want_img = codecs.image_features(px)
    assert np.allclose(got["ppm1"]["feature"], want_img, atol=1e-6)
    want_wav = codecs.audio_features(wav[:, None], 8000)
    assert np.allclose(got["wav1"]["feature"], want_wav, atol=1e-6)
    assert all(len(r["feature"]) == 16 for r in got.values())


def test_decode_features_unknown_format_raises(spark):
    rows = [("x", bytearray(b"\x00\x01garbage"), "image", None)]
    with pytest.raises(Exception, match="no codec for this format"):
        decode_features(_media_df(spark, rows), fake=False).collect()


def test_real_resize_nearest_neighbor(spark):
    px = _img(4, 4)
    rows = [("a", bytearray(codecs.encode_ppm(px)), "image",
             ("image/x-portable-pixmap", 4, 4, None, None))]
    out = resize_images(_media_df(spark, rows), width=2, height=2, fake=False).collect()
    w, h, got = codecs.decode_ppm(bytes(out[0]["content"]))
    assert (w, h) == (2, 2)
    ys = (np.arange(2) * 4) // 2
    xs = (np.arange(2) * 4) // 2
    assert np.array_equal(got, px[ys][:, xs])
    assert out[0]["meta"]["width"] == 2 and out[0]["meta"]["height"] == 2


def test_real_sample_frames_ppm_stream(spark):
    frames = [_img(2, 2) for _ in range(10)]
    stream = codecs.encode_ppm_stream(frames)
    # 10 frames over 1000 ms → 100 ms/frame; every 300 ms → stride 3
    rows = [("v", bytearray(stream), "video",
             ("video/x-ppm-stream", 2, 2, 1000, None))]
    out = sample_frames(_media_df(spark, rows), every_ms=300, fake=False).collect()
    idxs = sorted(r["frame_idx"] for r in out)
    assert idxs == [0, 3, 6, 9]
    for r in out:
        _, _, px = codecs.decode_ppm(bytes(r["frame"]))
        assert np.array_equal(px, frames[r["frame_idx"]])


def test_corrupt_payloads_degrade_not_throw(spark):
    """r15 NULL-audit wave 3: RECOGNIZED-but-corrupt payloads (truncated
    raster/chunks, torn container tail) degrade per row — NULL feature,
    partial demux, skipped dHash — instead of killing the stage; an
    UNRECOGNIZED format still raises (the missing-codec seam)."""
    import numpy as np
    from pyspark.sql import functions as F

    from weather_data_data_pipeline_spark.multimodal import codecs
    from weather_data_data_pipeline_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        decode_features,
        image_dhash_signatures,
        sample_frames,
    )

    px = np.zeros((8, 9, 3), dtype=np.uint8)
    good_img = codecs.encode_ppm(px)
    wav = codecs.encode_wav(np.zeros(16, dtype=np.int16), 8000)
    rows = [
        ("ok", good_img, "image", None),
        ("torn_img", good_img[:40], "image", None),  # raster truncated
        ("torn_wav", wav[:20], "audio", None),  # chunks cut
        ("nul", None, "image", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in decode_features(media).collect()}
    assert feats["ok"]["feature"] is not None
    assert feats["torn_img"]["feature"] is None
    assert feats["torn_img"]["n_bytes"] == 40  # bytes counted, not decoded
    assert feats["torn_wav"]["feature"] is None
    assert feats["nul"]["feature"] is None and feats["nul"]["n_bytes"] is None

    # dHash over images only (a WAV routed here is a deployment bug and
    # still raises — the documented seam)
    imgs = media.where(F.col("modality") == "image")
    sigs = image_dhash_signatures(imgs).collect()
    assert {r["media_id"] for r in sigs} == {"ok"}  # corrupt/null skipped

    f0 = codecs.encode_ppm(np.full((4, 4, 3), 1, dtype=np.uint8))
    f1 = codecs.encode_ppm(np.full((4, 4, 3), 2, dtype=np.uint8))
    meta = {"mime": "video/x-ppm", "width": None, "height": None,
            "duration_ms": 4000, "sample_rate": None}
    vids = spark.createDataFrame(
        [("v", f0 + f1 + b"TORNTAIL", "video", meta)], MEDIA_SCHEMA
    )
    frames = sample_frames(vids, every_ms=1000).collect()
    # decode-until-error: the two complete frames survive the torn tail
    assert sorted(r["frame_idx"] for r in frames) == [0, 1]
    assert bytes(frames[0]["frame"]) == f0
