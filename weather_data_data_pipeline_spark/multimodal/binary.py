"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Data model (the 100 TB layout):

    content   BINARY            -- raw bytes (or a URI when externalized)
    modality  STRING            -- 'image' | 'audio' | 'video'
    meta      STRUCT<mime: STRING, width: INT, height: INT,
                     duration_ms: INT, sample_rate: INT>

The Spark-side plumbing — schema, Arrow batching, mapInPandas signatures,
partition sizing — is real and tested. Decoding has two tiers:

- REAL, library-free: PPM/BMP images, PCM16 WAV audio, PPM-stream video
  (``multimodal/codecs.py``) — actual bytes → pixels/samples → features,
  no PIL/ffmpeg needed.
- Everything else (JPEG/MP3/MP4 …) needs codec libraries absent in this
  container: ``fake=True`` gives a deterministic hash-derived decode
  (stable test vectors); ``fake=False`` on an unsupported format raises
  the explicit NotImplementedError a deployment replaces with PIL/ffmpeg.

Why mapInPandas: decode is per-row CPU work with a wide, variable-size
output; Arrow batches amortize the Python crossing, and the iterator
form streams batches so one task never materializes its whole partition.
At scale, repartition so (rows per task × bytes per row) fits executor
memory — see ``partition_for_decode``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("content", BinaryType()),
        StructField("modality", StringType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("modality", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
    ]
)

FEATURE_DIM = 16


def _fake_decode(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a codec+featurizer: bytes → sha256 →
    unit-norm float vector. Stable across runs/partitions, so tests can
    assert exact values while the real codec is absent."""
    digest = hashlib.sha256(content).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    vec = (raw.astype(np.float64) / np.iinfo("uint32").max) - 0.5
    return (vec / np.linalg.norm(vec)).astype(np.float32)


def _real_decode(content: bytes) -> np.ndarray:
    """Real decode for the library-free formats (PPM/BMP/WAV); raises
    NotImplementedError for anything else — the seam where PIL/ffmpeg
    plug in on a full image."""
    from weather_data_data_pipeline_spark.multimodal import codecs

    kind = codecs.sniff(content)
    if kind == "ppm":
        _, _, px = codecs.decode_ppm(content)
        return codecs.image_features(px)
    if kind == "bmp":
        _, _, px = codecs.decode_bmp(content)
        return codecs.image_features(px)
    if kind == "wav":
        rate, _, samples = codecs.decode_wav(content)
        return codecs.audio_features(samples, rate)
    raise NotImplementedError(
        "no codec for this format in this environment (built-in: PPM, "
        "24-bit BMP, PCM16 WAV); wire PIL/torchaudio/ffmpeg here or pass "
        "fake=True for the deterministic test decode"
    )


def decode_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract binary media via mapInPandas (Arrow batches).

    ``fake=False`` decodes PPM/BMP/WAV for real (pure-Python codecs, see
    module docstring) and raises NotImplementedError on formats that
    need external libraries — the exact shape a full codec stack plugs
    into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_decode if fake else _real_decode

        def _row(c):
            # NULL content degrades per-row (NULL feature/n_bytes), and a
            # RECOGNIZED-but-corrupt payload (truncated raster, bad
            # maxval — the codec raises ValueError) degrades to a NULL
            # feature while keeping its byte count — at 100 TB every
            # pathological value exists somewhere and one bad row must
            # not poison the partition (r14/r15 NULL audits). An
            # UNRECOGNIZED format still raises NotImplementedError: that
            # is the documented PIL/ffmpeg seam (missing codec), a
            # deployment gap, not a data defect.
            if c is None:
                return None
            try:
                return decode(bytes(c)).tolist()
            except ValueError:
                return None

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": [_row(c) for c in pdf["content"]],
                    # nullable Int32 (DECODED_SCHEMA's n_bytes is
                    # IntegerType): a plain list with a None would coerce
                    # to float64 at the Arrow boundary
                    "n_bytes": pd.array(
                        [
                            None if c is None else len(bytes(c))
                            for c in pdf["content"]
                        ],
                        dtype="Int32",
                    ),
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


def _real_resize(content: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize for PPM/BMP, re-encoded in the source
    format — a real resample with no imaging library."""
    from weather_data_data_pipeline_spark.multimodal import codecs

    kind = codecs.sniff(content)
    if kind not in ("ppm", "bmp"):
        raise NotImplementedError(
            "no resize codec for this format (built-in: PPM, 24-bit BMP); "
            "wire PIL/opencv here or pass fake=True for the plumbing stub"
        )
    decode = codecs.decode_ppm if kind == "ppm" else codecs.decode_bmp
    encode = codecs.encode_ppm if kind == "ppm" else codecs.encode_bmp
    w, h, px = decode(content)
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode(px[ys][:, xs])


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Image resize: binary in → binary out, meta updated. The real path
    nearest-neighbor-resamples PPM/BMP via the pure-Python codecs (other
    formats raise — the PIL/opencv seam); the fake path truncates/pads
    bytes deterministically (plumbing-only)."""
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                content = [
                    _real_resize(bytes(c), width, height)
                    for c in pdf["content"]
                ]
            else:
                content = [
                    (bytes(c) * (target // max(len(bytes(c)), 1) + 1))[:target]
                    for c in pdf["content"]
                ]
            meta = pd.DataFrame(
                {
                    "mime": [m["mime"] if m is not None else None for m in pdf["meta"]],
                    "width": width,
                    "height": height,
                    "duration_ms": [
                        m["duration_ms"] if m is not None else None for m in pdf["meta"]
                    ],
                    "sample_rate": [
                        m["sample_rate"] if m is not None else None for m in pdf["meta"]
                    ],
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": content,
                    "modality": pdf["modality"],
                    "meta": meta.to_dict("records"),
                }
            )

    return df.mapInPandas(run, out_schema)


def _real_sample_frames(
    content: bytes, duration_ms: int, every_ms: int
) -> list[tuple[int, bytes]]:
    """Real frame sampling over a PPM-stream container (concatenated P6
    frames — the image2pipe layout): walk the frame headers, keep every
    k-th frame where k = ceil(every_ms / frame_interval)."""
    from weather_data_data_pipeline_spark.multimodal import codecs

    if codecs.sniff(content) != "ppm":
        raise NotImplementedError(
            "no video demuxer for this format (built-in: PPM-stream); "
            "wire ffmpeg here or pass fake=True for the plumbing stub"
        )
    # Corrupt/truncated container: keep every COMPLETE frame demuxed
    # before the bad offset (ffmpeg's decode-until-error posture) — a
    # torn tail on one clip must not kill the partition (r15 NULL
    # audit); an unrecognized container still raises above (the
    # missing-codec seam, a deployment gap, not a data defect)
    frames = []
    try:
        for f in codecs.iter_ppm_stream(content):
            frames.append(f)
    except ValueError:
        pass
    if not frames:
        return []
    interval = max(duration_ms, 1) / len(frames)
    stride = max(int(-(-every_ms // interval)), 1)  # ceil
    return [(i, blob) for i, blob in frames[::stride]]


def sample_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Video frame sampling: one row in → N frame rows out (mapInPandas
    is the right operator precisely because output cardinality differs
    from input). The real path demuxes PPM-stream containers (other
    formats raise — the ffmpeg seam); the fake path derives frame count
    from meta.duration_ms."""
    out_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                ids, idxs, frames = [], [], []
                for _, row in pdf.iterrows():
                    if row["content"] is None:  # degrade per-row, no frames
                        continue
                    duration = (row["meta"] or {}).get("duration_ms")
                    if duration is None or duration != duration:
                        duration = 0
                    for i, blob in _real_sample_frames(
                        bytes(row["content"]), int(duration), every_ms
                    ):
                        ids.append(row["media_id"])
                        idxs.append(i)
                        frames.append(blob)
                yield pd.DataFrame(
                    {"media_id": ids, "frame_idx": idxs, "frame": frames}
                )
                continue
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                if row["content"] is None:  # degrade per-row, no frames
                    continue
                duration = (row["meta"] or {}).get("duration_ms")
                # Arrow → pandas surfaces nullable ints as float (NaN for null)
                if duration is None or duration != duration:
                    duration = 0
                n = max(int(duration) // every_ms, 0)
                blob = bytes(row["content"])
                for i in range(n):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    frames.append(hashlib.sha256(blob + i.to_bytes(4, "little")).digest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, out_schema)


def partition_for_decode(df: DataFrame, target_bytes_per_task: int = 256 << 20) -> DataFrame:
    """Right-size partitions for decode: estimate bytes per partition from
    content lengths and repartition so a task's Arrow batches stay within
    budget. At 100 TB this is the difference between streaming decode and
    OOM."""
    stats = df.select(
        F.count("*").alias("n"), F.avg(F.length("content")).alias("avg_len")
    ).collect()[0]
    if not stats["n"]:
        return df
    total = float(stats["n"]) * float(stats["avg_len"] or 1.0)
    parts = max(int(total // target_bytes_per_task) + 1, 1)
    return df.repartition(parts)


def image_dhash_signatures(
    media: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Perceptual dHash over REAL decoded pixels: (id, b0, b1, b2, b3) —
    the 64-bit difference hash carried as four 16-bit band integers.

    The hash is the classic dHash: integer luma
    ``(299·R + 587·G + 114·B) // 1000`` per pixel, bit ``y·8 + x`` set
    iff ``luma[y][x+1] > luma[y][x]`` over a 9-wide × 8-tall grid (a
    production deployment resizes into that grid first; the fabricated
    corpus is already 9×8, so the decode→luma→gradient path is exercised
    without an interpolation step the oracle could not replay). Bands
    are bits 16j..16j+15 — the SimHash pigeonhole geometry
    (functions/dedup.py:simhash_near_dup_pairs): Hamming ≤ 3 ⇒ at least
    one identical band. Decode happens executor-side on Arrow batches
    via the pure-Python PPM/BMP codecs; only 4 small ints per image
    ever shuffle."""
    id_type = media.schema[id_col].dataType.simpleString()

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from weather_data_data_pipeline_spark.multimodal import codecs

        for pdf in batches:
            ids, bands = [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None:
                    continue
                kind = codecs.sniff(bytes(content))
                try:
                    if kind == "ppm":
                        _, _, px = codecs.decode_ppm(bytes(content))
                    elif kind == "bmp":
                        _, _, px = codecs.decode_bmp(bytes(content))
                    else:
                        raise NotImplementedError(
                            f"dHash needs a decodable image, got {kind!r} "
                            "— wire PIL here for JPEG/PNG corpora"
                        )
                except ValueError:
                    # recognized-but-corrupt image (truncated raster, bad
                    # maxval/bpp): unhashable, skip the ROW — it can join
                    # no dedup group (r15 NULL audit). The grid-size
                    # check below stays strict: a VALID image of the
                    # wrong size is a pipeline bug (resize first), not
                    # data corruption.
                    continue
                if px.shape[0] != 8 or px.shape[1] != 9:
                    # strict: a production deployment resizes into the
                    # 9×8 grid FIRST (resize_images); hashing a crop of
                    # a larger image would silently collide visually
                    # different images, and a smaller one would die in
                    # an opaque numpy broadcast error
                    raise ValueError(
                        f"dHash expects a 9×8 image, got "
                        f"{px.shape[1]}×{px.shape[0]} for media_id "
                        f"{mid!r} — resize into the grid first"
                    )
                luma = (
                    px[:, :, 0].astype(np.int64) * 299
                    + px[:, :, 1].astype(np.int64) * 587
                    + px[:, :, 2].astype(np.int64) * 114
                ) // 1000
                bits = (luma[:, 1:9] > luma[:, 0:8]).astype(np.int64)
                flat = bits.reshape(-1)  # bit index y*8 + x
                b = [
                    int((flat[16 * j : 16 * (j + 1)] << np.arange(16)).sum())
                    for j in range(4)
                ]
                ids.append(mid)
                bands.append(b)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "b0": [b[0] for b in bands],
                    "b1": [b[1] for b in bands],
                    "b2": [b[2] for b in bands],
                    "b3": [b[3] for b in bands],
                }
            )

    return media.select(id_col, content_col).mapInPandas(
        hash_batches,
        schema=f"{id_col} {id_type}, b0 int, b1 int, b2 int, b3 int",
    )


def image_dhash_near_dup_pairs(
    sigs: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Image near-dup pairs from dHash band signatures: band the four
    16-bit chunks (pigeonhole: Hamming ≤ 3 over 4 bands ⇒ ≥ 1 identical
    band), join on band equality, verify Hamming via bit_count(xor) —
    never all-pairs. The image member of the multimodal dedup family
    (video_frame_dedup exact frames, audio_dedup_fingerprint waveform
    windows); same geometry as simhash_near_dup_pairs so the banded
    candidate set provably contains every pair within ``max_hamming``
    (for max_hamming ≤ 3).

    ``max_band_bucket`` is the volume guard for boilerplate-flooded
    corpora (thumbnails, letterboxed frames, solid-color padding): a
    band bucket of m images emits m² candidates, so a flood grows the
    join quadratically while true near-dup DENSITY doesn't. Oversized
    buckets emit star edges to their min-id hub instead — the same
    connected-component-preserving contract (and the same recall
    caveat: a star member whose hub edge fails the Hamming verify
    loses its elided dense links) as the MinHash family's
    ``max_bucket_size`` (functions/dedup.py). Default ``None`` = exact
    enumeration, which the registered query keeps for oracle parity
    (the r6 stress measured its fabricated corpus quadratic BY
    CONSTRUCTION — group size grows with the corpus there; a real
    corpus with scale-invariant dup density stays linear uncapped)."""
    sigs = sigs.localCheckpoint(eager=True)  # both sides of the self-join
    chunks = sigs.select(
        id_col,
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.col(f"b{j}").alias("band"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("c"),
    ).select(id_col, "b0", "b1", "b2", "b3", "c.band_idx", "c.band")
    hamming = sum(
        [
            F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"bb{j}")))
            for j in range(1, 4)
        ],
        F.bit_count(F.col("a0").bitwiseXOR(F.col("bb0"))),
    ).cast("int")
    sig_cols_a = [F.col(f"b{j}").alias(f"a{j}") for j in range(4)]
    sig_cols_b = [F.col(f"b{j}").alias(f"bb{j}") for j in range(4)]
    if max_band_bucket is None:
        a = chunks.select(
            F.col(id_col).alias("id_a"), *sig_cols_a, "band_idx", "band"
        )
        b = chunks.select(
            F.col(id_col).alias("id_b"), *sig_cols_b, "band_idx", "band"
        )
        cand = (
            a.join(b, ["band_idx", "band"])
            .where(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                "a0", "a1", "a2", "a3", "bb0", "bb1", "bb2", "bb3",
            )
        )
    else:
        from pyspark.sql import Window

        # one window pass tags bucket size + the min-id hub WITH its
        # signature (min of a struct = lexicographic = min id), so the
        # star branch never joins back to the signature table
        w = Window.partitionBy("band_idx", "band")
        tagged = (
            chunks.withColumn("_m", F.count("*").over(w))
            .withColumn(
                "_hub",
                F.min(
                    F.struct(
                        F.col(id_col).alias("i"),
                        *[F.col(f"b{j}").alias(f"s{j}") for j in range(4)],
                    )
                ).over(w),
            )
            .localCheckpoint(eager=True)
        )
        small = tagged.where(F.col("_m") <= max_band_bucket)
        a = small.select(
            F.col(id_col).alias("id_a"), *sig_cols_a, "band_idx", "band"
        )
        b = small.select(
            F.col(id_col).alias("id_b"), *sig_cols_b, "band_idx", "band"
        )
        dense = (
            a.join(b, ["band_idx", "band"])
            .where(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                "a0", "a1", "a2", "a3", "bb0", "bb1", "bb2", "bb3",
            )
        )
        star = tagged.where(
            (F.col("_m") > max_band_bucket)
            & (F.col(id_col) != F.col("_hub.i"))
        ).select(
            F.col("_hub.i").alias("id_a"),
            F.col(id_col).alias("id_b"),
            *[F.col(f"_hub.s{j}").alias(f"a{j}") for j in range(4)],
            *[F.col(f"b{j}").alias(f"bb{j}") for j in range(4)],
        )
        cand = dense.unionByName(star)
    return (
        cand.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
