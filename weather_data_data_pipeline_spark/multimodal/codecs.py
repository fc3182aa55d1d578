"""Pure-Python codecs: one real format per modality, no media libraries.

- image: PPM (P6) and BMP (24-bit BI_RGB) — header parse + numpy pixel
  reshape, byte-for-byte.
- audio: WAV (RIFF, PCM16) — chunk walk + int16 sample view.
- video: PPM-STREAM (concatenated P6 frames — ffmpeg's image2pipe ppm
  layout) — sequential header walk yields per-frame offsets.

These make the multimodal operators honest end-to-end (real bytes →
pixels/samples → features); formats beyond them stay behind the explicit
NotImplementedError seam in ``binary.py`` where PIL/ffmpeg would plug in.
Encoders are provided so tests and fixtures can fabricate real files
deterministically.
"""

from __future__ import annotations

import numpy as np


def sniff(data: bytes) -> str | None:
    """Identify a supported container by magic bytes."""
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("PPM is RGB: expected (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8
    ).tobytes()


def decode_ppm(data: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM → (w, h, (h, w, 3) uint8 RGB). Handles whitespace and
    ``#`` comments in the header per the netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval, then raster
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval {maxval})")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, px.reshape(h, w, 3).copy()


# ------------------------------------------------------- BMP (24-bit BI_RGB)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP with padded rows."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("BMP encoder expects (h, w, 3) RGB")
    row = (w * 3 + 3) & ~3
    raster = bytearray()
    bgr = pixels[:, :, ::-1]
    pad = b"\x00" * (row - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        raster += np.ascontiguousarray(bgr[y], dtype=np.uint8).tobytes() + pad
    off = 14 + 40
    size = off + len(raster)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(raster).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    return header + bytes(raster)


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """24-bit BI_RGB BMP → (w, h, (h, w, 3) uint8 RGB); top-down and
    bottom-up rasters both handled."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={comp})")
    bottom_up, h = h > 0, abs(h)
    row = (w * 3 + 3) & ~3
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        line = np.frombuffer(data, np.uint8, w * 3, off + y * row).reshape(w, 3)
        px[h - 1 - y if bottom_up else y] = line[:, ::-1]  # BGR → RGB
    return w, h, px


# ----------------------------------------------------------- WAV (PCM16)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 → RIFF/WAVE PCM16."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    block = channels * 2
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    data = b"data" + len(pcm).to_bytes(4, "little") + pcm
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, channels, (n, channels) int16)."""
    if sniff(data) != "wav":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if int.from_bytes(body[0:2], "little") != 1:
                raise ValueError("only PCM WAV supported")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported (got {bits})")
    samples = np.frombuffer(pcm, dtype="<i2")
    samples = samples[: len(samples) - len(samples) % channels]
    return rate, channels, samples.reshape(-1, channels).copy()


# ------------------------------------------------ PPM-STREAM (video frames)


def encode_ppm_stream(frames: list[np.ndarray]) -> bytes:
    """Concatenated P6 frames — the image2pipe ppm layout."""
    return b"".join(encode_ppm(f) for f in frames)


def iter_ppm_stream(data: bytes):
    """Yield (frame_index, frame_bytes) by walking sequential P6 headers."""
    pos, idx = 0, 0
    while pos < len(data):
        if data[pos : pos + 2] != b"P6":
            raise ValueError(f"bad frame header at offset {pos}")
        w, h, _ = decode_ppm(data[pos:])
        # header length = everything before the raster for THIS frame
        body = w * h * 3
        hdr_end = _ppm_raster_offset(data, pos)
        end = hdr_end + body
        yield idx, data[pos:end]
        pos, idx = end, idx + 1


def _ppm_raster_offset(data: bytes, start: int) -> int:
    pos, vals = start + 2, []
    while len(vals) < 3:
        while data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        s = pos
        while not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[s:pos]))
    return pos + 1


# ------------------------------------------------------------- featurizers

FEATURE_DIM = 16


def image_features(pixels: np.ndarray) -> np.ndarray:
    """16-dim image descriptor: per-channel means (3) and stds (3), 3×3
    luma grid means (9), aspect ratio (1). Deterministic, library-free."""
    x = pixels.astype(np.float64) / 255.0
    means = x.mean(axis=(0, 1))
    stds = x.std(axis=(0, 1))
    luma = x @ np.array([0.299, 0.587, 0.114])
    grid = [
        block.mean()
        for rows in np.array_split(luma, 3, axis=0)
        for block in np.array_split(rows, 3, axis=1)
    ]
    h, w = luma.shape
    return np.array([*means, *stds, *grid, w / h], dtype=np.float32)


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """16-dim audio descriptor over the mono mix: mean, rms, zero-cross
    rate, peak, duration-seconds (5) + 11 coarse segment RMS values."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    if len(mono) == 0:
        mono = np.zeros(1)
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
    head = [
        float(mono.mean()),
        float(np.sqrt((mono**2).mean())),
        zc,
        float(np.abs(mono).max()),
        len(mono) / sample_rate,
    ]
    segs = [
        float(np.sqrt((s**2).mean())) if len(s) else 0.0
        for s in np.array_split(mono, 11)
    ]
    return np.array([*head, *segs], dtype=np.float32)
