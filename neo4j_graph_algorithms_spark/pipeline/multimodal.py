"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads ride through the engine as binary columns
with a metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` kernels so a 100 TB corpus streams
through Python in bounded batches with zero driver involvement.

Decode support: uncompressed 24-bit BMP (BI_RGB), binary PPM (P6) and
binary PGM (P5) decode for REAL via pure-numpy parsers
(:func:`decode_bmp`, :func:`decode_pnm`, dispatched by magic in
:func:`decode_image`) — no external codec needed — and featurize to
width/height + a 16-bin luminance histogram; 16-bit PCM WAV audio
decodes for REAL via the stdlib ``wave`` module (:func:`decode_wav`)
and featurizes to rate/duration/rms + a 16-bin amplitude histogram.
Compressed formats (JPEG/PNG/...) remain STUBBED: payloads without a
known magic raise ``NotImplementedError`` from the workers (the
sandbox ships no libjpeg/PIL); ``fake=True`` substitutes a
deterministic stand-in decoder for any payload, exercising the
identical plumbing — schema, partitioning, UDF signature, Arrow batch
shape — the parts that must be correct at scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["attach_metadata", "decode_bmp", "decode_pnm", "decode_image",
           "decode_wav", "extract_image_features",
           "extract_audio_features", "frame_sample", "resize_images"]

_FEATURE_SCHEMA = (
    "item_id long, n_bytes long, width int, height int, features array<float>"
)


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Add the typed metadata struct (size, sha) every multimodal row
    carries; JVM-side only."""
    return df.withColumn(
        "meta",
        F.struct(
            F.length(F.col(payload_col)).alias("n_bytes"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ),
    )


def decode_bmp(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy decoder for uncompressed 24-bit BMP (BI_RGB).

    Returns (width, height, pixels[h, w, 3] uint8 RGB). Raises
    ``NotImplementedError`` for anything that is not a plain 24-bpp
    uncompressed BMP — compressed codecs are out of scope in-sandbox.
    """
    if len(buf) < 54 or buf[0:2] != b"BM":
        raise NotImplementedError(
            "only uncompressed 24-bit BMP decodes in-sandbox; other "
            "formats need an external codec (PIL/libjpeg)"
        )
    off = int.from_bytes(buf[10:14], "little")
    width = int.from_bytes(buf[18:22], "little", signed=True)
    height = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    compression = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        raise NotImplementedError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})"
        )
    top_down = height < 0
    h = abs(height)
    stride = ((width * 3 + 3) // 4) * 4  # rows pad to 4 bytes
    need = off + stride * h
    if len(buf) < need:
        raise ValueError(f"truncated BMP: {len(buf)} bytes, need {need}")
    raw = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
    if not top_down:
        rows = rows[::-1]  # stored bottom-up
    return width, h, rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_pnm(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy decoder for binary netpbm images: P6 (PPM, RGB) and
    P5 (PGM, grayscale — replicated to 3 channels).

    Returns (width, height, pixels[h, w, 3] uint8 RGB). Header
    comments (``#`` to end of line) are skipped per the spec; 2-byte
    (maxval > 255) samples raise ``NotImplementedError``."""
    if len(buf) < 2 or buf[0:1] != b"P" or buf[1:2] not in (b"5", b"6"):
        raise NotImplementedError(
            "only binary PPM (P6) / PGM (P5) decode in-sandbox")
    rgb = buf[1:2] == b"6"
    pos = 2
    tokens: list[bytes] = []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        tokens.append(buf[start:pos])
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit PNM samples unsupported")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNM dimensions {w}x{h}")
    nch = 3 if rgb else 1
    need = w * h * nch
    if len(buf) - pos < need:
        raise ValueError(
            f"truncated PNM: {len(buf) - pos} payload bytes, need {need}")
    px = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos) \
        .reshape(h, w, nch)
    if not rgb:
        px = np.repeat(px, 3, axis=2)
    return w, h, px.copy()


def decode_image(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Magic-dispatched real image decode: BMP (``BM``), binary PPM
    (``P6``), binary PGM (``P5``). Anything else (JPEG/PNG/...) raises
    ``NotImplementedError`` — compressed codecs are out of scope
    in-sandbox."""
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:2] in (b"P5", b"P6"):
        return decode_pnm(buf)
    raise NotImplementedError(
        "only BMP/PPM/PGM decode in-sandbox; compressed formats need an "
        "external codec (PIL/libjpeg)"
    )


def _image_features(buf: bytes) -> tuple[int, int, np.ndarray]:
    w, h, px = decode_image(buf)
    # 16-bin histogram of integer luminance (Rec.601 weights, scaled to
    # integers so the result is platform-deterministic)
    lum = (px[:, :, 0].astype(np.uint32) * 299
           + px[:, :, 1].astype(np.uint32) * 587
           + px[:, :, 2].astype(np.uint32) * 114) // 1000
    hist = np.bincount((lum >> 4).ravel(), minlength=16).astype(np.float32)
    norm = hist.sum()
    return w, h, hist / norm if norm else hist


def _fake_decode(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a codec: pretend the payload is a
    (w, h) image derived from its length and produce a 16-bin byte
    histogram as the feature vector."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    w = int(max(1, len(buf) % 640))
    h = int(max(1, (len(buf) // 640) + 1))
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    norm = hist.sum()
    return w, h, hist / norm if norm else hist


def extract_image_features(df: DataFrame, *, payload_col: str = "payload",
                           id_col: str = "item_id",
                           fake: bool = False) -> DataFrame:
    """Decode + featurize payloads via ``mapInPandas`` (Arrow batches).

    ``fake=False`` (the default) REALLY decodes uncompressed 24-bit
    BMP, binary PPM (P6) and binary PGM (P5) payloads (pure numpy,
    :func:`decode_image`) and featurizes to a 16-bin luminance
    histogram; other payloads raise NotImplementedError from the
    workers (compressed codecs need PIL/libjpeg, absent in-sandbox).
    ``fake=True`` runs the deterministic stand-in decoder through the
    identical plumbing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, buf in zip(pdf[id_col], pdf[payload_col]):
                decode = _fake_decode if fake else _image_features
                w, h, feat = decode(bytes(buf))
                rows.append((int(item_id), len(buf), w, h, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["item_id", "n_bytes", "width", "height", "features"]
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, _FEATURE_SCHEMA)


def decode_wav(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Real decoder for 16-bit PCM WAV via the stdlib ``wave`` module
    (no external codec).

    Returns (n_channels, sample_rate, samples[n_frames, n_channels]
    int16). Raises ``NotImplementedError`` for non-WAV payloads or
    non-16-bit sample widths (compressed audio needs external codecs,
    absent in-sandbox)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(buf)) as w:
            nch = w.getnchannels()
            sw = w.getsampwidth()
            rate = w.getframerate()
            nf = w.getnframes()
            raw = w.readframes(nf)
    except (wave.Error, EOFError) as exc:
        raise NotImplementedError(
            f"only RIFF/WAVE PCM decodes in-sandbox: {exc}") from exc
    if sw != 2:
        raise NotImplementedError(
            f"only 16-bit PCM supported (got {8 * sw}-bit)")
    samples = np.frombuffer(raw, dtype="<i2")
    n = (len(samples) // nch) * nch
    return nch, rate, samples[:n].reshape(-1, nch)


def _wav_features(buf: bytes) -> tuple[int, int, int, float, np.ndarray]:
    nch, rate, samples = decode_wav(buf)
    mono = samples.astype(np.int64).sum(axis=1) // max(nch, 1) \
        if samples.size else np.zeros(0, dtype=np.int64)
    # 16-bin histogram of |amplitude| (integer bucketing → deterministic)
    hist = np.bincount(
        np.minimum(np.abs(mono) >> 11, 15).astype(np.int64), minlength=16
    ).astype(np.float32) if mono.size else np.zeros(16, dtype=np.float32)
    norm = hist.sum()
    rms = float(np.sqrt(np.mean((mono.astype(np.float64)) ** 2))) \
        if mono.size else 0.0
    return nch, rate, len(mono), rms, hist / norm if norm else hist


def extract_audio_features(df: DataFrame, *, payload_col: str = "payload",
                           id_col: str = "item_id") -> DataFrame:
    """Decode + featurize 16-bit PCM WAV payloads via ``mapInPandas``
    (Arrow batches): (item_id, n_bytes, n_channels, sample_rate,
    n_samples, duration_sec, rms, features) where features is a 16-bin
    |amplitude| histogram of the channel-mixed signal. Same bounded-
    batch, zero-driver plumbing as :func:`extract_image_features`."""
    schema = ("item_id long, n_bytes long, n_channels int, "
              "sample_rate int, n_samples long, duration_sec double, "
              "rms double, features array<float>")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf)
                nch, rate, n, rms, feat = _wav_features(buf)
                rows.append((int(item_id), len(buf), nch, rate, n,
                             n / rate if rate else 0.0, rms, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["item_id", "n_bytes", "n_channels",
                               "sample_rate", "n_samples", "duration_sec",
                               "rms", "features"]
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def resize_nn(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample of an (h, w, 3) uint8
    image to (out_h, out_w, 3): source index = floor(i * in / out) —
    pure integer arithmetic, platform-stable."""
    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]


def resize_images(df: DataFrame, *, out_w: int = 64, out_h: int = 64,
                  payload_col: str = "payload", id_col: str = "item_id",
                  fake: bool = False) -> DataFrame:
    """Decode + nearest-neighbor resize via ``mapInPandas`` (Arrow
    batches). Output (item_id, width, height, out_width, out_height,
    pixels) where pixels is the packed row-major RGB bytes of the
    resized image. Real path decodes BMP/PPM/PGM; ``fake=True``
    substitutes a deterministic length-derived gradient image for any
    payload (same plumbing, no codec)."""
    schema = ("item_id long, width int, height int, out_width int, "
              "out_height int, pixels binary")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf)
                if fake:
                    arr = np.frombuffer(buf, dtype=np.uint8)
                    w = int(max(1, len(buf) % 640))
                    h = int(max(1, (len(buf) // 640) + 1))
                    px = np.resize(arr, (h, w, 3))
                else:
                    w, h, px = decode_image(buf)
                small = resize_nn(px, out_w, out_h)
                rows.append((int(item_id), w, h, out_w, out_h,
                             small.tobytes()))
            yield pd.DataFrame(
                rows, columns=["item_id", "width", "height",
                               "out_width", "out_height", "pixels"]
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def frame_sample(df: DataFrame, *, every_n_bytes: int = 4096,
                 payload_col: str = "payload",
                 id_col: str = "item_id") -> DataFrame:
    """'Frame' sampling stand-in: emit one row per every_n_bytes chunk
    (the video-frame-sampling shape: one input row → many sampled rows),
    all metadata JVM-side via posexplode over a computed chunk index."""
    n_chunks = F.greatest(
        F.lit(1), F.ceil(F.length(payload_col) / F.lit(every_n_bytes))
    ).cast("int")
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("frame_no", "_"),
    ).select(id_col, "frame_no")
