"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads ride through the engine as binary columns
with a metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` kernels so a 100 TB corpus streams
through Python in bounded batches with zero driver involvement.

The decode step itself is STUBBED (the sandbox has no image/audio
codecs): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (shape +
byte-histogram features from the raw payload) exercises the real
plumbing — schema, partitioning, UDF signature, Arrow batch shape — the
parts that must be correct at scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["attach_metadata", "extract_image_features", "frame_sample"]

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

    Real decode requires an image codec — not present in this
    environment — so ``fake=False`` raises NotImplementedError from the
    workers; ``fake=True`` runs the deterministic stand-in through the
    identical plumbing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, buf in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    raise NotImplementedError(
                        "image decode requires a codec (PIL/libjpeg) not "
                        "available in this environment; pass fake=True for "
                        "the deterministic stand-in"
                    )
                w, h, feat = _fake_decode(bytes(buf))
                rows.append((int(item_id), len(buf), w, h, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["item_id", "n_bytes", "width", "height", "features"]
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, _FEATURE_SCHEMA)


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
