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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(content: bytes) -> np.ndarray:
    """Stdlib PNG decode (RFC 2083): chunk walk -> IHDR -> zlib-inflated
    IDAT -> per-scanline unfilter (None/Sub/Up/Average/Paeth). Supports
    8-bit gray/RGB/palette/gray+alpha/RGBA, non-interlaced — the
    overwhelmingly common emitted forms; 16-bit and Adam7 raise
    NotImplementedError, structural damage raises ValueError (callers
    quarantine). Returns float32 (h, w[, ch]) in [0, 1].

    Closes the reference's image-source gap as far as pure stdlib allows
    (processer/image_processor.py — there PIL-backed; OCR itself stays
    env-blocked). Per-scanline work: Up and the lane-cumsum Sub filters are
    vectorized; Average/Paeth run a per-byte loop (sequential by spec) —
    per-blob decode cost, parallel across blobs via the Arrow kernel."""
    import struct
    import zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(content):
        ln, typ = struct.unpack_from(">I4s", content, pos)
        data = content[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            if ln != 13:
                raise ValueError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth == 16:
        raise NotImplementedError("16-bit PNG not supported")
    if interlace:
        raise NotImplementedError("interlaced (Adam7) PNG not supported")
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG header (depth={depth}, comp={comp}, filter={filt})")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"bad PNG color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without PLTE")
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise ValueError("bad PNG dimensions")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from None
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    p = 0
    for y in range(h):
        f = raw[p]
        line = np.frombuffer(raw, np.uint8, stride, p + 1)
        p += stride + 1
        if f == 0:  # None
            rec = line.copy()
        elif f == 1:  # Sub: per-channel lane is a cumulative sum mod 256
            rec = line.reshape(w, bpp).astype(np.int64).cumsum(axis=0)
            rec = (rec & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: fully vectorized, uint8 wraps mod 256
            rec = line + prev
        elif f in (3, 4):  # Average / Paeth: sequential by spec
            rec = np.empty(stride, dtype=np.uint8)
            ln_l, pr_l, rc = line.tolist(), prev.tolist(), [0] * stride
            if f == 3:
                for x in range(stride):
                    left = rc[x - bpp] if x >= bpp else 0
                    rc[x] = (ln_l[x] + ((left + pr_l[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    left = rc[x - bpp] if x >= bpp else 0
                    ul = pr_l[x - bpp] if x >= bpp else 0
                    rc[x] = (ln_l[x] + _paeth(left, pr_l[x], ul)) & 0xFF
            rec[:] = rc
        else:
            raise ValueError(f"bad PNG filter type {f} on scanline {y}")
        out[y] = rec
        prev = rec
    if ctype == 3:  # palette -> RGB
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        idx = out.reshape(h, w)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return pal[idx].astype(np.float32) / 255.0
    arr = out.reshape((h, w) if channels == 1 else (h, w, channels))
    return arr.astype(np.float32) / 255.0


def encode_png(img: np.ndarray, filter_type: int | None = None) -> bytes:
    """Minimal stdlib PNG writer (8-bit gray or RGB, non-interlaced): the
    thumbnail/export twin of _decode_png. ``filter_type`` pins one filter
    for every scanline (0..4); default picks Up — cheap and effective on
    photographic gradients. Input: uint8 (h, w[, 3]) or float in [0, 1]."""
    import struct
    import zlib

    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        ctype, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype, channels = 2, 3
    else:
        raise ValueError("encode_png expects (h, w) gray or (h, w, 3) RGB")
    h, w = img.shape[:2]
    flat = img.reshape(h, w * channels)
    bpp = channels
    f = 2 if filter_type is None else int(filter_type)
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        line = flat[y]
        raw.append(f)
        if f == 0:
            raw += line.tobytes()
        elif f == 1:
            shifted = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            raw += (line - shifted).tobytes()
        elif f == 2:
            raw += (line - prev).tobytes()
        elif f in (3, 4):
            ln_l, pr_l = line.tolist(), prev.tolist()
            ft = bytearray(len(ln_l))
            for x in range(len(ln_l)):
                left = ln_l[x - bpp] if x >= bpp else 0
                if f == 3:
                    pred = (left + pr_l[x]) >> 1
                else:
                    ul = pr_l[x - bpp] if x >= bpp else 0
                    pred = _paeth(left, pr_l[x], ul)
                ft[x] = (ln_l[x] - pred) & 0xFF
            raw += ft
        else:
            raise ValueError(f"bad filter type {f}")
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def decode_image(content: bytes) -> np.ndarray:
    """Real decode for the stdlib-parsable formats (netpbm P5/P6, 24-bit
    uncompressed BMP, 8-bit non-interlaced PNG via zlib); JPEG and other
    codec formats still need an injected codec-backed decoder — those
    libraries are not in this container."""
    if content[:2] in (b"P5", b"P6"):
        return _decode_ppm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[:8] == _PNG_SIG:
        return _decode_png(content)
    raise NotImplementedError(
        "codec image formats (JPEG/WebP/...) unavailable in this "
        "environment; inject a decoder (e.g. PIL/opencv-based) or use "
        "fake_decoder for tests"
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
    skip_corrupt: bool = True,
) -> DataFrame:
    """Decode + pool each media blob into a fixed-size feature vector.

    One kernel invocation per Arrow batch; the per-blob decode is the only
    per-item step (inherent — codecs are per-blob), everything around it is
    vectorized numpy.

    ``skip_corrupt`` (default): a blob the decoder rejects yields
    feature=NULL + its error in ``decode_error`` instead of throwing —
    same quarantine contract as io.read_documents; at web scale one
    truncated upload must not abort a million-blob job. Filter
    ``decode_error IS NOT NULL`` to audit rejects; pass False for
    fail-fast."""
    schema = "media_id string, n_bytes int, feature array<float>, decode_error string"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, sizes, errs = [], [], []
            for content in pdf["content"]:
                raw = bytes(content) if content is not None else b""
                try:
                    img = decoder(raw)
                except Exception as e:
                    if not skip_corrupt:
                        raise
                    feats.append(None)
                    sizes.append(len(raw))
                    errs.append(f"{type(e).__name__}: {e}"[:500])
                    continue
                flat = img.ravel()
                # mean-pool into out_dim buckets (vectorized reshape trick)
                pad = (-len(flat)) % out_dim
                pooled = np.pad(flat, (0, pad)).reshape(out_dim, -1).mean(axis=1)
                feats.append(pooled.astype(np.float32).tolist())
                sizes.append(len(raw))
                errs.append(None)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "n_bytes": sizes,
                 "feature": feats, "decode_error": errs}
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
