"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Capability gap vs the reference (SURVEY.md §2C). The Spark-side plumbing is
real and tested: schemas, Arrow-batched ``mapInPandas`` transforms, batch
shapes, partition sizing. Codecs:

- ``decoder="bmp"`` — REAL pixel math, dependency-free: a pure-numpy codec
  for uncompressed 24-bit BI_RGB BMP (encode + decode + nearest-neighbor
  resize + channel statistics). End-to-end image work (decode → resize →
  re-encode → stats) runs on actual decoded pixels.
- ``decoder="fake"`` — deterministic hash-derived stand-ins for compressed
  formats (JPEG/WAV/MP4) whose codec libraries are not in this container;
  tests stay reproducible.
- ``decoder="real"`` — raises ``NotImplementedError`` naming the
  integration point (PIL/ffmpeg) for compressed formats.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; keep
``spark.sql.files.maxPartitionBytes`` modest (binary rows are fat) and
repartition before decode so each Arrow batch holds a bounded number of
blobs (``spark.sql.execution.arrow.maxRecordsPerBatch``). Decode is the one
place Python is unavoidable → Arrow-batched ``mapInPandas``, never per-row
UDFs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<width: int, height: int, sample_rate: int, n_frames: int>"
)

_FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes int, feature array<float>"
_THUMB_SCHEMA = "media_id bigint, width int, height int, thumb binary"
_FRAME_SCHEMA = "media_id bigint, frame_idx int, frame binary"


# -- pure-numpy BMP codec (uncompressed 24-bit BI_RGB) ----------------------
#
# The one raster format decodable with zero codec dependencies: 14-byte
# file header + 40-byte BITMAPINFOHEADER + BGR rows padded to 4 bytes,
# bottom-up (positive height) or top-down (negative height). This makes
# the multimodal pipeline's pixel math REAL — decode/resize/stats run on
# actual image bytes — while compressed formats stay honestly gated.

_BMP_HEADER_SIZE = 14
_BMP_DIB_SIZE = 40


def encode_bmp(arr) -> bytes:
    """uint8 H×W×3 RGB array → uncompressed 24-bit BMP bytes (bottom-up)."""
    import numpy as np

    arr = np.asarray(arr, dtype="uint8")
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected H×W×3 RGB array, got shape {arr.shape}")
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    off = _BMP_HEADER_SIZE + _BMP_DIB_SIZE
    header = (
        b"BM"
        + (off + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
    )
    dib = (
        _BMP_DIB_SIZE.to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)  # positive → bottom-up
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 dpi
        + (0).to_bytes(4, "little") * 2  # palette
    )
    padded = np.zeros((h, row_size), dtype="uint8")
    padded[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    return header + dib + padded.tobytes()


def decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP bytes → uint8 H×W×3 RGB numpy array.
    Handles bottom-up and top-down rows; anything else (compression,
    other bit depths) raises ValueError naming what it saw."""
    import numpy as np

    if payload is None or len(payload) < _BMP_HEADER_SIZE + _BMP_DIB_SIZE:
        raise ValueError("not a BMP: payload too short")
    if payload[:2] != b"BM":
        raise ValueError(f"not a BMP: magic {payload[:2]!r}")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported, got bpp={bpp} "
            f"compression={compression}"
        )
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype="uint8", count=row_size * h, offset=off)
    rows = data.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resize with integer source mapping
    ``src = (dst * src_size) // dst_size`` — exactly replicable in SQL."""
    import numpy as np

    h0, w0 = arr.shape[:2]
    ys = (np.arange(height) * h0) // height
    xs = (np.arange(width) * w0) // width
    return arr[ys][:, xs]


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    sha256(payload) scaled to [0,1). Replace with a real decoder+model when
    codec libs are available."""
    digest = hashlib.sha256(payload or b"").digest()
    return [digest[i] / 255.0 for i in range(dim)]


def _bmp_feature(payload: bytes, dim: int) -> list[float]:
    """Real decoded-pixel features: per-channel mean/255 (3), per-channel
    std/255 (3), then width/1024 and height/1024 — trimmed or zero-padded
    to ``dim``."""
    import numpy as np

    arr = decode_bmp(payload).astype("float64")
    h, w = arr.shape[:2]
    feats = (
        list(arr.reshape(-1, 3).mean(axis=0) / 255.0)
        + list(arr.reshape(-1, 3).std(axis=0) / 255.0)
        + [w / 1024.0, h / 1024.0]
    )
    return [float(x) for x in (feats + [0.0] * dim)[:dim]]


def extract_features(df: DataFrame, decoder: str = "fake", dim: int = 8) -> DataFrame:
    """binary content → fixed-width feature vector via Arrow-batched
    ``mapInPandas`` (one Python roundtrip per Arrow batch, not per row).
    ``decoder="bmp"`` computes features from REAL decoded pixels
    (:func:`_bmp_feature`); ``"fake"`` hashes the raw bytes."""
    if decoder == "real":
        raise NotImplementedError(
            "real compressed-media decode requires codec libraries (PIL/"
            "ffmpeg) not present in this environment; use decoder='bmp' for "
            "uncompressed BMP images, or integrate by replacing _fake_feature"
        )
    feature = _bmp_feature if decoder == "bmp" else _fake_feature

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["content"].map(lambda b: feature(b, dim)),
                }
            )

    return df.mapInPandas(compute, schema=_FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, decoder: str = "fake") -> DataFrame:
    """Image resize. ``decoder="bmp"``: REAL — decode the BMP, nearest-
    neighbor resize on actual pixels (integer source mapping, see
    :func:`resize_nearest`), re-encode as BMP into ``thumb``.
    ``"fake"``: deterministic pseudo-thumbnail (hash of content) for
    compressed formats without codec libs."""
    if decoder == "real":
        raise NotImplementedError(
            "real compressed-image resize requires PIL/opencv; use "
            "decoder='bmp' for uncompressed BMP"
        )

    if decoder == "bmp":
        def thumb(b):
            return encode_bmp(resize_nearest(decode_bmp(b), width, height))
    else:
        def thumb(b):
            return hashlib.sha256(b or b"").digest()[:64]

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "thumb": pdf["content"].map(thumb),
                }
            )

    return df.mapInPandas(compute, schema=_THUMB_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, decoder: str = "fake") -> DataFrame:
    """Stubbed video frame sampling: one output row per sampled frame index
    (n_frames metadata drives fan-out); real ffmpeg decode wires in here."""
    if decoder == "real":
        raise NotImplementedError("real frame sampling requires ffmpeg bindings")
    exploded = df.select(
        "media_id",
        "content",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame": [
                        hashlib.sha256((b or b"") + int(i).to_bytes(4, "big")).digest()
                        for b, i in zip(pdf["content"], pdf["frame_idx"])
                    ],
                }
            )

    return exploded.mapInPandas(compute, schema=_FRAME_SCHEMA)


_STATS_SCHEMA = (
    "media_id bigint, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint"
)


def synthesize_bmp(
    df: DataFrame, id_col: str = "media_id", width: int = 8, height: int = 6
) -> DataFrame:
    """Deterministic test-pattern generator: one real BMP per input row.

    Pixel formula (the external-oracle contract — integer math, exactly
    replicable in SQL):

        r(x, y) = (id*7  + x*13 + y*17) % 256
        g(x, y) = (id*11 + x*3  + y*5 ) % 256
        b(x, y) = (id*13 + x*23 + y*29) % 256

    Output is MEDIA_SCHEMA with ``content`` = the encoded 24-bit BMP, so
    downstream decode/resize/stats operators exercise a genuine binary
    roundtrip rather than formula pass-through."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys, xs = np.mgrid[0:height, 0:width]
        for pdf in batches:
            content = []
            for mid in pdf[id_col]:
                mid = int(mid)
                arr = np.stack(
                    [
                        (mid * 7 + xs * 13 + ys * 17) % 256,
                        (mid * 11 + xs * 3 + ys * 5) % 256,
                        (mid * 13 + xs * 23 + ys * 29) % 256,
                    ],
                    axis=-1,
                ).astype("uint8")
                content.append(encode_bmp(arr))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": "image",
                    "content": content,
                    "meta": [
                        {"width": width, "height": height,
                         "sample_rate": None, "n_frames": None}
                    ] * len(pdf),
                }
            )

    return df.mapInPandas(gen, schema=MEDIA_SCHEMA)


def image_stats(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Decode each BMP and emit exact integer channel sums — the
    float-free observable that pins real pixel math end-to-end (means
    would round; int64 sums of uint8 pixels compare bit-exactly against
    any external reimplementation)."""
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "sum_r": [], "sum_g": [], "sum_b": []}
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                arr = decode_bmp(payload)
                sums = arr.reshape(-1, 3).astype("int64").sum(axis=0)
                out["media_id"].append(int(mid))
                out["height"].append(arr.shape[0])
                out["width"].append(arr.shape[1])
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return df.mapInPandas(compute, schema=_STATS_SCHEMA)


def stage_multimodal(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "multimodal", "op": "extract_features"|"resize"|
    "sample_frames", "decoder": "fake"|"real", ...}``."""
    op = spec.get("op", "extract_features")
    decoder = spec.get("decoder", "fake")
    if op == "extract_features":
        return extract_features(df, decoder, int(spec.get("dim", 8)))
    if op == "resize":
        return resize_images(df, int(spec["width"]), int(spec["height"]), decoder)
    if op == "sample_frames":
        return sample_frames(df, int(spec.get("every_n", 10)), decoder)
    if op == "synthesize_bmp":
        return synthesize_bmp(
            df, spec.get("id_col", "media_id"),
            int(spec.get("width", 8)), int(spec.get("height", 6)),
        )
    if op == "image_stats":
        return image_stats(
            df, spec.get("content_col", "content"),
            spec.get("id_col", "media_id"),
        )
    raise ValueError(f"Unknown multimodal op {op!r}")
