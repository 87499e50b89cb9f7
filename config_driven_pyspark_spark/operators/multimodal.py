"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Capability gap vs the reference (SURVEY.md §2C). The Spark-side plumbing is
real and tested: schemas, Arrow-batched ``mapInPandas`` transforms, batch
shapes, partition sizing. Codecs:

- ``decoder="bmp"`` — REAL pixel math, dependency-free: a pure-numpy codec
  for uncompressed 24-bit BI_RGB BMP (encode + decode + nearest-neighbor
  resize + channel statistics). End-to-end image work (decode → resize →
  re-encode → stats) runs on actual decoded pixels.
- ``decoder="png"`` — REAL compressed-image math, dependency-free: an
  8-bit-RGB non-interlaced PNG codec over stdlib zlib with full scanline
  (de)filtering (None/Sub/Up/Average/Paeth) and chunk CRC verification.
  Other depths/color types/interlacing stay gated with named errors.
- WAV codec — REAL audio sample math, dependency-free: a pure-numpy
  PCM16 RIFF/WAVE encoder/decoder with proper chunk walking, integer
  decimation, and exact int64 sample statistics (the audio counterpart
  of the BMP path). Compressed audio (MP3/AAC/OGG) stays gated.
- GIF codec (r13) — REAL palette + LZW math, dependency-free: GIF89a
  encode and GIF87a/89a first-frame decode with genuine variable-width
  little-endian LZW (3..12-bit codes, clear/EOI, 4096-entry resets,
  KwKwK, deferred-clear streams), global/local color tables, sub-block
  framing. Interlaced images stay gated with a named error; >256-color
  encodes refuse rather than quantizing silently.
- ``decoder="fake"`` — deterministic hash-derived stand-ins for compressed
  formats (JPEG/MP4) whose codec libraries are not in this container;
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


def _raster_feature(payload: bytes, dim: int) -> list[float]:
    """Real decoded-pixel features (BMP, PNG or baseline JPEG via magic
    sniff): per-channel mean/255 (3), per-channel std/255 (3), then
    width/1024 and height/1024 — trimmed or zero-padded to ``dim``."""
    arr = decode_image(payload).astype("float64")
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
    ``decoder="bmp"`` / ``"png"`` / ``"jpeg"`` / ``"image"`` compute
    features from REAL decoded pixels (:func:`_raster_feature`, which
    magic-sniffs all three formats — "image" is the explicit
    mixed-column spelling); ``"fake"`` hashes the raw bytes."""
    if decoder == "real":
        raise NotImplementedError(
            "real decode of formats beyond BMP/PNG/baseline-JPEG requires "
            "codec libraries (PIL/ffmpeg) not present in this environment; "
            "use decoder='bmp'/'png'/'jpeg' (or 'image' for a mixed "
            "column), or integrate by replacing _fake_feature"
        )
    feature = (
        _raster_feature if decoder in ("bmp", "png", "jpeg", "image")
        else _fake_feature
    )

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
    """Image resize. ``decoder="bmp"`` / ``"png"`` / ``"jpeg"``: REAL —
    decode (magic-sniffed, so a mixed column still decodes), nearest-
    neighbor resize on actual pixels (integer source mapping, see
    :func:`resize_nearest`), re-encode in the NAMED format into
    ``thumb`` (jpeg thumbnails are baseline, quality 90). ``"fake"``:
    deterministic pseudo-thumbnail (hash of content) for formats
    without codec libs."""
    if decoder == "real":
        raise NotImplementedError(
            "real resize of formats beyond BMP/PNG/baseline-JPEG requires "
            "PIL/opencv; use decoder='bmp', 'png' or 'jpeg'"
        )

    if decoder in ("bmp", "png", "jpeg"):
        enc = {
            "bmp": encode_bmp, "png": encode_png, "jpeg": encode_jpeg,
        }[decoder]

        def thumb(b):
            return enc(resize_nearest(decode_image(b), width, height))
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
    (n_frames metadata drives fan-out). For REAL frame sampling over
    MJPEG-in-AVI payloads use :func:`sample_frame_stats` (r10 — container
    walk + genuine JPEG decode); real-world codecs (H.264/VP9) wire in
    here behind decoder="real"."""
    if decoder == "real":
        raise NotImplementedError(
            "real frame sampling for compressed video codecs requires "
            "ffmpeg bindings; MJPEG-in-AVI decodes dependency-free via "
            "sample_frame_stats / multimodal op 'frame_stats'"
        )
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
    """Decode each image (BMP or PNG, magic-sniffed) and emit exact
    integer channel sums — the float-free observable that pins real
    pixel math end-to-end (means would round; int64 sums of uint8
    pixels compare bit-exactly against any external reimplementation)."""
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "sum_r": [], "sum_g": [], "sum_b": []}
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                arr = decode_image(payload)
                sums = arr.reshape(-1, 3).astype("int64").sum(axis=0)
                out["media_id"].append(int(mid))
                out["height"].append(arr.shape[0])
                out["width"].append(arr.shape[1])
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return df.mapInPandas(compute, schema=_STATS_SCHEMA)


_AHASH_SCHEMA = "media_id bigint, width int, height int, ahash bigint"


def image_ahash(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    hash_size: int = 8,
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint — the LAION-style
    image near-dup primitive: decode (BMP or PNG, magic-sniffed) →
    nearest-neighbor resize to ``hash_size``ײ on real pixels → integer
    grayscale ``(r+g+b) // 3`` → bit ``y*hash_size+x`` set iff
    ``gray * n_cells > sum(grays)`` (exact integer mean comparison —
    float-free, so an external oracle replays every bit) → packed
    row-major into one signed 64-bit code.  Feed the codes to
    ``dedup.hamming_pairs`` for sub-quadratic near-dup detection.

    Scale: one Arrow-batched ``mapInPandas`` pass, map-only — the image
    corpus streams through in batches, emitting 8 bytes per image; the
    pair step on the codes is the banded Hamming join, never an image
    self-join."""
    import numpy as np

    if hash_size <= 0 or hash_size * hash_size > 64:
        raise ValueError("hash_size^2 must be in 1..64 bits")
    n_cells = hash_size * hash_size

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "ahash": []}
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                arr = decode_image(payload)
                small = resize_nearest(arr, hash_size, hash_size)
                gray = small.astype("int64").sum(axis=-1) // 3
                total = int(gray.sum())
                code = 0
                for y in range(hash_size):
                    for x in range(hash_size):
                        if int(gray[y, x]) * n_cells > total:
                            code |= 1 << (y * hash_size + x)
                if code >= 1 << 63:
                    code -= 1 << 64
                out["media_id"].append(int(mid))
                out["height"].append(arr.shape[0])
                out["width"].append(arr.shape[1])
                out["ahash"].append(code)
            yield pd.DataFrame(out)

    return df.mapInPandas(compute, schema=_AHASH_SCHEMA)


# -- pure-stdlib PNG codec (8-bit RGB, non-interlaced) ----------------------
#
# PNG is decodable with zero codec dependencies because its only
# compression is stdlib zlib (RFC 1950/1951) plus five per-scanline byte
# filters (W3C PNG spec §9: None/Sub/Up/Average/Paeth). This closes the
# "compressed codecs honestly gated" gap the way the BMP codec did for
# uncompressed rasters: a REAL compressed-image roundtrip — chunk CRCs,
# inflate, defilter — on actual pixel bytes. Scope gates (bit depths
# other than 8, palette/alpha/gray color types, interlacing) raise a
# named NotImplementedError rather than mis-parsing.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step) —
# shared by the encoder (sub-image extraction) and decoder (scatter)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_filter_rows(arr, filter_type: int):
    """Apply one scanline filter to an H×W×3 image → (h, 1+w*3) bytes
    (filter byte + filtered row). Each filter references ORIGINAL
    pixel bytes only, so uint8 wraparound subtraction over shifted
    views is the whole computation. Shared by the sequential writer
    (whole image) and the Adam7 writer (per sub-image — each pass
    filters independently per spec)."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    rows = arr.reshape(h, w * 3)
    left = np.zeros_like(rows)
    left[:, 3:] = rows[:, :-3]  # recon of the pixel to the left (a)
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]  # recon of the pixel above (b)
    upleft = np.zeros_like(rows)
    upleft[1:, 3:] = rows[:-1, :-3]  # recon above-left (c)
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        filt = rows - left
    elif filter_type == 2:
        filt = rows - up
    elif filter_type == 3:
        filt = rows - (
            (left.astype("uint16") + up.astype("uint16")) // 2
        ).astype("uint8")
    else:  # Paeth
        a = left.astype("int16")
        b = up.astype("int16")
        c = upleft.astype("int16")
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where(
            (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
        ).astype("uint8")
        filt = rows - pred
    return np.concatenate(
        [np.full((h, 1), filter_type, dtype="uint8"), filt], axis=1
    )


def encode_png(arr, filter_type: int = 0, interlaced: bool = False) -> bytes:
    """uint8 H×W×3 RGB array → PNG bytes (color type 2 truecolor, bit
    depth 8). ``filter_type`` 0-4 applies that scanline filter to
    every row (0 = None; Sub/Up/Average/Paeth exist both to shrink the
    IDAT and to exercise every defilter path in tests — decoded pixels
    are identical whichever is used). ``interlaced`` writes the seven
    Adam7 passes (r15), each filtered independently per spec; empty
    passes contribute no bytes."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(arr, dtype="uint8")
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected H×W×3 RGB array, got shape {arr.shape}")
    if filter_type not in range(5):
        raise ValueError(f"PNG filter type must be 0-4, got {filter_type}")
    h, w, _ = arr.shape
    if interlaced:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = arr[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                parts.append(
                    _png_filter_rows(sub, filter_type).tobytes()
                )
        raw = b"".join(parts)
    else:
        raw = _png_filter_rows(arr, filter_type).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlaced else 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """PNG bytes → uint8 H×W×3 RGB numpy array. Real decode: chunk walk
    with CRC verification, concatenated-IDAT inflate, per-scanline
    defiltering (None/Sub/Up/Average/Paeth). Supported surface is 8-bit
    truecolor non-interlaced (what :func:`encode_png` emits); other
    depths/color types/interlacing raise a named gate."""
    import struct
    import zlib

    import numpy as np

    if payload is None or len(payload) < len(_PNG_SIG) + 12:
        raise ValueError("not a PNG: payload too short")
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError(f"not a PNG: magic {payload[:8]!r}")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 12 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + size]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + size:pos + 12 + size]
        )
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(
                f"PNG chunk {ctype!r} CRC mismatch (corrupt payload)"
            )
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("PNG payload missing IHDR/IDAT chunk")
    w, h, depth, color, comp, fmeth, interlace = ihdr
    if depth != 8 or color != 2 or interlace not in (0, 1):
        raise NotImplementedError(
            f"only 8-bit truecolor PNG (sequential or Adam7) is decoded "
            f"dependency-free (got depth={depth} color_type={color} "
            f"interlace={interlace}); route other PNGs through "
            "decoder='real' (PIL integration point)"
        )
    if comp != 0 or fmeth != 0:
        raise ValueError(
            f"invalid PNG compression/filter method {comp}/{fmeth}"
        )
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype="uint8")
    if interlace == 0:
        stride = w * 3 + 1
        if raw.size != stride * h:
            raise ValueError(
                f"PNG pixel data is {raw.size} bytes, expected {stride * h}"
            )
        return _png_defilter(raw, h, w).reshape(h, w, 3).copy()
    # Adam7 (r15): seven independently-filtered sub-images concatenated
    # in the IDAT stream, scattered onto the pass grid; empty passes
    # contribute no bytes (not even filter bytes)
    out = np.zeros((h, w, 3), dtype="uint8")
    off = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        need = (pw * 3 + 1) * ph
        if off + need > raw.size:
            raise ValueError(
                f"PNG Adam7 pixel data truncated (need {need} more "
                f"bytes at offset {off}, have {raw.size - off})"
            )
        sub = _png_defilter(raw[off:off + need], ph, pw)
        out[y0::ys, x0::xs] = sub.reshape(ph, pw, 3)
        off += need
    if off != raw.size:
        raise ValueError(
            f"PNG Adam7 pixel data has {raw.size - off} trailing bytes"
        )
    return out


def _png_defilter(raw, h: int, w: int):
    """Reverse one image's scanline filters → (h, w*3) uint8. Shared
    by the sequential path (whole image) and each Adam7 sub-image
    (independently filtered per spec)."""
    import numpy as np

    lines = raw.reshape(h, w * 3 + 1)
    recon = np.zeros((h, w * 3), dtype="uint8")
    prior = np.zeros(w * 3, dtype="int32")
    for y in range(h):
        ft = int(lines[y, 0])
        line = lines[y, 1:].astype("int32")
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: recon[x] = raw[x] + recon[x-3] → per-channel
            cur = line.reshape(w, 3).cumsum(axis=0).reshape(w * 3) % 256
        elif ft == 2:  # Up
            cur = (line + prior) % 256
        elif ft == 3:  # Average — sequential left-dependency per byte
            cur = np.zeros(w * 3, dtype="int32")
            for x in range(w * 3):
                a = cur[x - 3] if x >= 3 else 0
                cur[x] = (line[x] + ((a + prior[x]) >> 1)) % 256
        elif ft == 4:  # Paeth — sequential left-dependency per byte
            cur = np.zeros(w * 3, dtype="int32")
            for x in range(w * 3):
                a = cur[x - 3] if x >= 3 else 0
                c = prior[x - 3] if x >= 3 else 0
                b = prior[x]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"invalid PNG scanline filter type {ft}")
        recon[y] = cur.astype("uint8")
        prior = cur
    return recon


def decode_image(payload: bytes):
    """Magic-sniffing raster decode: BMP (``BM``), PNG (the 8-byte PNG
    signature), baseline JPEG (``FF D8``) or GIF (``GIF87a``/``GIF89a``,
    first frame) → uint8 H×W×3 RGB array. The shared entry point for
    stats/features over mixed image columns."""
    if payload is not None and payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload is not None and payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload is not None and payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload is not None and payload[:4] == b"GIF8":
        return decode_gif(payload)
    raise ValueError(
        f"unrecognized image magic {bytes(payload or b'')[:8]!r} — "
        "dependency-free decode supports BMP, 8-bit RGB PNG, baseline "
        "JPEG, and non-interlaced GIF"
    )


# -- pure-python GIF codec (palette + variable-width LZW) --------------------
#
# The palette-indexed web format (r13, closing another honest codec gate):
# real logical-screen / image-descriptor parsing, global & local color
# tables, 255-byte sub-block framing, and genuine GIF-LZW — little-endian
# variable-width codes growing 3..12 bits with clear/EOI codes, dictionary
# resets at 4096 entries, the KwKwK case, and deferred-clear streams
# (full table, no reset) handled. Interlaced images raise a named gate;
# animations decode their FIRST frame (decode_image's contract is one
# raster — multi-frame sampling is the MJPEG-AVI path). Encoder emits
# single-frame GIF89a with a power-of-two global color table built from
# the image's distinct colors (≤256 — more raises, quantization is a
# modeling choice this engine won't make silently).


def _lzw_encode_gif(indices, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    buf = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    put(clear, width)
    w: tuple = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        put(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # encoder bumps one add AFTER the decoder's own count —
            # the classic sync: decoder bumps at next == 1<<width,
            # encoder at next == (1<<width)+1 (derivation in tests)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            put(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = (k,)
    if w:
        put(table[w], width)
    put(eoi, width)
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def _lzw_decode_gif(data: bytes, min_code_size: int, n_pixels: int):
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit cursor, little-endian
    total_bits = len(data) * 8

    def get(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("GIF LZW stream truncated")
        v = 0
        for i in range(width):
            byte = data[(pos + i) >> 3]
            v |= ((byte >> ((pos + i) & 7)) & 1) << i
        pos += width
        return v

    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = get(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # decoder bumps one add BEFORE the encoder's own count
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def encode_gif(arr, interlaced: bool = False) -> bytes:
    """uint8 H×W×3 → single-frame GIF89a with a global color table of
    the image's distinct colors (must be ≤ 256). ``interlaced`` stores
    the rows in the GIF89a four-pass order and sets the flag (r15 —
    exercises the decoder's de-interlace path)."""
    import numpy as np

    arr = np.asarray(arr, dtype="uint8")
    h, w = arr.shape[0], arr.shape[1]
    if interlaced:
        order = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2),
        ])
        arr = arr[order]
    flat = arr.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF needs a <=256-color palette, image has {len(palette)} "
            "distinct colors — quantize explicitly first (this codec "
            "never quantizes silently)"
        )
    n = 2
    while (1 << n) < len(palette):
        n += 1
    mcs = max(2, n)
    gct = bytearray()
    for r, g, b in palette:
        gct += bytes([int(r), int(g), int(b)])
    gct += b"\x00" * (((1 << n) - len(palette)) * 3)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (7 << 4) | (n - 1))  # GCT flag, color res 8
    out += b"\x00\x00"  # background index, aspect
    out += gct
    out.append(0x2C)  # image descriptor
    out += b"\x00\x00\x00\x00"  # left, top
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x40 if interlaced else 0x00)  # no LCT; interlace flag
    out.append(mcs)
    lzw = _lzw_encode_gif(indices, mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes):
    """GIF87a/GIF89a → uint8 H×W×3 RGB of the FIRST image; interlaced
    images de-interlace via the four-pass row scatter (r15)."""
    import numpy as np

    data = bytes(payload)
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError(f"not a GIF: magic {data[:6]!r}")
    try:
        return _decode_gif_body(data)
    except IndexError as e:
        raise ValueError("truncated GIF stream") from e


def _decode_gif_body(data: bytes):
    import numpy as np

    pos = 6
    sw = int.from_bytes(data[pos:pos + 2], "little")
    sh = int.from_bytes(data[pos + 2:pos + 4], "little")
    packed = data[pos + 4]
    pos += 7
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = data[pos:pos + size * 3]
        pos += size * 3
    _ = (sw, sh)
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            w = int.from_bytes(data[pos + 4:pos + 6], "little")
            h = int.from_bytes(data[pos + 6:pos + 8], "little")
            ipacked = data[pos + 8]
            pos += 9
            interlaced = bool(ipacked & 0x40)
            palette = gct
            if ipacked & 0x80:
                size = 2 << (ipacked & 0x07)
                palette = data[pos:pos + size * 3]
                pos += size * 3
            if palette is None:
                raise ValueError("GIF image has no color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode_gif(bytes(lzw), mcs, w * h), dtype="uint8"
            ).astype("int64")
            pal = np.frombuffer(palette, dtype="uint8").reshape(-1, 3)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("GIF pixel index outside color table")
            img = pal[idx].reshape(h, w, 3).copy()
            if interlaced:
                # GIF89a interlace (r15): rows are STORED in four
                # passes — every 8th from 0, every 8th from 4, every
                # 4th from 2, every 2nd from 1 — de-interlace by
                # scattering the stored row sequence to those targets
                order = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2),
                ])
                out = np.empty_like(img)
                out[order] = img
                img = out
            return img
        elif block == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"unrecognized GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def synthesize_gif(
    df: DataFrame, id_col: str = "media_id", width: int = 8, height: int = 6,
    interlaced: bool = False,
) -> DataFrame:
    """Deterministic test-pattern GIFs: the SAME integer pixel formula
    as :func:`synthesize_bmp`/:func:`synthesize_png` (one closed-form
    oracle covers every lossless codec), palette-built per image;
    ``interlaced`` stores rows in the GIF89a four-pass order (r15)."""
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
                content.append(encode_gif(arr, interlaced=interlaced))
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


def synthesize_png(
    df: DataFrame, id_col: str = "media_id", width: int = 8, height: int = 6,
    interlaced: bool = False,
) -> DataFrame:
    """Deterministic test-pattern PNGs: the SAME integer pixel formula as
    :func:`synthesize_bmp` (one closed-form oracle covers both codecs),
    but each row's scanline filter is ``id % 5`` — so a corpus of ≥5
    images exercises every PNG defilter path (None/Sub/Up/Average/
    Paeth), and any defilter slip corrupts that image's pixel sums.
    ``interlaced`` emits Adam7 streams (r15) — filters × passes."""
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
                content.append(encode_png(
                    arr, filter_type=mid % 5, interlaced=interlaced
                ))
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


# -- pure-numpy baseline JPEG codec (JFIF, Huffman, 4:2:0) -------------------
#
# The dominant web image format, decoded dependency-free like the PNG/BMP
# codecs (VERDICT r9 ask #8): real DQT/DHT/SOF0/SOS segment parsing, canonical
# Huffman decode with byte-unstuffing and restart markers, dequant, zigzag,
# float IDCT, chroma upsampling and YCbCr->RGB. The encoder emits baseline
# JFIF with the Annex-K-style tables written into DQT/DHT (the decoder always
# reads tables FROM the stream, so enc/dec are self-consistent by
# construction). Python-loop entropy decode makes this the ORACLE tier —
# exact, tiny-image-friendly; route bulk production decode through
# decoder="real" (libjpeg-turbo integration point). Progressive (SOF2),
# arithmetic (DAC), 12-bit and >3-component streams raise named gates.

_JPEG_QL = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QC = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]
# (bits[1..16], values) per table class — standard baseline tables; the
# decoder never assumes them (it parses DHT), they only seed the encoder
_JPEG_HUFF = {
    ("dc", 0): ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12))),
    ("dc", 1): ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12))),
    ("ac", 0): ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
        0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
        0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
        0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
        0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
        0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa,
    ]),
    ("ac", 1): ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
        0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
        0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
        0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
        0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
        0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
        0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
        0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa,
    ]),
}


def _jpeg_zigzag() -> list[tuple[int, int]]:
    """The 64 (row, col) pairs in JPEG zigzag order, derived (not typed):
    diagonals by r+c; even diagonals run bottom-left -> top-right."""
    return sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            -rc[0] if (rc[0] + rc[1]) % 2 == 0 else rc[0],
        ),
    )


def _jpeg_quant(quality: int) -> tuple[list[int], list[int]]:
    """Annex-K tables scaled by the libjpeg quality convention."""
    if not 1 <= quality <= 100:
        raise ValueError("JPEG quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def sc(tab):
        return [min(255, max(1, (t * scale + 50) // 100)) for t in tab]
    return sc(_JPEG_QL), sc(_JPEG_QC)


def _jpeg_dct_matrix():
    import numpy as np

    A = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return A


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) canonical assignment (ITU T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, appended bits) for a DC diff / AC value (T.81 F.1.2.1)."""
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(arr, quality: int = 90) -> bytes:
    """uint8 H×W×3 RGB array -> baseline JFIF JPEG bytes, 4:2:0 chroma
    subsampling, standard-table Huffman coding. Rounding convention is
    ``floor(x + 0.5)`` at every quantization point (symmetric with the
    decoder and replicable in plain SQL — the oracle-parity contract the
    BMP/PNG/WAV codecs established)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype="float64")
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_jpeg expects an H x W x 3 array")
    h, w = a.shape[:2]
    # pad to MCU (16x16) multiples by edge replication
    ph, pw = (-h) % 16, (-w) % 16
    a = np.pad(a, ((0, ph), (0, pw), (0, 0)), mode="edge")
    H, W = a.shape[:2]
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    # 4:2:0: average each 2x2 chroma neighborhood
    cb = (cb[0::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 0::2]
          + cb[1::2, 1::2]) / 4.0
    cr = (cr[0::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 0::2]
          + cr[1::2, 1::2]) / 4.0

    ql, qc = _jpeg_quant(quality)
    zz = _jpeg_zigzag()
    A = _jpeg_dct_matrix()
    # the Annex-K-style tables above are in NATURAL (row-major) order;
    # quantize with them directly, and reorder to zigzag for the DQT
    # segments (T.81 stores quant tables in zigzag order)
    qlnat = np.array(ql, dtype="float64").reshape(8, 8)
    qcnat = np.array(qc, dtype="float64").reshape(8, 8)
    ql_zz = [ql[zr * 8 + zc] for zr, zc in zz]
    qc_zz = [qc[zr * 8 + zc] for zr, zc in zz]

    huff = {k: _huff_codes(*v) for k, v in _JPEG_HUFF.items()}
    bw = _BitWriter()
    pred = {"y": 0, "cb": 0, "cr": 0}

    def put_block(plane, by, bx, qnat, comp, dc_tab, ac_tab):
        block = plane[by:by + 8, bx:bx + 8] - 128.0
        C = A @ block @ A.T
        # snap to the repo's 9-decimal grid before the half-up floor so
        # the oracle's closed-form double replay can never straddle a
        # rounding boundary on ~1e-12 DCT float noise
        q = np.floor(np.round(C / qnat, 9) + 0.5).astype("int64")
        seq = [int(q[zr, zc]) for zr, zc in zz]
        diff = seq[0] - pred[comp]
        pred[comp] = seq[0]
        size, bits = _mag_bits(diff)
        code, ln = dc_tab[size]
        bw.put(code, ln)
        if size:
            bw.put(bits, size)
        k = 1
        while k < 64:
            run = 0
            while k < 64 and seq[k] == 0:
                run += 1
                k += 1
            if k == 64:
                code, ln = ac_tab[0x00]  # EOB
                bw.put(code, ln)
                break
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            size, bits = _mag_bits(seq[k])
            code, ln = ac_tab[(run << 4) | size]
            bw.put(code, ln)
            bw.put(bits, size)
            k += 1

    for my in range(0, H, 16):
        for mx in range(0, W, 16):
            for dy in (0, 8):
                for dx in (0, 8):
                    put_block(y, my + dy, mx + dx, qlnat, "y",
                              huff[("dc", 0)], huff[("ac", 0)])
            put_block(cb, my // 2, mx // 2, qcnat, "cb",
                      huff[("dc", 1)], huff[("ac", 1)])
            put_block(cr, my // 2, mx // 2, qcnat, "cr",
                      huff[("dc", 1)], huff[("ac", 1)])
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0x00]) + bytes(ql_zz))
    out += seg(0xFFDB, bytes([0x01]) + bytes(qc_zz))
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for (cls, tid), (bits, vals) in _JPEG_HUFF.items():
        tc = 0 if cls == "dc" else 1
        out += seg(0xFFC4, bytes([(tc << 4) | tid]) + bytes(bits)
                   + bytes(vals))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-coded segment reader: byte-unstuffs FF00, stops at any
    other marker (exposes it for RST handling)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG scan data ended inside a block")
        if self.pos >= len(self.data):
            raise ValueError("JPEG scan data truncated")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                raise ValueError("JPEG scan hit a marker mid-block")
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def align_and_expect_rst(self, idx: int) -> None:
        """Byte-align and consume the next RSTn marker (T.81 restart)."""
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0:
                m = self.data[self.pos + 1]
                if 0xD0 <= m <= 0xD7:
                    if m - 0xD0 != idx % 8:
                        raise ValueError(
                            f"JPEG restart marker out of order: "
                            f"RST{m - 0xD0}, expected RST{idx % 8}"
                        )
                    self.pos += 2
                    return
                raise ValueError(f"expected RST marker, found FF{m:02x}")
            self.pos += 1
        raise ValueError("JPEG scan ended while seeking a restart marker")


def _huff_decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value lookup for canonical decode."""
    lut: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` received bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes):
    """Baseline JFIF JPEG bytes -> uint8 H×W×3 RGB numpy array. Real
    decode: segment walk, DQT/DHT table parse, canonical Huffman entropy
    decode (byte unstuffing + restart markers), dequantization, inverse
    zigzag, float IDCT, chroma upsampling (sample replication), BT.601
    YCbCr->RGB with ``floor(x + 0.5)`` rounding. Supports baseline
    sequential (SOF0), 8-bit, grayscale or 3-component YCbCr with
    sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0). Progressive,
    arithmetic-coded, 12-bit and CMYK streams raise named gates."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError(
            f"not a JPEG: magic {bytes(payload or b'')[:2]!r}"
        )
    data = bytes(payload)
    pos = 2
    qt: dict[int, list[int]] = {}
    hts: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG segment desync at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (size,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + size]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit JPEG quant tables are not decoded "
                        "dependency-free; route through decoder='real'"
                    )
                qt[tq] = list(body[i + 1:i + 65])
                i += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                hts[(tc, th)] = _huff_decode_tree(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG is not decoded dependency-free"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG (CMYK?) is not decoded "
                    "dependency-free"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is decoded "
                f"dependency-free (got SOF marker FF{marker:02x}, e.g. "
                "progressive/arithmetic); route through decoder='real'"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append({"id": cs, "td": tt >> 4, "ta": tt & 0x0F})
            pos = pos + 2 + size
            break
        pos += 2 + size
    if frame is None or scan_comps is None:
        raise ValueError("JPEG stream missing SOF/SOS segment")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        by_id[sc["id"]]["td"] = sc["td"]
        by_id[sc["id"]]["ta"] = sc["ta"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise NotImplementedError(
            "JPEG sampling factors above 2 are not decoded dependency-free"
        )
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    zz = _jpeg_zigzag()
    A = _jpeg_dct_matrix()
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    br = _BitReader(data, pos)

    def huff_read(tree) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.bit()
            length += 1
            v = tree.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code in scan data")

    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            br.align_and_expect_rst(m // restart_interval - 1)
            for c in comps:
                pred[c["id"]] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            dq = np.array(qt[c["tq"]], dtype="float64")
            dc_tree = hts[(0, c["td"])]
            ac_tree = hts[(1, c["ta"])]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    size = huff_read(dc_tree)
                    diff = _extend(br.bits(size), size)
                    pred[c["id"]] += diff
                    seq = np.zeros(64)
                    seq[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = huff_read(ac_tree)
                        run, sz = rs >> 4, rs & 0x0F
                        if sz == 0:
                            if run == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError(
                                "JPEG AC run overflows the block"
                            )
                        seq[k] = _extend(br.bits(sz), sz)
                        k += 1
                    block = np.zeros((8, 8))
                    deq = seq * dq
                    for i, (zr, zc) in enumerate(zz):
                        block[zr, zc] = deq[i]
                    pix = A.T @ block @ A + 128.0
                    py = (my * c["v"] + v) * 8
                    px = (mx * c["h"] + hh) * 8
                    planes[c["id"]][py:py + 8, px:px + 8] = pix

    # clamp component samples, upsample to full resolution, crop
    full = []
    for c in comps:
        p = np.clip(np.floor(np.round(planes[c["id"]], 9) + 0.5), 0, 255)
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        yp = full[0]
        rgb = np.stack([yp, yp, yp], axis=-1)
    else:
        yp, cbp, crp = full
        r = yp + 1.402 * (crp - 128.0)
        g = yp - 0.344136 * (cbp - 128.0) - 0.714136 * (crp - 128.0)
        b = yp + 1.772 * (cbp - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
    # same 9-decimal snap as the encoder's quantize (oracle parity)
    return np.clip(np.floor(np.round(rgb, 9) + 0.5), 0, 255).astype("uint8")


def synthesize_jpeg(
    df: DataFrame,
    id_col: str = "media_id",
    width: int = 16,
    height: int = 16,
    quality: int = 90,
) -> DataFrame:
    """Deterministic flat-color JPEGs: each image is a single uniform
    RGB derived from the id. A flat 16×16 image is exactly one 4:2:0
    MCU whose every DCT is DC-only, so the decoded color is a CLOSED
    FORM of (r, g, b) through quantize/dequantize — the lossy-codec
    analogue of the BMP/PNG closed-form oracles (quantization error and
    all)."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for mid in pdf[id_col]:
                mid = int(mid)
                color = np.array(
                    [(mid * 7 + 31) % 256, (mid * 11 + 59) % 256,
                     (mid * 13 + 97) % 256],
                    dtype="uint8",
                )
                arr = np.tile(color, (height, width, 1))
                content.append(encode_jpeg(arr, quality=quality))
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


# -- minimal MJPEG-in-AVI container (RIFF) -----------------------------------
#
# With the baseline JPEG codec above, VIDEO frame sampling becomes real for
# the one container+codec pair that needs zero dependencies: an AVI RIFF
# walk (the WAV skill, different chunk names) yielding per-frame JPEG
# payloads that decode_jpeg turns into pixels. Real-world codecs (H.264,
# VP9, ...) stay honestly gated behind decoder="real" (ffmpeg integration
# point).


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Wrap per-frame JPEG payloads in a minimal standards-shaped AVI:
    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    '00dc'...) 'idx1'). Every frame is a keyframe ('00dc' + AVIIF_KEYFRAME
    in idx1); chunks pad to even offsets per RIFF."""
    import struct

    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # usec per frame
        max_bytes * fps,   # max bytes/sec (advisory)
        0,                 # padding granularity
        0x10,              # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = [chunk(b"00dc", f) for f in frames]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1 offsets are relative to the start of the 'movi' fourcc
    idx, off = [], 4
    for f, ch in zip(frames, movi_chunks):
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += len(ch)
    idx1 = chunk(b"idx1", b"".join(idx))
    return chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_avi_frames(payload: bytes) -> tuple[dict, list[bytes]]:
    """AVI RIFF walk -> (header dict, per-frame compressed payloads).
    Verifies the RIFF/'AVI ' magic, parses avih (n_frames, width,
    height), and iterates the 'movi' list's '00dc'/'00db' chunks. Frames
    whose bytes are not baseline JPEG raise at decode time (the codec
    gate lives in decode_image/decode_jpeg)."""
    import struct

    if (
        payload is None or len(payload) < 12
        or payload[:4] != b"RIFF" or payload[8:12] != b"AVI "
    ):
        raise ValueError(
            f"not an AVI: magic {bytes(payload or b'')[:12]!r}"
        )
    data = bytes(payload)
    header: dict = {}
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body_start = pos + 8
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)
            elif fourcc == b"avih":
                vals = struct.unpack(
                    "<IIIIIIIIII", data[body_start:body_start + 40]
                )
                header.update(
                    n_frames=vals[4], width=vals[8], height=vals[9],
                    usec_per_frame=vals[0],
                )
            elif fourcc in (b"00dc", b"00db"):
                frames.append(data[body_start:body_start + size])
            pos = body_start + size + (size % 2)

    walk(12, len(data))
    if not header:
        raise ValueError("AVI stream missing the avih header chunk")
    return header, frames


def synthesize_avi(
    df: DataFrame,
    id_col: str = "media_id",
    n_frames: int = 8,
    width: int = 16,
    height: int = 16,
    fps: int = 10,
    quality: int = 90,
) -> DataFrame:
    """Deterministic MJPEG AVIs: frame f of media id is the flat color
    ((id*7 + f*3 + 31) % 256, (id*11 + f*5 + 59) % 256,
    (id*13 + f*7 + 97) % 256) — per-frame colors ride the same
    closed-form quantize/dequantize replay as :func:`synthesize_jpeg`,
    so sampled-frame pixel stats are value-checkable end to end through
    container walk + entropy decode."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for mid in pdf[id_col]:
                mid = int(mid)
                frames = []
                for f in range(n_frames):
                    color = np.array(
                        [(mid * 7 + f * 3 + 31) % 256,
                         (mid * 11 + f * 5 + 59) % 256,
                         (mid * 13 + f * 7 + 97) % 256],
                        dtype="uint8",
                    )
                    frames.append(encode_jpeg(
                        np.tile(color, (height, width, 1)), quality=quality
                    ))
                content.append(encode_avi_mjpeg(frames, width, height, fps))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": "video",
                    "content": content,
                    "meta": [
                        {"width": width, "height": height,
                         "sample_rate": None, "n_frames": n_frames}
                    ] * len(pdf),
                }
            )

    return df.mapInPandas(gen, schema=MEDIA_SCHEMA)


_FRAME_STATS_SCHEMA = (
    "media_id bigint, frame_idx int, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint"
)


def sample_frame_stats(
    df: DataFrame,
    every_n: int = 1,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL video frame sampling + pixel stats: walk each AVI container,
    keep frames at stride ``every_n``, decode each kept frame's JPEG
    payload, and emit exact int64 channel sums per (media, frame) — the
    float-free observable pinning the whole container+codec chain.
    Python cost is per KEPT frame only (skipped frames are never
    entropy-decoded — the container walk just slices payload bytes)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "width": [],
                   "height": [], "sum_r": [], "sum_g": [], "sum_b": []}
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                _, frames = decode_avi_frames(payload)
                for idx in range(0, len(frames), every_n):
                    arr = decode_image(frames[idx])
                    sums = arr.reshape(-1, 3).astype("int64").sum(axis=0)
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["height"].append(arr.shape[0])
                    out["width"].append(arr.shape[1])
                    out["sum_r"].append(int(sums[0]))
                    out["sum_g"].append(int(sums[1]))
                    out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return df.mapInPandas(compute, schema=_FRAME_STATS_SCHEMA)


# -- pure-numpy WAV codec (PCM16 RIFF/WAVE) ---------------------------------
#
# The audio counterpart of the BMP codec: 16-bit PCM WAV is the one audio
# container decodable with zero codec dependencies (RIFF header + 'fmt '
# chunk + little-endian int16 'data' chunk). decode → decimate → re-encode
# → stats runs on actual sample bytes; compressed audio (MP3/AAC/OGG)
# stays honestly gated behind decoder="real".

_AUDIO_STATS_SCHEMA = (
    "media_id bigint, n_samples bigint, n_channels int, sample_rate int, "
    "sum_samples bigint, sum_squares bigint, peak_abs int"
)


def encode_wav(samples, sample_rate: int) -> bytes:
    """Encode an (n, channels) int16 numpy array as a PCM16 RIFF/WAVE
    blob (little-endian, interleaved)."""
    import struct

    import numpy as np

    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    payload = samples.tobytes()  # row-major = interleaved frames
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes):
    """Decode a PCM16 RIFF/WAVE blob → ((n, channels) int16 array,
    sample_rate). Walks the chunk list properly (extra chunks like LIST
    are skipped); non-PCM16 raises ``NotImplementedError`` naming the
    gate rather than mis-parsing."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, fmt_body, data, fact_n = 12, None, b"", None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            # validate before unpacking (ADVICE r7: a truncated chunk
            # previously surfaced as a raw struct.error)
            if len(body) < 16:
                raise ValueError(
                    f"WAV 'fmt ' chunk is {len(body)} bytes, need >= 16"
                )
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"fact" and len(body) >= 4:
            fact_n = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_fmt, ch, rate, _br, block_align, bits = fmt
    if ch < 1:
        raise ValueError(f"WAV 'fmt ' chunk declares {ch} channels")
    if audio_fmt == 7 and bits == 8:
        # G.711 mu-law (r14): exact integer expansion, no tables needed
        arr = _mulaw_decode_arr(data)
        if len(arr) % ch != 0:
            raise ValueError(
                f"mu-law data chunk is {len(data)} bytes — not a whole "
                f"number of {ch}-channel frames"
            )
        return arr.reshape(-1, ch), rate
    if audio_fmt == 0x11 and bits == 4:
        # IMA-ADPCM (r14; stereo r15): mono blocks are header + nibble
        # stream; stereo blocks carry one 4-byte header per channel
        # then 4-byte words (8 nibbles = 8 samples) ALTERNATING
        # channels — word-granular interleave per the WAV spec
        if ch > 2:
            raise NotImplementedError(
                f"IMA-ADPCM decode supports mono/stereo blocks "
                f"dependency-free (stream has {ch} channels); route "
                "through decoder='real'"
            )
        if len(fmt_body) >= 20:
            spb = struct.unpack("<H", fmt_body[18:20])[0]
        else:
            spb = (block_align - 4 * ch) * 2 // ch + 1
        if block_align < 4 * ch + 1 or spb < 2:
            raise ValueError(
                f"IMA-ADPCM fmt declares block_align={block_align}, "
                f"samples_per_block={spb} — unparseable block layout"
            )
        total = fact_n
        out: list = []  # mono: ints; stereo: (L, R) frame tuples
        for off in range(0, len(data), block_align):
            block = data[off:off + block_align]
            if len(block) < 4 * ch:
                break
            want = spb
            if total is not None:
                want = min(spb, total - len(out))
                if want <= 0:
                    break
            avail = 1 + (len(block) - 4 * ch) * 2 // ch
            if ch == 1:
                out.extend(_ima_decode_block(block, min(want, avail)))
            else:
                out.extend(
                    _ima_decode_block_stereo(block, min(want, avail))
                )
        arr = np.asarray(out, dtype="<i2")
        return arr.reshape(-1, ch), rate
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"PCM16, G.711 mu-law and mono IMA-ADPCM WAV are decodable "
            f"dependency-free (got format {audio_fmt}, {bits}-bit); "
            "route compressed audio (MP3/AAC/OGG) through "
            "decoder='real' (ffmpeg integration point)"
        )
    # malformed-input diagnostics in the RIFF-check style (ADVICE r7:
    # ch=0 previously hit ZeroDivisionError in reshape, and a ragged
    # data length failed inside frombuffer/reshape)
    if len(data) % (2 * ch) != 0:
        raise ValueError(
            f"WAV data chunk is {len(data)} bytes — not a whole number "
            f"of {ch}-channel int16 frames ({2 * ch} bytes each)"
        )
    arr = np.frombuffer(data, dtype="<i2")
    return arr.reshape(-1, ch), rate


# -- G.711 mu-law + IMA-ADPCM (r14 — VERDICT r13 ask #9) ---------------------
#
# The two classic telephony/container codecs whose math is pure integer
# tables — decodable dependency-free like PCM16, closing the most-hit
# audio NotImplementedError gates. mu-law (WAV format 7) is MEMORYLESS
# (one closed-form expression per byte — an external oracle replays it
# as plain CASE math); IMA-ADPCM (WAV format 0x11) is a 4-bit
# step-adaptive state machine per block (the oracle replays it as a
# recursive CTE). MP3/AAC/OGG remain honestly gated.

_MULAW_BIAS = 0x84  # 132
_MULAW_CLIP = 32635

_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _mulaw_encode_arr(samples):
    """int16 array → mu-law bytes (ITU G.711): sign + clip + bias,
    exponent = floor(log2(x)) − 7 (exact — inputs are small ints and
    powers of two are IEEE-exact), 4-bit mantissa, ones' complement."""
    import numpy as np

    s = np.asarray(samples, dtype="int64")
    sign = np.where(s < 0, 0x80, 0)
    x = np.minimum(np.abs(s), _MULAW_CLIP) + _MULAW_BIAS
    exp = np.maximum(np.floor(np.log2(x)).astype("int64") - 7, 0)
    mant = (x >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype("uint8")


def _mulaw_decode_arr(data):
    """mu-law bytes → int16 array: the exact inverse table, computed
    arithmetically (mag = ((mant·8 + 132) << exp) − 132)."""
    import numpy as np

    u = (~np.frombuffer(bytes(data), dtype="uint8").astype("int64")) & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype("<i2")


def encode_wav_mulaw(samples, sample_rate: int) -> bytes:
    """Encode an (n,) / (n, ch) int16 array as a G.711 mu-law RIFF/WAVE
    blob (format code 7, 8 bits/sample, with the spec-required 'fact'
    chunk). Lossy by design — :func:`decode_wav` returns the exact
    G.711 expansion."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype="int64")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    payload = _mulaw_encode_arr(arr.reshape(-1)).tobytes()
    fmt = struct.pack(
        "<HHIIHHH", 7, ch, sample_rate, sample_rate * ch, ch, 8, 0
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _ima_encode_block(samples) -> bytes:
    """One mono IMA-ADPCM block: 4-byte header (sample 0 verbatim as
    int16 + start index 0) then one 4-bit nibble per remaining sample,
    low nibble first, zero-padded to whole bytes."""
    hdr, nibbles = _ima_encode_channel(samples)
    if len(nibbles) % 2:
        nibbles.append(0)
    return hdr + bytes(
        nibbles[i] | (nibbles[i + 1] << 4)
        for i in range(0, len(nibbles), 2)
    )


def _ima_reconstruct(pred: int, idx: int, nib: int) -> tuple[int, int]:
    """Shared encoder/decoder state step — the encoder tracks exactly
    what the decoder will reconstruct (the ADPCM closed loop)."""
    st = _IMA_STEP_TABLE[idx]
    diffq = st >> 3
    if nib & 4:
        diffq += st
    if nib & 2:
        diffq += st >> 1
    if nib & 1:
        diffq += st >> 2
    pred = pred - diffq if nib & 8 else pred + diffq
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
    return pred, idx


def _ima_decode_block(block: bytes, n_samples: int) -> list[int]:
    import struct

    pred, idx, _res = struct.unpack("<hBB", block[:4])
    out = [pred]
    for i in range(n_samples - 1):
        byte = block[4 + (i >> 1)]
        nib = (byte >> 4) if i & 1 else (byte & 0x0F)
        pred, idx = _ima_reconstruct(pred, idx, nib)
        out.append(pred)
    return out


def _ima_decode_block_stereo(block: bytes, n_frames: int) -> list:
    """One STEREO IMA-ADPCM block (r15): a 4-byte header per channel,
    then 4-byte words of 8 nibbles alternating L/R — returns (L, R)
    frame tuples."""
    import struct

    pred_l, idx_l, _r0 = struct.unpack("<hBB", block[0:4])
    pred_r, idx_r, _r1 = struct.unpack("<hBB", block[4:8])
    left, right = [pred_l], [pred_r]
    body = block[8:]
    for g in range(len(body) // 8):
        if len(left) >= n_frames:
            break
        wl = body[g * 8:g * 8 + 4]
        wr = body[g * 8 + 4:g * 8 + 8]
        for k in range(8):
            byte = wl[k >> 1]
            nib = (byte >> 4) if k & 1 else byte & 0x0F
            pred_l, idx_l = _ima_reconstruct(pred_l, idx_l, nib)
            left.append(pred_l)
            byte = wr[k >> 1]
            nib = (byte >> 4) if k & 1 else byte & 0x0F
            pred_r, idx_r = _ima_reconstruct(pred_r, idx_r, nib)
            right.append(pred_r)
    return list(zip(left[:n_frames], right[:n_frames]))


def _ima_encode_channel(samples) -> tuple[bytes, list[int]]:
    """(4-byte header, nibble list) for one channel's block samples —
    the shared core of the mono and stereo writers."""
    import struct

    pred, idx = int(samples[0]), 0
    nibbles = []
    for s in samples[1:]:
        st = _IMA_STEP_TABLE[idx]
        diff = int(s) - pred
        nib = 8 if diff < 0 else 0
        if diff < 0:
            diff = -diff
        if diff >= st:
            nib |= 4
            diff -= st
        if diff >= st >> 1:
            nib |= 2
            diff -= st >> 1
        if diff >= st >> 2:
            nib |= 1
        pred, idx = _ima_reconstruct(pred, idx, nib)
        nibbles.append(nib)
    return struct.pack("<hBB", int(samples[0]), 0, 0), nibbles


def encode_wav_adpcm(
    samples, sample_rate: int, block_samples: int = 505
) -> bytes:
    """Encode an int16 array — ``(n,)`` mono or ``(n, 2)`` stereo
    (r15) — as an IMA-ADPCM RIFF/WAVE blob (format code 0x11, 4
    bits/sample; stereo uses the spec's word-interleaved block layout,
    which needs ``block_samples - 1`` divisible by 8). The last block
    may carry fewer samples; its true count rides the 'fact' chunk
    (total frames), which the decoder honors."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype="int64")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if arr.ndim != 2 or arr.shape[1] not in (1, 2):
        raise ValueError(
            "encode_wav_adpcm takes (n,) mono or (n, 2) stereo"
        )
    n, ch = arr.shape
    if n == 0:
        raise ValueError("encode_wav_adpcm needs at least one sample")
    if block_samples < 2:
        raise ValueError("block_samples must be >= 2")
    if ch == 2 and (block_samples - 1) % 8:
        raise ValueError(
            "stereo IMA-ADPCM needs block_samples = 8k+1 (nibbles "
            "interleave in whole 4-byte words per channel)"
        )
    if ch == 1:
        block_align = 4 + (block_samples - 1 + 1) // 2
    else:
        block_align = 8 + (block_samples - 1)  # (spb-1)/2 bytes x 2 ch
    blocks = []
    for off in range(0, n, block_samples):
        if ch == 1:
            hdr, nibbles = _ima_encode_channel(arr[off:off + block_samples, 0])
            if len(nibbles) % 2:
                nibbles.append(0)
            blk = hdr + bytes(
                nibbles[i] | (nibbles[i + 1] << 4)
                for i in range(0, len(nibbles), 2)
            )
        else:
            hdr_l, nib_l = _ima_encode_channel(arr[off:off + block_samples, 0])
            hdr_r, nib_r = _ima_encode_channel(arr[off:off + block_samples, 1])
            while len(nib_l) % 8:
                nib_l.append(0)
                nib_r.append(0)
            body = bytearray()
            for g in range(0, len(nib_l), 8):
                for nibs in (nib_l, nib_r):
                    body += bytes(
                        nibs[g + i] | (nibs[g + i + 1] << 4)
                        for i in range(0, 8, 2)
                    )
            blk = hdr_l + hdr_r + bytes(body)
        blocks.append(blk.ljust(block_align, b"\x00"))
    payload = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, ch, sample_rate,
        sample_rate * block_align // block_samples, block_align, 4,
        2, block_samples,
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# -- FLAC subset codec (r14, stereo + LPC decode r15) ------------------------
#
# Lossless archival audio, dependency-free: a real FLAC writer/reader
# for the 16-bit fixed-blocksize subset, mono and stereo — STREAMINFO
# with the spec's MD5 of the (interleaved) raw samples, frame headers
# with UTF-8 frame numbers and CRC-8, CONSTANT / VERBATIM / FIXED(0-4)
# subframes, LPC(1-32) subframes on DECODE (QLP integer prediction;
# the encoder emits them via the use_lpc knob with fixed-equivalent
# quantized coefficients — float Levinson-Durbin analysis stays out of
# scope), all four stereo channel assignments with 17-bit side
# subframes, Rice residuals (4- and 5-bit parameter variants, escape
# partitions), and the frame CRC-16. Because FLAC is LOSSLESS, the
# external oracle is the roundtrip identity (the PNG/GIF pattern):
# synthesize → encode → decode must reproduce the tone formula
# bit-for-bit, so any slip in bit packing, prediction, Rice coding or
# either CRC breaks the hash. >2 channels and non-16-bit streams are
# honestly gated.

_FLAC_CRC8_POLY = 0x07     # x^8 + x^2 + x + 1
_FLAC_CRC16_POLY = 0x8005  # x^16 + x^15 + x^2 + 1
# binomial coefficients of the fixed predictors: residual order o is
# the o-th difference of the signal
_FLAC_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _flac_crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ _FLAC_CRC8_POLY if crc & 0x80
                   else crc << 1) & 0xFF
    return crc


def _flac_crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ _FLAC_CRC16_POLY if crc & 0x8000
                   else crc << 1) & 0xFFFF
    return crc


class _FlacBits:
    """MSB-first bit writer (the FLAC bit order)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, bits: int) -> None:
        if bits:
            self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
            self.n += bits
            while self.n >= 8:
                self.n -= 8
                self.buf.append((self.acc >> self.n) & 0xFF)
        # keep acc bounded
        self.acc &= (1 << self.n) - 1 if self.n else 0

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _FlacReader:
    """MSB-first bit reader with loud truncation errors."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0

    def take(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            if self.pos >= len(self.data):
                raise ValueError("FLAC payload truncated mid-frame")
            out = (out << 1) | (
                (self.data[self.pos] >> (7 - self.bit)) & 1
            )
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def take_signed(self, bits: int) -> int:
        v = self.take(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def take_unary(self) -> int:
        q = 0
        while self.take(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (plain UTF-8 for the
    values a sane stream reaches)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > (7 - nbytes) + 6 * (nbytes - 1):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(r: _FlacReader) -> int:
    first = r.take(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC frame-number coding")
    n = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.take(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC frame-number continuation")
        n = (n << 6) | (b & 0x3F)
    return n


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if not (u & 1) else -((u + 1) >> 1)


def _flac_fixed_cost(blk) -> tuple[int, int, "object"]:
    """(score, order, residual) of the best FIXED(0-2) predictor for a
    channel block — least absolute residual, deterministic."""
    import numpy as np

    arr = np.asarray(blk, dtype="int64")
    best, best_res = None, None
    for order in (0, 1, 2):
        if len(arr) <= order:
            continue
        res = arr.copy()
        for _ in range(order):
            res = np.diff(res)
        score = int(np.abs(res).sum())
        if best is None or score < best[0]:
            best, best_res = (score, order), res
    return best[0], best[1], best_res


def _flac_enc_residual(bits: "_FlacBits", res: list[int]) -> None:
    """Rice-code a residual list: deterministic parameter, coding
    method 00 (4-bit Rice), partition order 0 — shared by the FIXED
    and LPC subframe writers."""
    total_u = sum(_zigzag(r) for r in res)
    k = 0
    while len(res) and (len(res) << (k + 1)) < total_u and k < 14:
        k += 1
    bits.put(0, 2)   # coding method 00 (4-bit rice)
    bits.put(0, 4)   # partition order 0
    bits.put(k, 4)
    for r in res:
        u = _zigzag(r)
        bits.put_unary(u >> k)
        bits.put(u, k)


# the FIXED predictors re-expressed as quantized LPC coefficients —
# used by the use_lpc test/coverage knob: scaling by 1<<shift keeps
# the prediction EXACTLY the fixed predictor's (no rounding), so the
# roundtrip stays lossless while the bitstream takes the LPC path
_FLAC_LPC_FROM_FIXED = {1: [1], 2: [2, -1]}


def _flac_enc_subframe(
    bits: "_FlacBits", blk, bps: int, use_lpc: bool = False
) -> None:
    """One subframe at ``bps`` bits (a stereo pair's SIDE channel
    carries bps+1 — FLAC spec): CONSTANT for flat blocks, else best
    FIXED(0-2) — or, with ``use_lpc``, a genuine LPC subframe carrying
    the equivalent quantized coefficients (QLP precision/shift/coef
    fields per spec) — Rice method 00 / partition order 0."""
    bs = len(blk)
    mask = (1 << bps) - 1
    if bs > 1 and int(min(blk)) == int(max(blk)):
        bits.put(0, 1)
        bits.put(0, 6)   # CONSTANT
        bits.put(0, 1)   # no wasted bits
        bits.put(int(blk[0]) & mask, bps)
        return
    _score, order, best_res = _flac_fixed_cost(blk)
    if use_lpc and bs > 1:
        import numpy as np

        order = max(1, order)  # LPC order is 1-based
        coefs = _FLAC_LPC_FROM_FIXED.get(order, [0])
        arr = np.asarray(blk, dtype="int64")
        shift = 4
        qcoefs = [c << shift for c in coefs]
        res = [
            int(arr[i]) - (
                sum(
                    q * int(arr[i - 1 - j]) for j, q in enumerate(qcoefs)
                ) >> shift
            )
            for i in range(order, bs)
        ]
        # signed width that fits every quantized coefficient (+1 sign
        # bit; e.g. coef 2<<4 = 32 needs 7 bits — 6 would wrap to -32)
        prec = max(2, max(abs(q).bit_length() + 1 for q in qcoefs))
        bits.put(0, 1)
        bits.put(0b100000 | (order - 1), 6)  # LPC(order)
        bits.put(0, 1)
        for w in arr[:order]:
            bits.put(int(w) & mask, bps)
        bits.put(prec - 1, 4)
        bits.put(shift, 5)  # signed field, value is non-negative
        for q in qcoefs:
            bits.put(q & ((1 << prec) - 1), prec)
        _flac_enc_residual(bits, res)
        return
    bits.put(0, 1)
    bits.put(0b001000 | order, 6)  # FIXED(order)
    bits.put(0, 1)
    for w in blk[:order]:
        bits.put(int(w) & mask, bps)
    _flac_enc_residual(bits, [int(x) for x in best_res])


# frame-header channel-assignment nibbles (FLAC spec §frame header)
_FLAC_CHAN_MONO = 0b0000
_FLAC_CHAN_STEREO = 0b0001      # independent L/R
_FLAC_CHAN_LEFT_SIDE = 0b1000   # L + (L-R)
_FLAC_CHAN_RIGHT_SIDE = 0b1001  # (L-R) + R
_FLAC_CHAN_MID_SIDE = 0b1010    # (L+R)>>1 + (L-R)


def encode_flac(
    samples,
    sample_rate: int,
    block_size: int = 4096,
    stereo_mode: str = "auto",
    use_lpc: bool = False,
) -> bytes:
    """Encode an int16 array — ``(n,)`` mono or ``(n, 2)`` stereo — as
    a real FLAC stream (fixed-blocksize frames, FIXED(0-2) predictor
    chosen per channel block by least absolute residual, Rice
    partition order 0, CONSTANT for flat blocks). Stereo frames pick a
    channel assignment PER BLOCK (r15 — VERDICT r14 ask #8):
    ``stereo_mode='auto'`` scores independent vs left/side vs
    right/side vs mid/side by residual cost (deterministic tie-break in
    that order); an explicit mode pins every frame. The side channel
    carries 17 bits per the spec. Lossless: :func:`decode_flac`
    reproduces the input exactly (and verifies both CRCs plus
    STREAMINFO's interleaved MD5)."""
    import hashlib
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype="int64")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if arr.ndim != 2 or arr.shape[1] not in (1, 2):
        raise ValueError("encode_flac takes (n,) mono or (n, 2) stereo")
    n, channels = arr.shape
    if n == 0:
        raise ValueError("encode_flac needs at least one sample")
    if block_size < 16:
        raise ValueError("block_size must be >= 16")
    modes = {
        "independent": _FLAC_CHAN_STEREO,
        "left_side": _FLAC_CHAN_LEFT_SIDE,
        "right_side": _FLAC_CHAN_RIGHT_SIDE,
        "mid_side": _FLAC_CHAN_MID_SIDE,
    }
    if channels == 2 and stereo_mode != "auto" and stereo_mode not in modes:
        raise ValueError(
            f"unknown stereo_mode {stereo_mode!r} — 'auto' or one of "
            f"{sorted(modes)}"
        )
    # MD5 is over the INTERLEAVED little-endian samples (row-major
    # (n, ch) layout interleaves exactly)
    raw = arr.astype("<i2").tobytes()
    md5 = hashlib.md5(raw).digest()
    # STREAMINFO (34 bytes)
    si = _FlacBits()
    si.put(block_size, 16)
    si.put(block_size, 16)
    si.put(0, 24)  # min framesize unknown
    si.put(0, 24)  # max framesize unknown
    si.put(sample_rate, 20)
    si.put(channels - 1, 3)
    si.put(15, 5)  # bits per sample - 1
    si.put(n, 36)
    si.align()  # 144 bits = 18 bytes exactly; align is a no-op guard
    streaminfo = si.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80])  # last metadata block, type 0 (STREAMINFO)
    out += struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo

    for fno, off in enumerate(range(0, n, block_size)):
        blk = arr[off:off + block_size]
        bs = len(blk)
        if channels == 1:
            chan = _FLAC_CHAN_MONO
            subs = [(blk[:, 0], 16)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            mid = (left + right) >> 1  # arithmetic shift, spec-exact
            side = left - right
            if stereo_mode == "auto":
                cl = _flac_fixed_cost(left)[0]
                cr = _flac_fixed_cost(right)[0]
                cm = _flac_fixed_cost(mid)[0]
                cs = _flac_fixed_cost(side)[0]
                costs = [
                    ("independent", cl + cr), ("left_side", cl + cs),
                    ("right_side", cr + cs), ("mid_side", cm + cs),
                ]
                mode = min(costs, key=lambda t: t[1])[0]
            else:
                mode = stereo_mode
            chan = modes[mode]
            subs = {
                "independent": [(left, 16), (right, 16)],
                "left_side": [(left, 16), (side, 17)],
                "right_side": [(side, 17), (right, 16)],
                "mid_side": [(mid, 16), (side, 17)],
            }[mode]
        hdr = bytearray()
        hdr += bytes([0xFF, 0xF8])  # sync 11111111 111110, res 0, fixed
        hdr += bytes([0x70])        # blocksize code 0111 (16-bit), rate 0000
        hdr += bytes([(chan << 4) | 0x08])  # channel, size 100 (16-bit)
        hdr += _utf8_number(fno)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_flac_crc8(bytes(hdr)))
        bits = _FlacBits()
        for b in hdr:
            bits.put(b, 8)
        for sub_blk, sub_bps in subs:
            _flac_enc_subframe(bits, sub_blk, sub_bps, use_lpc=use_lpc)
        bits.align()
        frame = bits.bytes()
        out += frame + struct.pack(">H", _flac_crc16(frame))
    return bytes(out)


def _flac_dec_residual(
    r: "_FlacReader", bs: int, order: int
) -> list[int]:
    """Decode a subframe's Rice-coded residual: both coding methods
    (4-bit / 5-bit Rice) incl. escape partitions and any partition
    order — shared by the FIXED and LPC readers."""
    method = r.take(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 5 if method else 4
    escape = (1 << pbits) - 1
    porder = r.take(4)
    res: list[int] = []
    nparts = 1 << porder
    for part in range(nparts):
        cnt = bs >> porder
        if part == 0:
            cnt -= order
        k = r.take(pbits)
        if k == escape:
            raw_bits = r.take(5)
            res.extend(
                r.take_signed(raw_bits) if raw_bits else 0
                for _ in range(cnt)
            )
        else:
            for _ in range(cnt):
                u = (r.take_unary() << k) | r.take(k)
                res.append(_unzigzag(u))
    return res


def _flac_dec_subframe(r: "_FlacReader", bs: int, bps: int) -> list[int]:
    """Decode one subframe at ``bps`` bits: CONSTANT / VERBATIM /
    FIXED(0-4) / LPC(1-32) (r15 — QLP-coefficient prediction is pure
    integer math: warmup, precision, signed shift, signed coefficients,
    ``pred = (Σ c_j · x[i-1-j]) >> shift``; only LPC *encoding* needs
    float analysis), both Rice methods incl. escape partitions and any
    partition order."""
    if r.take(1):
        raise ValueError("invalid FLAC subframe padding bit")
    stype = r.take(6)
    wasted = 0
    if r.take(1):
        wasted = 1 + r.take_unary()
    eff = bps - wasted
    if stype == 0:
        blk = [r.take_signed(eff)] * bs
    elif stype == 1:
        blk = [r.take_signed(eff) for _ in range(bs)]
    elif 8 <= stype <= 12:
        order = stype - 8
        warm = [r.take_signed(eff) for _ in range(order)]
        res = _flac_dec_residual(r, bs, order)
        blk = list(warm)
        coef = _FLAC_FIXED_COEF[order]
        for x in res:
            pred = sum(
                c * blk[-i - 1] for i, c in enumerate(coef)
            )
            blk.append(x + pred)
    elif stype >= 32:
        order = (stype & 31) + 1
        warm = [r.take_signed(eff) for _ in range(order)]
        prec = r.take(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC QLP precision code")
        shift = r.take_signed(5)
        if shift < 0:
            # the field is signed per spec but negative shifts are
            # reserved in practice (libFLAC refuses them too)
            raise ValueError("negative FLAC QLP shift")
        coefs = [r.take_signed(prec) for _ in range(order)]
        res = _flac_dec_residual(r, bs, order)
        blk = list(warm)
        for x in res:
            pred = sum(
                c * blk[-j - 1] for j, c in enumerate(coefs)
            ) >> shift
            blk.append(x + pred)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        blk = [x << wasted for x in blk]
    return blk


def decode_flac(payload: bytes):
    """Decode a mono or STEREO FLAC stream → ((n, channels) int16
    array, sample_rate). Handles CONSTANT / VERBATIM / FIXED(0-4) /
    LPC(1-32) subframes (r15 — QLP prediction is integer math, fully
    decodable dependency-free), both Rice methods incl. escape
    partitions and any partition order, and every stereo channel
    assignment — independent, left/side, right/side, mid/side (r15;
    17-bit side per the spec, per-frame assignment switching); verifies
    the header CRC-8, frame CRC-16 and STREAMINFO's interleaved MD5.
    Streams with >2 channels or non-16-bit samples raise the named
    gate."""
    import hashlib

    import numpy as np

    if len(payload) < 42 or payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        head = payload[pos]
        size = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + size]
        if head & 0x7F == 0:
            streaminfo = body
        pos += 4 + size
        if head & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC stream missing STREAMINFO")
    r = _FlacReader(streaminfo)
    r.take(16)  # min blocksize
    r.take(16)  # max blocksize
    r.take(24)
    r.take(24)
    rate = r.take(20)
    channels = r.take(3) + 1
    bps = r.take(5) + 1
    total = r.take(36)
    md5 = streaminfo[18:34]
    if channels > 2:
        raise NotImplementedError(
            f"FLAC decode supports mono/stereo dependency-free (stream "
            f"has {channels} channels); route through decoder='real'"
        )
    if bps != 16:
        raise NotImplementedError(
            f"FLAC decode supports 16-bit samples dependency-free "
            f"(stream is {bps}-bit); route through decoder='real'"
        )
    chans: list[list[int]] = [[] for _ in range(channels)]
    n_done = 0  # per-channel samples decoded so far
    # total == 0 is LEGAL in STREAMINFO ("unknown length") — decode
    # until the payload runs out rather than silently returning nothing
    while pos < len(payload) and (total == 0 or n_done < total):
        frame_start = pos
        r = _FlacReader(payload, pos)
        sync = r.take(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        r.take(1)  # reserved
        r.take(1)  # blocking strategy
        bs_code = r.take(4)
        rate_code = r.take(4)
        chan = r.take(4)
        size_code = r.take(3)
        r.take(1)
        if channels == 1:
            if chan != _FLAC_CHAN_MONO:
                raise ValueError(
                    "FLAC mono stream carries a non-mono frame"
                )
        elif chan not in (
            _FLAC_CHAN_STEREO, _FLAC_CHAN_LEFT_SIDE,
            _FLAC_CHAN_RIGHT_SIDE, _FLAC_CHAN_MID_SIDE,
        ):
            raise ValueError(
                f"FLAC stereo stream carries channel assignment "
                f"{chan:#06b}, which is not a 2-channel layout"
            )
        if size_code not in (0, 0b100):
            raise NotImplementedError(
                "FLAC decode supports 16-bit frames dependency-free"
            )
        _read_utf8_number(r)
        if bs_code == 6:
            bs = r.take(8) + 1
        elif bs_code == 7:
            bs = r.take(16) + 1
        elif bs_code == 1:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 8:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved FLAC block-size code")
        if rate_code == 12:
            r.take(8)
        elif rate_code in (13, 14):
            r.take(16)
        hdr_end = r.pos  # CRC-8 covers the header up to here
        crc8 = r.take(8)
        if _flac_crc8(payload[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        # subframes: one per channel; the side channel of a stereo
        # pair carries bps+1 bits (FLAC spec)
        if channels == 1:
            sub_bits = [16]
        else:
            sub_bits = {
                _FLAC_CHAN_STEREO: [16, 16],
                _FLAC_CHAN_LEFT_SIDE: [16, 17],
                _FLAC_CHAN_RIGHT_SIDE: [17, 16],
                _FLAC_CHAN_MID_SIDE: [16, 17],
            }[chan]
        subs = [_flac_dec_subframe(r, bs, b) for b in sub_bits]
        r.align()
        if r.pos + 1 >= len(payload):
            # a payload cut at the frame boundary must fail the same
            # loud way as one cut mid-frame, not with an IndexError
            raise ValueError("FLAC payload truncated mid-frame")
        crc16 = (payload[r.pos] << 8) | payload[r.pos + 1]
        if _flac_crc16(payload[frame_start:r.pos]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.pos + 2
        if channels == 1:
            chans[0].extend(subs[0])
        elif chan == _FLAC_CHAN_STEREO:
            chans[0].extend(subs[0])
            chans[1].extend(subs[1])
        elif chan == _FLAC_CHAN_LEFT_SIDE:
            chans[0].extend(subs[0])
            chans[1].extend(
                left - s for left, s in zip(subs[0], subs[1])
            )
        elif chan == _FLAC_CHAN_RIGHT_SIDE:
            chans[0].extend(
                s + right for s, right in zip(subs[0], subs[1])
            )
            chans[1].extend(subs[1])
        else:  # mid/side: m=(L+R)>>1, s=L-R; recover via spec identity
            for m, s in zip(subs[0], subs[1]):
                m2 = (m << 1) | (s & 1)
                chans[0].append((m2 + s) >> 1)
                chans[1].append((m2 - s) >> 1)
        n_done += bs
    cut = total or n_done
    arr = np.column_stack(
        [np.asarray(c[:cut], dtype="int64") for c in chans]
    ).astype("<i2")
    # the MD5 integrity check applies whenever STREAMINFO carries one,
    # including unknown-length (total == 0) streams — over the
    # INTERLEAVED samples ((n, ch) row-major IS interleaved)
    if md5 != b"\x00" * 16 and hashlib.md5(
        arr.astype("<i2").tobytes()
    ).digest() != md5:
        raise ValueError("FLAC MD5 mismatch — decoded audio corrupt")
    return arr, rate


def decode_audio(payload: bytes):
    """Container sniff: RIFF/WAVE → :func:`decode_wav` (PCM16 /
    mu-law / IMA-ADPCM), fLaC → :func:`decode_flac`. Every audio op
    reads through this, so WAV and FLAC content mix freely in one
    column."""
    payload = bytes(payload)
    if payload[:4] == b"fLaC":
        return decode_flac(payload)
    return decode_wav(payload)


def transcode_audio(
    df: DataFrame, codec: str, content_col: str = "content"
) -> DataFrame:
    """Real decode → re-encode through another audio codec:
    ``"mulaw"`` (G.711), ``"adpcm"`` (IMA mono), ``"flac"``
    (lossless), ``"pcm16"``. Arrow-batched
    mapInPandas like every codec op; sample_rate is preserved. The
    roundtrip is LOSSY for mulaw/adpcm by nature — downstream
    :func:`audio_stats` observes the expanded samples, which an
    external oracle can replay from pure integer math."""
    import numpy as np

    if codec not in ("mulaw", "adpcm", "flac", "flac_lpc", "pcm16"):
        raise ValueError(
            f"unknown audio codec {codec!r} — mulaw, adpcm, flac, "
            "flac_lpc or pcm16"
        )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for payload in pdf[content_col]:
                arr, rate = decode_audio(bytes(payload))
                if codec == "mulaw":
                    content.append(encode_wav_mulaw(arr, rate))
                elif codec == "adpcm":
                    if arr.shape[1] > 2:
                        raise ValueError(
                            "adpcm transcode supports mono/stereo only"
                        )
                    content.append(encode_wav_adpcm(
                        arr.reshape(-1) if arr.shape[1] == 1 else arr,
                        rate,
                    ))
                elif codec in ("flac", "flac_lpc"):
                    if arr.shape[1] > 2:
                        raise ValueError(
                            "flac transcode supports mono/stereo only"
                        )
                    content.append(encode_flac(
                        arr.reshape(-1) if arr.shape[1] == 1 else arr,
                        rate,
                        use_lpc=(codec == "flac_lpc"),
                    ))
                else:
                    content.append(encode_wav(arr.astype("<i2"), rate))
            out = pdf.copy()
            out[content_col] = content
            yield out

    _ = np
    return df.mapInPandas(compute, schema=df.schema)


def synthesize_wav(
    df: DataFrame,
    id_col: str = "media_id",
    n_samples: int = 64,
    sample_rate: int = 8000,
    channels: int = 1,
) -> DataFrame:
    """Deterministic test-tone generator: one real PCM16 WAV per input
    row, mono or stereo. Sample formulas (the external-oracle
    contract — pure integer math, exactly replicable in SQL):

        L(i) = ((id*31 + i*57) % 4096) - 2048
        R(i) = ((id*13 + i*29) % 4096) - 2048   (channels=2)
    """
    import numpy as np

    if channels not in (1, 2):
        raise ValueError("synthesize_wav supports 1 or 2 channels")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_samples, dtype="int64")
        for pdf in batches:
            content = []
            for mid in pdf[id_col]:
                left = ((int(mid) * 31 + i * 57) % 4096) - 2048
                if channels == 1:
                    content.append(
                        encode_wav(left.astype("<i2"), sample_rate)
                    )
                else:
                    right = ((int(mid) * 13 + i * 29) % 4096) - 2048
                    content.append(encode_wav(
                        np.column_stack([left, right]).astype("<i2"),
                        sample_rate,
                    ))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": "audio",
                    "content": content,
                    "meta": [
                        {"width": None, "height": None,
                         "sample_rate": sample_rate, "n_frames": n_samples}
                    ] * len(pdf),
                }
            )

    return df.mapInPandas(gen, schema=MEDIA_SCHEMA)


def downsample_audio(
    df: DataFrame, factor: int, content_col: str = "content"
) -> DataFrame:
    """Integer decimation (every ``factor``-th frame kept) through a real
    decode → slice → re-encode roundtrip; sample_rate divides by the
    factor. Anti-alias filtering is a float DSP concern out of scope for
    the exact-math path — documented, and irrelevant to the byte-level
    contract this pins."""
    if factor <= 0:
        raise ValueError("factor must be positive")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for payload in pdf[content_col]:
                arr, rate = decode_audio(payload)
                content.append(encode_wav(arr[::factor], rate // factor))
            pdf = pdf.copy()
            pdf[content_col] = content
            yield pdf

    return df.mapInPandas(compute, schema=df.schema)



def resample_audio(
    df: DataFrame, to_rate: int, content_col: str = "content"
) -> DataFrame:
    """Linear-interpolation resampling to an arbitrary rate through a
    real decode → interpolate → re-encode roundtrip — the general-ratio
    counterpart of :func:`downsample_audio`'s integer decimation.

    The interpolation is EXACT integer math (the external-oracle
    contract all multimodal ops keep): output frame j sits at source
    position j·from/to expressed as the rational (x0 = j·from // to,
    r = j·from mod to), and

        y = ((s0+32768)·(to−r) + (s1+32768)·r + to//2) // to − 32768

    — the offset shift keeps every intermediate non-negative so floor
    and truncating division agree across engines, weights sum to ``to``
    so the offset cancels exactly, and +to//2 makes it round-half-up.
    n_out = (n_in−1)·to//from + 1 (the last input frame is the last
    anchor). Anti-alias filtering is a float DSP concern out of scope
    for the exact-math path (same note as downsample_audio)."""
    if to_rate <= 0:
        raise ValueError("to_rate must be positive")

    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for payload in pdf[content_col]:
                arr, rate = decode_audio(payload)
                n_in = arr.shape[0]
                if n_in == 0:
                    content.append(encode_wav(arr, to_rate))
                    continue
                n_out = (n_in - 1) * to_rate // rate + 1
                j = np.arange(n_out, dtype="int64")
                pos = j * rate
                x0 = pos // to_rate
                r = pos % to_rate
                x1 = np.minimum(x0 + 1, n_in - 1)
                s0 = arr[x0].astype("int64") + 32768
                s1 = arr[x1].astype("int64") + 32768
                y = (
                    s0 * (to_rate - r)[:, None] + s1 * r[:, None]
                    + to_rate // 2
                ) // to_rate - 32768
                content.append(
                    encode_wav(y.astype("<i2"), to_rate)
                )
            out = pdf.copy()
            out["content"] = content
            out["meta"] = [
                {**(m or {}), "sample_rate": to_rate} for m in pdf["meta"]
            ]
            yield out

    return df.mapInPandas(compute, schema=MEDIA_SCHEMA)

def audio_stats(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Decode each WAV and emit exact integer observables — int64 sample
    sum, int64 sum of squares (the energy numerator), and the peak
    absolute amplitude. Float-free, so the whole audio roundtrip pins
    bit-exactly against an external reimplementation (the BMP
    ``image_stats`` pattern)."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "n_samples", "n_channels", "sample_rate",
                "sum_samples", "sum_squares", "peak_abs",
            )}
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                arr, rate = decode_audio(payload)
                a = arr.astype("int64")
                out["media_id"].append(int(mid))
                out["n_samples"].append(int(arr.shape[0]))
                out["n_channels"].append(int(arr.shape[1]))
                out["sample_rate"].append(int(rate))
                out["sum_samples"].append(int(a.sum()))
                out["sum_squares"].append(int((a * a).sum()))
                out["peak_abs"].append(int(abs(a).max()) if a.size else 0)
            yield pd.DataFrame(out)

    return df.mapInPandas(compute, schema=_AUDIO_STATS_SCHEMA)


def stage_multimodal(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "multimodal", "op": "extract_features"|"resize"|
    "sample_frames"|..., "decoder": "fake"|"bmp"|"png"|"jpeg"|"image",
    ...}`` — "image" magic-sniffs a mixed BMP/PNG/baseline-JPEG
    column; "fake" hashes bytes for formats without codec libs."""
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
    if op == "synthesize_png":
        return synthesize_png(
            df, spec.get("id_col", "media_id"),
            int(spec.get("width", 8)), int(spec.get("height", 6)),
        )
    if op == "synthesize_jpeg":
        return synthesize_jpeg(
            df, spec.get("id_col", "media_id"),
            int(spec.get("width", 16)), int(spec.get("height", 16)),
            int(spec.get("quality", 90)),
        )
    if op == "synthesize_avi":
        return synthesize_avi(
            df, spec.get("id_col", "media_id"),
            int(spec.get("n_frames", 8)),
            int(spec.get("width", 16)), int(spec.get("height", 16)),
            int(spec.get("fps", 10)), int(spec.get("quality", 90)),
        )
    if op == "frame_stats":
        return sample_frame_stats(
            df, int(spec.get("every_n", 1)),
            spec.get("content_col", "content"),
            spec.get("id_col", "media_id"),
        )
    if op == "synthesize_wav":
        return synthesize_wav(
            df, spec.get("id_col", "media_id"),
            int(spec.get("n_samples", 64)),
            int(spec.get("sample_rate", 8000)),
        )
    if op == "downsample_audio":
        return downsample_audio(
            df, int(spec["factor"]), spec.get("content_col", "content")
        )
    if op == "transcode_audio":
        return transcode_audio(
            df, spec["codec"], spec.get("content_col", "content")
        )
    if op == "resample_audio":
        return resample_audio(
            df, int(spec["to_rate"]), spec.get("content_col", "content")
        )
    if op == "audio_stats":
        return audio_stats(
            df, spec.get("content_col", "content"),
            spec.get("id_col", "media_id"),
        )
    if op == "ahash":
        return image_ahash(
            df, spec.get("content_col", "content"),
            spec.get("id_col", "media_id"),
            int(spec.get("hash_size", 8)),
        )
    raise ValueError(f"Unknown multimodal op {op!r}")
