"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Capability gap vs the reference (SURVEY.md §2C). The Spark-side plumbing is
real and tested: schemas, Arrow-batched ``mapInPandas`` transforms, batch
shapes, partition sizing. The *codec* step (actual JPEG/WAV decode) is
stubbed — the image/audio libraries are not in this container — behind
``decoder="fake"`` (deterministic, hash-derived features, so tests are
reproducible) or ``decoder="real"`` which raises ``NotImplementedError``
with the integration point documented.

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


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    sha256(payload) scaled to [0,1). Replace with a real decoder+model when
    codec libs are available."""
    digest = hashlib.sha256(payload or b"").digest()
    return [digest[i] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, decoder: str = "fake", dim: int = 8) -> DataFrame:
    """binary content → fixed-width feature vector via Arrow-batched
    ``mapInPandas`` (one Python roundtrip per Arrow batch, not per row)."""
    if decoder == "real":
        raise NotImplementedError(
            "real media decode requires codec libraries (PIL/ffmpeg) not present "
            "in this environment; integrate by replacing _fake_feature"
        )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["content"].map(lambda b: _fake_feature(b, dim)),
                }
            )

    return df.mapInPandas(compute, schema=_FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, decoder: str = "fake") -> DataFrame:
    """Stubbed image resize: emits the target geometry plus a deterministic
    pseudo-thumbnail (first 64 bytes of content, hashed); real decoder wires
    in at the marked point."""
    if decoder == "real":
        raise NotImplementedError("real image resize requires PIL/opencv")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "thumb": pdf["content"].map(
                        lambda b: hashlib.sha256(b or b"").digest()[:64]
                    ),
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
    raise ValueError(f"Unknown multimodal op {op!r}")
