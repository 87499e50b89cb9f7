"""Vector Column functions — dot product, norms, cosine, hashing families.

All pure Column expressions (``zip_with`` / ``aggregate`` higher-order
functions), evaluated JVM-side inside whole-stage codegen — no Python UDFs,
so they hold up on billions of vectors. Computation is in double precision
regardless of storage type (embeddings parquet stores float32) so results
match a double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via ``zip_with`` + ``aggregate`` (left-to-right summation)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def unit_normalize(a: Column) -> Column:
    """Scale to unit L2 norm — pre-normalizing the corpus once turns cosine
    top-k into a plain dot-product top-k (the scale path: normalize at write
    time, never per-query).

    Built as one ``aggregate`` whose *finish* lambda divides by the final
    accumulator: the sum of squares is computed once per row and captured
    as a lambda variable. The naive ``transform(a, x -> x / norm(a))``
    embeds the whole norm aggregate inside the per-element lambda, and
    higher-order functions evaluate interpreted with no common-
    subexpression elimination — measured 64× redundant summation per row
    on 64-dim vectors. Same float semantics (identical summation order and
    division), just evaluated once."""
    return F.aggregate(
        as_double(a),
        F.lit(0.0),
        lambda acc, v: acc + v * v,
        lambda s: F.transform(as_double(a), lambda v: v / F.sqrt(s)),
    )


def hyperplane_signature(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Random-hyperplane (SRP) LSH signature: bit i = sign(vec · hᵢ).

    Returns a bigint bucket id. ``hyperplanes`` are driver-side constants
    (deterministic seed) embedded as literal arrays, so the signature is a
    pure expression; equal buckets ⇒ likely-high cosine. Used to prune ANN
    candidate pairs from O(n²) to O(n·bucket_size) at scale.
    """
    bits = [
        F.when(dot(vec, F.array(*[F.lit(float(x)) for x in plane])) >= 0, 1).otherwise(0)
        for plane in hyperplanes
    ]
    sig = F.lit(0).cast("bigint")
    for bit in bits:
        sig = sig * 2 + bit
    return sig
