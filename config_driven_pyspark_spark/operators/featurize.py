"""Text featurization: the hashing-trick document embedder.

Capability gap vs the reference (SURVEY.md §2C): the dependency-free
bridge from raw text into the engine's vector stack. ``hash_embed``
turns each document into a dense unit vector via SIGNED feature hashing
(Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
Learning"): every lowercased unigram/bigram hashes to one of ``dim``
md5 buckets with an md5-derived ±1 sign (the sign makes collisions
cancel in expectation instead of stacking), per-bucket signed counts
are L2-normalized, and the result drops straight into every
embedding-column operator the engine already has — ``knn_topk``,
``kmeans_assign``/``semdedup``, ``embedding_dup_pairs``, the IVF/PQ
index stack, ``ncm_classify`` — with NO external model or embedding
table required. The classic use is cheap lexical-semantic clustering
and near-dup mining on corpora that have no precomputed embeddings.

Deterministic contract (what the DuckDB oracle replicates bit-for-bit):
grams are the DSIR shape — whitespace tokens of ``lower(text)`` plus
adjacent-pair bigrams; ``bucket = int(md5(gram)[:8], 16) % dim``;
``sign = +1 if int(md5(gram)[8], 16) % 2 == 0 else −1``; per-bucket
values are exact integer sums; components are
``round(v / sqrt(Σ v²), 9)`` (IEEE sqrt + division on the shared
9-decimal grid); gram-less documents (and the all-cancelled zero-norm
edge) embed as the zero vector.

Scale (the 100 TB shape): two shuffles, both map-side combinable —
``groupBy(id, bucket)`` collapses each document's grams to ≤ ``dim``
rows before the wire, then ``groupBy(id)`` folds those into one
``dim``-entry map per document; the normalize/round step is a map-only
Project. No UDF, no driver state, no collect — the whole operator is
Column expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from config_driven_pyspark_spark.functions import text as TX
from config_driven_pyspark_spark.operators.dedup import _spread


def hash_embed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    out_col: str = "embedding",
    bigrams: bool = True,
) -> DataFrame:
    """Append a ``dim``-dimensional hashed-n-gram unit vector
    (``array<double>``) to every row — see the module docstring for the
    exact deterministic contract."""
    if dim <= 0:
        raise ValueError("dim must be positive")
    t = TX.tokens(F.lower(F.col(text_col)))
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    bg = F.zip_with(
        F.slice(t, 1, n1), F.slice(t, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(t, bg) if bigrams else t
    h = F.md5(F.col("__g"))
    per = (
        _spread(df)
        .select(F.col(id_col).alias("__id"), F.explode(grams).alias("__g"))
        .select(
            "__id",
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % dim)
            .alias("__b"),
            F.when(
                F.conv(F.substring(h, 9, 1), 16, 10).cast("bigint") % 2 == 0,
                F.lit(1),
            ).otherwise(F.lit(-1)).alias("__s"),
        )
        .groupBy("__id", "__b")
        .agg(F.sum("__s").cast("bigint").alias("__v"))
    )
    m = per.groupBy("__id").agg(
        F.map_from_entries(F.collect_list(F.struct("__b", "__v"))).alias("__m")
    )
    # materialize the dense vector and its norm as their OWN columns so
    # the interpreted higher-order aggregate runs once per row, not once
    # per output component (a 65x re-evaluation otherwise)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("bigint")),
            F.lit(0).cast("bigint"),
        ),
    )
    norm2 = F.aggregate(
        F.col("__vec"), F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
    )
    emb = F.when(
        F.col("__n") > 0,
        F.transform(
            F.col("__vec"),
            lambda x: F.round(x.cast("double") / F.col("__n"), 9),
        ),
    ).otherwise(F.array_repeat(F.lit(0.0), dim))
    embf = (
        m.select("__id", vec.alias("__vec"))
        .select("__id", "__vec", F.sqrt(norm2.cast("double")).alias("__n"))
        .select("__id", emb.alias("__emb"))
    )
    return (
        df.join(embf, df[id_col] == embf["__id"], "left")
        .withColumn(
            out_col,
            F.coalesce(F.col("__emb"), F.array_repeat(F.lit(0.0), dim)),
        )
        .drop("__id", "__emb")
    )
