"""hash_embed pins: md5 bucket/sign formula, unit norm, zero-vector
edges, ANN-stack composability, and config-stage wiring."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark.operators.featurize import hash_embed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _py_embed(text: str, dim: int = 64) -> list[float]:
    toks = [w for w in text.lower().split(" ") if w]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    v = [0] * dim
    for g in grams:
        h = hashlib.md5(g.encode()).hexdigest()
        v[int(h[:8], 16) % dim] += 1 if int(h[8], 16) % 2 == 0 else -1
    n = math.sqrt(sum(x * x for x in v))
    return [round(x / n, 9) if n else 0.0 for x in v]


def test_matches_reference_formula(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox"), (2, "jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["embedding"], r["text"])
        for r in hash_embed(df, dim=16).collect()
    }
    for did, (emb, text) in out.items():
        assert emb == _py_embed(text, 16), did


def test_unit_norm_and_zero_edges(spark, documents):
    out = hash_embed(documents.limit(50), dim=32)
    for r in out.select("embedding").collect():
        n = sum(x * x for x in r["embedding"])
        assert abs(n - 1.0) < 1e-6
    # empty and null text embed as the zero vector, all columns kept
    edge = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
    )
    rows = hash_embed(edge, dim=8).collect()
    assert all(r["embedding"] == [0.0] * 8 for r in rows)
    assert {r["doc_id"] for r in rows} == {1, 2, 3}


def test_feeds_the_ann_stack(spark):
    from config_driven_pyspark_spark.operators.similarity import (
        brute_force_topk,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "alpha beta gamma epsilon"), (4, "totally unrelated words here")],
        "doc_id long, text string",
    )
    emb = hash_embed(df, dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    top = brute_force_topk(emb, emb.filter("vec_id = 1"), k=3).collect()
    ranked = [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])]
    # identical text -> cosine 1.0 first; one-word-off second; junk last
    assert ranked == [2, 3, 4]
    assert max(r["cosine"] for r in top) == pytest.approx(1.0, abs=1e-6)


def test_stage_wiring_and_errors(spark, documents):
    from config_driven_pyspark_spark import Pipeline

    out = Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": f"{SF_DIR}/documents.parquet"},
        {"stage": "corpus", "op": "hash_embed", "column": "text",
         "id_col": "doc_id", "dim": 16, "out_col": "emb"},
    ]).run(spark)
    assert "emb" in out.columns
    assert out.count() == documents.count()
    with pytest.raises(ValueError, match="dim"):
        hash_embed(documents, dim=0)
