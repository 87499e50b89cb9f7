"""Property-based tests (hypothesis) for invariants golden tests can't pin:
chunk reconstruction over arbitrary document lengths, hash-sample
monotonicity, nested-drop isolation. Example counts are kept small because
each example runs a Spark job."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from config_driven_pyspark_spark.operators import corpus as C
from config_driven_pyspark_spark.operators.transform import drop_nested

SETTINGS = dict(max_examples=8, deadline=None)


def _doc_df(spark, n_tokens: int, doc_id: int = 1):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    return spark.createDataFrame([(doc_id, text)], "id long, text string")


@given(
    n_tokens=st.integers(min_value=1, max_value=130),
    chunk_size=st.integers(min_value=1, max_value=60),
)
@settings(**SETTINGS)
def test_chunks_partition_document_exactly(spark, n_tokens, chunk_size):
    df = _doc_df(spark, n_tokens)
    chunks = (
        C.chunk_documents(df, "id", chunk_size=chunk_size)
        .orderBy("chunk_idx")
        .collect()
    )
    # non-overlapping chunks cover the doc exactly, in order, within size
    assert all(c["n_tokens"] <= chunk_size for c in chunks)
    assert sum(c["n_tokens"] for c in chunks) == n_tokens
    rebuilt = " ".join(c["chunk_text"] for c in chunks)
    assert rebuilt == " ".join(f"t{i}" for i in range(n_tokens))


@given(
    lo=st.integers(min_value=0, max_value=128),
    delta=st.integers(min_value=0, max_value=128),
)
@settings(**SETTINGS)
def test_hash_sample_monotone_subset(spark, docs_pool, lo, delta):
    rate_lo, rate_hi = lo / 256, min(256, lo + delta) / 256
    small = {r["id"] for r in C.hash_sample(docs_pool, "id", rate=rate_lo).collect()}
    big = {r["id"] for r in C.hash_sample(docs_pool, "id", rate=rate_hi).collect()}
    assert small <= big  # raising the rate only ever adds rows


@given(drop_b=st.booleans(), drop_junk=st.booleans(), drop_size=st.booleans())
@settings(**SETTINGS)
def test_drop_nested_isolation(spark, drop_b, drop_junk, drop_size):
    data = [{"id": 7, "info": {"a": 1, "b": 2, "c": {"x": 9, "junk": "z"}},
             "pets": [{"name": "rex",
                       "face": {"eyes": [{"colour": "blue", "size": 2}]}}]}]
    df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in data])
    )
    paths = (
        (["info.b"] if drop_b else [])
        + (["info.c.junk"] if drop_junk else [])
        + (["pets.face.eyes.size"] if drop_size else [])
    )
    out = drop_nested(df, paths)
    row = out.collect()[0]
    # survivors always intact regardless of which siblings were dropped
    assert row["id"] == 7
    assert row["info"]["a"] == 1
    assert row["info"]["c"]["x"] == 9
    assert row["pets"][0]["face"]["eyes"][0]["colour"] == "blue"
    info_fields = set(row["info"].asDict())
    assert ("b" in info_fields) == (not drop_b)


# -- shared fixture ----------------------------------------------------------

import pytest  # noqa: E402


@pytest.fixture(scope="module")
def docs_pool(spark):
    rows = [(i, f"doc number {i}") for i in range(200)]
    return spark.createDataFrame(rows, "id long, text string").cache()
