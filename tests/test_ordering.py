"""curriculum_order pins: exact global rank vs a reference sort,
bucket-boundary independence, descending/null/phase semantics, and
config-stage wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark.operators.ordering import curriculum_order

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _reference_ranks(rows, ascending=True):
    def key(r):
        null_first = r["n_chars"] is None
        s = r["n_chars"] if r["n_chars"] is not None else 0
        return (not null_first if ascending else null_first,
                s if ascending else -s, r["doc_id"])
    return {r["doc_id"]: i for i, r in enumerate(sorted(rows, key=key))}


def test_exact_rank_matches_global_sort(spark, documents):
    out = curriculum_order(
        documents, score_col="n_chars", n_buckets=16, n_phases=4
    )
    got = {r["doc_id"]: (r["curriculum_rank"], r["phase"])
           for r in out.collect()}
    ref = _reference_ranks(documents.select("doc_id", "n_chars").collect())
    n = len(ref)
    for did, rank in ref.items():
        assert got[did][0] == rank, did
        assert got[did][1] == rank * 4 // n, did
    # rank is a permutation of 0..n-1
    assert sorted(r for r, _ in got.values()) == list(range(n))


def test_rank_independent_of_bucket_count(spark, documents):
    a = curriculum_order(documents, score_col="n_chars", n_buckets=1)
    b = curriculum_order(documents, score_col="n_chars", n_buckets=64)
    ra = {r["doc_id"]: r["curriculum_rank"] for r in a.collect()}
    rb = {r["doc_id"]: r["curriculum_rank"] for r in b.collect()}
    assert ra == rb


def test_descending_and_nulls_first(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 1.0), (4, 5.0)],
        "doc_id long, score double",
    )
    asc = {r["doc_id"]: r["curriculum_rank"]
           for r in curriculum_order(df, n_buckets=4).collect()}
    # nulls first, then score asc, ties by id
    assert asc == {2: 0, 3: 1, 1: 2, 4: 3}
    desc = {r["doc_id"]: r["curriculum_rank"]
            for r in curriculum_order(df, ascending=False,
                                      n_buckets=4).collect()}
    # descending negates the score; null (-null) still sorts first
    assert desc == {2: 0, 1: 1, 4: 2, 3: 3}


def test_stage_wiring_and_errors(spark, documents):
    from config_driven_pyspark_spark import Pipeline

    out = Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": f"{SF_DIR}/documents.parquet"},
        {"stage": "corpus", "op": "curriculum", "id_col": "doc_id",
         "score_col": "n_chars", "n_buckets": 8, "n_phases": 3},
    ]).run(spark)
    assert {"curriculum_rank", "phase"} <= set(out.columns)
    assert out.agg(F.max("phase")).first()[0] == 2
    with pytest.raises(ValueError, match="n_buckets"):
        curriculum_order(documents, score_col="n_chars", n_buckets=0)
    with pytest.raises(ValueError, match="n_phases"):
        curriculum_order(documents, score_col="n_chars", n_phases=0)
