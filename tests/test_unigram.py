"""Unigram-LM tokenizer pins: vocab construction, Viterbi determinism,
fallback paths, and config-stage wiring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark.operators import unigram as U

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_vocab_chars_retained_and_scores(spark):
    df = spark.createDataFrame(
        [(1, "abab ab"), (2, "abab cd")], "id long, text string"
    )
    rows = {
        r["piece"]: (r["count"], r["score"])
        for r in U.unigram_train(df, vocab_size=2, max_piece_len=3).collect()
    }
    # every char present; exactly vocab_size multis survive the top-k
    assert {"a", "b", "c", "d"} <= set(rows)
    multis = [p for p in rows if len(p) >= 2]
    assert len(multis) == 2
    # 'ab' is the most frequent multi: 2 occurrences in 'abab' (x2 docs)
    # + 1 in 'ab' = 5; ties then lexicographic
    assert "ab" in multis
    total = sum(c for c, _ in rows.values())
    for p, (c, s) in rows.items():
        assert s == round(math.log(c / total), 9), p


def test_viterbi_prefers_high_probability_pieces():
    scores = {"a": -3.0, "b": -3.0, "ab": -1.0, "abb": -5.0}
    q9 = lambda x: round(x, 9)
    # ab + b (-4.0) beats abb (-5.0) and a+b+b (-9.0)
    assert U._viterbi("abb", scores, 3, 16, q9) == ["ab", "b"]
    # ties break toward the smallest j = the LONGEST closing piece
    tie = {"a": -2.0, "aa": -4.0}
    assert U._viterbi("aa", tie, 3, 16, q9) == ["aa"]


def test_encode_unk_and_long_word_fallback(spark, documents):
    vocab = U.unigram_train(documents, vocab_size=50, max_piece_len=4)
    # a word whose chars never appear in the corpus -> UNK char pieces;
    # a word longer than max_word_len -> raw char fallback
    df = spark.createDataFrame(
        [(1, "zzqqzz"), (2, "a" * 20)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["unigram_tokens"]
        for r in U.unigram_encode(
            df, vocab, max_piece_len=4, max_word_len=16
        ).collect()
    }
    assert out[1] == list("zzqqzz")
    assert out[2] == list("a" * 20)


def test_encode_reassembles_corpus(spark, documents):
    vocab = U.unigram_train(documents, vocab_size=100, max_piece_len=4)
    enc = U.unigram_encode(documents.limit(50), vocab)
    for r in enc.select("text", "unigram_tokens").collect():
        assert "".join(r["unigram_tokens"]) == r["text"].replace(" ", "")
    # null text -> empty tokens
    nul = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = U.unigram_encode(nul, vocab).first()
    assert row["unigram_tokens"] == [] and row["n_unigram_tokens"] == 0


def test_stage_wiring_and_errors(spark, documents):
    from config_driven_pyspark_spark import Pipeline

    out = Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": f"{SF_DIR}/documents.parquet", "name": "docs"},
        {"stage": "corpus", "op": "unigram_train", "column": "text",
         "vocab_size": 100, "max_piece_len": 4, "name": "v"},
        {"stage": "corpus", "op": "unigram_encode", "column": "text",
         "vocab": "v", "input": "docs"},
    ]).run(spark)
    assert "unigram_tokens" in out.columns
    assert out.filter(F.col("n_unigram_tokens") <= 0).count() == 0
    with pytest.raises(ValueError, match="vocab_size"):
        U.unigram_train(documents, vocab_size=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        U.unigram_train(documents, max_piece_len=0)
    with pytest.raises(ValueError, match="max_words"):
        U.unigram_train(documents, max_words=0)
