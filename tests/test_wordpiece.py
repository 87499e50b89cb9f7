"""WordPiece tokenizer pins: role-tagged vocab construction, greedy
longest-match determinism, UNK paths, and config-stage wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark.operators import wordpiece as W

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_vocab_roles_and_retention(spark):
    df = spark.createDataFrame(
        [(1, "abab ab"), (2, "abab cd")], "id long, text string"
    )
    rows = {
        (r["piece"], r["cont"]): r["count"]
        for r in W.wordpiece_train(df, vocab_size=3, max_piece_len=3).collect()
    }
    # word-initial vs continuation are separate entries: 'b' never starts
    # a word here, so it exists only as a continuation piece
    assert ("a", False) in rows and ("a", True) in rows
    assert ("b", True) in rows and ("b", False) not in rows
    assert ("c", False) in rows and ("d", True) in rows
    multis = [k for k in rows if len(k[0]) >= 2]
    assert len(multis) == 3
    # ('ab', False) counts word starts: abab x2 docs + ab = 3
    assert rows[("ab", False)] == 3
    # ('ab', True) counts the interior occurrence in abab x2 docs = 2
    # (top-3 multis by count desc, piece asc, cont asc)
    assert ("ab", True) in rows and rows[("ab", True)] == 2


def test_greedy_longest_match_and_continuation():
    vocab = {("un", False), ("able", True), ("a", True), ("b", True),
             ("l", True), ("e", True), ("u", False), ("n", True)}
    # longest match at each cursor: un + ##able, not u+##n+...
    assert W._greedy("unable", vocab, 4, 16) == ["un", "##able"]
    # greedy is NOT globally optimal: it never backtracks
    v2 = {("ab", False), ("abc", False), ("d", True), ("c", True)}
    assert W._greedy("abcd", v2, 3, 16) == ["abc", "##d"]


def test_encode_unk_paths(spark, documents):
    vocab = W.wordpiece_train(documents, vocab_size=50, max_piece_len=4)
    df = spark.createDataFrame(
        [(1, "zzqqzz"), (2, "a" * 20)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["wordpiece_tokens"]
        for r in W.wordpiece_encode(
            df, vocab, max_piece_len=4, max_word_len=16
        ).collect()
    }
    # chars never seen in the corpus -> whole word UNK; word longer than
    # max_word_len -> UNK regardless of vocab coverage
    assert out[1] == [W.UNK_TOKEN]
    assert out[2] == [W.UNK_TOKEN]


def test_encode_reassembles_corpus(spark, documents):
    vocab = W.wordpiece_train(documents, vocab_size=100, max_piece_len=4)
    enc = W.wordpiece_encode(documents.limit(50), vocab)
    for r in enc.select("text", "wordpiece_tokens").collect():
        joined = "".join(
            t[2:] if t.startswith("##") else t
            for t in r["wordpiece_tokens"]
        )
        words = [w for w in r["text"].split(" ") if w]
        # every in-table word reassembles; none should UNK on its own corpus
        assert W.UNK_TOKEN not in r["wordpiece_tokens"]
        assert joined == "".join(words)
    nul = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = W.wordpiece_encode(nul, vocab).first()
    assert row["wordpiece_tokens"] == [] and row["n_wordpiece_tokens"] == 0


def test_stage_wiring_and_errors(spark, documents):
    from config_driven_pyspark_spark import Pipeline

    out = Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": f"{SF_DIR}/documents.parquet", "name": "docs"},
        {"stage": "corpus", "op": "wordpiece_train", "column": "text",
         "vocab_size": 100, "max_piece_len": 4, "name": "v"},
        {"stage": "corpus", "op": "wordpiece_encode", "column": "text",
         "vocab": "v", "input": "docs"},
    ]).run(spark)
    assert "wordpiece_tokens" in out.columns
    assert out.filter(F.col("n_wordpiece_tokens") <= 0).count() == 0
    with pytest.raises(ValueError, match="vocab_size"):
        W.wordpiece_train(documents, vocab_size=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        W.wordpiece_train(documents, max_piece_len=0)
    with pytest.raises(ValueError, match="max_words"):
        W.wordpiece_train(documents, max_words=0)


def test_token_stats_generic_rollup(spark, documents):
    from config_driven_pyspark_spark.operators.bpe import token_stats

    vocab = W.wordpiece_train(documents, vocab_size=50, max_piece_len=4)
    enc = W.wordpiece_encode(documents, vocab)
    out = {r["lang"]: r for r in token_stats(
        enc, "n_wordpiece_tokens", by="lang").collect()}
    total_docs = sum(r["n_docs"] for r in out.values())
    assert total_docs == documents.count()
    for lang, r in out.items():
        assert r["n_tokens"] > 0 and r["n_bytes"] > 0
        assert r["tokens_per_byte"] == round(
            r["n_tokens"] / r["n_bytes"], 9)
    # global (no stratum) roll-up sums to the same totals
    g = token_stats(enc, "n_wordpiece_tokens").first()
    assert g["n_docs"] == total_docs
    assert g["n_tokens"] == sum(r["n_tokens"] for r in out.values())


def test_token_stats_unk_coverage(spark, documents):
    from config_driven_pyspark_spark.operators.bpe import token_stats

    # train on the corpus, encode FOREIGN text -> real UNKs counted
    vocab = W.wordpiece_train(documents, vocab_size=50, max_piece_len=4)
    foreign = spark.createDataFrame(
        [(1, "zzqq zzqq word", "x"), (2, "all normal words", "x")],
        "doc_id long, text string, lang string",
    )
    enc = W.wordpiece_encode(foreign, vocab)
    expected_unk = sum(
        t == W.UNK_TOKEN
        for row in enc.collect() for t in row["wordpiece_tokens"]
    )
    assert expected_unk >= 2  # the two zzqq occurrences at minimum
    r = token_stats(enc, "n_wordpiece_tokens", by="lang",
                    tokens_col="wordpiece_tokens").first()
    assert r["n_unk"] == expected_unk
    assert r["unk_rate"] == round(expected_unk / r["n_tokens"], 9)
    # self-trained corpus has full coverage: zero UNKs
    self_enc = W.wordpiece_encode(documents, vocab)
    s = token_stats(self_enc, "n_wordpiece_tokens",
                    tokens_col="wordpiece_tokens").first()
    assert s["n_unk"] == 0 and s["unk_rate"] == 0.0
