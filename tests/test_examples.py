"""The shipped example configs must run end-to-end on the testdata."""

from __future__ import annotations

import os

from config_driven_pyspark_spark import Pipeline

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_training_data_prep_example(spark, tmp_path):
    out = str(tmp_path / "clean_docs")
    with open(os.path.join(EXAMPLES, "training_data_prep.yaml")) as fh:
        text = fh.read()
    result = Pipeline.from_yaml(text).run(
        spark,
        variables={
            "input": "/root/testdata/sf0.001/documents.parquet",
            "output": out,
        },
    )
    assert result.columns == [
        "doc_id", "lang", "source", "text", "quality_score",
        "bpe_token_count", "fingerprint",
    ]
    written = spark.read.parquet(out)
    n = written.count()
    assert 0 < n < 500  # filters + dedup must actually drop rows
    # partitioned layout on disk
    assert any(d.startswith("lang=") for d in os.listdir(out))


def test_pretraining_shards_example(spark, tmp_path):
    out = str(tmp_path / "shards")
    with open(os.path.join(EXAMPLES, "pretraining_shards.yaml")) as fh:
        text = fh.read()
    result = Pipeline.from_yaml(text).run(
        spark,
        variables={
            "input": "/root/testdata/sf0.001/documents.parquet",
            "output": out,
            "seq_len": 256,
        },
    )
    assert result.columns == [
        "seq_id", "n_docs", "n_tokens", "seq_text",
        "split", "shard", "shuffle_key",
    ]
    written = spark.read.parquet(out)
    n_seq = written.count()
    assert n_seq > 0
    # every sequence is exactly seq_len tokens except at most the last
    assert written.filter("n_tokens <> 256").count() <= 1
    # split landed as hive partitions; shards within bounds
    assert any(d.startswith("split=") for d in os.listdir(out))
    assert written.filter("shard < 0 OR shard >= 4").count() == 0


def test_ann_index_search_example(spark, tmp_path):
    idx = str(tmp_path / "ann_index")
    with open(os.path.join(EXAMPLES, "ann_index_search.yaml")) as fh:
        text = fh.read()
    variables = {
        "corpus": "/root/testdata/sf0.001/embeddings.parquet",
        "queries": "/root/testdata/sf0.001/embeddings.parquet",
        "index": idx,
    }
    result = Pipeline.from_yaml(text).run(spark, variables=variables)
    rows = result.collect()
    assert result.columns == ["query_id", "neighbor_id", "rank", "cosine"]
    assert 0 < len(rows) <= 100 * 10
    # the index persisted; a second run reuses it and agrees exactly
    assert os.path.isdir(os.path.join(idx, "postings"))
    again = Pipeline.from_yaml(text).run(spark, variables=variables)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
