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


def test_quality_filter_perplexity_example(spark, tmp_path):
    out = str(tmp_path / "quality_docs")
    with open(os.path.join(EXAMPLES, "quality_filter_perplexity.yaml")) as fh:
        text = fh.read()
    result = Pipeline.from_yaml(text).run(
        spark,
        variables={
            "input": "/root/testdata/sf0.001/documents.parquet",
            "output": out,
        },
    )
    assert result.columns == ["doc_id", "text", "n_bigrams", "nll_per_bigram"]
    n_total = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    n_kept = spark.read.parquet(out).count()
    assert 0 < n_kept < n_total  # the filter must actually drop a tail
    # every surviving row satisfies the declared thresholds
    bad = spark.read.parquet(out).filter(
        "n_bigrams < 5 OR nll_per_bigram > 3.43"
    ).count()
    assert bad == 0


def test_pq_compressed_search_example(spark):
    with open(os.path.join(EXAMPLES, "pq_compressed_search.yaml")) as fh:
        text = fh.read()
    result = Pipeline.from_yaml(text).run(
        spark,
        variables={"corpus": "/root/testdata/sf0.001/embeddings.parquet"},
    )
    rows = result.collect()
    # rerank path outputs exact cosines for the final ranking
    assert result.columns == ["query_id", "neighbor_id", "rank", "cosine"]
    assert 0 < len(rows) <= 10 * 5
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for q, rs in per_q.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1)), q
        cos = [c for _, c in rs]
        assert cos == sorted(cos, reverse=True), q


def test_tokenizer_pipeline_example(spark):
    with open(os.path.join(EXAMPLES, "tokenizer_pipeline.yaml")) as fh:
        text = fh.read()
    result = Pipeline.from_yaml(text).run(
        spark,
        variables={
            "input": "/root/testdata/sf0.001/documents.parquet",
            "seq_len": 256,
        },
    )
    assert result.columns == ["seq_id", "n_docs", "n_tokens", "seq_text"]
    rows = result.orderBy("seq_id").collect()
    assert len(rows) > 1
    # every sequence except the final partial is exactly seq_len BPE
    # tokens, and the packed text is BPE symbols (merged subwords occur)
    assert all(r["n_tokens"] == 256 for r in rows[:-1])
    assert 0 < rows[-1]["n_tokens"] <= 256
    toks = set(rows[0]["seq_text"].split(" "))
    assert any(len(t) > 1 for t in toks)  # at least one merge applied


def test_hybrid_index_search_example(spark, tmp_path):
    """Hybrid retrieval over the persisted int8 index with exact rerank,
    fused with BM25 — all from YAML stages (r8)."""
    with open(os.path.join(EXAMPLES, "hybrid_index_search.yaml")) as fh:
        text = fh.read()
    variables = {
        "documents": "/root/testdata/sf0.001/documents.parquet",
        "embeddings": "/root/testdata/sf0.001/embeddings.parquet",
        "index": str(tmp_path / "hybrid_idx"),
    }
    result = Pipeline.from_yaml(text).run(spark, variables=variables)
    rows = result.collect()
    assert result.columns == ["query_id", "neighbor_id", "rank", "rrf_score"]
    assert len(rows) == 3 * 10
    # a candidate ranked by both components must outscore one ranked by a
    # single component at the same rank; scores decrease with rank
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["rrf_score"]))
    for q, rs in per_q.items():
        rs.sort()
        scores = [s for _, s in rs]
        assert scores == sorted(scores, reverse=True), q
    # second run reuses the persisted index (build-once/query-many):
    # identical output
    again = Pipeline.from_yaml(text).run(spark, variables=variables)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


def test_web_curation_example(spark, tmp_path):
    """r8: the cleanup-tier example runs end to end on a snapshot that
    carries a url column; survivors are scrubbed, scored, deduped, and
    sharded within budget."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "docs_with_urls")
    (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
     .withColumn("url", F.concat(
         F.lit("https://www.s"), (F.col("doc_id") % 7).cast("string"),
         F.lit(".example.com/doc/"), F.col("doc_id").cast("string")))
     .write.parquet(src))
    with open(os.path.join(EXAMPLES, "web_curation.yaml")) as fh:
        text = fh.read()
    result = Pipeline.from_yaml(text).run(
        spark, variables={"input": src, "shard_bytes": 4000}
    ).cache()
    rows = result.collect()
    assert rows
    assert result.columns == ["doc_id", "lang", "domain", "n_email",
                              "n_ipv4", "n_phone", "score", "n_bytes",
                              "shard"]
    assert all(r["domain"] == "example.com" for r in rows)
    assert all(r["score"] >= 0.005 for r in rows)
    per_shard = result.groupBy("shard").agg(
        F.sum("n_bytes").alias("b"), F.max("n_bytes").alias("m")).collect()
    for r in per_shard:
        assert r["b"] - r["m"] < 4000
    result.unpersist()


def test_embedding_curation_example(spark):
    """r8+r9: NCM label filter → SemDeDup → contrastive triplets — every
    id the triplets reference survived both curation stages."""
    from config_driven_pyspark_spark.operators import similarity as S

    with open(os.path.join(EXAMPLES, "embedding_curation.yaml")) as fh:
        text = fh.read()
    src = "/root/testdata/sf0.001/embeddings.parquet"
    result = Pipeline.from_yaml(text).run(
        spark, variables={"input": src, "n_clusters": 4}
    ).cache()
    emb = spark.read.parquet(src)
    good = {
        r["vec_id"]
        for r in S.ncm_classify(emb).filter("correct").collect()
    }
    rows = result.collect()
    assert rows
    assert {"anchor_id", "positive_id", "pos_cosine", "negative_id",
            "neg_cosine", "neg_rank"} == set(result.columns)
    referenced = {r["anchor_id"] for r in rows} \
        | {r["positive_id"] for r in rows} \
        | {r["negative_id"] for r in rows}
    assert referenced <= good
    for r in rows:
        assert r["pos_cosine"] >= 0.3
        assert 0.2 <= r["neg_cosine"] < 0.28
        assert 1 <= r["neg_rank"] <= 2
    result.unpersist()


def test_crawl_curation_example(spark, tmp_path):
    """r9: the raw-crawl front half — html_extract → url_normalize →
    url_features(blocklist on the canonical form) → gopher_filter →
    repetition_filter → exact dedup → byte shards — runs end-to-end
    from YAML; every planted failure mode (blocked domain via tracking
    variant, junk doc, looped doc, exact dup) is dropped."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(120)
    good = " ".join(f"tok{i}" for i in range(30))
    crawl = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><script>x=1;</script><p>"),
            F.when(F.col("doc_id") % 11 == 0, F.lit("junk " * 40))
            .when(F.col("doc_id") % 13 == 0, F.lit("loop me " * 40))
            .when(F.col("doc_id") % 17 == 0, F.lit(good))  # exact dups
            .otherwise(F.col("text")),
            F.lit("</p></body></html>"),
        ).alias("html"),
        F.concat(
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit("https://SPAM.example:443/p"))
            .otherwise(F.concat(F.lit("https://ok.site/d/"),
                                F.col("doc_id").cast("string"))),
            F.lit("?utm_source=feed"),
        ).alias("url"),
    )
    src = str(tmp_path / "crawl_src")
    crawl.write.parquet(src)
    with open(os.path.join(EXAMPLES, "crawl_curation.yaml")) as fh:
        out = Pipeline.from_yaml(fh.read()).run(
            spark, variables={"src": src}
        )
    rows = out.collect()
    assert out.columns == [
        "doc_id", "url_norm", "domain", "n_tokens", "n_bytes", "shard",
    ]
    ids = {r["doc_id"] for r in rows}
    assert ids and not any(i % 7 == 0 for i in ids)    # blocklist leg
    assert not any(i % 11 == 0 for i in ids)           # gopher junk leg
    assert not any(i % 13 == 0 for i in ids)           # repetition leg
    dup_ids = sorted(i for i in ids if i % 17 == 0)
    assert len(dup_ids) <= 1                           # exact-dup leg
    assert all("utm_source" not in r["url_norm"] for r in rows)


def test_benchmark_hygiene_example(spark):
    """r9: the Dolma/CCNet back half — Bloom decontamination against a
    held-out benchmark slice → self-trained bigram-LM scoring →
    per-language quality terciles → tail drop — runs end-to-end from
    YAML; src0 overlap is removed and roughly a third of each surviving
    language lands in the dropped tail."""
    with open(os.path.join(EXAMPLES, "benchmark_hygiene.yaml")) as fh:
        out = Pipeline.from_yaml(fh.read()).run(
            spark,
            variables={"input": "/root/testdata/sf0.001/documents.parquet"},
        )
    rows = out.collect()
    assert rows and set(out.columns) == {"doc_id", "lang", "avg_nll", "bucket"}
    buckets = {r["bucket"] for r in rows}
    assert buckets == {"head", "middle"}  # tail filtered out
    # decontamination really dropped documents: survivors < the src<>src0 pool
    n_pool = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("source <> 'src0'").count()
    )
    # head+middle ~= 2/3 of the decontaminated pool
    assert 0 < len(rows) < n_pool


def test_verified_export_example(spark, tmp_path):
    """r9: curriculum layout -> byte-budget shards -> parquet sink ->
    integrity receipts, end-to-end from YAML. The re-read copy must
    reproduce every receipt (rows, bytes, checksum) bit-for-bit."""
    from config_driven_pyspark_spark.operators.integrity import (
        export_manifest,
        manifest_diff,
    )

    out_dir = str(tmp_path / "export")
    with open(os.path.join(EXAMPLES, "verified_export.yaml")) as fh:
        manifest = Pipeline.from_yaml(fh.read()).run(
            spark,
            variables={
                "input": "/root/testdata/sf0.001/documents.parquet",
                "output": out_dir,
            },
        )
    receipts = manifest.collect()
    assert set(manifest.columns) == {"shard", "n_rows", "n_bytes",
                                     "checksum"}
    assert sum(r["n_rows"] for r in receipts) == 500
    # the copy that landed on disk replays every receipt exactly
    written = spark.read.parquet(out_dir)
    assert {"curriculum_rank", "phase", "shard"} <= set(written.columns)
    diff = manifest_diff(written, manifest, by="shard",
                         id_col="doc_id", text_col="text")
    assert {r["status"] for r in diff.collect()} == {"ok"}
    # ... and a corrupted copy does not
    broken = written.limit(499)
    st = {r["status"]
          for r in manifest_diff(broken, manifest, by="shard",
                                 id_col="doc_id",
                                 text_col="text").collect()}
    assert "mismatch" in st or "missing" in st


def test_cdc_snapshot_maintenance_example(spark, tmp_path):
    """r10: one CDC batch maintains BOTH a flat current-state snapshot
    (merge) and a versioned SCD2 dimension, end-to-end from YAML."""
    snapshot = str(tmp_path / "snap")
    dimension = str(tmp_path / "dim")
    events = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id bigint, val string, qty bigint",
    ).write.parquet(snapshot)
    spark.createDataFrame(
        [(2, "B2", 21, "2024-02-01", False),
         (3, "c", 30, "2024-02-01", False),
         (4, "d", 40, "2024-02-01", False),
         (1, "a", 10, "2024-02-01", True)],
        "id bigint, val string, qty bigint, eff string, gone boolean",
    ).selectExpr("id", "val", "qty",
                 "CAST(eff AS DATE) AS effective_ts",
                 "gone AS is_deleted").write.parquet(events)

    with open(os.path.join(
            EXAMPLES, "cdc_snapshot_maintenance.yaml")) as fh:
        audit = Pipeline.from_yaml(fh.read()).run(
            spark, variables={"events": events, "snapshot": snapshot,
                              "dimension": dimension},
        )
    assert audit.collect()[0]["n_rows"] == 3  # 2', 3, 4 (1 deleted)
    snap = {r["id"]: r["val"]
            for r in spark.read.parquet(snapshot).collect()}
    assert snap == {2: "B2", 3: "c", 4: "d"}
    dim = spark.read.parquet(dimension)
    # day-zero bootstrap from the batch: non-delete rows became current
    assert dim.filter("is_current").count() == 3
    assert {r["id"] for r in dim.filter("is_current").collect()} == \
        {2, 3, 4}


def test_governed_versioned_table_example(spark, tmp_path):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority",
             "o_totalprice")
    seed = str(tmp_path / "day0")
    batch = str(tmp_path / "day1")
    orders.filter(F.col("o_orderkey") % 4 != 3).write.parquet(seed)
    (
        orders.filter(
            (F.col("o_orderkey") % 8 == 2)
            & (F.col("o_orderstatus") == "P")
        )
        .withColumn("o_orderpriority", F.lit("DAY1"))
        # poison two rows so the expectations gate has work to do
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 64 == 2, F.lit(-1.0)).otherwise(
                F.col("o_totalprice")
            ),
        )
        .write.parquet(batch)
    )
    with open(
        os.path.join(EXAMPLES, "governed_versioned_table.yaml")
    ) as fh:
        text = fh.read()
    snapshot = str(tmp_path / "snap")
    quarantine = str(tmp_path / "quar")
    changes = Pipeline.from_yaml(text).run(
        spark,
        variables={"seed": seed, "batch": batch, "snapshot": snapshot,
                   "quarantine": quarantine},
    )
    by_type = {
        r["_change_type"]: r["cnt"]
        for r in changes.groupBy("_change_type").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    # every clean DAY1 row updates its match pair; no inserts/deletes
    assert set(by_type) == {"update_preimage", "update_postimage"}
    assert by_type["update_preimage"] == by_type["update_postimage"] > 0
    # quarantined rows carry the violated constraint name
    quar = spark.read.parquet(quarantine)
    assert quar.count() > 0
    assert all(
        r["_violations"] == ["positive_price"] for r in quar.collect()
    )
    # the poisoned rows never reached the snapshot
    assert spark.read.parquet(snapshot).filter(
        "o_totalprice < 0"
    ).count() == 0


def test_incremental_cdf_consumer_example(spark, tmp_path):
    """The changes_stream consumer: first run drains v1; a later merge
    plus a consumer-only rerun appends ONLY v2's changes (the cursor
    resumed) — never reprocessing v1."""
    from pyspark.sql import functions as F

    from config_driven_pyspark_spark.operators import history as H
    from config_driven_pyspark_spark.operators.table import merge_upsert

    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority",
             "o_totalprice")
    seed = str(tmp_path / "day0")
    batch = str(tmp_path / "day1")
    orders.filter(F.col("o_orderkey") % 4 != 3).write.parquet(seed)
    (
        orders.filter(
            (F.col("o_orderkey") % 8 == 2)
            & (F.col("o_orderstatus") == "P")
        )
        .withColumn("o_orderpriority", F.lit("DAY1"))
        .write.parquet(batch)
    )
    with open(
        os.path.join(EXAMPLES, "incremental_cdf_consumer.yaml")
    ) as fh:
        text = fh.read()
    variables = {
        "seed": seed, "batch": batch,
        "snapshot": str(tmp_path / "snap"),
        "checkpoint": str(tmp_path / "ckpt"),
        "downstream": str(tmp_path / "feed"),
    }
    feed = Pipeline.from_yaml(text).run(spark, variables=variables)
    v1 = {
        r["_change_type"]: r["cnt"]
        for r in feed.groupBy("_change_type").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    assert set(v1) == {"update_postimage"}  # preimages filtered out
    assert H.read_changes_cursor(
        spark, variables["checkpoint"]) == 1
    # day 2: a delete-carrying merge, then ONLY the consumer stages
    day2 = (
        orders.filter(
            (F.col("o_orderkey") % 8 == 1)
            & (F.col("o_orderstatus") == "O")
        )
        .withColumn("o_orderpriority", F.lit("DAY2"))
        .withColumn("is_deleted", F.col("o_orderkey") % 16 == 1)
    )
    merge_upsert(day2, variables["snapshot"], ["o_orderkey"],
                 delete_col="is_deleted",
                 partition_by=["o_orderstatus"])
    consumer_only = [
        s for s in Pipeline.from_yaml(text).stages
        if s.get("stage") in ("changes_stream",)
    ]
    Pipeline(consumer_only).run(spark, variables=variables)
    feed2 = spark.read.parquet(variables["downstream"])
    assert H.read_changes_cursor(
        spark, variables["checkpoint"]) == 2
    v2 = {
        (r["_change_type"], r["_commit_version"]): r["cnt"]
        for r in feed2.groupBy("_change_type", "_commit_version").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    # v1 rows unchanged (never reprocessed); v2 adds deletes + posts
    assert v2[("update_postimage", 1)] == v1["update_postimage"]
    assert ("delete", 2) in v2 and ("update_postimage", 2) in v2
    assert ("update_preimage", 2) not in v2


def test_gdpr_erasure_dv_example(spark, tmp_path):
    """Deletion-vector erasure: the delete touches no data files, the
    audit CDF reports every erased row, materialization converges the
    physical files, and the final read is the erased state."""
    import os as _os

    from pyspark.sql import functions as F

    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority",
             "o_totalprice")
    seed = str(tmp_path / "subjects")
    orders.filter(F.col("o_orderkey") % 4 != 3).write.parquet(seed)
    with open(os.path.join(EXAMPLES, "gdpr_erasure_dv.yaml")) as fh:
        text = fh.read()
    variables = {
        "seed": seed,
        "table": str(tmp_path / "table"),
        "audit": str(tmp_path / "audit"),
    }
    out = Pipeline.from_yaml(text).run(spark, variables=variables)
    erased = {
        int(r["o_orderkey"])
        for r in orders.filter(
            (F.col("o_orderkey") % 16 == 2)
            & (F.col("o_orderkey") % 4 != 3)
        ).collect()
    }
    live = {int(r["o_orderkey"]) for r in out.collect()}
    assert erased and not (erased & live)
    # the audit trail carries one honest delete per erased subject
    audit = spark.read.parquet(variables["audit"])
    got = {
        int(r["o_orderkey"])
        for r in audit.filter("_change_type = 'delete'").collect()
    }
    assert got == erased
    # materialization cleaned the raw files too
    raw = {
        int(r["o_orderkey"])
        for r in spark.read.parquet(variables["table"]).collect()
    }
    assert not (erased & raw)
    _ = _os


def test_gdpr_trickle_coalesce_example(spark, tmp_path):
    """Trickle erasure with self-bounding vector fan-in: three daily
    merge-on-read deletes, the third trips coalesce_after=3, and the
    final state reads all three erasures through ONE vector dir."""
    from pyspark.sql import functions as F

    from config_driven_pyspark_spark.operators.deletes import (
        _dv_root, _list_dv,
    )

    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    seed = str(tmp_path / "day0")
    orders.filter(F.col("o_orderkey") % 4 != 3).write.parquet(seed)
    variables = {"seed": seed, "table": str(tmp_path / "table")}
    with open(os.path.join(EXAMPLES, "gdpr_trickle_coalesce.yaml")) as fh:
        out = Pipeline.from_yaml(fh.read()).run(spark, variables=variables)
    erased = {
        int(r["o_orderkey"])
        for r in orders.filter(
            (F.col("o_orderkey") % 4 != 3)
            & (F.col("o_orderkey") % 32).isin(2, 7, 13)
        ).collect()
    }
    live = {int(r["o_orderkey"]) for r in out.collect()}
    assert erased and not (erased & live)
    # the fan-in is bounded: one vector dir, zero data rewrites
    assert len(_list_dv(spark, _dv_root(variables["table"]))) == 1
    raw = {
        int(r["o_orderkey"])
        for r in spark.read.parquet(variables["table"]).collect()
    }
    assert erased <= raw  # merge-on-read: raw files untouched
