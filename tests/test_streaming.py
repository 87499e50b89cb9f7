"""Batch/stream parity tests for the streaming stages.

The contract (streaming/stages.py): the same pipeline config produces the
same result whether the source is a static DataFrame or a file stream
drained with an ``available_now`` trigger. Windowed aggregations are
compared in ``complete`` output mode (every window emitted); the stateful
running-totals operator is compared on its final per-key state.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark import Pipeline

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Deterministic mini event log written as TWO parquet files so
    ``maxFilesPerTrigger=1`` forces genuinely multi-batch streaming."""
    base = datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + timedelta(minutes=7 * i + (i % 3)),
            i % 5,
            ["view", "click", "buy"][i % 3],
            float(i % 10) + 0.25,
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, EVENTS_DDL)
    path = str(tmp_path_factory.mktemp("events_stream"))
    df.repartition(2).write.mode("overwrite").parquet(path)
    return path


def _source(events_dir: str, streaming: bool) -> dict:
    spec = {
        "stage": "source",
        "format": "parquet",
        "path": events_dir,
        "schema": EVENTS_DDL,
    }
    if streaming:
        spec["streaming"] = True
        spec["options"] = {"maxFilesPerTrigger": "1"}
    return spec


def _collect_sorted(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def _run_stream(spark, events_dir, tmp_path, stages, query_name, mode):
    pipeline = [
        _source(events_dir, streaming=True),
        *stages,
        {
            "stage": "stream_sink",
            "format": "memory",
            "query_name": query_name,
            "output_mode": mode,
            "checkpoint": str(tmp_path / f"ckpt_{query_name}"),
        },
    ]
    return Pipeline.from_config(pipeline).run(spark)


def test_time_window_batch_stream_parity(spark, events_dir, tmp_path):
    stages = [
        {
            "stage": "time_window",
            "column": "ts",
            "duration": "1 hour",
            "group_by": ["event_type"],
            "aggs": {"n": "count(*)", "total": "sum(value)"},
        }
    ]
    batch = Pipeline.from_config(
        [_source(events_dir, streaming=False), *stages]
    ).run(spark)
    stream = _run_stream(spark, events_dir, tmp_path, stages, "tw", "complete")
    cols = ["window_start", "window_end", "event_type", "n", "total"]
    assert _collect_sorted(stream, cols) == _collect_sorted(batch, cols)
    assert len(batch.collect()) > 3


def test_sliding_window_batch_stream_parity(spark, events_dir, tmp_path):
    stages = [
        {
            "stage": "time_window",
            "column": "ts",
            "duration": "2 hours",
            "slide": "1 hour",
            "aggs": {"n": "count(*)"},
        }
    ]
    batch = Pipeline.from_config(
        [_source(events_dir, streaming=False), *stages]
    ).run(spark)
    stream = _run_stream(spark, events_dir, tmp_path, stages, "sw", "complete")
    cols = ["window_start", "window_end", "n"]
    assert _collect_sorted(stream, cols) == _collect_sorted(batch, cols)
    # sliding: every event lands in duration/slide = 2 windows
    assert batch.agg(F.sum("n")).first()[0] == 400


def test_session_window_batch_stream_parity(spark, events_dir, tmp_path):
    stages = [
        {
            "stage": "session_window",
            "column": "ts",
            "gap": "30 minutes",
            "group_by": ["user_id"],
            "aggs": {"n": "count(*)", "total": "sum(value)"},
        }
    ]
    batch = Pipeline.from_config(
        [_source(events_dir, streaming=False), *stages]
    ).run(spark)
    stream = _run_stream(spark, events_dir, tmp_path, stages, "sess", "complete")
    cols = ["window_start", "window_end", "user_id", "n", "total"]
    assert _collect_sorted(stream, cols) == _collect_sorted(batch, cols)


def test_stream_dedup_within_watermark(spark, events_dir, tmp_path):
    stages = [
        {"stage": "watermark", "column": "ts", "delay": "10 minutes"},
        {
            "stage": "stream_dedup",
            "subset": ["user_id", "event_type"],
            "within_watermark": True,
        },
        {"stage": "select", "columns": ["user_id", "event_type"]},
    ]
    batch = Pipeline.from_config(
        [_source(events_dir, streaming=False), *stages]
    ).run(spark)
    stream = _run_stream(spark, events_dir, tmp_path, stages, "dd", "append")
    cols = ["user_id", "event_type"]
    # 5 users x 3 types, all seen within the horizon → same distinct keys
    assert _collect_sorted(stream.distinct(), cols) == _collect_sorted(batch, cols)
    assert len(batch.collect()) == 15


def test_stateful_running_totals_converges_to_batch(spark, events_dir, tmp_path):
    stages = [
        {"stage": "stateful", "keys": ["user_id"], "value": "value"},
    ]
    batch = Pipeline.from_config(
        [_source(events_dir, streaming=False), *stages]
    ).run(spark)
    emitted = _run_stream(spark, events_dir, tmp_path, stages, "st", "update")
    # update mode emits one row per key per trigger; with 2 files and
    # maxFilesPerTrigger=1 some keys emit twice — final state = max n
    final = emitted.withColumn(
        "rk",
        F.expr("row_number() OVER (PARTITION BY user_id ORDER BY n DESC)"),
    ).filter("rk = 1").drop("rk")
    cols = ["user_id", "n"]
    assert _collect_sorted(final, cols) == _collect_sorted(batch, cols)
    b = {r["user_id"]: r["total"] for r in batch.collect()}
    s = {r["user_id"]: r["total"] for r in final.collect()}
    assert set(b) == set(s)
    for k in b:
        assert abs(b[k] - s[k]) < 1e-6
    # genuinely incremental: at least one key was updated across >1 trigger
    assert emitted.count() > batch.count()


def test_stateful_per_event_running_totals(spark, events_dir, tmp_path):
    """emit='per_event' (batch twin refinement): one row per event with
    the cumulative (n, total); the last row per key equals the terminal
    aggregate, and a streaming input / missing order_by are refused."""
    per_event = Pipeline.from_config([
        _source(events_dir, streaming=False),
        {"stage": "stateful", "keys": ["user_id"], "value": "value",
         "emit": "per_event", "order_by": ["ts", "event_id"]},
    ]).run(spark)
    final = Pipeline.from_config([
        _source(events_dir, streaming=False),
        {"stage": "stateful", "keys": ["user_id"], "value": "value"},
    ]).run(spark)
    n_events = Pipeline.from_config(
        [_source(events_dir, streaming=False)]
    ).run(spark).count()
    assert per_event.count() == n_events  # one row per event
    last = per_event.withColumn(
        "rk", F.expr("row_number() OVER (PARTITION BY user_id ORDER BY n DESC)")
    ).filter("rk = 1")
    b = {r["user_id"]: (r["n"], r["total"]) for r in final.collect()}
    s = {r["user_id"]: (r["n"], r["total"]) for r in last.collect()}
    assert set(b) == set(s)
    for k in b:
        assert b[k][0] == s[k][0] and abs(b[k][1] - s[k][1]) < 1e-6
    with pytest.raises(ValueError, match="order_by"):
        Pipeline.from_config([
            _source(events_dir, streaming=False),
            {"stage": "stateful", "keys": ["user_id"], "value": "value",
             "emit": "per_event"},
        ]).run(spark)
    with pytest.raises(ValueError, match="batch-only"):
        Pipeline.from_config([
            _source(events_dir, streaming=True),
            {"stage": "stateful", "keys": ["user_id"], "value": "value",
             "emit": "per_event", "order_by": ["ts"]},
        ]).run(spark)
    with pytest.raises(ValueError, match="emit"):
        Pipeline.from_config([
            _source(events_dir, streaming=False),
            {"stage": "stateful", "keys": ["user_id"], "value": "value",
             "emit": "bogus"},
        ]).run(spark)


def test_stream_sink_await_with_nonterminating_trigger_errors(spark, events_dir, tmp_path):
    with pytest.raises(Exception, match="block forever"):
        Pipeline.from_config(
            [
                _source(events_dir, streaming=True),
                {
                    "stage": "stream_sink",
                    "format": "memory",
                    "query_name": "nt",
                    "trigger": {"processing_time": "10 seconds"},
                    "await": True,
                    "checkpoint": str(tmp_path / "ckpt_nt"),
                },
            ]
        ).run(spark)


def test_foreach_batch_sink_writes_parquet(spark, events_dir, tmp_path):
    out_dir = str(tmp_path / "fb_out")
    Pipeline.from_config(
        [
            _source(events_dir, streaming=True),
            {"stage": "filter", "predicate": "event_type = 'buy'"},
            {
                "stage": "stream_sink",
                "format": "foreach_batch",
                "sink": {"stage": "sink", "format": "parquet", "path": out_dir},
                "checkpoint": str(tmp_path / "ckpt_fb"),
            },
        ]
    ).run(spark)
    written = spark.read.parquet(out_dir)
    batch = Pipeline.from_config(
        [_source(events_dir, streaming=False),
         {"stage": "filter", "predicate": "event_type = 'buy'"}]
    ).run(spark)
    cols = ["event_id"]
    assert _collect_sorted(written, cols) == _collect_sorted(batch, cols)


def test_foreach_batch_rejects_bad_configs(spark, events_dir, tmp_path):
    base = [_source(events_dir, streaming=True)]
    with pytest.raises(ValueError, match="requires a `sink` sub-spec"):
        Pipeline.from_config(base + [
            {"stage": "stream_sink", "format": "foreach_batch",
             "checkpoint": str(tmp_path / "c1")},
        ]).run(spark)
    with pytest.raises(ValueError, match="only supports output_mode append"):
        Pipeline.from_config(base + [
            {"stage": "stream_sink", "format": "foreach_batch",
             "output_mode": "complete",
             "sink": {"stage": "sink", "format": "parquet",
                      "path": str(tmp_path / "o1")},
             "checkpoint": str(tmp_path / "c2")},
        ]).run(spark)


def test_stream_stream_join_matches_batch(spark, events_dir, tmp_path):
    """Stream-stream inner equi-join (existing join stage, both sides
    streaming) drained with availableNow equals the batch join."""
    def stages(streaming):
        return [
            {**_source(events_dir, streaming), "name": "src"},
            {"stage": "filter", "predicate": "event_type = 'buy'"},
            {"stage": "select", "columns": ["user_id", "event_id AS buy_id"],
             "name": "buys"},
            {"stage": "filter", "predicate": "event_type = 'view'",
             "input": "src"},
            {"stage": "select", "columns": ["user_id", "event_id AS view_id"]},
            {"stage": "join", "right": "buys", "on": ["user_id"]},
        ]

    batch = Pipeline.from_config(stages(False)).run(spark)
    stream = Pipeline.from_config(
        stages(True) + [{
            "stage": "stream_sink", "format": "memory", "query_name": "ssj",
            "output_mode": "append",
            "checkpoint": str(tmp_path / "ckpt_ssj"),
        }]
    ).run(spark)
    cols = ["user_id", "view_id", "buy_id"]
    assert _collect_sorted(stream, cols) == _collect_sorted(batch, cols)


def test_stream_sink_requires_streaming_input(spark, events_dir):
    with pytest.raises(Exception, match="streaming"):
        Pipeline.from_config(
            [
                _source(events_dir, streaming=False),
                {"stage": "stream_sink", "format": "memory", "query_name": "x"},
            ]
        ).run(spark)


def test_asof_join_streaming_rejected_with_clear_error(spark, events_dir):
    from config_driven_pyspark_spark.operators.joins import asof_join

    stream = (
        spark.readStream.format("parquet").schema(EVENTS_DDL).load(events_dir)
    )
    static = spark.read.format("parquet").schema(EVENTS_DDL).load(events_dir)
    with pytest.raises(NotImplementedError, match="streaming"):
        asof_join(stream, static.select("user_id", "ts", "value"),
                  on="ts", by=["user_id"])


def test_range_join_stream_static_matches_batch(spark, events_dir, tmp_path):
    """range_join is stateless explode + equi-join + filter, so a streaming
    point side against static intervals is a plain stream-static join —
    same rows as batch once drained."""
    from config_driven_pyspark_spark.operators.joins import range_join

    bands = spark.createDataFrame(
        [(1, 0.0, 4.0), (2, 4.0, 8.0), (3, 8.0, 12.0)],
        "band_id bigint, lo double, hi double",
    )
    batch_src = spark.read.format("parquet").schema(EVENTS_DDL).load(events_dir)
    batch = range_join(batch_src, bands, point="value", lower="lo", upper="hi",
                       bucket_width=4.0)

    stream_src = (
        spark.readStream.format("parquet").schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "1").load(events_dir)
    )
    streamed = range_join(stream_src, bands, point="value", lower="lo",
                          upper="hi", bucket_width=4.0)
    q = (
        streamed.writeStream.format("memory").queryName("rj_ss")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_rj_ss"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("rj_ss")
    cols = ["event_id", "band_id"]
    assert _collect_sorted(got, cols) == _collect_sorted(batch, cols)
    assert len(got.collect()) > 0


def test_flat_map_stage_works_on_streams(spark, events_dir, tmp_path):
    """flat_map (mapInPandas) is stateless, so the same registered function
    runs on a streaming source; drained output matches batch."""
    def doubler(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "event_id": pd.concat([pdf["event_id"], pdf["event_id"]]),
            })

    def build(streaming):
        p = Pipeline.from_config([
            _source(events_dir, streaming=streaming),
            {"stage": "flat_map", "fn": "doubler"},
        ])
        p.register_flat_map("doubler", doubler, "event_id bigint")
        return p.run(spark)

    batch = build(False)
    q = (
        build(True).writeStream.format("memory").queryName("fm_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_fm"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("fm_stream")
    assert _collect_sorted(got, ["event_id"]) == _collect_sorted(batch, ["event_id"])
    assert got.count() == 400


def test_streaming_asof_join_stream_stream(spark, events_dir, tmp_path):
    """streaming_asof_join runs as a genuine stream-stream chained-stateful
    plan (watermarked interval join → windowed max_by) and every emitted
    row equals the batch answer. Append mode can't flush the final open
    window before the source drains, so the check is emitted ⊆ batch with
    a liveness floor, not exact set equality."""
    def stages(streaming):
        return [
            {**_source(events_dir, streaming), "name": "src"},
            {"stage": "filter", "predicate": "event_type = 'buy'"},
            {"stage": "select",
             "columns": ["ts AS qts", "user_id", "value AS buy_value"],
             "name": "buys"},
            {"stage": "filter", "predicate": "event_type = 'view'",
             "input": "src"},
            {"stage": "streaming_asof_join", "right": "buys", "on": "ts",
             "right_on": "qts", "tolerance": "30 minutes",
             "left_id": "event_id", "by": ["user_id"],
             "window_step": "15 minutes"},
        ]

    cols = ["event_id", "user_id", "right_qts", "right_buy_value"]
    batch = {t[0]: t for t in _collect_sorted(
        Pipeline.from_config(stages(False)).run(spark), cols)}
    stream = Pipeline.from_config(
        stages(True) + [{
            "stage": "stream_sink", "format": "memory",
            "query_name": "sasof", "output_mode": "append",
            "checkpoint": str(tmp_path / "ckpt_sasof"),
        }]
    ).run(spark)
    emitted = _collect_sorted(stream, cols)
    assert emitted, "stream emitted nothing"
    for t in emitted:
        assert t == batch[t[0]], f"stream row {t} != batch {batch[t[0]]}"
    # liveness: all but the final unflushed window must have emitted
    assert len(emitted) >= len(batch) // 2


def test_map_only_corpus_ops_work_on_streams(spark, tmp_path):
    """r8: pii_scrub, url_features, and text-op normalization are pure
    Column maps, so the identical config stages run unchanged on a
    streaming source and the drained output equals batch — the corpus
    cleanup tier is streaming-safe by construction."""
    ddl = "doc_id bigint, text string, url string"
    docs = spark.createDataFrame(
        [
            (
                i,
                f"Döc  {i}\tping user{i}@ex.com now",
                f"https://W.Site{i % 3}.com/d/{i}",
            )
            for i in range(40)
        ],
        ddl,
    )
    src = str(tmp_path / "docs_src")
    docs.repartition(2).write.parquet(src)
    stages = [
        {"stage": "corpus", "op": "pii_scrub", "column": "text"},
        {"stage": "corpus", "op": "url_features", "url_col": "url",
         "blocklist": ["site0.com"]},
        {"stage": "text", "column": "text", "ops": ["normalized"]},
    ]

    batch = Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": src, "schema": ddl},
        *stages,
    ]).run(spark)
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": src, "schema": ddl,
         "streaming": True, "options": {"maxFilesPerTrigger": "1"}},
        *stages,
        {"stage": "stream_sink", "format": "memory",
         "query_name": "corpus_maps", "output_mode": "append",
         "checkpoint": str(tmp_path / "ckpt_cm"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    got = spark.table("corpus_maps")
    cols = ["doc_id", "n_email", "has_pii", "domain", "blocked", "normalized"]
    assert _collect_sorted(got, cols) == _collect_sorted(batch, cols)
    assert got.count() == 40
    one = got.filter("doc_id = 7").collect()[0]
    assert one["normalized"].endswith("ping <email> now")
    assert one["blocked"] is (7 % 3 == 0)


def test_foreach_batch_incremental_dedup(spark, tmp_path):
    """r8: exact_dedup_incremental inside foreachBatch is the streaming
    ingest pattern — each microbatch dedups against the fingerprint
    store and commits its survivors. Whatever order the two file
    batches arrive in, the surviving CONTENT set equals the distinct
    contents (content survival is order-independent; only which id
    carries it varies)."""
    import time as _time

    from config_driven_pyspark_spark.operators.dedup import (
        exact_dedup_incremental,
    )

    ddl = "doc_id bigint, text string"
    src = tmp_path / "stream_src"
    src.mkdir()
    a = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], ddl
    )
    b = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, "gamma")], ddl
    )
    a.coalesce(1).write.parquet(str(src / "f0"))
    _time.sleep(1.1)          # distinct mtimes → deterministic batching
    b.coalesce(1).write.parquet(str(src / "f1"))

    store = str(tmp_path / "fp_store")
    out = str(tmp_path / "survivors")

    def ingest(batch_df, batch_id):
        fresh = exact_dedup_incremental(batch_df, "doc_id", store)
        fresh.write.mode("append").parquet(out)

    q = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt_inc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["alpha", "beta", "gamma"]
    # the store holds exactly one fingerprint per distinct content
    fps = spark.read.parquet(store)
    assert fps.distinct().count() == 3


def test_web_curation_chain_stream_batch_parity(spark, tmp_path):
    """r9 (VERDICT r8 ask #5): the q_e2e_web_curation stage chain minus
    the shard sink — mint/inject → url_features+blocklist → scrub →
    normalize → quality_classify → keep-filter → exact dedup — runs
    UNCHANGED on a streaming source: the cleanup stages are map-only,
    quality_classify auto-switches to its 0-exchange map-literal mode,
    and the dedup stage lowers to fingerprint dropDuplicates.  A drained
    available_now stream must match batch on (a) the surviving CONTENT
    set exactly (dedup keeps first-arrival on a stream vs min-id in
    batch, so ids can differ between duplicates) and (b) every column of
    every row whose content is unique."""
    docs = spark.createDataFrame(
        [
            (
                i,
                # i%10==0: identical shared body (the dedup leg);
                # i%4==3: junk-flooded (the quality-reject leg);
                # i%7==0: planted email (the scrub leg)
                ("shared duplicate body words" if i % 10 == 0
                 else f"Döc number {i} body words unique {i}")
                + (" junk" * 8 if i % 4 == 3 else "")
                + (f" mail user{i}@ex.com" if i % 7 == 0 else ""),
                ["web", "wiki", "books"][i % 3],
            )
            for i in range(90)
        ],
        "doc_id bigint, text string, source string",
    )
    src = str(tmp_path / "cur_src")
    docs.repartition(3).write.parquet(src)
    weights = {"döc": 0.4, "number": 0.2, "unique": 0.3, "shared": -0.1,
               "words": 0.15, "body": 0.05, "junk": -0.2}
    stages = [
        {"stage": "with_columns", "columns": {
            "url": "concat('https://WWW.', source, '.Site', "
                   "cast(doc_id % 3 as string), '.com/doc/', "
                   "cast(doc_id as string))",
        }},
        {"stage": "corpus", "op": "url_features", "url_col": "url",
         "blocklist": ["site1.com"]},
        {"stage": "filter", "predicate": "NOT blocked"},
        {"stage": "corpus", "op": "pii_scrub", "column": "text",
         "types": ["email"]},
        {"stage": "text", "column": "text", "ops": ["normalized"]},
        {"stage": "corpus", "op": "quality_classify", "id_col": "doc_id",
         "column": "normalized", "weights": weights, "threshold": 0.005},
        {"stage": "filter", "predicate": "keep"},
        {"stage": "dedup", "method": "exact", "id_col": "doc_id",
         "column": "normalized"},
    ]
    ddl = "doc_id bigint, text string, source string"
    batch = Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": src, "schema": ddl},
        *stages,
    ]).run(spark)
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": src, "schema": ddl,
         "streaming": True, "options": {"maxFilesPerTrigger": "1"}},
        *stages,
        {"stage": "stream_sink", "format": "memory",
         "query_name": "web_curation", "output_mode": "append",
         "checkpoint": str(tmp_path / "ckpt_wc"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    got = spark.table("web_curation")

    # (a) surviving content set: exact match, duplicates collapsed once
    b_contents = sorted(r["normalized"] for r in batch.collect())
    s_contents = sorted(r["normalized"] for r in got.collect())
    assert s_contents == b_contents
    assert len(set(b_contents)) == len(b_contents)  # dedup left no dups
    # the fixture really exercised every leg: 30 blocked urls dropped,
    # 15 junk docs quality-rejected, 5 planted duplicates collapsed
    # into 1, and the scrub leg redacted the planted addresses
    assert len(b_contents) == 41
    assert sum("<email>" in c for c in b_contents) > 0
    assert not any("@ex.com" in c for c in b_contents)

    # (b) rows with corpus-unique content survive with identical columns
    cols = ["doc_id", "source", "domain", "n_email", "n_tokens",
            "score", "keep", "normalized"]
    uniq = [c for c in b_contents if "unique" in c]
    b_rows = {r["normalized"]: tuple(r[c] for c in cols)
              for r in batch.filter(F.col("normalized").isin(uniq)).collect()}
    s_rows = {r["normalized"]: tuple(r[c] for c in cols)
              for r in got.filter(F.col("normalized").isin(uniq)).collect()}
    assert s_rows == b_rows


def test_streaming_ingest_dedup_from_yaml(spark, tmp_path):
    """r9 (VERDICT r8 ask #8): the incremental-dedup ingest pattern is
    drivable end-to-end from YAML — a JSON file stream drains through
    the map-only cleanup tier, then each micro-batch runs the batch
    dedup stage against the persisted fingerprint store inside
    foreachBatch (stream_sink `stages`), and survivors append to the
    parquet sink.  Whatever order batches arrive, the surviving CONTENT
    set equals the corpus's distinct normalized contents, and the store
    holds exactly that many fingerprints."""
    import json as _json
    import time as _time

    src = tmp_path / "json_src"
    src.mkdir()
    batch_a = [
        {"doc_id": 1, "text": "Alpha  doc mail a@ex.com", "source": "web"},
        {"doc_id": 2, "text": "beta doc", "source": "web"},
        {"doc_id": 3, "text": "ALPHA DOC mail b@ex.com", "source": "wiki"},
    ]
    batch_b = [
        {"doc_id": 10, "text": "Beta   Doc", "source": "books"},
        {"doc_id": 11, "text": "gamma doc", "source": "web"},
        {"doc_id": 12, "text": "Gamma doc", "source": "web"},
    ]
    (src / "a.json").write_text(
        "\n".join(_json.dumps(r) for r in batch_a)
    )
    _time.sleep(1.1)  # distinct mtimes → deterministic file batching
    (src / "b.json").write_text(
        "\n".join(_json.dumps(r) for r in batch_b)
    )

    out = str(tmp_path / "curated")
    store = str(tmp_path / "fp_store")
    Pipeline.from_yaml(
        open("examples/streaming_ingest_dedup.yaml").read()
    ).run(spark, variables={
        "src": str(src), "store": store, "out": out,
        "ckpt": str(tmp_path / "ckpt"),
    })

    got = spark.read.parquet(out)
    # email scrubbed before fingerprinting: both alpha variants
    # normalize to "alpha doc mail <email>" and collapse; beta and
    # gamma collapse across/within batches
    contents = sorted(r["normalized"] for r in got.collect())
    assert contents == ["alpha doc mail <email>", "beta doc", "gamma doc"]
    assert spark.read.parquet(store).count() == 3
    # stages without foreach_batch (or outside the Pipeline) both raise
    with pytest.raises(ValueError, match="foreach_batch"):
        Pipeline.from_config([
            {"stage": "source", "format": "json", "path": str(src),
             "schema": "doc_id bigint, text string, source string",
             "streaming": True},
            {"stage": "stream_sink", "format": "memory",
             "query_name": "bad", "stages": [{"stage": "distinct"}]},
        ]).run(spark)


def test_csv_streaming_source_parity(spark, tmp_path):
    """r9: csv rides the same streaming source stage — a drained stream
    equals the batch read through an identical filter/select chain."""
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(30)],
        "id bigint, name string, score double",
    )
    src = str(tmp_path / "csv_src")
    df.repartition(2).write.option("header", "true").csv(src)
    ddl = "id bigint, name string, score double"
    stages = [
        {"stage": "filter", "predicate": "score > 10"},
        {"stage": "with_columns", "columns": {"bucket": "id % 3"}},
    ]
    opts = {"header": "true"}
    batch = Pipeline.from_config([
        {"stage": "source", "format": "csv", "path": src, "schema": ddl,
         "options": opts},
        *stages,
    ]).run(spark)
    Pipeline.from_config([
        {"stage": "source", "format": "csv", "path": src, "schema": ddl,
         "streaming": True, "options": {**opts, "maxFilesPerTrigger": "1"}},
        *stages,
        {"stage": "stream_sink", "format": "memory",
         "query_name": "csv_stream", "output_mode": "append",
         "checkpoint": str(tmp_path / "ckpt_csv"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    got = spark.table("csv_stream")
    cols = ["id", "name", "score", "bucket"]
    assert _collect_sorted(got, cols) == _collect_sorted(batch, cols)


def test_r9_cleanup_ops_stream_batch_parity(spark, tmp_path):
    """The round's late map-only additions — word_blocklist (flag mode)
    and the readability text ops — are claimed streaming-safe in their
    docstrings; a drained available_now stream must equal batch
    row-for-row (both are pure Projects, so ids line up exactly)."""
    docs = spark.createDataFrame(
        [(i,
          f"doc {i} body. question? badword" if i % 3 == 0
          else f"doc {i} clean body words")
         for i in range(30)],
        "doc_id bigint, text string",
    )
    src = str(tmp_path / "r9_src")
    docs.repartition(2).write.parquet(src)
    stages = [
        {"stage": "corpus", "op": "word_blocklist", "column": "text",
         "words": ["badword"], "mode": "flag"},
        {"stage": "text", "column": "text",
         "ops": ["sentence_count", "flesch_reading_ease", "fk_grade"]},
    ]
    ddl = "doc_id bigint, text string"
    batch = Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": src,
         "schema": ddl},
        *stages,
    ]).run(spark)
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": src,
         "schema": ddl, "streaming": True,
         "options": {"maxFilesPerTrigger": "1"}},
        *stages,
        {"stage": "stream_sink", "format": "memory",
         "query_name": "r9_cleanup", "output_mode": "append",
         "checkpoint": str(tmp_path / "ckpt_r9"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    got = spark.table("r9_cleanup")
    key = lambda rows: sorted(
        (r["doc_id"], r["n_blocked"], tuple(r["blocked_words"]), r["keep"],
         r["sentence_count"], r["flesch_reading_ease"], r["fk_grade"])
        for r in rows
    )
    assert key(got.collect()) == key(batch.collect())
    flagged = [r for r in batch.collect() if r["n_blocked"] > 0]
    assert flagged and all(not r["keep"] for r in flagged)


def test_r9_map_tier_stream_batch_parity(spark, tmp_path):
    """Completes the r9 map-only tier (VERDICT r9 ask #6): url_normalize
    (corpus stage) and lang_margin (text op) are pure Projects per their
    docstrings, so the identical config stages must drain to the exact
    batch rows on an available_now stream. (novelty is shuffle-bound and
    boilerplate_strip batch-only by nature — guarded below.)"""
    docs = spark.createDataFrame(
        [
            (
                i,
                "the and is of a thing here now" if i % 2 == 0
                else "el la de que y los una cosa",
                f"HTTPS://Ex{i % 3}.COM:443/p{i}?utm_source=x&q={i}#frag",
            )
            for i in range(30)
        ],
        "doc_id bigint, text string, url string",
    )
    src = str(tmp_path / "r10_src")
    docs.repartition(2).write.parquet(src)
    stages = [
        {"stage": "corpus", "op": "url_normalize", "url_col": "url"},
        {"stage": "text", "column": "text", "ops": ["lang_margin"]},
    ]
    ddl = "doc_id bigint, text string, url string"
    batch = Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": src,
         "schema": ddl},
        *stages,
    ]).run(spark)
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": src,
         "schema": ddl, "streaming": True,
         "options": {"maxFilesPerTrigger": "1"}},
        *stages,
        {"stage": "stream_sink", "format": "memory",
         "query_name": "r10_maps", "output_mode": "append",
         "checkpoint": str(tmp_path / "ckpt_r10"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    got = spark.table("r10_maps")
    cols = ["doc_id", "url_norm", "lang_margin"]
    assert _collect_sorted(got, cols) == _collect_sorted(batch, cols)
    one = {r["doc_id"]: r for r in got.collect()}
    # tracking param stripped, default port dropped, fragment gone,
    # authority lowercased, surviving param kept
    assert one[1]["url_norm"] == "https://ex1.com/p1?q=1"
    assert all(r["lang_margin"] > 0 for r in one.values())


def test_boilerplate_strip_is_batch_only(spark, tmp_path):
    """boilerplate_strip's doc-frequency threshold is corpus-global —
    a stream would strip each micro-batch against a different, growing
    threshold, so the op refuses streaming input with an actionable
    error instead of silently diverging from batch."""
    import pytest as _pytest
    from config_driven_pyspark_spark.operators.corpus import (
        boilerplate_strip,
    )

    src = str(tmp_path / "bp_src")
    spark.createDataFrame(
        [(1, "nav\nbody one"), (2, "nav\nbody two")],
        "doc_id bigint, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        src
    )
    with _pytest.raises(ValueError, match="batch-only"):
        boilerplate_strip(stream, "doc_id")


def test_stream_stream_join_parity(spark, tmp_path):
    """Stream-stream inner join through the SAME generic `join` config
    stage batch uses: two watermarked file streams joined on key
    equality + an event-time range constraint (the state-cleanup bound
    Spark requires), drained available_now ≡ the batch join of the same
    stages. Pins that the engine's join surface is streaming-complete
    without a dedicated operator."""
    clicks = spark.createDataFrame(
        [(i % 7, f"2024-01-01 00:00:{i:02d}", i) for i in range(40)],
        "user_id bigint, ts_s string, click_id bigint",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS click_ts",
                 "click_id")
    views = spark.createDataFrame(
        [(i % 7, f"2024-01-01 00:00:{(i + 2) % 60:02d}", i) for i in range(30)],
        "user_id bigint, ts_s string, view_id bigint",
    ).selectExpr("user_id AS v_user_id", "CAST(ts_s AS TIMESTAMP) AS view_ts",
                 "view_id")
    c_src, v_src = str(tmp_path / "clicks"), str(tmp_path / "views")
    clicks.repartition(2).write.parquet(c_src)
    views.repartition(2).write.parquet(v_src)

    def stages(streaming):
        c_ddl = "user_id bigint, click_ts timestamp, click_id bigint"
        v_ddl = "v_user_id bigint, view_ts timestamp, view_id bigint"
        opts = {"maxFilesPerTrigger": "1"} if streaming else {}
        return [
            {"stage": "source", "format": "parquet", "path": v_src,
             "schema": v_ddl, "streaming": streaming, "options": opts,
             "name": "views"},
            {"stage": "watermark", "column": "view_ts",
             "delay": "30 seconds"} if streaming else
            {"stage": "filter", "predicate": "true"},
            {"stage": "source", "format": "parquet", "path": c_src,
             "schema": c_ddl, "streaming": streaming, "options": opts},
            {"stage": "watermark", "column": "click_ts",
             "delay": "30 seconds"} if streaming else
            {"stage": "filter", "predicate": "true"},
            {"stage": "join", "right": "views",
             "on": ("user_id = v_user_id AND view_ts >= click_ts AND "
                    "view_ts <= click_ts + INTERVAL 5 SECONDS")},
            {"stage": "select",
             "columns": ["user_id", "click_id", "view_id"]},
        ]

    batch = Pipeline.from_config(stages(False)).run(spark)
    Pipeline.from_config([
        *stages(True),
        {"stage": "stream_sink", "format": "memory",
         "query_name": "ss_join", "output_mode": "append",
         "checkpoint": str(tmp_path / "ckpt_ssj"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    got = spark.table("ss_join")
    cols = ["user_id", "click_id", "view_id"]
    assert _collect_sorted(got, cols) == _collect_sorted(batch, cols)
    assert got.count() > 0


def test_streaming_cdc_merge_sink(spark, tmp_path):
    """Streaming CDC ingestion: a file stream of upsert/delete events
    drains micro-batch-by-micro-batch into a parquet snapshot through
    stream_sink format=merge (the foreachBatch-MERGE idiom,
    engine-native). Batches touch disjoint keys, so the final snapshot
    equals one batch merge of all events."""
    target = str(tmp_path / "snap")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "id bigint, val string, qty bigint",
    ).write.parquet(target)
    # two event files = two micro-batches (maxFilesPerTrigger=1),
    # disjoint key sets
    ev = str(tmp_path / "events")
    spark.createDataFrame(
        [(2, "B2", 21, False), (5, "e", 50, False)],
        "id bigint, val string, qty bigint, gone boolean",
    ).coalesce(1).write.parquet(ev)
    spark.createDataFrame(
        [(3, "x", 0, True), (6, "f", 60, False)],
        "id bigint, val string, qty bigint, gone boolean",
    ).coalesce(1).write.mode("append").parquet(ev)
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": ev,
         "schema": "id bigint, val string, qty bigint, gone boolean",
         "streaming": True, "options": {"maxFilesPerTrigger": "1"}},
        {"stage": "stream_sink", "format": "merge", "path": target,
         "keys": ["id"], "delete_col": "gone",
         "checkpoint": str(tmp_path / "ckpt_cdc"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    got = {
        r["id"]: (r["val"], r["qty"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == {1: ("a", 10), 2: ("B2", 21), 4: ("d", 40),
                   5: ("e", 50), 6: ("f", 60)}


def test_streaming_merge_sink_order_col_latest_wins(spark, tmp_path):
    """CDC streams routinely deliver several events for one key inside a
    single micro-batch; `order_col` collapses each key to its latest
    event (highest seq) before the merge instead of failing on
    merge_upsert's duplicate-key guard. A later micro-batch still
    overrides an earlier one (sequential application)."""
    target = str(tmp_path / "snap_oc")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id bigint, val string, qty bigint"
    ).write.parquet(target)
    ev = str(tmp_path / "events_oc")
    # micro-batch 1: THREE events for key 1 (insert->update->update) and
    # a delete-then-reinsert pair for key 2, interleaved out of order
    spark.createDataFrame(
        [
            (1, "v2", 12, False, 102),
            (1, "v1", 11, False, 101),
            (2, "gone", 0, True, 103),
            (1, "v3", 13, False, 104),
            (2, "back", 22, False, 105),
        ],
        "id bigint, val string, qty bigint, gone boolean, seq bigint",
    ).coalesce(1).write.parquet(ev)
    # micro-batch 2: key 1 updated again — later batch wins over batch 1
    spark.createDataFrame(
        [(1, "v4", 14, False, 106)],
        "id bigint, val string, qty bigint, gone boolean, seq bigint",
    ).coalesce(1).write.mode("append").parquet(ev)
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": ev,
         "schema": "id bigint, val string, qty bigint, gone boolean, "
                   "seq bigint",
         "streaming": True, "options": {"maxFilesPerTrigger": "1"}},
        {"stage": "stream_sink", "format": "merge", "path": target,
         "keys": ["id"], "delete_col": "gone", "order_col": "seq",
         "checkpoint": str(tmp_path / "ckpt_oc"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    # the snapshot keeps the TARGET schema — the batch's seq column is
    # projected off by update-all MERGE; latest-wins shows in val/qty
    got = {
        r["id"]: (r["val"], r["qty"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == {1: ("v4", 14), 2: ("back", 22)}


def test_streaming_incremental_agg_sink_parity(spark, tmp_path):
    """Streaming materialized-view maintenance (r11): a fact stream
    drains micro-batch-by-micro-batch through stream_sink
    format=incremental_agg; the folded snapshot must be
    indistinguishable from (a) the same batches folded sequentially in
    batch mode and (b) one direct aggregation over all facts — the
    monoid law, now stream-maintained."""
    from config_driven_pyspark_spark.operators.table import incremental_agg

    facts1 = [("a", 1), ("a", 5), ("b", 2)]
    facts2 = [("a", 7), ("c", 4), ("b", -3)]
    facts3 = [("c", 9)]
    ev = str(tmp_path / "facts")
    for i, rows in enumerate([facts1, facts2, facts3]):
        spark.createDataFrame(rows, "grp string, v bigint").coalesce(
            1
        ).write.mode("append" if i else "overwrite").parquet(ev)
    aggs = {"n": "count(*)", "total": "sum(v)", "lo": "min(v)",
            "hi": "max(v)"}
    mv_stream = str(tmp_path / "mv_stream")
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": ev,
         "schema": "grp string, v bigint", "streaming": True,
         "options": {"maxFilesPerTrigger": "1"}},
        {"stage": "stream_sink", "format": "incremental_agg",
         "path": mv_stream, "keys": ["grp"], "aggs": aggs,
         "checkpoint": str(tmp_path / "ckpt_mv"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    # sequential batch folds of the same slices
    mv_batch = str(tmp_path / "mv_batch")
    for rows in [facts1, facts2, facts3]:
        incremental_agg(
            spark.createDataFrame(rows, "grp string, v bigint"),
            mv_batch, ["grp"], aggs,
        )
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    streamed = spark.read.parquet(mv_stream).select(
        "grp", "n", "total", "lo", "hi")
    batched = spark.read.parquet(mv_batch).select(
        "grp", "n", "total", "lo", "hi")
    direct = spark.createDataFrame(
        facts1 + facts2 + facts3, "grp string, v bigint"
    ).groupBy("grp").agg(
        F.count("*").alias("n"), F.sum("v").alias("total"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    assert key(streamed.collect()) == key(batched.collect())
    assert key(streamed.collect()) == key(direct.collect())


def test_streaming_scd2_sink_parity(spark, tmp_path):
    """Streaming dimension versioning (r12, VERDICT r11 ask #5): a CDC
    event stream drains micro-batch-by-micro-batch through stream_sink
    format=scd2; the versioned snapshot must equal the same batches
    applied sequentially with scd2_merge in batch mode — closes,
    no-ops, inserts, deletes and history all included."""
    from config_driven_pyspark_spark.operators.table import scd2_merge

    def mk(rows):
        return spark.createDataFrame(
            rows, "id bigint, val string, eff string, gone boolean"
        ).selectExpr("id", "val", "CAST(eff AS DATE) AS effective_ts",
                     "gone")

    b1 = [(1, "a", "2024-01-01", False), (2, "b", "2024-01-01", False)]
    b2 = [(1, "A2", "2024-02-01", False),   # changed -> close + new
          (2, "b", "2024-02-01", False),    # identical -> no-op
          (3, "c", "2024-02-01", False)]    # new key
    b3 = [(2, "b", "2024-03-01", True),     # delete -> close only
          (1, "A3", "2024-03-01", False)]   # changed again
    ev = str(tmp_path / "cdc_events")
    for i, rows in enumerate([b1, b2, b3]):
        mk(rows).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(ev)
    dim_stream = str(tmp_path / "dim_stream")
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": ev,
         "schema": "id bigint, val string, effective_ts date, "
                   "gone boolean",
         "streaming": True, "options": {"maxFilesPerTrigger": "1"}},
        {"stage": "stream_sink", "format": "scd2", "path": dim_stream,
         "keys": ["id"], "delete_col": "gone",
         "checkpoint": str(tmp_path / "ckpt_scd2"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    dim_batch = str(tmp_path / "dim_batch")
    for rows in [b1, b2, b3]:
        scd2_merge(mk(rows), dim_batch, ["id"], delete_col="gone")
    cols = ["id", "val", "valid_from", "valid_to", "is_current"]
    key = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.select(*cols).collect()
    )
    streamed = spark.read.parquet(dim_stream)
    batched = spark.read.parquet(dim_batch)
    assert key(streamed) == key(batched)
    # spot-check the final state is actually versioned
    cur = {r["id"]: r["val"]
           for r in streamed.filter("is_current").collect()}
    assert cur == {1: "A3", 3: "c"}  # 2 deleted
    # 1: a(closed), A2(closed), A3(cur); 2: b(closed by delete); 3: c
    assert streamed.count() == 5


def test_streaming_scd2_sink_order_col_dedup(spark, tmp_path):
    """A micro-batch carrying several events per key keeps only the
    latest (order_col), matching the merge sink's convention."""
    ev = str(tmp_path / "cdc2")
    spark.createDataFrame(
        [(1, "v1", "2024-01-01", 1), (1, "v2", "2024-01-01", 2),
         (2, "w", "2024-01-01", 1)],
        "id bigint, val string, eff string, seq bigint",
    ).selectExpr("id", "val", "CAST(eff AS DATE) AS effective_ts",
                 "seq").coalesce(1).write.mode("overwrite").parquet(ev)
    dim = str(tmp_path / "dim2")
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": ev,
         "schema": "id bigint, val string, effective_ts date, "
                   "seq bigint",
         "streaming": True},
        {"stage": "stream_sink", "format": "scd2", "path": dim,
         "keys": ["id"], "order_col": "seq",
         "checkpoint": str(tmp_path / "ckpt2"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    got = {r["id"]: r["val"]
           for r in spark.read.parquet(dim).filter("is_current")
           .collect()}
    assert got == {1: "v2", 2: "w"}


def _seed_versioned(spark, tgt):
    from config_driven_pyspark_spark.operators import history as H
    from config_driven_pyspark_spark.operators.table import merge_upsert

    spark.createDataFrame(
        [(i, "P" if i % 2 == 0 else "O", float(i)) for i in range(20)],
        "k int, status string, val double",
    ).write.partitionBy("status").parquet(tgt)
    H.enable_table_history(spark, tgt, ["status"])

    def mutate(rows):
        merge_upsert(
            spark.createDataFrame(
                rows, "k int, status string, val double"
            ),
            tgt, ["k"], partition_by=["status"],
        )

    return mutate


def test_changes_stream_drained_equals_batch_cdf(spark, tmp_path):
    """VERDICT r12 ask #5 Done-criterion: the version-checkpointed CDF
    pump, fully drained across several calls and batch sizes, emits
    exactly the batch ``table_changes`` rows — and resumes from its
    cursor (an already-drained pump is a no-op)."""
    from config_driven_pyspark_spark.operators import history as H

    tgt = str(tmp_path / "t")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    mutate = _seed_versioned(spark, tgt)

    def process(df, _f, _t):
        df.write.mode("append").parquet(sink)

    mutate([(0, "P", 100.0), (99, "P", 9.0)])       # v1: update+insert
    out = H.consume_table_changes(
        spark, tgt, ckpt, process, keys=["k"], start_version=0
    )
    assert out == {"batches": 1, "from_version": 0, "to_version": 1}
    mutate([(1, "O", -1.0)])                         # v2: update
    mutate([(99, "P", 10.0), (98, "O", 8.0)])        # v3: update+insert
    out = H.consume_table_changes(
        spark, tgt, ckpt, process, keys=["k"],
        max_versions_per_batch=1,
    )
    assert out == {"batches": 2, "from_version": 1, "to_version": 3}
    assert H.read_changes_cursor(spark, ckpt) == 3
    # drained == batch CDF over the whole range
    drained = sorted(
        tuple(r) for r in spark.read.parquet(sink)
        .select("k", "status", "val", "_change_type",
                "_commit_version").collect()
    )
    batch = sorted(
        tuple(r) for r in H.table_changes(
            spark, tgt, 0, 3, keys=["k"], per_version=True
        ).select("k", "status", "val", "_change_type",
                 "_commit_version").collect()
    )
    assert drained == batch and len(drained) == 8
    # nothing pending -> no-op, cursor unchanged
    out = H.consume_table_changes(spark, tgt, ckpt, process, keys=["k"])
    assert out["batches"] == 0
    assert H.read_changes_cursor(spark, ckpt) == 3


def test_changes_stream_at_least_once_and_guards(spark, tmp_path):
    """A failing batch leaves the cursor unmoved (redelivered on
    retry); first-call default consumes from NOW; a vacuumed cursor
    refuses instead of silently skipping changes."""
    from config_driven_pyspark_spark.operators import history as H

    tgt = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    mutate = _seed_versioned(spark, tgt)
    mutate([(0, "P", 1.0)])  # v1 before the stream starts
    seen = []

    def flaky(df, f, t):
        if not seen:
            seen.append((f, t))
            raise RuntimeError("sink down")
        seen.append((f, t))

    # default start: from NOW (v1) — nothing pending yet
    out = H.consume_table_changes(spark, tgt, ckpt, flaky, keys=["k"])
    assert out["batches"] == 0 and H.read_changes_cursor(
        spark, ckpt) == 1
    mutate([(2, "P", 2.0)])  # v2
    with pytest.raises(RuntimeError, match="sink down"):
        H.consume_table_changes(spark, tgt, ckpt, flaky, keys=["k"])
    assert H.read_changes_cursor(spark, ckpt) == 1  # not advanced
    out = H.consume_table_changes(spark, tgt, ckpt, flaky, keys=["k"])
    assert out["batches"] == 1  # same range redelivered
    assert seen == [(1, 2), (1, 2)]
    # cursor below the readable floor refuses
    mutate([(3, "O", 3.0)])  # v3
    H.vacuum_table_history(spark, tgt, keep_last=1)
    ck2 = str(tmp_path / "ckpt2")
    with pytest.raises(ValueError, match="cannot resume"):
        H.consume_table_changes(
            spark, tgt, ck2, flaky, keys=["k"], start_version=0
        )
    with pytest.raises(ValueError, match="start_version"):
        H.consume_table_changes(
            spark, tgt, str(tmp_path / "ck3"), flaky, keys=["k"],
            start_version=99,
        )


def test_changes_stream_stage_with_sub_pipeline(spark, tmp_path):
    """The config surface: the pump as a pipeline stage, each batch
    filtered by a sub-pipeline before landing in the sink."""
    from config_driven_pyspark_spark.operators import history as H

    tgt = str(tmp_path / "t")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    mutate = _seed_versioned(spark, tgt)
    mutate([(0, "P", 100.0), (99, "P", 9.0)])  # v1
    mutate([(0, "P", 200.0)])                   # v2
    out = Pipeline.from_config([
        {"stage": "changes_stream", "path": tgt, "checkpoint": ckpt,
         "keys": ["k"], "start_version": 0,
         "stages": [
             {"stage": "filter",
              "predicate": "_change_type = 'update_postimage'"},
         ],
         "sink": {"format": "parquet", "path": sink}},
    ]).run(spark)
    got = sorted(
        (r.k, r.val, r._commit_version) for r in out.collect()
    )
    assert got == [(0, 100.0, 1), (0, 200.0, 2)]
    # direct call with stages but no compiled fn refuses
    with pytest.raises(ValueError, match="batch_stages_fn"):
        H.stage_changes_stream(
            None,
            {"path": tgt, "checkpoint": ckpt, "stages": [{}],
             "sink": {"path": sink}},
            spark,
        )


def test_changes_stream_exactly_once_parquet_sink(spark, tmp_path):
    """r14 (VERDICT r13 ask #5): the changes_stream stage's parquet
    append sink is EXACTLY-once — a crash between the sink write and
    the cursor write (simulated by rewinding the cursor) redelivers
    the batch but cannot double-apply it, and partial-publish debris
    from a mid-rename crash is purged and rewritten."""
    import os

    from config_driven_pyspark_spark.operators import history as H

    tgt = str(tmp_path / "t")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    mutate = _seed_versioned(spark, tgt)
    mutate([(0, "P", 100.0), (99, "P", 9.0)])        # v1
    mutate([(1, "O", -1.0)])                          # v2

    spec = {
        "path": tgt, "checkpoint": ckpt, "keys": ["k"],
        "start_version": 0,
        "sink": {"format": "parquet", "path": sink},
    }
    out = H.stage_changes_stream(None, spec, spark=spark)
    rows1 = sorted(
        tuple(r) for r in out.select(
            "k", "status", "val", "_change_type", "_commit_version"
        ).collect()
    )
    assert len(rows1) == 5  # v1: pre+post+insert, v2: pre+post
    # crash window A: cursor lost AFTER the sink committed — redelivery
    # must skip (version-named files + sink marker)
    H._write_changes_cursor(spark, ckpt, 0)
    out = H.stage_changes_stream(None, spec, spark=spark)
    rows2 = sorted(
        tuple(r) for r in out.select(
            "k", "status", "val", "_change_type", "_commit_version"
        ).collect()
    )
    assert rows2 == rows1  # no duplicates
    # crash window B: mid-publish — marker lost, debris left under this
    # version's deterministic names; redelivery purges and rewrites
    H._write_changes_cursor(spark, ckpt, 0)
    for f in os.listdir(sink):
        if f.startswith("_last_batch_id"):
            os.remove(os.path.join(sink, f))
    debris = os.path.join(sink, "batch-v000000002-99999.parquet")
    open(debris, "w").write("not parquet")
    out = H.stage_changes_stream(None, spec, spark=spark)
    rows3 = sorted(
        tuple(r) for r in out.select(
            "k", "status", "val", "_change_type", "_commit_version"
        ).collect()
    )
    assert rows3 == rows1
    assert not os.path.exists(debris)


def test_streaming_dv_merge_sink_parity_with_batch(spark, tmp_path):
    """Streaming merge-on-read ingestion (r15): delete-only tombstone
    micro-batches drained through stream_sink format=merge with
    delete_mode='merge_on_read' must (a) leave every data file
    untouched, (b) commit one deletion vector per micro-batch, and
    (c) land the exact logical state the same batches produce applied
    sequentially in batch mode."""
    from config_driven_pyspark_spark.operators.deletes import (
        _dv_root, _list_dv, read_table,
    )
    from config_driven_pyspark_spark.operators.table import merge_upsert

    seed = spark.createDataFrame(
        [(i, "ab"[i % 2], i * 10) for i in range(30)],
        "id bigint, p string, v bigint",
    )
    batches = [[2, 5], [8, 11, 14], [17]]

    # batch arm: sequential merge_on_read application
    b_target = str(tmp_path / "batch_snap")
    seed.write.partitionBy("p").parquet(b_target)
    for keys in batches:
        merge_upsert(
            spark.createDataFrame(
                [(k, True) for k in keys], "id bigint, gone boolean"
            ),
            b_target, ["id"], "gone",
            delete_mode="merge_on_read", partition_by=["p"],
        )

    # streaming arm: same batches as micro-batch files
    s_target = str(tmp_path / "stream_snap")
    seed.write.partitionBy("p").parquet(s_target)
    n_files_before = len(
        [f for f in spark.read.parquet(s_target).inputFiles()]
    )
    ev = str(tmp_path / "tombstones")
    for i, keys in enumerate(batches):
        spark.createDataFrame(
            [(k, True) for k in keys], "id bigint, gone boolean"
        ).coalesce(1).write.mode("append" if i else "overwrite").parquet(ev)
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": ev,
         "schema": "id bigint, gone boolean",
         "streaming": True, "options": {"maxFilesPerTrigger": "1"}},
        {"stage": "stream_sink", "format": "merge", "path": s_target,
         "keys": ["id"], "delete_col": "gone",
         "delete_mode": "merge_on_read", "partition_by": ["p"],
         "checkpoint": str(tmp_path / "ckpt_dv"),
         "trigger": "available_now", "await": True},
    ]).run(spark)

    # (a) zero data-file rewrites, (b) one vector per micro-batch
    assert len(spark.read.parquet(s_target).inputFiles()) == n_files_before
    assert spark.read.parquet(s_target).count() == 30
    assert len(_list_dv(spark, _dv_root(s_target))) == len(batches)
    # (c) drained ≡ batch-applied
    deleted = {k for b in batches for k in b}
    want = sorted(i for i in range(30) if i not in deleted)
    got_s = sorted(r["id"] for r in read_table(spark, s_target).collect())
    got_b = sorted(r["id"] for r in read_table(spark, b_target).collect())
    assert got_s == want and got_b == want


def test_streaming_dv_merge_sink_coalesce_after(spark, tmp_path):
    """A long tombstone stream self-bounds its vector fan-in: with
    coalesce_after=3, four micro-batches end at two vector dirs (the
    third tripped the fold) instead of four — same knob as the batch
    table_delete stage, zero data files rewritten either way."""
    from config_driven_pyspark_spark.operators.deletes import (
        _dv_root, _list_dv, read_table,
    )

    target = str(tmp_path / "snap_ca")
    spark.createDataFrame(
        [(i, "ab"[i % 2], i * 10) for i in range(40)],
        "id bigint, p string, v bigint",
    ).write.partitionBy("p").parquet(target)
    n_files = len(spark.read.parquet(target).inputFiles())
    ev = str(tmp_path / "tomb_ca")
    batches = [[1], [4], [7], [10]]
    for i, keys in enumerate(batches):
        spark.createDataFrame(
            [(k, True) for k in keys], "id bigint, gone boolean"
        ).coalesce(1).write.mode("append" if i else "overwrite").parquet(ev)
    Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": ev,
         "schema": "id bigint, gone boolean",
         "streaming": True, "options": {"maxFilesPerTrigger": "1"}},
        {"stage": "stream_sink", "format": "merge", "path": target,
         "keys": ["id"], "delete_col": "gone",
         "delete_mode": "merge_on_read", "partition_by": ["p"],
         "coalesce_after": 3,
         "checkpoint": str(tmp_path / "ckpt_ca"),
         "trigger": "available_now", "await": True},
    ]).run(spark)
    # batch 3 tripped the fold (3 -> 1), batch 4 added one more
    assert len(_list_dv(spark, _dv_root(target))) == 2
    assert len(spark.read.parquet(target).inputFiles()) == n_files
    got = sorted(r["id"] for r in read_table(spark, target).collect())
    assert got == [i for i in range(40) if i not in (1, 4, 7, 10)]
