"""Tests for training-corpus operators (operators/corpus.py): repetition
signals, deterministic hash sampling, decontamination, and token-window
chunking — hand-computed goldens plus invariants on real sf0.001 data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark import Pipeline
from config_driven_pyspark_spark.operators import corpus as C
from tests.conftest import to_df

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


# -- repetition stats --------------------------------------------------------


def test_repetition_stats_golden(spark):
    df = to_df(spark, [
        {"id": 1, "text": "a b a b a b"},          # 6 toks, 2 distinct
        {"id": 2, "text": "w x y z"},              # all distinct
    ])
    rows = {r["id"]: r for r in C.repetition_stats(df, "id").collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 6
    assert r1["ttr"] == pytest.approx(2 / 6, abs=1e-6)
    # 3-grams: "a b a","b a b","a b a","b a b" → 4 total, 2 distinct
    assert r1["dup_ngram_frac"] == pytest.approx(0.5, abs=1e-6)
    assert r1["top_word_frac"] == pytest.approx(0.5, abs=1e-6)
    r2 = rows[2]
    assert r2["ttr"] == 1.0
    assert r2["dup_ngram_frac"] == 0.0
    assert r2["top_word_frac"] == pytest.approx(0.25, abs=1e-6)


def test_repetition_stats_case_fold(spark):
    df = to_df(spark, [{"id": 1, "text": "The THE the"}])
    row = C.repetition_stats(df, "id").collect()[0]
    assert row["ttr"] == pytest.approx(1 / 3, abs=1e-6)
    assert row["top_word_frac"] == 1.0


# -- hash sampling -----------------------------------------------------------


def test_hash_sample_deterministic_and_stable(documents):
    a = C.hash_sample(documents, "doc_id", rate=0.5)
    b = C.hash_sample(documents.repartition(7), "doc_id", rate=0.5)
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b          # partitioning-independent
    n_total = documents.count()
    assert 0.3 * n_total < len(ids_a) < 0.7 * n_total


def test_hash_sample_rate_extremes(documents):
    assert C.hash_sample(documents, "doc_id", rate=0.0).count() == 0
    assert C.hash_sample(documents, "doc_id", rate=1.0).count() == documents.count()


def test_hash_sample_stratified_rates(documents):
    out = C.hash_sample(
        documents, "doc_id", rates={"en": 0.0, "*": 1.0}, stratify_by="lang"
    )
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "en" not in langs
    non_en = documents.filter("lang <> 'en'").count()
    assert out.count() == non_en


def test_hash_sample_requires_config(documents):
    with pytest.raises(ValueError):
        C.hash_sample(documents, "doc_id")


# -- mixture sampling --------------------------------------------------------


def test_mixture_sample_hits_target_proportions(documents):
    out = C.mixture_sample(
        documents, "lang",
        {"en": 0.5, "fr": 0.25, "de": 0.25}, "doc_id",
    ).cache()
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(by_lang) <= {"en", "fr", "de"}      # others dropped
    total = sum(by_lang.values())
    # md5 granularity is 1/256 → proportions approximate, not exact
    assert by_lang["en"] / total == pytest.approx(0.5, abs=0.15)
    assert by_lang["fr"] / total == pytest.approx(0.25, abs=0.15)
    out.unpersist()


def test_mixture_sample_binding_stratum_fully_kept(documents):
    # with one stratum weighted far above its share, it binds (rate 1.0)
    # and must be kept in full ('g' threshold keeps every md5 bucket)
    n_fr = documents.filter("lang = 'fr'").count()
    out = C.mixture_sample(documents, "lang", {"en": 0.01, "fr": 0.99}, "doc_id")
    assert out.filter("lang = 'fr'").count() == n_fr


def test_mixture_sample_deterministic(documents):
    w = {"en": 0.6, "es": 0.4}
    a = C.mixture_sample(documents, "lang", w, "doc_id")
    b = C.mixture_sample(documents.repartition(5), "lang", w, "doc_id")
    assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in b.select("doc_id").collect())


def test_mixture_sample_requires_weights(documents):
    with pytest.raises(ValueError):
        C.mixture_sample(documents, "lang", {}, "doc_id")


# -- token-budget sampling ---------------------------------------------------


def test_token_budget_fill_semantics(documents):
    out = C.token_budget_sample(
        documents, "doc_id", "text", budget=300, by=None
    ).cache()
    total = out.agg(F.sum("n_tokens")).collect()[0][0]
    max_doc = out.agg(F.max("n_tokens")).collect()[0][0]
    # filled past the budget by at most the straddling document
    assert total >= 300
    assert total - max_doc < 300
    out.unpersist()


def test_token_budget_per_stratum(documents):
    out = C.token_budget_sample(
        documents, "doc_id", "text", budget=200, by="lang"
    ).cache()
    for r in out.groupBy("lang").agg(
        F.sum("n_tokens").alias("t"), F.max("n_tokens").alias("m")
    ).collect():
        assert r["t"] >= 200 or r["t"] > 0   # small strata may run dry
        assert r["t"] - r["m"] < 200
    out.unpersist()


def test_shard_by_size_budgets(documents):
    """r8: every shard's byte total stays within one document of the
    budget; shard ids are contiguous from 0; assignment is
    partitioning-invariant."""
    out = C.shard_by_size(documents, "doc_id", "text", shard_bytes=4000)
    rows = out.groupBy("shard").agg(
        F.sum("n_bytes").alias("b"), F.max("n_bytes").alias("m")
    ).collect()
    shards = sorted(r["shard"] for r in rows)
    assert shards == list(range(len(shards)))
    for r in rows:
        if r["shard"] != shards[-1]:  # every shard but the last is full
            assert r["b"] + r["m"] > 4000 or r["b"] >= 4000
        assert r["b"] - r["m"] < 4000  # within one straddling doc
    a = sorted(map(tuple, out.select("doc_id", "shard").collect()))
    b = sorted(map(tuple, C.shard_by_size(
        documents.repartition(7), "doc_id", "text", shard_bytes=4000
    ).select("doc_id", "shard").collect()))
    assert a == b
    with pytest.raises(ValueError, match="shard_bytes"):
        C.shard_by_size(documents, "doc_id", shard_bytes=0)


def test_quality_classify_linear_scores(spark):
    """r8: score is the mean of matched token weights (+bias), repeats
    count, unknown tokens weigh 0, empty docs score exactly bias."""
    df = spark.createDataFrame(
        [(1, "the the cat"), (2, "zz yy"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in C.quality_classify(
        df, "doc_id", {"the": 0.6, "cat": -0.3}, bias=0.1, threshold=0.2
    ).collect()}
    assert abs(out[1]["score"] - round(0.1 + (0.6 + 0.6 - 0.3) / 3, 9)) < 1e-12
    assert out[1]["keep"] is True
    assert out[2]["score"] == 0.1 and out[2]["keep"] is False
    assert out[3]["score"] == 0.1 and out[4]["score"] == 0.1
    with pytest.raises(ValueError, match="weights"):
        C.quality_classify(df, "doc_id", {})


def test_dsir_weights_python_replication(spark):
    """r8: dsir_weights matches an independent pure-Python replay of the
    paper's hashed-n-gram estimator (md5 buckets, add-λ smoothing,
    9-decimal HALF_UP rounding, exact decimal sums) bit-for-bit, and
    target-like documents outscore off-target ones."""
    import hashlib
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    B, lam = 64, 0.5
    docs = [(1, "aa bb aa"), (2, "zz yy xx"), (3, "aa bb"), (4, "")]
    target = ["aa bb aa bb", "aa aa"]

    def grams(text):
        t = [x for x in text.lower().split(" ") if x]
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    raw = [bucket(g) for _, text in docs for g in grams(text)]
    tgt = [bucket(g) for text in target for g in grams(text)]
    cr, ct = Counter(raw), Counter(tgt)
    tr, tt = float(len(raw)), float(len(tgt))
    lr = {}
    for b_ in cr:
        v = math.log(
            ((ct.get(b_, 0) + lam) * (tr + lam * B))
            / ((cr[b_] + lam) * (tt + lam * B))
        )
        lr[b_] = Decimal(repr(v)).quantize(
            Decimal("1.000000000"), ROUND_HALF_UP
        )
    expect = {}
    for did, text in docs:
        gs = [bucket(g) for g in grams(text)]
        expect[did] = (
            len(gs), float(sum((lr[b_] for b_ in gs), Decimal(0)))
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame([(t,) for t in target], "text string")
    out = {r["doc_id"]: r for r in C.dsir_weights(
        df, tdf, "doc_id", n_buckets=B, lam=lam
    ).collect()}
    for did, (n, s) in expect.items():
        assert out[did]["n_grams"] == n, did
        assert out[did]["dsir_score"] == s, did
    # the all-target-gram docs outscore the no-target-gram doc
    assert out[1]["dsir_score"] > out[2]["dsir_score"]
    assert out[3]["dsir_score"] > out[2]["dsir_score"]
    assert out[4]["n_grams"] == 0 and out[4]["dsir_score"] == 0.0
    with pytest.raises(ValueError, match="n_buckets"):
        C.dsir_weights(df, tdf, "doc_id", n_buckets=0)
    with pytest.raises(ValueError, match="lam"):
        C.dsir_weights(df, tdf, "doc_id", lam=0.0)


def test_url_features_extraction(spark):
    """r8: host lowercases, domain is the last two labels, unparseable
    URLs give empty strings (never null), blocklist matches on domain."""
    df = spark.createDataFrame(
        [
            (1, "https://WWW.News.Site1.ORG/a/b?x=1"),
            (2, "http://sub.deep.spam.example:8080/p"),
            (3, "ftp://files.example.net"),
            (4, "not a url at all"),
            (5, None),
        ],
        "id long, url string",
    )
    out = {r["id"]: r for r in C.url_features(
        df, "url", blocklist=["spam.example", "SITE1.org"]
    ).collect()}
    assert out[1]["host"] == "www.news.site1.org"
    assert out[1]["domain"] == "site1.org" and out[1]["tld"] == "org"
    assert out[1]["blocked"] is True          # blocklist case-folded
    # the authority slice stops at ':' — ports never reach the domain
    assert out[2]["host"] == "sub.deep.spam.example"
    assert out[2]["domain"] == "spam.example"
    assert out[2]["blocked"] is True
    assert out[3]["domain"] == "example.net" and out[3]["blocked"] is False
    assert out[4]["host"] == "" and out[4]["domain"] == ""
    assert out[4]["blocked"] is False
    assert out[5]["host"] == "" and out[5]["blocked"] is False


def test_importance_resample_gumbel_topk(documents):
    """r8: the Gumbel top-k draw is a pure function of (salt, id) —
    deterministic and partitioning-invariant; a new salt re-rolls the
    set; as temperature → 0 selection degenerates to exact top-n by
    score (noise washed out)."""
    scored = documents.withColumn(
        "dsir_score", (F.col("doc_id") % 10).cast("double")
    )
    a = C.importance_resample(scored, "doc_id", 50)
    b = C.importance_resample(scored.repartition(7), "doc_id", 50)
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    assert ids_a == sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert len(ids_a) == 50
    rerolled = sorted(
        r["doc_id"]
        for r in C.importance_resample(scored, "doc_id", 50, salt="run2")
        .select("doc_id").collect()
    )
    assert rerolled != ids_a
    # temperature → 0: pure exploitation — only max-score docs survive
    cold = C.importance_resample(
        scored, "doc_id", 20, temperature=1e-9
    ).select("dsir_score").collect()
    assert all(r["dsir_score"] == 9.0 for r in cold)
    with pytest.raises(ValueError, match="n must"):
        C.importance_resample(scored, "doc_id", 0)
    with pytest.raises(ValueError, match="temperature"):
        C.importance_resample(scored, "doc_id", 5, temperature=0.0)


def test_pii_scrub_goldens_and_duckdb_parity(spark):
    """r8: counts are computed on the original text, redaction replaces
    every match in declared order, and — the oracle contract — Spark's
    java.util.regex and DuckDB's RE2 agree on every count and every
    redacted byte for the shipped patterns."""
    texts = [
        "contact user5@example.com or admin@sub.domain.org.",
        "server at 192.168.1.255 and 10.0.0.1, version 1.2.3.4.5 though",
        "call +1 555 123 4567 or +44 204-7946-0958 x",
        "no pii here at all 1.2 3.4",
        "edge a@b.co end, 999.999.999.999, +1-555-123-4567",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    out = {r["id"]: r for r in C.pii_scrub(df).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 0, 0)
    assert out[0]["text"] == "contact <EMAIL> or <EMAIL>."
    # recall-leaning: "1.2.3.4.5" partially matches as "1.2.3.4" + ".5"
    # (\b holds between a digit and a dot), so the version string is the
    # third hit — both engines agree, which is what the oracle needs
    assert (out[1]["n_email"], out[1]["n_ipv4"]) == (0, 3)
    assert out[1]["text"].count("<IPV4>") == 3
    assert "<IPV4>.5" in out[1]["text"]
    assert out[2]["n_phone"] == 2
    assert out[2]["text"] == "call <PHONE> or <PHONE> x"
    assert out[3]["has_pii"] is False and out[3]["text"] == texts[3]
    # recall-leaning by design: the out-of-range IPv4 still redacts
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (1, 1, 1)
    assert out[5]["has_pii"] is False

    import duckdb
    from config_driven_pyspark_spark.operators.corpus import PII_PATTERNS
    con = duckdb.connect()
    con.execute("create table t(id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", list(enumerate(texts)))
    for name, pat in PII_PATTERNS.items():
        for rid, n in con.execute(
            "select id, len(regexp_extract_all(text, ?)) from t order by id",
            [pat],
        ).fetchall():
            assert out[rid][f"n_{name}"] == n, (name, rid)
    # full-pipeline byte parity: replay the chained replace in DuckDB
    chained = "text"
    for name, pat in PII_PATTERNS.items():
        chained = (
            f"regexp_replace({chained}, '{pat}', '<{name.upper()}>', 'g')"
        )
    for rid, red in con.execute(
        f"select id, {chained} from t order by id"
    ).fetchall():
        assert red == out[rid]["text"], rid
    with pytest.raises(ValueError, match="unknown PII types"):
        C.pii_scrub(df, types=["email", "ssn"])


def test_pii_scrub_config_stage(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "mail me: x@y.io")], "id long, text string"
    ).write.parquet(p)
    out = Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": p},
        {"stage": "corpus", "op": "pii_scrub", "column": "text",
         "types": ["email"], "out_col": "clean"},
    ]).run(spark)
    row = out.collect()[0]
    assert row["clean"] == "mail me: <EMAIL>"
    assert row["text"] == "mail me: x@y.io" and row["n_email"] == 1


def test_token_budget_matches_global_window_order(documents):
    # bucketed two-level cumsum ≡ one global window ordered by (md5, id)
    from pyspark.sql import Window
    from config_driven_pyspark_spark.functions import text as TX
    base = documents.withColumn(
        "n_tokens", TX.token_count(F.col("text"))
    ).withColumn("ok", F.md5(F.col("doc_id").cast("string")))
    w = Window.orderBy("ok", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    expect = sorted(
        r["doc_id"]
        for r in base.withColumn(
            "before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        ).filter("before < 700").collect()
    )
    got = sorted(
        r["doc_id"]
        for r in C.token_budget_sample(
            documents, "doc_id", "text", budget=700
        ).collect()
    )
    assert got == expect


def test_token_budget_deterministic_across_partitioning(documents):
    a = C.token_budget_sample(documents, "doc_id", "text", 400, by="lang")
    b = C.token_budget_sample(
        documents.repartition(9), "doc_id", "text", 400, by="lang"
    )
    assert sorted(r["doc_id"] for r in a.collect()) == \
        sorted(r["doc_id"] for r in b.collect())


def test_token_budget_rejects_bad_budget(documents):
    with pytest.raises(ValueError):
        C.token_budget_sample(documents, "doc_id", "text", 0)
    with pytest.raises(ValueError):
        C.hash_sample(documents, "doc_id", rates={"*": 0.5})


# -- decontamination ---------------------------------------------------------


def test_decontaminate_drops_overlapping(spark):
    bench = to_df(spark, [{"id": 100, "text": "the quick brown fox jumps"}])
    corpus = to_df(spark, [
        {"id": 1, "text": "totally unrelated words here now"},
        {"id": 2, "text": "prefix the quick brown fox suffix"},  # shares 3-grams
    ])
    flags = C.contamination_flags(corpus, bench, "id", ngram_n=3)
    assert {r["id"]: r["n_shared"] for r in flags.collect()} == {2: 2}
    kept = C.decontaminate(corpus, bench, "id", ngram_n=3)
    assert [r["id"] for r in kept.collect()] == [1]


def test_contamination_case_insensitive(spark):
    bench = to_df(spark, [{"id": 9, "text": "Alpha Beta Gamma"}])
    corpus = to_df(spark, [{"id": 1, "text": "alpha beta gamma"}])
    assert C.contamination_flags(corpus, bench, "id", ngram_n=3).count() == 1


# -- chunking ----------------------------------------------------------------


def test_chunk_reconstructs_document(spark):
    text = " ".join(f"t{i}" for i in range(120))
    df = to_df(spark, [{"id": 1, "text": text}])
    chunks = C.chunk_documents(df, "id", chunk_size=50).orderBy("chunk_idx").collect()
    assert [c["n_tokens"] for c in chunks] == [50, 50, 20]
    assert " ".join(c["chunk_text"] for c in chunks) == text


def test_chunk_overlapping_stride(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = to_df(spark, [{"id": 1, "text": text}])
    chunks = C.chunk_documents(df, "id", chunk_size=4, stride=2).orderBy(
        "chunk_idx"
    ).collect()
    assert chunks[0]["chunk_text"].split() == ["t0", "t1", "t2", "t3"]
    assert chunks[1]["chunk_text"].split() == ["t2", "t3", "t4", "t5"]
    # every consecutive pair overlaps by chunk_size - stride tokens
    for a, b in zip(chunks, chunks[1:]):
        assert a["chunk_text"].split()[2:] == b["chunk_text"].split()[:2]


def test_chunk_rejects_bad_sizes(spark):
    df = to_df(spark, [{"id": 1, "text": "a b c"}])
    with pytest.raises(ValueError):
        C.chunk_documents(df, "id", chunk_size=0)


# -- pipeline stage wiring ---------------------------------------------------


def test_corpus_stage_in_pipeline(spark):
    out = Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": f"{SF_DIR}/documents.parquet", "name": "docs"},
        {"stage": "filter", "predicate": "source = 'src0'", "name": "bench"},
        {"stage": "filter", "input": "docs", "predicate": "source <> 'src0'"},
        {"stage": "corpus", "op": "decontaminate", "id_col": "doc_id",
         "column": "text", "n": 3, "benchmark": "bench"},
        {"stage": "corpus", "op": "chunk", "id_col": "doc_id",
         "column": "text", "chunk_size": 50},
    ]).run(spark)
    assert out.columns == ["doc_id", "chunk_idx", "n_tokens", "chunk_text"]
    assert out.count() > 0
    assert out.agg(F.max("n_tokens")).collect()[0][0] <= 50


def test_corpus_stage_unknown_op(spark):
    df = to_df(spark, [{"id": 1, "text": "x"}])
    from config_driven_pyspark_spark.operators.corpus import stage_corpus

    with pytest.raises(ValueError, match="Unknown corpus op"):
        stage_corpus(df, {"op": "nope"}, None)


def test_corpus_ops_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, None), (3, "")], "id long, text string"
    )
    rep = {r["id"]: r for r in C.repetition_stats(df, "id").collect()}
    assert rep[2]["n_tokens"] is None          # null text → null counts, no crash
    assert rep[3]["n_tokens"] == 0
    assert rep[3]["top_word_frac"] == 0.0
    # chunking skips docs with no tokens; sampling keys on id so null text kept
    assert C.chunk_documents(df, "id", chunk_size=2).select("id").distinct().count() == 1
    assert C.hash_sample(df, "id", rate=1.0).count() == 3


# -- line/span dedup ---------------------------------------------------------


def test_line_dedup_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [(1, "a\nb\nc"), (2, "b\nd"), (3, "c\na"), (4, None)],
        "id long, text string",
    )
    rows = {r["id"]: r for r in C.line_dedup(df, "id").collect()}
    assert rows[1]["text"] == "a\nb\nc" and rows[1]["n_removed"] == 0
    assert rows[2]["text"] == "d" and rows[2]["n_removed"] == 1
    assert rows[3]["text"] == "" and rows[3]["n_removed"] == 2
    assert rows[4]["n_segments"] == 0 and rows[4]["text"] == ""


def test_line_dedup_within_doc_repeat(spark):
    df = spark.createDataFrame([(1, "x\ny\nx")], "id long, text string")
    r = C.line_dedup(df, "id").collect()[0]
    # second in-document occurrence of "x" is removed too
    assert r["text"] == "x\ny" and r["n_removed"] == 1


def test_line_dedup_token_windows(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b e f"), (3, "c d")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in C.line_dedup(df, "id", window=2).collect()}
    assert rows[1]["text"] == "a b c d"
    assert rows[2]["text"] == "e f"          # "a b" window seen in doc 1
    assert rows[3]["text"] == ""             # "c d" window seen in doc 1
    with pytest.raises(ValueError, match="window"):
        C.line_dedup(df, "id", window=0)


def test_line_dedup_on_documents(documents):
    out = C.line_dedup(documents, "doc_id", window=16).cache()
    try:
        # one row per input document, counts consistent
        assert out.count() == documents.count()
        bad = out.filter(
            (F.col("n_removed") < 0) | (F.col("n_removed") > F.col("n_segments"))
        ).count()
        assert bad == 0
        # a surviving corpus has no duplicate window left across docs
        segs = C.line_dedup(out, "doc_id", window=16).agg(
            F.sum("n_removed")
        ).collect()[0][0]
        assert segs == 0
    finally:
        out.unpersist()


# -- sequence packing --------------------------------------------------------


def test_pack_sequences_exact_lengths_and_conservation(documents):
    packed = C.pack_sequences(documents, "doc_id", seq_len=128).cache()
    try:
        n_seq = packed.count()
        assert packed.filter(F.col("n_tokens") != 128).count() <= 1
        total_in = documents.select(
            F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != "")))
        ).collect()[0][0]
        assert packed.agg(F.sum("n_tokens")).collect()[0][0] == total_in
        # seq ids are dense 0..n-1
        assert packed.agg(F.max("seq_id")).collect()[0][0] == n_seq - 1
        # every full sequence text really has 128 whitespace tokens
        assert packed.filter(
            F.size(F.split("seq_text", " ")) != F.col("n_tokens")
        ).count() == 0
    finally:
        packed.unpersist()


def test_pack_sequences_split_doc_preserves_order(spark):
    df = spark.createDataFrame(
        [(1, "a1 a2 a3"), (2, "b1 b2 b3"), (3, "c1 c2 c3")],
        "id long, text string",
    )
    rows = sorted(
        C.pack_sequences(df, "id", seq_len=4).collect(),
        key=lambda r: r["seq_id"],
    )
    # concatenating all sequences reproduces the md5-ordered token stream
    stream = " ".join(r["seq_text"] for r in rows).split()
    import hashlib

    order = sorted([1, 2, 3], key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    expect = [f"{'abc'[i-1]}{j}" for i in order for j in (1, 2, 3)]
    assert stream == expect
    assert [r["n_tokens"] for r in rows] == [4, 4, 1]


def test_pack_sequences_per_stratum(spark):
    df = spark.createDataFrame(
        [(1, "en", "a a a"), (2, "fr", "b b"), (3, "en", "c c c")],
        "id long, lang string, text string",
    )
    rows = C.pack_sequences(df, "id", seq_len=4, by="lang").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    # seq ids restart per stratum; strata never mix
    assert min(r["seq_id"] for r in by_lang["en"]) == 0
    assert min(r["seq_id"] for r in by_lang["fr"]) == 0
    assert all("b" not in r["seq_text"] for r in by_lang["en"])
    with pytest.raises(ValueError, match="seq_len"):
        C.pack_sequences(df, "id", seq_len=0)


def test_line_dedup_literal_delimiter_round_trips(spark):
    """The delimiter is literal on both split and rejoin — a regex
    metacharacter delimiter must round-trip unchanged."""
    df = spark.createDataFrame([(1, "a|b|c"), (2, "b|d")],
                               "id long, text string")
    rows = {r["id"]: r for r in C.line_dedup(df, "id", delimiter="|").collect()}
    assert rows[1]["text"] == "a|b|c" and rows[1]["n_removed"] == 0
    assert rows[2]["text"] == "d" and rows[2]["n_removed"] == 1


def test_temperature_mixture_flattens_skew(documents):
    """alpha=0.5 keeps the smallest lang in full (within 1/256 md5
    granularity) and downsamples larger ones by the sqrt ratio;
    alpha=1 keeps natural proportions (everything, max retention);
    alpha out of range is refused; results are partitioning-invariant."""
    before = {
        r["lang"]: r["n"]
        for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    out = C.temperature_mixture(documents, "lang", "doc_id", alpha=0.5)
    after = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    import math

    smallest = min(before, key=before.get)
    t = min(math.sqrt(c) for c in before.values())
    for lang, c in before.items():
        expected_rate = math.floor(t * math.sqrt(c) / c * 256) / 256
        assert after.get(lang, 0) <= c
        # md5 buckets are uniform-ish; allow generous slack on 25-218 rows
        assert abs(after.get(lang, 0) - expected_rate * c) <= 0.35 * c + 3, lang
    # ratio skew shrinks: max/min count ratio decreases
    assert (
        max(after.values()) / max(1, min(after.values()))
        < max(before.values()) / min(before.values()) + 1e-9
    )
    assert after[smallest] >= before[smallest] * 0.6  # near-full retention
    # alpha=1: w = c so every rate is 1 -> everything kept
    assert (
        C.temperature_mixture(documents, "lang", "doc_id", alpha=1.0).count()
        == documents.count()
    )
    # partitioning-invariant
    assert (
        C.temperature_mixture(
            documents.repartition(7), "lang", "doc_id", alpha=0.5
        ).count()
        == out.count()
    )
    with pytest.raises(ValueError, match="alpha"):
        C.temperature_mixture(documents, "lang", "doc_id", alpha=0.0)


def test_semantic_decontamination(spark):
    """Embedding-space decontamination: exact-duplicate and near-
    paraphrase vectors are flagged with the argmax benchmark match
    (ties to the smaller bench id); decontaminate drops exactly the
    flagged ids; sub-threshold rows survive."""
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0]),    # exact copy of bench 0
            (11, [0.9, 0.1, 0.0]),    # near bench 0
            (12, [0.0, 0.0, 1.0]),    # orthogonal to both benches
            (13, [0.7071, 0.7071, 0.0]),  # equidistant from bench 0 and 1
        ],
        "vec_id bigint, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    flags = {
        r["vec_id"]: r
        for r in C.semantic_contamination_flags(
            corpus, bench, "vec_id", threshold=0.6
        ).collect()
    }
    assert set(flags) == {10, 11, 13}
    assert flags[10]["max_cosine"] == 1.0
    assert flags[10]["matched_bench_id"] == 0
    assert flags[11]["matched_bench_id"] == 0
    # 13 hits both benches at identical (rounded) cosine -> smaller id
    assert flags[13]["matched_bench_id"] == 0
    survivors = C.semantic_decontaminate(
        corpus, bench, "vec_id", threshold=0.6
    )
    assert [r["vec_id"] for r in survivors.collect()] == [12]
    # stage dispatch
    class Ctx(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

    out = C.stage_corpus(
        corpus,
        {"stage": "corpus", "op": "semantic_decontaminate",
         "id_col": "vec_id", "benchmark": "b", "threshold": 0.6},
        Ctx({"b": bench}),
    )
    assert out.count() == 1


def test_corpus_profile_exact_and_approx(documents):
    """Profile report: long form (one row per stratum x metric), exact
    percentiles match a direct computation, and the percentile_approx
    scale path stays within quantile-rank error of exact."""
    df = documents.withColumn(
        "n_tokens",
        F.expr("CAST(size(filter(split(text, ' '), t -> t != '')) AS BIGINT)"),
    )
    exact = C.corpus_profile(
        df, by="source", metrics=["n_chars", "n_tokens"], method="exact"
    )
    rows = exact.collect()
    n_sources = df.select("source").distinct().count()
    assert len(rows) == n_sources * 2
    assert set(exact.columns) == {
        "source", "metric", "n_docs", "mean", "min", "max",
        "p25", "p50", "p75", "p90", "p99",
    }
    one = next(r for r in rows if r["metric"] == "n_chars")
    vals = sorted(
        r["n_chars"]
        for r in df.filter(F.col("source") == one["source"])
        .select("n_chars").collect()
    )
    assert one["n_docs"] == len(vals)
    assert one["min"] == vals[0] and one["max"] == vals[-1]
    import math

    pos = 0.5 * (len(vals) - 1)
    lo, hi = vals[math.floor(pos)], vals[math.ceil(pos)]
    assert abs(one["p50"] - (lo + (hi - lo) * (pos - math.floor(pos)))) < 1e-6
    # approx within quantile-RANK tolerance: the approx p50 must sit
    # between the exact p25 and p75 of the same stratum (loose but
    # distribution-free)
    approx = {
        (r["source"], r["metric"]): r
        for r in C.corpus_profile(
            df, by="source", metrics=["n_chars", "n_tokens"]
        ).collect()
    }
    for r in rows:
        a = approx[(r["source"], r["metric"])]
        assert r["p25"] <= a["p50"] <= r["p75"]
        assert a["n_docs"] == r["n_docs"]
    with pytest.raises(ValueError, match="metrics"):
        C.corpus_profile(df, by="source")
    with pytest.raises(ValueError, match="method"):
        C.corpus_profile(df, metrics=["n_chars"], method="bogus")


def test_span_dedup_boilerplate_across_window_boundaries(spark):
    """A long repeated block at DIFFERENT offsets in two documents —
    invisible to fixed non-overlapping windows whenever the offsets
    disagree mod the window — merges into one maximal span covering
    exactly the block (VERDICT r6 ask #3)."""
    bp = " ".join(f"bp{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            ("a", "x1 x2 x3 " + bp + " y1 y2"),  # first occurrence, pos 3
            ("b", "z1 z2 z3 z4 z5 z6 z7 " + bp + " q1"),  # copy at pos 7
            ("c", "unrelated tokens only here nothing repeated at all"),
        ],
        "doc_id string, text string",
    )
    spans = C.span_dedup(df, "doc_id", window=8).collect()
    assert len(spans) == 1
    s = spans[0]
    # maximal merge: 33 overlapping stride-1 windows -> exactly [7, 47)
    assert (s["doc_id"], s["span_start"], s["span_end"]) == ("b", 7, 47)
    assert s["span_len"] == 40 and s["n_windows"] == 33
    rows = {
        r["doc_id"]: r
        for r in C.span_dedup(df, "doc_id", window=8, mode="strip").collect()
    }
    assert rows["a"]["n_removed"] == 0  # first occurrence kept intact
    assert rows["b"]["n_removed"] == 40
    assert rows["b"]["text"] == "z1 z2 z3 z4 z5 z6 z7 q1"
    assert rows["c"]["n_removed"] == 0


def test_span_dedup_separate_gapped_regions_stay_separate(spark):
    """Two repeated regions with a non-duplicated gap between them must
    NOT merge; contiguous duplicate windows must."""
    r1 = " ".join(f"r{i}" for i in range(10))
    r2 = " ".join(f"s{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            ("a", r1 + " " + r2),
            ("b", r1 + " gap1 gap2 gap3 " + r2),
            ("d", "self " + r1),  # third occurrence of r1 only
        ],
        "doc_id string, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in C.span_dedup(df, "doc_id", window=5).collect()
    }
    # doc a is first for both regions (and they're contiguous there);
    # doc b repeats both but the gap splits them into two spans
    assert ("b", 0, 10) in spans and ("b", 13, 23) in spans
    assert ("d", 1, 11) in spans
    assert not any(d == "a" for d, _, _ in spans)


def test_span_dedup_stage_dispatch_and_validation(spark):
    df = spark.createDataFrame(
        [("a", "t1 t2 t3 t4 t5 t6"), ("b", "t1 t2 t3 t4 t5 t6")],
        "doc_id string, text string",
    )
    from config_driven_pyspark_spark.operators.corpus import stage_corpus

    spans = stage_corpus(
        df,
        {"stage": "corpus", "op": "span_dedup", "id_col": "doc_id",
         "window": 3},
        {},
    ).collect()
    assert len(spans) == 1 and spans[0]["doc_id"] == "b"
    assert (spans[0]["span_start"], spans[0]["span_end"]) == (0, 6)
    with pytest.raises(ValueError, match="mode"):
        C.span_dedup(df, "doc_id", mode="bogus")
    with pytest.raises(ValueError, match="window"):
        C.span_dedup(df, "doc_id", window=0)


def test_pack_sequences_null_stratum_not_dropped(spark):
    """Docs with a NULL `by` value form their own stratum instead of
    silently vanishing from the packed output."""
    df = spark.createDataFrame(
        [(1, "en", "a a"), (2, None, "b b b"), (3, None, "c")],
        "id long, lang string, text string",
    )
    packed = C.pack_sequences(df, "id", seq_len=4, by="lang").collect()
    total = sum(r["n_tokens"] for r in packed)
    assert total == 6  # 2 + 3 + 1 — nothing lost
    null_rows = [r for r in packed if r["lang"] is None]
    assert sum(r["n_tokens"] for r in null_rows) == 4


def test_token_budget_null_stratum_not_dropped(spark):
    df = spark.createDataFrame(
        [(1, "en", "a a"), (2, None, "b b b")],
        "id long, lang string, text string",
    )
    out = C.token_budget_sample(df, "id", budget=100, by="lang").collect()
    assert {r["id"] for r in out} == {1, 2}


def test_split_assign_deterministic_and_complete(documents):
    out = C.split_assign(documents, "doc_id",
                         {"train": 0.8, "val": 0.1, "test": 0.1}, n_shards=8)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == documents.count()  # map-only: every row survives
    assert all(0 <= r["shard"] < 8 for r in rows.values())
    # fractions approximately honored (16-bit buckets on 500 docs)
    n = len(rows)
    n_train = sum(1 for r in rows.values() if r["split"] == "train")
    assert 0.7 * n < n_train < 0.9 * n
    # identical under a different partitioning (the df.sample failure mode)
    redo = {
        r["doc_id"]: r
        for r in C.split_assign(documents.repartition(13), "doc_id",
                                {"train": 0.8, "val": 0.1, "test": 0.1},
                                n_shards=8).collect()
    }
    assert all(
        (rows[k]["split"], rows[k]["shard"], rows[k]["shuffle_key"])
        == (redo[k]["split"], redo[k]["shard"], redo[k]["shuffle_key"])
        for k in rows
    )


def test_split_assign_salt_rerolls(documents):
    base = {r["doc_id"]: r["split"] for r in
            C.split_assign(documents, "doc_id").collect()}
    salted = {r["doc_id"]: r["split"] for r in
              C.split_assign(documents, "doc_id", salt="run2").collect()}
    assert base != salted  # a salt change re-rolls assignments


def test_split_assign_validation(documents):
    with pytest.raises(ValueError, match="sum to 1"):
        C.split_assign(documents, "doc_id", {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="n_shards"):
        C.split_assign(documents, "doc_id", n_shards=0)


def test_split_assign_null_key_raises(spark):
    # ADVICE r4: a NULL key used to hash to NULL and silently land in the
    # last-named split with NULL shard; it must fail loudly instead
    df = spark.createDataFrame([("a",), (None,)], "k string")
    with pytest.raises(Exception, match="split_assign"):
        C.split_assign(df, "k").collect()


def test_cap_per_stratum(documents):
    out = C.cap_per_stratum(documents, "doc_id", "source", cap=15)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 15 for n in counts.values())
    # selection is deterministic: a different partitioning keeps the
    # identical survivor set
    base_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    redo_ids = {
        r["doc_id"]
        for r in C.cap_per_stratum(documents.repartition(7), "doc_id",
                                   "source", cap=15).select("doc_id").collect()
    }
    assert base_ids == redo_ids
    # strata smaller than the cap survive whole
    assert C.cap_per_stratum(documents, "doc_id", "source", cap=10**6).count() \
        == documents.count()
    with pytest.raises(ValueError, match="cap"):
        C.cap_per_stratum(documents, "doc_id", "source", cap=0)


def test_bm25_topk_relevance_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "spark join table spark join"),   # both terms, high tf
         (2, "spark filter row"),              # one term
         (3, "totally unrelated words here"),  # zero terms
         (4, "join join join join join")],     # one term, high tf
        "doc_id bigint, text string",
    )
    queries = spark.createDataFrame(
        [(0, "spark join")], "query_id bigint, query_text string"
    )
    out = C.bm25_topk(docs, queries, k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 3 not in rows                       # no matching term, no row
    assert rows[1]["rank"] == 1                # covers both query terms
    assert rows[1]["score"] > rows[2]["score"]
    # deterministic under repartitioning (decimal-summed contributions)
    redo = {r["doc_id"]: r["score"]
            for r in C.bm25_topk(docs.repartition(7), queries, k=10).collect()}
    assert redo == {d: r["score"] for d, r in rows.items()}


def test_bm25_stage_dispatch(spark):
    from config_driven_pyspark_spark import Pipeline

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id bigint, text string")
    docs.createOrReplaceTempView("t_bm25_docs")
    qs = spark.createDataFrame(
        [(0, "beta")], "query_id bigint, query_text string")
    qs.createOrReplaceTempView("t_bm25_q")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_bm25_q", "name": "qs"},
        {"stage": "sql", "query": "SELECT * FROM t_bm25_docs"},
        {"stage": "corpus", "op": "bm25", "id_col": "doc_id",
         "queries": "qs", "k": 5},
    ]).run(spark)
    assert {r["doc_id"] for r in out.collect()} == {1, 2}


def test_bigram_perplexity_hand_computed(spark):
    """2-doc corpus small enough to verify the smoothed model by hand.
    Corpus: 'a b a b' + 'a b c' + 'solo'. Bigrams: (a,b)x3, (b,a)x1,
    (b,c)x1. C1: a->3, b->2. Vocab (cap 10) covers all four tokens
    {a, b, c, solo}, so V = 5 with <unk>.
    P(b|a) = 3.5/5.5, P(a|b) = 1.5/4.5, P(c|b) = 1.5/4.5."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in C.bigram_perplexity(
        docs, vocab_size=10, k_smoothing=0.5).collect()}
    p_ba, p_ab, p_cb = 3.5 / 5.5, 1.5 / 4.5, 1.5 / 4.5
    exp1 = round(-math.log(p_ba), 9) * 2 + round(-math.log(p_ab), 9)
    exp2 = round(-math.log(p_ba), 9) + round(-math.log(p_cb), 9)
    assert rows[1]["n_bigrams"] == 3
    assert abs(rows[1]["nll_sum"] - exp1) < 1e-9
    assert rows[2]["n_bigrams"] == 2
    assert abs(rows[2]["nll_sum"] - exp2) < 1e-9
    # a 1-token doc has no bigrams and scores zero, not NULL
    assert (rows[3]["n_bigrams"], rows[3]["nll_sum"]) == (0, 0.0)


def test_bigram_perplexity_vocab_cap_unk(spark):
    """With vocab_size=1 only the most frequent token survives; every
    other token maps to <unk>, so distinct bigram keys collapse to at
    most 4 combinations of {top, <unk>} and scores still sum per doc."""
    docs = spark.createDataFrame(
        [(1, "x x y z"), (2, "x q r x")], "doc_id bigint, text string",
    )
    out = C.bigram_perplexity(docs, vocab_size=1, k_smoothing=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_bigrams"] == 3 and rows[2]["n_bigrams"] == 3
    assert rows[1]["nll_sum"] > 0 and rows[2]["nll_sum"] > 0


def test_bigram_perplexity_flags_gibberish(spark):
    """The signal works: a document of corpus-typical bigrams scores a
    lower per-bigram NLL than a same-length shuffled/gibberish one."""
    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, common) for i in range(10)]
        + [(99, "mat the on sat cat the")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r["nll_sum"] / r["n_bigrams"]
            for r in C.bigram_perplexity(docs, vocab_size=100).collect()}
    assert rows[0] < rows[99]


def test_perplexity_stage_dispatch(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b a")], "doc_id bigint, text string")
    docs.createOrReplaceTempView("t_ppl_docs")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_ppl_docs"},
        {"stage": "corpus", "op": "perplexity", "id_col": "doc_id",
         "vocab_size": 100},
    ]).run(spark)
    assert {r["doc_id"] for r in out.collect()} == {1, 2}


def test_top_collocations_hand_computed(spark):
    """Every count hand-checkable. Tokens: x->6, y->5, z->2 (N_uni=13);
    bigrams per doc 2+2+2+1+1 = 8; (x,y) occurs 4 times."""
    import math

    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "x y x"), (4, "x y"), (5, "y x")],
        "doc_id bigint, text string",
    )
    rows = C.top_collocations(docs, k=10, min_count=2).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    assert got[("x", "y")]["n12"] == 4
    exp = round(math.log((4 * 13.0 * 13) / (8 * 6.0 * 5)), 9)
    assert abs(got[("x", "y")]["pmi"] - exp) < 1e-12
    # min_count suppresses pairs below the floor
    assert ("y", "z") in got and got[("y", "z")]["n12"] == 2
    assert ("z", "x") not in got  # appears once
    # ordering: pmi desc, then lexicographic
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_collocations_stage_dispatch(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id bigint, text string")
    docs.createOrReplaceTempView("t_coll_docs")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_coll_docs"},
        {"stage": "corpus", "op": "collocations", "id_col": "doc_id",
         "k": 5, "min_count": 2},
    ]).run(spark)
    rows = out.collect()
    assert [r["w1"] for r in rows] and rows[0]["n12"] >= 2


def test_bigram_perplexity_empty_and_whitespace_docs(spark):
    """Regression (r6 review): a 0-token document made slice() length -1
    and crashed the whole job; empty/whitespace docs must instead score
    (0, 0.0) like any other sub-2-token doc."""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, "   "), (4, None)],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in C.bigram_perplexity(
        docs, vocab_size=10).collect()}
    assert len(rows) == 4
    for did in (2, 3):
        assert (rows[did]["n_bigrams"], rows[did]["nll_sum"]) == (0, 0.0)
    assert rows[1]["n_bigrams"] == 2


def test_top_collocations_tolerates_empty_docs(spark):
    """Same regression for PMI mining: empty/whitespace docs contribute
    zero bigrams instead of aborting the job."""
    docs = spark.createDataFrame(
        [(1, "x y x y x y"), (2, ""), (3, " ")],
        "doc_id bigint, text string",
    )
    rows = C.top_collocations(docs, k=5, min_count=2).collect()
    assert {(r["w1"], r["w2"]) for r in rows} == {("x", "y"), ("y", "x")}


def test_pack_boundaries_metadata(documents):
    """r8: boundaries triples are contiguous (offsets tile the sequence),
    count n_docs pieces, and their lengths sum to n_tokens — exactly the
    metadata needed to build a cross-document attention mask."""
    rows = C.pack_sequences(
        documents, "doc_id", "text", seq_len=64, boundaries=True
    ).collect()
    assert rows
    doc_ids = {r["doc_id"] for r in documents.select("doc_id").collect()}
    for r in rows:
        parts = [p.split(":") for p in r["boundaries"].split(" ")]
        assert len(parts) == r["n_docs"]
        off = 0
        for pid, po, pl in parts:
            assert int(pid) in doc_ids
            assert int(po) == off            # contiguous tiling
            off += int(pl)
        assert off == r["n_tokens"]


def test_upsample_factors(documents):
    """r8: expected multiplicity ≈ factor per stratum (1/65536
    granularity), copies are a pure function of the id (partitioning-
    invariant), factor 0 drops, absent strata default to 1x."""
    factors = {"en": 2.0, "fr": 1.5, "zh": 0.0}
    out = C.upsample(documents, "lang", factors, "doc_id").cache()
    base = {r["lang"]: r["n"] for r in documents.groupBy("lang")
            .agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in out.groupBy("lang")
           .agg(F.count("*").alias("n")).collect()}
    assert got["en"] == 2 * base["en"]              # integer factor exact
    assert "zh" not in got                          # factor 0 drops
    assert got["de"] == base["de"]                  # default 1x
    assert abs(got["fr"] / base["fr"] - 1.5) < 0.25  # fractional ≈
    a = sorted(map(tuple, out.select("doc_id", "copy_idx").collect()))
    b = sorted(map(tuple, C.upsample(
        documents.repartition(7), "lang", factors, "doc_id"
    ).select("doc_id", "copy_idx").collect()))
    assert a == b
    out.unpersist()
    with pytest.raises(ValueError, match="factors"):
        C.upsample(documents, "lang", {}, "doc_id")
    with pytest.raises(ValueError, match=">= 0"):
        C.upsample(documents, "lang", {"en": -1.0}, "doc_id")


def test_skew_report_shares_and_ranks(documents):
    """r8: shares sum to ≤1 over the top-k, ranks are 1..k dense by
    count desc, and skew_x is count / average-count exactly."""
    from config_driven_pyspark_spark.operators.relational import skew_report
    out = skew_report(documents, ["lang"], k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["n"] >= out[1]["n"] >= out[2]["n"]
    total = documents.count()
    n_keys = documents.select("lang").distinct().count()
    for r in out:
        assert r["share"] == round(r["n"] / total, 9)
        assert r["skew_x"] == round(r["n"] / (total / n_keys), 9)
    with pytest.raises(ValueError, match="key column"):
        skew_report(documents, [], k=3)


def test_corpus_diff_drift_report(documents):
    """r8: exact per-stratum deltas, NULL pct for newborn strata,
    vanished strata surface with new counts of zero."""
    new = documents.filter("lang <> 'zh'").union(
        documents.filter("lang = 'en'")      # en doubled → +100%
    )
    out = {r["lang"]: r for r in C.corpus_diff(
        new, documents, "lang"
    ).collect()}
    assert out["zh"]["new_docs"] == 0
    assert out["zh"]["delta_docs"] == -out["zh"]["old_docs"]
    assert out["zh"]["pct_docs"] == -100.0
    assert out["en"]["new_docs"] == 2 * out["en"]["old_docs"]
    assert out["en"]["pct_docs"] == 100.0
    assert out["fr"]["delta_docs"] == 0 and out["fr"]["pct_docs"] == 0.0
    assert out["fr"]["delta_tokens"] == 0


def test_contamination_char_unit(spark):
    """r8: unit='char' flags substring overlap the word form misses —
    a doc sharing a 12-char run with the benchmark but no full 3-word
    gram is caught by char grams only; unknown units raise."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "xx quick brown xx"),     # shares 'quick brown' substring
         (2, "totally different words here")],
        "doc_id long, text string",
    )
    char_hits = {r["doc_id"] for r in C.contamination_flags(
        docs, bench, "doc_id", ngram_n=11, unit="char"
    ).collect()}
    word_hits = {r["doc_id"] for r in C.contamination_flags(
        docs, bench, "doc_id", ngram_n=3, unit="word"
    ).collect()}
    assert 1 in char_hits and 2 not in char_hits
    assert 1 not in word_hits                # word 3-grams miss it
    kept = {r["doc_id"] for r in C.decontaminate(
        docs, bench, "doc_id", ngram_n=11, unit="char"
    ).collect()}
    assert kept == {2}
    with pytest.raises(ValueError, match="unit"):
        C.contamination_flags(docs, bench, "doc_id", unit="byte")


def test_length_filter_percentile_band(documents):
    """r8: global band keeps exactly the docs inside [lo, hi] exact
    quantiles; per-stratum bands adapt to each stratum; degenerate
    [0.5, 0.5] keeps only median-length docs; bad bounds raise."""
    from config_driven_pyspark_spark.functions import text as TX
    counts = sorted(
        r["n"] for r in documents.select(
            TX.token_count(F.col("text")).alias("n")).collect()
    )
    out = C.length_filter(documents, "text", lo=0.1, hi=0.9)
    got = sorted(r["n_tokens"] for r in out.collect())
    import math

    def q(p):
        # linear interpolation, the percentile/quantile_cont definition
        i = p * (len(counts) - 1)
        f, c = math.floor(i), math.ceil(i)
        return counts[f] + (i - f) * (counts[c] - counts[f])

    expect = [n for n in counts if q(0.1) <= n <= q(0.9)]
    assert got == expect
    per_lang = C.length_filter(documents, "text", by="lang", lo=0.2, hi=0.8)
    n_langs = documents.select("lang").distinct().count()
    assert per_lang.select("lang").distinct().count() == n_langs
    assert 0 < per_lang.count() < documents.count()
    with pytest.raises(ValueError, match="lo <= hi"):
        C.length_filter(documents, "text", lo=0.9, hi=0.1)


def test_score_normalize_exact_moments(spark):
    """r8: z matches a hand computation with sample std; zero-variance
    and singleton strata yield exactly 0.0; partitioning-invariant
    (the whole point of decimal moments over builtin stddev)."""
    import math
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0),
         (4, "b", 5.0), (5, "b", 5.0),          # zero variance
         (6, "c", 7.0)],                        # singleton
        "doc_id long, lang string, score double",
    )
    out = {r["doc_id"]: r["z_score"] for r in C.score_normalize(
        df, "score", by="lang"
    ).collect()}
    std = math.sqrt((3 * 14.0 - 36.0) / (3 * 2))   # sample std of 1,2,3
    assert out[1] == round((1.0 - 2.0) / std, 9)
    assert out[2] == 0.0
    assert out[3] == round((3.0 - 2.0) / std, 9)
    assert out[4] == 0.0 and out[5] == 0.0 and out[6] == 0.0
    a = sorted(C.score_normalize(df, "score", by="lang")
               .select("doc_id", "z_score").collect())
    b = sorted(C.score_normalize(df.repartition(5), "score", by="lang")
               .select("doc_id", "z_score").collect())
    assert a == b


def test_pii_scrub_custom_tag_literal(spark):
    """r8: $ and backslash in a custom tag_format land literally
    (Java replacement metacharacters are quoted)."""
    df = spark.createDataFrame(
        [(1, "mail x@y.io now")], "id long, text string"
    )
    row = C.pii_scrub(
        df, types=["email"], tag_format="<$1-{TYPE}\\>"
    ).collect()[0]
    assert row["text"] == "mail <$1-EMAIL\\> now"


def test_bigram_lm_stored_vs_self_trained(documents, tmp_path):
    """r8: scoring the training corpus against its own persisted model
    is bit-identical to the self-training scorer (same vocab cap, same
    counts, left joins degenerate to inner on seen bigrams); a novel
    document takes add-k's unseen-event mass and scores higher NLL than
    an in-distribution one."""
    model = str(tmp_path / "lm")
    summary = C.bigram_lm_train(documents, "text", 500, model).collect()[0]
    assert summary["n_vocab"] <= 500 and summary["n_bigram_tokens"] > 0
    stored = sorted(map(tuple, C.bigram_perplexity_stored(
        documents, "doc_id", "text", model
    ).collect()))
    selftr = sorted(map(tuple, C.bigram_perplexity(
        documents, "doc_id", "text", 500
    ).collect()))
    assert stored == selftr
    # an all-novel document maps to (<unk>,<unk>) bigrams unseen in
    # training: P = k/(0 + k·V) = 1/V exactly — the add-k unseen-event
    # mass in closed form
    import math

    spark = documents.sparkSession
    probe = spark.createDataFrame(
        [(9002, "zzz qqq vvv kkk jjj www")], "doc_id long, text string"
    )
    row = C.bigram_perplexity_stored(
        probe, "doc_id", "text", model
    ).collect()[0]
    v = summary["n_vocab"] + 1
    assert row["n_bigrams"] == 5
    assert row["nll_sum"] == 5 * round(math.log(v), 9)
    with pytest.raises(ValueError, match="model_path"):
        C.bigram_lm_train(documents, "text", 500, None)
    with pytest.raises(ValueError, match="model_path"):
        C.bigram_perplexity_stored(documents, "doc_id", "text", None)


def test_mad_outliers_robust_flags(spark):
    """r8: med/MAD match hand values; a far point flags, the bulk
    doesn't; zero-MAD strata flag exactly the off-median values."""
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 12.0), (3, "a", 11.0),
         (4, "a", 11.5), (5, "a", 100.0),
         (6, "b", 7.0), (7, "b", 7.0), (8, "b", 7.0), (9, "b", 9.0)],
        "id long, g string, v double",
    )
    out = {r["id"]: r for r in C.mad_outliers(df, "v", by="g").collect()}
    # stratum a: sorted [10, 11, 11.5, 12, 100] → med 11.5; dev
    # [1.5, .5, 0, .5, 88.5] → MAD .5; only 100 exceeds 3*.5
    assert out[1]["med"] == 11.5 and out[1]["mad"] == 0.5
    assert out[5]["is_outlier"] is True
    assert all(not out[i]["is_outlier"] for i in (1, 2, 3, 4))
    # stratum b: med 7, MAD 0 → only the 9 flags
    assert out[6]["mad"] == 0.0
    assert out[9]["is_outlier"] is True and out[6]["is_outlier"] is False
    with pytest.raises(ValueError, match="c must"):
        C.mad_outliers(df, "v", c=0.0)


def test_url_features_public_suffixes(spark):
    """r9 (ADVICE): the default domain is the LAST TWO labels (bbc.co.uk
    → co.uk, documented as such); an opt-in public_suffixes list yields
    true registrable domains with longest-suffix-wins, and blocklists
    then scope to the registrable domain instead of the whole suffix."""
    df = spark.createDataFrame(
        [
            (1, "https://www.BBC.co.uk/news"),
            (2, "https://news.example.COM/x"),
            (3, "http://foo.plc.co.im/"),
            (4, "https://co.uk/"),  # bare suffix: no extra label exists
        ],
        "id long, url string",
    )
    base = {r["id"]: r["domain"] for r in C.url_features(df, "url").collect()}
    assert base[1] == "co.uk" and base[2] == "example.com"
    out = {r["id"]: r for r in C.url_features(
        df, "url",
        blocklist=["bbc.co.uk"],
        public_suffixes=["co.uk", "plc.co.im", "co.im"],
    ).collect()}
    assert out[1]["domain"] == "bbc.co.uk" and out[1]["blocked"] is True
    assert out[2]["domain"] == "example.com"      # unlisted: last two labels
    assert out[3]["domain"] == "foo.plc.co.im"    # longest suffix wins
    assert out[4]["domain"] == "co.uk"            # bare suffix falls back
    assert out[2]["blocked"] is False
    # stage dispatch carries the knob
    staged = C.stage_corpus(
        df, {"op": "url_features", "url_col": "url",
             "public_suffixes": ["co.uk"]}, None,
    )
    assert {r["id"]: r["domain"] for r in staged.collect()}[1] == "bbc.co.uk"


def test_quality_classify_mode_parity(spark, documents):
    """r9: the 0-exchange map_literal mode (the streaming path) scores
    bit-identically to the broadcast-join mode on real corpus text —
    same DECIMAL(18,9) terms, same (28,9) accumulation; join mode on a
    stream and unknown modes raise."""
    weights = {"the": 0.11, "and": -0.07, "data": 0.311111111,
               "of": 0.000000001, "spark": 2.5}
    a = C.quality_classify(
        documents, "doc_id", weights, "text", bias=0.01, threshold=0.02,
        mode="join",
    ).select("doc_id", "n_tokens", "score", "keep")
    b = C.quality_classify(
        documents, "doc_id", weights, "text", bias=0.01, threshold=0.02,
        mode="map_literal",
    ).select("doc_id", "n_tokens", "score", "keep")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    with pytest.raises(ValueError, match="mode"):
        C.quality_classify(documents, "doc_id", weights, mode="bogus")


def test_percentile_escape_hatch_contract(spark):
    """r9 (VERDICT r8 ask #7): length_filter / mad_outliers with no
    explicit method WARN at plan time (exact percentiles buffer whole
    strata); method='exact' pins today's values silently; method=
    'approx' runs the fixed-memory sketch and lands within one data
    value of the exact band; unknown methods raise."""
    import warnings

    df = spark.createDataFrame(
        [(i, "tok " * (i + 1), "x") for i in range(40)],
        "id long, text string, lang string",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        C.length_filter(df, "text", lo=0.1, hi=0.9)
        C.mad_outliers(df, "id")
        msgs = [str(x.message) for x in w]
    assert any("length_filter" in m and "approx" in m for m in msgs)
    assert any("mad_outliers" in m for m in msgs)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        exact = C.length_filter(df, "text", lo=0.1, hi=0.9, method="exact")
        C.mad_outliers(df, "id", method="exact")
        assert not w  # explicit choice is silent
    exact_ids = sorted(r["id"] for r in exact.collect())
    approx_ids = sorted(
        r["id"] for r in C.length_filter(
            df, "text", lo=0.1, hi=0.9, method="approx"
        ).collect()
    )
    # high accuracy on a tiny stratum: sketch edges sit on data values,
    # so the kept band differs by at most one row per edge
    assert len(set(exact_ids) ^ set(approx_ids)) <= 2
    mo = C.mad_outliers(df, "id", method="approx").collect()
    assert {r["id"] for r in mo} == set(range(40))  # flags, no row loss
    with pytest.raises(ValueError, match="method"):
        C.length_filter(df, "text", method="bogus")
    with pytest.raises(ValueError, match="method"):
        C.mad_outliers(df, "id", method="bogus")
    # stage dispatch carries the knob (no warning when config sets it)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        C.stage_corpus(df, {"op": "length_filter", "column": "text",
                            "method": "approx"}, None).collect()
        C.stage_corpus(df, {"op": "mad_outliers", "score_col": "id",
                            "method": "approx"}, None).collect()
        assert not [x for x in w if "percentile" in str(x.message)]


def test_html_extract_goldens(spark):
    """r9: script/style CONTENT vanishes (not just the tags), comments
    go, entities decode in the fixed order (&amp; last, so double
    encodings resolve one level), whitespace collapses, NULL input
    yields the empty string; the op is map-only (plan has no
    exchanges)."""
    df = spark.createDataFrame(
        [
            (1, "<p>Hello <b>world</b></p><script>var hidden = 1;"
                "</script><style>p{x}</style><!-- gone -->"),
            (2, "A &amp;amp; B &lt;i&gt; &nbsp;&quot;q&quot; &#39;s&#39;"
                " &apos;t&apos;"),
            (3, None),
            (4, "no markup at   all"),
            (5, "<SCRIPT SRC='x'>multi\nline\njs</SCRIPT>ok"),
        ],
        "id long, html string",
    )
    out = {r["id"]: r["text"] for r in C.html_extract(df).collect()}
    assert out[1] == "Hello world"
    assert out[2] == 'A &amp; B <i> "q" \'s\' \'t\''
    assert out[3] == ""
    assert out[4] == "no markup at all"
    assert out[5] == "ok"  # case-insensitive, dotall block strip
    plan = C.html_extract(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gopher_filter_rule_legs(spark):
    """r9: each Gopher rule fires independently — token band, mean word
    length, symbol ratio, bullet/ellipsis line fractions, alpha-word
    fraction, 2-of-8 stopwords; thresholds are config; unknown
    threshold keys raise; empty/NULL text fails closed with zero
    metrics."""
    good = ("the quick brown fox and that dog have fun with it "
            "running of course to the park every single day") * 2
    rows = [
        (1, good),
        (2, "the of and"),                        # too few tokens
        (3, " ".join(["a"] * 60)),                # mean word len < 3
        (4, good + " " + "#" * 10 + " # # # # # # # # # #"),  # symbols
        (5, "\n".join(f"- {good}" for _ in range(3))),        # bullets
        (6, "\n".join(f"{good}..." for _ in range(3))),       # ellipses
        (7, " ".join(["12345"] * 30) + " the of"),            # non-alpha
        (8, " ".join(["word"] * 60)),             # no stopwords
        (9, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in C.gopher_filter(
        df, thresholds={"min_tokens": 10}
    ).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["n_tokens"] == 3
    assert out[3]["keep"] is False and out[3]["mean_word_len"] == 1.0
    assert out[4]["keep"] is False and out[4]["symbol_ratio"] > 0.1
    assert out[5]["keep"] is False and out[5]["bullet_ratio"] == 1.0
    assert out[6]["keep"] is False and out[6]["ellipsis_ratio"] == 1.0
    assert out[7]["keep"] is False and out[7]["alpha_frac"] < 0.8
    assert out[8]["keep"] is False and out[8]["n_stop"] == 0
    assert out[9]["keep"] is False and out[9]["n_tokens"] == 0
    # config thresholds flip an outcome deterministically
    relaxed = {r["id"]: r["keep"] for r in C.gopher_filter(
        df, thresholds={"min_tokens": 10, "max_bullet_ratio": 1.0}
    ).collect()}
    assert relaxed[5] is True
    with pytest.raises(ValueError, match="unknown thresholds"):
        C.gopher_filter(df, thresholds={"bogus": 1})
    # streaming-safe by construction: both ops are pure Column maps
    plan = C.gopher_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_repetition_filter_gopher_rules(spark):
    """r9: each repetition leg fires — duplicated lines/paragraphs
    (count + char mass), top-{2,3,4}-gram char share, duplicated
    {5..10}-gram char mass; clean text keeps; metrics are map-only
    (Exchange-free plan) and match an independent Python reference on
    edge shapes (short docs, empty, NULL)."""
    # long enough that one unrepeated 4-gram is a small char fraction —
    # Gopher's top-gram metric counts the most frequent gram even at
    # count 1, so very short docs legitimately fail it (the length rule
    # itself lives in gopher_filter)
    clean = " ".join(f"word{i:02d}" for i in range(80))
    rows = [
        (1, clean),
        (2, "la la la la la la la la"),                    # top-2gram
        (3, "one\ntwo\none\ntwo\none"),                    # dup lines
        (4, "para a\n\npara a\n\npara b"),                 # dup paragraphs
        (5, ("alpha beta gamma delta epsilon zeta " * 3).strip()),  # 6-gram x3
        (6, None),
        (7, "tiny"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in C.repetition_filter(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["top_2gram_char_frac"] > 0.2 and out[2]["keep"] is False
    assert out[3]["dup_line_frac"] == 0.6 and out[3]["keep"] is False
    assert out[4]["dup_para_frac"] > 0.3 and out[4]["keep"] is False
    assert out[5]["dup_6gram_char_frac"] > 0.1 and out[5]["keep"] is False
    assert out[6]["keep"] is True      # empty: all zeros
    assert out[7]["keep"] is True      # shorter than every n: no grams
    assert out[7]["top_4gram_char_frac"] == 0.0
    with pytest.raises(ValueError, match="unknown thresholds"):
        C.repetition_filter(df, thresholds={"nope": 1})
    # config threshold flips the line-dup outcome
    relaxed = C.repetition_filter(
        df, thresholds={"dup_line_frac": 0.7, "dup_line_char_frac": 0.7}
    )
    assert {r["id"]: r["keep"] for r in relaxed.collect()}[3] is True
    plan = C.repetition_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_url_normalize_canonicalization(spark):
    """r9: lowercased scheme/host, default-port strip (non-default
    ports kept), fragment drop, case-folded tracking-param removal,
    empty-query collapse, empty path -> '/', unparseable pass-through,
    NULL -> empty; sort_params gives the order-insensitive form;
    map-only plan."""
    df = spark.createDataFrame(
        [
            (1, "HTTPS://Example.COM:443/P?utm_source=x&id=7&FBCLID=a#f"),
            (2, "http://site.org:80"),
            (3, "http://site.org:8080/a?b=1&utm_campaign=z"),
            (4, "not a url"),
            (5, None),
            (6, "https://h.io/p?z=1&a=2"),
            (7, "https://h.io/p?utm_source=1&UTM_MEDIUM=2"),
        ],
        "id long, url string",
    )
    out = {r["id"]: r["url_norm"] for r in C.url_normalize(df).collect()}
    assert out[1] == "https://example.com/P?id=7"
    assert out[2] == "http://site.org/"
    assert out[3] == "http://site.org:8080/a?b=1"  # non-default port kept
    assert out[4] == "not a url"
    assert out[5] == ""
    assert out[6] == "https://h.io/p?z=1&a=2"      # order kept by default
    assert out[7] == "https://h.io/p"              # all params tracking
    srt = {r["id"]: r["url_norm"]
           for r in C.url_normalize(df, sort_params=True).collect()}
    assert srt[6] == "https://h.io/p?a=2&z=1"
    # dedup-readiness: tracking variants of one page unify
    variants = spark.createDataFrame(
        [(1, "https://a.io/x?utm_source=tw"), (2, "https://A.IO/x#top"),
         (3, "https://a.io:443/x")],
        "id long, url string",
    )
    assert C.url_normalize(variants).select("url_norm").distinct().count() == 1
    plan = C.url_normalize(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_source_overlap_matrix(spark):
    """r9: distinct shared contents count once per unordered stratum
    pair (bytewise a < b), totals are per-side distinct contents,
    jaccard = shared/(a+b-shared), zero-overlap pairs are omitted, and
    normalization folds whitespace/case before fingerprinting."""
    df = spark.createDataFrame(
        [
            (1, "alpha", "web"), (2, "  ALPHA  ", "wiki"),  # normalized dup
            (3, "beta", "web"), (4, "beta", "wiki"), (5, "beta", "books"),
            (6, "gamma", "web"), (7, "delta", "books"),
            (8, "alpha", "web"),  # within-source dup: counts once
        ],
        "id long, text string, source string",
    )
    out = {(r["stratum_a"], r["stratum_b"]): r
           for r in C.source_overlap(df, "source", "text").collect()}
    assert set(out) == {("web", "wiki"), ("books", "web"), ("books", "wiki")}
    ww = out[("web", "wiki")]
    assert (ww["n_shared"], ww["n_a"], ww["n_b"]) == (2, 3, 2)
    assert ww["jaccard"] == round(2 / 3, 9)
    bw = out[("books", "web")]
    assert (bw["n_shared"], bw["n_a"], bw["n_b"]) == (1, 2, 3)
    # byte-exact mode splits the normalized alpha pair
    exact = {(r["stratum_a"], r["stratum_b"]): r["n_shared"]
             for r in C.source_overlap(df, "source", "text",
                                       normalize=False).collect()}
    assert exact[("web", "wiki")] == 1


# -- boilerplate strip (r9) --------------------------------------------------


def test_boilerplate_strip_removes_every_occurrence(spark):
    # "nav" appears in 3 of 4 docs -> over max_df=2 -> ALL copies removed,
    # including the first (the contract line_dedup does NOT have)
    df = spark.createDataFrame(
        [(1, "nav\nbody one"), (2, "nav\nbody two"),
         (3, "nav\nbody three"), (4, "body four")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in
            C.boilerplate_strip(df, "id", max_df=2).collect()}
    assert rows[1]["text"] == "body one" and rows[1]["n_removed"] == 1
    assert rows[2]["text"] == "body two"
    assert rows[3]["text"] == "body three"
    assert rows[4]["text"] == "body four" and rows[4]["n_removed"] == 0
    assert rows[1]["n_segments"] == 2


def test_boilerplate_strip_under_threshold_kept(spark):
    df = spark.createDataFrame(
        [(1, "shared\na"), (2, "shared\nb"), (3, "c")],
        "id long, text string",
    )
    # df("shared") = 2 is NOT > max_df=2 -> kept everywhere
    rows = {r["id"]: r for r in
            C.boilerplate_strip(df, "id", max_df=2).collect()}
    assert rows[1]["text"] == "shared\na"
    assert rows[2]["text"] == "shared\nb"


def test_boilerplate_strip_fractional_threshold(spark):
    # 10 docs; "footer" in 6 -> 6 > ceil(0.5*10)=5 -> stripped;
    # "rare" in 4 -> kept
    rows_in = [(i, ("footer\n" if i < 6 else "rare\n") + f"body {i}")
               for i in range(10)]
    df = spark.createDataFrame(rows_in, "id long, text string")
    out = {r["id"]: r for r in
           C.boilerplate_strip(df, "id", max_frac=0.5).collect()}
    assert out[0]["text"] == "body 0" and out[0]["n_removed"] == 1
    assert out[7]["text"] == "rare\nbody 7" and out[7]["n_removed"] == 0


def test_boilerplate_strip_within_doc_multiplicity(spark):
    # the bad line's EVERY occurrence goes, even repeats inside one doc
    df = spark.createDataFrame(
        [(1, "x\na\nx"), (2, "x\nb"), (3, "x\nc")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in
            C.boilerplate_strip(df, "id", max_df=2).collect()}
    assert rows[1]["text"] == "a" and rows[1]["n_removed"] == 2


def test_boilerplate_strip_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with pytest.raises(ValueError, match="max_df"):
        C.boilerplate_strip(df, "id", max_df=0)
    with pytest.raises(ValueError, match="max_frac"):
        C.boilerplate_strip(df, "id", max_frac=0.0)


# -- Bloom-filter decontamination (r9) ---------------------------------------


def test_bloom_flags_match_exact_check(spark):
    # at m=2^16 with a handful of benchmark grams the false-positive
    # probability is ~1e-15, so Bloom flags == the exact broadcast-join
    # flags on this fixture (both deterministic)
    bench = to_df(spark, [{"id": 100, "text": "the quick brown fox jumps"}])
    corpus = to_df(spark, [
        {"id": 1, "text": "totally unrelated words here now"},
        {"id": 2, "text": "prefix the quick brown fox suffix"},
    ])
    bloom = C.bloom_contamination_flags(
        corpus, bench, "id", ngram_n=3, m_bits=1 << 16, k_hashes=4
    )
    assert {r["id"]: r["n_flagged"] for r in bloom.collect()} == {2: 2}
    kept = C.bloom_decontaminate(
        corpus, bench, "id", ngram_n=3, m_bits=1 << 16, k_hashes=4
    )
    assert [r["id"] for r in kept.collect()] == [1]


def test_bloom_saturated_filter_flags_everything(spark):
    # m=64 bits saturates (every word bit set, incl. the BIGINT sign
    # bit) -> every corpus gram probes positive; pins the two's-
    # complement packing + arithmetic-shift probe on negative words
    bench = to_df(spark, [{
        "id": 1,
        "text": " ".join(f"w{i}" for i in range(300)),
    }])
    corpus = to_df(spark, [{"id": 7, "text": "zz yy xx ww vv"}])
    out = C.bloom_contamination_flags(
        corpus, bench, "id", ngram_n=3, m_bits=64, k_hashes=4
    ).collect()
    # 3 distinct 3-grams in a 5-token doc
    assert out and out[0]["n_flagged"] == 3


def test_bloom_char_unit_and_validation(spark):
    bench = to_df(spark, [{"id": 1, "text": "abcdefghij"}])
    corpus = to_df(spark, [{"id": 2, "text": "xx abcdefghij yy"},
                           {"id": 3, "text": "nothing alike"}])
    out = C.bloom_contamination_flags(
        corpus, bench, "id", ngram_n=8, unit="char", m_bits=1 << 16
    )
    ids = {r["id"] for r in out.collect()}
    assert 2 in ids and 3 not in ids
    with pytest.raises(ValueError, match="m_bits"):
        C.bloom_contamination_flags(corpus, bench, "id", m_bits=100)
    with pytest.raises(ValueError, match="k_hashes"):
        C.bloom_contamination_flags(corpus, bench, "id", k_hashes=0)
    with pytest.raises(ValueError, match="unit"):
        C.bloom_contamination_flags(corpus, bench, "id", unit="byte")


# -- quantile bucketing (r9) -------------------------------------------------


def test_quantile_bucket_terciles(spark):
    # scores 1..9: exact tercile thresholds q(1/3)=3.667, q(2/3)=6.333
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)], "id long, s double"
    )
    out = {r["id"]: r["bucket"] for r in
           C.quantile_bucket(df, "s", method="exact").collect()}
    assert [out[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )


def test_quantile_bucket_per_stratum_and_ties(spark):
    # stratum A: all-equal scores -> every threshold == the value ->
    # inclusive <= puts everything in the FIRST bucket
    # stratum B: spread scores bucket within B's own distribution
    rows = [(i, "A", 5.0) for i in range(3)] + [
        (10, "B", 1.0), (11, "B", 2.0), (12, "B", 3.0)
    ]
    df = spark.createDataFrame(rows, "id long, g string, s double")
    out = {r["id"]: r["bucket"] for r in
           C.quantile_bucket(df, "s", by="g", method="exact").collect()}
    assert all(out[i] == "head" for i in range(3))
    assert (out[10], out[11], out[12]) == ("head", "middle", "tail")


def test_quantile_bucket_custom_edges_and_validation(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, s double"
    )
    out = C.quantile_bucket(
        df, "s", edges=(0.5,), labels=("keep", "drop"),
        out_col="verdict", method="exact",
    )
    vals = {r["id"]: r["verdict"] for r in out.collect()}
    assert vals[0] == "keep" and vals[9] == "drop"
    with pytest.raises(ValueError, match="labels"):
        C.quantile_bucket(df, "s", edges=(0.5,), labels=("a", "b", "c"),
                          method="exact")
    with pytest.raises(ValueError, match="edges"):
        C.quantile_bucket(df, "s", edges=(0.9, 0.1), labels=("a", "b", "c"),
                          method="exact")
    with pytest.raises(ValueError, match="method"):
        C.quantile_bucket(df, "s", method="bogus")


def test_quantile_bucket_warns_without_method(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, s double")
    with pytest.warns(UserWarning, match="quantile_bucket"):
        C.quantile_bucket(df, "s")


def test_repetition_filter_impls_identical(spark):
    """r9 perf: the Arrow-batched pandas implementation must equal the
    Column-expression reference bit-for-bit — including HALF_UP
    9-decimal rounding (exercised by a 1/1024 char ratio whose 10th
    decimal digit is an exact 5) and Java trim semantics (U+00A0 is NOT
    trimmed) — on edge fixtures and on real corpus text."""
    fix = spark.createDataFrame(
        [
            (1, "plain text with no repetition at all here"),
            (2, "loop me " * 40),
            (3, "a\n\na\n\nb\nc\nc"),
            (4, ""),
            (5, None),
            (6, " padded \nline two"),   # Java trim keeps NBSP
            # 341 distinct 2-char tokens + 2 trailing spaces = exactly
            # 1024 chars; every 2-gram is distinct with mass 5, so
            # top_2gram_char_frac = 5/1024 = 0.0048828125 — digit 10 is
            # an exact 5 over an even digit 9: HALF_UP gives ...813,
            # banker's would give ...812. The rounding-mode trap.
            (7, " ".join(
                a + b
                for a in "abcdefghijklmn" for b in "abcdefghijklmnopqrstuvwxy"
            )[: 341 * 3 - 1] + "  "),
            (8, "one two"),                          # shorter than most n
        ],
        "id long, text string",
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inj = docs.withColumn(
        "text",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" dup seg " * 12))
            .otherwise(F.lit("")),
        ),
    ).select(F.col("doc_id").alias("id"), "text")
    for frame in (fix, inj):
        a = sorted(
            C.repetition_filter(frame, impl="column").collect(),
            key=lambda r: r["id"],
        )
        b = sorted(
            C.repetition_filter(frame, impl="pandas").collect(),
            key=lambda r: r["id"],
        )
        assert [r.asDict() for r in a] == [r.asDict() for r in b]
    with pytest.raises(ValueError, match="impl"):
        C.repetition_filter(fix, impl="numpy")


def test_novelty_score_basic(spark):
    # docs 1,2 share every 2-gram ("a b", "b c"); doc 3 is unique
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")],
        "id long, text string",
    )
    out = {r["id"]: r for r in
           C.novelty_score(df, "id", ngram_n=2).collect()}
    assert out[1]["novelty"] == 0.0 and out[1]["n_distinct_grams"] == 2
    assert out[2]["novelty"] == 0.0
    assert out[3]["novelty"] == 1.0 and out[3]["n_novel"] == 2


def test_novelty_score_max_df_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "")],
        "id long, text string",
    )
    # df("a b") = 3; with max_df=2 it is NOT novel, with max_df=3 it is
    strict = {r["id"]: r["novelty"] for r in
              C.novelty_score(df, "id", ngram_n=2, max_df=2).collect()}
    loose = {r["id"]: r["novelty"] for r in
             C.novelty_score(df, "id", ngram_n=2, max_df=3).collect()}
    assert strict[1] == 0.0 and loose[1] == 1.0
    # empty doc: zero grams, novelty 0.0, row preserved
    assert strict[4] == 0.0
    with pytest.raises(ValueError, match="max_df"):
        C.novelty_score(df, "id", max_df=0)
    with pytest.raises(ValueError, match="unit"):
        C.novelty_score(df, "id", unit="byte")


def test_novelty_boilerplate_vs_unique(spark):
    # a template family: each doc differs (ids differ) but every piece
    # is shared -> low novelty; one bespoke doc -> high novelty
    tmpl = [(i, f"order {i} confirmed thanks for shopping with us today")
            for i in range(5)]
    df = spark.createDataFrame(
        tmpl + [(99, "the quick brown fox jumps over the lazy dog")],
        "id long, text string",
    )
    out = {r["id"]: r["novelty"] for r in
           C.novelty_score(df, "id", ngram_n=3).collect()}
    assert out[99] == 1.0
    assert all(out[i] < 0.5 for i in range(5))


def test_word_blocklist_filter(spark):
    from config_driven_pyspark_spark.operators.corpus import (
        word_blocklist_filter,
    )

    df = spark.createDataFrame(
        [(1, "a clean document"), (2, "one BADWORD here"),
         (3, "badword badword other twice"), (4, "class assignment"),
         (5, None)],
        "doc_id long, text string",
    )
    flagged = {r["doc_id"]: r for r in word_blocklist_filter(
        df, ["badword", "ass"], mode="flag").collect()}
    assert flagged[1]["n_blocked"] == 0 and flagged[1]["keep"]
    # case-insensitive exact-token match
    assert flagged[2]["n_blocked"] == 1
    assert flagged[2]["blocked_words"] == ["badword"]
    assert not flagged[2]["keep"]
    assert flagged[3]["n_blocked"] == 2
    assert flagged[3]["blocked_words"] == ["badword"]
    # NEVER substring: 'class'/'assignment' don't trip on 'ass'
    assert flagged[4]["n_blocked"] == 0 and flagged[4]["keep"]
    # C4 mode drops offenders entirely
    kept = {r["doc_id"] for r in word_blocklist_filter(
        df, ["badword"]).collect()}
    assert kept == {1, 4, 5}
    # max_hits loosens the rule
    kept2 = {r["doc_id"] for r in word_blocklist_filter(
        df, ["badword"], max_hits=1).collect()}
    assert kept2 == {1, 2, 4, 5}
    import pytest as _pt
    with _pt.raises(ValueError, match="mode"):
        word_blocklist_filter(df, ["x"], mode="bogus")
    with _pt.raises(ValueError, match="words"):
        word_blocklist_filter(df, [])


def test_chunk_sentences(spark):
    from config_driven_pyspark_spark.operators.corpus import chunk_sentences

    df = spark.createDataFrame(
        [(1, "one two three. four five? six seven eight! nine"),
         (2, ""), (3, None), (4, "no terminators at all")],
        "doc_id long, text string",
    )
    # chunk_tokens=5: sentence token masses are 3,2,3,1 -> cum-before
    # 0,3,5,8 -> chunks 0,0,1,1
    out = {}
    for r in chunk_sentences(df, "doc_id", chunk_tokens=5).collect():
        out[(r["doc_id"], r["chunk_id"])] = r
    assert out[(1, 0)]["chunk_text"] == "one two three. four five?"
    assert out[(1, 0)]["n_tokens"] == 5 and out[(1, 0)]["n_sentences"] == 2
    assert out[(1, 1)]["chunk_text"] == "six seven eight! nine"
    assert out[(1, 1)]["n_tokens"] == 4
    # sentences never split: a chunk may overshoot by one sentence
    big = chunk_sentences(df.filter("doc_id = 1"), "doc_id",
                          chunk_tokens=4).collect()
    assert all("." not in c["chunk_text"][:-1]
               or c["chunk_text"].count(".") <= c["n_sentences"]
               for c in big)
    # empty/null docs emit nothing; unpunctuated text = one sentence
    assert not any(k[0] in (2, 3) for k in out)
    assert out[(4, 0)]["n_sentences"] == 1
    import pytest as _pt
    with _pt.raises(ValueError, match="chunk_tokens"):
        chunk_sentences(df, "doc_id", chunk_tokens=0)


def test_chunk_sentences_reassembles(spark):
    from config_driven_pyspark_spark.operators.corpus import chunk_sentences

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(40)
    ch = chunk_sentences(docs, "doc_id", chunk_tokens=32)
    rows = ch.collect()
    # every document's chunks, in chunk order, carry every token once
    got = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
        got.setdefault(r["doc_id"], []).extend(r["chunk_text"].split(" "))
    for d in docs.collect():
        toks = [t for t in d["text"].split(" ") if t]
        if toks:
            assert got[d["doc_id"]] == toks, d["doc_id"]


def test_kneser_ney_perplexity(spark):
    from config_driven_pyspark_spark.operators.corpus import (
        bigram_perplexity,
    )
    import math

    # "a b" x2 and "a c": c1(a)=3, c12(a,b)=2, c12(a,c)=1,
    # N1+(a,.)=2, N1+(.,b)=1, N1+(.,c)=1, N_types=2
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_perplexity(
        df, vocab_size=10, smoothing="kneser_ney", discount=0.75
    ).collect()}
    d = 0.75
    p_ab = max(2 - d, 0) / 3 + d * 2 / 3 * (1 / 2)
    p_ac = max(1 - d, 0) / 3 + d * 2 / 3 * (1 / 2)
    assert out[1]["nll_sum"] == round(-math.log(p_ab), 9)
    assert out[3]["nll_sum"] == round(-math.log(p_ac), 9)
    # KN scores the common continuation as likelier
    assert out[1]["nll_sum"] < out[3]["nll_sum"]
    import pytest as _pt
    with _pt.raises(ValueError, match="smoothing"):
        bigram_perplexity(df, smoothing="bogus")


def test_word_blocklist_phrases(spark):
    from config_driven_pyspark_spark.operators.corpus import (
        word_blocklist_filter,
    )

    df = spark.createDataFrame(
        [(1, "totally fine text"), (2, "contains the bad phrase here"),
         (3, "bad phrase bad phrase twice"), (4, "bad then phrase split"),
         (5, "phrase bad reversed")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in word_blocklist_filter(
        df, ["Bad Phrase"], mode="flag").collect()}
    assert out[1]["n_blocked"] == 0
    assert out[2]["n_blocked"] == 1
    assert out[2]["blocked_words"] == ["bad phrase"]
    assert out[3]["n_blocked"] == 2
    # sequence match only: split or reversed tokens never trip
    assert out[4]["n_blocked"] == 0
    assert out[5]["n_blocked"] == 0
    # mixed single + phrase entries count independently
    mixed = {r["doc_id"]: r for r in word_blocklist_filter(
        df, ["bad phrase", "reversed"], mode="flag").collect()}
    assert mixed[5]["n_blocked"] == 1
    assert mixed[3]["blocked_words"] == ["bad phrase"]
    # regression (hypothesis-caught): a doc SHORTER than the phrase must
    # not throw under ANSI element_at semantics
    short = spark.createDataFrame([(9, "a")], "doc_id long, text string")
    row = word_blocklist_filter(short, ["aa bb"], mode="flag").first()
    assert row["n_blocked"] == 0 and row["keep"]
    import pytest as _pt
    with _pt.raises(ValueError, match="blank"):
        word_blocklist_filter(df, ["ok", "  "])


def test_r9_map_only_ops_have_no_exchange(spark):
    """The round's claimed-map-only additions stay Exchange-free:
    word_blocklist (flag), readability text ops, and lang_margin."""
    from config_driven_pyspark_spark.functions import text as TXF
    from config_driven_pyspark_spark.operators.corpus import (
        word_blocklist_filter,
    )
    from pyspark.sql import functions as F

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plans = {
        "blocklist": word_blocklist_filter(
            df, ["join", "bad phrase"], mode="flag"),
        "readability": df.select(
            TXF.sentence_count(F.col("text")),
            TXF.flesch_reading_ease(F.col("text")),
            TXF.fk_grade(F.col("text")),
        ),
        "lang_margin": df.select(TXF.lang_margin(F.col("text"))),
    }
    for name, frame in plans.items():
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, name
