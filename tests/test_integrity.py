"""Export-manifest pins: order/partitioning invariance, pair-hash
mispairing detection, diff status taxonomy, and config-stage wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark.operators.integrity import (
    export_manifest,
    manifest_diff,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_manifest_invariant_to_order_and_partitioning(spark, documents):
    base = export_manifest(documents, by="source").collect()
    shuffled = export_manifest(
        documents.orderBy(F.desc("text")).repartition(7), by="source"
    ).collect()
    key = lambda rows: {r["source"]: (r["n_rows"], r["n_bytes"], r["checksum"])
                        for r in rows}
    assert key(base) == key(shuffled)
    total_rows = sum(r["n_rows"] for r in base)
    assert total_rows == documents.count()


def test_pair_hash_catches_mispairing(spark):
    a = spark.createDataFrame(
        [(1, "alpha", "s"), (2, "beta", "s")],
        "doc_id long, text string, shard string",
    )
    # same ids, same multiset of texts — but swapped pairing
    b = spark.createDataFrame(
        [(1, "beta", "s"), (2, "alpha", "s")],
        "doc_id long, text string, shard string",
    )
    ca = export_manifest(a).first()
    cb = export_manifest(b).first()
    assert (ca["n_rows"], ca["n_bytes"]) == (cb["n_rows"], cb["n_bytes"])
    assert ca["checksum"] != cb["checksum"]


def test_diff_status_taxonomy(spark, documents):
    manifest = export_manifest(documents, by="source")
    # unchanged data -> every shard ok
    ok = manifest_diff(documents, manifest, by="source")
    assert {r["status"] for r in ok.collect()} == {"ok"}
    # corrupt one row's text, drop one source, invent a new one
    srcs = sorted(r["source"] for r in manifest.select("source").collect())
    victim, dropped = srcs[0], srcs[1]
    mutated = (
        documents.filter(F.col("source") != dropped)
        .withColumn(
            "text",
            F.when(
                (F.col("source") == victim)
                & (F.col("doc_id")
                   == documents.filter(F.col("source") == victim)
                   .agg(F.min("doc_id")).first()[0]),
                F.concat(F.col("text"), F.lit("!CORRUPT")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            spark.createDataFrame(
                [(999_999, "injected", "lang", "GHOST", 8)],
                documents.schema.simpleString().replace("struct<", "")
                .rstrip(">").replace(":", " "),
            )
        )
    )
    st = {r["source"]: r["status"]
          for r in manifest_diff(mutated, manifest, by="source").collect()}
    assert st[victim] == "mismatch"
    assert st[dropped] == "missing"
    assert st["GHOST"] == "extra"
    assert all(v == "ok" for k, v in st.items()
               if k not in (victim, dropped, "GHOST"))


def test_null_text_and_stage_wiring(spark, documents):
    df = spark.createDataFrame(
        [(1, None, "s"), (2, "", "s")],
        "doc_id long, text string, shard string",
    )
    m = export_manifest(df).first()
    # null hashes as '' and adds 0 bytes: two rows, zero bytes, and the
    # two identical pair-hash inputs differ only by id
    assert m["n_rows"] == 2 and m["n_bytes"] == 0

    from config_driven_pyspark_spark import Pipeline

    out = Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": f"{SF_DIR}/documents.parquet", "name": "docs"},
        {"stage": "corpus", "op": "manifest", "by": "source",
         "id_col": "doc_id", "name": "m"},
        {"stage": "corpus", "op": "manifest_diff", "by": "source",
         "id_col": "doc_id", "manifest": "m", "input": "docs"},
    ]).run(spark)
    assert {r["status"] for r in out.collect()} == {"ok"}


def test_manifest_merge_monoid(spark, documents):
    from config_driven_pyspark_spark.operators.integrity import (
        manifest_merge,
    )

    whole = {r["source"]: (r["n_rows"], r["n_bytes"], r["checksum"])
             for r in export_manifest(documents, by="source").collect()}
    parts = [export_manifest(documents.filter(f"doc_id % 3 = {i}"),
                             by="source") for i in range(3)]
    merged = {r["source"]: (r["n_rows"], r["n_bytes"], r["checksum"])
              for r in manifest_merge(*parts).collect()}
    assert merged == whole
    # single-input merge is the identity
    one = {r["source"]: (r["n_rows"], r["n_bytes"], r["checksum"])
           for r in manifest_merge(parts[0]).collect()}
    base = {r["source"]: (r["n_rows"], r["n_bytes"], r["checksum"])
            for r in parts[0].collect()}
    assert one == base
    import pytest as _pt
    with _pt.raises(ValueError, match="at least one"):
        manifest_merge()
