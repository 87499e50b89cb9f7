#!/usr/bin/env python
"""A/B the _file_stats FILE-level data skipping (VERDICT r12 ask #1
Done-criterion): read bytes INSIDE one hot partition with and without
per-file key ranges.

Builds an 8-bucket snapshot from sf1 orders (bucket = o_orderkey DIV
width — NOT a match key), merge-bootstraps it (seeds _key_stats +
_file_stats), then compacts each bucket into ~8 RANGE-DISJOINT files
sorted by o_orderkey (compaction keeps the file sidecar current). Both
arms then run reads whose partition-level pruning is IDENTICAL (the
_key_stats sidecar stays in place), so any delta is purely intra-
partition file skipping:

  scan arm A: _file_stats present — the range read opens only the
              intersecting file(s) of the hot bucket;
  scan arm B: _file_stats deleted — the same read opens every file of
              the hot bucket (the r12 behavior);
  probe arm A/B: one narrow CDC merge batch per arm (distinct keys,
              same hot bucket) — the probe half of the same skipping.

Read bytes are the JVM's actual read-syscall volume (/proc/<pid>/io
rchar — Spark's local-mode input metrics miss the vectorized parquet
reader's positioned reads), delta around each call.

Usage: python scripts/ab_file_skip_io.py [sf_dir] (default /tmp/sf1)
"""
import math
import shutil
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from config_driven_pyspark_spark.operators.table import (  # noqa: E402
    _delete_file_stats, _read_file_stats, compact_table, merge_upsert,
    scan_table,
)


def jvm_read_bytes(spark) -> int:
    pid = spark._jvm.java.lang.ProcessHandle.current().pid()
    with open(f"/proc/{pid}/io") as f:
        return int(
            [ln for ln in f if ln.startswith("rchar")][0].split()[1]
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    maxk = orders.agg(F.max("o_orderkey")).collect()[0][0]
    width = int(math.ceil((maxk + 1) / 8.0))
    df = orders.withColumn(
        "bucket", F.expr(f"CAST(o_orderkey DIV {width} AS INT)")
    )
    target = "/tmp/ab_fskip_target"
    shutil.rmtree(target, ignore_errors=True)
    t0 = time.time()
    # scatter the bootstrap write so every bucket starts with many
    # files (the CDC steady state compaction exists for)
    merge_upsert(
        df.repartition(32), target, ["o_orderkey"],
        partition_by=["bucket"],
    )
    out = compact_table(
        spark, target, ["bucket"], min_files=2, n_files=8,
        sort_within=["o_orderkey"],
    )
    doc = _read_file_stats(spark, target)
    n_entries = len(doc["files"]) if doc else 0
    print(f"build+compact {time.time()-t0:.1f}s rewrite={out['rewrite']} "
          f"files_after={out['files_after']} sidecar_entries={n_entries}")

    # the sf1 key space is sparse (copies offset by 1e8) — derive the
    # probed range from data quantiles so it actually contains rows:
    # ~1% of all rows, well inside one bucket's file set
    q = orders.approxQuantile("o_orderkey", [0.30, 0.31], 0.0001)
    lo, hi = int(q[0]), int(q[1])
    print(f"range read: o_orderkey in [{lo}, {hi}] "
          f"(bucket {lo // width})")

    def scan_arm(tag):
        import os
        from urllib.parse import unquote, urlparse

        b0, w0 = jvm_read_bytes(spark), time.time()
        got = scan_table(
            spark, target, ["bucket"],
            key_between={"o_orderkey": (lo, hi)},
        )
        files = got.inputFiles()
        admitted = sum(
            os.path.getsize(unquote(urlparse(f).path)) for f in files
        )
        n = got.count()
        db, dw = jvm_read_bytes(spark) - b0, time.time() - w0
        # steady-state wall: repeat the pruned read (plan + scan) 3x
        w1 = time.time()
        for _ in range(3):
            scan_table(
                spark, target, ["bucket"],
                key_between={"o_orderkey": (lo, hi)},
            ).count()
        rep = (time.time() - w1) / 3
        print(f"scan {tag}: rows={n} files_opened={len(files)} "
              f"bytes_admitted={admitted/1e6:.1f}MB "
              f"read_bytes={db/1e6:.1f}MB first_wall={dw:.2f}s "
              f"steady_wall={rep:.2f}s")
        return admitted

    a = scan_arm("A (_file_stats present)")
    # keep a copy to restore for the probe arms
    import json
    saved = json.dumps(doc)
    _delete_file_stats(spark, target)
    b = scan_arm("B (_file_stats deleted) ")
    print(f"scan bytes-admitted ratio A/B = {a/b:.3f}")

    # probe arms: a narrow CDC batch whose keys live inside bucket 2
    from config_driven_pyspark_spark.operators.table import (
        _write_file_stats,
    )

    _write_file_stats(spark, target, json.loads(saved))

    def probe_arm(tag, frac):
        # 50 REAL keys from a narrow quantile band: the batch updates
        # rows that exist, all inside one bucket's file set
        ks = orders.approxQuantile(
            "o_orderkey", [frac, frac + 0.002], 0.0001
        )
        keys = [
            r.o_orderkey
            for r in orders.filter(
                F.col("o_orderkey").between(int(ks[0]), int(ks[1]))
            ).limit(50).collect()
        ]
        batch = spark.createDataFrame(
            [(k, "P", "AB", 1.0, int(k // width)) for k in keys],
            "o_orderkey bigint, o_orderstatus string, "
            "o_orderpriority string, o_totalprice double, bucket int",
        )
        b0, w0 = jvm_read_bytes(spark), time.time()
        stats = merge_upsert(
            batch, target, ["o_orderkey"], partition_by=["bucket"],
        )
        db, dw = jvm_read_bytes(spark) - b0, time.time() - w0
        print(f"probe {tag}: matched={stats['n_matched']} "
              f"read_bytes={db/1e6:.1f}MB wall={dw:.2f}s")
        return db

    pa = probe_arm("A (_file_stats present)", 0.50)
    _delete_file_stats(spark, target)
    pb = probe_arm("B (_file_stats deleted) ", 0.60)
    print(f"probe read-bytes ratio A/B = {pa/pb:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
