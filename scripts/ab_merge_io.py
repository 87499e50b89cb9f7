#!/usr/bin/env python
"""A/B the scoped merge's PROBE read bytes with and without the
_key_stats sidecar (VERDICT r11 ask #4 Done-criterion).

Builds a key-sorted snapshot from sf1 orders — partitioned by an
ingest-bucket column that is NOT a match key, each partition holding a
disjoint o_orderkey range (the classic CDC layout: partition by ingest
date, monotonically increasing keys) — then applies one small CDC batch
whose keys live in a single partition's range:

  arm A: sidecar present (seeded by the merge bootstrap) — the probe
         reads only the intersecting partition(s);
  arm B: sidecar deleted first — the probe scans every partition's key
         columns (the r11 behavior).

Read bytes are the JVM's actual read-syscall volume (/proc/<pid>/io
rchar — Spark's local-mode input metrics miss the vectorized parquet
reader's positioned reads), delta around each merge call.

Usage: python scripts/ab_merge_io.py [sf_dir] (default /tmp/sf1)
"""
import shutil
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from config_driven_pyspark_spark.operators.table import (  # noqa: E402
    _delete_key_stats, merge_upsert,
)

def jvm_read_bytes(spark) -> int:
    pid = spark._jvm.java.lang.ProcessHandle.current().pid()
    with open(f"/proc/{pid}/io") as f:
        return int(
            [ln for ln in f if ln.startswith("rchar")][0].split()[1]
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 75_000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).withColumn(
        # ingest bucket: NOT a key, disjoint key range per partition
        "ingest", F.format_string(
            "b%03d", (F.col("o_orderkey") / bucket).cast("int")
        ),
    )
    n_parts = orders.select("ingest").distinct().count()

    results = {}
    for arm in ("sidecar", "full_probe"):
        target = f"/tmp/ab_merge_io_{arm}"
        shutil.rmtree(target, ignore_errors=True)
        merge_upsert(orders, target, ["o_orderkey"],
                     partition_by=["ingest"])  # bootstrap (seeds stats)
        if arm == "full_probe":
            _delete_key_stats(spark, target)
        # materialize the CDC batch as its own small file (as a real
        # stream delivers it) so neither arm pays a source-table scan
        orders.filter(
            F.col("o_orderkey").between(100_000, 101_000)
        ).withColumn("o_orderpriority", F.lit("X-AB")).coalesce(
            1
        ).write.mode("overwrite").parquet("/tmp/ab_merge_io_batch")
        batch = spark.read.parquet("/tmp/ab_merge_io_batch")
        n_batch = batch.count()
        b0, t0 = jvm_read_bytes(spark), time.time()
        stats = merge_upsert(batch, target, ["o_orderkey"],
                             partition_by=["ingest"])
        dt = time.time() - t0
        db = jvm_read_bytes(spark) - b0
        assert stats["rewrite"] == "partition", stats
        results[arm] = (db, dt)
        print(f"{arm:>10}: {db/1e6:8.1f} MB read  {dt:6.2f}s  "
              f"(batch {n_batch} rows, {stats['n_matched']} matched, "
              f"{n_parts} partitions)")
    a, b = results["sidecar"][0], results["full_probe"][0]
    print(f"read-bytes ratio sidecar/full: {a/b:.3f} "
          f"({n_parts} partitions, 1 touched)")


if __name__ == "__main__":
    main()
