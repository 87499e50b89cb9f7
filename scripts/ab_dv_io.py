#!/usr/bin/env python
"""A/B deletion vectors vs copy-on-write (VERDICT r13 ask #1
Done-criterion): bytes WRITTEN by a small DELETE, at sf1.

Builds a status-partitioned snapshot from sf1 orders, then deletes the
same tiny key slice twice — arm A merge-on-read (writes a positional
tombstone sidecar), arm B copy-on-write (rewrites the touched
partition). Bytes written = total size of files that exist after the
op but not before (new data files + sidecars), which is
load-independent — a pure physics measurement. The CoW arm's touched
partition holds ~1/3 of the table, so the expected ratio is
tombstone-KBs vs partition-GBs-scale.

Usage: python scripts/ab_dv_io.py [sf_dir] (default /tmp/sf1)
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_files(root: str) -> dict[str, int]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            try:
                out[p] = os.path.getsize(p)
            except OSError:
                pass
    return out


def written(before: dict[str, int], after: dict[str, int]) -> int:
    return sum(sz for p, sz in after.items() if p not in before)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from pyspark.sql import functions as F

    from config_driven_pyspark_spark import build_session
    from config_driven_pyspark_spark.operators.deletes import (
        materialize_deletes,
        read_table,
    )
    from config_driven_pyspark_spark.operators.table import delete_where

    spark = build_session(
        app_name="ab-dv-io", master="local[16]", shuffle_partitions=16,
        confs={"spark.driver.memory": "16g", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    results = {}
    for arm, mode in (("A_dv", "merge_on_read"), ("B_cow", "copy_on_write")):
        tgt = f"/tmp/ab_dv_{arm}"
        shutil.rmtree(tgt, ignore_errors=True)
        orders.write.partitionBy("o_orderstatus").parquet(tgt)
        n = spark.read.parquet(tgt).count()
        cond = "o_orderstatus = 'P' AND o_orderkey % 9973 = 1"
        before = tree_files(tgt)
        t0 = time.time()
        stats = delete_where(
            spark, tgt, cond, ["o_orderstatus"], mode=mode
        )
        dt = time.time() - t0
        after = tree_files(tgt)
        wb = written(before, after)
        survivors = read_table(spark, tgt).count()
        assert survivors == n - stats["n_matched"], (survivors, n, stats)
        results[arm] = {
            "rows": n, "deleted": stats["n_matched"],
            "bytes_written": wb, "seconds": round(dt, 2),
            "rewrite": stats["rewrite"],
        }
        print(arm, results[arm], flush=True)
        if arm == "A_dv":
            # and the materialization arm: absorbing the vector pays the
            # partition rewrite ONCE, later (the Delta deferral contract)
            before_m = tree_files(tgt)
            t0 = time.time()
            m = materialize_deletes(spark, tgt, ["o_orderstatus"])
            results["A_materialize"] = {
                "bytes_written": written(before_m, tree_files(tgt)),
                "seconds": round(time.time() - t0, 2),
                "rewrite": m["rewrite"],
            }
            print("A_materialize", results["A_materialize"], flush=True)
    ratio = results["A_dv"]["bytes_written"] / max(
        1, results["B_cow"]["bytes_written"]
    )
    print(f"\nDV delete writes {results['A_dv']['bytes_written']:,} B vs "
          f"CoW {results['B_cow']['bytes_written']:,} B = {ratio:.6f}x "
          f"({results['A_dv']['deleted']} rows deleted of "
          f"{results['A_dv']['rows']:,})")
    spark.stop()


if __name__ == "__main__":
    main()
