"""A/B: read-side cost of a deletion-vector trickle, before/after coalesce.

Builds an orders snapshot at $SPARK_GRAFT_SF_DIR (default sf0.1), applies
N_TRICKLE merge-on-read deletes (one tiny vector dir each — the daily
GDPR-batch shape), then measures the DV-aware read (`read_table` → full
aggregate) three ways:

  A. N_TRICKLE pending vectors (one `_deletes/dv_*` dir per delete)
  B. after `coalesce_deletes` (ONE vector dir, no data rewrite)
  C. after `materialize_deletes` (no vectors, files rewritten)

Prints one JSON line with wall times, vector-dir counts, and the
logical row count (identical across arms — the correctness anchor).
Run on a quiet host; results feed PLANS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRICKLE = int(os.environ.get("AB_TRICKLE", "50"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from config_driven_pyspark_spark.operators.deletes import (
        _dv_root,
        _list_dv,
        coalesce_deletes,
        delete_where_dv,
        materialize_deletes,
        read_table,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("ab-dv-coalesce")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = f"/tmp/cdp_ab_coalesce_{os.path.basename(sf_dir.rstrip('/'))}"
    for d in (base, base + "__lock.d", base + "__history"):
        shutil.rmtree(d, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(base)

    def timed_read() -> tuple[float, int]:
        t0 = time.perf_counter()
        n = (
            read_table(spark, base)
            .agg(F.count("*"), F.sum("o_orderkey"))
            .collect()[0][0]
        )
        return round(time.perf_counter() - t0, 3), int(n)

    t0 = time.perf_counter()
    for i in range(N_TRICKLE):
        delete_where_dv(
            spark, base, f"o_orderkey % {4 * N_TRICKLE} = {4 * i}",
            ["o_orderstatus"],
        )
    t_trickle = round(time.perf_counter() - t0, 3)

    n_dirs_a = len(_list_dv(spark, _dv_root(base)))
    # min-of-3: same discipline as bench.py
    reads_a = [timed_read() for _ in range(3)]
    t0 = time.perf_counter()
    stats = coalesce_deletes(spark, base, ["o_orderstatus"])
    t_coalesce = round(time.perf_counter() - t0, 3)
    n_dirs_b = len(_list_dv(spark, _dv_root(base)))
    reads_b = [timed_read() for _ in range(3)]
    t0 = time.perf_counter()
    materialize_deletes(spark, base, ["o_orderstatus"])
    t_mat = round(time.perf_counter() - t0, 3)
    reads_c = [timed_read() for _ in range(3)]

    counts = {r[1] for r in reads_a + reads_b + reads_c}
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_trickle": N_TRICKLE,
        "t_trickle_deletes": t_trickle,
        "vector_dirs_before": n_dirs_a,
        "vector_dirs_after_coalesce": n_dirs_b,
        "n_tombstones": stats["n_tombstones"],
        "t_coalesce": t_coalesce,
        "t_materialize": t_mat,
        "read_s_trickle": min(r[0] for r in reads_a),
        "read_s_coalesced": min(r[0] for r in reads_b),
        "read_s_materialized": min(r[0] for r in reads_c),
        "logical_rows_consistent": len(counts) == 1,
        "logical_rows": counts.pop(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
