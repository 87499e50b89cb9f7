"""Synthesize an sf1 directory (10x sf0.1) for the scaling audit.

The driver ships sf0.001/0.01/0.1 only; VERDICT r10 ask #3 wants the
top-10 most expensive bench rows measured once at 10x rows so
super-linear scaling shows up in data, not guesses. A naive 10x
replication would measure the WRONG workload for similarity/dedup
queries — identical copies are near-duplicates of each other, so pair
counts would grow quadratically across copies. Each copy k is therefore
DECORRELATED:

- documents: doc_id shifted; text passed through a per-copy letter
  substitution (alphabet rotated by k via ``translate``) — lengths,
  token counts, whitespace structure and per-doc statistics are
  preserved exactly, but shingles/tokens are disjoint across copies, so
  dedup clusters stay within a copy and pair counts scale linearly
  (what a real 10x corpus does);
- embeddings: vec_id shifted; the vector dimension-rotated by k
  (norms and the coordinate distribution preserved, neighborhoods
  changed, so ANN postings grow ~linearly per cell);
- events: event_id/user_id shifted (10x groups, same per-group sizes);
- TPC-H tables: primary AND foreign keys shifted together so joins
  stay consistent; nation/region stay single copies (dimensions don't
  scale with the fact tables in TPC-H either).

Usage: python scripts/make_sf1.py [/tmp/sf1]
"""

from __future__ import annotations

import os
import string
import sys

from pyspark.sql import DataFrame, SparkSession, functions as F

COPIES = 10
OFF = 100_000_000  # key shift per copy; far above any sf0.1 key


def _rot(s: str, k: int) -> str:
    return s[k:] + s[:k]


def _copy(df: DataFrame, k: int, table: str) -> DataFrame:
    if table == "documents":
        lower, upper = string.ascii_lowercase, string.ascii_uppercase
        out = df.withColumn("doc_id", F.col("doc_id") + F.lit(k * OFF))
        if k:
            out = out.withColumn(
                "text",
                F.translate(
                    "text", lower + upper, _rot(lower, k) + _rot(upper, k)
                ),
            )
        return out
    if table == "embeddings":
        out = df.withColumn("vec_id", F.col("vec_id") + F.lit(k * OFF))
        if k:
            out = out.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), k + 1,
                            F.size("embedding") - k),
                    F.slice(F.col("embedding"), 1, k),
                ),
            )
        return out
    shifts = {
        "events": ["event_id", "user_id"],
        "customer": ["c_custkey", "c_nationkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey", "s_nationkey"],
    }[table]
    for c in shifts:
        if c.endswith("nationkey"):
            continue  # nation is a single-copy dimension — don't shift
        df = df.withColumn(c, F.col(c) + F.lit(k * OFF))
    return df


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src = os.environ.get("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    import glob
    import shutil

    os.makedirs(dest, exist_ok=True)

    def write_single_file(df, table: str) -> None:
        # the driver testdata ships each table as ONE parquet FILE (some
        # fixtures open it with pyarrow directly); a Spark directory
        # breaks them — write one part and move it into place. Parquet
        # row groups keep a single big file splittable for 32-core scans.
        tmp = f"{dest}/__tmp_{table}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        final = f"{dest}/{table}.parquet"
        if os.path.isdir(final):
            shutil.rmtree(final)
        shutil.move(part, final)
        shutil.rmtree(tmp)

    for table in ["region", "nation"]:
        write_single_file(
            spark.read.parquet(f"{src}/{table}.parquet"), table
        )
    for table in ["documents", "embeddings", "events", "customer",
                  "orders", "lineitem", "part", "supplier"]:
        base = spark.read.parquet(f"{src}/{table}.parquet")
        out = _copy(base, 0, table)
        for k in range(1, COPIES):
            out = out.unionByName(_copy(base, k, table))
        write_single_file(out, table)
        print(table, spark.read.parquet(f"{dest}/{table}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
