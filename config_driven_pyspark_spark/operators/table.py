"""Mutable-table maintenance over plain parquet — MERGE/upsert.

Capability gap vs the reference (SURVEY.md §2C sinks): production
pipelines apply CDC batches (upserts + deletes) to large snapshots.
Table formats (Delta/Iceberg/Hudi) ship this as MERGE INTO but live in
external packages (gated in sources/readers.py); this operator provides
the core semantics engine-native over plain parquet directories, with
the same crash-safe atomic-swap discipline as
``similarity.ivf_compact_index``:

- rewrite goes to a sibling staging directory,
- the staged snapshot is row-count-verified BEFORE the swap (a short
  write can never replace a good snapshot),
- the swap is two FS renames with rollback on failure,
- debris from a crashed earlier merge is cleared up front.

Semantics = the common MERGE INTO subset: match on ``keys``; matched
rows are replaced by the source row (update-all), unmatched source rows
insert, and rows whose ``delete_col`` is true delete (matched) or are
ignored (unmatched). Source keys must be unique — multiple source rows
matching one target row is the same ambiguity Delta's MERGE rejects,
and it raises here too.

Scale: one anti-join of the snapshot against the batch keys (CDC
batches are small next to snapshots — AQE broadcasts the build side
from runtime stats) + one union + one partitioned write. The snapshot
never collects; stats actions (counts) are aggregate-only jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration())


def merge_upsert(
    source: DataFrame,
    target_path: str,
    keys: list[str],
    delete_col: str | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Apply ``source`` (a CDC batch) to the parquet snapshot at
    ``target_path`` and atomically swap in the merged snapshot.
    Returns the merge stats dict
    ``{n_before, n_matched, n_updated, n_inserted, n_deleted, n_after}``
    (every CDC job reports these; each is one aggregate-only action).

    A missing target bootstraps from the batch's non-delete rows — the
    day-zero case."""
    from config_driven_pyspark_spark.operators.similarity import _fs_exists

    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    spark = source.sparkSession
    for k in keys:
        if k not in source.columns:
            raise ValueError(f"source is missing key column {k!r}")
    n_src = source.count()
    n_src_keys = source.select(*keys).distinct().count()
    if n_src_keys != n_src:
        raise ValueError(
            f"source has {n_src - n_src_keys} duplicate key rows — a "
            "target row would match more than one source row (the MERGE "
            "ambiguity); dedupe the batch first"
        )
    if delete_col is not None:
        deletes = source.filter(
            F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
        upserts = source.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    else:
        deletes = None
        upserts = source

    jvm, fs = _fs(spark, target_path)
    staging = f"{target_path.rstrip('/')}__staging"
    backup = f"{target_path.rstrip('/')}__premerge"
    for stale in (staging, backup):  # debris from a crashed earlier merge
        fs.delete(jvm.org.apache.hadoop.fs.Path(stale), True)

    if not _fs_exists(spark, target_path):
        n_ins = upserts.count()
        writer = upserts.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target_path)
        return {"n_before": 0, "n_matched": 0, "n_updated": 0,
                "n_inserted": n_ins, "n_deleted": 0, "n_after": n_ins}

    target = spark.read.parquet(target_path)
    missing = [c for c in target.columns if c not in upserts.columns]
    if missing:
        raise ValueError(
            f"source is missing target columns {missing} — update-all "
            "MERGE replaces whole rows, so the batch must carry the full "
            "schema"
        )
    src_keys = source.select(*keys)
    n_before = target.count()
    n_matched = target.join(src_keys, keys, "left_semi").count()
    n_deleted = (
        target.join(deletes.select(*keys), keys, "left_semi").count()
        if deletes is not None else 0
    )
    n_updated = n_matched - n_deleted
    n_inserted = n_src - n_matched - (
        (deletes.count() - n_deleted) if deletes is not None else 0
    )
    survivors = target.join(src_keys, keys, "left_anti")
    merged = survivors.unionByName(
        upserts.select(*target.columns), allowMissingColumns=False
    )
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    n_after = spark.read.parquet(staging).count()
    expected = n_before - n_matched + n_updated + n_inserted
    if n_after != expected:
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
        raise ValueError(
            f"merge staged {n_after} rows but {expected} were expected "
            f"({n_before} - {n_matched} matched + {n_updated} updates + "
            f"{n_inserted} inserts) — aborted, snapshot untouched"
        )
    p_target = jvm.org.apache.hadoop.fs.Path(target_path)
    if not fs.rename(p_target, jvm.org.apache.hadoop.fs.Path(backup)):
        raise IOError(f"could not move aside {target_path}")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(staging), p_target):
        fs.rename(jvm.org.apache.hadoop.fs.Path(backup), p_target)
        raise IOError(f"could not swap merged snapshot into {target_path!r}")
    fs.delete(jvm.org.apache.hadoop.fs.Path(backup), True)
    return {"n_before": n_before, "n_matched": n_matched,
            "n_updated": n_updated, "n_inserted": n_inserted,
            "n_deleted": n_deleted, "n_after": n_after}


def stage_merge(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "merge", "path": ..., "keys": [...],
    "delete_col": name?, "partition_by": [...]?}`` — ``df`` is the CDC
    batch; applies it to the snapshot and returns the POST-merge
    snapshot so downstream stages read the new table state."""
    merge_upsert(
        df, spec["path"], list(spec["keys"]),
        spec.get("delete_col"), spec.get("partition_by"),
    )
    return df.sparkSession.read.parquet(spec["path"])
