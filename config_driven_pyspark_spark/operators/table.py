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


def _stage_verify_swap(
    df: DataFrame,
    target_path: str,
    expected_rows: int,
    partition_by: list[str] | None,
    breakdown: str,
) -> int:
    """Write ``df`` to the sibling staging dir, verify the staged row
    count equals ``expected_rows`` (a short write can never replace a
    good snapshot), then atomically swap staging into ``target_path``
    via two FS renames with rollback. Returns the staged count. The
    caller must have cleared staging/backup debris first."""
    spark = df.sparkSession
    jvm, fs = _fs(spark, target_path)
    staging = f"{target_path.rstrip('/')}__staging"
    backup = f"{target_path.rstrip('/')}__premerge"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    n_after = spark.read.parquet(staging).count()
    if n_after != expected_rows:
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
        raise ValueError(
            f"merge staged {n_after} rows but {expected_rows} were "
            f"expected {breakdown} — aborted, snapshot untouched"
        )
    p_target = jvm.org.apache.hadoop.fs.Path(target_path)
    if not fs.rename(p_target, jvm.org.apache.hadoop.fs.Path(backup)):
        raise IOError(f"could not move aside {target_path}")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(staging), p_target):
        fs.rename(jvm.org.apache.hadoop.fs.Path(backup), p_target)
        raise IOError(f"could not swap merged snapshot into {target_path!r}")
    fs.delete(jvm.org.apache.hadoop.fs.Path(backup), True)
    return n_after


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
    # one aggregate-only job for the batch stats (count + distinct keys
    # + deletes together — never three passes over the batch)
    src_stats = source.agg(
        F.count("*").alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("n_keys"),
        (
            F.sum(
                F.coalesce(F.col(delete_col), F.lit(False)).cast("long")
            ) if delete_col is not None else F.lit(0)
        ).alias("n_del"),
    ).collect()[0]
    n_src, n_src_keys = int(src_stats["n"]), int(src_stats["n_keys"])
    n_del_total = int(src_stats["n_del"] or 0)
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
    # one snapshot pass for n_before / n_matched / n_deleted together:
    # a left join against the (small, AQE-broadcast) batch keys + one
    # aggregate — never three separate snapshot scans
    probe = source.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        (
            F.coalesce(F.col(delete_col), F.lit(False))
            if delete_col is not None else F.lit(False)
        ).alias("__del"),
    )
    tgt_stats = target.join(
        probe,
        [F.col(k).eqNullSafe(F.col(f"__k_{k}")) for k in keys],
        "left",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("__del").isNotNull().cast("long")).alias("n_m"),
        F.sum(F.coalesce(F.col("__del"), F.lit(False)).cast("long")).alias(
            "n_d"
        ),
    ).collect()[0]
    n_before = int(tgt_stats["n"])
    n_matched = int(tgt_stats["n_m"] or 0)
    n_deleted = int(tgt_stats["n_d"] or 0)
    n_updated = n_matched - n_deleted
    n_inserted = n_src - n_matched - (n_del_total - n_deleted)
    survivors = target.join(src_keys, keys, "left_anti")
    merged = survivors.unionByName(
        upserts.select(*target.columns), allowMissingColumns=False
    )
    expected = n_before - n_matched + n_updated + n_inserted
    n_after = _stage_verify_swap(
        merged, target_path, expected, partition_by,
        f"({n_before} - {n_matched} matched + {n_updated} updates + "
        f"{n_inserted} inserts)",
    )
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


def scd2_merge(
    source: DataFrame,
    target_path: str,
    keys: list[str],
    ts_col: str = "effective_ts",
    delete_col: str | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Type-2 slowly-changing-dimension merge over plain parquet — the
    versioned counterpart of :func:`merge_upsert` (the warehouse-classic
    history-keeping upsert):

    - the snapshot carries every business column plus ``valid_from``,
      ``valid_to`` (NULL = open) and ``is_current``;
    - a CHANGED matched row closes the current version
      (``valid_to`` = the batch row's ``ts_col``, ``is_current`` false)
      and appends the new version;
    - an UNCHANGED matched row is a no-op (standard SCD2 change
      detection — re-delivered identical rows create no versions);
    - an unmatched row inserts as a new current version;
    - a ``delete_col``-flagged matched row closes without a successor;
    - closed history rows are never touched.

    ``source`` must carry the business columns plus ``ts_col`` (the
    per-row effective time of the change). A missing target bootstraps
    from the batch (day zero). Source keys must be unique per batch
    (same MERGE ambiguity contract as :func:`merge_upsert`).

    Change detection is a null-safe struct comparison over every
    business column (``<=>`` recurses into struct fields), JVM-side.

    Scale: the history partition is touched only by the final union
    (never joined); the current partition joins the batch once
    (full-outer on keys — AQE broadcasts the CDC side from runtime
    stats); one partitioned rewrite with the row-count-verified atomic
    swap. At very large history sizes, partition the snapshot by
    ``is_current`` (pass ``partition_by=["is_current"]``) so readers of
    the current view prune the history files entirely."""
    from config_driven_pyspark_spark.operators.similarity import _fs_exists

    if not keys:
        raise ValueError("scd2_merge needs at least one key column")
    spark = source.sparkSession
    meta = {"valid_from", "valid_to", "is_current"}
    for c in (*keys, ts_col):
        if c not in source.columns:
            raise ValueError(f"source is missing column {c!r}")
    if meta & set(source.columns):
        raise ValueError(
            f"source must not carry the SCD2 metadata columns "
            f"{sorted(meta & set(source.columns))} — the merge owns them"
        )
    batch_stats = source.agg(
        F.count("*").alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("n_keys"),
    ).collect()[0]
    n_src = int(batch_stats["n"])
    if int(batch_stats["n_keys"]) != n_src:
        raise ValueError(
            "source has duplicate key rows — one key would version "
            "more than once in a single batch; split the batch by "
            "effective time first"
        )
    if delete_col is not None:
        is_del = F.coalesce(F.col(delete_col), F.lit(False))
        deletes = source.filter(is_del).drop(delete_col)
        upserts = source.filter(~is_del).drop(delete_col)
    else:
        deletes = None
        upserts = source
    biz = [c for c in upserts.columns if c != ts_col and c not in keys]

    jvm, fs = _fs(spark, target_path)
    for stale in (f"{target_path.rstrip('/')}__staging",
                  f"{target_path.rstrip('/')}__premerge"):
        fs.delete(jvm.org.apache.hadoop.fs.Path(stale), True)

    def as_version(df: DataFrame) -> DataFrame:
        return df.select(
            *keys, *biz,
            F.col(ts_col).alias("valid_from"),
            F.lit(None).cast(df.schema[ts_col].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    if not _fs_exists(spark, target_path):
        boot = as_version(upserts)
        n = boot.count()
        # bootstrap has no prior snapshot to swap aside — plain write
        writer = boot.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target_path)
        return {"n_closed": 0, "n_new_versions": n, "n_unchanged": 0,
                "n_deleted": 0, "n_after": n}

    target = spark.read.parquet(target_path)
    missing = [c for c in (*keys, *biz, *meta) if c not in target.columns]
    if missing:
        raise ValueError(
            f"target snapshot is missing columns {missing} — not an SCD2 "
            "table produced by scd2_merge"
        )
    history = target.filter(~F.col("is_current"))
    current = target.filter(F.col("is_current"))

    src_all = (
        upserts.withColumn("__del", F.lit(False)).unionByName(
            deletes.withColumn("__del", F.lit(True))
        ) if deletes is not None
        else upserts.withColumn("__del", F.lit(False))
    )
    s = src_all.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in biz],
        F.col(ts_col).alias("__ts"),
        "__del",
    )
    joined = current.join(
        s, [F.col(k).eqNullSafe(F.col(f"__k_{k}")) for k in keys],
        "full_outer",
    )
    matched = F.col("__ts").isNotNull() & F.col("is_current").isNotNull()
    changed = matched & ~F.struct(*[F.col(c) for c in biz]).eqNullSafe(
        F.struct(*[F.col(f"__s_{c}") for c in biz])
    )
    closing = matched & (changed | F.col("__del"))

    # two aggregate-only jobs for ALL the stats: one over the snapshot
    # (total + current together), one over the probe join (closed /
    # deleted / unchanged together) — never five separate scans
    tgt_stats = target.agg(
        F.count("*").alias("n"),
        F.sum(F.col("is_current").cast("long")).alias("n_cur"),
    ).collect()[0]
    n_current = int(tgt_stats["n_cur"] or 0)
    n_history = int(tgt_stats["n"]) - n_current
    j_stats = joined.agg(
        F.sum(closing.cast("long")).alias("n_closed"),
        F.sum((matched & F.col("__del")).cast("long")).alias("n_del"),
        F.sum(
            (matched & ~changed & ~F.col("__del")).cast("long")
        ).alias("n_same"),
    ).collect()[0]
    n_closed = int(j_stats["n_closed"] or 0)
    n_deleted = int(j_stats["n_del"] or 0)
    n_unchanged = int(j_stats["n_same"] or 0)

    kept_current = joined.filter(
        F.col("__ts").isNull() | (matched & ~changed & ~F.col("__del"))
    ).select(*keys, *biz, "valid_from", "valid_to", "is_current")
    closed = joined.filter(closing).select(
        *keys, *biz, "valid_from",
        F.col("__ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    new_versions = joined.filter(
        ~F.col("__del") & F.col("__ts").isNotNull()
        & (F.col("is_current").isNull() | changed)
    ).select(
        *[F.coalesce(F.col(f"__k_{k}"), F.col(k)).alias(k) for k in keys],
        *[F.col(f"__s_{c}").alias(c) for c in biz],
        F.col("__ts").alias("valid_from"),
        F.lit(None).cast(joined.schema["__ts"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    n_new = n_src - (deletes.count() if deletes is not None else 0) \
        - n_unchanged
    merged = history.unionByName(kept_current).unionByName(
        closed
    ).unionByName(new_versions)
    expected = n_history + n_current + n_new
    n_after = _stage_verify_swap(
        merged, target_path, expected, partition_by,
        f"({n_history} history + {n_current} current + {n_new} new "
        "versions)",
    )
    return {"n_closed": n_closed, "n_new_versions": n_new,
            "n_unchanged": n_unchanged, "n_deleted": n_deleted,
            "n_after": n_after}


def stage_scd2(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "scd2", "path": ..., "keys": [...], "ts_col": ...,
    "delete_col": name?, "partition_by": [...]?}`` — ``df`` is the CDC
    batch; returns the post-merge versioned snapshot."""
    scd2_merge(
        df, spec["path"], list(spec["keys"]),
        spec.get("ts_col", "effective_ts"),
        spec.get("delete_col"), spec.get("partition_by"),
    )
    return df.sparkSession.read.parquet(spec["path"])


_MONOID_COMBINE = {
    "sum": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "min": lambda a, b: F.least(a, b),
    "max": lambda a, b: F.greatest(a, b),
}


def incremental_agg(
    batch: DataFrame,
    target_path: str,
    keys: list[str],
    aggs: dict[str, str],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Incremental materialized aggregate — maintain a persisted groupBy
    result by FOLDING each new batch's partial aggregates into the
    stored table, never rescanning history (the classic materialized-
    view maintenance move: at 100 TB of history a refresh costs one
    batch scan + one snapshot-sized merge, not a re-aggregation).

    ``aggs`` maps output column -> ``"fn(expr)"`` where fn is a MONOID
    whose partials combine losslessly: ``sum``, ``count`` (combines by
    +), ``min`` (least), ``max`` (greatest). Non-monoid aggregates
    (avg, distinct counts, percentiles) are rejected with the fix
    spelled out — store sum+count and derive avg at read time. Batches
    must be DISJOINT slices of the fact stream (at-most-once delivery;
    re-folding the same batch double-counts — the same single-writer
    contract as :func:`merge_upsert`).

    Returns the post-fold aggregate snapshot. Same row-count-verified
    atomic-swap write as the other table maintainers."""
    import re as _re

    from config_driven_pyspark_spark.operators.similarity import _fs_exists

    if not keys or not aggs:
        raise ValueError("incremental_agg needs keys and aggs")
    combiners = {}
    exprs = []
    for out, spec in aggs.items():
        m = _re.match(r"\s*([a-zA-Z_]+)\s*\((.*)\)\s*$", spec)
        fn = m.group(1).lower() if m else None
        if fn not in _MONOID_COMBINE:
            raise ValueError(
                f"incremental_agg only folds monoid aggregates "
                f"{sorted(_MONOID_COMBINE)}; {out!r} uses {spec!r} — for "
                "avg store sum+count and divide at read time; distinct "
                "counts and percentiles need sketches (approx_sketches)"
            )
        combiners[out] = _MONOID_COMBINE[fn]
        exprs.append(F.expr(spec).alias(out))
    partial = batch.groupBy(*[F.col(k) for k in keys]).agg(*exprs)

    spark = batch.sparkSession
    jvm, fs = _fs(spark, target_path)
    for stale in (f"{target_path.rstrip('/')}__staging",
                  f"{target_path.rstrip('/')}__premerge"):
        fs.delete(jvm.org.apache.hadoop.fs.Path(stale), True)
    if not _fs_exists(spark, target_path):
        writer = partial.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target_path)
        return spark.read.parquet(target_path)

    stored = spark.read.parquet(target_path)
    missing = [c for c in (*keys, *aggs) if c not in stored.columns]
    if missing:
        raise ValueError(
            f"stored aggregate at {target_path!r} is missing columns "
            f"{missing} — not a snapshot produced by this aggs spec"
        )
    p = partial.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__p_{c}") for c in aggs],
    )
    folded = stored.join(
        p, [F.col(k).eqNullSafe(F.col(f"__k_{k}")) for k in keys],
        "full_outer",
    ).select(
        *[F.coalesce(F.col(k), F.col(f"__k_{k}")).alias(k) for k in keys],
        *[
            F.when(
                F.col(f"__p_{c}").isNull(), F.col(c)
            ).when(
                F.col(c).isNull(), F.col(f"__p_{c}")
            ).otherwise(
                combiners[c](F.col(c), F.col(f"__p_{c}"))
            ).alias(c)
            for c in aggs
        ],
    )
    # expected rows = stored keys + batch-partial keys new to the store:
    # one aggregate over the probe join (no extra scans)
    counts = stored.join(
        p, [F.col(k).eqNullSafe(F.col(f"__k_{k}")) for k in keys],
        "full_outer",
    ).agg(
        F.count("*").alias("n"),
    ).collect()[0]
    expected = int(counts["n"])
    _stage_verify_swap(
        folded, target_path, expected, partition_by,
        "(stored keys + first-seen batch keys)",
    )
    return spark.read.parquet(target_path)


def stage_incremental_agg(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "incremental_agg", "path": ..., "keys": [...],
    "aggs": {out: "sum(expr)" | "count(*)" | "min(expr)" | "max(expr)"},
    "partition_by": [...]?}`` — ``df`` is the new fact batch; returns
    the post-fold aggregate snapshot."""
    return incremental_agg(
        df, spec["path"], list(spec["keys"]), dict(spec["aggs"]),
        spec.get("partition_by"),
    )
