"""Sink stage — declarative writes.

Scale notes: always write partitioned (``partition_by``) or bucketed
(``bucket_by`` + ``sort_by`` on a saved table) layouts for 100 TB outputs so
downstream reads prune/co-locate; ``repartition`` upstream controls file
count (target ~128 MB–1 GB files). ``mode`` defaults to ``error`` to avoid
accidental overwrite of large outputs.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, functions as F

from config_driven_pyspark_spark.sources.readers import _check_format_available

_Z_BITS = 4  # 16 quantile buckets per column


def z_value(df: DataFrame, cols: list[str]) -> Column:
    """Morton (Z-curve) value over 2+ numeric columns: each column is
    quantile-bucketed to ``_Z_BITS`` bits, then the bucket bits are
    interleaved so rows close in every dimension get close z values.

    The bucket boundaries come from ``approxQuantile`` — a bounded driver
    action (15 doubles per column, sketch-based single pass, the same
    sampling trade RangePartitioner makes) — so the z expression itself is
    pure literal-folded Column arithmetic: fully distributed, no UDF.
    Quantile (not equal-width) bucketing keeps skewed columns from
    collapsing into one bucket. Nulls sort first (bucket 0).
    """
    if len(cols) < 2:
        raise ValueError("z_order_by needs at least 2 columns")
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}

    def as_double(c: str) -> Column:
        t = types.get(c, "")
        if t in numeric or t.startswith("decimal"):
            return F.col(c).cast("double")
        # DATE/TIMESTAMP cannot cast straight to double; go through the
        # epoch instead (day/second resolution is plenty for bucketing)
        if t == "date" or t.startswith("timestamp"):
            return F.col(c).cast("timestamp").cast("double")
        raise ValueError(
            f"z_order_by column {c!r} has type {t!r}; z-ordering needs "
            "an orderable numeric/temporal column"
        )

    probe = df.select(*[as_double(c).alias(c) for c in cols])
    probs = [i / (1 << _Z_BITS) for i in range(1, 1 << _Z_BITS)]
    bounds = dict(zip(cols, probe.approxQuantile(cols, probs, 0.001)))
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        v = as_double(c)
        bucket = F.lit(0)
        for q in bounds[c]:
            bucket = bucket + F.when(v > q, 1).otherwise(0)
        for j in range(_Z_BITS):
            bit = F.shiftright(bucket.cast("bigint"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * len(cols) + i))
    return z


def stage_sink(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "sink", "format": "parquet", "path": ..., "mode":
    "error"|"overwrite"|"append", "partition_by": [cols], "bucket_by":
    {"n": int, "cols": [...]}, "sort_by": [cols],
    "sort_within_partitions": [cols], "table": name?, "options": {},
    "bloom_filter_cols": [cols]?, "bloom_filter_ndv": {col: n}?}``.

    ``sort_within_partitions`` clusters rows inside each output file
    (no shuffle — a per-partition sort) so parquet column min/max stats
    become selective and downstream range predicates skip row groups; the
    cheap half of Z-ordering, worth it on any large sorted-read workload.

    ``z_order_by: [c1, c2, ...]`` is the full version: rows are
    range-repartitioned and sorted by a Morton value interleaving the
    quantile-bucket bits of every listed column (see ``z_value``), so
    files get tight min/max ranges on ALL the columns at once and
    predicates on any subset skip files — what a single-column sort can
    only give the leading column. One range shuffle; mutually exclusive
    with ``sort_within_partitions``.

    Returns the input DataFrame unchanged so a sink can sit mid-pipeline
    (write-through).
    """
    out = df
    persisted = None
    _check_format_available(df.sparkSession, spec.get("format", "parquet"))
    if spec.get("z_order_by") and spec.get("sort_within_partitions"):
        raise ValueError("z_order_by and sort_within_partitions are exclusive")
    if spec.get("z_order_by"):
        # the quantile probe is an eager action over the input and the write
        # replays the same plan — persist so the upstream DAG runs once
        persisted = out.persist(StorageLevel.MEMORY_AND_DISK)
        zcols = list(spec["z_order_by"])
        out = (
            persisted.withColumn("__z", z_value(persisted, zcols))
            .repartitionByRange("__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    if spec.get("sort_within_partitions"):
        out = out.sortWithinPartitions(*spec["sort_within_partitions"])
    try:
        writer = out.write.format(spec.get("format", "parquet")).mode(
            spec.get("mode", "error")
        )
        for key, value in (spec.get("options") or {}).items():
            writer = writer.option(key, value)
        # parquet bloom filters: point-lookup file skipping on columns
        # whose values min/max stats can't separate (ids, hashes, urls)
        # — the third clustering lever next to sort_within/z_order.
        # ~1.2 MB default filter per column per row group; set the ndv
        # hint to size it to the column's real cardinality
        for c in spec.get("bloom_filter_cols") or []:
            writer = writer.option(
                f"parquet.bloom.filter.enabled#{c}", "true"
            )
            ndv = (spec.get("bloom_filter_ndv") or {}).get(c)
            if ndv:
                writer = writer.option(
                    f"parquet.bloom.filter.expected.ndv#{c}",
                    str(int(ndv)),
                )
        if spec.get("partition_by"):
            writer = writer.partitionBy(*spec["partition_by"])
        bucket = spec.get("bucket_by")
        if bucket:
            writer = writer.bucketBy(int(bucket["n"]), *bucket["cols"])
            if spec.get("sort_by"):
                writer = writer.sortBy(*spec["sort_by"])
            writer.saveAsTable(spec["table"])
            return df
        if "table" in spec:
            writer.saveAsTable(spec["table"])
        else:
            writer.save(spec["path"])
        return df
    finally:
        if persisted is not None:
            persisted.unpersist(blocking=False)
