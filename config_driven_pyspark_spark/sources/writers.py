"""Sink stage — declarative writes.

Scale notes: always write partitioned (``partition_by``) or bucketed
(``bucket_by`` + ``sort_by`` on a saved table) layouts for 100 TB outputs so
downstream reads prune/co-locate; ``repartition`` upstream controls file
count (target ~128 MB–1 GB files). ``mode`` defaults to ``error`` to avoid
accidental overwrite of large outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from config_driven_pyspark_spark.sources.readers import _check_format_available


def stage_sink(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "sink", "format": "parquet", "path": ..., "mode":
    "error"|"overwrite"|"append", "partition_by": [cols], "bucket_by":
    {"n": int, "cols": [...]}, "sort_by": [cols],
    "sort_within_partitions": [cols], "table": name?, "options": {}}``.

    ``sort_within_partitions`` clusters rows inside each output file
    (no shuffle — a per-partition sort) so parquet column min/max stats
    become selective and downstream range predicates skip row groups; the
    cheap half of Z-ordering, worth it on any large sorted-read workload.

    Returns the input DataFrame unchanged so a sink can sit mid-pipeline
    (write-through).
    """
    out = df
    _check_format_available(df.sparkSession, spec.get("format", "parquet"))
    if spec.get("sort_within_partitions"):
        out = out.sortWithinPartitions(*spec["sort_within_partitions"])
    writer = out.write.format(spec.get("format", "parquet")).mode(spec.get("mode", "error"))
    for key, value in (spec.get("options") or {}).items():
        writer = writer.option(key, value)
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
