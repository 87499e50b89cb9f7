"""Source stage — declarative reads.

The reference has no sources (the caller passes a DataFrame; its tests build
inputs with ``spark.read.json`` — ``/root/reference/test/conftest.py:14-19``).
The new engine makes reading a first-class config stage.

Scale notes: parquet/orc readers get predicate pushdown + column pruning from
downstream declarative stages for free; ``spark.sql.files.maxPartitionBytes``
governs split sizing (128 MB default → a 100 TB scan is ~800k tasks; raise it
or coalesce for small-file-heavy layouts). Partitioned layouts
(``.../date=2024-01-01/``) get partition pruning from filter stages.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"parquet", "json", "csv", "orc", "text", "avro", "delta"}

# formats whose DataSource implementation ships outside core Spark — valid
# cluster-side with the package on the classpath (spark-avro / delta-spark),
# but absent from a stock PySpark install. Probed lazily so the error is a
# clear actionable message at the source stage, not an opaque
# "Failed to find data source" from deep inside load().
_EXTERNAL_FORMATS = {
    "avro": "org.apache.spark:spark-avro (add via spark.jars.packages)",
    "delta": "delta-spark (pip) + io.delta:delta-spark jars",
}


def _check_format_available(spark: SparkSession, fmt: str) -> None:
    if fmt not in _EXTERNAL_FORMATS:
        return
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: E501
            fmt, spark._jsparkSession.sessionState().conf()
        )
    except Exception:
        raise ValueError(
            f"Source format {fmt!r} needs an external Spark package that is "
            f"not on this cluster's classpath: {_EXTERNAL_FORMATS[fmt]}"
        ) from None


@contextmanager
def _scoped_confs(spark: SparkSession, confs: dict):
    """Apply session confs for the duration of the block, then restore the
    prior values (or unset keys that had none). Reader confs like
    ``spark.sql.legacy.parquet.nanosAsLong`` are consulted at ``load()``
    time for schema resolution, which happens inside the block; restoring
    afterwards keeps one source stage's confs from silently changing how
    every later read in the shared session behaves (verified: a frame
    loaded under the conf still executes correctly after restore)."""
    prior: dict[str, Optional[str]] = {}
    for key, value in confs.items():
        prior[key] = spark.conf.get(key, None)
        spark.conf.set(key, value)
    try:
        yield
    finally:
        for key, old in prior.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def stage_source(spark: SparkSession, spec: dict) -> DataFrame:
    """``{"stage": "source", "format": "parquet", "path": ..., "options": {},
    "schema": "<ddl>"?, "table": name?, "streaming": bool?,
    "spark_confs": {}?}``.

    ``table`` reads a catalog table instead of a path. ``streaming: true``
    switches to ``readStream`` (schema required for file sources).
    ``spark_confs`` (e.g. legacy nanos-timestamp handling) apply only for
    the duration of this stage's read.
    """
    with _scoped_confs(spark, spec.get("spark_confs") or {}):
        if "table" in spec:
            return spark.table(spec["table"])

        fmt = spec.get("format", "parquet")
        if fmt not in _FORMATS:
            raise ValueError(
                f"Unknown source format {fmt!r}; expected one of {sorted(_FORMATS)}"
            )
        _check_format_available(spark, fmt)

        streaming = bool(spec.get("streaming"))
        reader = spark.readStream if streaming else spark.read
        reader = reader.format(fmt)
        schema: Optional[str] = spec.get("schema")
        if schema:
            reader = reader.schema(schema)
        for key, value in (spec.get("options") or {}).items():
            reader = reader.option(key, value)
        path = spec["path"]
        # the streaming file source only accepts directories; make a
        # single-file path work identically batch/streaming (pipeline-config
        # symmetry) by reading its parent dir filtered to that file
        if streaming and os.path.isfile(path):
            reader = reader.option("pathGlobFilter", os.path.basename(path))
            path = os.path.dirname(path)
        return reader.load(path)
