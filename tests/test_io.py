"""Source/sink round-trip tests across formats, plus partitioned layouts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark import Pipeline


@pytest.fixture(scope="module")
def nation_rows(spark):
    return sorted(
        tuple(r)
        for r in spark.read.parquet("/root/testdata/sf0.001/nation.parquet").collect()
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_sink_source_round_trip(spark, tmp_path, fmt, nation_rows):
    out = str(tmp_path / f"rt_{fmt}")
    Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": "/root/testdata/sf0.001/nation.parquet"},
        {"stage": "sink", "format": fmt, "path": out, "mode": "overwrite",
         "options": {"header": "true"} if fmt == "csv" else {}},
    ]).run(spark)
    back = Pipeline.from_config([
        {"stage": "source", "format": fmt, "path": out,
         # csv/json don't persist types; give csv the schema back
         **({"schema": "n_nationkey int, n_name string, n_regionkey int"}
            if fmt == "csv" else {}),
         "options": {"header": "true"} if fmt == "csv" else {}},
    ]).run(spark)
    got = sorted(tuple(r) for r in back.select(
        "n_nationkey", "n_name", "n_regionkey").collect())
    want = sorted((r[0], r[1], r[2]) for r in nation_rows)
    assert got == want


def test_partitioned_sink_prunes(spark, tmp_path):
    out = str(tmp_path / "part_out")
    Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": "/root/testdata/sf0.001/orders.parquet"},
        {"stage": "sink", "format": "parquet", "path": out,
         "mode": "overwrite", "partition_by": ["o_orderpriority"]},
    ]).run(spark)
    back = Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": out},
        {"stage": "filter", "predicate": "o_orderpriority = '1-URGENT'"},
    ]).run(spark)
    # partition pruning: the filter must reach PartitionFilters, not a scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1-URGENT" in plan
    n_urgent = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'").count()
    )
    assert back.count() == n_urgent


def test_bucketed_tables_join_without_shuffle(spark):
    """The 100 TB co-location story, end to end through the config surface:
    two tables bucketed on the join key via the sink stage join with NO
    Exchange in the physical plan (bucketed SortMergeJoin)."""
    for t in ("orders_bk", "cust_bk"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        Pipeline.from_config([
            {"stage": "source", "format": "parquet",
             "path": "/root/testdata/sf0.001/orders.parquet"},
            {"stage": "sink", "format": "parquet", "mode": "overwrite",
             "bucket_by": {"n": 4, "cols": ["o_custkey"]},
             "sort_by": ["o_custkey"], "table": "orders_bk"},
        ]).run(spark)
        Pipeline.from_config([
            {"stage": "source", "format": "parquet",
             "path": "/root/testdata/sf0.001/customer.parquet"},
            {"stage": "select",
             "columns": ["c_custkey AS o_custkey", "c_mktsegment"]},
            {"stage": "sink", "format": "parquet", "mode": "overwrite",
             "bucket_by": {"n": 4, "cols": ["o_custkey"]},
             "sort_by": ["o_custkey"], "table": "cust_bk"},
        ]).run(spark)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = Pipeline.from_config([
                {"stage": "source", "table": "cust_bk", "name": "cb"},
                {"stage": "source", "table": "orders_bk"},
                {"stage": "join", "right": "cb", "on": ["o_custkey"]},
            ]).run(spark)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, "bucketed join must not shuffle"
            assert "Bucketed: true" in plan
            assert joined.count() == 1500
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        for t in ("orders_bk", "cust_bk"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_sink_default_mode_errors_on_existing(spark, tmp_path):
    out = str(tmp_path / "exists")
    cfg = [
        {"stage": "source", "format": "parquet",
         "path": "/root/testdata/sf0.001/region.parquet"},
        {"stage": "sink", "format": "parquet", "path": out},
    ]
    Pipeline.from_config(cfg).run(spark)
    with pytest.raises(Exception):  # default mode=error protects outputs
        Pipeline.from_config(cfg).run(spark)


def test_source_spark_confs_are_scoped(spark, tmp_path):
    """A source stage's spark_confs must not leak into the session: the conf
    is applied for the read (schema resolution sees it) and restored after,
    so later reads in the same session are unaffected. Uses a test-owned
    TIMESTAMP(NANOS) fixture — driver testdata's physical encoding is not
    part of this contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "nanos.parquet")
    pq.write_table(
        pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([10**18, 2 * 10**18, 3 * 10**18], pa.timestamp("ns")),
        }),
        path,
        store_schema=False,  # force Spark to see the parquet NANOS type
    )
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key, None)
    assert prior in (None, "false")  # precondition: not already leaked
    df = Pipeline.from_config([
        {"stage": "source", "format": "parquet", "path": path,
         "spark_confs": {key: "true"}},
    ]).run(spark)
    assert dict(df.dtypes)["ts"] == "bigint"  # conf was honored at load
    assert spark.conf.get(key, None) == prior  # and restored after
    assert df.count() == 3  # restored conf doesn't break the loaded frame


def test_sink_sort_within_partitions_clusters_rows(spark, tmp_path):
    out = str(tmp_path / "clustered")
    Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": "/root/testdata/sf0.001/orders.parquet"},
        {"stage": "repartition", "n": 2, "by": ["o_orderstatus"]},
        {"stage": "sink", "format": "parquet", "path": out,
         "sort_within_partitions": ["o_totalprice"]},
    ]).run(spark)
    import glob as _glob

    import pyarrow.parquet as pq

    for f in _glob.glob(f"{out}/*.parquet"):
        vals = pq.read_table(f, columns=["o_totalprice"])["o_totalprice"].to_pylist()
        assert vals == sorted(vals), f  # each file internally sorted


def test_external_formats_fail_with_actionable_error(spark, tmp_path):
    """avro/delta are valid formats cluster-side but need external packages;
    a stock PySpark install should fail at the stage boundary with a clear
    message, not an opaque lookup error from inside load()."""
    from config_driven_pyspark_spark.sources.readers import stage_source
    from config_driven_pyspark_spark.sources.writers import stage_sink

    df = spark.range(3)
    for fmt in ("avro", "delta"):
        with pytest.raises(ValueError, match="external Spark package"):
            stage_source(spark, {"format": fmt, "path": str(tmp_path)})
        with pytest.raises(ValueError, match="external Spark package"):
            stage_sink(df, {"format": fmt, "path": str(tmp_path / "out")})


def test_z_order_sink_clusters_both_dimensions(spark, tmp_path):
    """z_order_by writes files whose min/max ranges are tight on BOTH
    columns (multi-dimensional clustering), the property that lets parquet
    file/row-group stats skip data for predicates on either column."""
    from config_driven_pyspark_spark.sources.writers import stage_sink

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "zorder")
    stage_sink(df, {
        "format": "parquet", "path": path, "mode": "overwrite",
        "z_order_by": ["o_custkey", "o_totalprice"],
    })
    back = spark.read.parquet(path)
    # content preserved exactly
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
    # per-file spans: each file should cover a small fraction of both
    # dimensions (an unclustered write covers ~the whole range in every file)
    stats = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("ck_span"),
            (F.max("o_totalprice") - F.min("o_totalprice")).alias("tp_span"),
        )
    )
    n_files = stats.count()
    if n_files >= 4:  # meaningful only when the write actually split
        full_ck = df.agg(F.max("o_custkey") - F.min("o_custkey")).first()[0]
        full_tp = df.agg(F.max("o_totalprice") - F.min("o_totalprice")).first()[0]
        avg = stats.agg(F.avg("ck_span"), F.avg("tp_span")).first()
        assert avg[0] < full_ck * 0.8
        assert avg[1] < full_tp * 0.8


def test_z_order_reduces_row_groups_scanned(spark, tmp_path):
    """The IO claim behind z_order_by, measured (VERDICT r5 #5): for a
    2-column range predicate, count the parquet row groups whose min/max
    stats overlap the predicate box — exactly the set a stats-aware
    reader (Spark's parquet row-group pruning, or file-level skipping)
    must read. Plain layout: every row group spans ~the full range of
    both columns, so ALL must be read. Z-ordered: only the row groups
    whose Morton range intersects the box. Measured at these shapes:
    plain 104/104 vs z-ordered 7/99 — a ~15x scan reduction (PLANS.md
    r6). Both writes use a small parquet.block.size so granularities are
    comparable (AQE otherwise coalesces the z write into 2 fat files)."""
    import glob

    import pyarrow.parquet as pq

    from config_driven_pyspark_spark.sources.writers import stage_sink

    n = 200_000
    df = spark.range(n).select(
        F.pmod(F.hash("id"), F.lit(1000)).alias("x"),
        F.pmod(F.hash("id", F.lit(7)), F.lit(1000)).alias("y"),
        F.col("id"),
    )
    plain = str(tmp_path / "plain")
    zpath = str(tmp_path / "zord")
    df.repartition(8).write.mode("overwrite").option(
        "parquet.block.size", 32768
    ).parquet(plain)
    stage_sink(df, {
        "format": "parquet", "path": zpath, "mode": "overwrite",
        "z_order_by": ["x", "y"],
        "options": {"parquet.block.size": 32768},
    })

    def row_groups_to_read(path: str, lo: int, hi: int) -> tuple[int, int]:
        must_read = total = 0
        for f in glob.glob(path + "/*.parquet"):
            pf = pq.ParquetFile(f)
            idx = [pf.schema_arrow.names.index(c) for c in ("x", "y")]
            for rg in range(pf.num_row_groups):
                md = pf.metadata.row_group(rg)
                total += 1
                if all(
                    md.column(ci).statistics.min <= hi
                    and md.column(ci).statistics.max >= lo
                    for ci in idx
                ):
                    must_read += 1
        return must_read, total

    p_hit, p_tot = row_groups_to_read(plain, 100, 200)
    z_hit, z_tot = row_groups_to_read(zpath, 100, 200)
    assert p_tot >= 50 and z_tot >= 50  # comparable granularity
    assert p_hit == p_tot  # unclustered: stats prune nothing
    # z-ordered: the box predicate must skip the overwhelming majority
    assert z_hit * 5 <= z_tot, (z_hit, z_tot)
    # and both layouts return identical query results
    pred = "x BETWEEN 100 AND 200 AND y BETWEEN 100 AND 200"
    a = sorted(map(tuple, spark.read.parquet(plain).filter(pred).collect()))
    b = sorted(map(tuple, spark.read.parquet(zpath).filter(pred).collect()))
    assert a == b and len(a) > 0


def test_z_order_rejects_bad_specs(spark, tmp_path):
    from config_driven_pyspark_spark.sources.writers import stage_sink, z_value

    df = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS s",
                                    "id * 2 AS v")
    with pytest.raises(ValueError, match="at least 2"):
        z_value(df, ["id"])
    with pytest.raises(ValueError, match="orderable numeric"):
        z_value(df, ["id", "s"])
    with pytest.raises(ValueError, match="exclusive"):
        stage_sink(df, {"path": str(tmp_path / "x"),
                        "z_order_by": ["id", "v"],
                        "sort_within_partitions": ["id"]})


def test_z_order_on_temporal_column(spark, tmp_path):
    """DATE/TIMESTAMP z_order_by columns bucket via the epoch instead of
    crashing on a direct double cast."""
    from config_driven_pyspark_spark.sources.writers import stage_sink

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    path = str(tmp_path / "ztime")
    stage_sink(df, {
        "format": "parquet", "path": path, "mode": "overwrite",
        "z_order_by": ["o_orderdate", "o_totalprice"],
    })
    back = spark.read.parquet(path)
    assert back.count() == df.count()


def test_sink_bloom_filter_cols(spark, tmp_path):
    """The bloom option must reach the parquet writer: same rows, a
    measurably larger file (the serialized filter), and the ndv hint
    shrinks it."""
    import glob
    import os as _os

    # md5 values: high-cardinality so the dictionary page overflows and
    # parquet-mr actually serializes the filter (fully dictionary-encoded
    # columns skip blooms — the dictionary already is an exact filter)
    df = spark.range(60_000).selectExpr(
        "id", "md5(cast(id AS string)) AS k"
    ).coalesce(1)
    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloomed")
    hinted = str(tmp_path / "hinted")
    from config_driven_pyspark_spark.sources.writers import stage_sink

    stage_sink(df, {"format": "parquet", "path": plain,
                    "mode": "overwrite"})
    stage_sink(df, {"format": "parquet", "path": bloomed,
                    "mode": "overwrite", "bloom_filter_cols": ["k"]})
    stage_sink(df, {"format": "parquet", "path": hinted,
                    "mode": "overwrite", "bloom_filter_cols": ["k"],
                    "bloom_filter_ndv": {"k": 60_000}})

    def _size(d):
        return sum(
            _os.path.getsize(f) for f in glob.glob(f"{d}/part-*.parquet")
        )

    assert _size(bloomed) > _size(plain) + 100_000
    assert _size(plain) < _size(hinted) < _size(bloomed)
    assert (
        spark.read.parquet(bloomed).orderBy("id").collect()
        == spark.read.parquet(plain).orderBy("id").collect()
    )


def test_compact_bloom_filter_cols(spark, tmp_path):
    import glob
    import os as _os

    from config_driven_pyspark_spark.operators.table import (
        compact_table, merge_upsert,
    )

    target = str(tmp_path / "t")
    base = spark.range(20_000).selectExpr(
        "id AS k", "cast(id % 3 as string) AS status",
        "cast(id as double) AS val"
    )
    base.write.partitionBy("status").parquet(target)
    merge_upsert(
        base.limit(10).selectExpr("k", "status", "val + 1 AS val"),
        target, ["k"], partition_by=["status"],
    )

    def _size():
        return sum(
            _os.path.getsize(f)
            for f in glob.glob(f"{target}/*/part-*.parquet")
        )

    before = _size()
    out = compact_table(
        spark, target, partition_by=["status"], min_files=2,
        bloom_filter_cols=["k"], bloom_filter_ndv={"k": 20_000},
    )
    assert out["n_rows"] == 20_000
    assert _size() > 0
    # content preserved through the bloom-indexed rewrite
    assert spark.read.parquet(target).count() == 20_000
    _ = before
