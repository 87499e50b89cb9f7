"""MERGE/upsert over plain parquet (operators/table.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from config_driven_pyspark_spark import Pipeline
from config_driven_pyspark_spark.operators.table import merge_upsert


def _snapshot(spark, path, rows):
    spark.createDataFrame(
        rows, "id bigint, val string, qty bigint"
    ).write.mode("overwrite").parquet(path)


def test_merge_upsert_update_insert_delete(spark, tmp_path):
    target = str(tmp_path / "t")
    _snapshot(spark, target, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    batch = spark.createDataFrame(
        [
            (2, "B2", 21, False),   # matched -> update
            (4, "d", 40, False),    # unmatched -> insert
            (3, "c", 0, True),      # matched + delete flag -> delete
            (9, "zz", 0, True),     # unmatched delete -> ignored
        ],
        "id bigint, val string, qty bigint, gone boolean",
    )
    stats = merge_upsert(batch, target, ["id"], delete_col="gone")
    assert stats == {"n_before": 3, "n_matched": 2, "n_updated": 1,
                     "n_inserted": 1, "n_deleted": 1, "n_after": 3}
    got = {
        r["id"]: (r["val"], r["qty"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == {1: ("a", 10), 2: ("B2", 21), 4: ("d", 40)}
    # no staging/backup debris after a clean merge
    assert not os.path.exists(target + "__staging")
    assert not os.path.exists(target + "__premerge")


def test_merge_upsert_bootstraps_missing_target(spark, tmp_path):
    target = str(tmp_path / "t0")
    batch = spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 2, True)],
        "id bigint, val string, qty bigint, gone boolean",
    )
    stats = merge_upsert(batch, target, ["id"], delete_col="gone")
    assert stats["n_before"] == 0 and stats["n_after"] == 1
    assert [r["id"] for r in spark.read.parquet(target).collect()] == [1]


def test_merge_upsert_rejects_ambiguous_batch(spark, tmp_path):
    target = str(tmp_path / "t1")
    _snapshot(spark, target, [(1, "a", 10)])
    dup = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], "id bigint, val string, qty bigint"
    )
    with pytest.raises(ValueError, match="duplicate key"):
        merge_upsert(dup, target, ["id"])
    # target untouched by the rejected merge
    assert spark.read.parquet(target).count() == 1


def test_merge_upsert_requires_full_schema(spark, tmp_path):
    target = str(tmp_path / "t2")
    _snapshot(spark, target, [(1, "a", 10)])
    narrow = spark.createDataFrame([(1, "x")], "id bigint, val string")
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(narrow, target, ["id"])


def test_merge_upsert_clears_crash_debris(spark, tmp_path):
    target = str(tmp_path / "t3")
    _snapshot(spark, target, [(1, "a", 10)])
    os.makedirs(target + "__staging")  # a crashed earlier merge left this
    batch = spark.createDataFrame(
        [(2, "b", 20)], "id bigint, val string, qty bigint"
    )
    stats = merge_upsert(batch, target, ["id"])
    assert stats["n_after"] == 2
    assert not os.path.exists(target + "__staging")


def test_merge_stage_returns_post_merge_snapshot(spark, tmp_path):
    target = str(tmp_path / "t4")
    _snapshot(spark, target, [(1, "a", 10), (2, "b", 20)])
    batch = spark.createDataFrame(
        [(2, "B", 21), (5, "e", 50)], "id bigint, val string, qty bigint"
    )
    batch.createOrReplaceTempView("merge_batch")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM merge_batch"},
        {"stage": "merge", "path": target, "keys": ["id"]},
        {"stage": "aggregate", "group_by": [],
         "aggs": {"n": "count(*)", "total_qty": "sum(qty)"}},
    ]).run(spark)
    row = out.collect()[0]
    assert (row["n"], row["total_qty"]) == (3, 10 + 21 + 50)
