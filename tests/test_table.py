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


def _scd2_snapshot(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, val string, qty bigint, eff string"
    ).selectExpr("id", "val", "qty", "CAST(eff AS DATE) AS effective_ts")


def test_scd2_merge_versions_changes(spark, tmp_path):
    import datetime as dt

    from config_driven_pyspark_spark.operators.table import scd2_merge

    target = str(tmp_path / "dim")
    day1 = _scd2_snapshot(spark, [
        (1, "a", 10, "2024-01-01"), (2, "b", 20, "2024-01-01"),
        (3, "c", 30, "2024-01-01"),
    ])
    stats = scd2_merge(day1, target, ["id"])
    assert stats == {"n_closed": 0, "n_new_versions": 3, "n_unchanged": 0,
                     "n_deleted": 0, "n_after": 3}

    day2 = spark.createDataFrame(
        [
            (2, "B2", 21, "2024-02-01", False),  # changed -> close + new
            (3, "c", 30, "2024-02-01", False),   # identical -> no-op
            (4, "d", 40, "2024-02-01", False),   # new key -> insert
            (1, "a", 10, "2024-02-01", True),    # delete -> close only
        ],
        "id bigint, val string, qty bigint, eff string, gone boolean",
    ).selectExpr("id", "val", "qty", "CAST(eff AS DATE) AS effective_ts",
                 "gone")
    stats = scd2_merge(day2, target, ["id"], delete_col="gone")
    # 5 rows: 1 closed-by-delete, 2 closed + 2's new version, 3 kept,
    # 4 inserted
    assert stats == {"n_closed": 2, "n_new_versions": 2, "n_unchanged": 1,
                     "n_deleted": 1, "n_after": 5}

    rows = spark.read.parquet(target).collect()
    cur = {r["id"]: r for r in rows if r["is_current"]}
    hist = sorted(
        ((r["id"], r["val"], str(r["valid_to"])) for r in rows
         if not r["is_current"])
    )
    # current: 2's new version, 3 untouched, 4 inserted; 1 deleted
    assert set(cur) == {2, 3, 4}
    assert (cur[2]["val"], cur[2]["qty"],
            str(cur[2]["valid_from"])) == ("B2", 21, "2024-02-01")
    assert str(cur[3]["valid_from"]) == "2024-01-01"  # no-op kept v1
    assert cur[2]["valid_to"] is None
    # history: 1 closed by delete, 2 closed by change
    assert hist == [(1, "a", "2024-02-01"), (2, "b", "2024-02-01")]
    assert isinstance(rows[0]["valid_from"], dt.date)


def test_scd2_rejects_metadata_collision_and_dup_keys(spark, tmp_path):
    import pytest as _pytest

    from config_driven_pyspark_spark.operators.table import scd2_merge

    target = str(tmp_path / "dim2")
    bad = spark.createDataFrame(
        [(1, "a", True)], "id bigint, val string, is_current boolean"
    ).selectExpr("id", "val", "is_current",
                 "CAST('2024-01-01' AS DATE) AS effective_ts")
    with _pytest.raises(ValueError, match="metadata columns"):
        scd2_merge(bad, target, ["id"])
    dup = _scd2_snapshot(spark, [
        (1, "a", 1, "2024-01-01"), (1, "b", 2, "2024-01-01"),
    ])
    with _pytest.raises(ValueError, match="duplicate key"):
        scd2_merge(dup, target, ["id"])


def test_scd2_stage_through_pipeline(spark, tmp_path):
    from config_driven_pyspark_spark.operators.table import scd2_merge

    target = str(tmp_path / "dim3")
    scd2_merge(
        _scd2_snapshot(spark, [(1, "a", 10, "2024-01-01")]),
        target, ["id"],
    )
    spark.createDataFrame(
        [(1, "A", 11, "2024-03-01")],
        "id bigint, val string, qty bigint, eff string",
    ).selectExpr(
        "id", "val", "qty", "CAST(eff AS DATE) AS effective_ts"
    ).createOrReplaceTempView("scd2_batch")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM scd2_batch"},
        {"stage": "scd2", "path": target, "keys": ["id"]},
        {"stage": "filter", "predicate": "is_current"},
    ]).run(spark)
    row = out.collect()[0]
    assert (row["val"], row["qty"], str(row["valid_from"])) == (
        "A", 11, "2024-03-01")


def test_merge_upsert_randomized_soak_vs_model(spark, tmp_path):
    """Five randomized CDC batches (fixed seed) applied to one snapshot;
    after every batch the parquet table equals a plain dict-based
    reference model of MERGE semantics, and the reported stats add up."""
    import random

    rng = random.Random(20240815)
    target = str(tmp_path / "soak")
    model = {}
    first = True
    for step in range(5):
        ids = rng.sample(range(1, 30), rng.randint(3, 8))
        rows = [
            (i, f"v{step}_{i}", rng.randint(0, 99),
             rng.random() < 0.25)  # ~25% deletes
            for i in ids
        ]
        batch = spark.createDataFrame(
            rows, "id bigint, val string, qty bigint, gone boolean"
        )
        stats = merge_upsert(batch, target, ["id"], delete_col="gone")
        for i, v, q, gone in rows:
            if gone:
                model.pop(i, None)
            else:
                model[i] = (v, q)
        got = {
            r["id"]: (r["val"], r["qty"])
            for r in spark.read.parquet(target).collect()
        }
        assert got == model, f"step {step}"
        assert stats["n_after"] == len(model)
        if first:
            assert stats["n_before"] == 0
            first = False
        # conservation: after = before - deleted + inserted
        assert stats["n_after"] == (
            stats["n_before"] - stats["n_deleted"] + stats["n_inserted"]
        )


def test_scd2_randomized_soak_vs_model(spark, tmp_path):
    """Three randomized daily batches into an SCD2 dimension; the
    current view equals the flat reference model and closed versions
    only ever grow."""
    import random

    from config_driven_pyspark_spark.operators.table import scd2_merge

    rng = random.Random(99)
    target = str(tmp_path / "dim_soak")
    model = {}
    n_hist = 0
    for day in range(1, 4):
        ids = rng.sample(range(1, 15), rng.randint(3, 6))
        rows = []
        for i in ids:
            if i in model and rng.random() < 0.3:
                val, qty = model[i]  # re-deliver identical -> no-op
            else:
                val, qty = f"d{day}_{i}", rng.randint(0, 9)
            rows.append((i, val, qty, f"2024-01-{day:02d}",
                         rng.random() < 0.2))
        batch = spark.createDataFrame(
            rows, "id bigint, val string, qty bigint, eff string, "
                  "gone boolean",
        ).selectExpr("id", "val", "qty",
                     "CAST(eff AS DATE) AS effective_ts", "gone")
        stats = scd2_merge(batch, target, ["id"], delete_col="gone")
        for i, v, q, _e, gone in rows:
            if gone:
                if i in model:
                    model.pop(i)
            else:
                model[i] = (v, q)
        snap = spark.read.parquet(target).collect()
        cur = {r["id"]: (r["val"], r["qty"]) for r in snap
               if r["is_current"]}
        assert cur == model, f"day {day}"
        closed = sum(1 for r in snap if not r["is_current"])
        assert closed >= n_hist  # history is append-only
        n_hist = closed
        assert all(r["valid_to"] is not None for r in snap
                   if not r["is_current"])
        assert stats["n_after"] == len(snap)


def test_incremental_agg_folds_batches(spark, tmp_path):
    from config_driven_pyspark_spark.operators.table import incremental_agg

    target = str(tmp_path / "mv")
    aggs = {"n": "count(*)", "total": "sum(qty)", "lo": "min(qty)",
            "hi": "max(qty)"}
    b1 = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "grp string, qty bigint"
    )
    b2 = spark.createDataFrame(
        [("a", 1), ("c", 7)], "grp string, qty bigint"
    )
    incremental_agg(b1, target, ["grp"], aggs)
    out = incremental_agg(b2, target, ["grp"], aggs)
    got = {r["grp"]: (r["n"], r["total"], r["lo"], r["hi"])
           for r in out.collect()}
    # folded result == one aggregation over the union
    assert got == {"a": (3, 31, 1, 20), "b": (1, 5, 5, 5),
                   "c": (1, 7, 7, 7)}


def test_incremental_agg_rejects_non_monoid(spark, tmp_path):
    from config_driven_pyspark_spark.operators.table import incremental_agg

    b = spark.createDataFrame([("a", 1)], "grp string, qty bigint")
    with pytest.raises(ValueError, match="monoid"):
        incremental_agg(b, str(tmp_path / "x"), ["grp"],
                        {"m": "avg(qty)"})


def test_incremental_agg_stage_and_soak_vs_full_recompute(spark, tmp_path):
    import random

    from config_driven_pyspark_spark.operators.table import incremental_agg

    rng = random.Random(7)
    target = str(tmp_path / "mv2")
    aggs = {"n": "count(*)", "total": "sum(v)", "hi": "max(v)"}
    seen = []
    for _ in range(4):
        rows = [(rng.choice("xyz"), rng.randint(-50, 50))
                for _ in range(rng.randint(2, 9))]
        seen += rows
        batch = spark.createDataFrame(rows, "grp string, v bigint")
        out = incremental_agg(batch, target, ["grp"], aggs)
    import collections
    model = collections.defaultdict(list)
    for g, v in seen:
        model[g].append(v)
    got = {r["grp"]: (r["n"], r["total"], r["hi"]) for r in out.collect()}
    assert got == {g: (len(vs), sum(vs), max(vs)) for g, vs in model.items()}


def test_incremental_agg_null_group_key_folds(spark, tmp_path):
    """NULL grouping keys fold into one group across batches (the
    eqNullSafe join contract) instead of forking a new NULL row per
    fold."""
    from config_driven_pyspark_spark.operators.table import incremental_agg

    target = str(tmp_path / "mv_null")
    aggs = {"n": "count(*)", "total": "sum(v)"}
    b1 = spark.createDataFrame([(None, 1), ("a", 2)], "grp string, v bigint")
    b2 = spark.createDataFrame([(None, 10)], "grp string, v bigint")
    incremental_agg(b1, target, ["grp"], aggs)
    out = incremental_agg(b2, target, ["grp"], aggs)
    got = {r["grp"]: (r["n"], r["total"]) for r in out.collect()}
    assert got == {None: (2, 11), "a": (1, 2)}
