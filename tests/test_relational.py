"""Relational-stage behaviors not covered by the oracle harness."""

from __future__ import annotations

from config_driven_pyspark_spark import Pipeline

from conftest import to_df


def test_aggregate_having_filters_groups(spark):
    to_df(spark, [
        {"k": "a", "v": 1}, {"k": "a", "v": 2},
        {"k": "b", "v": 10}, {"k": "b", "v": 20},
    ]).createOrReplaceTempView("having_in")
    out = Pipeline.from_config([
        {"stage": "source", "table": "having_in"},
        {"stage": "aggregate", "group_by": ["k"],
         "aggs": {"total": "sum(v)"}, "having": "total > 5"},
    ]).run(spark)
    assert [tuple(r) for r in out.collect()] == [("b", 30)]


def test_aggregate_having_on_global_agg(spark):
    to_df(spark, [{"v": 1}, {"v": 2}]).createOrReplaceTempView("having_g")
    empty = Pipeline.from_config([
        {"stage": "source", "table": "having_g"},
        {"stage": "aggregate", "group_by": [],
         "aggs": {"total": "sum(v)"}, "having": "total > 100"},
    ]).run(spark)
    assert empty.count() == 0


def test_unpivot_stage_melts_wide_to_long(spark):
    df = to_df(spark, [
        {"k": "a", "x": 1.0, "y": 2.0},
        {"k": "b", "x": 3.0, "y": 4.0},
    ])
    df.createOrReplaceTempView("t_unpivot_in")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_unpivot_in"},
        {"stage": "unpivot", "ids": ["k"], "values": ["x", "y"]},
    ]).run(spark)
    assert out.columns == ["k", "metric", "value"]
    got = {(r["k"], r["metric"]): r["value"] for r in out.collect()}
    assert got == {("a", "x"): 1.0, ("a", "y"): 2.0,
                   ("b", "x"): 3.0, ("b", "y"): 4.0}


def test_gap_fill_densifies_grouped_series(spark):
    df = to_df(spark, [
        {"k": "a", "h": "2024-01-01 00:00:00", "n": 2},
        {"k": "a", "h": "2024-01-01 03:00:00", "n": 5},
        {"k": "b", "h": "2024-01-01 01:00:00", "n": 1},
    ]).selectExpr("k", "CAST(h AS TIMESTAMP) AS h", "n")
    df.createOrReplaceTempView("t_gapfill_in")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_gapfill_in"},
        {"stage": "gap_fill", "time_col": "h", "step": "1 hour",
         "group_by": ["k"], "fill": {"n": 0}},
    ]).run(spark)
    rows = {(r["k"], str(r["h"])): r["n"] for r in out.collect()}
    # dense: 2 groups x 4 hours (global 00:00..03:00)
    assert len(rows) == 8
    assert rows[("a", "2024-01-01 00:00:00")] == 2
    assert rows[("a", "2024-01-01 01:00:00")] == 0
    assert rows[("b", "2024-01-01 01:00:00")] == 1
    assert rows[("b", "2024-01-01 03:00:00")] == 0


def test_gap_fill_ungrouped_null_fill(spark):
    df = to_df(spark, [
        {"h": "2024-01-01 00:00:00", "v": 1.5},
        {"h": "2024-01-01 02:00:00", "v": 2.5},
    ]).selectExpr("CAST(h AS TIMESTAMP) AS h", "v")
    df.createOrReplaceTempView("t_gapfill_in2")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_gapfill_in2"},
        {"stage": "gap_fill", "time_col": "h", "step": "1 hour"},
    ]).run(spark)
    rows = {str(r["h"]): r["v"] for r in out.collect()}
    assert len(rows) == 3 and rows["2024-01-01 01:00:00"] is None


def test_fill_forward_locf(spark):
    df = to_df(spark, [
        {"k": "a", "i": 1, "v": 10.0}, {"k": "a", "i": 2, "v": None},
        {"k": "a", "i": 3, "v": None}, {"k": "a", "i": 4, "v": 7.0},
        {"k": "b", "i": 1, "v": None}, {"k": "b", "i": 2, "v": 3.0},
    ])
    df.createOrReplaceTempView("t_locf_in")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_locf_in"},
        {"stage": "fill_forward", "columns": ["v"],
         "partition_by": ["k"], "order_by": ["i"]},
    ]).run(spark)
    rows = {(r["k"], r["i"]): r["v"] for r in out.collect()}
    assert rows[("a", 2)] == 10.0 and rows[("a", 3)] == 10.0
    assert rows[("a", 4)] == 7.0
    assert rows[("b", 1)] is None  # leading null stays null


def test_fill_forward_and_interpolate_warn_without_partition_by(spark, caplog):
    """A global window is a single-task straggler at scale — both stages
    warn (matching asof_join's contract) but still compute correctly."""
    df = to_df(spark, [
        {"i": 1, "v": 1.0}, {"i": 2, "v": None}, {"i": 3, "v": 3.0},
    ])
    df.createOrReplaceTempView("t_warn_in")
    with caplog.at_level("WARNING"):
        out = Pipeline.from_config([
            {"stage": "sql", "query": "SELECT * FROM t_warn_in"},
            {"stage": "fill_forward", "columns": ["v"], "order_by": ["i"]},
        ]).run(spark)
        assert {r["v"] for r in out.collect()} == {1.0, 3.0}
    assert "fill_forward with no `partition_by`" in caplog.text
    caplog.clear()
    with caplog.at_level("WARNING"):
        out = Pipeline.from_config([
            {"stage": "sql", "query": "SELECT * FROM t_warn_in"},
            {"stage": "interpolate", "columns": ["v"], "time_col": "i"},
        ]).run(spark)
        assert {r["v"] for r in out.collect()} == {1.0, 2.0, 3.0}
    assert "interpolate with no `partition_by`" in caplog.text


def test_gap_fill_preserves_off_grid_rows(spark):
    """Rows not on the generated grid surface as extra rows instead of
    silently disappearing."""
    df = to_df(spark, [
        {"h": "2024-01-01 00:00:00", "n": 1},
        {"h": "2024-01-01 01:30:00", "n": 7},
    ]).selectExpr("CAST(h AS TIMESTAMP) AS h", "n")
    df.createOrReplaceTempView("t_gapfill_og")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_gapfill_og"},
        {"stage": "gap_fill", "time_col": "h", "step": "1 hour",
         "fill": {"n": 0}},
    ]).run(spark)
    rows = {str(r["h"]): r["n"] for r in out.collect()}
    assert rows["2024-01-01 01:30:00"] == 7   # off-grid row preserved
    assert rows["2024-01-01 01:00:00"] == 0   # grid hole filled


def test_interpolate_linear_between_observations(spark):
    df = to_df(spark, [
        {"k": "a", "h": "2024-01-01 00:00:00", "v": 10.0},
        {"k": "a", "h": "2024-01-01 01:00:00", "v": None},
        {"k": "a", "h": "2024-01-01 02:00:00", "v": None},
        {"k": "a", "h": "2024-01-01 03:00:00", "v": 40.0},
        {"k": "a", "h": "2024-01-01 04:00:00", "v": None},  # trailing
        {"k": "b", "h": "2024-01-01 00:00:00", "v": None},  # leading
        {"k": "b", "h": "2024-01-01 01:00:00", "v": 5.0},
    ]).selectExpr("k", "CAST(h AS TIMESTAMP) AS h", "v")
    df.createOrReplaceTempView("t_interp_in")
    out = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_interp_in"},
        {"stage": "interpolate", "columns": ["v"], "time_col": "h",
         "partition_by": ["k"]},
    ]).run(spark)
    rows = {(r["k"], str(r["h"])): r["v"] for r in out.collect()}
    assert rows[("a", "2024-01-01 01:00:00")] == 20.0
    assert rows[("a", "2024-01-01 02:00:00")] == 30.0
    assert rows[("a", "2024-01-01 04:00:00")] is None
    assert rows[("b", "2024-01-01 00:00:00")] is None
    assert rows[("a", "2024-01-01 00:00:00")] == 10.0  # observed untouched


def test_approx_sketches_within_error_bounds(spark):
    """Correctness gate for the rows-only q_approx_sketches driver row:
    sketch estimates must sit within their published error envelopes of the
    exact answers on real testdata (HLL++ default rsd ≈ 5%; percentile
    accuracy 1000 → rank error ≤ n/1000)."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.createOrReplaceTempView("t_sketch_li")
    got = {
        r["l_returnflag"]: r
        for r in Pipeline.from_config([
            {"stage": "sql", "query": "SELECT * FROM t_sketch_li"},
            {"stage": "aggregate", "group_by": ["l_returnflag"],
             "aggs": {
                 "approx_parts": "approx_count_distinct(l_partkey)",
                 "approx_p50_qty": "approx_percentile(l_quantity, 0.5, 1000)",
             }},
        ]).run(spark).collect()
    }
    from pyspark.sql import functions as F

    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("nd"))
        .collect()
    }
    p50 = {
        r["l_returnflag"]: r["p50"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_quantity, 0.5)").alias("p50"))
        .collect()
    }
    for flag, e in exact.items():
        g = got[flag]
        assert abs(g["approx_parts"] - e["nd"]) <= 0.15 * e["nd"] + 2
        # quantity is small integers; rank error n/1000 stays within ±2
        assert abs(g["approx_p50_qty"] - p50[flag]) <= 2
