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
