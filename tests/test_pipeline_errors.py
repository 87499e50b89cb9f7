"""Error-path contract for the Pipeline config surface: bad configs fail
fast with actionable messages, never produce silently-wrong plans."""

from __future__ import annotations

import pytest

from config_driven_pyspark_spark import Pipeline

SRC = {"stage": "source", "format": "parquet",
       "path": "/root/testdata/sf0.001/region.parquet"}


def test_unknown_stage_kind(spark):
    with pytest.raises(ValueError, match="Unknown stage kind 'aggregat'"):
        Pipeline.from_config([SRC, {"stage": "aggregat", "aggs": {}}]).run(spark)


def test_first_stage_without_source(spark):
    with pytest.raises(ValueError, match="no input"):
        Pipeline.from_config([{"stage": "filter", "predicate": "1=1"}]).run(spark)


def test_unknown_named_input(spark):
    with pytest.raises(ValueError, match="Unknown stage output 'nope'"):
        Pipeline.from_config(
            [SRC, {"stage": "filter", "predicate": "1=1", "input": "nope"}]
        ).run(spark)


def test_empty_pipeline(spark):
    with pytest.raises(ValueError, match="Empty pipeline"):
        Pipeline.from_config([]).run(spark)


def test_unknown_source_format(spark):
    with pytest.raises(ValueError, match="Unknown source format"):
        Pipeline.from_config(
            [{"stage": "source", "format": "xlsx", "path": "/tmp/x"}]
        ).run(spark)


def test_unknown_dedup_method(spark):
    with pytest.raises(ValueError, match="Unknown dedup method"):
        Pipeline.from_config(
            [SRC, {"stage": "dedup", "method": "magic"}]
        ).run(spark)


def test_sample_stage_fraction(spark):
    out = Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": "/root/testdata/sf0.001/orders.parquet"},
        {"stage": "sample", "fraction": 0.2, "seed": 7},
    ]).run(spark)
    n = out.count()
    assert 150 < n < 450  # binomial around 0.2 * 1500


def test_persist_stage_levels(spark):
    out = Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": "/root/testdata/sf0.001/region.parquet"},
        {"stage": "persist", "level": "MEMORY_AND_DISK"},
    ]).run(spark)
    assert out.count() == 5 and out.storageLevel.useMemory
    out.unpersist()
    with pytest.raises(ValueError, match="Unknown storage level"):
        Pipeline.from_config([
            {"stage": "source", "format": "parquet",
             "path": "/root/testdata/sf0.001/region.parquet"},
            {"stage": "persist", "level": "TURBO"},
        ]).run(spark)


def test_unknown_text_op(spark):
    with pytest.raises(ValueError, match="Unknown text ops"):
        Pipeline.from_config(
            [SRC, {"stage": "text", "column": "r_name", "ops": ["sentiment"]}]
        ).run(spark)


def test_observe_stage_collects_metrics_without_extra_pass(spark):
    """The observe stage piggybacks metrics on the existing action — one
    scan produces both the result and the QA metrics."""
    from config_driven_pyspark_spark import Pipeline

    p = Pipeline.from_config([
        {"stage": "source", "format": "parquet",
         "path": "/root/testdata/sf0.001/orders.parquet"},
        {"stage": "observe", "as": "qa",
         "metrics": {"rows": "count(*)",
                     "max_price": "max(o_totalprice)"}},
        {"stage": "aggregate", "group_by": ["o_orderstatus"],
         "aggs": {"n": "count(*)"}},
    ])
    out = p.run(spark)
    n_groups = out.count()  # the action that materializes the metrics
    got = p.observations["qa"].get
    assert n_groups > 0
    assert got["rows"] == 1_500
    assert got["max_price"] > 0
