"""Data-quality expectations (operators/expectations.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from config_driven_pyspark_spark import Pipeline
from config_driven_pyspark_spark.operators.expectations import (
    enforce_expectations,
    expectation_report,
)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", -5.0),    # violates positive
            (3, None, 3.0),    # violates named (NULL is a violation)
            (3, "d", 7.0),     # duplicate id
            (5, "e", None),    # violates positive (NULL is a violation)
        ],
        "id int, name string, price double",
    )


CONSTRAINTS = {
    "positive": "price > 0",
    "named": "name IS NOT NULL",
}


def test_report_counts(spark, frame):
    rep = {
        r.constraint: (r.n_violations, r.n_rows)
        for r in expectation_report(
            frame, CONSTRAINTS, unique=[["id"]]
        ).collect()
    }
    assert rep == {
        "positive": (2, 5),
        "named": (1, 5),
        "unique(id)": (1, 5),
    }


def test_null_key_is_one_group_not_skipped(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (7, 3)], "k int, v int"
    )
    rep = expectation_report(df, {}, unique=[["k"]]).collect()
    assert rep[0].n_violations == 1  # two NULL keys = one duplicate


def test_fail_raises_with_counts(spark, frame):
    with pytest.raises(ValueError, match="positive: 2 violations"):
        enforce_expectations(frame, CONSTRAINTS, mode="fail")
    clean = frame.filter("price > 0 AND name IS NOT NULL")
    assert enforce_expectations(
        clean, CONSTRAINTS, mode="fail"
    ).count() == 2


def test_drop_keeps_only_passing_rows(spark, frame):
    out = enforce_expectations(frame, CONSTRAINTS, mode="drop")
    assert sorted(r.id for r in out.collect()) == [1, 3]
    # the AND-of-predicates shape must stay pushdown-eligible
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" in plan


def test_quarantine_splits_and_tags(spark, frame, tmp_path):
    qpath = str(tmp_path / "quarantine")
    out = enforce_expectations(
        frame, CONSTRAINTS, mode="quarantine", quarantine_path=qpath
    )
    assert sorted(r.id for r in out.collect()) == [1, 3]
    quar = {
        r.id: sorted(r._violations)
        for r in spark.read.parquet(qpath).collect()
    }
    assert quar == {2: ["positive"], 3: ["named"], 5: ["positive"]}


def test_quarantine_mode_append_vs_overwrite(spark, frame, tmp_path):
    """Default append accumulates across runs (nothing silently lost);
    overwrite opts back into replace-per-run; junk modes refuse."""
    qpath = str(tmp_path / "quarantine")
    enforce_expectations(
        frame, CONSTRAINTS, mode="quarantine", quarantine_path=qpath
    )
    enforce_expectations(
        frame, CONSTRAINTS, mode="quarantine", quarantine_path=qpath
    )
    assert spark.read.parquet(qpath).count() == 6  # 3 violators x 2 runs
    enforce_expectations(
        frame, CONSTRAINTS, mode="quarantine", quarantine_path=qpath,
        quarantine_mode="overwrite",
    )
    assert spark.read.parquet(qpath).count() == 3
    with pytest.raises(ValueError, match="quarantine_mode"):
        enforce_expectations(
            frame, CONSTRAINTS, mode="quarantine",
            quarantine_path=qpath, quarantine_mode="replace",
        )


def test_unique_rejected_for_row_local_modes(spark, frame):
    with pytest.raises(ValueError, match="aggregate-level"):
        enforce_expectations(
            frame, CONSTRAINTS, mode="drop", unique=[["id"]]
        )


def test_stage_in_pipeline_gates_a_sink(spark, frame, tmp_path):
    frame.createOrReplaceTempView("incoming")
    out = Pipeline([
        {"stage": "sql", "query": "SELECT * FROM incoming"},
        {"stage": "expect", "constraints": CONSTRAINTS, "mode": "drop"},
        {"stage": "aggregate", "group_by": [],
         "aggs": {"n": "count(*)", "total": "sum(price)"}},
    ]).run(spark)
    row = out.collect()[0]
    assert (row.n, row.total) == (2, 17.0)
    rep = Pipeline([
        {"stage": "sql", "query": "SELECT * FROM incoming"},
        {"stage": "expect", "constraints": CONSTRAINTS,
         "mode": "report", "unique": [["id"]]},
    ]).run(spark)
    assert rep.count() == 3


def test_expect_gates_each_micro_batch(spark, tmp_path):
    """Composition: the expect stage runs INSIDE a stream_sink's
    per-batch sub-pipeline — each micro-batch is gated, violators
    accumulate in the quarantine path across batches."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    quar = str(tmp_path / "quar")
    ddl = "id int, price double"
    spark.createDataFrame([(1, 10.0), (2, -1.0)], ddl).coalesce(
        1
    ).write.parquet(src)
    spark.createDataFrame([(3, -3.0), (4, 4.0)], ddl).coalesce(
        1
    ).write.mode("append").parquet(src)
    Pipeline([
        {"stage": "source", "format": "parquet", "path": src,
         "streaming": True, "schema": ddl,
         "options": {"maxFilesPerTrigger": "1"}},
        {"stage": "stream_sink", "format": "foreach_batch",
         "trigger": "available_now", "await": True,
         "checkpoint": str(tmp_path / "ckpt"),
         "sink": {"format": "parquet", "path": out},
         "stages": [
             {"stage": "expect",
              "constraints": {"positive": "price > 0"},
              "mode": "quarantine", "quarantine_path": quar},
         ]},
    ]).run(spark)
    kept = sorted(r.id for r in spark.read.parquet(out).collect())
    assert kept == [1, 4]
    bad = sorted(r.id for r in spark.read.parquet(quar).collect())
    assert bad == [2, 3]  # append-per-batch accumulates every violator


def test_fail_tolerance(spark, frame):
    from config_driven_pyspark_spark.operators.expectations import (
        enforce_expectations as enforce,
    )

    # 2/5 positive violations: a 40% threshold absorbs them, 39% not
    ok = enforce(frame, {"positive": "price > 0"}, mode="fail",
                 tolerance=0.4)
    assert ok.count() == 5
    with pytest.raises(ValueError, match=r"tolerance 0\.3"):
        enforce(frame, {"positive": "price > 0"}, mode="fail",
                tolerance=0.3)
    with pytest.raises(ValueError, match="only applies"):
        enforce(frame, {"positive": "price > 0"}, mode="drop",
                tolerance=0.3)
    with pytest.raises(ValueError, match="in \\[0, 1\\)"):
        enforce(frame, {"positive": "price > 0"}, tolerance=1.5)
