"""ANALYZE TABLE statistics (operators/stats.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from config_driven_pyspark_spark import Pipeline
from config_driven_pyspark_spark.operators.stats import (
    analyze_frame,
    analyze_table,
)


@pytest.fixture()
def snap(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [
            (1, "P", 10.0), (2, "P", None), (3, "P", 10.0),
            (4, "O", 5.0), (5, "O", 7.0),
        ],
        "k int, status string, val double",
    ).write.partitionBy("status").parquet(path)
    return path


def test_analyze_exact(spark, snap):
    rep = {
        (r.partition, r.column): (
            r.n_rows, r.n_nulls, r.min_value, r.max_value, r.n_distinct
        )
        for r in analyze_table(
            spark, snap, partition_by=["status"], distinct="exact"
        ).collect()
    }
    assert rep[("status=P", "val")] == (3, 1, "10.0", "10.0", 1)
    assert rep[("status=P", "k")] == (3, 0, "1", "3", 3)
    assert rep[("status=O", "val")] == (2, 0, "5.0", "7.0", 2)
    assert rep[("status=O", "k")] == (2, 0, "4", "5", 2)


def test_analyze_unpartitioned_and_approx(spark, tmp_path):
    path = str(tmp_path / "u")
    spark.range(1000).selectExpr(
        "id", "cast(id % 7 as string) AS b"
    ).write.parquet(path)
    rep = {
        r.column: r
        for r in analyze_table(spark, path).collect()
    }
    assert rep["id"].partition == ""
    assert rep["id"].n_rows == 1000
    assert rep["b"].n_nulls == 0
    # HLL estimate of 7 distinct values is exact at this cardinality
    assert rep["b"].n_distinct == 7
    none = analyze_table(spark, path, distinct=None).collect()
    assert all(r.n_distinct is None for r in none)


def test_analyze_guards(spark, snap):
    with pytest.raises(ValueError, match="grouping key"):
        analyze_table(
            spark, snap, columns=["status"], partition_by=["status"]
        )
    with pytest.raises(ValueError, match="not in the frame"):
        analyze_table(spark, snap, columns=["nope"])
    with pytest.raises(ValueError, match="distinct must be"):
        analyze_table(spark, snap, distinct="bogus")


def test_analyze_non_identifier_column_names(spark):
    """Columns whose names are not valid SQL identifiers (spaces,
    dashes, dots, quotes, backticks) must analyze like any other — the
    generated melt quotes every reference (ADVICE r12)."""
    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, "y", None), (2, None, 4.0)],
        ["weird col", "has-dash", "a.b'c`d"],
    )
    rep = {
        r.column: (r.n_rows, r.n_nulls, r.min_value, r.max_value,
                   r.n_distinct)
        for r in analyze_frame(df, distinct="exact").collect()
    }
    assert rep["weird col"] == (3, 0, "1", "2", 2)
    assert rep["has-dash"] == (3, 1, "x", "y", 2)
    assert rep["a.b'c`d"] == (3, 1, "2.0", "4.0", 2)
    # grouped by a non-identifier partition column, approx path
    grouped = {
        (r.partition, r.column): r.n_rows
        for r in analyze_frame(
            df, columns=["has-dash"], partition_by=["weird col"]
        ).collect()
    }
    assert grouped[("weird col=2", "has-dash")] == 2


def test_analyze_stage_and_frame(spark, snap):
    out = Pipeline([
        {"stage": "analyze", "path": snap, "partition_by": ["status"],
         "columns": ["k"], "distinct": "exact"},
    ]).run(spark)
    assert out.count() == 2
    mid = Pipeline([
        {"stage": "source", "format": "parquet", "path": snap},
        {"stage": "filter", "predicate": "k <= 3"},
        {"stage": "analyze", "columns": ["val"]},
    ]).run(spark).collect()
    assert len(mid) == 1 and mid[0].n_rows == 3


def test_plan_join_strategy_pure_rules():
    """Unit rules: small right -> broadcast; skewed left key -> salt
    (power of two, capped); absent stats / ineligible how -> {}."""
    from config_driven_pyspark_spark.operators.stats import (
        plan_join_strategy as plan,
    )

    small = {"version": 1, "n_rows": 100, "columns": {}}
    big = {"version": 1, "n_rows": 10_000_000, "columns": {}}
    skewed = {"version": 1, "n_rows": 10_000_000,
              "columns": {"k": {"n_distinct": 1000, "skew_x": 40.0}}}
    flat = {"version": 1, "n_rows": 10_000_000,
            "columns": {"k": {"n_distinct": 1000, "skew_x": 1.2}}}
    assert plan(None, small, ["k"]) == {"broadcast": True}
    assert plan(skewed, big, ["k"]) == {"salt": 64}
    assert plan(skewed, big, ["k"], max_salt=32) == {"salt": 32}
    assert plan(
        {"version": 1, "n_rows": 1,
         "columns": {"k": {"skew_x": 17.0}}},
        big, ["k"],
    ) == {"salt": 32}  # rounded up to a power of two
    assert plan(flat, big, ["k"]) == {}
    assert plan(None, None, ["k"]) == {}          # absent stats
    assert plan(skewed, big, None) == {}          # expression join key
    assert plan(skewed, big, ["k"], how="full") == {}  # salt domain
    assert plan(skewed, big, ["other"]) == {}     # key not analyzed


def test_auto_join_flips_on_stats(spark, tmp_path):
    """End-to-end (VERDICT r12 ask #8 Done-criterion): the SAME auto
    join spec plans broadcast when the dim's saved stats are small,
    salted when the fact's key stats are skewed, and byte-identically
    plain when no stats exist — results equal in every case."""
    from config_driven_pyspark_spark import Pipeline
    from config_driven_pyspark_spark.operators.stats import (
        save_table_stats,
    )

    facts = str(tmp_path / "facts")
    dim = str(tmp_path / "dim")
    # skewed fact key: half the rows share k=1
    spark.range(2000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 1 ELSE id END AS k",
        "cast(id as double) AS v",
    ).write.parquet(facts)
    spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 1001)], "k bigint, name string"
    ).write.parquet(dim)

    def run(**joinspec):
        return Pipeline([
            {"stage": "source", "format": "parquet", "path": dim,
             "name": "d"},
            {"stage": "source", "format": "parquet", "path": facts},
            {"stage": "join", "right": "d", "on": ["k"],
             "auto": True, **joinspec},
        ]).run(spark)

    def plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    expected = sorted(
        (r.k, r.v, r.name) for r in run().collect()
    )
    # no stats anywhere: plain join (no hint, no salt)
    p0 = plan(run())
    assert "__salt" not in p0 and "broadcast" not in p0.lower()
    # small dim stats -> broadcast hint
    save_table_stats(spark, dim, ["k"])
    pb = plan(run())
    assert "broadcast" in pb.lower() and "__salt" not in pb
    # dim too big for the threshold + skewed fact key -> salted
    save_table_stats(spark, facts, ["k"])
    ps = plan(run(broadcast_max_rows=10, skew_threshold=16.0))
    assert "__salt" in ps
    # results identical under every placement
    for kwargs in ({}, {"broadcast_max_rows": 10}):
        got = sorted((r.k, r.v, r.name)
                     for r in run(**kwargs).collect())
        assert got == expected
    # explicit hints always win over auto
    pe = plan(run(salt=4, broadcast_max_rows=10**9))
    assert "__salt" in pe
