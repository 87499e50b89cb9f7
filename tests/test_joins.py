"""Unit tests for the as-of and range join operators (operators/joins.py).

Golden-value semantics: inclusive equality matches, backward/forward
directions, tolerance horizons, left-vs-inner null handling, and the
exactly-once pair guarantee of the bucketed range join.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from config_driven_pyspark_spark.operators.joins import asof_join, range_join

TRADES_DDL = "sym string, t timestamp, qty bigint"
QUOTES_DDL = "sym string, t timestamp, px double"


def ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 12, minute)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("A", ts(1), 10), ("A", ts(5), 20), ("A", ts(9), 30), ("B", ts(2), 5)],
        TRADES_DDL,
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [("A", ts(0), 1.0), ("A", ts(5), 2.0), ("A", ts(7), 3.0), ("C", ts(0), 9.0)],
        QUOTES_DDL,
    )


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_asof_backward_inclusive(spark, trades, quotes):
    out = asof_join(trades, quotes, on="t", by=["sym"], how="inner")
    # ts(5) trade matches the ts(5) quote (inclusive), not ts(0)
    assert rows(out, "sym", "qty", "right_px") == [
        ("A", 10, 1.0),
        ("A", 20, 2.0),
        ("A", 30, 3.0),
    ]


def test_asof_left_keeps_unmatched(spark, trades, quotes):
    out = asof_join(trades, quotes, on="t", by=["sym"], how="left")
    got = rows(out, "sym", "qty", "right_px")
    assert ("B", 5, None) in got and len(got) == 4


def test_asof_forward(spark, trades, quotes):
    out = asof_join(trades, quotes, on="t", by=["sym"], direction="forward",
                    how="inner")
    # ts(1)→ts(5) quote; ts(5)→ts(5) (inclusive); ts(9)→none
    assert rows(out, "sym", "qty", "right_px") == [("A", 10, 2.0), ("A", 20, 2.0)]


def test_asof_tolerance(spark, trades, quotes):
    out = asof_join(trades, quotes, on="t", by=["sym"], tolerance="1 minute",
                    how="inner")
    # ts(1) is 1 min from ts(0) (kept); ts(5) exact (kept); ts(9) is 2 min
    # from ts(7) (dropped)
    assert rows(out, "sym", "qty", "right_px") == [("A", 10, 1.0), ("A", 20, 2.0)]


def test_asof_no_by_keys(spark, trades, quotes):
    out = asof_join(
        trades.filter("sym = 'A'").drop("sym"),
        quotes.filter("sym = 'A'").drop("sym"),
        on="t",
        how="inner",
    )
    assert rows(out, "qty", "right_px") == [(10, 1.0), (20, 2.0), (30, 3.0)]


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(1, 0.5), (2, 10.0), (3, 15.0), (4, 25.0), (5, 99.0)], "id bigint, x double"
    )


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [("r1", 0.0, 10.0), ("r2", 10.0, 20.0), ("r3", 5.0, 30.0)],
        "name string, lo double, hi double",
    )


def test_range_join_half_open(spark, points, intervals):
    out = range_join(points, intervals, point="x", lower="lo", upper="hi",
                     bucket_width=10.0)
    assert rows(out, "id", "name") == [
        (1, "r1"),
        (2, "r2"),  # 10.0 excluded from r1's [0,10), included in r2
        (2, "r3"),
        (3, "r2"),
        (3, "r3"),
        (4, "r3"),
    ]


def test_range_join_closed_bounds(spark, points, intervals):
    out = range_join(points, intervals, point="x", lower="lo", upper="hi",
                     bucket_width=10.0, bounds="[]")
    assert (2, "r1") in rows(out, "id", "name")  # 10.0 == hi now matches


def test_range_join_exactly_once(spark, points, intervals):
    # wide intervals spanning many buckets must not duplicate pairs
    out = range_join(points, intervals, point="x", lower="lo", upper="hi",
                     bucket_width=2.0)
    got = rows(out, "id", "name")
    assert len(got) == len(set(got)) == 6


def test_salted_join_matches_unsalted(spark):
    from config_driven_pyspark_spark.operators.relational import salted_join

    # skewed left: 900 of 1000 rows share key 7
    left = spark.range(1000).selectExpr(
        "CASE WHEN id < 900 THEN 7 ELSE id END AS k", "id AS lv"
    )
    right = spark.range(50).selectExpr("id AS k", "id * 100 AS rv")
    plain = left.join(right, on="k", how="inner")
    salted = salted_join(left, right, on=["k"], how="inner", salt=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    from config_driven_pyspark_spark.operators.relational import salted_join

    left = spark.range(10).selectExpr("id AS k", "id AS lv")
    right = spark.range(3).selectExpr("id AS k", "id * 100 AS rv")
    plain = left.join(right, on="k", how="left")
    salted = salted_join(left, right, on=["k"], how="left", salt=4)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_range_join_with_by_keys(spark):
    pts = spark.createDataFrame(
        [("u1", 5.0), ("u2", 5.0)], "grp string, x double"
    )
    ivs = spark.createDataFrame(
        [("u1", 0.0, 10.0)], "grp string, lo double, hi double"
    )
    out = range_join(pts, ivs, point="x", lower="lo", upper="hi",
                     by=["grp"], bucket_width=10.0)
    assert rows(out, "grp", "x") == [("u1", 5.0)]


def test_asof_right_on_in_by_rejected(spark, trades, quotes):
    with pytest.raises(ValueError, match="cannot also be a `by` key"):
        asof_join(trades, quotes, on="t", by=["sym", "t"], right_on="t")


# -- streaming_asof_join (batch-mode semantics) ------------------------------


def test_streaming_asof_matches_asof_in_batch(spark, trades, quotes):
    """On batch inputs the interval-join+max_by formulation must equal the
    union+window asof_join with the same (backward, tolerance) contract."""
    from config_driven_pyspark_spark.operators.joins import streaming_asof_join

    ref = asof_join(trades, quotes, on="t", by=["sym"],
                    tolerance="3 minutes", how="left")
    out = streaming_asof_join(trades, quotes, on="t", tolerance="3 minutes",
                              left_id="qty", by=["sym"])
    cols = ("sym", "qty", "right_px")
    assert rows(out, *cols) == rows(ref, *cols)


def test_streaming_asof_tolerance_edge_inclusive(spark, trades, quotes):
    from config_driven_pyspark_spark.operators.joins import streaming_asof_join

    # A@12:01 vs quote@12:00 is exactly the 1-minute horizon: inclusive
    out = streaming_asof_join(trades, quotes, on="t", tolerance="1 minute",
                              left_id="qty", by=["sym"], how="inner")
    got = rows(out, "sym", "qty", "right_px")
    assert ("A", 10, 1.0) in got
    # A@12:09's nearest quote is 12:07 (2 min away): outside, dropped
    assert all(q != 30 for _, q, _ in got)


def test_streaming_asof_inner_drops_unmatched(spark, trades, quotes):
    from config_driven_pyspark_spark.operators.joins import streaming_asof_join

    out = streaming_asof_join(trades, quotes, on="t", tolerance="10 minutes",
                              left_id="qty", by=["sym"], how="inner")
    assert all(s == "A" for s, *_ in rows(out, "sym", "qty", "right_px"))


def test_streaming_asof_requires_valid_left_id(spark, trades, quotes):
    from config_driven_pyspark_spark.operators.joins import streaming_asof_join

    with pytest.raises(ValueError, match="left_id"):
        streaming_asof_join(trades, quotes, on="t", tolerance="1 minute",
                            left_id="nope", by=["sym"])


def test_streaming_asof_tie_break_deterministic(spark):
    """Two right rows at the identical winning timestamp: tie_break picks
    the larger value of the named payload column, every run."""
    from datetime import datetime

    from config_driven_pyspark_spark.operators.joins import streaming_asof_join

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, "A", t0)], "lid bigint, k string, t timestamp")
    right = spark.createDataFrame(
        [("A", t0, 100), ("A", t0, 200)], "k string, t timestamp, rid bigint"
    )
    out = streaming_asof_join(left, right, on="t", tolerance="5 minutes",
                              left_id="lid", by=["k"], tie_break="rid")
    assert rows(out, "lid", "right_rid") == [(1, 200)]
    with pytest.raises(ValueError, match="tie_break"):
        streaming_asof_join(left, right, on="t", tolerance="5 minutes",
                            left_id="lid", by=["k"], tie_break="nope")


def test_streaming_asof_reserved_by_alias_rejected(spark):
    from datetime import datetime

    from config_driven_pyspark_spark.operators.joins import streaming_asof_join

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, "A", t0, "x")], "lid bigint, k string, t timestamp, __rb0 string"
    )
    right = spark.createDataFrame(
        [("A", t0, 1.0)], "k string, t timestamp, px double"
    )
    with pytest.raises(ValueError, match="reserves column names"):
        streaming_asof_join(left, right, on="t", tolerance="1 minute",
                            left_id="lid", by=["k"])
