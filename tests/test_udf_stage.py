"""Tests for the ``udf`` stage — registered Arrow-batched pandas UDFs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark import Pipeline
from tests.conftest import to_df


def test_udf_stage_matches_column_expr(spark):
    df_rows = [{"id": i, "v": i * 1.5} for i in range(20)]
    p = Pipeline.from_config([
        {"stage": "udf", "fn": "affine", "args": ["v"], "alias": "out"},
    ])
    p.register_udf("affine", lambda s: s * 2.0 + 1.0, "double")
    ctx_df = to_df(spark, df_rows)
    # drive the stage directly off an in-memory frame via sql view source
    ctx_df.createOrReplaceTempView("t_udf_in")
    p.stages.insert(0, {"stage": "sql", "query": "SELECT * FROM t_udf_in"})
    got = p.run(spark).select("id", "out").collect()
    want = ctx_df.select("id", (F.col("v") * 2.0 + 1.0).alias("out")).collect()
    assert sorted(got) == sorted(want)


def test_udf_stage_multi_arg_and_expr_args(spark):
    df = to_df(spark, [{"a": 2, "b": 3}, {"a": 5, "b": 7}])
    df.createOrReplaceTempView("t_udf_in2")
    p = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_udf_in2"},
        {"stage": "udf", "fn": "mix", "args": ["a", "b + 1"], "alias": "m"},
    ])
    p.register_udf("mix", lambda a, b: a * b, "bigint")
    assert sorted(r["m"] for r in p.run(spark).collect()) == [8, 40]


def test_udf_stage_unregistered_errors(spark):
    df = to_df(spark, [{"a": 1}])
    df.createOrReplaceTempView("t_udf_in3")
    p = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_udf_in3"},
        {"stage": "udf", "fn": "ghost", "args": ["a"], "alias": "x"},
    ])
    with pytest.raises(ValueError, match="Unknown UDF"):
        p.run(spark)


def test_grouped_map_stage(spark):
    rows = [{"g": g, "v": v} for g in (1, 2) for v in (5, 3, 9, 1)]
    df = to_df(spark, rows)
    df.createOrReplaceTempView("t_gm_in")

    def min_two(pdf):
        pdf = pdf.sort_values("v").head(2)
        return pdf.assign(rn=range(1, len(pdf) + 1))[["g", "v", "rn"]]

    p = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_gm_in"},
        {"stage": "grouped_map", "group_by": ["g"], "fn": "min_two"},
    ])
    p.register_grouped_udf("min_two", min_two, "g bigint, v bigint, rn bigint")
    got = sorted((r["g"], r["v"], r["rn"]) for r in p.run(spark).collect())
    assert got == [(1, 1, 1), (1, 3, 2), (2, 1, 1), (2, 3, 2)]


def test_grouped_map_unregistered_errors(spark):
    df = to_df(spark, [{"g": 1, "v": 1}])
    df.createOrReplaceTempView("t_gm_in2")
    p = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_gm_in2"},
        {"stage": "grouped_map", "group_by": ["g"], "fn": "ghost"},
    ])
    with pytest.raises(ValueError, match="Unknown grouped UDF"):
        p.run(spark)


def test_flat_map_stage_expands_and_contracts(spark):
    """A flat-map may emit 0..n rows per input row: 'a b' → 2 token rows,
    '' → none; output schema is the declared one, not the input's."""
    rows = [{"doc_id": 1, "text": "a b"}, {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "c"}]
    df = to_df(spark, rows)
    df.createOrReplaceTempView("t_fm_in")

    def toks(batches):
        import pandas as pd

        for pdf in batches:
            ids, pos, out = [], [], []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                words = (t or "").split()
                ids.extend([i] * len(words))
                pos.extend(range(1, len(words) + 1))
                out.extend(words)
            yield pd.DataFrame({"doc_id": ids, "pos": pos, "token": out})

    p = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_fm_in"},
        {"stage": "flat_map", "fn": "toks"},
    ])
    p.register_flat_map("toks", toks, "doc_id bigint, pos bigint, token string")
    out = p.run(spark)
    assert out.columns == ["doc_id", "pos", "token"]
    got = sorted((r["doc_id"], r["pos"], r["token"]) for r in out.collect())
    assert got == [(1, 1, "a"), (1, 2, "b"), (3, 1, "c")]


def test_flat_map_unregistered_errors(spark):
    df = to_df(spark, [{"a": 1}])
    df.createOrReplaceTempView("t_fm_in2")
    p = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_fm_in2"},
        {"stage": "flat_map", "fn": "ghost"},
    ])
    with pytest.raises(ValueError, match="Unknown flat-map"):
        p.run(spark)


def test_udaf_stage_grouped_agg(spark):
    df = to_df(spark, [
        {"k": "a", "v": 1.0}, {"k": "a", "v": 3.0}, {"k": "a", "v": 100.0},
        {"k": "b", "v": 7.0},
    ])
    df.createOrReplaceTempView("t_udaf_in")
    p = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_udaf_in"},
        {"stage": "aggregate", "group_by": ["k"],
         "aggs": {"med": "py_med(v)", "n": "py_n(v)"}},
    ])
    p.register_udaf("py_med", lambda s: float(s.median()), "double")
    p.register_udaf("py_n", lambda s: int(s.size), "bigint")
    rows = {r["k"]: r for r in p.run(spark).collect()}
    assert rows["a"]["med"] == 3.0 and rows["a"]["n"] == 3
    assert rows["b"]["med"] == 7.0 and rows["b"]["n"] == 1


def test_udaf_two_column_args(spark):
    df = to_df(spark, [
        {"k": "a", "x": 1.0, "w": 1.0}, {"k": "a", "x": 3.0, "w": 3.0},
    ])
    df.createOrReplaceTempView("t_udaf_in2")
    p = Pipeline.from_config([
        {"stage": "sql", "query": "SELECT * FROM t_udaf_in2"},
        {"stage": "aggregate", "group_by": ["k"],
         "aggs": {"wm": "py_wmean(x, w)"}},
    ])
    p.register_udaf(
        "py_wmean", lambda x, w: float((x * w).sum() / w.sum()), "double"
    )
    [r] = p.run(spark).collect()
    assert r["wm"] == pytest.approx((1.0 + 9.0) / 4.0)
