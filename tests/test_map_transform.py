"""MapType traversal in the nested transform engine (SURVEY.md §1.2
parity-plus: the reference raises KeyError on maps; here map-valued paths
continue into the value type and lower to ``transform_values``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark.operators.transform import NestedTransformer
from config_driven_pyspark_spark.schema import flatten_schema, wrappers_of


@pytest.fixture()
def map_df(spark):
    return spark.createDataFrame(
        [
            (1, {"a": " x ", "b": "y"}, {"k": {"inner": " v "}}, {"m": [1, 2]}),
        ],
        "id bigint, tags map<string,string>, "
        "nested map<string, struct<inner: string>>, arr map<string, array<int>>",
    )


def test_flatten_schema_map_tokens(map_df):
    assert flatten_schema(map_df) == [
        "id",
        "tags{}",
        "nested{}.inner",
        "arr{}[]",
    ]


def test_wrappers_of_orders_tokens():
    assert wrappers_of("x[]{}") == ("a", "m")
    assert wrappers_of("x{}[]") == ("m", "a")
    assert wrappers_of("x[][]") == ("a", "a")
    assert wrappers_of("plain") == ()


def test_map_value_transform(spark, map_df):
    out = NestedTransformer().add("tags", "trim").apply(map_df).first()
    assert out["tags"] == {"a": "x", "b": "y"}


def test_map_struct_member_transform(spark, map_df):
    out = NestedTransformer().add("nested.inner", "trim").apply(map_df).first()
    assert out["nested"]["k"]["inner"] == "v"


def test_map_of_array_elements(spark, map_df):
    out = (
        NestedTransformer()
        .add("arr", lambda x: x * 10)
        .apply(map_df)
        .first()
    )
    assert out["arr"] == {"m": [10, 20]}


def test_map_keys_via_new_root_column(spark, map_df):
    """Map paths always address *values* (mirroring the reference rule that
    array functions see elements, never the array Column —
    functioniser.py:96-110). Whole-map ops like transform_keys use the
    other-column-reference pattern (README.md:36-41 semantics): a created
    root whose function ignores its dummy ctx and reads the map by name."""
    out = (
        NestedTransformer()
        .add(
            "tags_upper",
            lambda _: F.transform_keys(F.col("tags"), lambda k, _v: F.upper(k)),
        )
        .apply(map_df)
        .first()
    )
    assert set(out["tags_upper"]) == {"A", "B"}
    assert out["tags"] == {"a": " x ", "b": "y"}  # original untouched


def test_untouched_map_passes_through(spark, map_df):
    out = NestedTransformer().add("id", lambda c: c + 1).apply(map_df).first()
    assert out["tags"] == {"a": " x ", "b": "y"}
    assert out["id"] == 2


# -- the {keys} path token ---------------------------------------------------


def test_map_keys_token_rewrites_keys(spark, map_df):
    out = NestedTransformer().add("tags.{keys}", "upper").apply(map_df).first()
    assert out["tags"] == {"A": " x ", "B": "y"}


def test_map_keys_token_composes_with_value_path(spark, map_df):
    """Key and value transforms on the same map node apply independently."""
    out = (
        NestedTransformer()
        .add("tags", "trim")
        .add("tags.{keys}", "upper")
        .apply(map_df)
        .first()
    )
    assert out["tags"] == {"A": "x", "B": "y"}


def test_map_keys_token_repeat_add_composes(spark, map_df):
    out = (
        NestedTransformer()
        .add("tags.{keys}", "upper")
        .add("tags.{keys}", lambda k: F.concat(k, F.lit("!")))
        .apply(map_df)
        .first()
    )
    assert out["tags"] == {"A!": " x ", "B!": "y"}


def test_map_keys_token_through_array_of_maps(spark):
    df = spark.createDataFrame(
        [(1, [{"a": 1}, {"b": 2}])],
        "id bigint, aom array<map<string,int>>",
    )
    out = NestedTransformer().add("aom.{keys}", "upper").apply(df).first()
    assert out["aom"] == [{"A": 1}, {"B": 2}]


def test_map_keys_token_on_map_of_structs(spark, map_df):
    """Keys of a map whose values are structs — value paths continue to work
    beside the key rewrite."""
    out = (
        NestedTransformer()
        .add("nested.inner", "trim")
        .add("nested.{keys}", "upper")
        .apply(map_df)
        .first()
    )
    assert set(out["nested"]) == {"K"}
    assert out["nested"]["K"]["inner"] == "v"


def test_map_keys_token_non_map_raises(spark, map_df):
    with pytest.raises(ValueError, match="not map-typed"):
        NestedTransformer().add("id.{keys}", "upper").apply(map_df)


def test_map_keys_token_missing_parent_raises(spark, map_df):
    with pytest.raises(ValueError, match="not found"):
        NestedTransformer().add("ghost.{keys}", "upper").apply(map_df)
