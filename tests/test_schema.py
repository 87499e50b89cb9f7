"""Goldens for flatten_schema / limit_depth.

Ports the reference's util tests (``/root/reference/test/test_utils.py:5-59``
via FIXTURES.md §A5) plus the nested array<array> edge the reference gets
wrong (SURVEY.md §1.2).
"""

from __future__ import annotations

import pytest

from config_driven_pyspark_spark.schema import flatten_schema, limit_depth
from tests.conftest import to_df


def test_flatten_schema_golden(spark):
    df = to_df(
        spark,
        {
            "id": 1,
            "name": "Rex",
            "address": {"city": "Springfield", "street": "Main"},
            "pets": [
                {
                    "name": "Fido",
                    "face": {
                        "nose": "wet",
                        "eyes": [{"colour": "brown", "which": "left"}],
                    },
                }
            ],
        },
    )
    # JSON inference alphabetizes fields at every level
    assert flatten_schema(df) == [
        "address.city",
        "address.street",
        "id",
        "name",
        "pets[].face.eyes[].colour",
        "pets[].face.eyes[].which",
        "pets[].face.nose",
        "pets[].name",
    ]


def test_flatten_schema_nested_array_tokens(spark):
    df = to_df(spark, {"aa": [[1, 2], [3]], "plain": [1]})
    assert flatten_schema(df) == ["aa[][]", "plain[]"]


def test_flatten_schema_from_ddl(spark):
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(
        "m map<string,int>, s struct<a: array<struct<b: int>>>"
    )
    # maps carry a {} token and recurse into values; arrays of structs recurse
    assert flatten_schema(schema) == ["m{}", "s.a[].b"]


@pytest.mark.parametrize(
    ("field", "depth", "expected"),
    [
        ("a.b.c", -1, "a.b"),
        ("a.b.c", 1, "a"),
        ("a.b.c", 2, "a.b"),
        ("a.b.c", 99, "a.b.c"),
        ("a.b[].c", "x.y", "a.b[]"),
        ("a", -1, ""),
        ("a.b[].c.d", "q.r.s", "a.b[].c"),
    ],
)
def test_limit_depth(field, depth, expected):
    assert limit_depth(field, depth) == expected
