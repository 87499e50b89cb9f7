"""Schema flattening and path-depth utilities.

Parity target: ``/root/reference/src/config_driven_pyspark/utils.py:6-48``
(``flatten_schema`` and ``limit_depth``). This implementation walks the
``StructType`` object tree directly instead of ``df.schema.jsonValue()``;
output format is identical: a list of dotted paths in schema order, with
``[]`` appended to a segment once per array level (so ``array<array<long>>``
named ``aa`` flattens to ``aa[][]``).

Unlike the reference, ``MapType`` is treated as an opaque leaf (the reference
raises ``KeyError`` on maps because a map's JSON node has no ``fields`` key);
any non-struct, non-array type is a leaf here.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def flatten_schema(df_or_schema: Union[DataFrame, T.StructType]) -> list[str]:
    """Flatten a DataFrame schema to a list of ``root.mid[].leaf`` strings.

    Array-typed segments carry one ``[]`` token per array level. Order is
    schema order (depth-first), matching the reference's convention
    (``/root/reference/src/config_driven_pyspark/utils.py:6-31``; golden
    output at ``/root/reference/test/test_utils.py:34-43``).
    """
    schema = df_or_schema.schema if isinstance(df_or_schema, DataFrame) else df_or_schema
    out: list[str] = []

    def walk(path: str, dtype: T.DataType) -> None:
        while isinstance(dtype, T.ArrayType):
            path += "[]"
            dtype = dtype.elementType
        if isinstance(dtype, T.StructType):
            for field in dtype.fields:
                walk(f"{path}.{field.name}" if path else field.name, field.dataType)
        else:
            out.append(path)

    for field in schema.fields:
        walk(field.name, field.dataType)
    return out


def limit_depth(field: str, depth: Union[int, str] = -1) -> str:
    """Truncate a dotted path to ``depth`` segments.

    ``depth=-1`` → up to the final parent; a string ``depth`` → match that
    path's segment count. Parity:
    ``/root/reference/src/config_driven_pyspark/utils.py:34-48``.
    """
    parts = field.split(".")
    if depth == -1:
        depth = len(parts) - 1
    elif isinstance(depth, str):
        depth = depth.count(".") + 1
    return ".".join(parts[:depth])


def array_depth_of(segment: str) -> int:
    """Number of array levels a flattened-path segment carries (``a[][]`` → 2)."""
    return segment.count("[]")


def strip_brackets(segment: str) -> str:
    """Remove ``[]`` tokens from a path segment."""
    return segment.replace("[]", "")
