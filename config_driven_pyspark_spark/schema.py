"""Schema flattening and path-depth utilities.

Parity target: ``/root/reference/src/config_driven_pyspark/utils.py:6-48``
(``flatten_schema`` and ``limit_depth``). This implementation walks the
``StructType`` object tree directly instead of ``df.schema.jsonValue()``;
output format is identical: a list of dotted paths in schema order, with
``[]`` appended to a segment once per array level (so ``array<array<long>>``
named ``aa`` flattens to ``aa[][]``).

Unlike the reference (which raises ``KeyError`` on maps because a map's JSON
node has no ``fields`` key), ``MapType`` is traversed: a map-typed segment
carries a ``{}`` token per map level and paths continue into the map's
*value* type, lowered with ``F.transform_values`` (SURVEY.md §1.2
parity-plus). Wrapper tokens are ordered — ``array<map<...>>`` flattens to
``seg[]{}``, ``map<array<...>>`` to ``seg{}[]`` — because the lowering must
nest ``transform`` / ``transform_values`` in that order. Map *keys* are
addressable with the ``{keys}`` path token (``some.map.{keys}`` →
``F.transform_keys`` at that node's first map level —
``plans/path_tree.py``); whole-map leaf functions remain available for
anything fancier.
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
        while True:
            if isinstance(dtype, T.ArrayType):
                path += "[]"
                dtype = dtype.elementType
            elif isinstance(dtype, T.MapType):
                path += "{}"
                dtype = dtype.valueType
            else:
                break
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


def wrappers_of(segment: str) -> tuple[str, ...]:
    """Ordered container wrappers on a segment: ``'a'`` per ``[]`` (array)
    and ``'m'`` per ``{}`` (map), outermost first (``x[]{}`` → ``('a','m')``)."""
    out: list[str] = []
    i = 0
    while i < len(segment) - 1:
        pair = segment[i : i + 2]
        if pair == "[]":
            out.append("a")
            i += 2
        elif pair == "{}":
            out.append("m")
            i += 2
        else:
            i += 1
    return tuple(out)


def strip_brackets(segment: str) -> str:
    """Remove ``[]`` / ``{}`` tokens from a path segment."""
    return segment.replace("[]", "").replace("{}", "")
