"""String-name → Column-function registry.

Parity target: the reference's builtin-surface snapshot and custom registry
(``/root/reference/src/config_driven_pyspark/functioniser.py:19-23,198-207``,
lookup precedence ``:38-44``):

- the entire public ``pyspark.sql.functions`` namespace is callable by name
  from config;
- user registrations *shadow* builtins of the same name;
- registering anything that is neither a ``Column`` nor callable is a
  ``ValueError``; resolving an unknown string name is a ``ValueError``.

Functions here are *Column builders* (``Callable[[Column], Column]``) — they
construct native Catalyst expressions on the driver. They are NOT serialized
Python UDFs, so the hot path stays JVM-side at any scale.
"""

from __future__ import annotations

import inspect
from typing import Callable, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

DfFunction = Callable[[Column], Column]
FunctionLike = Union[str, Column, DfFunction]


def _snapshot_builtins() -> dict[str, DfFunction]:
    """Snapshot every public function in ``pyspark.sql.functions``."""
    return {
        name: fn
        for name, fn in inspect.getmembers(F, inspect.isfunction)
        if not name.startswith("_")
    }


def _engine_functions() -> dict[str, DfFunction]:
    """The engine's own single-arg Column functions (text ops: redact,
    fingerprint, lang_id, quality_score, …) — callable by name anywhere a
    Spark builtin is, e.g. nested-transform ``fields``. Imported lazily so
    the registry module has no import-order dependency."""
    from config_driven_pyspark_spark.functions.text import _TEXT_OPS

    return dict(_TEXT_OPS)


class FunctionRegistry:
    """Resolves config values (string name / Column / callable) to Column
    functions. Name precedence: user registrations, then engine text ops,
    then the ``pyspark.sql.functions`` snapshot."""

    _builtins: dict[str, DfFunction] = _snapshot_builtins()
    _engine: dict[str, DfFunction] = {}

    def __init__(self) -> None:
        self._custom: dict[str, Union[Column, DfFunction]] = {}
        if not FunctionRegistry._engine:
            FunctionRegistry._engine = _engine_functions()

    def register(self, name: str, func: Union[Column, DfFunction]) -> None:
        """Register a custom function usable by name; shadows Spark builtins."""
        if not (isinstance(func, Column) or callable(func)):
            raise ValueError(f"Function {name} must be a Column or callable")
        self._custom[name] = func

    def resolve(self, function: FunctionLike) -> DfFunction:
        """Resolve a config value to a ``Column -> Column`` callable.

        Strings look up the custom registry first, then the builtin snapshot
        (``ValueError`` if absent). A bare ``Column`` becomes a constant
        function that ignores its input (the reference wraps identically —
        ``functioniser.py:46-48``).
        """
        if isinstance(function, str):
            if function in self._custom:
                function = self._custom[function]
            elif function in self._engine:
                function = self._engine[function]
            elif function in self._builtins:
                function = self._builtins[function]
            else:
                raise ValueError(f"Function {function} not found")
        if isinstance(function, Column):
            constant = function
            return lambda _ignored: constant
        return function

    @classmethod
    def builtin_names(cls) -> list[str]:
        """All Spark builtin function names callable by config string."""
        return sorted(cls._builtins)


def compose(first: DfFunction, then: DfFunction) -> DfFunction:
    """Compose two Column functions: result applies ``then(first(col))``.

    Matches the reference's repeat-``add`` composition order
    (``functioniser.py:50-52``; pinned by
    ``test_functioniser.py:176-184`` — add ``lower`` then ``trim`` ⇒
    ``trim(lower(x))``).
    """
    return lambda col: then(first(col))
