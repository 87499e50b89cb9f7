"""Column-function registry and domain function libraries (text, vectors)."""

from config_driven_pyspark_spark.functions.registry import FunctionRegistry

__all__ = ["FunctionRegistry"]
