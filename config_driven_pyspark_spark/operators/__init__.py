"""Operators: nested transform engine, relational stages, LLM-data stages."""

from config_driven_pyspark_spark.operators.transform import NestedTransformer

__all__ = ["NestedTransformer"]
