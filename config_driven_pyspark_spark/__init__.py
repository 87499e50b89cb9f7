"""config_driven_pyspark_spark — a config-driven, PySpark-native analytics engine.

A brand-new Spark-first implementation of the capabilities of the reference
library ``timkins666/config-driven-pyspark`` (a nested-field transformation
engine for PySpark DataFrames), extended into a full declarative pipeline:
sources, nested transforms, relational operators (filter/join/aggregate/
window/sort/set-ops), LLM-data operators (dedup, similarity search, text
analysis, multimodal columns), sinks, and Structured Streaming variants.

Design stance (see SURVEY.md §7): the engine is a *plan compiler*, not an
executor. Config → small Python IR → native DataFrame/Column calls → Catalyst
and Tungsten do the rest. No RDDs, no row-at-a-time Python UDFs on hot paths,
no custom Catalyst rules. Everything is designed to hold up at 100 TB on a
real cluster: broadcast hints for dims, map-side-combinable aggregations,
salting/LSH banding for skew, filters expressed declaratively so parquet
pushdown and partition pruning apply.
"""

from config_driven_pyspark_spark.schema import flatten_schema, limit_depth
from config_driven_pyspark_spark.functions.registry import FunctionRegistry
from config_driven_pyspark_spark.operators.transform import NestedTransformer
from config_driven_pyspark_spark.pipeline import Pipeline
from config_driven_pyspark_spark.session import build_session

__all__ = [
    "flatten_schema",
    "limit_depth",
    "FunctionRegistry",
    "NestedTransformer",
    "Pipeline",
    "build_session",
]

__version__ = "0.1.0"
