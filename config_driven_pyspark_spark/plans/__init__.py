"""Logical IR for nested-field transforms and its lowering to Column trees."""

from config_driven_pyspark_spark.plans.path_tree import PathNode, build_path_tree
from config_driven_pyspark_spark.plans.lowering import lower_root

__all__ = ["PathNode", "build_path_tree", "lower_root"]
