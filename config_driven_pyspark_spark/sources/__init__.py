"""Source and sink stages (batch + streaming readers/writers)."""

from config_driven_pyspark_spark.sources.readers import stage_source
from config_driven_pyspark_spark.sources.writers import stage_sink

__all__ = ["stage_source", "stage_sink"]
