"""Structured Streaming stages: watermark, time/session windows, streaming
dedup, stateful ops, and stream sinks — the same declarative config surface
as the batch stages (SURVEY.md §2C "streaming" row; §7 step 5)."""

from config_driven_pyspark_spark.streaming.stages import (  # noqa: F401
    stage_session_window,
    stage_stateful,
    stage_stream_dedup,
    stage_stream_sink,
    stage_time_window,
    stage_watermark,
)
