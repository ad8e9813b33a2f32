"""Structured Streaming extension (SURVEY §2.12 — engine-native, the
reference is batch-only)."""

from methyl_data_pipeline_spark.streaming.events import (  # noqa: F401
    windowed_event_counts,
    windowed_event_counts_batch,
    sessionize_batch,
    stream_events_from_parquet,
)
