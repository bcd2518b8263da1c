"""Structured Streaming surface (the reference only sketches streaming
in DEV_NOTES.md "deploy/batch" ideas — zero implementation)."""

from chapterhousedb_spark.streaming.batcher import (
    read_event_stream,
    run_available_now,
    sessionize_stream,
    windowed_counts,
)

__all__ = [
    "read_event_stream",
    "run_available_now",
    "sessionize_stream",
    "windowed_counts",
]
