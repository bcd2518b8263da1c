"""Structured Streaming surface (the reference only sketches streaming
in DEV_NOTES.md "deploy/batch" ideas — zero implementation)."""

from chapterhousedb_spark.streaming.batcher import (
    asof_enrich_stream,
    dedup_stream,
    enrich_stream,
    init_versioned_base,
    interval_join_streams,
    interval_join_streams_outer,
    list_versions,
    merge_stream,
    quota_stream,
    read_event_stream,
    read_versioned_base,
    rollup_stream,
    run_available_now,
    sessionize_stream,
    vacuum_versions,
    windowed_counts,
)

__all__ = [
    "asof_enrich_stream",
    "dedup_stream",
    "enrich_stream",
    "init_versioned_base",
    "interval_join_streams",
    "interval_join_streams_outer",
    "list_versions",
    "merge_stream",
    "quota_stream",
    "read_event_stream",
    "read_versioned_base",
    "rollup_stream",
    "run_available_now",
    "sessionize_stream",
    "vacuum_versions",
    "windowed_counts",
]
