"""Query status enum, in a Spark-free module: the thin client path
(server.QueryClient / RemoteEngine, CLI --connect) shares the enum
with the engine without importing pyspark — the reference's TCP
client is similarly engine-free (async_query_client.rs depends only
on the message types, query_handler_state.rs:28-35)."""

from __future__ import annotations

import enum


class QueryStatus(enum.Enum):
    """Mirrors the reference's Status enum (query_handler_state.rs:28-35)."""

    QUEUED = "queued"
    RUNNING = "running"
    COMPLETE = "complete"
    ERROR = "error"

    def terminal(self) -> bool:
        return self in (QueryStatus.COMPLETE, QueryStatus.ERROR)
