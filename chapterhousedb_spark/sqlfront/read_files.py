"""Rewrite of the `read_files('<glob>' [, connection=>'<name>'])` table function.

The reference implements read_files as a registered table-function task
that lists storage by glob prefix and streams parquet batches (reference
src/handlers/operator_handler/operators/table_func_tasks/read_files_task.rs:65-114
for arg parsing, 156-232 for the list+match loop). Spark reads parquet
globs natively, so the whole operator collapses to a pre-parse rewrite:
each call site becomes a generated table reference and the engine
registers `spark.read.parquet(resolved_glob)` as a temp view under that
name. Catalyst then gets predicate pushdown, column pruning and
partition pruning on the scan for free (all absent in the reference —
SURVEY.md §4.1).

This module is now a thin compatibility wrapper over the generic
table-function registry (sqlfront/table_funcs.py), which is the actual
extension point mirroring the reference's operator_task_registry.
"""

from __future__ import annotations

from dataclasses import dataclass

from chapterhousedb_spark.sqlfront.table_funcs import (
    READ_FILES,
    TableFuncSyntaxError,
    rewrite_table_funcs,
)


class ReadFilesSyntaxError(TableFuncSyntaxError):
    """Bad read_files() arguments (mirrors the reference's
    ReadFilesConfig::parse_config errors, read_files_task.rs:65-114)."""


@dataclass(frozen=True)
class ReadFilesCall:
    """One parsed read_files() call site."""

    glob: str
    connection: str | None
    view_name: str


def rewrite_read_files(
    sql: str, view_prefix: str = "__read_files"
) -> tuple[str, list[ReadFilesCall]]:
    """Replace every read_files(...) call with a generated view name.

    Returns (rewritten_sql, calls); the caller registers each call's
    resolved glob as a temp view named call.view_name before execution.
    """
    try:
        rewritten, calls = rewrite_table_funcs(sql, ["read_files"], view_prefix)
        for call in calls:
            READ_FILES.validate(call)
    except ReadFilesSyntaxError:
        raise
    except TableFuncSyntaxError as exc:
        raise ReadFilesSyntaxError(str(exc)) from exc
    return rewritten, [
        ReadFilesCall(glob=c.glob, connection=c.connection, view_name=c.view_name)
        for c in calls
    ]
