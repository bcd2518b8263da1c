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
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_CALL_RE = re.compile(r"\bread_files\s*\(", re.IGNORECASE)
# first positional arg: '<glob>'; optional named arg connection=>'<name>'
_ARGS_RE = re.compile(
    r"^\s*'(?P<glob>(?:[^']|'')+)'\s*"
    r"(?:,\s*connection\s*=>\s*'(?P<conn>(?:[^']|'')+)'\s*)?$",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class ReadFilesCall:
    """One parsed read_files() call site."""

    glob: str
    connection: str | None
    view_name: str


class ReadFilesSyntaxError(ValueError):
    """Bad read_files() arguments (mirrors the reference's
    ReadFilesConfig::parse_config errors, read_files_task.rs:65-114)."""


def _scan_literal_spans(sql: str) -> list[tuple[int, int]]:
    """Spans of string literals/comments where calls must be ignored."""
    spans = []
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, j + 1))
            i = j + 1
        elif sql[i : i + 2] == "--":
            j = sql.find("\n", i)
            j = n if j == -1 else j
            spans.append((i, j))
            i = j
        elif sql[i : i + 2] == "/*":
            j = sql.find("*/", i + 2)
            j = n if j == -1 else j + 2
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


def rewrite_read_files(
    sql: str, view_prefix: str = "__read_files"
) -> tuple[str, list[ReadFilesCall]]:
    """Replace every read_files(...) call with a generated view name.

    Returns (rewritten_sql, calls); the caller registers each call's
    resolved glob as a temp view named call.view_name before execution.
    """
    spans = _scan_literal_spans(sql)

    def in_literal(pos: int) -> bool:
        return any(a <= pos < b for a, b in spans)

    out: list[str] = []
    calls: list[ReadFilesCall] = []
    last = 0
    for m in _CALL_RE.finditer(sql):
        if in_literal(m.start()):
            continue
        # find the matching close paren, honoring quotes
        depth, i, n = 1, m.end(), len(sql)
        while i < n and depth:
            c = sql[i]
            if c == "'":
                j = i + 1
                while j < n:
                    if sql[j] == "'":
                        if j + 1 < n and sql[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
                i = j + 1
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        if depth:
            raise ReadFilesSyntaxError("unterminated read_files(...) call")
        arg_text = sql[m.end() : i - 1]
        am = _ARGS_RE.match(arg_text)
        if not am:
            raise ReadFilesSyntaxError(
                f"read_files arguments must be '<glob>' [, connection=>'<name>']; got: {arg_text!r}"
            )
        glob = am.group("glob").replace("''", "'")
        conn = am.group("conn")
        view = f"{view_prefix}_{len(calls)}"
        calls.append(ReadFilesCall(glob=glob, connection=conn, view_name=view))
        out.append(sql[last : m.start()])
        out.append(view)
        last = i
    out.append(sql[last:])
    return "".join(out), calls
