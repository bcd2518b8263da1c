"""Property-based tests (hypothesis) for the SQL front door.

The splitter and rewriter are hand-rolled scanners (quote/comment state
machines); properties catch the corner cases example tests miss:
statement round-trips, quote-escape handling in globs, literals never
rewritten.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from chapterhousedb_spark.sqlfront import (
    rewrite_read_files,
    split_statements,
)

# statement bodies free of splitter-significant characters
_plain = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" _,()=<>."
    ),
    min_size=1,
    max_size=60,
).filter(lambda s: s.strip())

# glob paths, including single quotes (embedded doubled) and glob chars
_glob = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Nd"), whitelist_characters="/*.?_-'"
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_plain, min_size=1, max_size=8))
def test_split_round_trips_plain_statements(stmts):
    joined = "; ".join(stmts)
    assert split_statements(joined) == [s.strip() for s in stmts]


@settings(max_examples=200, deadline=None)
@given(_plain, _plain)
def test_split_ignores_semicolons_inside_literals(a, b):
    text = f"select '{a.replace(chr(39), '')}; not a split' as x; select {b}"
    out = split_statements(text)
    assert len(out) == 2
    assert out[0].endswith("as x")


@settings(max_examples=300, deadline=None)
@given(st.lists(_glob, min_size=1, max_size=4))
def test_rewrite_recovers_planted_globs(globs):
    calls_sql = ", ".join(
        f"read_files('{g.replace(chr(39), chr(39) * 2)}') t{i}"
        for i, g in enumerate(globs)
    )
    sql = f"select * from {calls_sql}"
    rewritten, calls = rewrite_read_files(sql, view_prefix="__v")
    assert [c.glob for c in calls] == globs
    assert "read_files" not in rewritten.lower()  # every call site replaced
    for c in calls:
        assert c.view_name in rewritten


@settings(max_examples=200, deadline=None)
@given(_glob)
def test_rewrite_never_touches_string_literals(g):
    lit = f"read_files('{g.replace(chr(39), chr(39) * 2)}')"
    sql = f"select '{lit.replace(chr(39), chr(39) * 2)}' as s"
    rewritten, calls = rewrite_read_files(sql)
    assert calls == []
    assert rewritten == sql
