"""End-to-end parity with the reference's own E2E surface: every
statement in /root/reference/sample_queries/*.sql runs through
Engine.sql_wait over regenerated Group-A fixtures (FIXTURES.md;
reference src/bin/create_sample_data.rs:113-230) and must match DuckDB
on the same parquet files.

This replaces the reference's manual TUI validation
(SURVEY.md §5: E2E via sample_queries + client_tui) with an oracle.
"""

from __future__ import annotations

import glob
import os
import re

import duckdb
import pandas as pd
import pytest

from chapterhousedb_spark.config import ConnectionRegistry, FsConnection
from chapterhousedb_spark.engine import Engine, QueryStatus
from chapterhousedb_spark.sources.sample_data import generate_sample_data
from chapterhousedb_spark.sqlfront import split_statements

SAMPLE_SQL_DIR = "/root/reference/sample_queries"
SQL_FILES = sorted(os.path.basename(p) for p in glob.glob(f"{SAMPLE_SQL_DIR}/*.sql"))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_fixtures")
    generate_sample_data(str(root / "sample_data"))
    return str(root)


@pytest.fixture(scope="module")
def engine(spark, data_root, tmp_path_factory):
    # default connection rooted at the fixture dir so the reference's
    # relative globs ('sample_data/simple/*.parquet') resolve as-is
    eng = Engine(
        spark=spark,
        results_dir=str(tmp_path_factory.mktemp("ref_results")),
        connections=ConnectionRegistry(
            {"default": FsConnection(name="default", base_path=data_root)}
        ),
    )
    yield eng
    eng.close()


def _oracle_sql(statement: str, data_root: str) -> str:
    """read_files('<glob>') -> read_parquet('<abs glob>') for DuckDB."""
    return re.sub(
        r"read_files\s*\(\s*'([^']+)'\s*\)",
        lambda m: f"read_parquet('{os.path.join(data_root, m.group(1))}')",
        statement,
        flags=re.IGNORECASE,
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:  # Spark decimal -> Decimal objects
            try:
                df[c] = df[c].astype("float64")
            except (TypeError, ValueError):
                pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("sql_file", SQL_FILES)
def test_reference_sample_file(sql_file, engine, data_root):
    text = open(os.path.join(SAMPLE_SQL_DIR, sql_file)).read()
    statements = split_statements(text)
    assert statements, f"{sql_file}: no statements parsed"
    con = duckdb.connect()
    for i, stmt in enumerate(statements):
        [h] = engine.sql_wait(stmt)
        assert h.status is QueryStatus.COMPLETE, f"{sql_file}#{i}: {h.error}"
        got = engine.fetch(h.query_id, 0, max(h.num_rows, 1)).to_pandas()
        want = con.execute(_oracle_sql(stmt, data_root)).fetchdf()
        assert len(got) == len(want), f"{sql_file}#{i}: rows {len(got)} != {len(want)}"
        assert list(got.columns) == list(want.columns), f"{sql_file}#{i}: columns"
        if len(got):
            a, b = _norm(got), _norm(want)
            # float32 arithmetic (reference/duckdb) vs double promotion
            # (Spark fractional division) — compare with tolerance
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=False, rtol=1e-5, atol=1e-7
            )


def test_div_by_zero_semantics(engine, data_root):
    """`1.0 / id` at id=0 (the edge the reference's edge_cast file
    circles around): ANSI mode (Spark 4 default) raises, and the engine
    surfaces it as status ERROR — the same error-surfacing path as the
    reference's Status::Error (query_handler_state.rs:28-35). The
    NULL-tolerant spelling is try_divide; pin both."""
    [h] = engine.sql_wait(
        "select id, 1.0 / id as inv from read_files('sample_data/simple/*.parquet') where id < 2"
    )
    assert h.status is QueryStatus.ERROR
    assert "DIVIDE_BY_ZERO" in (h.error or "")
    [h2] = engine.sql_wait(
        "select id, try_divide(1.0, id) as inv "
        "from read_files('sample_data/simple/*.parquet') where id < 2"
    )
    assert h2.status is QueryStatus.COMPLETE, h2.error
    rows = {r["id"]: r["inv"] for r in engine.fetch(h2.query_id, 0, 10).to_pylist()}
    assert rows[0] is None
    assert rows[1] is not None and abs(float(rows[1]) - 1.0) < 1e-9
