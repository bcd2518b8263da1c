"""chapterhousedb_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
alekLukanen/ChapterhouseDB (a Rust distributed SQL engine on Arrow +
Parquet) on top of Spark SQL + Catalyst + Arrow, plus a beyond-reference
relational surface (joins/aggregations/windows/set-ops) and LLM-data-
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.

Reference lifecycle being reproduced (see SURVEY.md §3):
  submit SQL -> plan/execute (Catalyst subsumes the reference's actor
  pipeline, reference src/planner/physical_planner.rs) -> materialize
  parquet results (materialize_tasks/materialize_files_task.rs) ->
  cursor-paged fetch (query_handler/query_data_handler.rs).
"""

# Lazy exports (PEP 562): importing the package must not import
# pyspark, so the thin client path (server.QueryClient / RemoteEngine,
# CLI --connect) runs on a machine with only stdlib + pyarrow — the
# Spark-free-client promise server.py documents (round-15 review
# finding). `from chapterhousedb_spark import Engine` still works:
# __getattr__ resolves each name from its home module on first touch.
_EXPORTS = {
    "ConnectionRegistry": "chapterhousedb_spark.config",
    "FsConnection": "chapterhousedb_spark.config",
    "S3Connection": "chapterhousedb_spark.config",
    "Engine": "chapterhousedb_spark.engine",
    "QueryHandle": "chapterhousedb_spark.engine",
    "QueryStatus": "chapterhousedb_spark.status",
    "QueryDataIterator": "chapterhousedb_spark.results",
    "ResultCursor": "chapterhousedb_spark.results",
    "QueryClient": "chapterhousedb_spark.server",
    "QueryServer": "chapterhousedb_spark.server",
    "RemoteEngine": "chapterhousedb_spark.server",
    "serve": "chapterhousedb_spark.server",
    "build_session": "chapterhousedb_spark.session",
    "TableFunction": "chapterhousedb_spark.sqlfront",
    "TableFunctionRegistry": "chapterhousedb_spark.sqlfront",
}

__version__ = "0.1.0"

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        value = getattr(importlib.import_module(_EXPORTS[name]), name)
        globals()[name] = value  # cache: __getattr__ runs once per name
        return value
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )


def __dir__():
    return __all__
