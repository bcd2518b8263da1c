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

from chapterhousedb_spark.config import ConnectionRegistry, FsConnection, S3Connection
from chapterhousedb_spark.engine import Engine, QueryHandle, QueryStatus
from chapterhousedb_spark.results import QueryDataIterator, ResultCursor
from chapterhousedb_spark.server import QueryClient, QueryServer, serve
from chapterhousedb_spark.session import build_session
from chapterhousedb_spark.sqlfront import TableFunction, TableFunctionRegistry

__version__ = "0.1.0"

__all__ = [
    "ConnectionRegistry",
    "Engine",
    "FsConnection",
    "QueryClient",
    "QueryDataIterator",
    "QueryHandle",
    "QueryServer",
    "QueryStatus",
    "ResultCursor",
    "serve",
    "S3Connection",
    "TableFunction",
    "TableFunctionRegistry",
    "build_session",
]
