"""SQL front door: statement splitting + read_files() rewriting.

This is the thin layer the reference implements with the sqlparser crate
(reference src/planner/logical_planner.rs:209-216) before its own
planner. Here everything after the rewrite is handed to spark.sql() and
planned by Catalyst.
"""

from chapterhousedb_spark.sqlfront.read_files import ReadFilesCall, rewrite_read_files
from chapterhousedb_spark.sqlfront.splitter import split_statements
from chapterhousedb_spark.sqlfront.table_funcs import (
    TableFuncCall,
    TableFuncSyntaxError,
    TableFunction,
    TableFunctionRegistry,
    default_table_function_registry,
    rewrite_table_funcs,
)

__all__ = [
    "ReadFilesCall",
    "TableFuncCall",
    "TableFuncSyntaxError",
    "TableFunction",
    "TableFunctionRegistry",
    "default_table_function_registry",
    "rewrite_read_files",
    "rewrite_table_funcs",
    "split_statements",
]
