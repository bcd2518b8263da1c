"""Declared query inventory (the driver's correctness + bench surface).

Every operator the engine claims (SURVEY.md §2 parity set + the
beyond-reference relational surface + LLM-pipeline operators) is
declared here as a named query: a (spark, sf_dir) -> DataFrame callable
plus, where ANSI-SQL-expressible, a DuckDB oracle string producing the
same columns. The driver hash-compares the two at sf0.01.
"""

from chapterhousedb_spark.workload.registry import ORACLES, QUERIES, load, query

# importing the modules populates the registry
from chapterhousedb_spark.workload import relational as _relational  # noqa: E402,F401
from chapterhousedb_spark.workload import llm as _llm  # noqa: E402,F401
from chapterhousedb_spark.workload import temporal as _temporal  # noqa: E402,F401
from chapterhousedb_spark.workload import lifecycle as _lifecycle  # noqa: E402,F401

__all__ = ["ORACLES", "QUERIES", "load", "query"]
