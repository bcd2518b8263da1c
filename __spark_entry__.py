"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The declared inventory lives in chapterhousedb_spark.workload:
relational.py (reference-parity scan/filter/project/order-by plus the
beyond-reference joins/aggs/windows/set-ops/CTE surface), llm.py
(dedup / similarity / text analysis / sequence packing / multimodal),
lifecycle.py (engine materialize roundtrip + streaming under the hash
gate), temporal.py
(event-stream batch twins incl. the as-of join operator).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-shaped
    pricing summary (partial agg -> single shuffle)."""
    from chapterhousedb_spark.workload import QUERIES

    return QUERIES["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from chapterhousedb_spark.workload import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (others get the
    driver's rows-only check)."""
    from chapterhousedb_spark.workload import ORACLES

    return dict(ORACLES)
