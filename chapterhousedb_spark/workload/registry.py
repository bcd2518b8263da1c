"""Query registry plumbing shared by the workload modules."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; `oracle` is the DuckDB twin (None => the
    driver records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table (TESTDATA.md layout).

    events.ts is parquet TIMESTAMP(NANOS): Spark reads it as a nanos
    long (spark.sql.legacy.parquet.nanosAsLong); convert to a
    microsecond timestamp with truncation, matching how DuckDB reads
    the same file (ns -> us truncation), so oracle comparisons agree.
    """
    if table == "events":
        # Defensive: the correctness harness builds its own plain
        # SparkSession where build_session()'s conf is absent; without
        # this, reading TIMESTAMP(NANOS) throws PARQUET_TYPE_ILLEGAL.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
