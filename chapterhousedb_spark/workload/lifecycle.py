"""Lifecycle + streaming queries under the ORACLE gate.

Round 1 left three components unit-verified only: the materialize sink,
the query lifecycle (submit/status/paged results), and streaming. These
entries route real declared queries THROUGH those components and
hash-compare the output against DuckDB — so the full path (statement
split -> read_files rewrite -> execute -> parquet materialize ->
manifest read-back; file stream -> watermarked windowed state ->
drain-to-completion) is value-checked, not just smoke-tested.

Reference parity: the lifecycle mirrors the reference's client protocol
(async_query_client.rs run_query -> wait_for_query_to_finish ->
QueryDataIterator); streaming maps its DEV_NOTES `batch(stream, ...)`
sketch onto Structured Streaming (see streaming/batcher.py).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from chapterhousedb_spark.workload.registry import query


@query(
    "engine_materialize_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1
    """,
)
def engine_materialize_roundtrip_q(spark, sf_dir):
    """Submit a multi-statement SQL file through the Engine (splitter ->
    read_files front door -> async execute -> parquet materialize +
    manifest), then return the MATERIALIZED rows read back from the
    results dir. A hash match here pins the whole lifecycle: statement
    splitting, connection resolution, execution, and the sink's
    schema/value fidelity (reference materialize_files_task.rs:68-171 +
    client lifecycle async_query_client.rs:40-114)."""
    from chapterhousedb_spark.config import ConnectionRegistry, FsConnection
    from chapterhousedb_spark.engine import Engine, QueryStatus

    eng = Engine(
        spark=spark,
        results_dir=tempfile.mkdtemp(prefix="chdb_lifecycle_"),
        connections=ConnectionRegistry(
            {"t": FsConnection(name="t", base_path=sf_dir)}
        ),
    )
    handles = eng.sql_wait(
        """
        select count(*) as n_regions from read_files('region.parquet', connection=>'t');
        select n_nationkey, n_name
          from read_files('nation.parquet', connection=>'t')
         where n_regionkey = 1;
        """
    )
    assert [h.status for h in handles] == [QueryStatus.COMPLETE] * 2, [
        (h.status, h.error) for h in handles
    ]
    return spark.read.parquet(handles[1].result_dir)


def _raw_events_source(spark, sf_dir):
    """Streaming file sources need the schema declared up front, but the
    testdata's events.ts physical type has changed across rounds
    (TIMESTAMP(NANOS) -> timestamp[us] NTZ). Guessing wrong is the worst
    failure mode — a LongType schema over a micros file reads raw int64s
    and a ns->us division then collapses every timestamp 1000x, silently.
    So probe the parquet footer and declare the matching schema, then
    normalize to TimestampType exactly as workload.registry.load does.
    """
    import pyarrow.parquet as pq

    ts_type = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    unit = getattr(ts_type, "unit", None)
    tz = getattr(ts_type, "tz", None)
    if unit == "ns":
        # read as nanos long (legacy conf), truncate to micros
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_ts, conv = T.LongType(), lambda c: F.timestamp_micros(F.expr("ts div 1000"))
    elif tz is None:
        # timestamp[us], not UTC-adjusted -> TIMESTAMP_NTZ; session tz is
        # UTC so the cast preserves the raw microsecond value
        raw_ts, conv = T.TimestampNTZType(), lambda c: c.cast("timestamp")
    else:
        raw_ts, conv = T.TimestampType(), lambda c: c
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", raw_ts, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", conv(F.col("ts")))


@query(
    "streaming_events_hourly",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def streaming_events_hourly_q(spark, sf_dir):
    """Watermarked 1-hour tumbling-window counts computed BY THE
    STREAMING ENGINE (file micro-batches -> windowed state ->
    trigger(availableNow) drain), hash-matched against the batch oracle
    — streaming and batch must agree on a bounded input (complete
    output mode emits every window, so no tail is held back by the
    watermark). Counts only: double sums would differ by float add
    order between engines. The memory sink is the bounded-drain harness
    shape; production streams write parquet (run_available_now)."""
    from chapterhousedb_spark.streaming.batcher import windowed_counts

    # the file-stream source wants a directory; _raw_events_source
    # selects just the events table out of the shared sf_dir with a
    # glob filter and normalizes ts to TimestampType
    ev = _raw_events_source(spark, sf_dir)
    agg = windowed_counts(ev).select(
        F.unix_timestamp("window_start").alias("window_start"), "event_type", "n"
    )
    name = f"stream_hourly_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="chdb_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
