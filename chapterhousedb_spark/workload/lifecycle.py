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

import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from chapterhousedb_spark.workload.registry import query, scratch_dir


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
        results_dir=scratch_dir(prefix="chdb_lifecycle_"),
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


# sf_dir -> normalized temp dir, one normalization per source per
# process: the streaming queries each call _raw_events_source (the
# interval joins twice), and re-running the full rewrite per call would
# multiply work and leak a temp dir each time
_NANOS_NORM_CACHE: dict[str, str] = {}


def _normalize_nanos_events(spark, sf_dir):
    """One-time nanos->micros normalization of events.parquet into a
    temp dir (returned, memoized per sf_dir) holding a single file
    named events.parquet — the same layout the streaming source
    expects. The nanosAsLong conf is saved/set/restored around a fully-
    materializing batch write, so nothing leaks into later queries on
    the session (the write is an action: by the time this returns, no
    plan still needs the conf)."""
    import glob as _glob
    import os
    import shutil

    cached = _NANOS_NORM_CACHE.get(sf_dir)
    if cached is not None and os.path.isfile(
        os.path.join(cached, "events.parquet")
    ):
        return cached

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)  # None = not explicitly set
    out_dir = scratch_dir(prefix="chdb_events_norm_")
    tmp = os.path.join(out_dir, "_tmp")
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.LongType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    spark.conf.set(key, "true")
    try:
        (
            spark.read.schema(raw_schema)
            .parquet(f"{sf_dir}/events.parquet")
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(out_dir, "events.parquet"))
    shutil.rmtree(tmp)
    _NANOS_NORM_CACHE[sf_dir] = out_dir
    return out_dir


def _scatter_ordered_by_ts(df, ts_col="ts", n_files=8):
    """Stage a bounded DataFrame as a landing dir whose files replay in
    EVENT-TIME order: range-partition on ts, then rename each part to
    an explicit sequence name f###.parquet ordered by the file's ACTUAL
    min(ts) (read back from the parquet itself — no reliance on Spark's
    part-file-name <-> range-partition mapping), with mtimes increasing
    in the same sequence. FileStreamSource orders by (mtime, path):
    both orders agree here, so the replay order is pinned whichever the
    engine consults (the undocumented-coupling fix from ADVICE r5).
    Returns the landing dir path; empty range partitions are dropped."""
    import os
    import shutil

    import pyarrow.parquet as pq

    scatter = scratch_dir(prefix="chdb_scatter_")
    tmp = os.path.join(scatter, "_tmp")
    df.repartitionByRange(n_files, ts_col).write.mode("overwrite").parquet(tmp)
    keyed = []
    for fname in os.listdir(tmp):
        if not (fname.startswith("part-") and fname.endswith(".parquet")):
            continue
        tbl = pq.read_table(os.path.join(tmp, fname), columns=[ts_col])
        if tbl.num_rows:
            keyed.append((min(tbl.column(ts_col).to_pylist()), fname))
    keyed.sort()
    base_mtime = 1_600_000_000
    for i, (_, fname) in enumerate(keyed):
        dest = os.path.join(scatter, f"f{i:03d}.parquet")
        shutil.move(os.path.join(tmp, fname), dest)
        os.utime(dest, (base_mtime + i, base_mtime + i))
    shutil.rmtree(tmp)
    return scatter


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
        # Nanos parquet needs spark.sql.legacy.parquet.nanosAsLong, but
        # that conf is consulted at every micro-batch read — setting it
        # session-wide would leak into unrelated queries. Instead run a
        # ONE-TIME batch normalization (the conf scoped save/set/restore
        # around a fully-materializing write) into a temp landing dir of
        # micros timestamps, and stream from that. At scale this is the
        # ingest-time normalization pass a landing zone does anyway.
        sf_dir = _normalize_nanos_events(spark, sf_dir)
        raw_ts, conv = T.TimestampType(), lambda c: c
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
        .option("checkpointLocation", scratch_dir(prefix="chdb_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "streaming_events_hourly_files",
    oracle="""
    WITH m AS (SELECT max(ts) AS mx FROM events)
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events, m
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
    GROUP BY 1, 2
    """,
)
def streaming_events_hourly_files_q(spark, sf_dir):
    """The PRODUCTION shape of streaming_events_hourly: the watermarked
    hourly counts drain through a PARQUET sink in append mode
    (run_available_now) and the returned rows are the files read back —
    so the hash gate pins the whole path landing zone -> micro-batches
    -> windowed state -> finalized-window emission -> parquet files.

    Append mode only emits windows the final watermark has closed:
    window_end <= max(event ts) - 2h (the inclusive boundary is
    verified behavior — a window whose end equals the watermark IS
    emitted). The oracle applies the same cutoff, so the held-back tail
    windows are part of the checked semantics, not slack."""
    import os

    from chapterhousedb_spark.streaming.batcher import (
        run_available_now,
        windowed_counts,
    )

    ev = _raw_events_source(spark, sf_dir)
    agg = windowed_counts(ev).select(
        F.unix_timestamp("window_start").alias("window_start"), "event_type", "n"
    )
    root = scratch_dir(prefix="chdb_stream_files_")
    run_available_now(
        agg, os.path.join(root, "out"), os.path.join(root, "ckpt")
    )
    return spark.read.parquet(os.path.join(root, "out"))


@query(
    "streaming_interval_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           p.value AS purchase_value,
           epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def streaming_interval_join_q(spark, sf_dir):
    """Stream-stream interval join THROUGH the streaming engine: every
    purchase within an hour after each click, both sides unbounded
    file streams (streaming/batcher.py interval_join_streams — the
    watermark + time-range pair is what lets Spark bound state). The
    drained output hash-matches the batch interval-join oracle: inner
    stream-stream joins emit eagerly, so on a bounded input no pair is
    held back by the final watermark."""
    clicks = (
        _raw_events_source(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), "ts")
    )
    purchases = (
        _raw_events_source(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("rts"),
            F.col("value").alias("purchase_value"),
        )
    )
    from chapterhousedb_spark.streaming.batcher import interval_join_streams

    joined = interval_join_streams(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="rts",
        max_delay_seconds=3600,
        watermark="2 hours",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        "purchase_value",
        # microsecond-exact on both engines (unix_timestamp truncates
        # to seconds; DuckDB epoch keeps fractions — they'd disagree)
        (F.unix_micros("rts") - F.unix_micros("ts")).alias("delay_us"),
    )
    name = f"stream_ij_{uuid.uuid4().hex[:12]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir(prefix="chdb_ij_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "compaction_roundtrip",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
)
def compaction_roundtrip_q(spark, sf_dir):
    """Small-files compaction value fidelity: scatter documents into 64
    tiny files (the reference's one-file-per-record-batch layout,
    materialize_files_task.rs:117-142), run Engine.compact (size-derived
    file count, sort_by=doc_id clustering, never-in-place), and return
    the COMPACTED files read back — a hash match proves the maintenance
    rewrite preserves every row and value exactly, the way
    engine_materialize_roundtrip pins the sink."""
    import os

    from chapterhousedb_spark.config import ConnectionRegistry, FsConnection
    from chapterhousedb_spark.engine import Engine
    from chapterhousedb_spark.workload.registry import load

    root = scratch_dir(prefix="chdb_compact_")
    load(spark, sf_dir, "documents").repartition(64).write.mode("overwrite").parquet(
        os.path.join(root, "small")
    )
    eng = Engine(
        spark=spark,
        results_dir=os.path.join(root, "results"),
        connections=ConnectionRegistry(
            {"t": FsConnection(name="t", base_path=root)}
        ),
    )
    try:
        info = eng.compact("small", connection="t", sort_by=["doc_id"])
        assert info["files_after"] < info["files_before"], info
        return spark.read.parquet(info["path"])
    finally:
        eng.close()


@query(
    "streaming_asof_enrich",
    oracle="""
    SELECT e.event_id,
           p.purchase_event_id,
           p.purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') e
    ASOF LEFT JOIN (
        SELECT user_id, ts,
               event_id AS purchase_event_id,
               value    AS purchase_value
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                           ORDER BY event_id DESC) AS rn
              FROM events WHERE event_type = 'purchase') d
        WHERE rn = 1
      ) p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def streaming_asof_enrich_q(spark, sf_dir):
    """Streaming as-of enrichment THROUGH the streaming engine
    (applyInPandasWithState, streaming/batcher.py asof_enrich_stream):
    every click emitted with the user's most recent purchase
    at-or-before it, drained with availableNow and hash-matched against
    DuckDB's native ASOF JOIN — the same oracle as the batch
    asof_join_events, so batch operator, streaming operator, and DuckDB
    must agree three ways. Equal-timestamp ties resolve to the max
    purchase event_id on every path (state applies right rows before
    left within a batch, in event_id order; the oracle pins rn=1 DESC).
    """
    from chapterhousedb_spark.streaming.batcher import asof_enrich_stream

    ev = _raw_events_source(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    out = asof_enrich_stream(ev).select(
        "event_id", "purchase_event_id", "purchase_value"
    )
    name = f"stream_asof_{uuid.uuid4().hex[:12]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir(prefix="chdb_sa_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "streaming_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start
    FROM events
    """,
)
def streaming_dedup_q(spark, sf_dir):
    """Watermarked streaming dedup THROUGH the streaming engine
    (streaming/batcher.py dedup_stream -> dropDuplicatesWithinWatermark):
    distinct (user_id, event_type, hour) keys with bounded state.

    Determinism argument (why this hash-matches a batch DISTINCT):
    the events table is scattered by _scatter_ordered_by_ts into
    explicitly-sequenced ts-range files (f000, f001, ... — sequence
    verified against each file's actual min ts, mtimes monotone in the
    same order), so FileStreamSource replays them in EVENT-TIME order
    whether it sorts by mtime or by path. Then (a) no row is ever
    late — every file's min ts >= the previous file's max ts >= the
    watermark + delay; (b) no key's state is evicted while duplicates
    can still arrive — duplicates of an hour-key lie within 1h of each
    other, far under the 24h delay, and nothing older than
    watermark+delay is ever re-sent. Only the key columns are emitted,
    so which physical row survived a within-batch race is invisible.
    At scale this is THE streaming dedup shape: state is keys within
    the lateness horizon, not the whole stream's key space."""
    from chapterhousedb_spark.streaming.batcher import dedup_stream
    from chapterhousedb_spark.workload.registry import load

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    scatter = _scatter_ordered_by_ts(ev)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(scatter)
        .withColumn(
            "hour_start", F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
        )
    )
    deduped = dedup_stream(
        stream,
        id_cols=["user_id", "event_type", "hour_start"],
        ts_col="ts",
        watermark="24 hours",
    ).select("user_id", "event_type", "hour_start")
    name = f"stream_dedup_{uuid.uuid4().hex[:12]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir(prefix="chdb_sd_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "streaming_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                       > 30 * 60 * 1000000 THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    agg AS (
      SELECT user_id, sid,
             MIN(epoch_us(ts)) AS session_start,
             MAX(epoch_us(ts)) AS last_us,
             CAST(COUNT(*) AS INTEGER) AS n_events
      FROM sess GROUP BY user_id, sid),
    mx AS (SELECT MAX(epoch_ms(ts)) AS max_ms FROM events),
    l AS (SELECT user_id, MAX(sid) AS max_sid FROM agg GROUP BY user_id)
    SELECT a.user_id, a.session_start, a.n_events
    FROM agg a JOIN l ON a.user_id = l.user_id, mx
    WHERE a.sid < l.max_sid
       OR a.last_us // 1000 + 1800000 < mx.max_ms - 1800000
    """,
)
def streaming_sessionize_q(spark, sf_dir):
    """Stateful streaming sessionization THROUGH the streaming engine
    (applyInPandasWithState + event-time timeout, streaming/batcher.py
    sessionize_stream), drained with availableNow and hash-matched
    against the batch gaps-and-islands oracle — the last streaming
    operator to graduate to the DuckDB gate (VERDICT r5 #3).

    What the gate pins and what it deliberately does not:
    - Emitted rows are (user_id, session_start, n_events) of every
      CLOSED session. The closure REASON (by_timeout) is excluded: a
      session the batch view sees as gap-closed can legitimately close
      by mid-stream event-time timeout when the watermark (driven by
      other users' events on an event-time-ordered replay) passes
      last_ts + gap before the user's next event is processed — the
      session CONTENT is identical either way (the next event starts a
      fresh session in both paths; with ordered files a mid-stream
      timeout requires next_ts - last_ts > 2*gap > gap, which the batch
      view also splits). by_timeout stays covered by unit tests.
    - The final still-open session per user is emitted only if the
      final watermark closed it: Spark fires an event-time timeout iff
      timeout_ms < watermark_ms, with timeout_ms = floor(last_us/1e3) +
      gap_ms and watermark_ms = floor(max_us/1e3) - gap_ms (event-time
      stats are ms-truncated) — the oracle's last predicate replays
      exactly that arithmetic.
    Ordered replay via _scatter_ordered_by_ts means no late drops, so
    the session set is deterministic (same argument as streaming_dedup).
    """
    from chapterhousedb_spark.streaming.batcher import sessionize_stream
    from chapterhousedb_spark.workload.registry import load

    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    scatter = _scatter_ordered_by_ts(ev)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(scatter)
    )
    sess = sessionize_stream(stream, gap_minutes=30).select(
        "user_id", "session_start", "n_events"
    )
    name = f"stream_sess_{uuid.uuid4().hex[:12]}"
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir(prefix="chdb_ss_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "streaming_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           c.c_mktsegment, c.c_acctbal
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def streaming_enrich_q(spark, sf_dir):
    """Stream-static enrichment THROUGH the streaming engine
    (streaming/batcher.py enrich_stream): every event joined to the
    static customer dim, broadcast to each micro-batch — no stream-side
    shuffle, no state, so the drained rows equal the batch LEFT JOIN
    exactly regardless of file arrival order. The standard shape for
    attaching user/catalog attributes at ingest; at scale the dim
    refreshes per batch from its source without restarting the stream."""
    from chapterhousedb_spark.streaming.batcher import enrich_stream
    from chapterhousedb_spark.workload.registry import load

    ev = _raw_events_source(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_acctbal"
    )
    out = enrich_stream(ev, dim, on="user_id").select(
        "event_id", "user_id", "event_type", "c_mktsegment", "c_acctbal"
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:12]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir(prefix="chdb_se_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "streaming_interval_join_outer",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS rts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(ts) FROM c),
                        (SELECT max(rts) FROM p)) - INTERVAL 2 HOUR AS w)
    SELECT c.user_id, c.click_id, p.purchase_id, p.purchase_value,
           epoch_us(p.rts) - epoch_us(c.ts) AS delay_us
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND p.rts >= c.ts AND p.rts <= c.ts + INTERVAL 1 HOUR
    UNION ALL
    SELECT c.user_id, c.click_id,
           CAST(NULL AS BIGINT) AS purchase_id,
           CAST(NULL AS DOUBLE) AS purchase_value,
           CAST(NULL AS BIGINT) AS delay_us
    FROM c
    WHERE NOT EXISTS (SELECT 1 FROM p
                      WHERE p.user_id = c.user_id
                        AND p.rts >= c.ts
                        AND p.rts <= c.ts + INTERVAL 1 HOUR)
      AND c.ts + INTERVAL 1 HOUR <= (SELECT w FROM wm)
    """,
)
def streaming_interval_join_outer_q(spark, sf_dir):
    """LEFT OUTER stream-stream interval join through the streaming
    engine (batcher.interval_join_streams_outer): every purchase within
    an hour after each click PLUS the clicks that never converted —
    emitted with NULL purchase columns once the watermark passes their
    match window's end. The funnel question the inner join can't
    answer. The oracle replays BOTH halves: the eager inner matches,
    and the unmatched set under the final-watermark cutoff. The
    watermark that evicts left state is the GLOBAL one —
    multipleWatermarkPolicy=min over BOTH sides' watermarks, and each
    side's derives from its own post-filter max event time — so the
    cutoff is click_ts + 1h <= least(max click ts, max purchase ts)
    - 2h (empirically the purchase stream ends earlier and is the
    binding side at sf0.01; getting this wrong by using the global
    events max over-emits by exactly the clicks between the two
    horizons — caught by the hash gate during development). Held-back
    open-window clicks are checked semantics, not slack."""
    clicks = (
        _raw_events_source(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), "ts")
    )
    purchases = (
        _raw_events_source(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("rts"),
            F.col("value").alias("purchase_value"),
        )
    )
    from chapterhousedb_spark.streaming.batcher import interval_join_streams_outer

    joined = interval_join_streams_outer(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="rts",
        max_delay_seconds=3600,
        watermark="2 hours",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        "purchase_value",
        (F.unix_micros("rts") - F.unix_micros("ts")).alias("delay_us"),
    )
    name = f"stream_ijo_{uuid.uuid4().hex[:12]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir(prefix="chdb_ijo_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
