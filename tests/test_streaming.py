"""Structured Streaming tests: file-source micro-batches drained with
availableNow, windowed counts vs the batch twin, stateful sessionization."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from chapterhousedb_spark.streaming import (
    dedup_stream,
    enrich_stream,
    read_event_stream,
    run_available_now,
    sessionize_stream,
    windowed_counts,
)
from chapterhousedb_spark.workload.registry import load
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Stage the events table as a landing dir of several parquet files
    (micro-batch boundaries), with ts as a proper timestamp."""
    d = str(tmp_path_factory.mktemp("events_landing"))
    ev = load(spark, SF_SMOKE, "events")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_drains_all_events(spark, event_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_stream = spark.read.parquet(out).count()
    n_batch = load(spark, SF_SMOKE, "events").count()
    assert n_stream == n_batch
    # restart with no new files: exactly-once, nothing reprocessed
    q2 = (
        read_event_stream(spark, event_dir).writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == n_batch


def test_windowed_counts_match_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = (
        spark.read.parquet(event_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["h"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_dedup_stream_drops_replayed_files(spark, event_dir, tmp_path_factory):
    """At-least-once landing: the same events land twice (two copies of
    every file); the streaming dedup must emit each event_id once."""
    d = str(tmp_path_factory.mktemp("dup_landing"))
    ev = spark.read.parquet(event_dir)
    ev.write.mode("overwrite").parquet(d)
    ev.write.mode("append").parquet(d)  # replay: every event twice
    out = str(tmp_path_factory.mktemp("dedup_out"))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))
    stream = dedup_stream(read_event_stream(spark, d, max_files_per_trigger=100))
    run_available_now(stream, out, ckpt)
    got = spark.read.parquet(out)
    n_unique = ev.select("event_id").distinct().count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_enrich_stream_broadcast_join(spark, event_dir):
    dim = spark.createDataFrame(
        [(t, f"cat_{t}") for t in ["click", "view", "purchase", "scroll"]],
        ["event_type", "category"],
    )
    stream = enrich_stream(read_event_stream(spark, event_dir), dim, "event_type")
    q = (
        stream.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "select count(*) as n, count(category) as with_cat from enriched"
    ).collect()[0]
    assert rows["n"] == spark.read.parquet(event_dir).count()
    assert rows["with_cat"] > 0


def test_engine_stream_lifecycle(spark, event_dir, tmp_path_factory):
    """Streaming through the engine surface: start -> status -> await,
    output lands at a connection-resolved destination."""
    from chapterhousedb_spark.config import ConnectionRegistry, FsConnection
    from chapterhousedb_spark.engine import Engine

    root = str(tmp_path_factory.mktemp("stream_engine"))
    eng = Engine(
        spark=spark,
        results_dir=f"{root}/results",
        connections=ConnectionRegistry(
            {"out": FsConnection(name="out", base_path=root)}
        ),
    )
    sid = eng.start_stream(
        read_event_stream(spark, event_dir),
        "landed/events",
        connection="out",
        available_now=True,
    )
    eng.await_stream(sid)
    status = eng.stream_status(sid)
    assert status["active"] is False and status["exception"] is None
    assert spark.read.parquet(f"{root}/landed/events").count() == spark.read.parquet(
        event_dir
    ).count()
    eng.close()


def test_vacuum_sweeps_stopped_stream_checkpoints(spark, event_dir, tmp_path_factory):
    """Engine.vacuum removes the `_checkpoints/<id>` dirs of finished/
    stopped streams while an active stream's checkpoint is untouched."""
    import os

    from chapterhousedb_spark.config import ConnectionRegistry, FsConnection
    from chapterhousedb_spark.engine import Engine

    root = str(tmp_path_factory.mktemp("stream_vacuum"))
    eng = Engine(
        spark=spark,
        results_dir=f"{root}/results",
        connections=ConnectionRegistry(
            {"out": FsConnection(name="out", base_path=root)}
        ),
    )
    ckpt_root = f"{root}/results/_checkpoints"
    done = eng.start_stream(
        read_event_stream(spark, event_dir),
        "landed/a",
        connection="out",
        available_now=True,
    )
    eng.await_stream(done)
    live = eng.start_stream(
        read_event_stream(spark, event_dir),
        "landed/b",
        connection="out",
        trigger_interval="1 second",
    )
    assert os.path.isdir(f"{ckpt_root}/{done}") and os.path.isdir(
        f"{ckpt_root}/{live}"
    )
    swept = eng.vacuum()
    assert done in swept and live not in swept
    assert not os.path.isdir(f"{ckpt_root}/{done}")
    assert os.path.isdir(f"{ckpt_root}/{live}")
    # the swept stream's dead handle is dropped too — otherwise it
    # leaks for the engine's lifetime and later vacuums re-record
    # fresh stop times for a checkpoint that no longer exists
    assert done not in eng._streams and done not in eng._stream_stopped
    eng.stop_stream(live)
    assert live in eng.vacuum()
    assert not os.path.isdir(f"{ckpt_root}/{live}")
    assert live not in eng._streams
    eng.close()


def test_sessionize_stream_closes_sessions(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    sess = sessionize_stream(stream, gap_minutes=30)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from sessions").collect()
    # the batch twin: sessions closed by a later event (gap exceeded)
    # must match n_sessions - 1 per user exactly; timeout-closed
    # sessions (watermark passed) add at most one more
    from chapterhousedb_spark.workload import QUERIES

    batch = {
        r["user_id"]: r["n_sessions"]
        for r in QUERIES["events_sessionize"](spark, SF_SMOKE).collect()
    }
    gap_closed: dict[int, int] = {}
    total_closed: dict[int, int] = {}
    for r in rows:
        total_closed[r["user_id"]] = total_closed.get(r["user_id"], 0) + 1
        if not r["by_timeout"]:
            gap_closed[r["user_id"]] = gap_closed.get(r["user_id"], 0) + 1
    for user, n_sessions in batch.items():
        assert gap_closed.get(user, 0) == n_sessions - 1, (
            f"user {user}: gap-closed {gap_closed.get(user, 0)} vs batch {n_sessions}"
        )
        assert total_closed.get(user, 0) <= n_sessions


def test_deterministic_sample_on_stream_matches_batch(
    spark, event_dir, tmp_path_factory
):
    """The sampling operators are stateless filters, so the SAME code
    runs on a stream and selects the SAME rows as in batch — the
    property that lets one pipeline definition serve backfill and
    ingest."""
    from chapterhousedb_spark.operators.sampling import deterministic_sample

    out = str(tmp_path_factory.mktemp("sample_out"))
    ckpt = str(tmp_path_factory.mktemp("sample_ckpt"))
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    sampled = deterministic_sample(stream, 0.3, id_col="event_id", salt="s")
    run_available_now(sampled, out, ckpt)
    got = {r["event_id"] for r in spark.read.parquet(out).select("event_id").collect()}
    batch = deterministic_sample(
        spark.read.parquet(event_dir), 0.3, id_col="event_id", salt="s"
    )
    want = {r["event_id"] for r in batch.select("event_id").collect()}
    assert got == want and len(got) > 0


def test_asof_enrich_stream_matches_batch_asof(spark, tmp_path_factory):
    """Drained streaming as-of == batch asof_join on the same bounded
    input; purchases and clicks land in SEPARATE micro-batch files, so
    matches must flow through the watermarked state across batches."""
    import os

    from chapterhousedb_spark.operators.asof import asof_join
    from chapterhousedb_spark.streaming.batcher import asof_enrich_stream

    ev = load(spark, SF_SMOKE, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    d = str(tmp_path_factory.mktemp("asof_landing"))
    # file 0: all purchases; file 1: all clicks — forces cross-batch state
    ev.filter(F.col("event_type") == "purchase").coalesce(1).write.parquet(
        os.path.join(d, "f0")
    )
    ev.filter(F.col("event_type") == "click").coalesce(1).write.parquet(
        os.path.join(d, "f1")
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    out = asof_enrich_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: (r["purchase_event_id"], r["purchase_value"])
        for r in spark.sql("select * from asof_stream").collect()
    }

    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    expected = {
        r["event_id"]: (r["purchase_event_id"], r["purchase_value"])
        for r in asof_join(
            clicks,
            purchases,
            left_on="ts",
            right_on="ts",
            left_by="user_id",
            right_by="user_id",
            right_cols=["purchase_event_id", "purchase_value"],
        )
        .select("event_id", "purchase_event_id", "purchase_value")
        .collect()
    }
    assert len(got) == len(expected)
    assert got == expected


def test_asof_enrich_stream_equal_ts_tie(spark, tmp_path_factory):
    """A purchase sharing a click's exact timestamp must be applied
    BEFORE the click within a micro-batch (inclusive at-or-before
    match, same tie order as batch asof_join) even when the purchase's
    event_id is larger — ADVICE r4: a (ts_us, event_id) sort processed
    the click first and missed the tied purchase."""
    import datetime as dt
    import os

    from chapterhousedb_spark.streaming.batcher import asof_enrich_stream

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # click has the SMALLER event_id, purchase ties on ts
        (1, 3, t, "click", 0.0),
        (1, 5, t, "purchase", 9.5),
        # control: later click sees the same purchase
        (1, 8, t + dt.timedelta(minutes=1), "click", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    d = str(tmp_path_factory.mktemp("asof_tie"))
    ev.coalesce(1).write.parquet(os.path.join(d, "f0"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        asof_enrich_stream(stream)
        .writeStream.format("memory")
        .queryName("asof_tie")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["purchase_event_id"]
        for r in spark.sql("select * from asof_tie").collect()
    }
    assert got == {3: 5, 8: 5}


def test_asof_enrich_stream_state_is_pruned(spark, tmp_path_factory):
    """Purchases older than the watermark (except the newest reachable
    one) must leave state: drain a stream whose watermark advances far
    past early purchases and assert the numRowsTotal state metric stays
    bounded by the reachable set, not the full purchase history."""
    import os

    from chapterhousedb_spark.streaming.batcher import asof_enrich_stream

    rows = []
    # one user, 200 purchases spaced 1 min apart, then one click far out
    for i in range(200):
        rows.append((i, f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}", 1, "purchase", float(i)))
    rows.append((1000, "2024-01-02 12:00:00", 1, "click", 0.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    d = str(tmp_path_factory.mktemp("asof_prune"))
    # file 0: purchases (watermark -> 2024-01-01); file 1: the late click
    # (watermark jumps a day) — after it, all but the newest purchase
    # must be pruned from state
    df.filter("event_type = 'purchase'").coalesce(1).write.parquet(os.path.join(d, "f0"))
    df.filter("event_type = 'click'").coalesce(1).write.parquet(os.path.join(d, "f1"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        asof_enrich_stream(stream, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("asof_prune")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the click matches the newest purchase
    res = spark.sql("select * from asof_prune").collect()
    assert len(res) == 1 and res[0]["purchase_event_id"] == 199
    # state kept 1 user row whose arrays were pruned to the single
    # reachable purchase (assert via the final progress state metrics)
    prog = q.lastProgress
    state = prog["stateOperators"][0]
    assert state["numRowsTotal"] == 1


def test_rocksdb_state_store_runs_stateful_query(spark, event_dir):
    """build_session(rocksdb_state_store=True) maps to the RocksDB
    provider conf; here the shared session flips the same runtime conf,
    runs the stateful sessionizer under RocksDB, and checks the state
    operator actually reported RocksDB metrics (not just that the conf
    was accepted)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, event_dir)
        q = (
            sessionize_stream(stream, gap_minutes=30)
            .writeStream.format("memory")
            .queryName("sessions_rocksdb")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        metrics = q.lastProgress["stateOperators"][0]["customMetrics"]
        assert any("rocksdb" in k.lower() for k in metrics), metrics.keys()
        # same gap-closure counts as the default-provider run asserted in
        # test_sessionize_stream_closes_sessions (state backend must not
        # change semantics)
        rows = spark.sql("select * from sessions_rocksdb").collect()
        from chapterhousedb_spark.workload import QUERIES

        batch = {
            r["user_id"]: r["n_sessions"]
            for r in QUERIES["events_sessionize"](spark, SF_SMOKE).collect()
        }
        gap_closed: dict[int, int] = {}
        for r in rows:
            if not r["by_timeout"]:
                gap_closed[r["user_id"]] = gap_closed.get(r["user_id"], 0) + 1
        for user, n_sessions in batch.items():
            assert gap_closed.get(user, 0) == n_sessions - 1
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_interval_join_streams_matches_batch(spark, event_dir, tmp_path_factory):
    """Drained stream-stream interval join == the batch range join on
    the same bounded input (clicks x purchases within 1h after, per
    user), with clicks and purchases arriving as separate streams."""
    import os

    from chapterhousedb_spark.streaming.batcher import interval_join_streams

    ev = load(spark, SF_SMOKE, "events")
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts", "event_id")
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id",
        F.col("ts").alias("rts"),
        F.col("event_id").alias("purchase_id"),
    )
    d1 = str(tmp_path_factory.mktemp("ij_clicks"))
    d2 = str(tmp_path_factory.mktemp("ij_purchases"))
    clicks.coalesce(2).write.mode("overwrite").parquet(d1)
    purchases.coalesce(2).write.mode("overwrite").parquet(d2)

    ls = spark.readStream.schema(clicks.schema).option("maxFilesPerTrigger", 1).parquet(d1)
    rs = spark.readStream.schema(purchases.schema).option("maxFilesPerTrigger", 1).parquet(d2)
    out = interval_join_streams(ls, rs, on="user_id", max_delay_seconds=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("ij_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ij_ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["purchase_id"])
        for r in spark.sql("select * from ij_stream").collect()
    }
    expected = {
        (r["event_id"], r["purchase_id"])
        for r in clicks.join(
            purchases,
            (clicks.user_id == purchases.user_id)
            & (purchases.rts >= clicks.ts)
            & (purchases.rts <= clicks.ts + F.expr("INTERVAL 3600 SECONDS")),
        ).collect()
    }
    assert len(expected) > 0  # the fixture actually exercises the window
    assert got == expected


def test_asof_enrich_stream_cross_batch_tie_is_max_event_id(spark, tmp_path_factory):
    """A purchase with the SAME timestamp but smaller event_id arriving
    in a LATER micro-batch must not shadow the already-stored larger
    one: state insertion orders by (ts, event_id), so tied lookups
    resolve to the max event_id regardless of arrival order (the
    streaming_asof_enrich oracle's rn=1 DESC semantics)."""
    import datetime as dt
    import os

    from chapterhousedb_spark.streaming.batcher import asof_enrich_stream

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    d = str(tmp_path_factory.mktemp("asof_xbatch"))
    # batch 1: the larger-id purchase; batch 2: smaller-id tie + clicks
    spark.createDataFrame(
        [(1, 10, t, "purchase", 10.0)], schema
    ).coalesce(1).write.parquet(os.path.join(d, "f0"))
    spark.createDataFrame(
        [
            (1, 5, t, "purchase", 5.0),
            (1, 20, t + dt.timedelta(minutes=1), "click", 0.0),
        ],
        schema,
    ).coalesce(1).write.parquet(os.path.join(d, "f1"))
    stream = (
        spark.readStream.schema(spark.read.parquet(os.path.join(d, "f0")).schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        asof_enrich_stream(stream)
        .writeStream.format("memory")
        .queryName("asof_xbatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["purchase_event_id"]
        for r in spark.sql("select * from asof_xbatch").collect()
    }
    assert got[20] == 10


def test_redact_pii_on_stream_matches_batch(spark, tmp_path_factory):
    """redact_pii is a stateless projection, so the identical code runs
    on a readStream and yields exactly the batch result — the property
    that lets one scrubbing definition serve backfill and ingest."""
    from chapterhousedb_spark.operators.text import redact_pii

    rows = [
        (1, "write to a@b.io from 10.0.0.1"),
        (2, "ssn 123-45-6789 plain text"),
        (3, "clean document"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    d = str(tmp_path_factory.mktemp("pii_landing"))
    df.write.mode("overwrite").parquet(d)
    out = str(tmp_path_factory.mktemp("pii_out"))
    ckpt = str(tmp_path_factory.mktemp("pii_ckpt"))
    stream = spark.readStream.schema(df.schema).parquet(d)
    run_available_now(redact_pii(stream), out, ckpt)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, redact_pii(df).collect()))
    assert got == want and len(got) == 3


def test_strip_markup_on_stream_matches_batch(spark, tmp_path_factory):
    """strip_markup is a stateless projection like redact_pii: the
    identical code runs on a readStream and yields exactly the batch
    result — one markup-scrub definition serves backfill and ingest."""
    from chapterhousedb_spark.operators.text import strip_markup

    rows = [
        (1, "<p>hello <b>world</b></p>"),
        (2, "plain &amp; simple"),
        (3, "<script>drop()</script>kept"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    d = str(tmp_path_factory.mktemp("markup_landing"))
    df.write.mode("overwrite").parquet(d)
    out = str(tmp_path_factory.mktemp("markup_out"))
    ckpt = str(tmp_path_factory.mktemp("markup_ckpt"))
    stream = spark.readStream.schema(df.schema).parquet(d)
    run_available_now(strip_markup(stream), out, ckpt)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, strip_markup(df).collect()))
    assert got == want and len(got) == 3


def test_asof_enrich_stream_state_survives_restart(spark, tmp_path_factory):
    """Stop the stream after the purchases batch, then RESTART from the
    same checkpoint with a new clicks file: the purchase history must
    come back from the state store, so post-restart clicks still match
    pre-restart purchases — the recovery property a production landing
    zone relies on."""
    import datetime as dt
    import os

    from chapterhousedb_spark.streaming.batcher import asof_enrich_stream

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "user_id long, event_id long, ts timestamp, event_type string, value double"
    )
    d = str(tmp_path_factory.mktemp("asof_restart"))
    ckpt = str(tmp_path_factory.mktemp("asof_restart_ckpt"))
    spark.createDataFrame(
        [(1, 10, t, "purchase", 42.0)], schema
    ).coalesce(1).write.parquet(os.path.join(d, "f0"))

    out = str(tmp_path_factory.mktemp("asof_restart_out"))

    def drain():
        # parquet sink: the memory sink refuses checkpoint recovery
        stream = (
            spark.readStream.schema(
                spark.read.parquet(os.path.join(d, "f0")).schema
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )
        run_available_now(asof_enrich_stream(stream), out, ckpt)

    drain()  # run 1: only the purchase; no clicks emitted
    assert spark.read.parquet(out).count() == 0
    # new file lands AFTER the first run stopped
    spark.createDataFrame(
        [(1, 20, t + dt.timedelta(minutes=5), "click", 0.0)], schema
    ).coalesce(1).write.parquet(os.path.join(d, "f1"))
    drain()  # run 2: resumes from checkpoint, reads only f1
    got = {
        r["event_id"]: (r["purchase_event_id"], r["purchase_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {20: (10, 42.0)}  # matched the pre-restart purchase


def test_dedup_stream_state_survives_restart(spark, tmp_path_factory):
    """Restart-safety of the streaming dedup: a key deduped BEFORE the
    stop must stay deduped when its duplicate arrives AFTER the restart
    — the state store, not the batch, carries the seen-keys set."""
    import datetime as dt
    import os

    from chapterhousedb_spark.streaming.batcher import (
        dedup_stream,
        run_available_now,
    )

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "user_id long, ts timestamp"
    d = str(tmp_path_factory.mktemp("dedup_restart"))
    ckpt = str(tmp_path_factory.mktemp("dedup_restart_ckpt"))
    out = str(tmp_path_factory.mktemp("dedup_restart_out"))
    spark.createDataFrame(
        [(1, t), (2, t + dt.timedelta(minutes=1))], schema
    ).coalesce(1).write.parquet(os.path.join(d, "f0"))

    def drain():
        stream = (
            spark.readStream.schema(
                spark.read.parquet(os.path.join(d, "f0")).schema
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )
        run_available_now(
            dedup_stream(stream, id_cols=["user_id"], watermark="24 hours"),
            out,
            ckpt,
        )

    drain()
    assert spark.read.parquet(out).count() == 2
    # duplicate of user 1 (newer ts, inside the horizon) + a new user
    spark.createDataFrame(
        [(1, t + dt.timedelta(minutes=2)), (3, t + dt.timedelta(minutes=3))],
        schema,
    ).coalesce(1).write.parquet(os.path.join(d, "f1"))
    drain()  # resumes from checkpoint, reads only f1
    rows = spark.read.parquet(out).collect()
    assert sorted(r["user_id"] for r in rows) == [1, 2, 3]


def test_sliding_windowed_counts_match_batch(spark, event_dir):
    """windowed_counts with a slide: every event lands in exactly
    window/slide overlapping windows; the drained complete-mode output
    must equal the batch F.window expansion."""
    stream = read_event_stream(spark, event_dir)
    agg = windowed_counts(
        stream, window="2 hours", watermark="2 hours", slide="1 hour"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_sliding")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("select * from win_sliding").collect()
    }
    batch = (
        spark.read.parquet(event_dir)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["w"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want
    assert len(got) > 0
    # 2h window / 1h slide: every event falls in exactly 2 windows, so
    # the sliding sums double-count the corpus exactly once over
    n_events = spark.read.parquet(event_dir).count()
    assert sum(got.values()) == 2 * n_events
    # and each event-hour contributes to both enclosing window starts
    import datetime

    hours = {
        (r["h"], r["event_type"])
        for r in spark.read.parquet(event_dir)
        .select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .distinct()
        .collect()
    }
    for h, et in hours:
        assert (h, et) in got and (h - datetime.timedelta(hours=1), et) in got


def test_nanos_events_source_restores_session_conf(spark, tmp_path_factory):
    """_raw_events_source on a TIMESTAMP(NANOS) events table must not
    leak spark.sql.legacy.parquet.nanosAsLong into the session: the
    nanos->micros normalization is a conf-scoped batch pass, and the
    drained stream carries the exactly-truncated micros values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chapterhousedb_spark.workload.lifecycle import _raw_events_source

    d = str(tmp_path_factory.mktemp("nanos_events"))
    ts = [1_700_000_000_000_000_000 + i * 3_600_000_000_000 + 1234 for i in range(4)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("ns")),
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["a", "b", "a", "b"]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    src = _raw_events_source(spark, d)
    q = (
        src.writeStream.format("memory")
        .queryName("nanos_norm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.conf.get(key, None) == before, "nanosAsLong leaked into the session"
    got = [
        r["us"]
        for r in spark.sql(
            "select event_id, unix_micros(ts) as us from nanos_norm order by event_id"
        ).collect()
    ]
    assert got == [t // 1000 for t in ts]


def test_merge_stream_two_batches_equal_one_shot_merge(spark, tmp_path_factory):
    """foreachBatch ingest-merge loop: two update micro-batches applied
    sequentially to the versioned base equal ONE merge_upsert of their
    union, and the version chain v0 -> v1 -> v2 is preserved."""
    import os

    from pyspark.sql import Row

    from chapterhousedb_spark.operators.merge import merge_upsert
    from chapterhousedb_spark.streaming import (
        init_versioned_base,
        merge_stream,
        read_versioned_base,
    )

    root = tmp_path_factory.mktemp("merge_stream")
    base_root = str(root / "base")
    landing = str(root / "landing")
    os.makedirs(landing)
    base = spark.createDataFrame(
        [
            Row(doc_id=1, text="one", version=0, deleted=False),
            Row(doc_id=2, text="two", version=0, deleted=False),
            Row(doc_id=3, text="three", version=0, deleted=False),
        ]
    )
    init_versioned_base(base, base_root)
    b1 = spark.createDataFrame(
        [
            Row(doc_id=2, text="two-v1", version=1, deleted=False),
            Row(doc_id=4, text="four", version=1, deleted=False),
        ]
    )
    b2 = spark.createDataFrame(
        [
            Row(doc_id=2, text="two-v2", version=2, deleted=False),
            Row(doc_id=3, text="", version=2, deleted=True),
        ]
    )
    b1.coalesce(1).write.parquet(f"{landing}/f0")
    b2.coalesce(1).write.parquet(f"{landing}/f1")
    # mtime sequence pins micro-batch order f0 then f1
    for i, d in enumerate(("f0", "f1")):
        full = os.path.join(landing, d)
        for f in os.listdir(full):
            os.utime(os.path.join(full, f), (1_600_000_000 + i, 1_600_000_000 + i))

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*")
    )
    q = merge_stream(
        stream, base_root, ["doc_id"], "version", delete_col="deleted",
        checkpoint=str(root / "ckpt"),
    )
    q.awaitTermination()

    final, ver = read_versioned_base(spark, base_root)
    assert ver == 2, "two non-empty batches must advance the version twice"
    got = {(r.doc_id, r.text, r.version) for r in final.collect()}
    want = {
        (r.doc_id, r.text, r.version)
        for r in merge_upsert(
            base, b1.unionByName(b2), ["doc_id"], "version", delete_col="deleted"
        ).collect()
    }
    assert got == want


def test_rollup_stream_matches_direct_and_skips_replay(spark, tmp_path_factory):
    """Continuous-aggregate maintenance: two event micro-batches folded
    into the versioned partials base equal the DIRECT rollup of all
    events; replaying an already-applied batch id must be a no-op
    (additive partials would otherwise double-count)."""
    import os

    from pyspark.sql import Row

    from chapterhousedb_spark.operators.rollup import rollup_final
    from chapterhousedb_spark.streaming import read_versioned_base, rollup_stream
    from chapterhousedb_spark.streaming.batcher import _read_rollup_state

    root = tmp_path_factory.mktemp("rollup_stream")
    base_root = str(root / "partials")
    landing = str(root / "landing")
    os.makedirs(landing)
    rows = [
        Row(event_type="a", day="2024-01-01", value=1.5),
        Row(event_type="a", day="2024-01-01", value=2.5),
        Row(event_type="b", day="2024-01-01", value=10.0),
        Row(event_type="a", day="2024-01-02", value=4.0),
        Row(event_type="b", day="2024-01-02", value=0.25),
    ]
    all_df = spark.createDataFrame(rows)
    b1, b2 = spark.createDataFrame(rows[:3]), spark.createDataFrame(rows[3:])
    b1.coalesce(1).write.parquet(f"{landing}/f0")
    b2.coalesce(1).write.parquet(f"{landing}/f1")
    for i, d in enumerate(("f0", "f1")):
        full = os.path.join(landing, d)
        for f in os.listdir(full):
            os.utime(os.path.join(full, f), (1_600_000_000 + i,) * 2)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*")
    )
    q = rollup_stream(
        stream,
        base_root,
        keys=["event_type", "day"],
        sum_cols={"sum_value": "value"},
        scale=6,
        checkpoint=str(root / "ckpt"),
    )
    q.awaitTermination()

    base, ver = read_versioned_base(spark, base_root)
    assert ver == 1, "two non-empty batches: seed v0 + one merge"
    got = {
        (r["event_type"], r["day"]): (r["n_rows"], r["sum_value"])
        for r in rollup_final(base, ["sum_value"]).collect()
    }
    want = {
        ("a", "2024-01-01"): (2, 4.0),
        ("b", "2024-01-01"): (1, 10.0),
        ("a", "2024-01-02"): (1, 4.0),
        ("b", "2024-01-02"): (1, 0.25),
    }
    assert got == want
    direct = {
        (r["event_type"], r["day"]): (r["n_rows"], r["sum_value"])
        for r in rollup_final(
            __import__("chapterhousedb_spark.operators.rollup", fromlist=["rollup_partials"])
            .rollup_partials(all_df, ["event_type", "day"], {"sum_value": "value"}, scale=6),
            ["sum_value"],
        ).collect()
    }
    assert got == direct

    # a DIFFERENT checkpoint against the same base must be refused:
    # fresh-checkpoint batch ids restart at 0, making replays and new
    # data indistinguishable — silently skipping would lose data,
    # silently applying would double-count
    state = _read_rollup_state(spark, base_root)
    assert state == {"ver": 1, "batch": 1, "ckpt": str(root / "ckpt")}
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q2 = rollup_stream(
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*"),
        base_root,
        keys=["event_type", "day"],
        sum_cols={"sum_value": "value"},
        scale=6,
        checkpoint=str(root / "ckpt2"),
    )
    with pytest.raises(StreamingQueryException, match="bound to checkpoint"):
        q2.awaitTermination()
    base2, ver2 = read_versioned_base(spark, base_root)
    assert ver2 == 1, "the refused stream must not touch the base"
    got2 = {
        (r["event_type"], r["day"]): (r["n_rows"], r["sum_value"])
        for r in rollup_final(base2, ["sum_value"]).collect()
    }
    assert got2 == want


def test_rollup_stream_restart_resumes_from_checkpoint(spark, tmp_path_factory):
    """Mid-stream restart with the SAME checkpoint: the second drain
    must apply only the file that arrived while stopped — versions
    advance once per new batch and counts never double."""
    import os

    from pyspark.sql import Row

    from chapterhousedb_spark.operators.rollup import rollup_final
    from chapterhousedb_spark.streaming import read_versioned_base, rollup_stream

    root = tmp_path_factory.mktemp("rollup_restart")
    base_root = str(root / "partials")
    landing = str(root / "landing")
    ckpt = str(root / "ckpt")
    os.makedirs(landing)
    b1 = spark.createDataFrame([Row(g="a", v=1.0), Row(g="b", v=2.0)])
    b2 = spark.createDataFrame([Row(g="a", v=4.0)])
    b1.coalesce(1).write.parquet(f"{landing}/f0")

    def drain():
        q = rollup_stream(
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{landing}/*"),
            base_root,
            keys=["g"],
            sum_cols={"sv": "v"},
            scale=6,
            checkpoint=ckpt,
        )
        q.awaitTermination()

    drain()  # applies f0 only
    base, ver = read_versioned_base(spark, base_root)
    assert ver == 0
    got = {r["g"]: (r["n_rows"], r["sv"]) for r in rollup_final(base, ["sv"]).collect()}
    assert got == {"a": (1, 1.0), "b": (1, 2.0)}

    b2.coalesce(1).write.parquet(f"{landing}/f1")
    drain()  # restart: checkpoint ensures only f1 is read
    base, ver = read_versioned_base(spark, base_root)
    assert ver == 1
    got = {r["g"]: (r["n_rows"], r["sv"]) for r in rollup_final(base, ["sv"]).collect()}
    assert got == {"a": (2, 5.0), "b": (1, 2.0)}


def test_rollup_stream_maintains_histogram_partials(spark, tmp_path_factory):
    """Composition: rollup_stream with a DERIVED bin key maintains
    streaming histogram partials (bin counts are additive), and
    quantile_from_histogram answers off the maintained base — streaming
    approximate quantiles with no Spark state store."""
    import os

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.rollup import quantile_from_histogram
    from chapterhousedb_spark.streaming import read_versioned_base, rollup_stream

    root = tmp_path_factory.mktemp("hist_stream")
    base_root = str(root / "partials")
    landing = str(root / "landing")
    os.makedirs(landing)
    lo, hi, nbins = 0.0, 100.0, 10
    rows = [Row(g="a", v=float(v)) for v in [5, 15, 15, 35, 95, 55, 45, 5]]
    b1, b2 = spark.createDataFrame(rows[:4]), spark.createDataFrame(rows[4:])
    b1.coalesce(1).write.parquet(f"{landing}/f0")
    b2.coalesce(1).write.parquet(f"{landing}/f1")
    for i, d in enumerate(("f0", "f1")):
        full = os.path.join(landing, d)
        for f in os.listdir(full):
            os.utime(os.path.join(full, f), (1_600_000_000 + i,) * 2)

    width = (hi - lo) / nbins
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*")
        .withColumn(
            "bin",
            F.least(
                F.lit(nbins - 1),
                F.greatest(F.lit(0), F.floor((F.col("v") - lo) / width).cast("int")),
            ),
        )
    )
    q = rollup_stream(
        stream,
        base_root,
        keys=["g", "bin"],
        sum_cols={},
        checkpoint=str(root / "ckpt"),
    )
    q.awaitTermination()

    base, _ = read_versioned_base(spark, base_root)
    partials = base.withColumnRenamed("n_rows", "bin_n")
    got = {(r["g"], r["bin"]): r["bin_n"] for r in partials.collect()}
    # values 5,5 -> bin 0; 15,15 -> bin 1; 35 -> 3; 45 -> 4; 55 -> 5; 95 -> 9
    assert got == {
        ("a", 0): 2, ("a", 1): 2, ("a", 3): 1, ("a", 4): 1, ("a", 5): 1, ("a", 9): 1,
    }
    med = quantile_from_histogram(
        partials, ["g"], q=0.5, lo=lo, hi=hi, nbins=nbins, out_col="p50"
    ).collect()
    # 8 values, ceil(0.5*8)=4th ordered value is 15 -> bin 1 -> upper edge 20
    assert med[0]["p50"] == 20.0


def test_interval_join_outer_emits_unmatched_after_watermark(spark, tmp_path_factory):
    """LEFT OUTER stream-stream interval join: matched pairs emit like
    the inner join; clicks with no purchase in their window emit with
    NULLs once the watermark passes the window end; clicks whose window
    the final watermark never passes are withheld (the append-mode
    cutoff, same rule as the windowed parquet sink)."""
    import datetime
    import os

    from pyspark.sql import Row

    from chapterhousedb_spark.streaming import interval_join_streams_outer

    root = tmp_path_factory.mktemp("ij_outer")
    cdir, pdir = str(root / "clicks"), str(root / "purchases")

    def ts(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    clicks = spark.createDataFrame(
        [
            Row(user_id=1, click_id=10, ts=ts(0)),    # converts (10:15 window? no - 0:xx)
            Row(user_id=2, click_id=20, ts=ts(0)),    # no purchase -> unmatched, window end 1:00 << final wm
            Row(user_id=3, click_id=30, ts=ts(11)),   # no purchase, window end 12:00, final wm = 12:00 - 2h = 10:00 -> WITHHELD
            Row(user_id=1, click_id=11, ts=ts(12)),   # advances watermark; window open -> withheld (no match after)
        ]
    )
    purchases = spark.createDataFrame(
        [
            Row(user_id=1, purchase_id=100, rts=ts(0, 30), purchase_value=5.0),
            Row(user_id=9, purchase_id=900, rts=ts(12), purchase_value=1.0),
        ]
    )
    clicks.coalesce(1).write.parquet(cdir)
    purchases.coalesce(1).write.parquet(pdir)

    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    ps = spark.readStream.schema(purchases.schema).parquet(pdir)
    joined = interval_join_streams_outer(
        cs, ps, on="user_id", left_ts="ts", right_ts="rts",
        max_delay_seconds=3600, watermark="2 hours",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_outer")
        .outputMode("append")
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from ij_outer").collect()
    got = {(r["click_id"], r["purchase_id"]) for r in rows}
    # click 10 matched; click 20 unmatched-emitted (window end 01:00,
    # final watermark 10:00); clicks 30/11 withheld (window ends 12:00/
    # 13:00 >= final watermark 10:00)
    assert (10, 100) in got
    assert (20, None) in got
    assert not any(c in (30, 11) for c, _ in got), got


def test_rollup_stream_default_checkpoint_continues_across_runs(
    spark, tmp_path_factory
):
    """With no checkpoint argument the checkpoint is PINNED TO THE BASE
    ({base_root}/_checkpoint), so successive rollup_stream calls over a
    growing landing dir continue exactly — new files are the only
    batches applied, nothing is dropped or double-counted (the failure
    mode of the old fresh-mkdtemp default)."""
    import os

    from pyspark.sql import Row

    from chapterhousedb_spark.operators.rollup import rollup_final
    from chapterhousedb_spark.streaming import read_versioned_base, rollup_stream

    root = tmp_path_factory.mktemp("rollup_defckpt")
    base_root = str(root / "partials")
    landing = str(root / "landing")
    os.makedirs(landing)
    b1 = spark.createDataFrame([Row(g="a", v=1.0)])
    b2 = spark.createDataFrame([Row(g="a", v=2.0), Row(g="b", v=3.0)])
    b1.coalesce(1).write.parquet(f"{landing}/f0")

    def drain():
        q = rollup_stream(
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{landing}/*"),
            base_root,
            keys=["g"],
            sum_cols={"sv": "v"},
            scale=6,
        )
        q.awaitTermination()

    drain()
    b2.coalesce(1).write.parquet(f"{landing}/f1")
    drain()  # second invocation, NO checkpoint passed: must continue
    base, ver = read_versioned_base(spark, base_root)
    assert ver == 1
    got = {r["g"]: (r["n_rows"], r["sv"]) for r in rollup_final(base, ["sv"]).collect()}
    assert got == {"a": (2, 3.0), "b": (1, 3.0)}


def test_ingest_loop_cross_dedup_gate_then_merge(spark, tmp_path_factory):
    """The production ingest composition the operators are built for:
    per micro-batch, near-dups of the EXISTING corpus are rejected by
    the bipartite MinHash gate (minhash_near_dup_pairs_cross) and only
    novel documents merge into the versioned base. Two batches drain;
    the final corpus holds the originals plus the genuinely new docs,
    and a batch-2 near-dup of a batch-1 ADMITTED doc is also rejected
    (the gate always compares against the CURRENT corpus version)."""
    import os

    from pyspark.sql import Row

    from chapterhousedb_spark.operators.dedup import minhash_near_dup_pairs_cross
    from chapterhousedb_spark.operators.merge import merge_upsert
    from chapterhousedb_spark.streaming import (
        init_versioned_base,
        read_versioned_base,
    )

    root = tmp_path_factory.mktemp("ingest_gate")
    base_root = str(root / "corpus")
    landing = str(root / "landing")
    os.makedirs(landing)
    t0 = "the quick brown fox jumps over the lazy dog again and again " * 3
    t1 = "completely different content about spark and parquet tables " * 3
    novel1 = "a genuinely new document with its own unique words " * 3
    novel2 = "another new arrival entirely unlike anything before it " * 3
    init_versioned_base(
        spark.createDataFrame(
            [Row(doc_id=0, text=t0, version=0), Row(doc_id=1, text=t1, version=0)]
        ),
        base_root,
    )
    b1 = spark.createDataFrame(
        [
            Row(doc_id=100, text=t0 + " tail", version=1),   # near-dup of corpus 0 -> reject
            Row(doc_id=101, text=novel1, version=1),          # admit
        ]
    )
    b2 = spark.createDataFrame(
        [
            Row(doc_id=200, text=novel1 + " tweak", version=2),  # near-dup of ADMITTED 101 -> reject
            Row(doc_id=201, text=novel2, version=2),             # admit
        ]
    )
    b1.coalesce(1).write.parquet(f"{landing}/f0")
    b2.coalesce(1).write.parquet(f"{landing}/f1")
    for i, d in enumerate(("f0", "f1")):
        full = os.path.join(landing, d)
        for f in os.listdir(full):
            os.utime(os.path.join(full, f), (1_600_000_000 + i,) * 2)

    def _apply(batch_df, batch_id):
        sess = batch_df.sparkSession
        corpus, ver = read_versioned_base(sess, base_root)
        dup_ids = minhash_near_dup_pairs_cross(
            batch_df, corpus, threshold=0.7
        ).select(F.col("batch_id").alias("doc_id")).distinct()
        survivors = batch_df.join(dup_ids, "doc_id", "left_anti")
        merged = merge_upsert(corpus, survivors, ["doc_id"], "version")
        merged.write.mode("overwrite").parquet(f"{base_root}/v{ver + 1:06d}")
        from chapterhousedb_spark.streaming.batcher import _write_latest_marker

        _write_latest_marker(sess, base_root, ver + 1)

    q = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*")
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final, ver = read_versioned_base(spark, base_root)
    assert ver == 2
    assert {r["doc_id"] for r in final.collect()} == {0, 1, 101, 201}


def test_ingest_loop_maintains_cluster_labels(spark, tmp_path_factory):
    """Completes the ingest story the cross-corpus gates start
    (VERDICT r6 next-round #5): every micro-batch is ADMITTED into the
    versioned base, and the corpus' dedup-cluster labels are folded
    forward with components_update (batch><corpus cross pairs + batch
    self pairs) instead of recomputing components from scratch. After
    two batches the maintained labels must equal a one-shot
    connected_components recompute over ALL pairs on the final corpus."""
    import os

    from pyspark.sql import Row

    from chapterhousedb_spark.operators.cluster import (
        components_update,
        connected_components,
    )
    from chapterhousedb_spark.operators.dedup import (
        minhash_near_dup_pairs,
        minhash_near_dup_pairs_cross,
    )
    from chapterhousedb_spark.operators.merge import merge_upsert
    from chapterhousedb_spark.streaming import (
        init_versioned_base,
        read_versioned_base,
    )
    from chapterhousedb_spark.streaming.batcher import _write_latest_marker

    root = tmp_path_factory.mktemp("ingest_labels")
    base_root = str(root / "corpus")
    labels_root = str(root / "labels")
    landing = str(root / "landing")
    os.makedirs(landing)
    os.makedirs(labels_root)
    t0 = "the quick brown fox jumps over the lazy dog again and again " * 3
    t1 = "completely different content about spark and parquet tables " * 3
    novel1 = "a genuinely new document with its own unique words " * 3
    base = spark.createDataFrame(
        [Row(doc_id=0, text=t0, version=0), Row(doc_id=1, text=t1, version=0)]
    )
    init_versioned_base(base, base_root)
    # initial labels: corpus singletons
    base.selectExpr(
        "doc_id AS id", "doc_id AS component"
    ).write.parquet(f"{labels_root}/v0")
    # batch 1: 100 dups corpus-0; 101 novel; 102 dups 101 (in-batch pair)
    b1 = spark.createDataFrame(
        [
            Row(doc_id=100, text=t0 + " tail", version=1),
            Row(doc_id=101, text=novel1, version=1),
            Row(doc_id=102, text=novel1 + " tweak", version=1),
        ]
    )
    # batch 2: 200 dups the ADMITTED 101 cluster; 201 novel singleton
    b2 = spark.createDataFrame(
        [
            Row(doc_id=200, text=novel1 + " twist", version=2),
            Row(doc_id=201, text="another arrival unlike anything " * 5, version=2),
        ]
    )
    b1.coalesce(1).write.parquet(f"{landing}/f0")
    b2.coalesce(1).write.parquet(f"{landing}/f1")
    for i, d in enumerate(("f0", "f1")):
        full = os.path.join(landing, d)
        for f in os.listdir(full):
            os.utime(os.path.join(full, f), (1_600_000_000 + i,) * 2)

    def _apply(batch_df, batch_id):
        sess = batch_df.sparkSession
        corpus, ver = read_versioned_base(sess, base_root)
        labels = sess.read.parquet(f"{labels_root}/v{ver}")
        cross = minhash_near_dup_pairs_cross(
            batch_df, corpus, threshold=0.6
        ).select(
            F.col("batch_id").alias("id_a"), F.col("corpus_id").alias("id_b")
        )
        selfp = minhash_near_dup_pairs(
            batch_df, threshold=0.6, persist=False
        ).select("id_a", "id_b")
        new_labels = components_update(
            labels, cross.unionByName(selfp),
            new_nodes=batch_df.select("doc_id"),
        )
        new_labels.write.parquet(f"{labels_root}/v{ver + 1}")
        merged = merge_upsert(corpus, batch_df, ["doc_id"], "version")
        merged.write.mode("overwrite").parquet(f"{base_root}/v{ver + 1:06d}")
        _write_latest_marker(sess, base_root, ver + 1)

    q = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*")
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final, ver = read_versioned_base(spark, base_root)
    assert ver == 2
    got = {
        r["id"]: r["component"]
        for r in spark.read.parquet(f"{labels_root}/v2").collect()
    }
    # oracle: one-shot recompute — all near-dup pairs over the FINAL
    # corpus (same hash family/threshold), all docs as nodes
    all_pairs = minhash_near_dup_pairs(final, threshold=0.6, persist=False)
    want = {
        r["id"]: r["component"]
        for r in connected_components(
            all_pairs.select("id_a", "id_b"), nodes=final.select("doc_id")
        ).collect()
    }
    assert got == want
    # meaning: 0~100 one cluster; 101/102/200 one cluster; 1, 201 singletons
    assert got[100] == 0 and got[102] == got[101] == got[200]
    assert got[1] == 1 and got[201] == 201


def test_ingest_stream_operator_both_modes(spark, tmp_path_factory):
    """The composed ingest surface (operators/ingest.py): a landing dir
    drains through ingest_stream in BOTH modes. Reject mode must
    reproduce the manual gate->merge composition (near-dups of the
    current corpus version rejected, chained across batches);
    provenance mode admits everything and the maintained labels equal
    a one-shot recompute on the final corpus."""
    import os

    from pyspark.sql import Row

    from chapterhousedb_spark.operators.cluster import connected_components
    from chapterhousedb_spark.operators.dedup import minhash_near_dup_pairs
    from chapterhousedb_spark.operators.ingest import (
        ingest_stream,
        init_ingest,
    )
    from chapterhousedb_spark.streaming import read_versioned_base

    t0 = "the quick brown fox jumps over the lazy dog again and again " * 3
    t1 = "completely different content about spark and parquet tables " * 3
    novel1 = "a genuinely new document with its own unique words " * 3
    novel2 = "another new arrival entirely unlike anything before it " * 3
    seed = spark.createDataFrame(
        [Row(doc_id=0, text=t0, version=0), Row(doc_id=1, text=t1, version=0)]
    )
    b1 = spark.createDataFrame(
        [
            Row(doc_id=100, text=t0 + " tail", version=1),   # dup of 0
            Row(doc_id=101, text=novel1, version=1),
        ]
    )
    b2 = spark.createDataFrame(
        [
            Row(doc_id=200, text=novel1 + " tweak", version=2),  # dup of 101
            Row(doc_id=201, text=novel2, version=2),
        ]
    )

    def stage_landing(root):
        landing = str(root / "landing")
        os.makedirs(landing)
        b1.coalesce(1).write.parquet(f"{landing}/f0")
        b2.coalesce(1).write.parquet(f"{landing}/f1")
        for i, d in enumerate(("f0", "f1")):
            full = os.path.join(landing, d)
            for f in os.listdir(full):
                os.utime(os.path.join(full, f), (1_600_000_000 + i,) * 2)
        return landing

    # ---- reject mode (crawl dedup): no labels needed
    root = tmp_path_factory.mktemp("ingest_op_reject")
    landing = stage_landing(root)
    init_ingest(seed, str(root / "corpus"))
    q = ingest_stream(
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*"),
        str(root / "corpus"),
        str(root / "ckpt"),
        threshold=0.7,
    )
    q.awaitTermination()
    final, ver = read_versioned_base(spark, str(root / "corpus"))
    assert ver == 2
    assert {r["doc_id"] for r in final.collect()} == {0, 1, 101, 201}

    # ---- provenance mode: admit all, maintain labels
    root = tmp_path_factory.mktemp("ingest_op_prov")
    landing = stage_landing(root)
    init_ingest(seed, str(root / "corpus"), labels_root=str(root / "labels"))
    q = ingest_stream(
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*"),
        str(root / "corpus"),
        str(root / "ckpt"),
        labels_root=str(root / "labels"),
        reject_near_dups=False,
        threshold=0.6,
    )
    q.awaitTermination()
    final, ver = read_versioned_base(spark, str(root / "corpus"))
    assert ver == 2
    assert final.count() == 6  # everything admitted
    got = {
        r["id"]: r["component"]
        for r in spark.read.parquet(f"{root}/labels/v2").collect()
    }
    pairs = minhash_near_dup_pairs(final, threshold=0.6, persist=False)
    want = {
        r["id"]: r["component"]
        for r in connected_components(
            pairs.select("id_a", "id_b"), nodes=final.select("doc_id")
        ).collect()
    }
    assert got == want
    assert got[100] == 0 and got[200] == got[101]

    # reject-without-labels contract
    import pytest as _pytest

    with _pytest.raises(ValueError, match="labels_root"):
        from chapterhousedb_spark.operators.ingest import admit_batch

        admit_batch(b1, str(root / "corpus"), reject_near_dups=False)


def test_ingest_stream_maintains_quantized_indexes(spark, tmp_path_factory):
    """The quantized index family inside the versioned-corpus story
    (VERDICT r9 #2): an embedding corpus drains through ingest_stream
    with index_paths pointing at persisted SQ8 and PQ layouts. Each
    admitted micro-batch must append against the FROZEN quantizer
    state, and after the drain both indexes must probe identically to
    a rebuild that encodes the FINAL corpus version with that same
    frozen state (rejected near-dups never reach the index)."""
    import os

    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from chapterhousedb_spark.operators.ingest import ingest_stream, init_ingest
    from chapterhousedb_spark.operators.similarity import (
        _write_json_artifact,
        embedding_near_dup_pairs_cross,
        ivf_assign,
        mrl_probe_topk,
        mrl_write_index,
        pq_encode,
        pq_probe_topk,
        pq_write_index,
        sq8_probe_topk,
        sq8_quantize,
        sq8_write_index,
    )
    from chapterhousedb_spark.streaming import read_versioned_base

    dims = 8
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(20, dims)).astype(np.float64)
    vecs[12] = vecs[3] + 1e-4  # batch-1 near-dup of seed row 3 -> rejected
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            T.StructField("version", T.IntegerType(), False),
        ]
    )

    def frame(ids, version):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in vecs[i]], version) for i in ids],
            schema,
        )

    seed = frame(range(10), 0)
    b1, b2 = frame(range(10, 15), 1), frame(range(15, 20), 2)

    root = tmp_path_factory.mktemp("ingest_qidx")
    landing = str(root / "landing")
    os.makedirs(landing)
    b1.coalesce(1).write.parquet(f"{landing}/f0")
    b2.coalesce(1).write.parquet(f"{landing}/f1")
    for i, d in enumerate(("f0", "f1")):
        for f in os.listdir(os.path.join(landing, d)):
            os.utime(os.path.join(landing, d, f), (1_600_000_000 + i,) * 2)

    sq8_path, pq_path = str(root / "sq8"), str(root / "pq")
    mrl_path = str(root / "mrl")
    sq8_meta = sq8_write_index(seed, sq8_path, n_cells=2, max_iter=2)
    pq_meta = pq_write_index(seed, pq_path, n_cells=2, m=4, nbits=3, max_iter=2)
    mrl_write_index(seed, mrl_path, prefix_dims=4)
    init_ingest(seed, str(root / "corpus"), id_col="vec_id")

    def gate(batch, corpus):
        return embedding_near_dup_pairs_cross(batch, corpus, threshold=0.9999)

    q = ingest_stream(
        spark.readStream.schema(seed.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*"),
        str(root / "corpus"),
        str(root / "ckpt"),
        id_col="vec_id",
        gate_fn=gate,
        index_paths={"sq8": sq8_path, "pq": pq_path, "mrl": mrl_path},
    )
    q.awaitTermination()

    final, ver = read_versioned_base(spark, str(root / "corpus"))
    ids = {r["vec_id"] for r in final.collect()}
    assert ver == 2
    assert 12 not in ids and len(ids) == 19  # the near-dup was rejected

    # rebuilds: the FINAL corpus encoded with the frozen state
    sq8_rebuilt, pq_rebuilt = str(root / "sq8_rb"), str(root / "pq_rb")
    coded = ivf_assign(
        sq8_quantize(final, sq8_meta["mins"], sq8_meta["maxs"]),
        sq8_meta["centroids"],
    )
    coded.write.partitionBy("ivf_cell").parquet(sq8_rebuilt + "/corpus")
    _write_json_artifact(spark, sq8_rebuilt, "sq8.json", sq8_meta)
    pq_coded = pq_encode(
        ivf_assign(final, pq_meta["centroids"]), pq_meta["codebooks"]
    )
    pq_coded.write.partitionBy("ivf_cell").parquet(pq_rebuilt + "/corpus")
    _write_json_artifact(spark, pq_rebuilt, "pq.json", pq_meta)

    qv = [1.0] * dims
    for nprobe, refine in ((1, 0), (2, 0), (2, 8)):
        got = [
            tuple(r)
            for r in sq8_probe_topk(
                spark, sq8_path, qv, k=25, nprobe=nprobe, refine=refine
            ).collect()
        ]
        want = [
            tuple(r)
            for r in sq8_probe_topk(
                spark, sq8_rebuilt, qv, k=25, nprobe=nprobe, refine=refine
            ).collect()
        ]
        assert got == want, ("sq8", nprobe, refine)
        got = [
            tuple(r)
            for r in pq_probe_topk(
                spark, pq_path, qv, k=25, nprobe=nprobe, refine=refine
            ).collect()
        ]
        want = [
            tuple(r)
            for r in pq_probe_topk(
                spark, pq_rebuilt, qv, k=25, nprobe=nprobe, refine=refine
            ).collect()
        ]
        assert got == want, ("pq", nprobe, refine)
    # full-probe row counts: every admitted row is in all three indexes
    assert (
        sq8_probe_topk(spark, sq8_path, qv, k=100, nprobe=2).count() == 19
    )
    assert pq_probe_topk(spark, pq_path, qv, k=100, nprobe=2).count() == 19
    assert mrl_probe_topk(spark, mrl_path, qv, k=100).count() == 19
    # mrl appends are stateless slices: full refine over the
    # maintained index == exact brute force over the final corpus
    from chapterhousedb_spark.operators.similarity import cosine_topk

    got_mrl = [
        tuple(r)
        for r in mrl_probe_topk(spark, mrl_path, qv, k=5, refine=100).collect()
    ]
    want_mrl = [
        (r["vec_id"], r["cosine"])
        for r in cosine_topk(final, qv, k=5).collect()
    ]
    assert [v for v, _ in got_mrl] == [v for v, _ in want_mrl]
    # unknown index kind is a loud error, not a silent skip
    from chapterhousedb_spark.operators.ingest import admit_batch

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown index kind"):
        admit_batch(
            frame([19], 3),
            str(root / "corpus"),
            id_col="vec_id",
            gate_fn=gate,
            index_paths={"hnsw": "/nope"},
        )


def test_admit_batch_custom_gate_fn(spark, tmp_path_factory):
    """admit_batch with a swapped duplicate detector: the SimHash
    bipartite gate via gate_fn rejects the same planted near-dup the
    default MinHash gate would."""
    from functools import partial

    from pyspark.sql import Row

    from chapterhousedb_spark.operators.dedup import (
        simhash_near_dup_pairs_cross,
    )
    from chapterhousedb_spark.operators.ingest import admit_batch, init_ingest
    from chapterhousedb_spark.streaming import read_versioned_base

    root = tmp_path_factory.mktemp("ingest_gatefn")
    t0 = "the quick brown fox jumps over the lazy dog again and again " * 3
    novel = "a genuinely new document with its own unique words " * 3
    init_ingest(
        spark.createDataFrame([Row(doc_id=0, text=t0, version=0)]),
        str(root / "corpus"),
    )
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=t0 + " tail", version=1),
            Row(doc_id=101, text=novel, version=1),
        ]
    )
    res = admit_batch(
        batch,
        str(root / "corpus"),
        gate_fn=partial(simhash_near_dup_pairs_cross, max_hamming=6, chunks=7),
    )
    assert res == {
        "version": 1, "n_batch": 2, "n_admitted": 1, "n_rejected": 1,
        "n_quality_rejected": 0,
    }
    final, ver = read_versioned_base(spark, str(root / "corpus"))
    assert {r["doc_id"] for r in final.collect()} == {0, 101}


def test_admit_batch_crash_replay_is_idempotent(spark, tmp_path_factory):
    """Crash-safety of the admission commit point: a batch that wrote
    its corpus+labels v+1 directories but crashed BEFORE the _LATEST
    flip must replay cleanly (the orphan v+1 dirs are overwritten) and
    produce the same committed state."""
    from pyspark.sql import Row

    from chapterhousedb_spark.operators.ingest import admit_batch, init_ingest
    from chapterhousedb_spark.streaming import read_versioned_base

    root = tmp_path_factory.mktemp("ingest_replay")
    corpus_root, labels_root = str(root / "corpus"), str(root / "labels")
    t0 = "the quick brown fox jumps over the lazy dog again and again " * 3
    novel = "a genuinely new document with its own unique words " * 3
    init_ingest(
        spark.createDataFrame([Row(doc_id=0, text=t0, version=0)]),
        corpus_root,
        labels_root=labels_root,
    )
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=t0 + " tail", version=1),
            Row(doc_id=101, text=novel, version=1),
        ]
    )
    # simulate the crash: run a full admission, then rewind the marker
    # to v0 (as if the flip never happened) — the v1 dirs stay orphaned
    from chapterhousedb_spark.streaming.batcher import _write_latest_marker

    admit_batch(batch, corpus_root, labels_root=labels_root,
                reject_near_dups=False)
    _write_latest_marker(spark, corpus_root, 0)
    # replay: must overwrite the orphan v1 dirs, not die on errorifexists
    res = admit_batch(batch, corpus_root, labels_root=labels_root,
                      reject_near_dups=False)
    assert res["version"] == 1 and res["n_admitted"] == 2
    final, ver = read_versioned_base(spark, corpus_root)
    assert ver == 1
    assert {r["doc_id"] for r in final.collect()} == {0, 100, 101}
    labels = {
        r["id"]: r["component"]
        for r in spark.read.parquet(f"{labels_root}/v1").collect()
    }
    assert labels[100] == 0 and 101 in labels


def test_quota_stream_caps_per_key_across_batches(spark, event_dir, tmp_path_factory):
    """Lifetime per-key quota: draining the landing dir one file per
    trigger admits at most `quota` rows per event_type TOTAL (state
    carries across micro-batches), never duplicates a row, and admits
    exactly min(quota, available) per key."""
    from chapterhousedb_spark.streaming import quota_stream, read_event_stream

    out = str(tmp_path_factory.mktemp("quota_out"))
    ckpt = str(tmp_path_factory.mktemp("quota_ckpt"))
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    q = (
        quota_stream(stream, key_col="event_type", quota=40)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    per_key = {
        r["event_type"]: r["n"]
        for r in got.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    avail = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(event_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_key, per_key
    for k, n in per_key.items():
        assert n == min(40, avail[k]), (k, n, avail[k])
    # no duplicates, and every admitted row exists in the source
    assert got.count() == got.select("event_id").distinct().count()
    assert got.join(
        spark.read.parquet(event_dir).select("event_id"), "event_id", "left_anti"
    ).count() == 0


def test_quota_stream_weighted_budget(spark, tmp_path_factory):
    """Token-weighted streaming quota (the stream twin of
    token_budget_mix): per key, rows admit until the consumed WEIGHT
    reaches the budget — the budget-crossing row is admitted, the
    rest drop, state carries across micro-batches."""
    import datetime as dt
    import os

    from pyspark.sql import Row

    from chapterhousedb_spark.streaming import quota_stream

    landing = str(tmp_path_factory.mktemp("wq_landing"))
    # two batches of the same key; weights 40+40 then 40+40, budget 100:
    # batch1 admits both (0<100, 40<100); batch2 admits e3 (80<100)
    # but not e4 (120 >= 100)
    b1 = [
        Row(event_id=1, ts=dt.datetime(2024, 1, 1, 0, 0), user_id=1,
            event_type="a", value=40.0, props="x"),
        Row(event_id=2, ts=dt.datetime(2024, 1, 1, 0, 1), user_id=1,
            event_type="a", value=40.0, props="x"),
    ]
    b2 = [
        Row(event_id=3, ts=dt.datetime(2024, 1, 1, 0, 2), user_id=1,
            event_type="a", value=40.0, props="x"),
        Row(event_id=4, ts=dt.datetime(2024, 1, 1, 0, 3), user_id=1,
            event_type="a", value=40.0, props="x"),
    ]
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{landing}/f0")
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{landing}/f1")
    for i, d in enumerate(("f0", "f1")):
        full = os.path.join(landing, d)
        for f in os.listdir(full):
            os.utime(os.path.join(full, f), (1_600_000_000 + i,) * 2)
    schema = spark.createDataFrame(b1).schema
    out = str(tmp_path_factory.mktemp("wq_out"))
    ckpt = str(tmp_path_factory.mktemp("wq_ckpt"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*")
    )
    q = (
        quota_stream(stream, key_col="event_type", quota=100, weight_col="value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


def test_c4_and_repetition_filters_on_stream_match_batch(
    spark, tmp_path_factory
):
    """The round-9 text filters are stateless projections, so the same
    code cleans a landing stream exactly as it cleans the batch
    corpus. (ngram_repetition_stats aggregates per doc WITHIN a row's
    own text only — no cross-row state — but its groupBy makes it a
    batch op; the stream twin here is c4_line_filters, which is pure
    per-row.)"""
    from chapterhousedb_spark.operators.text import c4_line_filters

    src = str(tmp_path_factory.mktemp("c4_src"))
    out = str(tmp_path_factory.mktemp("c4_out"))
    ckpt = str(tmp_path_factory.mktemp("c4_ckpt"))
    rows = [
        (1, "Keep this full sentence with enough words.\nno punct drop"),
        (2, "Short.\nA second proper sentence that is long enough!"),
        (3, "lorem ipsum should be dropped from this doc entirely."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    cleaned = c4_line_filters(stream)
    (
        cleaned.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines_kept"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (r["text_clean"], r["n_lines_kept"])
        for r in c4_line_filters(df).collect()
    }
    assert got == want and got[3][1] == 0


def test_admit_batch_quality_gate(spark, tmp_path_factory):
    """admit_batch(quality_fn=...) — the FineWeb admission shape
    (VERDICT r10 #8): low-quality docs are rejected BEFORE the dedup
    gate, counted separately, and never reach the corpus, the labels,
    or the near-dup join; the seed version is untouched."""
    from pyspark.sql import Row

    from chapterhousedb_spark.operators.ingest import (
        admit_batch,
        fineweb_quality_gate,
        init_ingest,
    )
    from chapterhousedb_spark.streaming import read_versioned_base

    root = tmp_path_factory.mktemp("ingest_quality")
    good = (
        "the quick brown fox jumps over the lazy dog to be of use. "
        "it runs again and again with that same joy. the end is here."
    )
    init_ingest(
        spark.createDataFrame([Row(doc_id=0, text=good, version=0)]),
        str(root / "corpus"),
    )
    batch = spark.createDataFrame(
        [
            # near-dup of the seed -> rejected by the DEDUP gate
            Row(doc_id=100, text=good + " small tail here.", version=1),
            # symbol spam -> rejected by the QUALITY gate (gopher)
            Row(doc_id=101, text="### ### ### ### spam", version=1),
            # brace line -> rejected by the QUALITY gate (C4 only)
            Row(
                doc_id=102,
                text="this {brace} kills the page and that to be of. x. y.",
                version=1,
            ),
            # clean novel doc -> admitted
            Row(
                doc_id=103,
                text=(
                    "a genuinely new document with its own unique words. "
                    "it has several proper sentences to be sure of. "
                    "that ending arrives with the final stop."
                ),
                version=1,
            ),
        ]
    )
    res = admit_batch(
        batch,
        str(root / "corpus"),
        quality_fn=fineweb_quality_gate(),
        threshold=0.5,
    )
    assert res == {
        "version": 1,
        "n_batch": 4,
        "n_admitted": 1,
        "n_rejected": 3,
        "n_quality_rejected": 2,
    }
    final, ver = read_versioned_base(spark, str(root / "corpus"))
    assert ver == 1
    assert {r["doc_id"] for r in final.collect()} == {0, 103}


def test_admit_batch_dsir_gate(spark, tmp_path_factory):
    """admit_batch(quality_fn=dsir_quality_gate(...)) — the CCNet/DSIR
    admission shape: incoming docs are scored against a FROZEN
    importance model (trained offline, target vs raw) and only
    target-like docs reach the dedup gate and the corpus."""
    from pyspark.sql import Row

    from chapterhousedb_spark.operators.dsir import (
        dsir_quality_gate,
        dsir_train,
    )
    from chapterhousedb_spark.operators.ingest import admit_batch, init_ingest
    from chapterhousedb_spark.streaming import read_versioned_base

    # offline model: target = astronomy, raw = astronomy + cooking
    target = spark.createDataFrame(
        [
            (0, "star galaxy nebula orbit comet"),
            (1, "galaxy orbit comet star nebula"),
        ],
        "doc_id long, text string",
    )
    raw = target.unionByName(
        spark.createDataFrame(
            [
                (2, "flour oven butter sugar dough"),
                (3, "dough sugar oven flour butter"),
            ],
            "doc_id long, text string",
        )
    )
    model = dsir_train(target, raw, num_buckets=64, salt="dsir-gate-t")

    root = tmp_path_factory.mktemp("ingest_dsir")
    init_ingest(
        spark.createDataFrame(
            [Row(doc_id=10, text="star comet orbit map", version=0)]
        ),
        str(root / "corpus"),
    )
    batch = spark.createDataFrame(
        [
            # target-like AND novel -> admitted (log_weight ~ -1.8:
            # with target a SUBSET of raw, even target-like docs score
            # below 0 — raw already contains the target mass — so the
            # threshold is calibrated per model, not universally 0)
            Row(doc_id=100, text="nebula star comet galaxy drift", version=1),
            # raw-typical (cooking) -> rejected (log_weight ~ -4.4)
            Row(doc_id=101, text="butter dough oven sugar flour", version=1),
            # empty text: no grams, nothing to score -> not admitted
            Row(doc_id=102, text="", version=1),
        ]
    )
    res = admit_batch(
        batch,
        str(root / "corpus"),
        quality_fn=dsir_quality_gate(
            model, min_log_weight=-2.0, num_buckets=64, salt="dsir-gate-t"
        ),
        threshold=0.9,
    )
    assert res == {
        "version": 1,
        "n_batch": 3,
        "n_admitted": 1,
        "n_rejected": 2,
        "n_quality_rejected": 2,
    }
    final, ver = read_versioned_base(spark, str(root / "corpus"))
    assert ver == 1
    assert {r["doc_id"] for r in final.collect()} == {10, 100}
