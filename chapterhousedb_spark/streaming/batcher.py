"""Structured Streaming operators over event streams.

Maps the reference's DEV_NOTES streaming sketch —
`batch(deploy.stream, 10_000, '5 seconds')` — onto the real Spark
constructs: file-source micro-batches (maxFilesPerTrigger ≈ batch rows,
trigger(processingTime) ≈ the 5-second tick), watermarked windowed
aggregation for late data, and applyInPandasWithState for custom
stateful sessionization.

At scale: the file source tracks processed files in the checkpoint, so
an S3/HDFS landing dir streams exactly-once; state stores shard by key
across executors (RocksDB state store in production configs).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source event stream with an explicit schema (streaming
    sources must not infer schemas job-by-job)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling- (or, with `slide`, sliding-) window counts
    per event type.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and dropped, so state size is
    O(active windows x event types) regardless of stream length. A
    slide multiplies active windows by window/slide (each event lands
    in that many overlapping windows — the expansion happens map-side
    before the stateful agg)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_SESSION_STATE_SCHEMA = "last_ts long, n_events int, started long"
_SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.LongType(), False),
        T.StructField("n_events", T.IntegerType(), False),
        T.StructField("by_timeout", T.BooleanType(), False),
    ]
)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: gap-based sessionization with
    applyInPandasWithState (the reference has no stateful operators at
    all). Emits a row per closed session: by_timeout=False when a later
    event closed it (gap exceeded), True when the event-time timeout
    (watermark passed last_ts + gap) closed it.

    Event-time timeouts, not processing-time: with processing-time the
    query would idle wall-clock `gap_minutes` before closing sessions —
    under trigger(availableNow) that spins "no new data but cleaning up
    state" batches until the timer fires (observed live). Event-time
    timeouts resolve against the watermark, so backfills terminate and
    production streams close sessions as event time advances. State per
    user is three numbers, sharded by user_id across executors.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = []
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_list.sort()
        if state.hasTimedOut:
            if state.exists:
                last_ts, n_events, started = state.get
                rows.append((user_id, started, int(n_events), True))
                state.remove()
        else:
            if state.exists:
                last_ts, n_events, started = state.get
            else:
                last_ts, n_events, started = None, 0, None
            for t in ts_list:
                if last_ts is not None and t - last_ts > gap_us:
                    rows.append((user_id, started, int(n_events), False))
                    n_events, started = 0, t
                if started is None:
                    started = t
                n_events += 1
                last_ts = t
            if last_ts is not None:
                state.update((last_ts, n_events, started))
                # close when the watermark passes last event + gap (ms)
                state.setTimeoutTimestamp(last_ts // 1000 + gap_minutes * 60 * 1000)
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "session_start", "n_events", "by_timeout"]
            )

    return (
        events.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_ASOF_STATE_SCHEMA = (
    "p_ts array<long>, p_id array<long>, p_val array<double>"
)
_ASOF_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("purchase_event_id", T.LongType(), True),
        T.StructField("purchase_value", T.DoubleType(), True),
    ]
)


def asof_enrich_stream(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming as-of enrichment: each left-type event (click) is
    emitted with the most recent right-type event (purchase) from the
    same user at-or-before it — the streaming twin of
    operators.asof.asof_join (which this matches exactly on a drained
    bounded input; tests assert it).

    Stateful construction (applyInPandasWithState keyed by user_id)
    rather than a stream-stream join: Spark's interval join emits ALL
    purchases in the time range, and the "latest per click" reduction
    on top would chain two stateful operators. Here state per user is
    the purchase history pruned against the event-time watermark:
    purchases newer than the watermark must stay (a future click may
    fall between any two of them), plus ONE purchase older than the
    watermark — the newest such — because any click still admissible
    (ts >= watermark) can reach no older purchase than that. So state
    is O(purchases inside the lateness horizon), not O(stream).

    Append-mode limit, documented not hidden: rows within one
    micro-batch are matched in event-time order, but a purchase
    arriving in a LATER batch with an earlier timestamp than an
    already-emitted click cannot retract that click's emitted match.
    Bound the horizon to the landing zone's real max lateness.
    """
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # not used; event-time pruning is inline
            state.remove()
            return
        import bisect
        import math

        # state lives as three parallel arrays (the state schema), but
        # the working form is ONE sorted list of (ts, id, value): a
        # per-purchase insertion is then a bisect + list.insert
        # (pointer memmove), not a rebuilt zip of the whole history —
        # O(P) tuple allocations per insert made a purchase-heavy
        # batch quadratic in history size. (ts, id) pairs are unique,
        # so probes never fall through to comparing values.
        if state.exists:
            items = list(zip(*state.get))
        else:
            items = []
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        # no leading underscore: itertuples mangles private names
        batch["ts_us"] = pd.to_datetime(batch["ts"]).astype("int64") // 1000
        # at equal timestamps, apply right-type rows (purchases) before
        # left-type rows so an exactly-tied purchase is visible to the
        # click's inclusive at-or-before match — same tie order as the
        # batch asof_join's union-sort (operators/asof.py)
        batch["rk"] = (batch["event_type"] != right_type).astype("int64")
        batch = batch.sort_values(["ts_us", "rk", "event_id"])
        for r in batch.itertuples(index=False):
            if r.event_type == right_type:
                # insertion point by (ts, event_id), not ts alone: a
                # purchase arriving in a LATER micro-batch with the
                # same ts but a smaller event_id must slot BEFORE the
                # already-stored one, so the at-or-before lookup (last
                # index <= ts) always resolves ties to the MAX
                # event_id — the documented semantics and the
                # streaming_asof_enrich oracle's rn=1 DESC dedup,
                # independent of arrival order across batches
                i = bisect.bisect_right(items, (r.ts_us, r.event_id))
                items.insert(i, (r.ts_us, r.event_id, r.value))
            elif r.event_type == left_type:
                i = bisect.bisect_right(items, (r.ts_us, math.inf)) - 1
                rows.append(
                    (
                        user_id,
                        r.event_id,
                        r.ts,
                        items[i][1] if i >= 0 else None,
                        items[i][2] if i >= 0 else None,
                    )
                )
        # prune: the watermark is already max(event ts) - horizon, and
        # clicks older than it are dropped by Spark, so every purchase
        # older than the watermark except the NEWEST one is unreachable
        wm_us = state.getCurrentWatermarkMs() * 1000
        cut = max(0, bisect.bisect_right(items, (wm_us, math.inf)) - 1)
        items = items[cut:]
        state.update(
            (
                [t for t, _, _ in items],
                [i for _, i, _ in items],
                [v for _, _, v in items],
            )
        )
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "user_id", "event_id", "ts",
                    "purchase_event_id", "purchase_value",
                ],
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=_ASOF_OUT_SCHEMA,
            stateStructType=_ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "rts",
    max_delay_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: left rows matched to right rows of
    the same key whose time falls in [left_ts, left_ts +
    max_delay_seconds] — e.g. every purchase within an hour AFTER each
    click, BOTH sides unbounded streams (enrich_stream covers the
    stream-static case; asof_enrich_stream the latest-one-only case —
    this emits ALL matches in the window).

    State bounds come from the pair (watermark on both sides + a time
    range condition on both event times): Spark derives how long each
    side's rows can still match and evicts state past that horizon —
    without the range condition a stream-stream join buffers forever.
    left_ts/right_ts must be distinct column names (rename before the
    call); output carries all columns of both sides.
    """
    return _interval_join(
        left, right, on, left_ts, right_ts, max_delay_seconds, watermark, "inner"
    )


def interval_join_streams_outer(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "rts",
    max_delay_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: like
    interval_join_streams, but left rows with NO right match inside the
    window are still emitted (right columns NULL) — the funnel-analysis
    shape ("clicks that did NOT convert within an hour"), which the
    inner join silently drops.

    The outer semantics are only decidable at the watermark: a left row
    cannot be declared unmatched until the watermark passes the END of
    its match window (left_ts + max_delay), so unmatched rows emit with
    that delay — Spark holds them in the join state exactly that long
    and the same eviction horizon bounds state as in the inner case.
    On a bounded drain (availableNow), rows whose window the final
    watermark never passes remain unmatched-UNEMITTED; tests cover the
    cutoff."""
    return _interval_join(
        left, right, on, left_ts, right_ts, max_delay_seconds, watermark, "left_outer"
    )


def _interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int,
    watermark: str,
    how: str,
) -> DataFrame:
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts])
        & (
            rw[right_ts]
            <= lw[left_ts] + F.expr(f"INTERVAL {max_delay_seconds} SECONDS")
        )
    )
    return lw.join(rw, cond, how).drop(rw[on])


def dedup_stream(
    events: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    dropDuplicatesWithinWatermark keeps only keys newer than the
    watermark horizon — a plain streaming dropDuplicates would grow
    state forever on an unbounded stream. Duplicates arriving later
    than the watermark are the accepted trade-off (bound the horizon to
    your ingestion's real max lateness). This is the streaming twin of
    operators.dedup.exact_dedup for at-least-once landing zones.
    """
    keys = id_cols or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def enrich_stream(events: DataFrame, dim: DataFrame, on: str | list[str]) -> DataFrame:
    """Stream-static enrichment join: the static dim is broadcast to
    every micro-batch (no stream-side shuffle, no state). The standard
    shape for attaching user/device/catalog attributes at ingest."""
    return events.join(F.broadcast(dim), on, "left")


def init_versioned_base(df: DataFrame, base_root: str) -> str:
    """Seed a versioned parquet base: write `df` as v000000 and point
    the _LATEST marker at it. The versioned layout is what makes
    streaming merge safe on plain parquet: every merge writes a NEW
    version directory and flips the marker last, so readers never see a
    half-written base and a crashed batch leaves the previous version
    intact."""
    path = f"{base_root}/v000000"
    df.write.mode("overwrite").parquet(path)
    _write_latest_marker(df.sparkSession, base_root, 0)
    return path


def read_versioned_base(
    spark: SparkSession, base_root: str, version: int | None = None
) -> tuple[DataFrame, int]:
    """Read a versioned base: (DataFrame, version number). By default
    the current version (the _LATEST marker); pass `version` for TIME
    TRAVEL — any retained version directory reads back exactly as it
    was, because merges always write NEW v{n} directories and never
    touch old files (the property the crash-safety argument already
    relies on). Raises ValueError for a version that does not exist or
    was vacuumed."""
    latest = _read_latest_marker(spark, base_root)
    ver = latest if version is None else version
    path = f"{base_root}/v{ver:06d}"
    if version is not None:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            raise ValueError(
                f"version {ver} not found under {base_root} (latest: {latest})"
            )
    return spark.read.parquet(path), ver


def list_versions(spark: SparkSession, base_root: str) -> list[int]:
    """Version numbers retained under the base root, ascending."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(base_root)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def merge_stream(
    updates: DataFrame,
    base_root: str,
    keys: list[str],
    version_col: str,
    delete_col: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Continuous ingest-merge: each update micro-batch is merged into
    the versioned parquet base via merge_upsert_small_updates inside
    foreachBatch — the production loop that the merge + streaming
    pieces compose into (a crawl stream upserting a corpus). Returns
    the started StreamingQuery.

    Crash safety / exactly-once-ish: foreachBatch may REPLAY a batch
    after a restart (sink side is at-least-once). The merge makes the
    replay a semantic no-op: re-merging the same batch into a base that
    already absorbed it picks the same winners (updates win version
    ties), so base version N+k converges to the same table whether a
    batch ran once or twice — only the version counter differs. Each
    batch writes a NEW v{n} directory (never reads and overwrites the
    same files) and flips the _LATEST marker as the last step.

    At 100 TB use merge_apply_partitioned in the batch function instead
    (hive-partitioned base, only touched partitions rewritten) — this
    versioned whole-base rewrite is the small/medium-corpus shape and
    the test harness for the loop.
    """
    import tempfile as _tf

    from chapterhousedb_spark.operators.merge import merge_upsert_small_updates

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        base, ver = read_versioned_base(spark, base_root)
        merged = merge_upsert_small_updates(
            base, batch_df, keys, version_col, delete_col
        )
        merged.write.mode("overwrite").parquet(f"{base_root}/v{ver + 1:06d}")
        _write_latest_marker(spark, base_root, ver + 1)

    writer = updates.writeStream.foreachBatch(_apply).option(
        "checkpointLocation",
        checkpoint or _tf.mkdtemp(prefix="chdb_merge_ckpt_"),
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _write_latest_marker(spark: SparkSession, base_root: str, ver: int) -> None:
    _write_marker(spark, base_root, "_LATEST", ver)


def _read_latest_marker(spark: SparkSession, base_root: str) -> int:
    ver = _read_marker_or(spark, base_root, "_LATEST", -1)
    if ver < 0:
        raise FileNotFoundError(f"no _LATEST marker under {base_root}")
    return ver


def run_available_now(
    stream: DataFrame, out_path: str, checkpoint: str, output_mode: str = "append"
):
    """Drain everything currently available, then stop (the test/backfill
    trigger); returns the finished StreamingQuery."""
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def rollup_stream(
    events: DataFrame,
    base_root: str,
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
    scale: int = 4,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Continuous-aggregate maintenance: each micro-batch is collapsed
    to its own mergeable partials (operators/rollup.py) and merged into
    a versioned partials base — raw rows are aggregated once on arrival
    and never kept, so the base stays |group keys|-sized while the
    stream is unbounded. Composes with rollup_merge/rollup_final for
    coarser-grain reads off the base at any time.

    Replay safety differs fundamentally from merge_stream: an upsert
    replay is naturally idempotent (same winners win), but ADDITIVE
    partials would double-count a replayed batch. Two mechanisms:

    - The checkpoint is PINNED TO THE BASE (default
      {base_root}/_checkpoint), because foreachBatch batch ids are only
      monotonic within one checkpoint — a fresh checkpoint restarts
      them at 0, making "replayed batch" and "new data" structurally
      indistinguishable by id. The bound checkpoint path is recorded in
      the state marker, and a later run against the same base with a
      DIFFERENT checkpoint raises instead of silently dropping new
      batches (or double-counting replays).
    - Applied progress lives in ONE atomic _ROLLUP_STATE marker
      (version + last applied batch id + checkpoint path; written to a
      temp name, then FS-renamed). A batch id <= the recorded one is
      skipped as already-applied. Crash windows: dying after the
      v{n+1} write but before the state rename replays the batch
      against the state's OLD version, overwriting the orphan v{n+1} —
      no double count; dying after the rename yields a clean skip. The
      _LATEST reader pointer is refreshed after the state (and repaired
      on the next batch if a crash left it behind), so external readers
      always see a complete version, at most one behind.
    """
    from chapterhousedb_spark.operators.rollup import rollup_merge, rollup_partials

    sum_aliases = list(sum_cols)
    ckpt = checkpoint or f"{base_root}/_checkpoint"

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = _read_rollup_state(spark, base_root)
        if state is None and _read_marker_or(spark, base_root, "_LATEST", -1) >= 0:
            # versions exist but the state marker is gone (crashed
            # delete/rename window, or a hand-built base): reseeding
            # would silently discard every absorbed batch — refuse.
            raise ValueError(
                f"rollup base {base_root} has versions but no "
                "_ROLLUP_STATE marker; refusing to reseed. Restore the "
                "marker or rebuild the base."
            )
        if state is not None and state["ckpt"] != ckpt:
            raise ValueError(
                f"rollup base {base_root} is bound to checkpoint "
                f"{state['ckpt']!r} but this stream uses {ckpt!r}: batch "
                "ids are only monotonic per checkpoint, so continuing "
                "would silently drop or double-count batches. Reuse the "
                "original checkpoint, or rebuild the base."
            )
        ver = -1 if state is None else state["ver"]
        last = -1 if state is None else state["batch"]
        if batch_id <= last:
            # replayed batch: already absorbed; repair the reader
            # pointer if a crash interleaved between state and _LATEST
            if ver >= 0 and _read_marker_or(spark, base_root, "_LATEST", -1) != ver:
                _write_latest_marker(spark, base_root, ver)
            return
        part = rollup_partials(
            batch_df, keys, sum_cols, count_col=count_col, scale=scale
        )
        if not part.take(1):
            _write_rollup_state(spark, base_root, ver, batch_id, ckpt)
            return
        if ver < 0:  # no base yet: this batch's partials seed it
            merged = part
        else:  # a read failure here must FAIL the batch, never reseed
            base = spark.read.parquet(f"{base_root}/v{ver:06d}")
            merged = rollup_merge(
                base.unionByName(part), keys, sum_aliases, count_col=count_col
            )
        merged.write.mode("overwrite").parquet(f"{base_root}/v{ver + 1:06d}")
        _write_rollup_state(spark, base_root, ver + 1, batch_id, ckpt)
        _write_latest_marker(spark, base_root, ver + 1)

    writer = events.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", ckpt
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _write_rollup_state(
    spark: SparkSession, base_root: str, ver: int, batch: int, ckpt: str
) -> None:
    """Atomically persist (version, last batch id, bound checkpoint):
    write to a temp name, then rename — rename is atomic on local FS
    and HDFS, so a reader/replayer sees either the old or the new
    state, never a torn one."""
    import json as _json

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    tmp = jvm.org.apache.hadoop.fs.Path(f"{base_root}/._ROLLUP_STATE.tmp")
    dst = jvm.org.apache.hadoop.fs.Path(f"{base_root}/_ROLLUP_STATE")
    fs = dst.getFileSystem(conf)
    out = fs.create(tmp, True)
    try:
        out.write(
            bytearray(
                _json.dumps({"ver": ver, "batch": batch, "ckpt": ckpt}).encode()
            )
        )
    finally:
        out.close()
    fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        raise IOError(f"failed to commit rollup state at {dst}")


def _read_rollup_state(spark: SparkSession, base_root: str) -> dict | None:
    import json as _json

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{base_root}/_ROLLUP_STATE")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        data = bytes(
            jvm.org.apache.hadoop.io.IOUtils.readFullyToByteArray(stream)
        )
    finally:
        stream.close()
    return _json.loads(data.decode())


def _write_marker(
    spark: SparkSession, base_root: str, name: str, value: int
) -> None:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{base_root}/{name}")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(str(value).encode("ascii")))
    finally:
        out.close()


def _read_marker_or(
    spark: SparkSession, base_root: str, name: str, default: int
) -> int:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{base_root}/{name}")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return default
    stream = fs.open(jpath)
    try:
        data = bytes(
            jvm.org.apache.hadoop.io.IOUtils.readFullyToByteArray(stream)
        )
    finally:
        stream.close()
    return int(data.decode("ascii"))


def vacuum_versions(
    spark: SparkSession, base_root: str, keep_last: int = 2,
    marker_root: str | None = None,
) -> list[int]:
    """Retention sweep for a versioned base: delete all but the newest
    `keep_last` version directories (the _LATEST version is always
    kept, so keep_last >= 1). Returns the removed version numbers.
    Time travel (read_versioned_base(version=N)) only reaches retained
    versions — vacuumed ones raise. Never touches the markers, so a
    concurrent reader of the current version is unaffected.

    `marker_root` covers roots that version in LOCKSTEP with another
    base but carry no marker of their own — the fingerprint sidecar
    (round 14): `vacuum_versions(spark, fp_root,
    marker_root=corpus_root)` keeps the sidecar versions the corpus
    marker still governs and sweeps the rest with the same
    current-version guarantee."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the current version)")
    latest = _read_latest_marker(spark, marker_root or base_root)
    versions = list_versions(spark, base_root)
    keep = set(sorted(versions)[-keep_last:]) | {latest}
    jvm = spark._jvm
    removed = []
    for v in versions:
        if v in keep:
            continue
        jpath = jvm.org.apache.hadoop.fs.Path(f"{base_root}/v{v:06d}")
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
        removed.append(v)
    return removed


_QUOTA_OUT_FIELDS = ["event_id", "ts", "user_id", "event_type", "value"]
_QUOTA_STATE_SCHEMA = "n_admitted bigint"


def quota_stream(
    events: DataFrame,
    key_col: str = "event_type",
    quota: int = 100,
    weight_col: str | None = None,
) -> DataFrame:
    """Stateful per-key admission quota: admit rows per key until the
    LIFETIME budget is exhausted, drop the rest — the crawl-ingest
    politeness / per-source cap as a streaming operator (the batch
    twins are sampling.grouped_sample for row caps and
    sampling.token_budget_mix for token budgets; this is what you run
    when the corpus arrives as a stream and the cap must hold across
    micro-batches). With weight_col=None the budget counts ROWS; with
    a weight column (e.g. a precomputed token count in `value`) it
    counts WEIGHT, and matches token_budget_mix's contract: a row is
    admitted iff the weight already consumed is < quota (so the
    budget-crossing row is admitted). State per key is ONE counter
    (bigint), sharded by key across executors; admission order inside
    a micro-batch is pinned to event-time then event_id so replays of
    the same batch admit the same rows (cross-batch arrival order is
    the stream's own ordering, as with any first-N cap).

    At 100 TB-scale streams: state size is |keys| x 8 bytes — nothing;
    the groupBy shuffles each micro-batch once on the key. No timeout:
    a lifetime cap never expires (wrap with a windowed key like
    (source, date) for per-day quotas)."""

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
        if weight_col is None:
            room = max(0, quota - n)
            take = batch.iloc[:room]
            consumed = len(take)
        else:
            w = batch[weight_col].fillna(0).astype("int64")
            prior = n + w.cumsum().shift(fill_value=0)
            take = batch[prior < quota]
            consumed = int(w[prior < quota].sum())
        state.update((n + consumed,))
        if len(take):
            yield take[_QUOTA_OUT_FIELDS]

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    return (
        events.select(*_QUOTA_OUT_FIELDS)
        .groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=_QUOTA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
