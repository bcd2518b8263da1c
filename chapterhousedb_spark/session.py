"""SparkSession factory tuned for the engine's execution profile.

The reference hand-rolls its runtime (tokio actors, exchanges with
heartbeat/requeue, capacity-claim scheduling — reference
src/worker/query_worker.rs:44-136, exchange_operator.rs). All of that is
subsumed by Spark's scheduler/shuffle/fault-tolerance; the only things we
configure here are the knobs that matter at scale:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  replaces the reference's single hand-written optimizer pass
  (physical_planner.rs:359-429 sampling-config injection).
- shuffle.partitions sized to the local core count for tests; on a real
  cluster this is left to AQE's coalescing from a high initial value.
- runtime bloom-filter join pruning stays at Spark defaults (enabled;
  10 GB application-side threshold): at 100 TB a selective dim filter
  propagates into the fact scan as a bloom filter before the shuffle.
  It never fires at test SF sizes — tests/test_plans.py pins the
  behavior by simulating the at-scale thresholds.
- Arrow transfer on, since every custom (pandas-UDF) operator crosses the
  JVM<->Python boundary in Arrow batches, mirroring the reference's
  Arrow-IPC wire format (message_handler/messages/exchange.rs:98).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Core count the driver told us to use (local[N])."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def write_fair_scheduler_xml(
    pools: dict[str, dict], path: str | None = None
) -> str:
    """Write a fair-scheduler allocation file for named pools; returns
    its path. `pools` maps pool name -> {weight, minShare,
    schedulingMode} (all optional). This is the admission-control
    config of the reference's capacity-claim scheduler
    (query_handler_state.rs:421-466) expressed as Spark FAIR pools:
    weight = relative share under contention, minShare = guaranteed
    cores before others get extra."""
    import tempfile
    from xml.sax.saxutils import escape

    parts = ["<?xml version=\"1.0\"?>", "<allocations>"]
    for name, conf in pools.items():
        parts.append(f"  <pool name=\"{escape(name)}\">")
        for key in ("schedulingMode", "weight", "minShare"):
            if key in conf:
                parts.append(f"    <{key}>{escape(str(conf[key]))}</{key}>")
        parts.append("  </pool>")
    parts.append("</allocations>")
    if path is None:
        fd, path = tempfile.mkstemp(prefix="chdb_fair_", suffix=".xml")
        os.close(fd)
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path


def build_session(
    app_name: str = "chapterhousedb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    fair_pools: dict[str, dict] | None = None,
    rocksdb_state_store: bool = False,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a real cluster, drop ``master`` and submit normally; nothing here
    is local-mode-specific except the default master.

    fair_pools enables FAIR scheduling with the given named pools (see
    write_fair_scheduler_xml); Engine.submit(..., pool=...) then routes
    each query's jobs to its pool.

    rocksdb_state_store switches streaming state to the RocksDB
    provider: state lives off-heap/on-disk per executor instead of in
    JVM memory maps, which is the production choice once stateful
    streaming state (sessionization, as-of history, dedup horizon)
    outgrows executor heap — at 100 TB-scale key cardinality the
    default HDFS-backed in-memory provider OOMs long before RocksDB.
    """
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # compat: some testdata vintages ship events.ts as parquet
        # TIMESTAMP(NANOS), which Spark's reader rejects; read as long
        # and convert at load (registry.load normalizes either vintage)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if fair_pools:
        builder = builder.config("spark.scheduler.mode", "FAIR").config(
            "spark.scheduler.allocation.file", write_fair_scheduler_xml(fair_pools)
        )
    if rocksdb_state_store:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
