"""Temporal / event-stream workload entries over the events table.

These are the batch twins of the streaming operators in
chapterhousedb_spark.streaming (the reference only sketches streaming in
DEV_NOTES.md "deploy/batch" ideas — zero implementation): time-bucketed
aggregation, sessionization, JSON extraction, and the as-of join.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chapterhousedb_spark.functions.exact import dsum, dsum_sql
from chapterhousedb_spark.operators.asof import asof_join
from chapterhousedb_spark.workload.registry import load, query


@query(
    "events_hourly",
    oracle=f"""
    SELECT event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('value', 6)} AS sum_value
    FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def events_hourly(spark, sf_dir):
    """Hourly tumbling-window aggregation (batch twin of the streaming
    windowed count; window start keyed as epoch seconds)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", 6).alias("sum_value"),
        )
    )


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 30 * 60 * 1000000 THEN 1
                  WHEN LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events)
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT)         AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): the batch twin of
    stateful streaming session windows. One shuffle on user_id."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
            > 30 * 60 * 1_000_000,
            1,
        )
        .when(F.lag(F.unix_micros("ts")).over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_json",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1
    """,
)
def events_json(spark, sf_dir):
    """JSON scalar extraction from the props column (reference has no
    JSON functions at all; FIXTURES.md harness note)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_mod")
    ).groupBy("k_mod").agg(F.count(F.lit(1)).alias("n"))


@query(
    "asof_join_events",
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
def asof_join_events(spark, sf_dir):
    """As-of join: each click matched to the user's most recent purchase
    at-or-before it (custom operator, operators/asof.py — DuckDB's
    native ASOF JOIN is the oracle). Right side deduped to one row per
    (user, ts) with the max event_id, so tie semantics are pinned."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("purchase_event_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    joined = asof_join(
        clicks,
        purchases,
        left_on="ts",
        right_on="ts",
        left_by="user_id",
        right_by="user_id",
        right_cols=["purchase_event_id", "purchase_value"],
    )
    return joined.select("event_id", "purchase_event_id", "purchase_value")


@query(
    "events_sliding",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) - 3600 * k.k AS BIGINT)
             AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
    GROUP BY 1, 2
    """,
)
def events_sliding(spark, sf_dir):
    """Sliding-window aggregation: 2-hour windows advancing every hour
    (F.window with a slide), so each event lands in exactly two
    overlapping windows. The oracle replays the expansion explicitly —
    every event joined to offsets {0,1} hours — which is precisely the
    Expand Spark's plan generates. At scale the expansion is map-side
    (rows duplicated into window buckets before the ONE shuffle of the
    grouped agg); state for the streaming twin is bounded by
    window+watermark, not the stream."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"), "event_type", "n"
        )
    )
