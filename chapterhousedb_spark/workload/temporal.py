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
    "asof_forward_events",
    oracle="""
    SELECT e.event_id,
           p.next_purchase_id,
           p.next_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') e
    ASOF LEFT JOIN (
        SELECT user_id, ts,
               event_id AS next_purchase_id,
               value    AS next_purchase_value
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                           ORDER BY event_id) AS rn
              FROM events WHERE event_type = 'purchase') d
        WHERE rn = 1
      ) p
      ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
)
def asof_forward_events(spark, sf_dir):
    """FORWARD as-of join (round 7): each click matched to the user's
    NEXT purchase at-or-after it — the conversion-attribution shape
    ("which purchase did this click lead to"). DuckDB's ASOF JOIN with
    the inequality flipped (e.ts <= p.ts) is the oracle; the operator
    runs direction="forward" in the same single key shuffle as
    backward. Right side deduped to one row per (user, ts) keeping the
    MIN event_id — forward tie order — so tie semantics are pinned on
    both engines."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("next_purchase_id"),
            F.col("value").alias("next_purchase_value"),
        )
    )
    joined = asof_join(
        clicks,
        purchases,
        left_on="ts",
        right_on="ts",
        left_by="user_id",
        right_by="user_id",
        right_cols=["next_purchase_id", "next_purchase_value"],
        direction="forward",
    )
    return joined.select("event_id", "next_purchase_id", "next_purchase_value")


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


@query(
    "events_rollup_daily",
    oracle=f"""
    SELECT event_type,
           CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_sql('value', 6)} AS sum_value
    FROM events GROUP BY event_type, date_trunc('day', ts)
    """,
)
def events_rollup_daily(spark, sf_dir):
    """Incremental rollup (the continuous-aggregate / hypertable
    pattern, operators/rollup.py): aggregate events ONCE into hourly
    partials, then answer the daily query by merging partials — the
    fact table is scanned exactly once and the daily aggregation
    touches only |hours x types| rows. The oracle is the DIRECT daily
    aggregation: the gate proves partial+merge is indistinguishable
    from a full rescan, including float exactness (partial sums stay
    DECIMAL through the merge; one terminal cast to double). At 100 TB
    the partials would be materialized per ingest batch and the daily/
    monthly rollups never re-read raw events."""
    from chapterhousedb_spark.operators.rollup import (
        rollup_final,
        rollup_merge,
        rollup_partials,
    )

    ev = load(spark, sf_dir, "events")
    hourly = rollup_partials(
        ev.withColumn("hour", F.date_trunc("hour", F.col("ts"))).withColumn(
            "day", F.date_trunc("day", F.col("ts"))
        ),
        keys=["event_type", "day", "hour"],
        sum_cols={"sum_value": "value"},
        scale=6,
    )
    daily = rollup_merge(
        hourly, keys=["event_type", "day"], sum_cols=["sum_value"]
    )
    return rollup_final(daily, sum_cols=["sum_value"]).select(
        "event_type",
        F.unix_timestamp("day").alias("day_epoch"),
        "n_rows",
        "sum_value",
    )


@query(
    "events_distinct_rollup",
    oracle="""
    SELECT event_type,
           CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type, date_trunc('day', ts)
    """,
)
def events_distinct_rollup(spark, sf_dir):
    """Two-phase distinct rollup: COUNT(DISTINCT user) per day from
    mergeable hourly distinct partials (operators/rollup.py
    distinct_partials/distinct_merge). Distinct counts are NOT
    additive, so the partial is the distinct MEMBER SET at the fine
    grain (one row per (type, day, hour, user)); the coarser rollup
    drops the hour key and re-distincts. At 100 TB the heavy dedup
    shuffle happens once against raw events; the daily merge reshuffles
    only fine-grain survivors (bounded by cardinality, not row count).
    The sketch variant of the same pattern (fixed-size HLL partials,
    union-merge) is operators/rollup.py sketch_* — unit-tested for
    merge-vs-direct equality and error bounds, not oracle-gated
    because estimates are engine-specific."""
    from chapterhousedb_spark.operators.rollup import (
        distinct_merge,
        distinct_partials,
    )

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "user_id",
    )
    hourly = distinct_partials(ev, keys=["event_type", "day", "hour"], member_col="user_id")
    daily = distinct_merge(hourly, keys=["event_type", "day"], out_col="n_users")
    return daily.select(
        "event_type", F.unix_timestamp("day").alias("day_epoch"), "n_users"
    )


@query(
    "quantile_rollup",
    oracle="""
    WITH b AS (
      SELECT event_type,
             least(255, greatest(0,
               CAST(floor((CAST(value AS DOUBLE) - 0.0) / (500.0 / 256)) AS INT)
             )) AS bin,
             CAST(COUNT(*) AS BIGINT) AS bin_n
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, bin),
    c AS (
      SELECT event_type, bin, bin_n,
             SUM(bin_n) OVER (PARTITION BY event_type ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(bin_n) OVER (PARTITION BY event_type) AS total
      FROM b)
    SELECT p50.event_type, p50.q AS p50_value, p95.q AS p95_value
    FROM (SELECT event_type, MIN(0.0 + (bin + 1) * (500.0 / 256)) AS q
          FROM c WHERE cum >= ceil(0.5 * total) GROUP BY event_type) p50
    JOIN (SELECT event_type, MIN(0.0 + (bin + 1) * (500.0 / 256)) AS q
          FROM c WHERE cum >= ceil(0.95 * total) GROUP BY event_type) p95
      ON p50.event_type = p95.event_type
    """,
)
def quantile_rollup(spark, sf_dir):
    """Mergeable approximate quantiles (operators/rollup.py
    histogram_partials / histogram_merge / quantile_from_histogram):
    p50 and p95 of event value per type, answered from HOURLY histogram
    partials merged to the type grain — the deterministic alternative
    to t-digest sketches, reproducible bit-for-bit on any engine (the
    oracle replays the identical cumulative-bin arithmetic). The
    fine-grain pass includes the hour key to prove the merge path: the
    per-type answer must be identical whether binned directly or rolled
    up from hourly partials (bin counts are additive). At 100 TB the
    hourly partials are |hours x types x 256| rows and the daily/
    all-time quantile queries never rescan events."""
    from chapterhousedb_spark.operators.rollup import (
        histogram_merge,
        histogram_partials,
        quantile_from_histogram,
    )

    ev = load(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    hourly = histogram_partials(
        ev, keys=["event_type", "hour"], value_col="value", lo=0.0, hi=500.0
    )
    merged = histogram_merge(hourly, keys=["event_type"])
    p50 = quantile_from_histogram(
        merged, ["event_type"], q=0.5, lo=0.0, hi=500.0, out_col="p50_value"
    )
    p95 = quantile_from_histogram(
        merged, ["event_type"], q=0.95, lo=0.0, hi=500.0, out_col="p95_value"
    )
    return p50.join(p95, "event_type").select(
        "event_type", "p50_value", "p95_value"
    )


@query(
    "events_trending",
    oracle="""
    SELECT event_type,
           SUM(1.0 / CAST((CAST(1 AS BIGINT) <<
                 LEAST(62, GREATEST(0, datediff('day', CAST(ts AS DATE),
                                                DATE '2024-01-31'))))
               AS DOUBLE)) AS decayed_count,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_trending(spark, sf_dir):
    """Time-decayed trending score per event type (round 7,
    rollup.decayed_counts): each event weighs 2^-age_days against the
    corpus-end reference date — EXACT power-of-two decay, so the
    double sum is order-independent and hash-matches the oracle
    bit-for-bit (exp()-based decay would differ in libm rounding
    across engines). One map-side weight expression + one map-side
    combined groupBy."""
    from chapterhousedb_spark.operators.rollup import decayed_counts

    ev = load(spark, sf_dir, "events")
    return (
        decayed_counts(ev, ["event_type"], "ts", "2024-01-31")
        .orderBy("event_type")
    )
