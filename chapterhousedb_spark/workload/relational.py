"""Reference-parity + beyond-reference relational queries.

The first group reproduces the reference's implemented surface —
scan / filter / arithmetic projection / ORDER BY
(reference sample_queries/*.sql; SURVEY.md §2.2) — including going
through the engine's `read_files()` front door. The rest is the
beyond-reference standard-SQL surface the reference only roadmaps
(README.md:47-77 unchecked boxes): aggregations, joins of every
flavor, windows, limits, set ops, CTEs/subqueries, scalar functions.

Every query aliases computed columns identically in the Spark code and
the DuckDB oracle; floating aggregates use the exact-decimal helpers
(chapterhousedb_spark.functions.exact) so values hash-match across
engines.

Scale notes are inline: each query states the plan shape we expect at
100 TB (broadcast vs shuffle, pushdown, partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chapterhousedb_spark.functions.exact import davg, davg_sql, dsum, dsum_sql
from chapterhousedb_spark.workload.registry import load, query

# --------------------------------------------------------------------------
# Reference-surface parity (scan / filter / project / order by)
# --------------------------------------------------------------------------


@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey,
           l_quantity + 10.0                 AS q_plus_10,
           (l_extendedprice + 10) / 100      AS price_scaled,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    WHERE l_orderkey % 2 = 0 AND l_quantity < 30
    """,
)
def scan_filter_project(spark, sf_dir):
    """Reference sample_queries/simple.sql query-4 shape: arithmetic
    projections over a filtered scan (filter_task.rs + record_projection.rs).
    At scale: filter and column pruning push into the parquet scan
    (both absent in the reference, SURVEY.md §4.1)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_orderkey") % 2 == 0) & (F.col("l_quantity") < 30)).select(
        "l_orderkey",
        (F.col("l_quantity") + 10.0).alias("q_plus_10"),
        ((F.col("l_extendedprice") + 10) / 100).alias("price_scaled"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )


@query(
    "read_files_front_door",
    oracle="""
    SELECT p_partkey, upper(p_brand) AS brand_uc, p_retailprice
    FROM part WHERE p_size > 20
    """,
)
def read_files_front_door(spark, sf_dir):
    """The reference's one table function, exercised through our SQL
    front door end-to-end (read_files_task.rs:65-114 -> temp-view rewrite)."""
    eng = _front_door_engine(spark)
    return eng.dataframe(
        f"""
        select p_partkey, upper(p_brand) as brand_uc, p_retailprice
        from read_files('{sf_dir}/part.parquet') where p_size > 20
        """
    )


@query(
    "read_files_csv",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS custkey,
           c_name,
           CAST(c_nationkey AS BIGINT) AS nationkey,
           c_name || ', segment ' || c_mktsegment AS label
    FROM customer WHERE c_nationkey < 10
    """,
)
def read_files_csv(spark, sf_dir):
    """CSV through the read_files front door (VERDICT r13 #5 — the
    reference's own unchecked roadmap format, README.md:63-66): the
    customer table round-trips through a real header'd CSV file — with
    a synthesized comma-bearing column, so the writer's quoting and
    the reader's unquoting are both load-bearing — and comes back
    through `read_files('*.csv')` with schema inference; the oracle
    derives the same rows straight from the parquet table, so any
    serialization, quoting, header or inference drift breaks the
    hash."""
    import os

    from chapterhousedb_spark.workload.registry import scratch_dir

    out = os.path.join(scratch_dir(prefix="chdb_read_csv_"), "customer_csv")
    load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.concat(
            F.col("c_name"), F.lit(", segment "), F.col("c_mktsegment")
        ).alias("label"),
    ).coalesce(1).write.option("header", "true").csv(out)
    eng = _front_door_engine(spark)
    return eng.dataframe(
        f"""
        select cast(c_custkey as bigint) as custkey,
               c_name,
               cast(c_nationkey as bigint) as nationkey,
               label
        from read_files('{out}/*.csv') where c_nationkey < 10
        """
    )


@query(
    "read_files_jsonl",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(length(text) AS INT) AS n_chars,
           lang
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def read_files_jsonl(spark, sf_dir):
    """JSONL through the read_files front door (VERDICT r13 #5, the
    other reference roadmap format): documents round-trip through real
    newline-delimited JSON (texts contain newlines and quotes, so the
    JSON escaping path is load-bearing) and come back through
    `read_files('*.json')` with schema inference; the oracle reads the
    same rows from parquet."""
    import os

    from chapterhousedb_spark.workload.registry import scratch_dir

    out = os.path.join(scratch_dir(prefix="chdb_read_jsonl_"), "docs_json")
    load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    ).coalesce(1).write.json(out)
    eng = _front_door_engine(spark)
    return eng.dataframe(
        f"""
        select cast(doc_id as bigint) as doc_id,
               cast(length(text) as int) as n_chars,
               lang
        from read_files('{out}/*.json') where doc_id % 7 = 0
        """
    )


def _front_door_engine(spark):
    """Lightweight engine for front-door rows: reuse the session, no
    results dir (the read_files_front_door construction)."""
    from chapterhousedb_spark.config import ConnectionRegistry
    from chapterhousedb_spark.engine import Engine
    from chapterhousedb_spark.sqlfront import default_table_function_registry

    eng = Engine.__new__(Engine)
    eng.spark = spark
    eng.connections = ConnectionRegistry()
    eng.table_functions = default_table_function_registry()
    return eng


@query(
    "named_table_scan",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey < 3
    """,
)
def named_table_scan(spark, sf_dir):
    """Named-table scan: the reference plans a Table node but cannot
    execute it (operators/builder.rs:67-72 NotImplemented;
    operator_task_registry.rs:136-139). Here a registered temp view +
    spark.table() makes it a first-class scan."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("chdb_nation_scan")
    return (
        spark.table("chdb_nation_scan")
        .filter(F.col("n_regionkey") < 3)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@query(
    "order_by_multi",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC NULLS FIRST, o_orderkey ASC NULLS FIRST
    LIMIT 100
    """,
)
def order_by_multi(spark, sf_dir):
    """ORDER BY with the reference's nulls-first-by-default semantics
    (compute_order_by_record.rs:33 — Spark's desc is nulls-last, so we
    emit desc_nulls_first explicitly; SURVEY.md §7.3.5). LIMIT makes the
    result a deterministic set. At scale: orderBy is a range shuffle
    (repartitionByRange + per-partition sort, the reference's
    partition_task.rs + unfinished sort_task.rs); LIMIT 100 collapses to
    a TakeOrdered plan with no full sort."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(
            F.col("o_totalprice").desc_nulls_first(),
            F.col("o_orderkey").asc_nulls_first(),
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------


@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')}                              AS sum_qty,
           {dsum_sql('l_extendedprice')}                         AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 6)}   AS sum_disc_price,
           {davg_sql('l_quantity')}                              AS avg_qty,
           {davg_sql('l_discount')}                              AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1995-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary. At scale: partial (map-side)
    aggregation before one shuffle on the low-cardinality grouping key;
    the shipdate filter pushes to parquet row groups."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "sum_disc_price"
            ),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query("agg_pricing_summary_double")
def agg_pricing_summary_double(spark, sf_dir):
    """Plain-double twin of agg_pricing_summary, benchmarked to price
    the decimal-exact overhead (functions/exact.py cost note). Rows-only
    by design: double SUM is shuffle-order-dependent in the last ulp, so
    a bit-exact cross-engine hash is not meaningful for this variant."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(*) AS BIGINT)                  AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark, sf_dir):
    """Multi-distinct aggregation. At scale Spark expands to a
    partial-distinct two-phase plan automatically."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum_sql('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
)
def agg_having(spark, sf_dir):
    """GROUP BY + HAVING (reference: absent, README.md:59)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 3)
    )


@query(
    "agg_rollup_cube",
    oracle=f"""
    SELECT 'rollup' AS which, l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS which, l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_cube(spark, sf_dir):
    """ROLLUP (subtotals + grand total) and CUBE (all grouping-set
    combinations), tagged and unioned into one declared query. At scale
    each branch is one Expand node feeding one partial-agg + shuffle —
    rows multiply by the number of grouping sets, not by data passes."""
    li = load(spark, sf_dir, "lineitem")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    ]
    ru = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(*aggs)
        .select(F.lit("rollup").alias("which"), "*")
    )
    cu = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(*aggs)
        .select(F.lit("cube").alias("which"), "*")
    )
    return ru.unionAll(cu)


# --------------------------------------------------------------------------
# Joins (reference: absent entirely — logical_planner.rs:332-348 rejects
# multi-table FROM; README.md:60 unchecked)
# --------------------------------------------------------------------------


@query(
    "join_broadcast_dims",
    oracle=f"""
    SELECT r.r_name,
           CAST(COUNT(*) AS BIGINT)   AS n_customers,
           {dsum_sql('c.c_acctbal', 2)} AS sum_acctbal
    FROM customer c
    JOIN nation n  ON c.c_nationkey = n.n_nationkey
    JOIN region r  ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast_dims(spark, sf_dir):
    """Star join through two dimension tables. At scale: nation/region
    are tiny -> explicit broadcast, so the fact side never shuffles for
    the join; only the final low-cardinality agg shuffles."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


@query(
    "join_fact_fact",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
)
def join_fact_fact(spark, sf_dir):
    """Fact-to-fact equi-join. At scale: shuffle (sort-merge) join on
    orderkey; AQE may convert to broadcast after the selective
    orderstatus filter. Filter pushes below the join."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            ),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark, sf_dir):
    """Left-semi join (EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
)
def join_anti(spark, sf_dir):
    """Left-anti join (NOT EXISTS): customers with no big-ticket order.

    The predicate bites at every test SF (3 / 30 / 308 surviving
    customers at sf0.001/0.01/0.1): the original no-orders-at-all form
    returned an EMPTY set at sf0.01, so its oracle gate passed on
    0 == 0 and could not catch a wrong-answer regression (VERDICT r6
    "what's wrong" #2). The filter is pushed below the anti join, so
    the orders side shrinks before the shuffle — the shape a real
    "customers never worth a premium campaign" query would take."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_outer",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT)          AS n_customers,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_outer(spark, sf_dir):
    """Left outer join preserving order-less customers."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
        )
    )


@query(
    "join_range_bands",
    oracle="""
    SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part p
    JOIN (VALUES ('budget', 0.0, 907.0),
                 ('mid', 907.0, 914.0),
                 ('premium', 914.0, 1e9)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
)
def join_range_bands(spark, sf_dir):
    """Range (non-equi) join against a banding table. At scale the band
    side is tiny: broadcast nested-loop, no fact shuffle. (Band edges
    sit inside the testdata price range 900-920 so the join
    discriminates.)"""
    p = load(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 907.0), ("mid", 907.0, 914.0), ("premium", 914.0, 1e9)],
        ["band", "lo", "hi"],
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@query(
    "join_skew_salted",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('l.l_extendedprice')} AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_skew_salted(spark, sf_dir):
    """Salted skew join (operators/skew.py): the fact side spreads each
    hot key over `salt` reduce tasks, the dim side replicates per salt.
    Results must equal the UNSALTED join exactly — the oracle is the
    plain SQL join, pinning the semantic-no-op property on real data
    (unit tests in tests/test_skew.py pin the plan shape + cost
    model)."""
    from chapterhousedb_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, on="l_orderkey", salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
    WHERE rnk <= 2
    """,
)
def window_topk_per_group(spark, sf_dir):
    """Top-k per group via row_number (deterministic tiebreak on key).
    At scale: single hash shuffle on the partition key; no global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 2)
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    """Running total per customer (decimal-exact so engines agree)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           value - LAG(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def window_lag_delta(spark, sf_dir):
    """LAG over an event stream (per-row double subtraction is exact)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


# --------------------------------------------------------------------------
# Set operations / distinct / subqueries
# --------------------------------------------------------------------------


@query(
    "set_ops",
    oracle="""
    SELECT 'both' AS which, CAST(n_nationkey AS INT) AS nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier) t1
    UNION ALL
    SELECT 'cust_only' AS which, CAST(n_nationkey AS INT) AS nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier) t2
    """,
)
def set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION ALL (reference parser rejects set
    expressions, logical_planner.rs:233-236)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_nationkey")
    both = (
        c.intersect(s.withColumnRenamed("s_nationkey", "n_nationkey"))
        .select(F.lit("both").alias("which"), F.col("n_nationkey").cast("int").alias("nationkey"))
    )
    cust_only = (
        c.subtract(s.withColumnRenamed("s_nationkey", "n_nationkey"))
        .select(F.lit("cust_only").alias("which"), F.col("n_nationkey").cast("int").alias("nationkey"))
    )
    return both.unionAll(cust_only)


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark, sf_dir):
    """SELECT DISTINCT (hash aggregate at scale, partial combine first)."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "cte_subquery",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, {dsum_sql('o_totalprice', 2)} AS total_spend
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_big_spenders
    FROM customer c
    JOIN spend s ON s.o_custkey = c.c_custkey
    WHERE s.total_spend > 1000000.0
      AND c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    GROUP BY c.c_mktsegment
    """,
)
def cte_subquery(spark, sf_dir):
    """CTE + IN-subquery (reference: WITH unsupported, README.md:61)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # rename the key in each derived frame: both descend from `o`, and a
    # shared o_custkey attribute would be an ambiguous self-join
    spend = (
        o.groupBy("o_custkey")
        .agg(dsum("o_totalprice", 2).alias("total_spend"))
        .withColumnRenamed("o_custkey", "spend_custkey")
    )
    big_orders = (
        o.filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("big_custkey"))
        .distinct()
    )
    return (
        c.join(spend, spend.spend_custkey == c.c_custkey)
        .filter(F.col("total_spend") > 1000000.0)
        .join(big_orders, c.c_custkey == big_orders.big_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_big_spenders"))
    )


# --------------------------------------------------------------------------
# Scalar expression surface
# --------------------------------------------------------------------------


@query(
    "scalar_funcs",
    oracle="""
    SELECT p_partkey,
           p_brand || '#' || p_type                          AS brand_type,
           upper(p_name)                                     AS name_uc,
           substr(p_name, 1, 5)                              AS name5,
           CAST(length(p_name) AS INT)                       AS name_len,
           CASE WHEN p_size BETWEEN 10 AND 20 THEN 'mid'
                WHEN p_size IN (1,2,3) THEN 'tiny'
                ELSE 'other' END                             AS size_class,
           -p_retailprice                                    AS neg_price,
           abs(p_retailprice - 1000)                         AS dist_1000,
           floor(p_retailprice)                              AS price_floor,
           ceil(p_retailprice)                               AS price_ceil,
           (p_type LIKE '%BRASS%')                           AS is_brass,
           (p_brand IS NULL)                                 AS brand_null,
           CAST(p_size AS VARCHAR)                           AS size_str
    FROM part
    """,
)
def scalar_funcs(spark, sf_dir):
    """The scalar surface the reference lacks (SURVEY.md §2.3: no minus,
    concat, LIKE, CASE, BETWEEN, IN, IS NULL, casts, named functions —
    compute_value.rs:210-216). All built-in, whole-stage-codegen'd."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("#", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.upper("p_name").alias("name_uc"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").alias("name_len"),
        F.when(F.col("p_size").between(10, 20), "mid")
        .when(F.col("p_size").isin(1, 2, 3), "tiny")
        .otherwise("other")
        .alias("size_class"),
        (-F.col("p_retailprice")).alias("neg_price"),
        F.abs(F.col("p_retailprice") - 1000).alias("dist_1000"),
        F.floor("p_retailprice").cast("double").alias("price_floor"),
        F.ceil("p_retailprice").cast("double").alias("price_ceil"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.col("p_brand").isNull().alias("brand_null"),
        F.col("p_size").cast("string").alias("size_str"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)       AS order_year,
           CAST(month(o_orderdate) AS INT)      AS order_month,
           CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
           CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_epoch
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    """,
)
def date_funcs(spark, sf_dir):
    """Date/time surface (reference: time types unsupported, README.md:49)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    ).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate")))
        .alias("month_epoch"),
    )


# --------------------------------------------------------------------------
# Advanced SQL surface (round 2): cube, subqueries, pivot, window frames,
# percentiles — all absent from the reference (README.md:47-77)
# --------------------------------------------------------------------------


@query(
    "exists_subquery",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def exists_subquery(spark, sf_dir):
    """Correlated EXISTS through the SQL path — Catalyst decorrelates
    it to a left-semi hash join (no per-row subquery execution)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("chdb_adv_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("chdb_adv_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM chdb_adv_customer c
        WHERE EXISTS (SELECT 1 FROM chdb_adv_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        """
    )


@query(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)
    """,
)
def scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery as a filter threshold (MAX is
    order-independent, so the threshold is bit-identical on both
    engines). Catalyst runs the subquery once and broadcasts the
    scalar into the main scan's filter."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("chdb_adv_orders2")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM chdb_adv_orders2
        WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM chdb_adv_orders2)
        """
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "pivot_mktsegment",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS BIGINT) AS automobile,
           CAST(COUNT(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 END) AS BIGINT) AS building,
           CAST(COUNT(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 END) AS BIGINT) AS furniture,
           CAST(COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 END) AS BIGINT) AS household,
           CAST(COUNT(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 END) AS BIGINT) AS machinery
    FROM customer
    GROUP BY c_nationkey
    """,
)
def pivot_mktsegment(spark, sf_dir):
    """PIVOT (wide conditional aggregation). The explicit values list
    keeps the output schema static — at scale never let pivot infer
    values (that is a whole extra distinct scan + driver collect)."""
    c = load(spark, sf_dir, "customer")
    piv = (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in _SEGMENTS],
    )


@query(
    "window_range_frame",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_shipdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4)))
                OVER (PARTITION BY l_returnflag ORDER BY l_shipdate
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS run_qty
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame (peer rows included — differs from ROWS on ties).
    Exact-decimal accumulation keeps the running sum order-independent
    within each peer group, so it hash-matches across engines."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_shipdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.sum(F.col("l_quantity").cast("decimal(28,4)")).over(w).cast("double")
        .alias("run_qty"),
    )


@query(
    "percentile_agg",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5)      AS median_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_agg(spark, sf_dir):
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont: same (1-f)*lo + f*hi interpolation on the sorted
    values). At 100 TB prefer approx_percentile (t-digest sketch,
    single pass, mergeable) — declared here as the exact baseline."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                            (l_returnflag, l_linestatus))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS with grouping() markers (distinguishes a
    subtotal NULL from a data NULL). Same Expand-node execution shape
    as cube/rollup: one pass, one shuffle."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("chdb_adv_lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS n_rows
        FROM chdb_adv_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    )


@query(
    "window_ntile",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS INT)
             AS quartile,
           nth_value(o_orderkey, 2) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS second_key
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def window_ntile(spark, sf_dir):
    """ntile bucketing + nth_value with an explicit ROWS frame. The
    (o_totalprice, o_orderkey) order is total, so bucket boundaries are
    engine-independent."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    w_order = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_frame = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w_order).alias("quartile"),
        F.nth_value("o_orderkey", 2).over(w_frame).alias("second_key"),
    )


@query(
    "window_dist_funcs",
    oracle="""
    SELECT o_orderkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cum_dist,
           first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS cheapest_key,
           last_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS priciest_key
    FROM orders WHERE o_orderkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_dist_funcs(spark, sf_dir):
    """Distribution window functions: percent_rank = (rank-1)/(n-1) and
    cume_dist = peers/n are single IEEE divisions of exact integers, so
    they hash-match across engines; first/last_value use explicit
    frames over a TOTAL order ((o_totalprice, o_orderkey) is unique) so
    both endpoints are deterministic. At scale: one hash shuffle on the
    partition key, all four functions evaluated in the same Window
    operator pass."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.first("o_orderkey").over(w_run).alias("cheapest_key"),
        F.last("o_orderkey").over(w_all).alias("priciest_key"),
    )


@query(
    "agg_stats_funcs",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(38,12)))
                  AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(38,8)))
                  AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (sxy - sx * sy / n)
             / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_qty_disc
    FROM s ORDER BY l_returnflag
    """,
)
def agg_stats_funcs(spark, sf_dir):
    """Statistical aggregates (variance, stddev, correlation) made
    CROSS-ENGINE BIT-EXACT: the native var_samp/corr accumulate doubles
    in partition order (engine-dependent), so instead the moments are
    exact-decimal sums (products of doubles are exact IEEE before the
    decimal cast, and decimal addition is associative) and the
    variance/correlation algebra is a fixed sequence of IEEE
    double ops replayed identically by the oracle — same discipline as
    functions/exact.py, extended to second moments. At 100 TB this is
    ONE map-side-combined aggregation pass producing 6 moments per
    group; the closed-form algebra runs on the handful of group rows."""
    li = load(spark, sf_dir, "lineitem")
    q, d = F.col("l_quantity"), F.col("l_discount")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("decimal(38,2)")).cast("double").alias("sx"),
        F.sum((q * q).cast("decimal(38,4)")).cast("double").alias("sxx"),
        F.sum(d.cast("decimal(38,6)")).cast("double").alias("sy"),
        F.sum((d * d).cast("decimal(38,12)")).cast("double").alias("syy"),
        F.sum((q * d).cast("decimal(38,8)")).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "syy", "sxy"])
    var_q = (sxx - sx * sx / n) / (n - 1)
    return s.select(
        "l_returnflag",
        "n",
        var_q.alias("var_qty"),
        F.sqrt(var_q).alias("stddev_qty"),
        (
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        ).alias("corr_qty_disc"),
    ).orderBy("l_returnflag")


@query(
    "histogram_totalprice",
    oracle="""
    SELECT bin,
           0.0 + bin * 25000.0       AS bin_lo,
           0.0 + (bin + 1) * 25000.0 AS bin_hi,
           CAST(COUNT(*) AS BIGINT)  AS n
    FROM (SELECT least(19, greatest(0,
                 CAST(floor((CAST(o_totalprice AS DOUBLE) - 0.0) / 25000.0)
                      AS INT))) AS bin
          FROM orders WHERE o_totalprice IS NOT NULL) t
    GROUP BY bin ORDER BY bin
    """,
)
def histogram_totalprice(spark, sf_dir):
    """Equi-width histogram of order totals (operators/profile.py
    histogram): 20 bins over [0, 500000), clamped at both ends. The
    binning is a fixed IEEE double op sequence so the oracle replays it
    bit-exactly — unlike engine-specific sketch histograms. One
    map-side binning pass + a 20-row aggregation."""
    from chapterhousedb_spark.operators.profile import histogram

    return histogram(
        load(spark, sf_dir, "orders"), "o_totalprice", lo=0.0, hi=500000.0, nbins=20
    )


@query(
    "lateral_explode",
    oracle="""
    SELECT p_partkey, u.pos, u.token
    FROM (SELECT p_partkey,
                 unnest(list_transform(
                   generate_series(1, len(string_split(p_name, ' '))),
                   i -> struct_pack(pos := CAST(i - 1 AS INT),
                                    token := string_split(p_name, ' ')[i]))) AS u
          FROM part WHERE p_partkey % 40 = 0)
    """,
)
def lateral_explode(spark, sf_dir):
    """Row-generating lateral expansion (posexplode): one row per token
    with its position. The Generate node is codegen'd and never
    materializes per-row arrays driver-side."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 40 == 0)
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "token")
    )


@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           split_part(p_type, ' ', 1) AS type_head,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           reverse(p_brand) AS brand_rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
           CAST(levenshtein(p_brand, 'Brand#11') AS INT) AS lev_brand
    FROM part
    """,
)
def string_funcs(spark, sf_dir):
    """String-function surface (split_part, regexp_extract, instr,
    reverse, lpad, translate, levenshtein) — all JVM built-ins the
    reference lacks entirely (README.md:53-58 unchecked)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).alias("lev_brand"),
    )


_PROFILE_NUM = """
    SELECT '{c}' AS column, CAST(COUNT({c}) AS BIGINT) AS n_non_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS DOUBLE) AS min_num,
           CAST(MAX({c}) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM lineitem"""
_PROFILE_STR = """
    SELECT '{c}' AS column, CAST(COUNT({c}) AS BIGINT) AS n_non_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           MIN({c}) AS min_str, MAX({c}) AS max_str
    FROM lineitem"""
_PROFILE_TS = """
    SELECT '{c}' AS column, CAST(COUNT({c}) AS BIGINT) AS n_non_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(CAST(epoch(MIN({c})) AS BIGINT) AS DOUBLE) AS min_num,
           CAST(CAST(epoch(MAX({c})) AS BIGINT) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM lineitem"""

_PROFILE_COLS = [
    ("l_orderkey", _PROFILE_NUM),
    ("l_linenumber", _PROFILE_NUM),
    ("l_quantity", _PROFILE_NUM),
    ("l_discount", _PROFILE_NUM),
    ("l_returnflag", _PROFILE_STR),
    ("l_shipdate", _PROFILE_TS),
]


@query(
    "table_profile",
    oracle=" UNION ALL ".join(t.format(c=c) for c, t in _PROFILE_COLS),
)
def table_profile(spark, sf_dir):
    """ANALYZE-style per-column statistics (count / distinct / min /
    max) in ONE scan — the profiling step a pipeline runs per ingested
    batch for drift detection. Exact distinct counts here (the oracle
    must hash-match); operators/profile.py exposes
    exact_distinct=False for the single-pass HLL sketch at 100 TB."""
    from chapterhousedb_spark.operators.profile import profile

    return profile(
        load(spark, sf_dir, "lineitem"),
        columns=[c for c, _ in _PROFILE_COLS],
        exact_distinct=True,
    )


@query(
    "key_skew_events",
    oracle="""
    WITH c AS (
      SELECT CAST(user_id AS VARCHAR) AS key,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c),
    -- NULLS FIRST pins Spark's ascending default: the operator counts
    -- NULL keys as a group, and DuckDB's default NULLS LAST would
    -- order a count-tied NULL group differently (round-11 review fix;
    -- events.user_id has no NULLs today, but the gate must not depend
    -- on that)
    top AS (SELECT key, n FROM c
            ORDER BY n DESC, key NULLS FIRST LIMIT 15)
    SELECT key, n,
           CAST(n AS DOUBLE) / total AS share,
           CAST(SUM(n) OVER (ORDER BY n DESC, key NULLS FIRST
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS DOUBLE) / total
             AS cum_share
    FROM top, t
    ORDER BY n DESC, key NULLS FIRST
    """,
)
def key_skew_events(spark, sf_dir):
    """Heavy-hitter diagnostic over the events stream's join key
    (VERDICT r10 #6 — key_skew gets an oracle row): the top-15 user_id
    groups with exact share and running cumulative share, the report
    you read before picking a salting factor for the user-keyed join.
    Single scan: the rollup grouping sets ((key), ()) deliver per-key
    counts AND the grand total from one aggregation (plan-asserted in
    tests/test_profile.py); shares are IEEE double divisions of exact
    bigint counts, so they hash-match DuckDB bit-for-bit."""
    from chapterhousedb_spark.operators.profile import key_skew

    return key_skew(load(spark, sf_dir, "events"), "user_id", k=15)


# --------------------------------------------------------------------------
# Composed multi-join analytics (TPC-H shapes over the testdata schema)
# --------------------------------------------------------------------------


@query(
    "tpch_q3_shipping",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): 3-way join, filtered on all
    three tables, grouped per order, top-10 by revenue. The classic
    composed workload a user of the reference would eventually need —
    the reference can express none of it (single-table FROM only,
    logical_planner.rs:332-348). At scale: both date filters and
    mktsegment push into the scans; customer (selective) broadcasts
    under AQE, orders><lineitem is the one real shuffle, and the
    ORDER BY+LIMIT collapses to TakeOrderedAndProject — no global sort.
    (revenue, l_orderkey) is a total order, so the LIMIT 10 frontier is
    deterministic for the hash gate."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_region_revenue",
    oracle=f"""
    SELECT n.n_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def tpch_q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): 6-way join across the
    whole star, including the correlation predicate c_nationkey =
    s_nationkey that makes it a fact-fact-dim lattice rather than a
    chain. At scale: nation/region are fixed-size and always broadcast;
    supplier grows with SF (~10k rows/SF) but remains orders of
    magnitude smaller than the facts — broadcast until it outgrows the
    threshold, at which point dropping the hint lets AQE pick a shuffle
    join on s_suppkey. orders><lineitem is the single big shuffle; the
    1-year date filter pushes into the orders scan and AQE prunes the
    join output before the tiny n_name agg."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "tpch_q17_small_qty",
    oracle=f"""
    SELECT {dsum_sql('l.l_extendedprice', 6)} / 7.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
)
def tpch_q17_small_qty(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity orders): a CORRELATED scalar
    aggregate subquery — each lineitem compares against the average
    quantity OF ITS OWN PART. scalar_subquery covers the uncorrelated
    pattern; this is the decorrelation pattern: Catalyst rewrites the
    per-key subquery into an aggregate over lineitem grouped by
    l_partkey joined back on the key (plan-asserted: no
    BroadcastNestedLoopJoin, one extra Aggregate). At scale that is
    exactly the hand-written shape — one shuffle to build per-part
    averages (map-side partial), one equi-join back; the brand filter
    pushes into the part scan and prunes the join's build side.

    Determinism of the threshold: l_quantity is integral (1..50), so
    the double SUM underlying AVG is exact in any accumulation order
    and `0.5 * avg` is bit-identical on both engines; l_extendedprice
    goes through the exact-decimal dsum. Testdata has no
    p_container column, so the brand predicate alone plays the role of
    Q17's brand+container selectivity."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("chdb_q17_li")
    load(spark, sf_dir, "part").createOrReplaceTempView("chdb_q17_part")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0
                 AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_small
        FROM chdb_q17_li l JOIN chdb_q17_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#4'
          AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                              FROM chdb_q17_li l2
                              WHERE l2.l_partkey = p.p_partkey)
        """
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking) with the join strategy
    PINNED to sort-merge: the EXISTS becomes a left-semi join and the
    `merge` hint forces SortMergeJoin even though AQE would happily
    broadcast at test scale — pinning the one major join strategy no
    other gated query exercises (plan-asserted: SortMergeJoin LeftSemi,
    no BroadcastHashJoin). At 100 TB orders><lineitem is far past any
    broadcast threshold, so SMJ-semi IS the production plan: both sides
    shuffle-sort on orderkey, the semi probe streams without
    materializing matches, and the returnflag + date filters push into
    the scans. (Testdata has no l_commitdate/l_receiptdate, so
    `l_returnflag = 'R'` plays Q4's late-delivery predicate.)"""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .hint("merge")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q13_cust_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_cust_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): a LEFT
    OUTER join with a predicate ON THE JOIN CONDITION (not the WHERE —
    moving it to WHERE would silently turn the join inner and drop
    zero-order customers), then a two-level aggregation: count orders
    per customer, then count customers per order-count. This
    "histogram of group sizes" re-aggregation shape appears nowhere
    else in the gated surface. At 100 TB: orders shuffles on custkey
    once (map-side partial count), the second aggregation groups on the
    tiny c_count domain (~1e2 values) so it collapses map-side; the
    non-equi priority predicate stays attached to the outer join, never
    a post-filter. (Testdata has no o_comment, so the priority
    anti-predicate plays Q13's `not like '%special%requests%'`.)"""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q18_large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, {dsum_sql('l.l_quantity', 2)} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 180)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume orders): an IN subquery whose
    inner relation is itself a GROUP BY ... HAVING aggregate — Catalyst
    plans it as an aggregate producing the qualifying keyset, then a
    left-semi join into the 3-way customer><orders><lineitem join, then
    a re-aggregation and top-k. At 100 TB the qualifying keyset is tiny
    (HAVING > 180 is the distribution tail) so AQE broadcasts the semi
    side after the aggregate; lineitem is scanned twice but the second
    scan arrives pre-filtered by the semi join, and the final LIMIT is
    TakeOrderedAndProject — no global sort. l_quantity is integral so
    the HAVING threshold is exact on both engines; the output sum goes
    through the exact-decimal helper."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("qty"))
        .filter(F.col("qty") > 180)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big, o.o_orderkey == big.big_orderkey, "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q21_lone_blame",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def tpch_q21_lone_blame(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    hardest decorrelation in the suite — an EXISTS and a NOT EXISTS
    against the SAME fact table, correlated on the join key with an
    extra non-equi predicate (`l2.l_suppkey <> l1.l_suppkey`). Catalyst
    plans both as left-semi / left-anti joins on l_orderkey with the
    suppkey inequality as a residual join condition — three passes over
    lineitem co-partitioned on orderkey, so at 100 TB all three resolve
    within one shuffle exchange reuse (plus the broadcast supplier
    dim). "A supplier's R-flagged line in a finished multi-supplier
    order where no OTHER supplier also flagged R" stands in for Q21's
    receipt-after-commit predicate (testdata has no
    l_commitdate/l_receiptdate)."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    base = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "tpch_q9_nation_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS o_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS sum_profit
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name, EXTRACT(year FROM l.l_shipdate)
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_nation_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation and year):
    fact><dim><dim chain grouped on a DERIVED time key (year extracted
    from the ship date) — the one TPC-H aggregation pattern over a
    computed date dimension not otherwise gated. At 100 TB: supplier
    and nation broadcast (two BroadcastHashJoins, no fact shuffle until
    the group-by), the profit expression is computed map-side, and the
    (nation, year) group domain is tiny so the single aggregation
    exchange moves ~|nations x years| rows per map partition. The
    discount multiply happens in DOUBLE on both engines (identical
    IEEE product) before the exact-decimal sum, so the aggregate is
    order-independent and hash-exact. (Testdata lacks part/partsupp
    cost columns, so profit reduces to the discounted revenue and the
    part-name filter is dropped.)"""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
      AND n2.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
      AND n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping between nation pairs): the SAME
    dimension table joined to BOTH ENDS of the fact chain under
    different roles — supplier's nation through lineitem.l_suppkey,
    customer's nation through orders->customer — with a cross-role
    inequality (shipper != consumer). No other gated query joins one
    dim twice in distinct roles. At 100 TB: supplier and both nation
    aliases broadcast (supplier with the same threshold caveat q5
    documents: drop the hint if it outgrows the broadcast budget), but
    CUSTOMER is deliberately NOT broadcast — it scales with SF
    (~1.5 B rows / ~24 GB at a 100 TB lineitem), so forcing it
    broadcast is a guaranteed executor OOM at scale; orders is already
    shuffling for the lineitem join, so the o><c join shuffles on
    custkey and AQE still promotes customer to broadcast at small SF
    where it fits. The two heavy shuffles are lineitem><orders on
    orderkey and orders><customer on custkey; the nation IN filters
    push into both broadcast sides and prune most of the fact early
    via the supplier-side broadcast join. Output aggregates through
    the exact-decimal sum."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    nations = ["NATION_0", "NATION_1", "NATION_2", "NATION_3"]
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey", "c_nationkey"), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
            ).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q11_important_parts",
    oracle="""
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(38,2))) >
           (SELECT 0.0006 * SUM(CAST(l_extendedprice AS DECIMAL(38,2)))
            FROM lineitem)
    ORDER BY part_value DESC, l_partkey
    """,
)
def tpch_q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): a grouped
    aggregate whose HAVING compares against an UNCORRELATED GLOBAL
    aggregate over the same fact — parts whose value exceeds a fixed
    fraction of total value. Catalyst evaluates the global sum as a
    one-row scalar-subquery plan and broadcasts it into the HAVING
    filter; the fact is scanned twice (group pass + global pass) with
    both aggregations map-side combined, and no per-group re-evaluation
    of the global side ever happens (the Q17/Q20 shapes cover the
    CORRELATED versions of this pattern). Exact decimals make the
    0.0006 threshold comparison engine-identical. (Testdata has no
    partsupp, so line value plays ps_supplycost * ps_availqty.)"""
    li = load(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(38,2)")
    total = li.agg((F.lit(0.0006) * F.sum(dec)).alias("t"))
    return (
        li.groupBy("l_partkey")
        .agg(F.sum(dec).alias("pv"))
        .join(F.broadcast(total))
        .filter(F.col("pv") > F.col("t"))
        .select(
            "l_partkey", F.col("pv").cast("double").alias("part_value")
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS total_rev
      FROM lineitem GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): the ARGMAX pattern — keep the
    group(s) whose aggregate equals the maximum over all groups,
    expressed as a scalar subquery over a shared aggregate (Q15's
    revenue view used twice). Spark evaluates the revenue aggregate
    once per reference; the MAX side collapses to one row and
    broadcasts into the filter, so the plan is two aggregations + a
    broadcast filter + a broadcast dim join, never a self-join on the
    aggregate. The equality predicate is on the exact DECIMAL (not the
    double cast), so ties and the max comparison are engine-identical.
    The double product inside the sum is a single IEEE multiply on
    identical inputs — bit-identical on both engines before the
    decimal accumulation."""
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("m"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("m"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q20_dominant_supplier",
    oracle="""
    SELECT s.s_suppkey, s.s_name FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT sl.l_suppkey FROM (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(38,2))) AS q
        FROM lineitem GROUP BY l_partkey, l_suppkey) sl
      WHERE sl.q > (SELECT 0.15 * SUM(CAST(l2.l_quantity AS DECIMAL(38,2)))
                    FROM lineitem l2
                    WHERE l2.l_partkey = sl.l_partkey))
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20_dominant_supplier(spark, sf_dir):
    """TPC-H Q20 shape (excess-inventory suppliers): an IN subquery
    whose inner WHERE contains a CORRELATED scalar aggregate against
    the same fact — the deepest nesting in the suite (Q17 decorrelates
    one level; this stacks the correlated-agg rewrite INSIDE a
    semi-join derivation). Catalyst plans it as two aggregations over
    lineitem co-partitioned on l_partkey (per-(part,supplier) quantity
    and per-part total — the first exchange is reused for both), an
    equi-join applying the threshold, then a left-semi into supplier.
    "Supplier ships >15% of a part's total volume" stands in for Q20's
    availqty > half-of-shipped (testdata has no partsupp table);
    l_quantity is integral and the sums go through exact decimals, so
    the 0.15 threshold comparison is bit-identical on both engines."""
    li = load(spark, sf_dir, "lineitem")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("q")
    )
    per_part = li.groupBy("l_partkey").agg(
        (F.lit(0.15) * F.sum(F.col("l_quantity").cast("decimal(38,2)"))).alias(
            "thresh"
        )
    )
    dominant = (
        per_ps.join(per_part, "l_partkey")
        .filter(F.col("q") > F.col("thresh"))
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q22_idle_balances",
    oracle="""
    SELECT c.c_nationkey % 10 AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,4)))
                                     AS DOUBLE) / COUNT(c2.c_acctbal)
                         FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey % 10
    ORDER BY cntrycode
    """,
)
def tpch_q22_idle_balances(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): an UNCORRELATED
    scalar aggregate subquery (the above-average balance threshold) AND
    a correlated NOT EXISTS (customers with no urgent order) in the
    same query, grouped on a derived code column. Catalyst evaluates
    the scalar subquery once as a broadcast single-row plan, the NOT
    EXISTS as a left-anti join on custkey. At 100 TB: the threshold is
    a one-row broadcast; the anti join shuffles only the
    priority-filtered orders projection; the final group-by has ~10
    keys so it collapses map-side. The average goes through the
    exact-decimal helper on both engines so the threshold double is
    bit-identical. (c_nationkey % 10 plays Q22's phone country-code
    substring; the no-URGENT-order predicate plays "no orders in 7
    years".)"""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    threshold = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal").alias("t"))
        .select("t")
    )
    return (
        c.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("t"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "set_ops_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_ops_all(spark, sf_dir):
    """Multiset set operations (INTERSECT ALL): duplicate-preserving
    semantics — each customer appears min(count_left, count_right)
    times, which plain INTERSECT (covered by set_ops) collapses. Spark
    plans this as a left-semi-style hash join over counted duplicates;
    at scale it is one shuffle on the compared column."""
    o = load(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    right = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return left.intersectAll(right)


@query(
    "null_semantics",
    oracle="""
    SELECT o_orderkey,
           (o_orderstatus IS DISTINCT FROM o_orderpriority) AS st_ne_pri,
           COALESCE(NULLIF(o_orderstatus, 'F'), 'final') AS status_or_final,
           (CASE WHEN o_totalprice > 300000 THEN NULL
                 ELSE o_totalprice END IS NULL) AS price_redacted
    FROM orders WHERE o_orderkey % 20 = 0
    ORDER BY o_orderkey
    """,
)
def null_semantics(spark, sf_dir):
    """Three-valued-logic surface: IS DISTINCT FROM (null-safe
    inequality, Spark's negated <=>), NULLIF/COALESCE chaining, and IS
    NULL over a CASE-produced NULL. Pure map-side projections; pinned
    because null semantics are where engines classically diverge."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return o.select(
        "o_orderkey",
        (~F.col("o_orderstatus").eqNullSafe(F.col("o_orderpriority"))).alias(
            "st_ne_pri"
        ),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("F")), F.lit("final")
        ).alias("status_or_final"),
        F.when(F.col("o_totalprice") > 300000, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .isNull()
        .alias("price_redacted"),
    ).orderBy("o_orderkey")


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderpriority)), ',') AS priorities
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """Array aggregation with DETERMINISTIC order: collect_list's
    arrival order is partition-dependent, so the contract is
    array_sort AFTER collection — the only way a collected array is
    reproducible at any parallelism (and thus hash-comparable across
    engines). Serialized to a joined string so the oracle compares a
    scalar. One shuffle on the group key; arrays stay bounded by group
    size."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("o_orderpriority")), ","
            ).alias("priorities")
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Round-7 TPC-H shapes: the remaining distinct plan patterns
# --------------------------------------------------------------------------


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount', 6)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape (forecasting revenue change): the canonical
    PUSHDOWN benchmark — a single-table conjunctive filter + scalar
    aggregate with no join and no group key. The entire query is one
    scan whose date/discount/quantity predicates all reach the parquet
    reader (row-group min/max skip most of the file) and one partial
    sum that collapses map-side to a single row per task. At 100 TB
    this query's cost is pure I/O after pruning — the operator
    pipeline adds nothing — which is exactly what it exists to prove
    (test_plans asserts all three PushedFilters)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"))


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           {dsum_sql("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END", 6)}
           / {dsum_sql('volume', 6)} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    ) nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): a CONDITIONAL-RATIO
    aggregate — one nation's share of regional volume per year, i.e.
    sum(CASE)/sum over the same grouped rows. No other gated query
    divides two aggregates of the same group. At 100 TB: part is
    filtered on p_type before its join (and, like customer, is NOT
    force-broadcast — it scales with SF; AQE promotes it only while it
    fits); supplier/nation/region broadcast; the heavy shuffles are
    lineitem><part on partkey and lineitem><orders on orderkey, each
    pruned by the pushed date/type filters first. Both ratio legs run
    through exact decimals and divide once in double, so the share is
    bit-identical cross-engine."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey", "c_nationkey"), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0), 6)
                / dsum(vol, 6)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue — a WIDE-GROUP top-k (group key carries name/nation
    payload columns, unlike q3/q18's narrow keys) feeding
    TakeOrderedAndProject. At 100 TB: the quarter-wide date filter
    pushes into orders, the returnflag filter into lineitem; the
    o><l shuffle on orderkey and o><c on custkey dominate; nation
    broadcasts. The payload columns ride through the aggregation
    rather than re-joining after the top-k — at group cardinality
    ~|customers| that's cheaper than a second customer lookup; the
    LIMIT never materializes the full ranking (tie-broken on custkey
    for determinism)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      AND l.l_returnflag = 'N'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def tpch_q12_priority_shipping(spark, sf_dir):
    """TPC-H Q12 shape (shipping priority split): a CONDITIONAL-COUNT
    PIVOT inside a fact-fact join — both output measures come from one
    pass over the joined rows via complementary CASE counts (testdata
    has no l_shipmode, so l_linestatus/l_returnflag play the
    mode-filter roles; the plan shape is identical). At 100 TB: the
    date+flag filters push into the lineitem scan before the orderkey
    shuffle; orders carries only (orderkey, priority); the 2-key
    group-by collapses map-side. The CASE counts are exact integers -
    no decimal machinery needed."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_returnflag") == "N")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.select("o_orderkey", "o_orderpriority")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q14_promo_effect",
    oracle=f"""
    SELECT 100.00 *
           {dsum_sql("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 6)}
           / {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): a GLOBAL (ungrouped)
    conditional ratio over a single fact><dim join — the month's promo
    share of revenue as one scalar row. Unlike q8 the CASE condition
    comes from the JOINED dim, not a second join branch, so the part
    join must deliver p_type to the aggregate. At 100 TB: the 1-month
    filter pushes into lineitem and prunes ~99% before the partkey
    shuffle; part (like customer) is NOT force-broadcast - it scales
    with SF; the scalar aggregate collapses map-side to one row per
    task. 100.00 * num / den evaluates left-to-right in both engines
    on bit-identical decimal-sum doubles."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.00)
                * dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0), 6)
                / dsum(vol, 6)
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (5, 10, 15, 20, 25, 30)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
    """,
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT)
    grouped on dim attributes with a NOT IN exclusion subquery — the
    only gated query exercising Spark's NULL-AWARE anti join (NOT IN
    must yield empty if the subquery produces any NULL; the DF-API
    encoding `cond | isnull(cond)` + left_anti is exactly what
    RewritePredicateSubquery emits, and the optimizer compiles it to a
    broadcast null-aware anti join, plan-asserted). At 100 TB: the
    blacklist (complaint suppliers) is tiny and broadcasts; the
    brand/size filters prune part before the partkey shuffle;
    count(distinct) expands to a two-phase aggregate on
    (brand, type, suppkey) then (brand, type) — both map-side
    combined. (s_acctbal < 0 plays Q16's complaint-comment filter;
    testdata has no partsupp, so lineitem provides the part-supplier
    relation.)"""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(5, 10, 15, 20, 25, 30))
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    eq = li.l_suppkey == bad.s_suppkey
    filtered = li.join(bad, eq | F.isnull(eq), "left_anti")
    return (
        filtered.join(
            p.select("p_partkey", "p_brand", "p_type"),
            filtered.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue): an OR-OF-ANDS predicate
    spanning BOTH join sides — the classic disjunctive-pushdown test.
    Catalyst must (a) keep the equi-join on partkey as a hash join
    with the disjunction as a post-join residual, never a nested loop,
    and (b) push the derivable per-side bounds into each scan: every
    branch constrains p_brand/p_size and l_quantity, so the scans get
    `p_brand IN (...)`-style disjunct unions while the full
    cross-side OR evaluates after the join (In/Or shows in
    PushedFilters, plan-asserted). At 100 TB this is the difference
    between scanning 3 brands' row groups and scanning the whole
    fact."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (q >= 1) & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & (q >= 10) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & (q >= 20) & (q <= 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           l.l_extendedprice AS supply_cost
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      AND l.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey,
             supply_cost
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier) — the last of the 22
    TPC-H query patterns (Q1 is agg_pricing_summary): a CORRELATED
    scalar MIN whose inner query repeats the outer's multi-dimension
    join chain (region-restricted supplier costs per part). The
    classic decorrelation aggregates a second copy of the relation
    and joins it back on (partkey, cost == min) — but with the dims
    broadcast there is no exchange for Catalyst to reuse, so that
    shape scans lineitem TWICE (round 7 shipped it that way; VERDICT
    r7 #5 asked for the reuse to be pinned). The shipped form is
    strictly better: compute the per-part min as a WINDOW MIN over
    the region-restricted costs and filter cost == min — ONE lineitem
    scan, ONE partkey shuffle (the window's), no join-back. At
    100 TB: nation/region always broadcast, supplier broadcasts with
    q5's documented threshold caveat; p_size pushes into the part
    scan. Ties (several suppliers at the min cost) are legitimate Q2
    output on both engines — the multiset matches.
    (lineitem.l_extendedprice plays partsupp.ps_supplycost; testdata
    has no partsupp.)"""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_costs = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "l_partkey", "l_extendedprice", "s_acctbal", "s_name", "n_name"
        )
    )
    min_w = Window.partitionBy("l_partkey")
    return (
        eu_costs.withColumn(
            "__min_cost", F.min("l_extendedprice").over(min_w)
        )
        .filter(F.col("l_extendedprice") == F.col("__min_cost"))
        .join(
            p.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("l_extendedprice").alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "supply_cost"
        )
    )
