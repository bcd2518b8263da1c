"""Table profiling: per-column statistics in one pass.

The ANALYZE-style step a data pipeline runs on every ingested batch —
row counts, null counts, distinct counts, min/max per column — used for
schema-drift detection, partition skew checks, and freshness monitors.

Shape (exact mode): one narrow branch PER COLUMN — groupBy the column
(map-side partial agg, shuffle carries one row per distinct value),
then aggregate the distinct groups: n_distinct = group count, non-null
count = sum of per-group counts, extrema over the group keys. The
branches union into one job; column pruning means each branch's scan
reads exactly one column. This deliberately avoids a single wide
multi-DISTINCT aggregate: Catalyst plans k distinct aggregates via
Expand, multiplying every input row (k+1)x into one giant shuffle —
measured ~6x slower than the per-column shape on a 6-column profile
and strictly worse at scale. Numeric and timestamp extrema land in
typed `min_num`/`max_num` (doubles; timestamps as epoch seconds),
strings in `min_str`/`max_str` — a fixed output schema regardless of
the profiled table's schema.

Scale: the DEFAULT is sketch mode (exact_distinct=False) —
approx_count_distinct (HLL++ sketch, mergeable) collapses everything
to ONE map-side pass with no per-column shuffles at all, which is the
only sane shape at 100 TB. exact_distinct=True switches to the exact
per-column two-stage aggregation (shuffles one row per distinct value
per column) for when the counts must be exact — the declared oracle
query passes it because the oracle must hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def _extrema(df: DataFrame, c: str):
    """(min_num, max_num, min_str, max_str) aggregate columns for c."""
    dt = df.schema[c].dataType
    if _is_numeric(dt):
        lo, hi = F.min(c).cast("double"), F.max(c).cast("double")
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        lo = F.unix_timestamp(F.min(c)).cast("double")
        hi = F.unix_timestamp(F.max(c)).cast("double")
    else:
        lo = hi = F.lit(None).cast("double")
    if isinstance(dt, T.StringType):
        slo, shi = F.min(c), F.max(c)
    else:
        slo = shi = F.lit(None).cast("string")
    return (
        lo.alias("min_num"),
        hi.alias("max_num"),
        slo.alias("min_str"),
        shi.alias("max_str"),
    )


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """(column, n_non_null, n_distinct, min_num, max_num, min_str, max_str).

    NULLs are excluded from every stat (SQL aggregate semantics), so
    n_null = total_rows - n_non_null.
    """
    cols = columns or df.columns
    if exact_distinct:
        branches = []
        for c in cols:
            # two-stage: distinct groups first (partial agg map-side),
            # then stats over the groups; the NULL group carries cnt=0
            # so sum(cnt) is the non-null count and count(c) over the
            # groups (NULL key excluded) is the distinct count
            groups = df.select(c).groupBy(c).agg(F.count(c).alias("__cnt"))
            agged = groups.agg(
                F.coalesce(F.sum("__cnt"), F.lit(0)).cast("long").alias("n_non_null"),
                F.count(c).alias("n_distinct"),
                *_extrema(df, c),
            )
            branches.append(
                agged.select(
                    F.lit(c).alias("column"),
                    "n_non_null", "n_distinct",
                    "min_num", "max_num", "min_str", "max_str",
                )
            )
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out

    # sketch mode: one map-side pass, no per-column shuffles
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"__n_{c}"),
            F.approx_count_distinct(c).alias(f"__d_{c}"),
        ]
        lo, hi, slo, shi = _extrema(df, c)
        aggs += [
            lo.alias(f"__lo_{c}"), hi.alias(f"__hi_{c}"),
            slo.alias(f"__slo_{c}"), shi.alias(f"__shi_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").alias("n_non_null"),
                F.col(f"__d_{c}").alias("n_distinct"),
                F.col(f"__lo_{c}").alias("min_num"),
                F.col(f"__hi_{c}").alias("max_num"),
                F.col(f"__slo_{c}").alias("min_str"),
                F.col(f"__shi_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 20,
) -> DataFrame:
    """Equi-width histogram over [lo, hi): one map-side binning
    expression + one tiny aggregation (nbins rows). Returns
    (bin, bin_lo, bin_hi, n) for every non-empty bin; values below lo
    clamp into bin 0, values >= hi into the last bin (so the histogram
    always accounts for every non-null row). Bin edges are derived from
    the same IEEE double arithmetic on both engines (floor((x-lo)/w) is
    a fixed op sequence), so the operator is oracle-replayable — unlike
    approx_percentile-style sketches whose internals are
    engine-specific.

    At 100 TB: zero shuffles of data — the groupBy key domain is
    `nbins`, so map-side combine collapses everything before one
    nbins-row exchange. The [lo, hi) range comes from the caller (a
    prior profile() pass or domain knowledge), keeping this single-pass."""
    w = (hi - lo) / nbins
    c = F.col(col).cast("double")
    # clamp on the BIGINT floor result, then narrow: casting a huge
    # long to int first would wrap (a value far above hi, or +Inf,
    # would land in bin 0 or an arbitrary bin instead of the last one)
    bin_ = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((c - lo) / w)),
    ).cast("int")
    # NaN is not NULL: without the isnan filter, floor(NaN) -> NULL and
    # greatest(0, NULL) -> 0 would silently pile NaNs into bin 0,
    # skewing every derived quantile
    return (
        df.filter(c.isNotNull() & ~F.isnan(c))
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * w).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * w).alias("bin_hi"),
            "n",
        )
        .orderBy("bin")
    )


def key_skew(
    df: DataFrame,
    key_col: str,
    k: int = 20,
) -> DataFrame:
    """Heavy-hitter report for a join/aggregation key: the top-k keys
    by row count with each key's share of the table and the running
    cumulative share — the diagnostic you run BEFORE choosing skew
    mitigations (operators/skew.py salting factor, AQE skew-join
    thresholds, bucketing). A top key holding >> 1/shuffle_partitions
    of the rows is the reducer that will straggle.

    Output: (key string-cast for schema stability, n, share,
    cum_share), ordered by n desc with deterministic key tie-break.

    Scale shape: ONE scan, one map-side-combined rollup shuffle
    (grouping sets ((key), ()) — the per-key counts AND the grand
    total come out of the same aggregation, VERDICT r10 #6 closed the
    df.count() second scan) + TakeOrdered over k+1 rows (the total row
    carries grouping flag 1 so it sorts first and always survives the
    limit); share/cum_share are windows over the k+1 surviving rows,
    not the table. NULL keys count as a group (they hash together in a
    real join, which is exactly the skew worth seeing) and stay
    distinct from the rollup total row via the grouping flag."""
    if k < 1:
        raise ValueError(f"key_skew: k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    # grouping_id (1 = the rollup's grand-total row) rather than
    # grouping(col): the latter can't resolve an aliased grouping expr
    g = df.rollup(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().cast("int").alias("_t"),
    )
    top = g.orderBy(F.desc("_t"), F.desc("n"), "key").limit(k + 1)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    denom = F.greatest(
        F.max(F.when(F.col("_t") == 1, F.col("n"))).over(w_all), F.lit(1)
    ).cast("double")
    w_run = Window.orderBy(F.desc("n"), "key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.withColumn("_total", denom)
        .filter(F.col("_t") == 0)
        .select(
            "key",
            "n",
            (F.col("n") / F.col("_total")).alias("share"),
            (F.sum("n").over(w_run) / F.col("_total")).alias("cum_share"),
        )
        .orderBy(F.desc("n"), "key")
    )


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Cross-source vocabulary overlap matrix — the pre-mix diagnostic
    for corpus composition: how much of each pair of sources is the
    same text distribution (near-identical crawls masquerading as two
    sources inflate dedup load and silently double their mix weight;
    near-disjoint sources are safe to weight independently). One row
    per unordered group pair that shares at least one gram:

      (group_a, group_b, n_a, n_b, n_common, jaccard, containment)

    over each group's DISTINCT word-`ngram` set (normalized text;
    ngram=1 is vocabulary overlap, higher n approaches content
    overlap — 8-gram containment is the usual contamination-style
    signal). containment = n_common / min(n_a, n_b) catches a small
    source embedded in a big one, which Jaccard dilutes.

    At 100 TB: one distinct-(group, gram) shuffle (map-side combine
    collapses each group's repeats first) whose result is CACHED —
    the distinct posts feed the per-gram group sets AND both sides of
    the size lookup, and without the cache the corpus explode runs
    once per consumer (round-12 review fix: verified 3 scans -> 1;
    tracked handle, released with the dedup self-join caches) — then
    ONE groupBy(gram) whose state is the gram's group-SET (<=
    #groups, never corpus-sized) exploded into <= G^2/2 pair rows per
    gram — the hot-stopword skew an a-join-b-on-gram self-join would
    hit never materializes. Output is G^2 rows."""
    if ngram < 1:
        raise ValueError(f"source_overlap: ngram must be >= 1, got {ngram}")
    from chapterhousedb_spark.operators.dedup import (
        _persist_for_self_join,
        split_words,
        word_ngrams,
    )

    words = split_words(text_col)
    grams = words if ngram == 1 else word_ngrams(words, ngram)
    posts = _persist_for_self_join(
        df.select(
            F.col(group_col).alias("g"), F.explode(grams).alias("gram")
        ).distinct(),
        True,
    )
    sizes = posts.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    tok_groups = (
        posts.groupBy("gram")
        .agg(F.array_sort(F.collect_set("g")).alias("gs"))
        .filter(F.size("gs") >= 2)
    )
    # all i<j pairs from the sorted group set (two-arg transform: the
    # second lambda param IS the element index here, deliberately)
    pair_arr = F.flatten(
        F.transform(
            F.col("gs"),
            lambda x, i: F.transform(
                F.slice(F.col("gs"), i + 2, F.size(F.col("gs"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    counts = (
        tok_groups.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("group_a"), F.col("p.b").alias("group_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("g").alias("group_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("g").alias("group_b"), F.col("n").alias("n_b"))
    return (
        counts.join(F.broadcast(sa), "group_a")
        .join(F.broadcast(sb), "group_b")
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
            (
                F.col("n_common").cast("double")
                / F.least("n_a", "n_b")
            ).alias("containment"),
        )
    )
