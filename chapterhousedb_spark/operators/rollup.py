"""Incremental rollup: mergeable partial aggregates (the hypertable /
continuous-aggregate pattern).

The reference materializes full query results per run
(materialize_files_task.rs); at 100 TB the production shape is instead
*incremental*: aggregate each arriving fine grain (hour, file batch,
partition) ONCE into a small mergeable partial, persist it, and answer
coarser-grain queries by re-aggregating partials — never rescanning the
fact table. That only works if every persisted metric is mergeable:

- counts / sums: additive. Sums are kept as exact DECIMAL in the
  partial (NOT cast to double) so merge order cannot change the result
  — the final cast to double happens once, after the merge, making the
  rollup bit-identical to a direct aggregation (functions/exact.py).
- distinct counts: NOT additive. Two mergeable encodings are provided:
  exact pre-dedup partials (`distinct_partials` — one row per
  fine-grain distinct member, merge = re-count) and Apache DataSketches
  HLL sketches (`sketch_partials` / `sketch_merge` — fixed-size binary
  partials, merge = union; estimate error ~1.6%/sqrt(2^lg_k)).

At scale: the partial aggregation has map-side combine (partial_count /
partial_sum before the shuffle), partials are ~|group keys| rows, and
the merge groups an already-tiny relation — so a day-over-hourly or
month-over-daily rollup touches no fact data at all.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PRECISION = 38


def _key_cols(keys: Sequence[str | Column]) -> list[Column]:
    return [F.col(k) if isinstance(k, str) else k for k in keys]


def rollup_partials(
    df: DataFrame,
    keys: Sequence[str | Column],
    sum_cols: Mapping[str, str | Column] = (),
    count_col: str = "n_rows",
    scale: int = 4,
) -> DataFrame:
    """Aggregate `df` to the fine grain `keys`, producing a mergeable
    partial: `count_col` (bigint) plus, for each (alias, col) in
    `sum_cols`, an exact-decimal sum named `alias`. The decimals stay
    decimals — cast to double only after the LAST merge (rollup_final)
    so any merge tree yields bit-identical results."""
    sums = [
        F.sum(
            (F.col(c) if isinstance(c, str) else c).cast(
                f"decimal({_PRECISION},{scale})"
            )
        ).alias(alias)
        for alias, c in dict(sum_cols).items()
    ]
    return df.groupBy(*_key_cols(keys)).agg(
        F.count(F.lit(1)).alias(count_col), *sums
    )


def rollup_merge(
    partials: DataFrame,
    keys: Sequence[str | Column],
    sum_cols: Sequence[str] = (),
    count_col: str = "n_rows",
) -> DataFrame:
    """Re-aggregate partials to the coarser grain `keys`: counts add,
    decimal sums add exactly. The output is itself a valid partial —
    merges compose (hour -> day -> month)."""
    aggs = [F.sum(count_col).alias(count_col)] + [
        F.sum(a).alias(a) for a in sum_cols
    ]
    return partials.groupBy(*_key_cols(keys)).agg(*aggs)


def rollup_final(partials: DataFrame, sum_cols: Sequence[str] = ()) -> DataFrame:
    """Terminal step: cast the exact-decimal sums to double for
    presentation. Apply exactly once, after the last merge."""
    out = partials
    for a in sum_cols:
        out = out.withColumn(a, F.col(a).cast("double"))
    return out


# ------------------------------------------------------------------ distinct


def distinct_partials(
    df: DataFrame, keys: Sequence[str | Column], member_col: str | Column
) -> DataFrame:
    """Exact mergeable distinct: one row per fine-grain distinct
    member. Merge to a coarser grain = drop finer keys, re-distinct,
    count (`distinct_merge`). The partial is bounded by the true
    cardinality, never the row count — at 100 TB this is the two-phase
    COUNT(DISTINCT): the heavy dedup shuffle happens once at the fine
    grain; coarser rollups reshuffle only survivors."""
    m = F.col(member_col) if isinstance(member_col, str) else member_col
    return df.select(*_key_cols(keys), m.alias("member")).distinct()


def distinct_merge(
    partials: DataFrame,
    keys: Sequence[str | Column],
    out_col: str = "n_distinct",
) -> DataFrame:
    """Count distinct members at a coarser grain from exact partials."""
    return partials.groupBy(*_key_cols(keys)).agg(
        F.count_distinct(F.col("member")).alias(out_col)
    )


# ------------------------------------------------------------------ sketches


def sketch_partials(
    df: DataFrame,
    keys: Sequence[str | Column],
    member_col: str | Column,
    lg_k: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Approximate mergeable distinct: an Apache DataSketches HLL
    sketch per fine-grain group (pyspark hll_sketch_agg). The partial
    is a fixed ~2^lg_k-byte binary regardless of cardinality — the
    100 TB shape when members are high-cardinality (URLs, doc
    fingerprints) and ~1.6%/sqrt(2^lg_k / 1024) relative error is
    acceptable."""
    m = F.col(member_col) if isinstance(member_col, str) else member_col
    return df.groupBy(*_key_cols(keys)).agg(
        F.hll_sketch_agg(m, F.lit(lg_k)).alias(sketch_col)
    )


def sketch_merge(
    partials: DataFrame,
    keys: Sequence[str | Column],
    sketch_col: str = "sketch",
    allow_different_lg_k: bool = False,
) -> DataFrame:
    """Union sketches to a coarser grain; output is again a partial.
    Pass allow_different_lg_k=True to merge partials built with
    heterogeneous lg_k (the union downgrades to the smallest)."""
    return partials.groupBy(*_key_cols(keys)).agg(
        F.hll_union_agg(F.col(sketch_col), F.lit(allow_different_lg_k)).alias(
            sketch_col
        )
    )


def sketch_estimate(
    partials: DataFrame, out_col: str = "n_distinct_est", sketch_col: str = "sketch"
) -> DataFrame:
    """Terminal step: read the cardinality estimate off each sketch."""
    return partials.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


# ------------------------------------------------------- quantile partials


def histogram_partials(
    df: DataFrame,
    keys: Sequence[str | Column],
    value_col: str,
    lo: float,
    hi: float,
    nbins: int = 256,
) -> DataFrame:
    """Mergeable quantile state: per-group equi-width bin counts over
    [lo, hi) (clamped at both ends, NULLs dropped) — the deterministic
    alternative to t-digest/percentile_approx sketches. Counts are
    additive, so partials merge with rollup_merge-style summation
    (`histogram_merge`), and any quantile is answered from the merged
    counts with resolution (hi-lo)/nbins. NaN values are dropped along
    with NULLs (a NaN would otherwise floor to NULL and clamp into bin
    0, skewing every derived quantile). Unlike engine-internal
    sketches, every step is fixed IEEE arithmetic: the same partials
    and the same quantile answers are reproducible on any engine.

    At 100 TB: the partial is |keys| x nbins rows max; the fine-grain
    pass has map-side combine and coarser rollups never re-read facts
    (same economics as rollup_partials)."""
    w = (hi - lo) / nbins
    c = F.col(value_col).cast("double")
    # clamp on the BIGINT floor, then narrow to int — casting first
    # would wrap for values far above hi (see profile.histogram)
    bin_ = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((c - lo) / w)),
    ).cast("int")
    return (
        df.filter(c.isNotNull() & ~F.isnan(c))
        .groupBy(*_key_cols(keys), bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("bin_n"))
    )


def histogram_merge(
    partials: DataFrame, keys: Sequence[str | Column]
) -> DataFrame:
    """Merge histogram partials to a coarser grain: bin counts add."""
    return partials.groupBy(*_key_cols(keys), "bin").agg(
        F.sum("bin_n").alias("bin_n")
    )


def quantile_from_histogram(
    partials: DataFrame,
    keys: Sequence[str | Column],
    q: float,
    lo: float,
    hi: float,
    nbins: int = 256,
    out_col: str = "quantile",
) -> DataFrame:
    """Answer the q-quantile per group from (merged) histogram
    partials: the upper edge of the first bin whose cumulative count
    reaches ceil(q * n) — a conservative estimate within one bin width
    of the true order statistic. Pure window + filter over the
    |keys| x nbins partial relation; never touches fact data."""
    from pyspark.sql.window import Window

    kc = _key_cols(keys)
    w_cum = (
        Window.partitionBy(*kc)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*kc)
    width = (hi - lo) / nbins
    cum = partials.withColumn("cum", F.sum("bin_n").over(w_cum)).withColumn(
        "total", F.sum("bin_n").over(w_all)
    )
    hit = cum.filter(F.col("cum") >= F.ceil(F.lit(q) * F.col("total")))
    w_first = Window.partitionBy(*kc).orderBy("bin")
    return (
        hit.withColumn("__rk", F.row_number().over(w_first))
        .filter(F.col("__rk") == 1)
        .select(
            *kc, (F.lit(lo) + (F.col("bin") + 1) * width).alias(out_col)
        )
    )


def decayed_counts(
    df: DataFrame,
    keys: Sequence[str | Column],
    ts_col: str,
    ref_date: str,
    half_life_days: int = 1,
    out_col: str = "decayed_count",
) -> DataFrame:
    """Exponentially time-decayed counts per key — the trending-score
    aggregate (recent activity outweighs old) with EXACT arithmetic:
    each row weighs 2^-floor(age_days / half_life_days), built as
    1.0 / (1 << age) — a power of two, exactly representable in a
    double. Every partial sum of such weights is itself exact (the
    common-denominator numerator stays far below 2^53 for any
    realistic count x 62-step age range), so the result is
    ORDER-INDEPENDENT: the same score on any engine at any
    parallelism, hash-gated against a DuckDB oracle — unlike exp()
    decay, whose libm rounding differs across platforms.

    Ages clamp to [0, 62]: future rows count at full weight 1, and
    anything older than 62 half-lives contributes 2^-62 (~2e-19 -
    numerically nothing, but still exact). At 100 TB: one map-side
    weight expression + one map-side-combined groupBy; the decayed
    state is also MERGEABLE at fixed ref_date — per-(key, day) integer
    counts are the partial (rollup_partials shape), and any merge tree
    reweighs exactly."""
    age_days = F.datediff(F.lit(ref_date).cast("date"), F.col(ts_col).cast("date"))
    age = F.least(
        F.lit(62),
        F.greatest(F.lit(0), (age_days / half_life_days).cast("int")),
    )
    # shiftleft with a COLUMN bit count needs the SQL form (the python
    # wrapper only takes a literal); 1 << age is the exact 2^age long
    staged = df.withColumn("__age", age)
    weight = F.expr(
        "1.0 / CAST(shiftleft(CAST(1 AS BIGINT), __age) AS DOUBLE)"
    )
    return (
        staged.groupBy(*_key_cols(keys))
        .agg(
            F.sum(weight).alias(out_col),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def decayed_from_partials(
    partials: DataFrame,
    keys: Sequence[str | Column],
    day_col: str,
    ref_date: str,
    count_col: str = "n_rows",
    half_life_days: int = 1,
    out_col: str = "decayed_count",
) -> DataFrame:
    """Answer the trending score from MERGEABLE day-grain partials
    instead of rescanning facts: rollup_partials keyed on (keys, day)
    — exactly what rollup_stream maintains incrementally — reweighs to
    any reference date with the same exact power-of-two arithmetic as
    decayed_counts. Because per-day counts are integers and the decay
    weights are powers of two, the answer is BIT-IDENTICAL to
    decayed_counts run directly on the facts (test-pinned), and the
    ref_date can move forward daily without touching fact data — the
    continuous-trending pattern: partials update at O(new rows),
    scores re-derive at O(|keys| x days)."""
    age_days = F.datediff(
        F.lit(ref_date).cast("date"), F.col(day_col).cast("date")
    )
    age = F.least(
        F.lit(62),
        F.greatest(F.lit(0), (age_days / half_life_days).cast("int")),
    )
    staged = partials.withColumn("__age", age)
    weight = F.expr(
        "1.0 / CAST(shiftleft(CAST(1 AS BIGINT), __age) AS DOUBLE)"
    )
    return staged.groupBy(*_key_cols(keys)).agg(
        F.sum(weight * F.col(count_col)).alias(out_col),
        F.sum(count_col).alias(count_col),
    )
