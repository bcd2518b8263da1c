"""Table diff: key-level change detection between two table versions.

The data-engineering primitive behind corpus-version audits ("what did
this week's crawl/merge actually change?"), migration validation (old
pipeline vs new pipeline output), and replication checks. Produces one
row per differing key with a change_type in {added, removed, changed};
unchanged keys are dropped as early as possible.

At 100 TB: ONE full-outer equi-join on the key — both sides hash-shuffle
on the same key so AQE/bucketing co-locates them — comparing a single
fixed-width digest per row instead of every column (the row digest is
computed map-side BEFORE the shuffle, so wide rows never cross the
network; the join moves key + 32-hex digest only). With both tables
bucketed on the key the diff is shuffle-free.

The digest is md5 over a canonical encoding (null-sentinel + unit
separators, same portability argument as operators/sampling.py), so an
ANSI oracle replays it bit-for-bit and the operator itself can be
validated engine-against-engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ASCII unit/record separators: cannot appear in normal text columns,
# keeping the canonical encoding collision-free for practical schemas;
# the null sentinel distinguishes NULL from empty string.
_SEP = "\x1f"
_NULL = "\x00"


def row_digest(df: DataFrame, cols: Sequence[str]) -> Column:
    """md5 over the canonical string encoding of `cols` (order given):
    each value cast to string, NULL -> \\x00 sentinel, joined on \\x1f.
    Engine-portable: DuckDB replays it as
    md5(concat_ws(chr(31), coalesce(CAST(c AS VARCHAR), chr(0)), ...)).

    Cast portability caveat: keep the compared columns to types whose
    string form is engine-identical (ints, strings, booleans map
    cleanly; raw doubles may format differently — pre-round or
    pre-cast them explicitly)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff `right` (new) against `left` (old) by `keys`: returns
    (keys..., change_type) where change_type is 'added' (key only in
    right), 'removed' (key only in left), or 'changed' (key in both,
    digest differs). Equal rows are filtered out. Keys compare
    NULL-SAFELY (NULL is a key value like any other, matching
    merge_upsert's contract — a plain equi-join would double-report an
    unchanged null-key row as added AND removed). compare_cols defaults
    to all non-key columns common to both sides (schema drift: a
    column present on one side only should be diffed explicitly)."""
    if compare_cols is None:
        common = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in common if c not in set(keys)]
    lk = left.select(
        *keys, row_digest(left, compare_cols).alias("__lh")
    )
    rk = right.select(
        *[F.col(k).alias(f"__r_{k}") for k in keys],
        row_digest(right, compare_cols).alias("__rh"),
    )
    # NULL-SAFE key equality: a plain equi-join never matches NULL
    # keys, which would report an unchanged null-key row as BOTH
    # 'added' and 'removed'. eqNullSafe treats NULL as a key value like
    # any other — the same contract as merge_upsert.
    cond = None
    for k in keys:
        c = lk[k].eqNullSafe(F.col(f"__r_{k}"))
        cond = c if cond is None else (cond & c)
    joined = lk.join(rk, cond, "full_outer").select(
        *[F.coalesce(lk[k], F.col(f"__r_{k}")).alias(k) for k in keys],
        "__lh",
        "__rh",
    )
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("__lh").isNull(), F.lit("added"))
            .when(F.col("__rh").isNull(), F.lit("removed"))
            .when(F.col("__lh") != F.col("__rh"), F.lit("changed")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Collapse a table_diff result to per-change_type counts (the
    audit dashboard row). Tiny agg over the diff output."""
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_keys")
    )
