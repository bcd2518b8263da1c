"""Incremental corpus merge (upsert + tombstone delete), latest wins.

The reference engine has no mutation surface at all — its lifecycle is
one-shot scan -> materialize (materialize_files_task.rs:68-171) and the
README.md:47-77 roadmap has no UPDATE/MERGE entry. A training-data
pipeline, however, refreshes its corpus continuously: each new crawl
batch must replace stale documents (same key, newer version), add new
ones, and delete retracted ones, leaving everything else untouched.
This is Delta/Iceberg MERGE-style semantics re-expressed as a pure
shuffle plan on vanilla parquet: tag both sides, union, rank per key,
keep the winner, drop tombstones.

At 100 TB: ONE hash shuffle of base+updates on the key — the same cost
as any equi-join on that key — then a per-key window (row_number) that
whole-stage-codegens. No driver-side state, no Python in the hot path.
The updates side is typically orders of magnitude smaller than base;
if base is bucketed/clustered by the key, rewriting only affected
partitions (partition-pruned overwrite) turns this into an
incremental job — the plan below is the value-semantics core either
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SRC = "__chdb_src"
_RN = "__chdb_rn"


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Merge `updates` into `base`, keyed by `keys`.

    Winner per key = highest `version_col`; on a version tie the
    updates side wins (so re-submitting the same batch is idempotent).
    If `delete_col` (boolean) is given, a winning update row with
    delete_col=true is a tombstone: the key disappears from the output.
    Rows of `base` whose key never appears in `updates` pass through
    unchanged.

    Requires: `updates` has the same columns as `base` (delete_col may
    exist on either side or both; it is coalesced to false and removed
    from the output). Each (key, version) must be unique per side —
    duplicate versions on the SAME side would make the winner
    arbitrary, so callers dedup their batch first (exact_dedup).
    """
    d = delete_col
    if d is not None:
        if d not in base.columns:
            base = base.withColumn(d, F.lit(False))
        if d not in updates.columns:
            updates = updates.withColumn(d, F.lit(False))
    missing = set(base.columns) ^ set(updates.columns)
    if missing:
        raise ValueError(f"base/updates column mismatch: {sorted(missing)}")
    tagged = base.withColumn(_SRC, F.lit(0)).unionByName(
        updates.withColumn(_SRC, F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col(_SRC).desc()
    )
    out = (
        tagged.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN, _SRC)
    )
    if d is not None:
        out = out.filter(~F.coalesce(F.col(d), F.lit(False))).drop(d)
    return out


def merge_upsert_small_updates(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """merge_upsert variant for the common production shape: updates is
    orders of magnitude smaller than base (a crawl batch into a 100 TB
    corpus). Here base must NEVER pay a shuffle — the distinct update
    key set broadcasts to a left-anti join (untouched base rows stream
    straight through, zero movement) and a left-semi join (only the
    touched base rows enter the rank), so the single hash shuffle moves
    O(touched + updates) rows instead of O(base). Same semantics as
    merge_upsert (latest version wins, updates win ties, tombstones
    delete); equality is test-pinned.

    Use merge_upsert when updates is a large fraction of base (the
    broadcast stops fitting); this one when it's a small batch.

    Semantic parity corner cases (why the extra plumbing below):
    base-side tombstones must still be filtered on the untouched branch
    (merge_upsert drops EVERY winner flagged deleted, even untouched
    ones), and null-key rows never match an equi-join, so they are
    routed into the rank alongside the updates rather than through the
    anti join — otherwise base and update null-key rows would both
    survive where merge_upsert keeps one winner.
    """
    import functools

    d = delete_col
    null_key = functools.reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in keys]
    )
    base_nn, base_nullk = base.filter(~null_key), base.filter(null_key)
    ukeys = updates.select(*keys).dropDuplicates(keys)
    untouched = base_nn.join(F.broadcast(ukeys), keys, "left_anti")
    touched = base_nn.join(F.broadcast(ukeys), keys, "left_semi")
    if d is not None:
        if d not in untouched.columns:
            untouched = untouched.withColumn(d, F.lit(False))
        untouched = untouched.filter(
            ~F.coalesce(F.col(d), F.lit(False))
        ).drop(d)
        if d not in base_nullk.columns:
            base_nullk = base_nullk.withColumn(d, F.lit(False))
    winners = merge_upsert(
        touched.unionByName(base_nullk, allowMissingColumns=True),
        updates,
        keys,
        version_col,
        delete_col,
    )
    return untouched.unionByName(winners)


def merge_stats(
    base: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """One-row report of what a merge would do: matched (update), new
    (insert), unchanged. A left-out for dry-run tooling; both sides
    reduce to key sets first so the join shuffles keys, not payloads."""
    bk = base.select(*keys).dropDuplicates(keys)
    uk = updates.select(*keys).dropDuplicates(keys)
    joined = bk.withColumn("__b", F.lit(1)).join(
        uk.withColumn("__u", F.lit(1)), on=keys, how="full_outer"
    )
    return joined.agg(
        F.count(F.when(F.col("__b").isNotNull() & F.col("__u").isNotNull(), 1)).alias(
            "n_updated"
        ),
        F.count(F.when(F.col("__b").isNull(), 1)).alias("n_inserted"),
        F.count(F.when(F.col("__u").isNull(), 1)).alias("n_unchanged"),
    )
