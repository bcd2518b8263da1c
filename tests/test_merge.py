"""merge_upsert (incremental corpus merge) semantics on constructed inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.merge import merge_stats, merge_upsert


@pytest.fixture(scope="module")
def corpus(spark):
    base = spark.createDataFrame(
        [
            Row(doc_id=1, text="one", version=1),
            Row(doc_id=2, text="two", version=1),
            Row(doc_id=3, text="three", version=1),
            Row(doc_id=4, text="four", version=3),
        ]
    )
    updates = spark.createDataFrame(
        [
            Row(doc_id=2, text="two-v2", version=2, deleted=False),  # update
            Row(doc_id=3, text="", version=2, deleted=True),  # delete
            Row(doc_id=5, text="five", version=2, deleted=False),  # insert
            Row(doc_id=4, text="four-stale", version=2, deleted=False),  # stale
        ]
    )
    return base, updates


def test_merge_upsert_update_insert_delete_passthrough(corpus):
    base, updates = corpus
    out = merge_upsert(
        base, updates, keys=["doc_id"], version_col="version", delete_col="deleted"
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 4, 5}  # 3 tombstoned
    assert rows[1].text == "one"  # untouched passthrough
    assert rows[2].text == "two-v2" and rows[2].version == 2  # updated
    assert rows[4].text == "four"  # stale update loses to newer base version
    assert rows[5].text == "five"  # inserted
    assert "deleted" not in out.columns


def test_merge_upsert_tie_goes_to_updates(spark):
    base = spark.createDataFrame([Row(doc_id=1, text="base", version=1)])
    updates = spark.createDataFrame([Row(doc_id=1, text="upd", version=1)])
    out = merge_upsert(base, updates, keys=["doc_id"], version_col="version")
    assert out.collect()[0].text == "upd"


def test_merge_upsert_idempotent_resubmit(corpus):
    base, updates = corpus
    kwargs = dict(keys=["doc_id"], version_col="version", delete_col="deleted")
    once = merge_upsert(base, updates, **kwargs)
    # re-merging the same batch into the merged result changes nothing:
    # tombstoned keys stay gone (their update rows delete again), ties
    # resolve to the identical update rows
    twice = merge_upsert(
        once.withColumn("deleted", F.lit(False)), updates, **kwargs
    )
    assert sorted(twice.collect()) == sorted(once.collect())


def test_merge_upsert_empty_updates_is_base(corpus):
    base, _ = corpus
    empty = base.withColumn("deleted", F.lit(False)).limit(0)
    out = merge_upsert(
        base, empty, keys=["doc_id"], version_col="version", delete_col="deleted"
    )
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3, 4]


def test_merge_upsert_column_mismatch_raises(spark):
    base = spark.createDataFrame([Row(doc_id=1, text="a", version=1)])
    bad = spark.createDataFrame([Row(doc_id=1, extra="x", version=2)])
    with pytest.raises(ValueError, match="column mismatch"):
        merge_upsert(base, bad, keys=["doc_id"], version_col="version")


def test_merge_upsert_composite_key(spark):
    base = spark.createDataFrame(
        [Row(src="a", doc_id=1, text="x", version=1), Row(src="b", doc_id=1, text="y", version=1)]
    )
    updates = spark.createDataFrame([Row(src="a", doc_id=1, text="x2", version=2)])
    out = merge_upsert(base, updates, keys=["src", "doc_id"], version_col="version")
    rows = {(r.src, r.doc_id): r.text for r in out.collect()}
    assert rows == {("a", 1): "x2", ("b", 1): "y"}


def test_merge_stats(corpus):
    base, updates = corpus
    row = merge_stats(base, updates, keys=["doc_id"]).collect()[0]
    assert (row.n_updated, row.n_inserted, row.n_unchanged) == (3, 1, 1)


def test_merge_single_shuffle_plan(corpus):
    """The merge is ONE hash shuffle on the key + a codegen'd window —
    no join, no extra exchange (the 100 TB cost claim in merge.py)."""
    base, updates = corpus
    out = merge_upsert(
        base, updates, keys=["doc_id"], version_col="version", delete_col="deleted"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_merge_randomized_vs_pandas_reference(spark):
    """Seeded randomized cross-check: merge_upsert equals an
    independent pandas implementation of latest-version-wins +
    update-wins-ties + tombstones, across random key overlaps and
    version orderings (unique (key, version) per side, as required)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for trial in range(3):
        keys = rng.choice(np.arange(40), size=25, replace=False)
        base_pd = pd.DataFrame(
            {
                "doc_id": keys,
                "text": [f"b{k}" for k in keys],
                "version": rng.integers(1, 4, size=25),
                "deleted": False,
            }
        )
        ukeys = rng.choice(np.arange(50), size=20, replace=False)
        upd_pd = pd.DataFrame(
            {
                "doc_id": ukeys,
                "text": [f"u{k}" for k in ukeys],
                "version": rng.integers(1, 4, size=20),
                "deleted": rng.random(20) < 0.3,
            }
        )
        # guard the operator precondition: same (key, version) on both
        # sides is fine (updates win), duplicates WITHIN a side are not
        # generated by construction (keys unique per side)
        both = pd.concat(
            [base_pd.assign(__src=0), upd_pd.assign(__src=1)], ignore_index=True
        )
        win = (
            both.sort_values(
                ["doc_id", "version", "__src"], ascending=[True, False, False]
            )
            .groupby("doc_id", as_index=False)
            .first()
        )
        expect = (
            win[~win["deleted"]]
            .drop(columns=["deleted", "__src"])
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        from chapterhousedb_spark.operators.merge import merge_upsert

        got = (
            merge_upsert(
                spark.createDataFrame(base_pd),
                spark.createDataFrame(upd_pd),
                keys=["doc_id"],
                version_col="version",
                delete_col="deleted",
            )
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[expect.columns]
        )
        pd.testing.assert_frame_equal(
            got.astype({"version": "int64"}),
            expect.astype({"version": "int64"}),
            check_dtype=False,
        )


def test_merge_small_updates_variant_equals_full(corpus):
    """merge_upsert_small_updates must produce exactly merge_upsert's
    rows, and its plan must keep base out of every shuffle: the update
    key set broadcasts (2 BroadcastHashJoin), and the one hash exchange
    feeds only the touched+updates rank."""
    from chapterhousedb_spark.operators.merge import merge_upsert_small_updates

    base, updates = corpus
    kwargs = dict(keys=["doc_id"], version_col="version", delete_col="deleted")
    full = merge_upsert(base, updates, **kwargs)
    small = merge_upsert_small_updates(base, updates, **kwargs)
    assert sorted(small.collect()) == sorted(full.collect())
    # AQE's toString appends an "Initial Plan" duplicate; assert on the
    # final plan only
    plan = (
        small._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # anti + semi join against the broadcast update key set
    assert plan.count("BroadcastHashJoin") == 2, plan
    # the only hash shuffles: the tiny ukeys dedup and the
    # touched+updates window — base feeds no Exchange
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_merge_small_updates_randomized(spark):
    """Randomized equality of the two merge strategies."""
    import numpy as np
    import pandas as pd

    from chapterhousedb_spark.operators.merge import merge_upsert_small_updates

    rng = np.random.default_rng(11)
    keys = rng.choice(np.arange(60), size=30, replace=False)
    base_pd = pd.DataFrame(
        {
            "doc_id": keys,
            "text": [f"b{k}" for k in keys],
            "version": rng.integers(1, 4, size=30),
            "deleted": False,
        }
    )
    ukeys = rng.choice(np.arange(70), size=15, replace=False)
    upd_pd = pd.DataFrame(
        {
            "doc_id": ukeys,
            "text": [f"u{k}" for k in ukeys],
            "version": rng.integers(1, 4, size=15),
            "deleted": rng.random(15) < 0.3,
        }
    )
    b, u = spark.createDataFrame(base_pd), spark.createDataFrame(upd_pd)
    kwargs = dict(keys=["doc_id"], version_col="version", delete_col="deleted")
    assert sorted(merge_upsert_small_updates(b, u, **kwargs).collect()) == sorted(
        merge_upsert(b, u, **kwargs).collect()
    )


def test_merge_small_updates_base_tombstones_and_null_keys(spark):
    """The review corner cases: base-side tombstones must be filtered
    on the untouched branch too, and null-key rows must rank exactly as
    merge_upsert ranks them (one winner), not duplicate through the
    anti join."""
    from chapterhousedb_spark.operators.merge import merge_upsert_small_updates

    base = spark.createDataFrame(
        [
            Row(doc_id=9, text="ghost", version=1, deleted=True),  # base tombstone
            Row(doc_id=1, text="keep", version=1, deleted=False),
            Row(doc_id=None, text="null-base", version=1, deleted=False),
        ]
    )
    updates = spark.createDataFrame(
        [
            Row(doc_id=1, text="keep-v2", version=2, deleted=False),
            Row(doc_id=None, text="null-upd", version=2, deleted=False),
        ]
    )
    kwargs = dict(keys=["doc_id"], version_col="version", delete_col="deleted")
    key = lambda r: (r.doc_id is None, r.doc_id or 0, r.text)  # noqa: E731
    full = sorted(merge_upsert(base, updates, **kwargs).collect(), key=key)
    small = sorted(
        merge_upsert_small_updates(base, updates, **kwargs).collect(), key=key
    )
    assert small == full
    ids = [r.text for r in small]
    assert "ghost" not in ids  # untouched tombstone filtered
    assert ids.count("null-upd") == 1 and "null-base" not in ids


def test_merge_validate_flags_duplicate_key_version(spark):
    base = spark.createDataFrame(
        [Row(doc_id=1, text="a", version=1), Row(doc_id=1, text="b", version=1)]
    )
    updates = spark.createDataFrame([Row(doc_id=1, text="c", version=2)])
    with pytest.raises(ValueError, match="base violates"):
        merge_upsert(base, updates, ["doc_id"], "version", validate=True)
    with pytest.raises(ValueError, match="updates violates"):
        merge_upsert(
            updates,
            base.withColumn("version", F.lit(3)),
            ["doc_id"],
            "version",
            validate=True,
        )
    # clean inputs pass with validate on
    clean = spark.createDataFrame([Row(doc_id=2, text="d", version=1)])
    assert merge_upsert(clean, updates, ["doc_id"], "version", validate=True).count() == 2


def _partition_file_stats(root):
    import os

    stats = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            stats[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns, st.st_ino)
    return stats


def test_merge_apply_partitioned_rewrites_only_affected(spark, tmp_path):
    """Partition-pruned incremental apply: untouched partition files are
    byte-identical (size+mtime+inode) after the merge, and the merged
    table equals a full merge_upsert row-for-row."""
    import os

    from chapterhousedb_spark.operators.merge import merge_apply_partitioned

    base_path = str(tmp_path / "base")
    base_rows = [
        Row(src="a", doc_id=1, text="a1", version=1),
        Row(src="a", doc_id=2, text="a2", version=1),
        Row(src="b", doc_id=3, text="b3", version=1),
        Row(src="c", doc_id=4, text="c4", version=1),
    ]
    base = spark.createDataFrame(base_rows)
    base.repartition(1).write.partitionBy("src").parquet(base_path)
    updates = spark.createDataFrame(
        [
            Row(src="a", doc_id=2, text="a2-v2", version=2, deleted=False),
            Row(src="a", doc_id=9, text="a9", version=2, deleted=False),
        ]
    )
    before = _partition_file_stats(base_path)
    untouched_before = {k: v for k, v in before.items() if "src=a" not in k}

    touched = merge_apply_partitioned(
        updates, base_path, ["src", "doc_id"], "version",
        partition_cols=["src"], delete_col="deleted",
    )
    assert touched == [("a",)]
    after = _partition_file_stats(base_path)
    untouched_after = {k: v for k, v in after.items() if "src=a" not in k}
    assert untouched_before == untouched_after, "untouched partitions were rewritten"

    got = {
        (r.src, r.doc_id, r.text, r.version)
        for r in spark.read.parquet(base_path).collect()
    }
    want = {
        (r.src, r.doc_id, r.text, r.version)
        for r in merge_upsert(
            base, updates, ["src", "doc_id"], "version", delete_col="deleted"
        ).collect()
    }
    assert got == want


def test_merge_apply_partitioned_tombstones_can_empty_a_partition(spark, tmp_path):
    from chapterhousedb_spark.operators.merge import merge_apply_partitioned

    base_path = str(tmp_path / "base")
    spark.createDataFrame(
        [
            Row(src="a", doc_id=1, text="a1", version=1),
            Row(src="b", doc_id=2, text="b2", version=1),
        ]
    ).repartition(1).write.partitionBy("src").parquet(base_path)
    updates = spark.createDataFrame(
        [Row(src="b", doc_id=2, text="", version=2, deleted=True)]
    )
    merge_apply_partitioned(
        updates, base_path, ["src", "doc_id"], "version",
        partition_cols=["src"], delete_col="deleted",
    )
    import os

    assert not os.path.isdir(os.path.join(base_path, "src=b")), "emptied partition must go"
    rows = spark.read.parquet(base_path).collect()
    assert [(r.src, r.doc_id) for r in rows] == [("a", 1)]


def test_merge_apply_partitioned_requires_partition_in_key(spark, tmp_path):
    from chapterhousedb_spark.operators.merge import merge_apply_partitioned

    base_path = str(tmp_path / "base")
    spark.createDataFrame([Row(src="a", doc_id=1, version=1)]).write.partitionBy(
        "src"
    ).parquet(base_path)
    with pytest.raises(ValueError, match="subset of keys"):
        merge_apply_partitioned(
            spark.createDataFrame([Row(src="a", doc_id=1, version=2)]),
            base_path, ["doc_id"], "version", partition_cols=["src"],
        )


def test_merge_schema_evolution_additive(spark):
    """schema_evolution=True: a new update column appears NULL on
    untouched base rows; a base column absent from updates survives on
    base rows; the strict default still raises."""
    import pytest as _pt
    from pyspark.sql import Row

    base = spark.createDataFrame(
        [
            Row(doc_id=1, text="one", legacy="x", version=0),
            Row(doc_id=2, text="two", legacy="y", version=0),
        ]
    )
    ups = spark.createDataFrame(
        [
            Row(doc_id=2, text="two-v1", lang="en", version=1),
            Row(doc_id=3, text="three", lang="de", version=1),
        ]
    )
    with _pt.raises(ValueError, match="column mismatch"):
        merge_upsert(base, ups, ["doc_id"], "version")
    out = merge_upsert(
        base, ups, ["doc_id"], "version", schema_evolution=True
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(out.columns) == {"doc_id", "text", "legacy", "version", "lang"}
    assert rows[1]["legacy"] == "x" and rows[1]["lang"] is None
    assert rows[2]["text"] == "two-v1" and rows[2]["lang"] == "en"
    assert rows[2]["legacy"] is None  # updates won; their legacy is NULL
    assert rows[3]["lang"] == "de" and rows[3]["legacy"] is None


def test_merge_schema_evolution_requires_keys_both_sides(spark):
    import pytest as _pt
    from pyspark.sql import Row

    base = spark.createDataFrame([Row(doc_id=1, text="a", version=0)])
    ups = spark.createDataFrame([Row(text="b", version=1)])
    with _pt.raises(ValueError, match="must exist on both sides"):
        merge_upsert(base, ups, ["doc_id"], "version", schema_evolution=True)


def test_merge_apply_partitioned_empties_null_and_escaped_partitions(spark, tmp_path):
    """Emptied-partition deletion must target the HIVE-ENCODED
    directory names: NULL -> __HIVE_DEFAULT_PARTITION__ and special
    chars %XX-escaped — a naive f"{col}={value}" path misses both and
    tombstoned rows would resurrect."""
    import os

    from chapterhousedb_spark.operators.merge import merge_apply_partitioned

    base_path = str(tmp_path / "base")
    spark.createDataFrame(
        [
            Row(src=None, doc_id=1, text="n1", version=1),
            Row(src="a:b", doc_id=2, text="e2", version=1),
            Row(src="keep", doc_id=3, text="k3", version=1),
        ]
    ).repartition(1).write.partitionBy("src").parquet(base_path)
    assert os.path.isdir(os.path.join(base_path, "src=__HIVE_DEFAULT_PARTITION__"))
    assert os.path.isdir(os.path.join(base_path, "src=a%3Ab"))
    updates = spark.createDataFrame(
        [
            Row(src=None, doc_id=1, text="", version=2, deleted=True),
            Row(src="a:b", doc_id=2, text="", version=2, deleted=True),
        ]
    )
    merge_apply_partitioned(
        updates, base_path, ["src", "doc_id"], "version",
        partition_cols=["src"], delete_col="deleted",
    )
    assert not os.path.isdir(os.path.join(base_path, "src=__HIVE_DEFAULT_PARTITION__"))
    assert not os.path.isdir(os.path.join(base_path, "src=a%3Ab"))
    rows = spark.read.parquet(base_path).collect()
    assert [(r.src, r.doc_id) for r in rows] == [("keep", 3)]


def test_merge_apply_partitioned_guards_partition_breadth(spark, tmp_path):
    """Past max_partitions touched partitions the incremental apply
    refuses (the driver key list + pruning predicate grow per
    partition); under the threshold it proceeds. The count check runs
    BEFORE any collect (VERDICT r6 #4).

    The src values are deliberately NUMERIC-LOOKING strings: partition
    type inference reads the written dirs back as ints, so the
    emptied-partition compare must happen in hive-encoded form — a raw
    tuple compare would see zero matches and mass-delete every
    still-populated partition (found by this test)."""
    from chapterhousedb_spark.operators.merge import merge_apply_partitioned

    base_path = str(tmp_path / "base")
    base = spark.createDataFrame(
        [Row(src=str(i), doc_id=i, text=f"t{i}", version=1) for i in range(6)]
    )
    base.repartition(1).write.partitionBy("src").parquet(base_path)
    updates = spark.createDataFrame(
        [
            Row(src=str(i), doc_id=i, text=f"u{i}", version=2, deleted=False)
            for i in range(6)
        ]
    )
    with pytest.raises(ValueError, match="max_partitions"):
        merge_apply_partitioned(
            updates, base_path, ["src", "doc_id"], "version",
            partition_cols=["src"], delete_col="deleted", max_partitions=3,
        )
    touched = merge_apply_partitioned(
        updates, base_path, ["src", "doc_id"], "version",
        partition_cols=["src"], delete_col="deleted", max_partitions=6,
    )
    assert len(touched) == 6
    got = {r.text for r in spark.read.parquet(base_path).collect()}
    assert got == {f"u{i}" for i in range(6)}
