"""table_diff: change detection between table versions."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.diff import diff_summary, row_digest, table_diff


def _versions(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10),
            Row(k=2, a="y", b=20),
            Row(k=3, a="z", b=30),
            Row(k=4, a=None, b=40),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10),      # unchanged
            Row(k=2, a="y2", b=20),     # changed (a)
            Row(k=4, a="", b=40),       # changed: NULL -> '' must be detected
            Row(k=5, a="new", b=50),    # added
        ]                               # k=3 removed
    )
    return left, right


def test_table_diff_change_set(spark):
    left, right = _versions(spark)
    got = {(r["k"], r["change_type"]) for r in table_diff(left, right, ["k"]).collect()}
    assert got == {(2, "changed"), (3, "removed"), (4, "changed"), (5, "added")}


def test_table_diff_null_vs_empty_string(spark):
    """The null sentinel must distinguish NULL from '' — a plain
    concat would collapse them into 'unchanged'."""
    left, right = _versions(spark)
    got = {r["k"]: r["change_type"] for r in table_diff(left, right, ["k"]).collect()}
    assert got[4] == "changed"


def test_table_diff_empty_when_identical(spark):
    left, _ = _versions(spark)
    assert table_diff(left, left, ["k"]).count() == 0


def test_table_diff_explicit_compare_cols(spark):
    """Restricting compare_cols to 'b' hides the a-column edits."""
    left, right = _versions(spark)
    got = {(r["k"], r["change_type"]) for r in table_diff(left, right, ["k"], ["b"]).collect()}
    assert got == {(3, "removed"), (5, "added")}


def test_diff_summary_counts(spark):
    left, right = _versions(spark)
    got = {
        r["change_type"]: r["n_keys"]
        for r in diff_summary(table_diff(left, right, ["k"])).collect()
    }
    assert got == {"changed": 2, "removed": 1, "added": 1}


def test_table_diff_wide_payload_stays_off_the_wire(spark):
    """table_diff projects each side to (keys, digest) BEFORE the
    full-outer join, so the exchanges carry a 32-hex digest per row,
    never the payload: no join-side plan node may output the payload
    attribute (it exists only below the md5 projection)."""
    left, right = _versions(spark)
    wide_l = left.withColumn("payload", F.repeat(F.lit("x"), 1000))
    wide_r = right.withColumn("payload", F.repeat(F.lit("x"), 1000))
    d = table_diff(wide_l, wide_r, ["k"], compare_cols=["a", "b", "payload"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    join_and_above = plan[: plan.index("Join") + 4] if "Join" in plan else plan
    assert "payload" not in join_and_above, join_and_above
    got = {r["k"]: r["change_type"] for r in d.collect()}
    assert got[3] == "removed" and got[5] == "added" and got[2] == "changed"


def test_table_diff_randomized_vs_pandas_reference(spark):
    """Seeded randomized cross-check: table_diff's change set equals an
    independently computed pandas outer-merge reference across random
    key overlaps, random edits, and random NULL placement."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    for trial in range(5):
        n_l, n_r = rng.integers(5, 60), rng.integers(5, 60)
        lk = rng.choice(100, size=n_l, replace=False)
        rk = rng.choice(100, size=n_r, replace=False)
        def frame(keys):
            vals = rng.integers(0, 4, size=len(keys)).astype(object)
            a = np.where(rng.random(len(keys)) < 0.2, None, vals)
            return pd.DataFrame({"k": keys, "a": a, "b": rng.integers(0, 3, size=len(keys))})
        lp, rp = frame(lk), frame(rk)
        got = {
            (r["k"], r["change_type"])
            for r in table_diff(
                spark.createDataFrame(lp), spark.createDataFrame(rp), ["k"]
            ).collect()
        }
        m = lp.merge(rp, on="k", how="outer", indicator=True, suffixes=("_l", "_r"))
        want = set()
        for _, row in m.iterrows():
            if row["_merge"] == "right_only":
                want.add((row["k"], "added"))
            elif row["_merge"] == "left_only":
                want.add((row["k"], "removed"))
            else:
                same = (
                    (row["a_l"] is None and row["a_r"] is None
                     or row["a_l"] == row["a_r"])
                    and row["b_l"] == row["b_r"]
                )
                if not same:
                    want.add((row["k"], "changed"))
        assert got == want, f"trial {trial}"


def test_table_diff_null_keys_match_null_safely(spark):
    """An identical null-key row on both sides is UNCHANGED (never
    added+removed); a modified null-key row reports 'changed' once."""
    from pyspark.sql import Row

    left = spark.createDataFrame([Row(k=None, a="x"), Row(k=1, a="y")])
    same = spark.createDataFrame([Row(k=None, a="x"), Row(k=1, a="y")])
    assert table_diff(left, same, ["k"]).count() == 0
    edited = spark.createDataFrame([Row(k=None, a="x2"), Row(k=1, a="y")])
    got = [(r["k"], r["change_type"]) for r in table_diff(left, edited, ["k"]).collect()]
    assert got == [(None, "changed")]
