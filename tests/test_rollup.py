"""Incremental rollup: partial/merge equals direct aggregation; HLL
sketch partials merge associatively and estimate within error bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.rollup import (
    distinct_merge,
    distinct_partials,
    rollup_final,
    rollup_merge,
    rollup_partials,
    sketch_estimate,
    sketch_merge,
    sketch_partials,
)
from chapterhousedb_spark.workload.registry import load


def _events(spark, sf_dir):
    return load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "user_id",
        "value",
    )


def test_rollup_merge_equals_direct(spark, sf_dir):
    """hour->day partial merge is bit-identical to aggregating events
    directly at the day grain (the whole point of the pattern)."""
    ev = _events(spark, sf_dir)
    hourly = rollup_partials(
        ev, keys=["event_type", "day", "hour"], sum_cols={"sv": "value"}, scale=6
    )
    daily = rollup_final(
        rollup_merge(hourly, keys=["event_type", "day"], sum_cols=["sv"]),
        sum_cols=["sv"],
    )
    direct = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sv"),
    )
    got = {
        (r["event_type"], r["day"]): (r["n_rows"], r["sv"])
        for r in daily.collect()
    }
    want = {
        (r["event_type"], r["day"]): (r["n_rows"], r["sv"])
        for r in direct.collect()
    }
    assert got == want and len(got) > 0


def test_rollup_merge_composes(spark, sf_dir):
    """Merges compose: hour->day->month equals hour->month (any merge
    tree yields the same partial because sums stay decimal)."""
    ev = _events(spark, sf_dir).withColumn("month", F.date_trunc("month", "day"))
    hourly = rollup_partials(
        ev,
        keys=["event_type", "month", "day", "hour"],
        sum_cols={"sv": "value"},
        scale=6,
    )
    via_day = rollup_merge(
        rollup_merge(hourly, keys=["event_type", "month", "day"], sum_cols=["sv"]),
        keys=["event_type", "month"],
        sum_cols=["sv"],
    )
    direct = rollup_merge(hourly, keys=["event_type", "month"], sum_cols=["sv"])
    a = {(r["event_type"], r["month"]): (r["n_rows"], r["sv"]) for r in via_day.collect()}
    b = {(r["event_type"], r["month"]): (r["n_rows"], r["sv"]) for r in direct.collect()}
    assert a == b and len(a) > 0


def test_distinct_rollup_exact(spark, sf_dir):
    ev = _events(spark, sf_dir)
    parts = distinct_partials(ev, keys=["event_type", "day", "hour"], member_col="user_id")
    daily = distinct_merge(parts, keys=["event_type", "day"], out_col="n_users")
    direct = ev.groupBy("event_type", "day").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    a = {(r["event_type"], r["day"]): r["n_users"] for r in daily.collect()}
    b = {(r["event_type"], r["day"]): r["n_users"] for r in direct.collect()}
    assert a == b and len(a) > 0


def test_sketch_merge_equals_direct_sketch(spark, sf_dir):
    """Union-merging hourly sketches to the day grain produces the
    SAME estimate as sketching the day directly — merge must lose
    nothing (HLL union is exact over sketch state)."""
    ev = _events(spark, sf_dir)
    hourly = sketch_partials(ev, keys=["event_type", "day", "hour"], member_col="user_id")
    merged = sketch_estimate(sketch_merge(hourly, keys=["event_type", "day"]))
    direct = sketch_estimate(sketch_partials(ev, keys=["event_type", "day"], member_col="user_id"))
    a = {(r["event_type"], r["day"]): r["n_distinct_est"] for r in merged.collect()}
    b = {(r["event_type"], r["day"]): r["n_distinct_est"] for r in direct.collect()}
    assert a == b and len(a) > 0


def test_sketch_estimate_within_error(spark, sf_dir):
    """lg_k=12 => ~1.6% standard error; assert every day-grain
    estimate is within 5% of the exact distinct count (>3 sigma)."""
    ev = _events(spark, sf_dir)
    est = sketch_estimate(
        sketch_merge(
            sketch_partials(ev, keys=["event_type", "day", "hour"], member_col="user_id"),
            keys=["event_type", "day"],
        )
    )
    exact = ev.groupBy("event_type", "day").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    joined = est.join(exact, ["event_type", "day"]).collect()
    assert len(joined) > 0
    for r in joined:
        assert r["n_distinct_est"] == pytest.approx(r["n_exact"], rel=0.05)


def test_rollup_partial_has_mapside_combine(spark, sf_dir):
    """The partial aggregation plan must show a partial_* aggregate
    before the exchange (map-side combine) — the property that makes
    the fine-grain pass cheap at scale."""
    ev = _events(spark, sf_dir)
    hourly = rollup_partials(
        ev, keys=["event_type", "day", "hour"], sum_cols={"sv": "value"}, scale=6
    )
    plan = hourly._jdf.queryExecution().executedPlan().toString()
    assert "partial_" in plan or "HashAggregate" in plan
    first_agg = plan.index("HashAggregate")
    assert "Exchange" in plan[first_agg:], "expected partial agg above the exchange"


def test_rollup_random_merge_trees_equal_direct(spark):
    """Seeded randomized invariant: for random data and ANY random
    grouping of fine keys into merge steps, the merged partial equals
    the direct aggregation — the decimal-sum associativity the whole
    pattern rests on (doubles would fail this under reordering)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(13)
    for trial in range(3):
        n = int(rng.integers(200, 800))
        pdf = pd.DataFrame(
            {
                "g": rng.integers(0, 5, size=n),
                "sub": rng.integers(0, 40, size=n),
                "v": np.round(rng.random(n) * 1e6, 4) * rng.choice([-1, 1], n),
            }
        )
        df = spark.createDataFrame(pdf)
        fine = rollup_partials(df, ["g", "sub"], {"sv": "v"}, scale=6)
        # random intermediate regrouping: sub -> bucket of random width
        width = int(rng.integers(2, 9))
        mid = rollup_merge(
            fine.withColumn("bucket", (F.col("sub") / width).cast("int")),
            ["g", "bucket"],
            ["sv"],
        )
        merged = rollup_final(rollup_merge(mid, ["g"], ["sv"]), ["sv"])
        direct = rollup_final(
            rollup_merge(rollup_partials(df, ["g"], {"sv": "v"}, scale=6), ["g"], ["sv"]),
            ["sv"],
        )
        a = {r["g"]: (r["n_rows"], r["sv"]) for r in merged.collect()}
        b = {r["g"]: (r["n_rows"], r["sv"]) for r in direct.collect()}
        assert a == b, f"trial {trial}"


def test_histogram_partials_merge_and_quantiles(spark, sf_dir):
    """Quantiles answered from hour-grain histogram partials merged to
    the type grain equal direct binning AND land within one bin width
    of the true order statistic."""
    from chapterhousedb_spark.operators.rollup import (
        histogram_merge,
        histogram_partials,
        quantile_from_histogram,
    )

    ev = _events(spark, sf_dir)
    lo, hi, nbins = 0.0, 500.0, 256
    hourly = histogram_partials(
        ev, ["event_type", "hour"], "value", lo, hi, nbins
    )
    merged = histogram_merge(hourly, ["event_type"])
    direct = histogram_partials(ev, ["event_type"], "value", lo, hi, nbins)
    a = {(r["event_type"], r["bin"]): r["bin_n"] for r in merged.collect()}
    b = {(r["event_type"], r["bin"]): r["bin_n"] for r in direct.collect()}
    assert a == b and len(a) > 0

    got = {
        r["event_type"]: r["q"]
        for r in quantile_from_histogram(
            merged, ["event_type"], 0.5, lo, hi, nbins, out_col="q"
        ).collect()
    }
    exact = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    width = (hi - lo) / nbins
    for et, q in got.items():
        assert abs(q - exact[et]) <= width + 1e-9, (et, q, exact[et])


def test_versioned_base_time_travel(spark, tmp_path_factory):
    """Old versions read back exactly as written; list_versions
    enumerates them; a missing version raises."""
    import pytest as _pt
    from pyspark.sql import Row

    from chapterhousedb_spark.operators.merge import merge_upsert
    from chapterhousedb_spark.streaming import (
        init_versioned_base,
        list_versions,
        read_versioned_base,
    )

    root = str(tmp_path_factory.mktemp("timetravel") / "base")
    v0 = spark.createDataFrame(
        [Row(k=1, v="a", version=0), Row(k=2, v="b", version=0)]
    )
    init_versioned_base(v0, root)
    merged = merge_upsert(
        v0,
        spark.createDataFrame([Row(k=2, v="b2", version=1)]),
        ["k"],
        "version",
    )
    merged.write.mode("overwrite").parquet(f"{root}/v000001")
    from chapterhousedb_spark.streaming.batcher import _write_latest_marker

    _write_latest_marker(spark, root, 1)

    assert list_versions(spark, root) == [0, 1]
    cur, ver = read_versioned_base(spark, root)
    assert ver == 1 and {(r.k, r.v) for r in cur.collect()} == {(1, "a"), (2, "b2")}
    old, ver0 = read_versioned_base(spark, root, version=0)
    assert ver0 == 0 and {(r.k, r.v) for r in old.collect()} == {(1, "a"), (2, "b")}
    with _pt.raises(ValueError, match="not found"):
        read_versioned_base(spark, root, version=7)


def test_vacuum_versions_retention(spark, tmp_path_factory):
    """vacuum keeps the newest keep_last versions (always incl. the
    _LATEST), removes the rest, and time travel to a vacuumed version
    raises while retained ones still read."""
    import pytest as _pt
    from pyspark.sql import Row

    from chapterhousedb_spark.streaming import (
        init_versioned_base,
        list_versions,
        read_versioned_base,
        vacuum_versions,
    )
    from chapterhousedb_spark.streaming.batcher import _write_latest_marker

    root = str(tmp_path_factory.mktemp("vacuum") / "base")
    for v in range(4):
        df = spark.createDataFrame([Row(k=1, v=v)])
        if v == 0:
            init_versioned_base(df, root)
        else:
            df.write.mode("overwrite").parquet(f"{root}/v{v:06d}")
            _write_latest_marker(spark, root, v)
    assert list_versions(spark, root) == [0, 1, 2, 3]
    removed = vacuum_versions(spark, root, keep_last=2)
    assert removed == [0, 1]
    assert list_versions(spark, root) == [2, 3]
    cur, ver = read_versioned_base(spark, root)
    assert ver == 3 and cur.collect()[0]["v"] == 3
    assert read_versioned_base(spark, root, version=2)[1] == 2
    with _pt.raises(ValueError, match="not found"):
        read_versioned_base(spark, root, version=0)
    with _pt.raises(ValueError, match="keep_last"):
        vacuum_versions(spark, root, keep_last=0)


def test_decayed_counts_exact_and_order_independent(spark):
    """Power-of-two decay: hand-computable weights, exact at any
    parallelism (repartition shouldn't change a single bit)."""
    import datetime as dt

    from chapterhousedb_spark.operators.rollup import decayed_counts

    rows = [
        ("a", dt.datetime(2024, 1, 31)),   # age 0 -> 1.0
        ("a", dt.datetime(2024, 1, 30)),   # age 1 -> 0.5
        ("a", dt.datetime(2024, 1, 28)),   # age 3 -> 0.125
        ("b", dt.datetime(2024, 2, 5)),    # future -> clamps to 1.0
        ("b", dt.datetime(1900, 1, 1)),    # ancient -> 2^-62
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        r["k"]: (r["decayed_count"], r["n_rows"])
        for r in decayed_counts(df, ["k"], "ts", "2024-01-31").collect()
    }
    assert got["a"] == (1.0 + 0.5 + 0.125, 3)
    assert got["b"] == (1.0 + 2.0**-62, 2)
    got32 = {
        r["k"]: r["decayed_count"]
        for r in decayed_counts(
            df.repartition(32), ["k"], "ts", "2024-01-31"
        ).collect()
    }
    assert got32 == {k: v[0] for k, v in got.items()}  # bit-identical
    # half_life scaling: 2-day half life halves the age exponent
    got_hl = {
        r["k"]: r["decayed_count"]
        for r in decayed_counts(
            df, ["k"], "ts", "2024-01-31", half_life_days=2
        ).collect()
    }
    assert got_hl["a"] == 1.0 + 1.0 + 0.5  # ages 0,1,3 -> units 0,0,1


def test_decayed_from_partials_equals_direct(spark, sf_dir):
    """Continuous trending: the score derived from day-grain mergeable
    partials is BIT-IDENTICAL to decayed_counts on the facts, and
    stays identical when the partials arrive as two merged halves —
    so a streaming-maintained partial base answers trending for any
    ref_date without rescanning facts."""
    from chapterhousedb_spark.operators.rollup import (
        decayed_counts,
        decayed_from_partials,
        rollup_merge,
        rollup_partials,
    )
    from chapterhousedb_spark.workload.registry import load

    ev = load(spark, sf_dir, "events")
    direct = {
        (r["event_type"],): (r["decayed_count"], r["n_rows"])
        for r in decayed_counts(ev, ["event_type"], "ts", "2024-01-31").collect()
    }
    day = F.date_trunc("day", "ts").alias("day")
    partials = rollup_partials(ev, ["event_type", day])
    got = {
        (r["event_type"],): (r["decayed_count"], r["n_rows"])
        for r in decayed_from_partials(
            partials, ["event_type"], "day", "2024-01-31"
        ).collect()
    }
    assert got == direct  # bit-exact
    # merged halves give the same partial base
    h1 = rollup_partials(ev.filter("event_id % 2 = 0"), ["event_type", day])
    h2 = rollup_partials(ev.filter("event_id % 2 = 1"), ["event_type", day])
    merged = rollup_merge(h1.unionByName(h2), ["event_type", F.col("day")])
    got2 = {
        (r["event_type"],): (r["decayed_count"], r["n_rows"])
        for r in decayed_from_partials(
            merged, ["event_type"], "day", "2024-01-31"
        ).collect()
    }
    assert got2 == direct
    # moving the ref_date forward reweighs without touching facts
    fwd = decayed_from_partials(partials, ["event_type"], "day", "2024-02-05")
    fwd_direct = decayed_counts(ev, ["event_type"], "ts", "2024-02-05")
    assert {tuple(r) for r in fwd.collect()} == {
        tuple(r) for r in fwd_direct.collect()
    }
