"""As-of join operator tests vs a python brute-force oracle."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from chapterhousedb_spark.operators.asof import asof_join


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def frames(spark):
    left_rows = [
        (1, 100, ts(5)),
        (2, 100, ts(10)),
        (3, 100, ts(2)),   # before any right row for key 100
        (4, 200, ts(7)),
        (5, 300, ts(9)),   # key with no right rows at all
    ]
    right_rows = [
        (100, ts(4), "q1", 10.0),
        (100, ts(10), "q2", 20.0),  # equal-ts: must match event 2 (<= semantics)
        (200, ts(1), "q3", 30.0),
        (200, ts(6), "q4", 40.0),
    ]
    left = spark.createDataFrame(left_rows, ["event_id", "key", "etime"])
    right = spark.createDataFrame(right_rows, ["rkey", "rtime", "quote", "price"])
    return left, right


def test_asof_join_matches_bruteforce(frames):
    left, right = frames
    out = asof_join(
        left, right, left_on="etime", right_on="rtime", left_by="key", right_by="rkey"
    )
    got = {r["event_id"]: (r["quote"], r["price"]) for r in out.collect()}
    assert got == {
        1: ("q1", 10.0),
        2: ("q2", 20.0),   # inclusive <=
        3: (None, None),   # nothing at-or-before
        4: ("q4", 40.0),
        5: (None, None),   # key never seen on right
    }
    assert out.count() == left.count()  # left-join semantics: all rows kept


def test_asof_join_single_shuffle(frames):
    left, right = frames
    plan = (
        asof_join(
            left, right, left_on="etime", right_on="rtime", left_by="key", right_by="rkey"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union + one window; no join node, no cartesian explosion
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # window shuffle (+AQE variance)


def test_asof_join_row_level_nulls(spark):
    """A matched right row holding NULL in one column must yield that NULL —
    never stitch the missing value from an older right row (DuckDB ASOF
    row-level semantics)."""
    left = spark.createDataFrame([(1, 100, ts(10))], ["event_id", "key", "etime"])
    right = spark.createDataFrame(
        [(100, ts(4), "old", 10.0), (100, ts(9), None, 20.0)],
        T.StructType([
            T.StructField("rkey", T.LongType()),
            T.StructField("rtime", T.TimestampType()),
            T.StructField("quote", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]),
    )
    out = asof_join(
        left, right, left_on="etime", right_on="rtime", left_by="key", right_by="rkey"
    ).collect()
    assert len(out) == 1
    # the ts(9) row matches; its quote is NULL and must STAY NULL
    assert out[0]["quote"] is None
    assert out[0]["price"] == 20.0


def test_asof_join_empty_right_cols(spark):
    """No payload columns on the right: degenerates to left unchanged."""
    left = spark.createDataFrame([(1, 100, ts(5))], ["event_id", "key", "etime"])
    right = spark.createDataFrame([(100, ts(4))], ["rkey", "rtime"])
    out = asof_join(
        left, right, left_on="etime", right_on="rtime", left_by="key", right_by="rkey"
    )
    assert out.columns == left.columns
    assert out.count() == 1


def test_asof_join_tolerance(frames):
    """pandas-merge_asof-style tolerance: matches older than the window
    are nulled; the left row survives unmatched."""
    left, right = frames
    out = asof_join(
        left, right, left_on="etime", right_on="rtime",
        left_by="key", right_by="rkey", tolerance=60.0,  # 1 minute
    )
    got = {r["event_id"]: r["quote"] for r in out.collect()}
    assert got == {
        1: "q1",  # gap exactly 60 s == tolerance, inclusive
        2: "q2",  # gap 0
        3: None,  # nothing at-or-before
        4: "q4",  # gap exactly 60 s
        5: None,  # key never seen on right
    }
    assert out.count() == left.count()
    # a tighter window nulls the 60 s matches but keeps every left row
    tight = asof_join(
        left, right, left_on="etime", right_on="rtime",
        left_by="key", right_by="rkey", tolerance=30.0,
    )
    tgot = {r["event_id"]: r["quote"] for r in tight.collect()}
    assert tgot == {1: None, 2: "q2", 3: None, 4: None, 5: None}


def test_asof_join_tolerance_numeric(spark):
    left = spark.createDataFrame([(1, 7, 100)], ["id", "t", "k"])
    right = spark.createDataFrame(
        [(100, 1, "old"), (100, 6, "new")], ["rk", "rt", "v"]
    )
    strict = asof_join(
        left, right, left_on="t", right_on="rt", left_by="k", right_by="rk",
        tolerance=0.5,
    )
    loose = asof_join(
        left, right, left_on="t", right_on="rt", left_by="k", right_by="rk",
        tolerance=1,
    )
    assert strict.collect()[0]["v"] is None   # gap 1 > 0.5
    assert loose.collect()[0]["v"] == "new"   # gap 1 <= 1


def test_asof_join_tolerance_ntz(spark):
    """TIMESTAMP_NTZ time columns (how Spark reads non-UTC-adjusted
    parquet timestamps, e.g. the testdata events table) must take the
    timestamp tolerance path — regression for the round-3 latent bug
    where NTZ fell into the numeric branch and failed analysis."""
    left = spark.createDataFrame(
        [(1, 100, "2024-01-01 00:05:00"), (2, 100, "2024-01-01 00:30:00")],
        ["event_id", "key", "etime"],
    ).selectExpr("event_id", "key", "cast(etime as timestamp_ntz) etime")
    right = spark.createDataFrame(
        [(100, "2024-01-01 00:04:00", "q1")], ["rkey", "rtime", "quote"]
    ).selectExpr("rkey", "cast(rtime as timestamp_ntz) rtime", "quote")
    assert dict(left.dtypes)["etime"] == "timestamp_ntz"
    out = asof_join(
        left, right, left_on="etime", right_on="rtime",
        left_by="key", right_by="rkey", tolerance=120.0,
    )
    got = {r["event_id"]: r["quote"] for r in out.collect()}
    # event 1 is 60s after the quote (inside 120s); event 2 is 26min after
    assert got == {1: "q1", 2: None}


def test_asof_join_tolerance_ntz_dst_non_utc(spark):
    """NTZ tolerance must be the WALL-CLOCK gap regardless of
    spark.sql.session.timeZone (ADVICE r4): under America/New_York the
    2024-03-10 02:00 spring-forward means the session-zone-cast
    difference between 01:30 and 03:30 NTZ is 3600s, but the wall-clock
    gap is 7200s — with tolerance 5400s the pair must NOT match."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        left = spark.createDataFrame(
            [(1, 7, "2024-03-10 03:30:00"), (2, 7, "2024-03-10 03:15:00")],
            ["event_id", "key", "etime"],
        ).selectExpr("event_id", "key", "cast(etime as timestamp_ntz) etime")
        right = spark.createDataFrame(
            [(7, "2024-03-10 01:30:00", "q1"), (7, "2024-03-10 03:00:00", "q2")],
            ["rkey", "rtime", "quote"],
        ).selectExpr("rkey", "cast(rtime as timestamp_ntz) rtime", "quote")
        out = asof_join(
            left, right, left_on="etime", right_on="rtime",
            left_by="key", right_by="rkey", tolerance=5400.0,
        )
        got = {r["event_id"]: r["quote"] for r in out.collect()}
        # event 2 matches q2 (900s gap); event 1's nearest is also q2
        # (1800s, inside); drop q2 and event 1 would fall to q1 at a
        # 7200s wall gap — outside 5400s even though the zone-cast gap
        # is only 3600s
        assert got == {1: "q2", 2: "q2"}
        out2 = asof_join(
            left.filter("event_id = 1"),
            right.filter("quote = 'q1'"),
            left_on="etime", right_on="rtime",
            left_by="key", right_by="rkey", tolerance=5400.0,
        )
        assert [r["quote"] for r in out2.collect()] == [None]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_asof_join_tolerance_date(spark):
    """DateType columns: tolerance counts DAYS via datediff."""
    left = spark.createDataFrame(
        [(1, 9, "2024-01-10"), (2, 9, "2024-02-01")], ["event_id", "key", "d"]
    ).selectExpr("event_id", "key", "cast(d as date) d")
    right = spark.createDataFrame(
        [(9, "2024-01-08", "r1")], ["rkey", "rd", "tag"]
    ).selectExpr("rkey", "cast(rd as date) rd", "tag")
    out = asof_join(
        left, right, left_on="d", right_on="rd",
        left_by="key", right_by="rkey", tolerance=7,
    )
    got = {r["event_id"]: r["tag"] for r in out.collect()}
    assert got == {1: "r1", 2: None}  # 2 days in, 24 days out


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property test: asof_join == pandas.merge_asof (by-key, backward,
    inclusive, with tolerance) over randomized inputs. Right (key, ts)
    pairs are unique — the documented tie contract (callers dedup ties
    like the asof_join_events query does)."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    ts0 = 1_700_000_000

    @settings(max_examples=20, deadline=None)
    @given(
        st.data(),
        st.integers(min_value=1, max_value=4),   # n keys
        st.integers(min_value=0, max_value=12),  # n left rows
        st.integers(min_value=0, max_value=8),   # n right rows
    )
    def run(data, n_keys, n_left, n_right):
        left_rows = [
            (
                i,
                data.draw(st.integers(1, n_keys)),
                ts0 + data.draw(st.integers(0, 3600)),
            )
            for i in range(n_left)
        ]
        right_seen: set[tuple[int, int]] = set()
        right_rows = []
        for j in range(n_right):
            k = data.draw(st.integers(1, n_keys))
            t = ts0 + data.draw(st.integers(0, 3600))
            if (k, t) in right_seen:
                continue
            right_seen.add((k, t))
            right_rows.append((k, t, float(j)))
        tol = data.draw(st.one_of(st.none(), st.integers(1, 1800)))

        left = spark.createDataFrame(
            left_rows or [(None, None, None)], "event_id long, key long, t long"
        ).filter("event_id is not null").selectExpr(
            "event_id", "key", "timestamp_seconds(t) as t"
        )
        right = spark.createDataFrame(
            right_rows or [(None, None, None)], "rkey long, rt long, val double"
        ).filter("rkey is not null").selectExpr(
            "rkey", "timestamp_seconds(rt) as rt", "val"
        )
        got = {
            r["event_id"]: r["val"]
            for r in asof_join(
                left, right, left_on="t", right_on="rt",
                left_by="key", right_by="rkey",
                tolerance=float(tol) if tol is not None else None,
            ).collect()
        }

        lp = pd.DataFrame(left_rows, columns=["event_id", "key", "t"]).sort_values("t")
        rp = pd.DataFrame(right_rows, columns=["key", "t", "val"]).sort_values("t")
        lp["t"] = pd.to_datetime(lp["t"], unit="s")
        rp["t"] = pd.to_datetime(rp["t"], unit="s")
        if len(lp) and len(rp):
            m = pd.merge_asof(
                lp, rp, on="t", by="key", direction="backward",
                tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
            )
            expected = {
                int(r.event_id): (None if pd.isna(r.val) else float(r.val))
                for r in m.itertuples()
            }
        else:
            expected = {int(i): None for i, _, _ in left_rows}
        assert got == expected

    run()


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 120.0])
def test_asof_directions_match_pandas_merge_asof(spark, direction, tolerance):
    """All three directions (and tolerance) against pandas.merge_asof
    itself — the API this parameter mirrors — on a randomized
    multi-key dataset with exact-tie timestamps."""
    import random

    import pandas as pd

    rng = random.Random(11)
    left_rows = [
        (i, rng.choice([100, 200, 300]), ts(rng.randrange(0, 60)))
        for i in range(60)
    ]
    right_rows = [
        (rng.choice([100, 200]), ts(rng.randrange(0, 60)), float(i))
        for i in range(40)
    ]
    # dedupe right on (key, time): pandas merge_asof tie-resolution
    # among equal right timestamps is positional, ours is value-struct
    # ordered — identical only when (key, time) is unique
    seen = set()
    right_rows = [
        r for r in right_rows if not (r[:2] in seen or seen.add(r[:2]))
    ]
    left = spark.createDataFrame(
        left_rows, "lid long, key long, t timestamp"
    )
    right = spark.createDataFrame(
        right_rows, "rkey long, rt timestamp, val double"
    )
    got = {
        r["lid"]: r["val"]
        for r in asof_join(
            left, right, "t", "rt", "key", "rkey",
            tolerance=tolerance, direction=direction,
        ).collect()
    }
    lp = pd.DataFrame(left_rows, columns=["lid", "key", "t"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["rkey", "rt", "val"]).sort_values("rt")
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    want_df = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", left_by="key", right_by="rkey",
        direction=direction, **kw,
    )
    want = {
        int(r.lid): (None if pd.isna(r.val) else float(r.val))
        for r in want_df.itertuples()
    }
    assert got == want, direction
