"""Table-profiling operator tests."""

from __future__ import annotations

import pytest

from chapterhousedb_spark.operators.profile import profile


@pytest.fixture(scope="module")
def mixed(spark):
    rows = [
        (1, "a", 1.5, None),
        (2, "b", -2.0, "2024-01-01 00:00:00"),
        (3, None, None, "2024-01-02 00:00:00"),
        (3, "a", 4.0, None),
    ]
    df = spark.createDataFrame(rows, "k long, s string, x double, t string")
    return df.selectExpr("k", "s", "x", "cast(t as timestamp) as t")


def test_profile_stats(mixed):
    got = {r["column"]: r.asDict() for r in profile(mixed, exact_distinct=True).collect()}
    assert got["k"]["n_non_null"] == 4 and got["k"]["n_distinct"] == 3
    assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 3.0
    assert got["s"]["n_non_null"] == 3 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"
    assert got["s"]["min_num"] is None  # strings carry no numeric extrema
    assert got["x"]["min_num"] == -2.0 and got["x"]["max_num"] == 4.0
    assert got["t"]["n_non_null"] == 2
    assert got["t"]["max_num"] - got["t"]["min_num"] == 86400.0  # one day


def test_profile_approx_distinct_close(mixed):
    exact = {
        r["column"]: r["n_distinct"]
        for r in profile(mixed, exact_distinct=True).collect()
    }
    approx = {r["column"]: r["n_distinct"] for r in profile(mixed).collect()}
    for c in exact:  # tiny cardinalities: HLL++ is exact here
        assert approx[c] == exact[c]


def test_profile_default_is_single_pass(spark):
    """The default (sketch) mode must be ONE map-side aggregation pass:
    a single scan and a single partial->final agg exchange, never the
    exact mode's per-column distinct shuffles."""
    from chapterhousedb_spark.plans import physical_plan

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plan = physical_plan(profile(df, columns=["l_orderkey", "l_quantity", "l_returnflag"]))
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange") <= 1


def test_profile_empty(spark):
    df = spark.createDataFrame([], "k long, s string")
    got = {r["column"]: r.asDict() for r in profile(df).collect()}
    assert got["k"]["n_non_null"] == 0 and got["k"]["n_distinct"] == 0
    assert got["k"]["min_num"] is None and got["s"]["min_str"] is None


def test_histogram_bins_and_clamping(spark):
    from chapterhousedb_spark.operators.profile import histogram

    df = spark.createDataFrame(
        [(float(v),) for v in [-5, 0, 1, 9.99, 10, 55, 99.9, 100, 250]], ["x"]
    )
    rows = histogram(df, "x", lo=0.0, hi=100.0, nbins=10).collect()
    got = {r["bin"]: r["n"] for r in rows}
    # -5 clamps into bin 0; 100 and 250 clamp into bin 9
    assert got[0] == 4  # -5, 0, 1, 9.99
    assert got[1] == 1  # 10
    assert got[5] == 1  # 55
    assert got[9] == 3  # 99.9, 100, 250
    assert sum(got.values()) == 9
    r0 = next(r for r in rows if r["bin"] == 0)
    assert (r0["bin_lo"], r0["bin_hi"]) == (0.0, 10.0)


def test_histogram_ignores_nulls(spark):
    from chapterhousedb_spark.operators.profile import histogram

    df = spark.createDataFrame([(1.0,), (None,), (2.0,)], ["x"])
    assert sum(
        r["n"] for r in histogram(df, "x", 0.0, 10.0, nbins=5).collect()
    ) == 2


def test_histogram_drops_nan(spark):
    """NaN must not pile into bin 0 (floor(NaN)->NULL->greatest(0,..)
    would otherwise bin it lowest, skewing derived quantiles)."""
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (float("nan"),), (9.0,)], ["x"]
    )
    from chapterhousedb_spark.operators.profile import histogram

    got = {r["bin"]: r["n"] for r in histogram(df, "x", 0.0, 10.0, nbins=2).collect()}
    assert got == {0: 1, 1: 1}


def test_histogram_extreme_values_no_int_wrap(spark):
    """Values astronomically above hi (and +/-Inf) must clamp into the
    edge bins: the bigint floor result is clamped BEFORE the int cast
    (casting first wraps a huge long to an arbitrary int, silently
    rebinning the row — ADVICE r6)."""
    from chapterhousedb_spark.operators.profile import histogram

    df = spark.createDataFrame(
        [(1e18,), (float("inf"),), (float("-inf"),), (-1e18,), (5.0,)], ["x"]
    )
    got = {r["bin"]: r["n"] for r in histogram(df, "x", 0.0, 10.0, nbins=4).collect()}
    assert got == {0: 2, 2: 1, 3: 2}  # -inf,-1e18 | 5.0 | 1e18,+inf


def test_key_skew_heavy_hitters(spark):
    """Top-k keys with exact shares and cumulative shares; NULL keys
    count as a group (they co-locate in a real join); deterministic
    tie-break; k guard."""
    import pytest as _pytest

    from chapterhousedb_spark.operators.profile import key_skew

    rows = (
        [("hot",)] * 60 + [("warm",)] * 25 + [("cold",)] * 10 + [(None,)] * 5
    )
    df = spark.createDataFrame(rows, "k string")
    got = key_skew(df, "k", k=3).collect()
    assert [(r["key"], r["n"]) for r in got] == [
        ("hot", 60), ("warm", 25), ("cold", 10)
    ]
    assert got[0]["share"] == 0.60 and got[0]["cum_share"] == 0.60
    assert got[1]["cum_share"] == 0.85
    assert got[2]["cum_share"] == 0.95
    # NULL group appears when k admits it
    all4 = key_skew(df, "k", k=10).collect()
    assert (None, 5) in [(r["key"], r["n"]) for r in all4]
    assert all4[-1]["cum_share"] == 1.0
    # ties break on the stringified key
    t = spark.createDataFrame([("b",), ("a",)], "k string")
    tied = key_skew(t, "k", k=2).collect()
    assert [r["key"] for r in tied] == ["a", "b"]
    with _pytest.raises(ValueError, match="k must be"):
        key_skew(df, "k", k=0)


def test_key_skew_single_scan(spark):
    """VERDICT r10 #6: key_skew must derive the total in the SAME
    aggregation pass as the per-key counts (rollup grouping sets), not
    via a second df.count() scan — at 100 TB the old shape doubled the
    diagnostic's cost. Assert exactly one scan of the source in the
    physical plan, and that the rollup total row never leaks into the
    output."""
    from chapterhousedb_spark.operators.profile import key_skew
    from chapterhousedb_spark.plans import physical_plan

    from tests.conftest import SF_SMOKE

    df = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    plan = physical_plan(key_skew(df, "user_id", k=5))
    assert plan.count("Scan parquet") == 1, plan
    rows = key_skew(df, "user_id", k=10**9).collect()
    # every output row is a genuine key group; the grand-total row
    # (grouping flag 1) was consumed into the denominator
    assert len(rows) == df.select("user_id").distinct().count()
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-12


def test_source_overlap_matrix(spark):
    """Three hand-built sources: A and B share half their vocab, C is
    disjoint from both, and D (a small subset of A) shows containment
    1.0 where jaccard dilutes."""
    from chapterhousedb_spark.operators.profile import source_overlap

    df = spark.createDataFrame(
        [
            ("A", "alpha beta gamma delta"),
            ("B", "gamma delta epsilon zeta"),
            ("C", "one two three"),
            ("D", "alpha beta"),
        ],
        "source string, text string",
    )
    rows = {
        (r["group_a"], r["group_b"]): r
        for r in source_overlap(df).collect()
    }
    # C overlaps nothing -> no C rows at all
    assert set(rows) == {("A", "B"), ("A", "D"), ("B", "D")} - {("B", "D")}
    ab = rows[("A", "B")]
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (4, 4, 2)
    assert ab["jaccard"] == pytest.approx(2 / 6)
    assert ab["containment"] == pytest.approx(0.5)
    ad = rows[("A", "D")]
    assert (ad["n_common"], ad["containment"]) == (2, 1.0)
    assert ad["jaccard"] == pytest.approx(0.5)


def test_source_overlap_ngram_and_dedup_within_group(spark):
    from chapterhousedb_spark.operators.profile import source_overlap

    df = spark.createDataFrame(
        [
            ("A", "x y z"),
            ("A", "x y z"),  # repeats never inflate the distinct set
            ("B", "x y q"),
        ],
        "source string, text string",
    )
    uni = {
        (r["group_a"], r["group_b"]): r for r in source_overlap(df).collect()
    }[("A", "B")]
    assert (uni["n_a"], uni["n_b"], uni["n_common"]) == (3, 3, 2)
    bi = {
        (r["group_a"], r["group_b"]): r
        for r in source_overlap(df, ngram=2).collect()
    }[("A", "B")]
    # bigrams: A {x y, y z}, B {x y, y q} -> common {x y}
    assert (bi["n_a"], bi["n_b"], bi["n_common"]) == (2, 2, 1)
    with pytest.raises(ValueError, match="ngram"):
        source_overlap(df, ngram=0)


def test_source_overlap_no_gram_selfjoin_skew(spark):
    """The pair stage must come from per-gram group SETS (bounded by
    #groups), never an a-join-b-on-gram self-join a hot stopword would
    skew: no join on the gram column in the plan."""
    from chapterhousedb_spark.operators.profile import source_overlap

    df = spark.createDataFrame(
        [("A", "x y"), ("B", "x z")], "source string, text string"
    )
    plan = (
        source_overlap(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "gram = gram" not in plan.replace("#", " ").lower()
