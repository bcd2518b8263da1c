"""Deterministic sampling / splitting unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.sampling import (
    _threshold_hex,
    deterministic_sample,
    stratified_sample,
    train_val_test_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id"))


def test_threshold_hex_edges():
    assert _threshold_hex(0.0) == "00000000"
    # keep-all must sort above every hex digest prefix ('ffffffff'
    # would drop ids whose prefix is exactly ffffffff)
    assert _threshold_hex(1.0) == "g"
    assert _threshold_hex(0.5) == "80000000"
    with pytest.raises(ValueError):
        _threshold_hex(1.5)


def test_sample_fraction_and_stability(ids):
    a = deterministic_sample(ids, 0.3, salt="x")
    got = {r["doc_id"] for r in a.collect()}
    # close to the target rate (binomial, n=2000)
    assert 0.25 < len(got) / 2000 < 0.35
    # identical on a second run — no RNG anywhere
    again = {r["doc_id"] for r in deterministic_sample(ids, 0.3, salt="x").collect()}
    assert got == again
    # a larger fraction with the same salt is a SUPERSET (threshold grows)
    bigger = {r["doc_id"] for r in deterministic_sample(ids, 0.6, salt="x").collect()}
    assert got <= bigger
    # different salt re-draws
    other = {r["doc_id"] for r in deterministic_sample(ids, 0.3, salt="y").collect()}
    assert got != other


def test_split_partitions_everything(ids):
    df = train_val_test_split(ids, weights=(0.8, 0.1, 0.1), salt="s")
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # membership is stable under corpus growth: the first 1000 ids get
    # the same split whether or not the next 1000 exist
    small = train_val_test_split(ids.filter("doc_id < 1000"), salt="s")
    big = train_val_test_split(ids, salt="s").filter("doc_id < 1000")
    assert {tuple(r) for r in small.collect()} == {tuple(r) for r in big.collect()}


def test_split_weights_normalized(ids):
    a = train_val_test_split(ids, weights=(8, 1, 1), salt="s").collect()
    b = train_val_test_split(ids, weights=(0.8, 0.1, 0.1), salt="s").collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    with pytest.raises(ValueError):
        train_val_test_split(ids, weights=(0, 0, 0))


def test_stratified_rates(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a").when(F.col("id") % 3 == 1, "b").otherwise("c").alias("source"),
    )
    out = stratified_sample(
        df, fractions={"a": 1.0, "b": 0.2}, default_fraction=0.0, salt="z"
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["a"] == 1000          # keep-all stratum
    assert 120 < counts.get("b", 0) < 280  # ~20% of 1000
    assert "c" not in counts            # default 0.0 drops the rest


def test_training_order_is_a_permutation(ids):
    from chapterhousedb_spark.operators.sampling import training_order

    out = training_order(ids, id_col="doc_id", n_shards=4).collect()
    assert len(out) == ids.count()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in ids.collect()}
    # positions within each shard are 1..n contiguous
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_training_order_deterministic_and_salt_sensitive(ids):
    from chapterhousedb_spark.operators.sampling import training_order

    a = {(r["doc_id"], r["shard"], r["pos"]) for r in training_order(ids, id_col="doc_id").collect()}
    b = {(r["doc_id"], r["shard"], r["pos"]) for r in training_order(ids, id_col="doc_id").collect()}
    assert a == b
    c = {(r["doc_id"], r["shard"], r["pos"]) for r in training_order(ids, id_col="doc_id", salt="epoch2").collect()}
    assert a != c  # re-salting re-draws the permutation


def test_training_order_balanced(ids):
    from chapterhousedb_spark.operators.sampling import training_order

    out = training_order(ids, id_col="doc_id", n_shards=4).groupBy("shard").count().collect()
    n = ids.count()
    for r in out:
        assert abs(r["count"] - n / 4) < 0.25 * n  # rough uniformity


def test_grouped_sample_caps_and_stability(spark):
    from chapterhousedb_spark.operators.sampling import grouped_sample

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("src")
    )
    out = grouped_sample(df, group_col="src", k=7, id_col="doc_id")
    per = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    assert per == {"0": 7, "1": 7, "2": 7}
    # stable: same picks on a re-run
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in grouped_sample(df, "src", 7, "doc_id").collect()}
    assert a == b
    # growth stability: adding rows to a group keeps existing picks
    # unless displaced by a hash-smaller newcomer — picks of the
    # ORIGINAL set restricted to survivors of the grown set agree
    grown = df.unionByName(
        spark.range(300, 400).select(
            F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("src")
        )
    )
    g = {r["doc_id"] for r in grouped_sample(grown, "src", 7, "doc_id").collect()}
    # survivors from the grown draw that existed before must be a
    # subset of... nothing strong holds per-element, but group caps do:
    assert len(g) == 21


def test_grouped_sample_small_groups_untouched(spark):
    from chapterhousedb_spark.operators.sampling import grouped_sample

    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["doc_id", "src"])
    out = grouped_sample(df, "src", k=5, id_col="doc_id")
    assert out.count() == 3  # groups below the cap keep every row


def _naive_budget_mix(rows, budgets, salt="mix-v1"):
    """Python reference: per-source md5-order running sum, keep while
    prior < budget. rows = [(doc_id, source, n_tok)]."""
    import hashlib

    keep = set()
    by_src: dict[str, list] = {}
    for did, src, tok in rows:
        if src in budgets:
            h = hashlib.md5(f"{salt}:{did}".encode()).hexdigest()
            by_src.setdefault(src, []).append((h, did, tok))
    for src, items in by_src.items():
        prior = 0
        for h, did, tok in sorted(items):
            if prior < budgets[src]:
                keep.add(did)
            prior += tok
    return keep


def test_token_budget_mix_equals_naive_reference(spark):
    """The bucket-decomposed prefix sum selects EXACTLY the docs the
    naive per-source running sum selects — 2000 docs over 3 sources so
    buckets genuinely collide and the boundary bucket does a partial
    within-bucket cut."""
    from chapterhousedb_spark.operators.sampling import token_budget_mix

    rows = [
        (i, f"s{i % 3}", (i * 7) % 40) for i in range(2000)
    ]  # includes zero-token docs
    budgets = {"s0": 4000, "s1": 900, "s2": 13000}
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    got = {
        r["doc_id"]
        for r in token_budget_mix(df, budgets, token_col="n_tok").collect()
    }
    want = _naive_budget_mix(rows, budgets)
    assert got == want
    # every positive budget keeps at least one doc, and the smallest
    # budget (s1: 900 of ~13k tokens) provably truncates its source
    for s in budgets:
        assert any(d % 3 == int(s[1]) for d in got), s
    s1_all = {d for d, src, _ in rows if src == "s1"}
    assert {d for d in got if d % 3 == 1} < s1_all


def test_token_budget_mix_drops_unbudgeted_sources_and_validates(spark):
    from chapterhousedb_spark.operators.sampling import token_budget_mix

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5)], "doc_id long, source string, n_tok long"
    )
    got = token_budget_mix(df, {"a": 100}, token_col="n_tok").collect()
    assert [r["doc_id"] for r in got] == [1]
    with pytest.raises(ValueError, match="at least one source"):
        token_budget_mix(df, {}, token_col="n_tok")


def test_token_budget_mix_stable_under_growth(spark):
    """Growing a source never changes the relative hash order of old
    docs: a previously-kept doc stays kept unless enough hash-smaller
    NEW docs consumed the budget first — equivalently, the selection
    is always the naive reference on the current corpus."""
    from chapterhousedb_spark.operators.sampling import token_budget_mix

    rows1 = [(i, "a", 10) for i in range(100)]
    rows2 = rows1 + [(i, "a", 10) for i in range(1000, 1100)]
    budgets = {"a": 300}
    for rows in (rows1, rows2):
        df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
        got = {
            r["doc_id"]
            for r in token_budget_mix(df, budgets, token_col="n_tok").collect()
        }
        assert got == _naive_budget_mix(rows, budgets)


def test_token_budget_mix_hypothesis_random_graphs(spark):
    """Hypothesis-driven randomized budgets/token distributions vs the
    python naive reference (fixed seed derivation via the library's
    own example machinery is overkill here — the strategy draws keep
    Spark invocations bounded)."""
    from hypothesis import given, settings, strategies as st

    from chapterhousedb_spark.operators.sampling import token_budget_mix

    @settings(max_examples=5, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=0, max_value=50), min_size=30, max_size=60),
        budgets=st.fixed_dictionaries(
            {"a": st.integers(1, 500), "b": st.integers(1, 500)}
        ),
    )
    def inner(toks, budgets):
        rows = [
            (i, "a" if i % 2 == 0 else "b", t) for i, t in enumerate(toks)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, n_tok long"
        )
        got = {
            r["doc_id"]
            for r in token_budget_mix(df, budgets, token_col="n_tok").collect()
        }
        assert got == _naive_budget_mix(rows, budgets)

    inner()


def _tmix_python_ref(rows, alpha, target_frac, salt="tmix"):
    """Bit-faithful python replay of temperature_mix: IEEE doubles in
    the same pinned operand order (ascending-source fold)."""
    import hashlib
    from collections import Counter

    cnt = Counter(s for _, s in rows)
    n_total = float(sum(cnt.values()))
    srcs = sorted(cnt)
    w = {s: float(cnt[s]) ** alpha if alpha != 0.5 else float(cnt[s]) ** 0.5 for s in srcs}
    wsum = 0.0
    for s in srcs:
        wsum += w[s]
    rates = {
        s: min(1.0, target_frac * n_total * (w[s] / wsum) / float(cnt[s]))
        for s in srcs
    }
    kept = set()
    for i, s in rows:
        h = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)
        if h < int(rates[s] * 4294967296.0 // 1):
            kept.add(i)
    return rates, kept


def test_temperature_mix_matches_python_reference(spark):
    from chapterhousedb_spark.operators.sampling import temperature_mix

    rows = [(i, "big" if i < 160 else ("mid" if i < 200 else "tiny"))
            for i in range(210)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, alpha=0.5, target_frac=0.5).collect()
    rates_ref, kept_ref = _tmix_python_ref(rows, 0.5, 0.5)
    got_rates = {r["source"]: r["rate"] for r in out}
    assert got_rates == pytest.approx(rates_ref, abs=0)  # bit-exact
    assert {r["doc_id"] for r in out} == kept_ref
    # alpha < 1 upsamples the small source relative to its share
    assert rates_ref["tiny"] > rates_ref["big"]


def test_temperature_mix_alpha_one_is_flat_sampling(spark):
    from chapterhousedb_spark.operators.sampling import (
        deterministic_sample,
        temperature_mix,
    )

    # 96/32 split: counts are exact binary fractions of N=128, so the
    # alpha=1 algebra collapses to rate == target bit-exactly
    rows = [(i, "a" if i % 4 else "b") for i in range(128)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, alpha=1.0, target_frac=0.25, salt="s9")
    rates = {r["rate"] for r in out.select("rate").distinct().collect()}
    assert rates == {0.25}  # every source keeps exactly the target rate
    flat = deterministic_sample(df, fraction=0.25, salt="s9:")
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in flat.collect()
    }


def test_temperature_mix_alpha_zero_equalizes(spark):
    from chapterhousedb_spark.operators.sampling import temperature_mix

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, alpha=0.0, target_frac=0.2)
    rates = {r["source"]: r["rate"] for r in out.collect()}
    # equal quotas: 10 docs each -> small source rate 10/10=1.0, big 10/90
    assert rates.get("small") == 1.0
    assert rates["big"] == pytest.approx(0.2 * 100 / 2 / 90, abs=0)


def test_temperature_mix_partitioning_invariant_and_validates(spark):
    from chapterhousedb_spark.operators.sampling import temperature_mix

    rows = [(i, f"s{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r["doc_id"] for r in temperature_mix(df).collect()}
    b = {r["doc_id"] for r in temperature_mix(df.repartition(13)).collect()}
    assert a == b and a
    with pytest.raises(ValueError, match="target_frac"):
        temperature_mix(df, target_frac=1.5)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, alpha=-0.1)


def test_pipeline_fineweb_stages_nonvacuous_and_invariant(spark):
    """Each stage of the composed curation pipeline must DO something
    on the shipped testdata (gates drop some docs and keep some), and
    the final selection must be partitioning-invariant."""
    from chapterhousedb_spark.workload import QUERIES
    from chapterhousedb_spark.workload.registry import load
    from chapterhousedb_spark.operators.text import (
        ngram_repetition_stats,
        text_stats,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    n = docs.count()
    q = text_stats(docs).filter("n_tokens >= 25")
    nq = q.count()
    assert 0 < nq < n, (nq, n)
    rep = ngram_repetition_stats(
        docs.join(q.select("doc_id"), "doc_id"), top_ns=(2,), dup_ns=()
    ).filter("top2gram_char_frac <= 0.09")
    nrep = rep.count()
    assert 0 < nrep < nq, (nrep, nq)
    out = QUERIES["pipeline_fineweb"](spark, sf)
    ids = {r["doc_id"] for r in out.collect()}
    assert 0 < len(ids) < nrep
    rates = {r["rate"] for r in out.select("rate").distinct().collect()}
    assert all(0.0 < r <= 1.0 for r in rates)
    # determinism: a second run picks exactly the same docs
    again = {r["doc_id"] for r in QUERIES["pipeline_fineweb"](spark, sf).collect()}
    assert again == ids


def test_temperature_mix_rejects_rate_collision(spark):
    from chapterhousedb_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame(
        [(1, "a", 0.5)], "doc_id long, source string, rate double"
    )
    with pytest.raises(ValueError, match="rate"):
        temperature_mix(df)


def test_temperature_mix_token_weighted(spark):
    """weight_col switches source mass from doc counts to exact token
    sums (the mT5 'sample by token share' form): rates replay the same
    pinned IEEE chain over the integer masses."""
    from chapterhousedb_spark.operators.sampling import temperature_mix

    rows = [
        (i, "big" if i < 60 else "small", 100 if i < 60 else 10)
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    out = temperature_mix(
        df, alpha=0.5, target_frac=0.5, weight_col="n_tok", salt="tw"
    )
    rates = {r["source"]: r["rate"] for r in out.collect()}
    # masses: big 6000, small 200; exact python replay in source order
    import math

    wsum = 0.0
    for mass in (6000.0, 200.0):  # 'big' < 'small' lexicographically
        wsum += math.sqrt(mass)
    total = 6200.0

    def rate(mass):
        return min(1.0, 0.5 * total * (math.sqrt(mass) / wsum) / mass)

    assert rates["big"] == rate(6000.0)
    assert rates["small"] == rate(200.0)
    assert rates["small"] > rates["big"]  # alpha<1 upsamples small mass
