"""DSIR importance-resampling tests: closed-form model properties, a
numpy reference replay of the scoring fold (the pin for the non-gate-
safe log_weight column), selection semantics, and plan/partitioning
invariance. The workload row (dsir_weights) then gates the whole
train->score->select chain against DuckDB on testdata."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.dsir import (
    dsir_gram_posts,
    dsir_score,
    dsir_topk,
    dsir_train,
)

B = 64
SALT = "dsir-test"


@pytest.fixture(scope="module")
def corpus(spark):
    """Two vocab clusters: docs 0-3 'astro' words, docs 4-7 'cooking'
    words, doc 8 mixed. Target = the astro half."""
    rows = [
        (0, "star galaxy nebula orbit star"),
        (1, "galaxy orbit comet star nebula"),
        (2, "nebula star orbit galaxy comet"),
        (3, "comet orbit star star galaxy"),
        (4, "flour oven butter sugar dough"),
        (5, "dough sugar oven flour butter"),
        (6, "butter flour dough oven sugar"),
        (7, "sugar dough butter oven flour"),
        (8, "star oven galaxy flour nebula"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(spark, corpus):
    target = corpus.filter(F.col("doc_id") <= 3)
    return dsir_train(
        target, corpus, num_buckets=B, salt=SALT, orders=(1, 2)
    ).cache()


def _py_bucket(gram: str, order: int) -> int:
    return int(hashlib.md5(f"{SALT}:{order}:{gram}".encode()).hexdigest()[:8], 16) % B


def _py_grams(text: str):
    words = [w for w in " ".join(text.lower().split()).split(" ") if w]
    out = []
    for n in (1, 2):
        for i in range(len(words) - n + 1):
            out.append((n, i, " ".join(words[i : i + n])))
    return out


def test_model_covers_every_bucket_and_sums_to_one(model):
    rows = model.collect()
    assert len(rows) == B
    assert {r["bucket"] for r in rows} == set(range(B))
    # Laplace smoothing makes each corpus's probabilities a proper
    # distribution over the full bucket space
    assert sum(r["p_target"] for r in rows) == pytest.approx(1.0, rel=1e-12)
    assert sum(r["p_raw"] for r in rows) == pytest.approx(1.0, rel=1e-12)
    assert all(r["ratio"] > 0 for r in rows)


def test_model_counts_match_python_reference(model, corpus):
    exp_t: dict[int, int] = {}
    exp_r: dict[int, int] = {}
    for r in corpus.collect():
        for n, _i, g in _py_grams(r["text"]):
            b = _py_bucket(g, n)
            exp_r[b] = exp_r.get(b, 0) + 1
            if r["doc_id"] <= 3:
                exp_t[b] = exp_t.get(b, 0) + 1
    got = {r["bucket"]: (r["c_target"], r["c_raw"]) for r in model.collect()}
    for b in range(B):
        assert got[b] == (exp_t.get(b, 0), exp_r.get(b, 0))


def test_scores_match_numpy_reference_and_prefer_target(
    spark, corpus, model
):
    """log_weight's pin (it is NOT oracle-gated — natural log is not
    bit-portable across engines): the per-doc sum of log ratios must
    match a python replay, and ratio_prod the ordered product."""
    ratios = {r["bucket"]: r["ratio"] for r in model.collect()}
    scored = {
        r["doc_id"]: r
        for r in dsir_score(
            corpus, model, num_buckets=B, salt=SALT, orders=(1, 2)
        ).collect()
    }
    for r in corpus.collect():
        grams = sorted(_py_grams(r["text"]))
        prod = 1.0
        logw = 0.0
        for n, _i, g in grams:
            prod *= ratios[_py_bucket(g, n)]
            logw += math.log(ratios[_py_bucket(g, n)])
        got = scored[r["doc_id"]]
        assert got["n_grams"] == len(grams)
        assert got["ratio_prod"] == pytest.approx(prod, rel=1e-12)
        assert got["log_weight"] == pytest.approx(logw, rel=1e-12)
    # every astro doc outranks every cooking doc; the mixed doc sits
    # strictly between both groups
    astro = [scored[i]["log_weight"] for i in range(4)]
    cooking = [scored[i]["log_weight"] for i in range(4, 8)]
    assert min(astro) > scored[8]["log_weight"] > max(cooking)


def test_scoring_is_partitioning_invariant(spark, corpus, model):
    a = dsir_score(corpus, model, num_buckets=B, salt=SALT)
    b = dsir_score(
        corpus.repartition(7), model, num_buckets=B, salt=SALT
    )
    rows_a = {r["doc_id"]: r for r in a.collect()}
    rows_b = {r["doc_id"]: r for r in b.collect()}
    assert rows_a.keys() == rows_b.keys()
    for k in rows_a:
        # the ordered fold makes the product independent of physical
        # partitioning, bit-for-bit
        assert rows_a[k]["ratio_prod"] == rows_b[k]["ratio_prod"]


def test_topk_is_take_ordered_and_deterministic(spark, corpus, model):
    scored = dsir_score(corpus, model, num_buckets=B, salt=SALT)
    top = dsir_topk(scored, k=4)
    assert {r["doc_id"] for r in top.collect()} == {0, 1, 2, 3}
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_empty_docs_contribute_nothing(spark, model):
    df = spark.createDataFrame(
        [(0, "star galaxy"), (1, ""), (2, None)],
        "doc_id long, text string",
    )
    out = dsir_score(df, model, num_buckets=B, salt=SALT).collect()
    assert [r["doc_id"] for r in out] == [0]


def test_guards(spark, corpus, model):
    with pytest.raises(ValueError, match="orders"):
        dsir_gram_posts(corpus, orders=())
    with pytest.raises(ValueError, match="num_buckets"):
        dsir_gram_posts(corpus, num_buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir_train(corpus, corpus, alpha=0.0)
    scored = dsir_score(corpus, model, num_buckets=B, salt=SALT)
    with pytest.raises(ValueError, match="by"):
        dsir_topk(scored, k=1, by="weight")
    with pytest.raises(ValueError, match="k"):
        dsir_topk(scored, k=0)


def test_score_plan_broadcasts_model_and_stays_jvm(spark, corpus, model):
    """Scoring must join the (<= num_buckets)-row model by BROADCAST
    (no shuffle of the posts on the bucket key) and keep the gram
    pipeline free of Python eval nodes."""
    scored = dsir_score(corpus, model, num_buckets=B, salt=SALT)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
