"""Learned quality classifier: IRLS logistic regression as Spark jobs
(decimal-exact order-independent aggregates), JVM-side scoring."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from chapterhousedb_spark.operators.classifier import (
    QUALITY_FEATURES,
    logreg_score,
    logreg_train,
    train_quality_classifier,
)
from chapterhousedb_spark.workload.registry import load
from tests.conftest import SF_SMOKE


def _synth(spark, n=400, seed=3):
    """Synthetic 2-feature rows with a noisy linear boundary."""
    import numpy as np

    rng = np.random.default_rng(seed)
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    logit = 1.5 * x1 - 2.0 * x2 + 0.3
    y = (logit + rng.logistic(0, 1, n) > 0).astype(int)
    rows = [(float(a), float(b), int(c)) for a, b, c in zip(x1, x2, y)]
    return spark.createDataFrame(rows, "f1 double, f2 double, label int")


def test_logreg_train_matches_numpy_reference(spark):
    """The Spark IRLS equals a sequential numpy IRLS running the SAME
    algorithm (same ridge, same iteration count) on the collected
    rows, to float tolerance — the correctness pin for the distributed
    aggregation."""
    import numpy as np

    df = _synth(spark)
    beta = logreg_train(df, ["f1", "f2"], "label", iters=8, ridge=1e-3)

    pdf = df.toPandas()
    X = np.column_stack([np.ones(len(pdf)), pdf.f1.values, pdf.f2.values])
    y = pdf.label.values.astype(float)
    b = np.zeros(3)
    for _ in range(8):
        eta = X @ b
        p = 1.0 / (1.0 + np.exp(-eta))
        w = p * (1 - p)
        gram = X.T @ (X * w[:, None]) + np.eye(3) * 1e-3
        moments = X.T @ (w * eta + (y - p))
        b = np.linalg.solve(gram, moments)
    assert np.allclose(beta, b, rtol=1e-6, atol=1e-8), (beta, list(b))
    # the fit actually learned the planted direction
    assert beta[1] > 0.5 and beta[2] < -0.5


def test_logreg_train_partitioning_invariant(spark):
    """Decimal-exact gram/moment sums make the fit BIT-identical under
    any partitioning — the 100 TB determinism claim, test-pinned."""
    df = _synth(spark, n=300, seed=11)
    b1 = logreg_train(df.repartition(1), ["f1", "f2"], "label", iters=6)
    b32 = logreg_train(df.repartition(32), ["f1", "f2"], "label", iters=6)
    assert b1 == b32  # exact, not approx


def test_logreg_score_jvm_only(spark):
    """Scoring is a pure JVM projection (no Python in the plan) and
    equals the sigmoid computed in python."""
    df = _synth(spark, n=50, seed=5)
    beta = [0.2, 1.0, -1.0]
    scored = logreg_score(df, beta, ["f1", "f2"])
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    for r in scored.collect():
        want = 1.0 / (1.0 + math.exp(-(0.2 + r["f1"] - r["f2"])))
        assert abs(r["quality_score"] - want) < 1e-12


def test_train_quality_classifier_weak_labels(spark):
    """End-to-end GPT-3-style setup on the documents table: weak
    labels from sources, text_stats features, every doc scored in
    [0, 1], labeled rows carry their label, unlabeled rows NULL."""
    docs = load(spark, SF_SMOKE, "documents")
    beta, scored = train_quality_classifier(
        docs,
        positive_sources=["src0", "src1"],
        negative_sources=["src2", "src3"],
        iters=4,
    )
    assert len(beta) == len(QUALITY_FEATURES) + 1
    rows = scored.collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    labeled = [r for r in rows if r["label"] is not None]
    unlabeled = [r for r in rows if r["label"] is None]
    assert labeled and unlabeled
    srcs = {r["source"] for r in labeled}
    assert srcs == {"src0", "src1", "src2", "src3"}


# -------------------------------------------------- char-n-gram language id

_LANG_SENTENCES = {
    "en": "the quick brown fox and the lazy dog with some of their friends",
    "es": "el perro y el gato de la casa con los amigos para que no se vaya",
    "de": "der hund und die katze von dem haus mit den freunden und das nicht",
    "fr": "le chien et le chat de la maison avec les amis pour que ne pas vous",
}
# stopword-FREE probes: same character material, stopwords stripped /
# fused — the charset baseline scores them 0 (no stopword hits ->
# 'unknown'), the n-gram model must still place them from char shape
_LANG_PROBES = {
    "en": "quickbrown foxlazy dogfriends somtheir",
    "es": "perrogato casamigos paraque sevaya losamigos",
    "de": "hundkatze hausfreunden dennicht vonden",
    "fr": "chienchat maisonamis pourque nepas vousavec",
}


def _planted_lang_docs(spark, n_per_lang=12):
    rows = []
    langs = list(_LANG_SENTENCES)
    for i in range(n_per_lang * len(langs)):
        lang = langs[i % len(langs)]
        rows.append((i, f"{_LANG_SENTENCES[lang]} x{i}", lang))
    return spark.createDataFrame(rows, "doc_id long, text string, truth string")


def test_lang_ngram_beats_charset_baseline_off_stopwords(spark):
    """VERDICT r10 #7 accuracy floor: trained on weak labels FROM the
    charset baseline, the char-n-gram model must (a) reproduce the
    baseline on stopword-rich planted docs and (b) classify
    stopword-free probes the baseline cannot place at all."""
    from chapterhousedb_spark.operators.classifier import (
        lang_ngram_score,
        lang_ngram_train,
    )
    from chapterhousedb_spark.operators.text import lang_id

    docs = _planted_lang_docs(spark)
    betas = lang_ngram_train(docs, num_buckets=32)
    scored = lang_ngram_score(docs, betas, num_buckets=32)
    joined = scored.join(docs.select("doc_id", "truth"), "doc_id").collect()
    acc = sum(r["lang_pred"] == r["truth"] for r in joined) / len(joined)
    assert acc >= 0.9, acc

    probes = spark.createDataFrame(
        [(i, t, lang) for i, (lang, t) in enumerate(_LANG_PROBES.items())],
        "doc_id long, text string, truth string",
    )
    base = {r["doc_id"]: r["lang_pred"] for r in lang_id(probes).collect()}
    assert all(v == "unknown" for v in base.values()), base
    got = {
        r["doc_id"]: r["lang_pred"]
        for r in lang_ngram_score(probes, betas, num_buckets=32).collect()
    }
    truth = {r["doc_id"]: r["truth"] for r in probes.collect()}
    ngram_acc = sum(got[d] == truth[d] for d in truth) / len(truth)
    assert ngram_acc >= 0.75, (got, truth)


def test_lang_ngram_score_guards_and_determinism(spark):
    from chapterhousedb_spark.operators.classifier import lang_ngram_score
    import pytest as _pytest

    df = spark.createDataFrame([(1, "abc"), (2, "")], "doc_id long, text string")
    betas = {"en": [0.1] + [0.01] * 16, "fr": [0.2] + [0.02] * 16}
    got = {r["doc_id"]: r for r in lang_ngram_score(df, betas).collect()}
    # empty text: zero grams -> eta == intercept; argmax -> fr
    assert got[2]["eta_en"] == 0.1 and got[2]["eta_fr"] == 0.2
    assert got[2]["lang_pred"] == "fr"
    # repartition invariance (pure projection, no shuffle state)
    rep = {
        r["doc_id"]: r
        for r in lang_ngram_score(df.repartition(7), betas).collect()
    }
    assert rep[1]["eta_en"] == got[1]["eta_en"]
    with _pytest.raises(ValueError, match="expected intercept"):
        lang_ngram_score(df, {"en": [0.0] * 5})


def test_logreg_eta_decision_matches_sigmoid_threshold(spark):
    """logreg_eta is the oracle-portable half of logreg_score: the SAME
    pinned fold, so eta > 0 must agree with quality_score > 0.5 on
    every row (strict monotonicity of the sigmoid), and both must stay
    pure JVM projections (no Python eval, no exchange)."""
    from chapterhousedb_spark.operators.classifier import (
        logreg_eta,
        logreg_score,
    )

    beta = [0.3, 1.7, -2.5]
    df = spark.createDataFrame(
        [(i, 0.1 * i, 0.05 * (i * 7 % 11)) for i in range(40)],
        "doc_id long, f1 double, f2 double",
    )
    both = logreg_score(
        logreg_eta(df, beta, ["f1", "f2"], "eta"), beta, ["f1", "f2"]
    )
    rows = both.collect()
    assert any(r["eta"] > 0 for r in rows) and any(r["eta"] <= 0 for r in rows)
    import math

    for r in rows:
        assert (r["eta"] > 0) == (r["quality_score"] > 0.5), r
        # the score is sigmoid(eta) up to exp's cross-runtime ULPs —
        # JVM exp != libm exp bitwise, which is exactly why eta (not
        # the sigmoid) is the gated column in quality_score_fixed
        assert math.isclose(
            r["quality_score"],
            1.0 / (1.0 + math.exp(-r["eta"])),
            rel_tol=1e-12,
        ), r
    plan = (
        logreg_eta(df, beta, ["f1", "f2"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
