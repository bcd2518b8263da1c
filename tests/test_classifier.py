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
