"""Learned quality classifier: logistic regression trained as Spark
jobs (IRLS / iteratively-reweighted least squares), scored JVM-side.

The standard pretraining-data setup (GPT-3 / PaLM data papers, public):
train a linear classifier on weak labels — documents from a CURATED
source are positives, documents from a raw-crawl source negatives —
then score the whole corpus and keep the high-scoring tail. The model
here is deliberately linear-over-interpretable-features (the
text_stats ratio vector), not an external fastText binary: every
feature is a deterministic JVM expression, so scoring runs at scan
speed with no Python in the hot path.

Determinism at scale: each IRLS iteration aggregates the weighted
gram matrix X'WX and moment vector X'Wz with sums over
DECIMAL(38,18)-cast terms — decimal addition is EXACT, hence
order-independent, hence the fitted coefficients are bit-identical
under any partitioning/AQE plan (test-pinned by a repartition
invariance check). The per-iteration driver payload is one row of
k*(k+1)/2 + k decimals (k = len(features) + intercept, ~7) — bounded,
never data-sized. Reference: ChapterhouseDB has no ML surface at all
(SURVEY.md §2 — this is beyond-reference capability in the
north-star's training-data-pipeline direction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUALITY_FEATURES = [
    "avg_token_len",
    "alpha_ratio",
    "digit_ratio",
    "punct_ratio",
    "space_ratio",
    "stopword_ratio",
]

_DEC = "decimal(38,18)"


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    ridge: float = 1e-3,
) -> list[float]:
    """Fit logistic regression by IRLS over Spark aggregates.

    Each iteration: p = sigmoid(X beta) and w = p(1-p) as JVM
    expressions with the CURRENT beta embedded as literals; the gram
    matrix X'WX (upper triangle) and the working-response moments
    X'Wz, z = X beta + (y - p)/w, aggregate as exact decimal sums; the
    (k x k) solve happens on the driver in numpy with `ridge` added to
    the diagonal (also what keeps separable data from driving ||beta||
    to infinity). Returns [intercept, *coefs].

    At 100 TB: the (label, features) projection — k+1 doubles per row,
    tiny next to raw text — is PERSISTED once, so the text_stats regex
    chain (or whatever upstream featurization) runs ONE corpus scan;
    each of the `iters` iterations is then a single map-side-combined
    aggregate over the cached columns producing ONE driver row of ~35
    decimals. No shuffle of data rows at all."""
    import numpy as np

    k = len(feature_cols) + 1  # intercept first
    beta = [0.0] * k
    feats = df.select(
        F.col(label_col).cast("double").alias("__y"),
        *[F.col(c).cast("double").alias(f"__x{i}") for i, c in enumerate(feature_cols)],
    ).persist()
    xs = [F.lit(1.0).cast("double")] + [
        F.col(f"__x{i}") for i in range(len(feature_cols))
    ]
    y = F.col("__y")
    for _ in range(iters):
        eta = sum(
            (F.lit(float(b)) * x for b, x in zip(beta, xs)), F.lit(0.0)
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = p * (F.lit(1.0) - p)
        # working response times weight: w*z = w*eta + (y - p)
        wz = w * eta + (y - p)
        aggs = []
        for i in range(k):
            for j in range(i, k):
                aggs.append(
                    F.sum((w * xs[i] * xs[j]).cast(_DEC)).alias(f"g_{i}_{j}")
                )
        for i in range(k):
            aggs.append(F.sum((wz * xs[i]).cast(_DEC)).alias(f"m_{i}"))
        row = feats.agg(*aggs).collect()[0]
        gram = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                v = float(row[f"g_{i}_{j}"] or 0.0)
                gram[i, j] = gram[j, i] = v
        moments = np.array([float(row[f"m_{i}"] or 0.0) for i in range(k)])
        gram += np.eye(k) * ridge
        beta = [float(b) for b in np.linalg.solve(gram, moments)]
    feats.unpersist()
    return beta


def logreg_score(
    df: DataFrame,
    beta: list[float],
    feature_cols: list[str],
    out_col: str = "quality_score",
) -> DataFrame:
    """Append sigmoid(X beta) with the fitted coefficients embedded as
    literals — a pure JVM projection (scan-speed scoring, stream-safe
    stateless, usable as the keep/drop gate of a curation pipeline)."""
    eta = sum(
        (
            F.lit(float(b)) * x
            for b, x in zip(
                beta,
                [F.lit(1.0).cast("double")]
                + [F.col(c).cast("double") for c in feature_cols],
            )
        ),
        F.lit(0.0),
    )
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)))


def train_quality_classifier(
    docs: DataFrame,
    positive_sources: list[str],
    negative_sources: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    iters: int = 8,
    ridge: float = 1e-3,
) -> tuple[list[float], DataFrame]:
    """The GPT-3-style weak-label setup end-to-end: docs from
    `positive_sources` are label 1 (curated), `negative_sources`
    label 0 (raw crawl); features are the text_stats ratio vector;
    train on the labeled subset, score EVERY doc. Returns
    (beta, scored) where scored = (id, source, features..., label
    where known, quality_score)."""
    from chapterhousedb_spark.operators.text import text_stats

    feats = text_stats(docs, text_col, id_col, keep_cols=[source_col])
    labeled = feats.withColumn(
        "label",
        F.when(F.col(source_col).isin(positive_sources), F.lit(1))
        .when(F.col(source_col).isin(negative_sources), F.lit(0))
        .otherwise(F.lit(None)),
    )
    train = labeled.filter(F.col("label").isNotNull())
    beta = logreg_train(train, QUALITY_FEATURES, "label", iters, ridge)
    return beta, logreg_score(labeled, beta, QUALITY_FEATURES)
