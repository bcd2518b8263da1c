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
    each of the `iters` iterations is then one aggregation over the
    cached columns producing k(k+1)/2 + k driver decimals.

    Plan size is O(1) in k (round 11 — the round-10 shape built one
    named agg expression PER gram entry, and a 33-feature langid model
    spent ~20 s/iteration in Catalyst on the 595-expression plan):
    the per-row gram/moment terms build as ONE array fold over the
    packed feature array (w hoisted into a real column so the
    Generate barrier evaluates sigmoid once per row, not per term),
    posexplode, and a single map-side-combined decimal sum per
    position — the shuffle carries k(k+1)/2 + k partial rows per
    partition, never data rows. Decimal addition is exact, hence the
    regrouping is bit-neutral, and the eta fold keeps the original
    left-to-right order — coefficients are bit-identical to the
    round-10 shape (repartition-invariance and IRLS tests unchanged)."""
    import numpy as np

    k = len(feature_cols) + 1  # intercept first
    beta = [0.0] * k
    feats = df.select(
        F.col(label_col).cast("double").alias("__y"),
        F.array(
            F.lit(1.0).cast("double"),
            *[F.col(c).cast("double") for c in feature_cols],
        ).alias("__x"),
    ).persist()
    xv = F.col("__x")
    n_gram = k * (k + 1) // 2
    # position -> (i, j) of the upper triangle, in emission order
    tri = [(i, j) for i in range(k) for j in range(i, k)]
    # unpersist under finally: a mid-training failure (singular solve
    # at ridge=0, a dying executor) must not leak the cached
    # projection into a long-lived session (round-11 review fix —
    # the admit_batch / lang_ngram_train discipline)
    try:
        for _ in range(iters):
            barr = F.array(*[F.lit(float(b)) for b in beta])
            eta = F.aggregate(
                F.zip_with(barr, xv, lambda b, x: b * x),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            staged = feats.select(
                "__x",
                "__y",
                eta.alias("__eta"),
                p.alias("__p"),
            ).select(
                "__x",
                "__eta",
                (F.col("__p") * (F.lit(1.0) - F.col("__p"))).alias("__w"),
                (F.col("__y") - F.col("__p")).alias("__r"),
            )
            w = F.col("__w")
            # working response times weight: w*z = w*eta + (y - p)
            wz = w * F.col("__eta") + F.col("__r")
            idx = F.sequence(F.lit(0), F.lit(k - 1))
            gram_terms = F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        F.sequence(i, F.lit(k - 1)),
                        lambda j: (
                            (w * F.element_at(xv, i + 1))
                            * F.element_at(xv, j + 1)
                        ).cast(_DEC),
                    ),
                )
            )
            moment_terms = F.transform(
                idx, lambda i: (wz * F.element_at(xv, i + 1)).cast(_DEC)
            )
            sums = {
                r["pos"]: r["s"]
                for r in staged.select(
                    F.posexplode(F.concat(gram_terms, moment_terms)).alias(
                        "pos", "val"
                    )
                )
                .groupBy("pos")
                .agg(F.sum("val").alias("s"))
                .collect()
            }
            gram = np.zeros((k, k))
            for pos, (i, j) in enumerate(tri):
                v = float(sums.get(pos) or 0.0)
                gram[i, j] = gram[j, i] = v
            moments = np.array(
                [float(sums.get(n_gram + i) or 0.0) for i in range(k)]
            )
            gram += np.eye(k) * ridge
            beta = [float(b) for b in np.linalg.solve(gram, moments)]
    finally:
        feats.unpersist()
    return beta


def _eta_expr(beta: list[float], feature_cols: list[str]) -> Column:
    """The linear predictor X·beta as ONE left-associated JVM fold in
    PINNED operand order (intercept first, then features in list
    order): 0.0 + b0*1.0 + b1*x1 + ... — the exact IEEE sequence a SQL
    `0.0e0 + b0*1.0e0 + b1*x1 + ...` replays, which is what makes the
    eta (and the eta>0 decision, == sigmoid>0.5 by monotonicity)
    hash-gateable while exp stays out of the gated set."""
    return sum(
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


def logreg_eta(
    df: DataFrame,
    beta: list[float],
    feature_cols: list[str],
    out_col: str = "eta",
) -> DataFrame:
    """Append the linear predictor X·beta (see _eta_expr) — the
    oracle-portable half of logreg scoring: eta and any fixed
    threshold on it (eta > 0 == quality_score > 0.5) are bit-exact
    across engines; the sigmoid itself is not (exp is not IEEE-pinned
    across runtimes)."""
    return df.withColumn(out_col, _eta_expr(beta, feature_cols))


def logreg_score(
    df: DataFrame,
    beta: list[float],
    feature_cols: list[str],
    out_col: str = "quality_score",
) -> DataFrame:
    """Append sigmoid(X beta) with the fitted coefficients embedded as
    literals — a pure JVM projection (scan-speed scoring, stream-safe
    stateless, usable as the keep/drop gate of a curation pipeline)."""
    eta = _eta_expr(beta, feature_cols)
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


# -------------------------------------------------- char-n-gram language id
# fastText-style language classifier (VERDICT r10 #7): hashed char
# n-gram features + one-vs-rest logistic regression on the SAME IRLS
# machinery as the quality classifier, weakly labeled by the existing
# charset/stopword lang_id (text.lang_id). Where the charset baseline
# needs exact stopword hits, the n-gram model generalizes from
# character shape — the standard langid trade (Joulin et al. 2017,
# public fastText paper; no external binary, every feature a JVM
# expression).
#
# Hash family: bucket(g) = md5-prefix mod num_buckets — the repo's
# engine-portable hash recipe (same as the samplers / md5 twins), so
# the scoring arithmetic is DuckDB-replayable under the hash gate
# (workload lang_ngram_fixed). Scoring never materializes the count
# vector: etas fold LINEARLY over the gram-order bucket list
# (sum of beta[bucket] in text order — same float sequence both
# engines), one md5 per gram, all languages in one 4-lane fold.

LANGID_LANGS = ("en", "es", "de", "fr")


def _char_gram_buckets(
    text_col, n: int, num_buckets: int, salt: str
):
    """array<bigint> of hashed char-n-gram buckets in TEXT ORDER over
    the normalized text (lowercase, single spaces — spaces stay in the
    grams, marking word boundaries like fastText's char n-grams).
    Spark `sequence(1, 0)` counts DOWN, so short texts guard to an
    empty array explicitly."""
    from chapterhousedb_spark.operators.dedup import normalize_text

    t = normalize_text(text_col)
    L = F.length(t)
    idx = F.when(
        L >= n, F.sequence(F.lit(1), L - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: t.substr(i, F.lit(n)))
    return F.transform(
        grams,
        lambda g: F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), g)), 1, 8), 16, 10
        ).cast("bigint")
        % num_buckets,
    )


def lang_ngram_score(
    df: DataFrame,
    betas: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_buckets: int = 16,
    salt: str = "lang-v1",
    keep_cols: tuple = (),
) -> DataFrame:
    """Score every doc against per-language linear models:
    (id, *keep_cols, eta_<lang> per language, lang_pred = argmax) —
    `keep_cols` carries payload columns (e.g. the text itself) through
    the projection so a downstream language GATE composes without a
    join-back shuffle (pipeline_ccnet). betas maps
    lang -> [intercept, *coefs(num_buckets)] (lang_ngram_train output
    or pinned literals). eta = intercept + fold(beta[bucket(g)]) /
    n_grams — mathematically the dot product with the L1-normalized
    hashed count vector, computed WITHOUT materializing it: one
    4-lane aggregate over the gram-order bucket list, one md5 per
    gram, zero shuffles (scan-speed, stream-safe stateless).
    Deterministic argmax tie-break: earlier lang in `betas` order
    wins (strictly-greater chain, the lang_id discipline)."""
    langs = list(betas)
    B = num_buckets
    for lang, b in betas.items():
        if len(b) != B + 1:
            raise ValueError(
                f"lang_ngram_score: betas[{lang!r}] has {len(b)} entries, "
                f"expected intercept + {B} coefs"
            )
    from chapterhousedb_spark.operators.dedup import normalize_text

    buckets = _char_gram_buckets(text_col, n, B, salt)
    flat = [float(v) for lang in langs for v in betas[lang][1:]]
    flat_lit = F.array(*[F.lit(v) for v in flat])
    acc0 = F.array_repeat(F.lit(0.0).cast("double"), len(langs))
    folded = F.aggregate(
        buckets,
        acc0,
        lambda acc, b: F.transform(
            acc,
            lambda v, l: v
            + F.element_at(flat_lit, (l * B + b.cast("int") + 1).cast("int")),
        ),
    )
    # gram count WITHOUT touching the bucket array: size(buckets) ==
    # greatest(len(norm) - (n-1), 1) by _char_gram_buckets'
    # construction (the empty-array guard maps to the same floor), and
    # evaluating size(buckets) would re-run the whole md5 transform
    # just to count it
    total = F.greatest(
        F.length(normalize_text(text_col)) - (n - 1), F.lit(1)
    ).cast("double")
    # materialize the 4-lane fold ONCE through a Generate barrier:
    # each eta column referencing `folded` directly re-evaluates the
    # full per-gram md5 fold (higher-order lambdas defeat codegen
    # subexpression elimination — same CollapseProject hazard as
    # ivf_assign), which measured ~#langs x the whole scoring cost on
    # real-length text (round-12 fix: pipeline_ccnet's gate stage
    # dropped ~5x)
    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.explode(
            F.array(F.struct(folded.alias("f"), total.alias("t")))
        ).alias("__ln"),
    )
    out = staged.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        *[
            (
                F.lit(float(betas[lang][0]))
                + F.element_at(F.col("__ln.f"), i + 1) / F.col("__ln.t")
            ).alias(f"eta_{lang}")
            for i, lang in enumerate(langs)
        ],
    )
    pred = F.lit(langs[-1])
    best = F.greatest(*[F.col(f"eta_{lang}") for lang in langs])
    for lang in reversed(langs[:-1]):
        pred = F.when(F.col(f"eta_{lang}") == best, F.lit(lang)).otherwise(
            pred
        )
    return out.withColumn("lang_pred", pred)


def lang_ngram_train(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple = LANGID_LANGS,
    n: int = 3,
    num_buckets: int = 16,
    iters: int = 6,
    ridge: float = 1e-3,
    label_col: str | None = None,
    salt: str = "lang-v1",
) -> dict:
    """Train the one-vs-rest char-n-gram language classifier. Weak
    labels come from the charset/stopword lang_id baseline unless
    `label_col` supplies real ones; docs the baseline can't place
    (pred outside `langs`) are excluded from training — the trained
    model then GENERALIZES past the baseline to stopword-free text
    (test-pinned accuracy floor in tests/test_classifier.py).

    Training features are the explicit L1-normalized hashed count
    columns (explode -> groupBy(id, bucket) -> pivot over the KNOWN
    bucket range — one shuffle over (id, bucket) pairs, never wider),
    because IRLS wants per-feature columns; scoring never builds them
    (see lang_ngram_score). `salt` seeds the md5 bucket family and
    must match the salt later passed to lang_ngram_score (both default
    "lang-v1"). Returns {lang: [intercept, *coefs]}."""
    from chapterhousedb_spark.operators.text import lang_id

    if label_col is None:
        labels = lang_id(docs, text_col, id_col).select(
            F.col(id_col), F.col("lang_pred").alias("__lang")
        )
        base = docs.join(labels, id_col)
    else:
        base = docs.withColumn("__lang", F.col(label_col))
    base = base.filter(F.col("__lang").isin(*langs))
    # the SAME salt must feed scoring (lang_ngram_score's salt param),
    # else every gram hashes to a different bucket than during
    # training and predictions are silently garbage
    buckets = _char_gram_buckets(text_col, n, num_buckets, salt)
    pairs = base.select(
        F.col(id_col), F.col("__lang"), F.explode(buckets).alias("b")
    )
    counts = (
        pairs.groupBy(id_col, "__lang")
        .pivot("b", list(range(num_buckets)))
        .count()
        .na.fill(0)
    )
    total = sum(F.col(str(j)) for j in range(num_buckets))
    feat_cols = [f"f{j}" for j in range(num_buckets)]
    feats = counts.select(
        id_col,
        "__lang",
        *[
            (
                F.col(str(j)).cast("double")
                / F.greatest(total, F.lit(1)).cast("double")
            ).alias(f"f{j}")
            for j in range(num_buckets)
        ],
    ).persist()
    try:
        betas = {}
        for lang in langs:
            train = feats.withColumn(
                "label", (F.col("__lang") == lang).cast("int")
            )
            betas[lang] = logreg_train(train, feat_cols, "label", iters, ridge)
        return betas
    finally:
        feats.unpersist()
