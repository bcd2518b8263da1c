"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The pretraining-curation stage that picks raw-corpus documents LOOKING
LIKE a small in-domain target sample (a quality reference set, a
domain corpus) without training a neural scorer: fit two bag-of-
hashed-n-grams models — one on the target sample, one on the raw
corpus — and weight every raw document by its likelihood ratio

    w(doc) = prod_{grams g} p_target(bucket(g)) / p_raw(bucket(g))

(the paper works with log w = sum log-ratios; selection only needs the
ORDERING, which the positive-ratio product preserves). Both models are
CLOSED-FORM from counts (Laplace-smoothed bucket frequencies), so like
the Kneser-Ney LM the entire trained model is SQL-replayable and the
whole train->score->select chain sits under the driver's hash gate
(workload/llm.py::dsir_weights).

Reference parity note: the reference engine (ChapterhouseDB) has no
data-selection operators — this is part of the beyond-reference
training-data surface (SURVEY.md §7.3).

Hash family: bucket(g) = md5-prefix mod num_buckets, salted with the
gram ORDER so unigram and bigram feature spaces stay disjoint — the
repo's engine-portable hash recipe (same as lang_ngram / the md5
samplers), replayed verbatim by DuckDB.

Numeric portability contract (the kn_bigram_scores discipline):
`ratio_prod` is a position-ordered left fold of double multiplies over
exact-count ratios — bit-portable across engines, including its
deterministic under/overflow to 0.0/inf on extreme documents (IEEE
semantics are identical given identical op order; ties at 0.0 are
broken by id in every selection rule here). `log_weight` (the paper's
actual statistic, sum of natural logs) is NOT bit-portable across
engines, so it stays out of oracle-gated column sets and is pinned by
the numpy-reference unit tests in tests/test_dsir.py instead.

At 100 TB: gram extraction is a narrow projection + ONE posexplode
covering every order (per-order windows concatenate into one struct
stream, so each corpus scans once total); each corpus's bucket
histogram is ONE map-side-combined groupBy whose output is at most
`num_buckets` rows (the model is KB-sized however big the corpus is,
and training caches both histograms so the totals pass does not
re-hash the corpus); scoring joins the posts against the
BROADCAST model and folds per doc with collect_list state bounded by
a single document's gram count; top-k selection is a
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8192
DEFAULT_SALT = "dsir-v1"


def _bucket_expr(
    gram: Column, order: int | Column, num_buckets: int, salt: str
) -> Column:
    """Engine-portable hashed-feature bucket: first 8 md5 hex digits
    (as an integer) of 'salt:order:gram', mod num_buckets. The ONE
    definition of the bucket hash — dsir_gram_posts calls it with a
    dynamic order column (ADVICE r12: the previously inlined copy
    could silently drift from this contract helper)."""
    ord_part = (
        F.lit(str(int(order)))
        if isinstance(order, int)
        else order.cast("string")
    )
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:"), ord_part, F.lit(":"), gram
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % num_buckets
    )


def dsir_gram_posts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
    salt: str = DEFAULT_SALT,
    orders: tuple = (1, 2),
) -> DataFrame:
    """Hashed word-n-gram postings: one row per gram instance with
    (id, ord, pos, bucket). Words are the normalized (lowercase,
    whitespace-collapsed) text split on space; order-n grams are the
    space-joined length-n windows. (ord, pos) is a total order over a
    document's gram stream — the fold key for dsir_score. Docs with
    no grams (empty/NULL text) contribute no rows."""
    if not orders or any(int(n) < 1 for n in orders):
        raise ValueError(f"dsir: orders must be positive ints, got {orders!r}")
    if num_buckets < 2:
        raise ValueError(f"dsir: num_buckets must be >= 2, got {num_buckets}")
    from chapterhousedb_spark.operators.dedup import split_words, word_ngrams

    words = split_words(text_col)
    # ONE scan for every order (round-12 review fix — the old
    # union-of-orders shape scanned the corpus once PER order),
    # staying entirely on native operators: the per-order gram arrays
    # stack into an array<array<string>>, a first posexplode yields
    # one (order-index, grams) row per order per doc, a second
    # posexplode yields the gram stream, and the md5 bucketing runs as
    # a flat whole-stage-codegen projection. (Two rejected shapes,
    # both measured slower on gram-dense corpora: per-order
    # explode+union re-scans the corpus per order; building
    # (ord,pos,gram) structs inside a transform lambda evaluates
    # interpreted, ~2.5x the flat hash cost.)
    ns = sorted(set(int(n) for n in orders))
    stacked = F.array(*[word_ngrams(words, n) for n in ns])
    ord_lookup = F.array(*[F.lit(n) for n in ns])
    lvl1 = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(stacked).alias("oidx", "grams"),
    )
    flat = lvl1.select(
        "id",
        F.element_at(ord_lookup, F.col("oidx") + 1).alias("ord"),
        F.posexplode("grams").alias("pos", "gram"),
    )
    # one md5 per gram instance, via the single contract helper
    return flat.select(
        "id",
        "ord",
        "pos",
        _bucket_expr(
            F.col("gram"), F.col("ord"), num_buckets, salt
        ).alias("bucket"),
    )


def _bucket_counts(posts: DataFrame, name: str) -> DataFrame:
    return posts.groupBy("bucket").agg(F.count(F.lit(1)).alias(name))


def dsir_train(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
    salt: str = DEFAULT_SALT,
    orders: tuple = (1, 2),
    alpha: float = 1.0,
    target_posts: DataFrame | None = None,
    raw_posts: DataFrame | None = None,
) -> DataFrame:
    """Fit both hashed-n-gram models closed-form. Returns ONE row per
    bucket (all `num_buckets` of them, so scoring never misses a
    lookup): (bucket, c_target, c_raw, p_target, p_raw, ratio) with
    Laplace smoothing p = (c + alpha) / (N + alpha * num_buckets) —
    alpha > 0 keeps every ratio finite and positive. The model is at
    most num_buckets rows regardless of corpus size: broadcast it.

    target_posts / raw_posts: optional precomputed dsir_gram_posts
    frames (hashing every gram is the dominant cost — when the target
    is a slice of raw, one shared posts frame filtered by id serves
    both sides and the scoring pass, cutting corpus hashing to a
    single scan; gram posts are derived per document, so slicing posts
    by id is identical to hashing the sliced corpus). Caller owns the
    num_buckets/salt/orders agreement with the precomputed frame."""
    if alpha <= 0:
        raise ValueError(f"dsir: alpha must be > 0, got {alpha}")
    kw = dict(
        text_col=text_col,
        id_col=id_col,
        num_buckets=num_buckets,
        salt=salt,
        orders=orders,
    )
    from chapterhousedb_spark.operators.dedup import _persist_for_self_join

    # each histogram feeds BOTH the totals aggregate and the bucket
    # join below; without the cache the dominant cost — hashing every
    # gram of each corpus — runs twice (round-12 review fix, verified
    # 8 scans -> 2 in the plan). The cached frames are <= num_buckets
    # rows (tracked handles, released with the dedup self-join caches)
    if target_posts is None:
        target_posts = dsir_gram_posts(target, **kw)
    if raw_posts is None:
        raw_posts = dsir_gram_posts(raw, **kw)
    ct = _persist_for_self_join(
        _bucket_counts(target_posts, "c_target"), True
    )
    cr = _persist_for_self_join(
        _bucket_counts(raw_posts, "c_raw"), True
    )
    totals = (
        ct.agg(F.coalesce(F.sum("c_target"), F.lit(0)).alias("n_target"))
        .crossJoin(
            cr.agg(F.coalesce(F.sum("c_raw"), F.lit(0)).alias("n_raw"))
        )
    )  # 1 row x 1 row
    a = float(alpha)
    ab = a * num_buckets  # python-side constant: both engines see one literal
    spark = target.sparkSession
    buckets = spark.range(num_buckets).select(F.col("id").alias("bucket"))
    model = (
        buckets.join(ct, "bucket", "left")
        .join(cr, "bucket", "left")
        .join(F.broadcast(totals))
        .select(
            "bucket",
            F.coalesce("c_target", F.lit(0)).alias("c_target"),
            F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
            (
                (F.coalesce("c_target", F.lit(0)).cast("double") + F.lit(a))
                / (F.col("n_target").cast("double") + F.lit(ab))
            ).alias("p_target"),
            (
                (F.coalesce("c_raw", F.lit(0)).cast("double") + F.lit(a))
                / (F.col("n_raw").cast("double") + F.lit(ab))
            ).alias("p_raw"),
        )
        .withColumn("ratio", F.col("p_target") / F.col("p_raw"))
    )
    return model


def dsir_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
    salt: str = DEFAULT_SALT,
    orders: tuple = (1, 2),
    log_weight: bool = True,
    posts: DataFrame | None = None,
) -> DataFrame:
    """Per-document importance weights under a dsir_train model
    (num_buckets/salt/orders must match training). Returns one row per
    doc with >= 1 gram: (id_col, n_grams, ratio_prod[, log_weight]).
    ratio_prod is the bit-portable ordered ratio product (gate-safe);
    log_weight is the paper's log statistic (numpy-pinned, NOT gate-
    safe — see the module contract).

    posts: optional precomputed dsir_gram_posts frame for `df` (share
    one persisted gram scan with dsir_train — see dsir_train). Caller
    owns the num_buckets/salt/orders agreement."""
    if posts is None:
        posts = dsir_gram_posts(
            df,
            text_col=text_col,
            id_col=id_col,
            num_buckets=num_buckets,
            salt=salt,
            orders=orders,
        )
    scored = posts.join(
        F.broadcast(model.select("bucket", "ratio")), "bucket"
    )
    aggs = [
        F.count(F.lit(1)).alias("n_grams"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ord", "pos", "ratio"))
                ),
                lambda s: s["ratio"],
            ),
            F.lit(1.0).cast("double"),
            lambda acc, v: acc * v,
        ).alias("ratio_prod"),
    ]
    if log_weight:
        aggs.append(F.sum(F.log("ratio")).alias("log_weight"))
    return (
        scored.groupBy("id")
        .agg(*aggs)
        .withColumnRenamed("id", id_col)
    )


def dsir_topk(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    by: str = "log_weight",
) -> DataFrame:
    """The k most target-like documents — a TakeOrderedAndProject
    (orderBy + limit), never a global sort; ties (including the
    deterministic 0.0-underflow ties of ratio_prod) break on id."""
    if by not in ("log_weight", "ratio_prod"):
        raise ValueError(
            f"dsir_topk: by must be 'log_weight' or 'ratio_prod', got {by!r}"
        )
    if k < 1:
        raise ValueError(f"dsir_topk: k must be >= 1, got {k}")
    return scored.orderBy(F.col(by).desc(), F.col(id_col).asc()).limit(k)


def dsir_quality_gate(
    model: DataFrame,
    min_log_weight: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
    salt: str = DEFAULT_SALT,
    orders: tuple = (1, 2),
):
    """DSIR admission gate for ingest.admit_batch(quality_fn=...) —
    the CCNet/DSIR-style streaming shape: score each incoming micro-
    batch against a FROZEN importance model (dsir_train output,
    trained once offline on the in-domain target vs a raw snapshot)
    and admit only docs with log-weight >= `min_log_weight`. Calibrate
    the threshold against the model, not universally at 0.0: when the
    target sample is a SUBSET of the raw corpus (the usual DSIR setup)
    the raw model already contains the target mass, so even strongly
    target-like docs score below zero — pick the cutoff from the score
    distribution of a held-out target slice (dsir_score it) the way
    the paper picks its resampling budget. Returns a
    callable (batch) -> surviving rows, all original columns intact —
    the fineweb_quality_gate contract, so the two gates compose by
    nesting.

    Physical shape per micro-batch: the gram projection + ONE
    broadcast join against the (<= num_buckets)-row model + a batch-
    sized aggregation, then survivors inner-join the original rows on
    the id. No state across batches (the model is frozen); docs with
    no grams (empty text) score nothing and are NOT admitted —
    gating on content requires content. The model frame must come
    from dsir_train with the SAME num_buckets/salt/orders or scores
    are silently garbage (the lang_ngram_train salt contract)."""
    kw = dict(
        text_col=text_col,
        id_col=id_col,
        num_buckets=num_buckets,
        salt=salt,
        orders=orders,
    )
    thr = float(min_log_weight)

    def gate(batch: DataFrame) -> DataFrame:
        scored = dsir_score(batch, model, log_weight=True, **kw)
        keep = scored.filter(F.col("log_weight") >= thr).select(id_col)
        return batch.join(F.broadcast(keep), id_col)

    return gate
