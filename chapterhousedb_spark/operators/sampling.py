"""Deterministic sampling and dataset splitting.

Training pipelines need REPRODUCIBLE sampling: the same document must
land in the same split on every run, on any engine, at any parallelism
— which rules out rand()/sample() (seed-dependent, engine-dependent,
partition-order-dependent). The standard construction is hash-bucket
thresholding: hash a stable key, keep the row iff the hash falls below
the fraction's threshold.

The hash here is md5 of the (salted) key string and the comparison is
on the LEADING 8 HEX CHARS of the digest, compared lexicographically
against the fraction's hex threshold. Hex strings of equal length
compare identically as strings and as numbers, and md5 is available
bit-identically in Spark, DuckDB, and practically everything else — so
the exact same rows are selected by any engine (the DuckDB oracles
replay these operators verbatim). xxhash64 would be cheaper but is not
portable; md5 is one codegen'd JVM expression per row.

Scale: all three operators are pure map-side column expressions — zero
shuffles, no state, trivially linear at 100 TB. Changing the salt
re-draws the assignment; keeping it fixed pins holdout membership
across pipeline re-runs (the property that prevents eval contamination
when the corpus is re-processed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 hex chars = 32 bits of the digest: fraction resolution 2^-32,
# collision-free for thresholding purposes.
_HEX_DIGITS = 8
_SPACE = 1 << (4 * _HEX_DIGITS)


def _threshold_hex(fraction: float) -> str:
    """Hex threshold t such that P[md5_prefix < t] = floor(f * 2^32) / 2^32.

    fraction >= 1.0 returns 'g' — lexicographically above every hex
    string — so keep-all keeps ALL rows ('ffffffff' would drop the
    1-in-4B ids whose digest prefix is exactly ffffffff)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * _SPACE), f"0{_HEX_DIGITS}x")


def _hash_prefix(id_col: str, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, _HEX_DIGITS
    )


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows, chosen by md5(salt || id) thresholding.

    Same rows on every run and every engine; disjoint salts give
    independent draws.
    """
    return df.filter(_hash_prefix(id_col, salt) < F.lit(_threshold_hex(fraction)))


def train_val_test_split(
    df: DataFrame,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    id_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a 'train'/'val'/'test' column by hash-bucketing the id.

    Weights are normalized; membership is a pure function of
    (salt, id) — stable under corpus growth: adding documents never
    moves an existing document between splits.
    """
    total = sum(weights)
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    w_train, w_val, _ = (w / total for w in weights)
    h = _hash_prefix(id_col, salt)
    t1 = F.lit(_threshold_hex(w_train))
    t2 = F.lit(_threshold_hex(w_train + w_val))
    return df.withColumn(
        split_col,
        F.when(h < t1, F.lit("train")).when(h < t2, F.lit("val")).otherwise(
            F.lit("test")
        ),
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the dataset-mixing primitive.

    fractions maps a stratum value (e.g. a source/domain name) to its
    keep rate; strata absent from the map use default_fraction. This is
    how corpus mixtures are weighted (upsample high-quality sources,
    downsample boilerplate) while staying reproducible.
    """
    h = _hash_prefix(id_col, salt)
    thr: Column = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return df.filter(h < thr)


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "order-v1",
) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: assign
    every row a (shard, pos) — which output shard it belongs to and its
    position within that shard — by ordering on md5(salt || id). The
    resulting permutation is uniform-pseudorandom yet fully
    reproducible on any engine at any parallelism (same md5-portability
    argument as the samplers above), which is what a training run
    needs: epoch order must be re-derivable, resumable mid-epoch, and
    identical between the team that wrote the shards and the team that
    reads them.

    Shard assignment uses a DIFFERENT salt suffix than the intra-shard
    order so the two hash draws are independent (otherwise every
    shard's rows would start with the shard's own hash prefix range and
    positions would correlate with the assignment).

    At 100 TB: one hash-partition exchange on shard (rows carry an
    8-byte id + two 8-char digests) and a per-shard sort for the
    row_number — Spark sorts each shard partition independently; there
    is no global sort. n_shards should be >= the cluster's write
    parallelism; re-salting re-draws the epoch permutation for
    multi-epoch training."""
    from pyspark.sql.window import Window

    shard_h = F.md5(F.concat(F.lit(salt + ":shard:"), F.col(id_col).cast("string")))
    pos_h = F.md5(F.concat(F.lit(salt + ":pos:"), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(shard_h, 1, 8), 16, 10).cast("bigint") % n_shards
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy("pos_h", id_col)
    return (
        df.select(F.col(id_col), shard, pos_h.alias("pos_h"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("pos_h")
    )


def grouped_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "grouped-v1",
) -> DataFrame:
    """Deterministic per-group cap: keep at most `k` rows per group,
    chosen by md5(salt || id) order — the corpus-mixing primitive
    ("at most N documents per domain/source") that replaces
    reservoir sampling when the draw must be reproducible across runs
    and engines. Adding rows to a group only displaces the hash-largest
    survivors; existing picks below the cut stay picked (stability
    under corpus growth, same property as the samplers above).

    At 100 TB: one hash shuffle on the group key, then a partition-local
    top-k window; no global sort, no driver state. For heavily skewed
    group sizes the rank-filter prunes inside the window pass."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    token_col: Column | str,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic TOKEN-BUDGET mixture: fill each source's token
    budget by admitting its documents in md5(salt || id) order until
    the budget is exhausted — the "mix 300B tokens of web + 50B of
    code + 20B of books" primitive where mixture weights are specified
    in TOKENS, not row fractions (stratified_sample's unit). Contract:
    a doc is kept iff the token sum of its hash-order predecessors
    within its source is < budget (so the budget-crossing doc is
    admitted and each positive budget keeps >= 1 doc); sources absent
    from `budgets` are dropped. Same md5 determinism as the samplers
    above: re-runs, engines, and parallelism all pick identical docs,
    and growing a source only ever displaces hash-largest survivors.

    Scale design — the naive form is a per-source ORDER BY + running
    sum: one sort partition PER SOURCE, unusable when one source holds
    10^10 docs. Instead the hash order is decomposed by its own
    2-hex-char prefix into 256 buckets/source: (1) per-(source,
    bucket) token sums — a map-side-combined aggregate of at most
    |sources| x 256 rows; (2) a window over THAT tiny relation yields
    each bucket's prior total; (3) buckets entirely under budget keep
    all rows, buckets starting past budget drop all rows, and ONLY the
    single boundary bucket per source (~1/256 of its docs) pays a
    within-bucket sort for the exact cutoff. Results are exactly the
    rows the naive per-source running sum selects (the DuckDB oracle
    replays that naive form; hash order == (bucket, within-bucket)
    order because the bucket is a prefix of the hash)."""
    from pyspark.sql.window import Window

    if not budgets:
        raise ValueError("budgets must name at least one source")
    tok = (F.col(token_col) if isinstance(token_col, str) else token_col).cast(
        "long"
    )
    budget: Column = F.lit(None).cast("long")
    for src, b in sorted(budgets.items()):
        budget = F.when(F.col(source_col) == src, F.lit(int(b))).otherwise(budget)
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    rows = (
        df.filter(F.col(source_col).isin(list(budgets)))
        .withColumn("__h", h)
        .withColumn("__tok", tok)
        .withColumn("__bkt", F.substring("__h", 1, 2))
    )
    per_bucket = rows.groupBy(source_col, "__bkt").agg(
        F.sum("__tok").alias("__bsum")
    )
    wb = (
        Window.partitionBy(source_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_prior = per_bucket.withColumn(
        "__bprior", F.coalesce(F.sum("__bsum").over(wb), F.lit(0))
    )
    joined = rows.join(bucket_prior, [source_col, "__bkt"])
    keep_all = (F.col("__bprior") + F.col("__bsum")) < budget
    drop_all = F.col("__bprior") >= budget
    aux = ["__h", "__tok", "__bkt", "__bsum", "__bprior"]
    kept_wholesale = joined.filter(keep_all).drop(*aux)
    wwin = (
        Window.partitionBy(source_col, "__bkt")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = (
        joined.filter(~keep_all & ~drop_all)
        .withColumn(
            "__prior",
            F.col("__bprior") + F.coalesce(F.sum("__tok").over(wwin), F.lit(0)),
        )
        .filter(F.col("__prior") < budget)
        .drop(*aux, "__prior")
    )
    return kept_wholesale.unionByName(boundary)


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    target_frac: float = 0.25,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "tmix",
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-based source resampling (the mT5/BLOOM mixing rule:
    sample source i proportionally to n_i^alpha, alpha = 1/T): compute
    each source's weight w_i = n_i^alpha / sum_j n_j^alpha, give it a
    document quota of target_frac * N * w_i, and keep each of its docs
    iff the 32-bit md5(salt:id) prefix falls under rate_i = min(1,
    quota_i / n_i). alpha < 1 flattens the mixture (upsamples small
    high-quality sources relative to their share); alpha = 1 reduces
    to plain target_frac sampling; alpha = 0 equalizes sources.

    Determinism contract: selection is the samplers' md5-threshold
    rule, but here the threshold DERIVES from corpus counts, so the
    whole arithmetic chain is built from exactly-rounded IEEE ops
    (sqrt / div / mul / least) evaluated in a pinned order — the
    normalizer folds sqrt(n_i) in ascending source order — making
    rate_i bit-identical across engines and partitionings. alpha=0.5
    (T=2, the most common setting) uses sqrt, which IEEE-754 rounds
    correctly on every engine; other alphas go through pow(), which is
    engine-faithful but not oracle-pinned (documented, like the
    surprisal columns).

    Scale shape: one map-side-combined count by source (|sources|
    rows), the weight math on that tiny relation, one broadcast join
    of the |sources|-row rate table onto the corpus, one scan filter.
    No driver collect, no per-source sort, nothing quadratic.

    NULL sources participate as their own group but sort FIRST in
    Spark's ascending fold and LAST in DuckDB's default ORDER BY —
    keep null-source rows out of oracle-gated uses (the shipped
    corpora have none)."""
    if not 0.0 <= target_frac <= 1.0:
        raise ValueError(f"target_frac must be in [0, 1], got {target_frac}")
    if alpha < 0.0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if "rate" in df.columns:
        raise ValueError(
            "temperature_mix: input already has a 'rate' column — the "
            "broadcast rate join would be ambiguous; rename it first"
        )
    w_expr = (
        "sqrt(CAST(x.cnt AS DOUBLE))"
        if alpha == 0.5
        else f"power(CAST(x.cnt AS DOUBLE), CAST('{float(alpha)!r}' AS DOUBLE))"
    )
    # weight_col (e.g. a token count): source mass n_i is an exact
    # integer SUM of weights rather than a row count — the "sample by
    # token share" form mT5 actually uses. Selection stays per-doc:
    # rates say WHAT FRACTION OF DOCS each source keeps so that doc
    # mass tracks target_frac of weighted mass.
    mass = (
        F.count(F.lit(1)).alias("cnt")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long")).alias("cnt")
    )
    counts = df.groupBy(source_col).agg(mass)
    totals = counts.agg(
        F.sum("cnt").alias("n_total"),
        F.expr(
            f"aggregate(sort_array(collect_list(struct({source_col} AS src, "
            f"cnt))), CAST(0 AS DOUBLE), (acc, x) -> acc + {w_expr})"
        ).alias("wsum"),
        F.sort_array(
            F.collect_list(F.struct(F.col(source_col).alias("src"), "cnt"))
        ).alias("srcs"),
    )
    t_lit = f"CAST('{float(target_frac)!r}' AS DOUBLE)"
    rates = totals.select(
        F.explode("srcs").alias("x"), "n_total", "wsum"
    ).select(
        F.col("x.src").alias(source_col),
        # zero-mass sources (every doc weighs 0) get rate 0, NOT 1:
        # the unguarded 0/0 makes the rate NaN/NULL and Spark's least()
        # skips non-values, silently keeping the whole junk source
        F.expr(
            f"CASE WHEN x.cnt <= 0 THEN CAST(0.0 AS DOUBLE) ELSE "
            f"least(CAST(1.0 AS DOUBLE), {t_lit} * CAST(n_total AS DOUBLE)"
            f" * ({w_expr} / wsum) / CAST(x.cnt AS DOUBLE)) END"
        ).alias("rate"),
    )
    h_int = F.conv(_hash_prefix(id_col, salt + ":"), 16, 10).cast("bigint")
    thr = F.expr(f"CAST(floor(rate * {float(_SPACE)!r}D) AS BIGINT)")
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(h_int < thr)
        .select(F.col(id_col), F.col(source_col), F.col("rate"))
    )
