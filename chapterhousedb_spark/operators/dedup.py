"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All candidate generation is shuffle-based (explode -> groupBy/join on
bucket keys); nothing collects to the driver, so each operator scales to
arbitrarily many documents given executors. Hashing uses Spark's
built-in xxhash64 (JVM, codegen) — no Python in the hot path.

Standard construction (Broder MinHash, Charikar SimHash — public
algorithms).

Performance note — why everything is explode/aggregate-shaped: deriving
shingles as per-row array columns and folding over them with nested
higher-order lambdas looks natural, but Catalyst's CollapseProject
inlines single-use projection aliases into consumer expressions — when
the consumer is a lambda body, the inlined expression (normalize
regexp, tokenizer, shingle builder) re-evaluates once per array element
per seed (measured 10-60x slowdowns). Generate (explode) and Aggregate
are optimizer barriers: the expensive column is computed once per input
row, postings flow through map-side partial aggregation, and the
shuffle carries only (id, hash) pairs. This is also the shape that
scales: no giant per-row arrays, partial agg before every shuffle.
"""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


# persisted self-join intermediates not yet released (see
# release_self_join_caches) — the pair DataFrames are returned lazily,
# so the operator itself can never know when it is safe to unpersist.
# Keyed per SparkSession: Engine.submit runs jobs on a
# ThreadPoolExecutor, and with a flat global list a release from one
# engine/session could unpersist another session's intermediate
# mid-query. NOTE the weak keying is only a safety net for sessions
# that somehow vanish without their DataFrames: a tracked DataFrame
# strongly references its session, so a session with live cache
# entries is pinned until release_self_join_caches(spark) (or
# Engine.close on an engine that OWNS the session) drops them —
# releasing is the caller's job, not the GC's.
_SELF_JOIN_CACHES: "weakref.WeakKeyDictionary[SparkSession, list[DataFrame]]" = (
    weakref.WeakKeyDictionary()
)
_CACHES_LOCK = threading.Lock()


def _persist_for_self_join(df: DataFrame, persist: bool) -> DataFrame:
    """Self-joins consume the same subplan twice and Catalyst does NOT
    reuse the exchange across the two sides (verified: two FileScans,
    no ReusedExchange) — without materialization the whole upstream
    pipeline (text scan + normalize + shingle explode + signatures)
    runs twice. Persist the most COMPACT intermediate (signatures /
    fingerprints, not the banded/exploded form): at 1e9 docs minhash
    sigs are ~512 GB cluster-wide vs re-shingling 100 TB of text twice;
    MEMORY_AND_DISK spills instead of failing. At small scale the cache
    write roughly cancels the recompute saving — the default targets
    the large-corpus regime; pass persist=False for one-shot small
    jobs.

    The handle is tracked; call release_self_join_caches() once the
    pair output is materialized (written/consumed) so long-lived
    sessions don't accumulate executor storage."""
    if not persist:
        return df
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    with _CACHES_LOCK:
        _SELF_JOIN_CACHES.setdefault(df.sparkSession, []).append(df)
    return df


def release_self_join_caches(spark: SparkSession | None = None) -> int:
    """Unpersist tracked self-join intermediates (dedup + similarity
    blocking caches); returns how many were released. Call after
    materializing pair outputs — the streaming-agg twin of cluster.py's
    in-operator sym.unpersist(), which the lazily-returned pair
    DataFrames cannot do for themselves.

    With `spark` given, releases only that session's caches (what
    Engine.close does), leaving concurrent engines on other sessions
    untouched; None releases every session's (single-session scripts,
    bench.py)."""
    with _CACHES_LOCK:
        if spark is not None:
            dfs = _SELF_JOIN_CACHES.pop(spark, [])
        else:
            dfs = [d for lst in _SELF_JOIN_CACHES.values() for d in lst]
            _SELF_JOIN_CACHES.clear()
    n = 0
    for df in dfs:
        df.unpersist()
        n += 1
    return n


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for dedup: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def split_words(col: Column | str) -> Column:
    """Non-empty words of the normalized text, in order."""
    return F.filter(
        F.split(normalize_text(col), " "), lambda w: w != ""
    )


def word_ngrams(words: Column, n: int) -> Column:
    """Space-joined length-`n` windows over a word array, in text
    order; empty array when the text has fewer than n words (guarded
    explicitly — Spark `sequence(1, 0)` counts DOWN). The shared gram
    recipe the DSIR / source-overlap oracles replay character-exactly
    (round-12 review fix: it was duplicated per module).

    NB: the gram lambda must stay SINGLE-parameter — a second
    (default) parameter flips pyspark's transform() into its
    (element, index) two-arg form and the index silently replaces the
    closed-over value."""

    def _gram(i):
        return F.array_join(F.slice(words, i, n), " ")

    return F.when(
        F.size(words) >= n,
        F.transform(F.sequence(F.lit(1), F.size(words) - (n - 1)), _gram),
    ).otherwise(F.array().cast("array<string>"))


# ------------------------------------------------------------------ exact


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = True
) -> DataFrame:
    """Exact dedup: one canonical (min id) row per distinct text.

    Returns (canonical id, copies). Hash-groupBy with map-side partial
    aggregation; the shuffle key is the text hash, not the text, so
    100 TB of text shuffles only ids + 8-byte keys after the partial.
    """
    c = normalize_text(text_col) if normalized else F.col(text_col)
    return (
        df.select(F.col(id_col), F.xxhash64(c).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("copies"),
        )
        .select(id_col, "copies")
    )


# ------------------------------------------------------- shingle postings


def char_shingle_posts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """(id, shingle) postings: character k-grams of the normalized text.

    May contain duplicate shingles per doc (harmless for min-hashing;
    de-dup with dropDuplicates where set semantics matter). The
    normalize regexp runs once per document — the Generate node is the
    barrier that stops Catalyst inlining it per position.
    """
    return (
        df.select(F.col(id_col).alias("id"), normalize_text(text_col).alias("__norm"))
        .select(
            "id",
            "__norm",
            F.explode(
                F.expr(f"sequence(1, greatest(1, length(__norm) - {k - 1}))")
            ).alias("i"),
        )
        .select("id", F.expr(f"substring(__norm, i, {k})").alias("shingle"))
    )


def word_shingle_posts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, gram) postings: word k-grams (k consecutive tokens).

    Only FULL k-grams are emitted: documents with fewer than k tokens
    produce no postings (they can never near-dup-pair on k-grams), which
    also matches how an ANSI oracle naturally expresses the gram set.
    """
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.split(normalize_text(text_col), " ").alias("__toks"),
        )
        .select(
            "id",
            "__toks",
            F.explode(
                F.expr(f"sequence(1, greatest(1, size(__toks) - {k - 1}))")
            ).alias("i"),
        )
        .filter(F.expr(f"size(__toks) >= i + {k - 1}"))
        .select("id", F.expr(f"array_join(slice(__toks, i, {k}), ' ')").alias("shingle"))
    )


# ----------------------------------------------------------------- minhash


def _check_bands(num_hashes: int, bands: int) -> None:
    """Banding requires bands | num_hashes: a ragged split would
    silently drop the trailing signature components from every band
    (hurting recall) while the jaccard estimate still divides by
    num_hashes — biasing the estimate low with no visible symptom."""
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes ({num_hashes})"
        )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
    with_shingle_set: bool = False,
) -> DataFrame:
    """(id, sig[, shingles]): MinHash signature of the char-shingle set.

    sig[s] = min over shingles of a seeded hash; the seeded family is
    xxhash64(xxhash64(shingle), seed), so the base hash is computed once
    per posting and each seed adds one 8-byte hash. Aggregation is
    min() per seed — map-side partial, so the shuffle carries one
    64-long vector per doc per map partition, independent of doc size.
    """
    posts = char_shingle_posts(df, text_col, id_col, shingle_k).withColumn(
        "h0", F.xxhash64("shingle")
    )
    aggs = [
        F.min(F.xxhash64(F.col("h0"), F.lit(s))).alias(f"__m{s}")
        for s in range(num_hashes)
    ]
    if with_shingle_set:
        aggs.append(F.collect_set("shingle").alias("shingles"))
    agged = posts.groupBy("id").agg(*aggs)
    keep = ["id", "shingles"] if with_shingle_set else ["id"]
    return agged.select(
        *keep, F.array(*[F.col(f"__m{s}") for s in range(num_hashes)]).alias("sig")
    ).withColumnRenamed("id", id_col)


def _band_signatures(sigs: DataFrame, id_col: str, payload: list, bands: int, rows: int) -> DataFrame:
    """Explode a signature relation into LSH band keys: one row per
    (doc, band) carrying xxhash64 of that band's signature slice."""
    return sigs.select(
        F.col(id_col),
        *payload,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> named_struct('band', b, 'h', xxhash64(slice(sig, b * {rows} + 1, {rows}))))"
            )
        ).alias("bh"),
    ).select(id_col, *payload, F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    exact_verify: bool = False,
    persist: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    LSH banding: num_hashes/bands rows per band; docs sharing any band
    hash become candidates (one explode + one equi-join shuffle keyed on
    the band hash — never an all-pairs comparison).

    Verification (default): the signature-estimated Jaccard — fraction
    of agreeing minhash components, an unbiased estimator with stderr
    ~1/sqrt(num_hashes). Candidates then carry only 64 longs per doc
    through the join. exact_verify=True instead carries exact shingle
    sets (collect_set + array_intersect) — bit-exact Jaccard at
    bands x text-size shuffle amplification; measured ~5x slower.

    At 100 TB: band-join keys grow with the corpus so the shuffle stays
    balanced; a hot band (a huge cluster of near-identical docs) should
    be bounded by running exact_dedup upstream first.
    """
    _check_bands(num_hashes, bands)
    rows = num_hashes // bands
    sigs = minhash_signature(
        df, text_col, id_col, num_hashes, shingle_k, with_shingle_set=exact_verify
    )
    # persist the compact per-doc signatures; the banding explode is
    # cheap to recompute per join side from the cached sigs
    sigs = _persist_for_self_join(sigs, persist)
    payload = ["shingles"] if exact_verify else ["sig"]
    banded = _band_signatures(sigs, id_col, payload, bands, rows)

    a = banded.alias("a")
    b = banded.alias("b")
    pcol = payload[0]
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{pcol}").alias("pa"),
            F.col(f"b.{pcol}").alias("pb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if exact_verify:
        inter = F.size(F.array_intersect("pa", "pb"))
        union = F.size(F.array_union("pa", "pb"))
        jaccard = inter / union
    else:
        jaccard = (
            F.expr(
                "size(filter(zip_with(pa, pb, (x, y) -> x = y), m -> m))"
            )
            / F.lit(num_hashes)
        )
    return (
        cands.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Word n-gram Jaccard similarity pairs via an inverted index.

    Instead of a cross join, explode each doc's distinct n-grams and
    equi-join on the n-gram (inverted-index candidate generation):
    co-occurrence counts give |A ∩ B| directly and |A ∪ B| follows from
    per-doc set sizes.

    max_doc_freq is the scale guard: a gram appearing in d documents
    contributes d^2/2 candidate pairs to the self-join, so one stop-gram
    in 1e7 docs is ~5e13 pairs. With a cap, grams whose document
    frequency exceeds it are dropped from candidate generation AND from
    the per-doc set sizes — the result is exact Jaccard over the
    df-filtered gram universe (standard prefix/df filtering). Pairs
    sharing ONLY ultra-common grams are intentionally not near-dups.
    With the cap the join cost is bounded by postings * max_doc_freq.
    None = exact, unbounded (small corpora / post-LSH verify only).
    """
    grams = word_shingle_posts(df, text_col, id_col, ngram_k).dropDuplicates(
        ["id", "shingle"]
    )
    if max_doc_freq is not None:
        rare = (
            grams.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        # co-partitioned on the gram (same key as the groupBy) — no
        # extra shuffle of the postings beyond the df computation
        grams = grams.join(rare, "shingle").select("id", "shingle")
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    posts = grams.join(sizes, "id").select("id", "n_grams", F.col("shingle").alias("g"))
    posts = _persist_for_self_join(posts, persist)
    a = posts.alias("a")
    b = posts.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_grams").alias("na"),
            F.col("b.n_grams").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard", F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_dup_pairs_cross(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """CROSS-corpus near-dup: which `batch` documents near-duplicate
    something already in `corpus` — the incremental-ingest shape (a
    crawl batch against a 1e9-doc corpus) where the self-join form
    would wastefully re-pair the corpus against itself on every batch.
    Returns (batch_id, corpus_id, jaccard) with jaccard >= threshold;
    ids live in separate namespaces, so no id_a < id_b ordering is
    imposed (a batch doc CAN legally pair with any corpus doc).

    Same LSH construction as minhash_near_dup_pairs (identical hash
    family, so a doc's signature is byte-identical whichever side it
    sits on), but the band join is bipartite: candidates are
    batch x corpus band collisions only — never corpus x corpus. At
    100 TB the batch side is orders of magnitude smaller, so its banded
    rows broadcast (AQE) and the corpus pays ONE scan + map-side band
    hashing with no shuffle at all; at worst the exchange is bounded by
    the batch. Production composition: run this per micro-batch before
    merge_stream admits survivors into the corpus — and at any real
    corpus size, hand admit_batch a fingerprint_root so the corpus-side
    signatures come from the persisted sidecar
    (minhash_near_dup_pairs_cross_sigs) instead of this full re-scan."""
    b_sigs = minhash_signature(batch, text_col, id_col, num_hashes, shingle_k)
    c_sigs = minhash_signature(corpus, text_col, id_col, num_hashes, shingle_k)
    return minhash_near_dup_pairs_cross_sigs(
        b_sigs,
        c_sigs,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
    )


def minhash_near_dup_pairs_cross_sigs(
    b_sigs: DataFrame,
    c_sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """minhash_near_dup_pairs_cross from PRECOMPUTED signature frames
    ((id, sig) as minhash_signature emits) — the fingerprint-sidecar
    path (VERDICT r13 #1): the corpus side reads a persisted signature
    table maintained at write time by ingest.admit_batch, so each
    micro-batch costs one batch-side signature pass and a bipartite
    band join, never a corpus re-scan. Returns (batch_id, corpus_id,
    jaccard) with jaccard >= threshold, identical to the from-text
    form on the same inputs (the from-text form delegates here)."""
    _check_bands(num_hashes, bands)
    rows = num_hashes // bands
    b_band = _band_signatures(b_sigs, id_col, ["sig"], bands, rows).alias("b")
    c_band = _band_signatures(c_sigs, id_col, ["sig"], bands, rows).alias("c")
    cands = (
        b_band.join(
            c_band,
            (F.col("b.band") == F.col("c.band")) & (F.col("b.h") == F.col("c.h")),
        )
        .select(
            F.col(f"b.{id_col}").alias("batch_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
            F.col("b.sig").alias("pa"),
            F.col("c.sig").alias("pb"),
        )
        .dropDuplicates(["batch_id", "corpus_id"])
    )
    jaccard = (
        F.expr("size(filter(zip_with(pa, pb, (x, y) -> x = y), m -> m))")
        / F.lit(num_hashes)
    )
    return (
        cands.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )


# ----------------------------------------------------------------- simhash


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(id, simhash): Charikar SimHash over word tokens
    (frequency-weighted: repeated tokens vote once per occurrence).

    Token postings explode once; per-bit ±1 votes aggregate with
    map-side partial sums (64 small long counters per doc); bits pack
    into one signed 64-bit fingerprint at the end.
    """
    posts = (
        df.select(
            F.col(id_col).alias("id"),
            F.split(normalize_text(text_col), " ").alias("__toks"),
        )
        .select("id", F.explode("__toks").alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
    )
    votes = posts.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.expr(f"((h >> {i}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"__b{i}")
            for i in range(bits)
        ]
    )
    packed = votes.select(
        "id",
        F.array(*[F.col(f"__b{i}") for i in range(bits)]).alias("__bits"),
    ).select(
        "id",
        F.expr(
            "aggregate(sequence(0, size(__bits) - 1), 0L, "
            "(acc, i) -> acc + CASE WHEN __bits[i] > 0 THEN shiftleft(1L, i) ELSE 0L END)"
        ).alias("simhash"),
    )
    return packed.withColumnRenamed("id", id_col)


def _simhash_block_keys(
    chunks: int, max_hamming: int, hash_col: str = "simhash"
) -> list[Column]:
    """Blocking keys for hamming(<hash_col>) <= max_hamming (Manku et
    al., WWW'07 construction, public algorithm). hash_col is any
    64-bit fingerprint column — text SimHash here, image aHash/dHash
    in operators/multimodal.py (round 13).

    The 64 bits partition into `chunks` blocks (widths as even as
    possible, covering all 64 bits). A pair within the hamming budget
    differs in at most max_hamming blocks, so it AGREES on at least
    `agree = chunks - max_hamming` blocks — and therefore collides on
    at least one of the C(chunks, agree) block-index combinations. Each
    combination becomes one xxhash64(combo_id, block values...) key.

    Requires chunks > max_hamming: with chunks <= max_hamming a pair
    inside the hamming budget can differ in EVERY block, so no blocking
    key is guaranteed to collide and the pigeonhole recall guarantee is
    void (silently clamping `agree` would hide exactly that).
    """
    import itertools

    if chunks <= max_hamming:
        raise ValueError(
            f"simhash blocking needs chunks > max_hamming for guaranteed "
            f"recall (got chunks={chunks}, max_hamming={max_hamming}); "
            f"raise chunks — e.g. {max_hamming + 1} splits 64 bits into "
            f"blocks a within-budget pair must agree on at least one of"
        )
    agree = chunks - max_hamming
    base, rem = divmod(64, chunks)
    widths = [base + 1 if i < rem else base for i in range(chunks)]
    offsets = [sum(widths[:i]) for i in range(chunks)]
    blocks = [
        F.expr(f"(`{hash_col}` >> {offsets[i]}) & {(1 << widths[i]) - 1}")
        for i in range(chunks)
    ]
    return [
        F.xxhash64(F.lit(ci), *[blocks[j] for j in combo])
        for ci, combo in enumerate(itertools.combinations(range(chunks), agree))
    ]


def hamming_near_dup_pairs(
    fingerprints: DataFrame,
    hash_col: str,
    id_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
    persist: bool = True,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(<hash_col>) <=
    max_hamming over any 64-bit fingerprint column — the shared
    candidate-generation + exact-verify core behind text SimHash
    (simhash_near_dup_pairs) and image aHash/dHash near-dup
    (multimodal.media_near_dup_pairs). Pigeonhole blocking
    (_simhash_block_keys): equi-joins on C(chunks, chunks-max_hamming)
    combination keys, verified exactly with bit_count(xor). Recall is
    GUARANTEED by the pigeonhole argument at any chunks > max_hamming;
    no cross join at any setting. Sizing rule as documented on
    simhash_near_dup_pairs."""
    fp = _persist_for_self_join(
        fingerprints.select(id_col, hash_col), persist
    )
    keys = _simhash_block_keys(chunks, max_hamming, hash_col)
    blocked = fp.select(
        F.col(id_col),
        hash_col,
        F.explode(F.array(*keys)).alias("bk"),
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def hamming_near_dup_pairs_cross(
    batch_fp: DataFrame,
    corpus_fp: DataFrame,
    hash_col: str,
    id_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Bipartite twin of hamming_near_dup_pairs over any 64-bit
    fingerprint column: (batch_id, corpus_id, hamming) for batch rows
    within `max_hamming` bits of something in the corpus — the
    candidate core behind the simhash, image-aHash/dHash and
    audio-envelope ingest admission gates. The block join is batch ><
    corpus only; the corpus is never re-paired against itself."""
    keys = _simhash_block_keys(chunks, max_hamming, hash_col)

    def _blocked(fp):
        return fp.select(
            F.col(id_col),
            hash_col,
            F.explode(F.array(*keys)).alias("bk"),
        )

    a = _blocked(batch_fp).alias("a")
    b = _blocked(corpus_fp).alias("b")
    return (
        a.join(b, F.col("a.bk") == F.col("b.bk"))
        .select(
            F.col(f"a.{id_col}").alias("batch_id"),
            F.col(f"b.{id_col}").alias("corpus_id"),
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
            ).alias("hamming"),
        )
        .dropDuplicates(["batch_id", "corpus_id"])
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
    persist: bool = True,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole blocking, scale-parameterized by `chunks`: candidates
    come from equi-joins on C(chunks, chunks-max_hamming) combination
    keys (_simhash_block_keys), verified exactly with bit_count(xor).
    No cross join at any setting.

    Sizing rule: each key carries ~(chunks-max_hamming) * 64/chunks
    bits, so expected same-key bucket size is n / 2^(that many bits).
    chunks=4 (16-bit single-block keys, explode x4) is right up to
    ~1e7 docs; at 1e9+ use chunks=7..8 (e.g. chunks=8, max_hamming=3
    -> C(8,5)=56 keys of ~40 bits, explode x56 but buckets stay tiny).
    Raising chunks trades shuffle volume for per-bucket quadratic cost;
    recall is guaranteed either way by the pigeonhole argument.
    """
    sh = simhash(df, text_col, id_col)
    # hamming_near_dup_pairs persists the compact (id, simhash)
    # fingerprints — 16 bytes/doc — not the keys-exploded form
    # (x C(chunks, agree) larger)
    return hamming_near_dup_pairs(
        sh, "simhash", id_col, max_hamming, chunks, persist
    )


def simhash_near_dup_pairs_cross(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Bipartite SimHash near-dup: which `batch` documents sit within
    `max_hamming` bits of something in `corpus` — the SimHash twin of
    minhash_near_dup_pairs_cross for the incremental-ingest gate.
    Returns (batch_id, corpus_id, hamming). Same fingerprints and Manku
    pigeonhole blocking as the self-join form (a doc's simhash is
    byte-identical on either side); the block join is batch >< corpus
    only, so each crawl batch costs one corpus scan + map-side
    fingerprint/key computation, with the small batch side broadcast —
    the corpus is never re-paired against itself. For incremental
    ingest at scale, persist the (id, simhash) fingerprints in a
    sidecar (ingest.fingerprint_kit('simhash')) and feed
    hamming_near_dup_pairs_cross directly instead of re-hashing the
    corpus per batch."""
    b_sh = simhash(batch, text_col, id_col)
    c_sh = simhash(corpus, text_col, id_col)
    return hamming_near_dup_pairs_cross(
        b_sh, c_sh, "simhash", id_col, max_hamming, chunks
    )


def contamination_pairs(
    corpus: DataFrame,
    probe: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_k: int = 8,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Cross-corpus contamination detection: (corpus_id, probe_id,
    containment) where containment is the fraction of the probe
    document's distinct word k-grams that appear in the corpus
    document. The decontamination step of a training pipeline — find
    benchmark/eval documents leaked into the training corpus — uses
    exactly this metric (containment, not Jaccard: a short benchmark
    item inside a long web page has tiny Jaccard but containment ~1).

    Bipartite inverted-index construction (no self-join, no cross
    join): both sides explode to distinct (id, gram) postings, the join
    key is the gram, co-occurrence counts give the intersection, and
    the probe's posting count is the denominator. Probe docs with
    fewer than k tokens emit no grams and cannot be flagged — report
    them separately if the probe set may contain ultra-short items.

    max_doc_freq caps the CORPUS-side document frequency (a gram in d
    corpus docs contributes d candidates per probe posting). Capped
    grams can no longer attest containment, so with a cap the score is
    a LOWER bound — sound for flagging (no false positives from stop
    grams), never complete. None = exact.
    """
    cg = word_shingle_posts(corpus, text_col, id_col, ngram_k).dropDuplicates(
        ["id", "shingle"]
    ).withColumnRenamed("id", "corpus_id")
    if max_doc_freq is not None:
        rare = (
            cg.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        cg = cg.join(rare, "shingle").select("corpus_id", "shingle")
    pg = word_shingle_posts(probe, text_col, id_col, ngram_k).dropDuplicates(
        ["id", "shingle"]
    ).withColumnRenamed("id", "probe_id")
    psize = pg.groupBy("probe_id").agg(F.count(F.lit(1)).alias("__n_p"))
    inter = (
        cg.join(pg, "shingle")
        .groupBy("corpus_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    return (
        inter.join(psize, "probe_id")
        .select(
            "corpus_id",
            "probe_id",
            (F.col("__i").cast("double") / F.col("__n_p")).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def contamination_short_probes(
    probe: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_k: int = 8,
) -> DataFrame:
    """(probe_id, n_tokens): probe documents too short to emit any
    word k-gram — contamination_pairs structurally cannot flag them
    (they produce zero postings), so a decontamination sweep must
    report them for separate handling (exact-match or shorter-gram
    screening). Pure projection + filter, no shuffle."""
    # split('') yields [''], not [] — guard so blank docs report 0
    n_tokens = F.when(normalize_text(text_col) == "", F.lit(0)).otherwise(
        F.size(F.split(normalize_text(text_col), " "))
    )
    return (
        probe.select(
            F.col(id_col).alias("probe_id"),
            n_tokens.alias("n_tokens"),
        )
        .filter(F.col("n_tokens") < ngram_k)
    )


def duplicate_spans(
    df: DataFrame,
    span_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_doc_freq: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Exact repeated-SPAN detection: maximal token spans whose every
    `span_tokens`-token window occurs in >= min_df window positions
    corpus-wide — substring-level dedup (the span-removal complement of
    doc-level near-dup; cf. Lee et al., "Deduplicating Training Data
    Makes Language Models Better", which removes repeated substrings a
    suffix array finds; here the distributed approximation is exact
    window hashing, the standard shuffle-friendly construction).

    Output: (doc_id, span_start, span_len, n_windows) — 1-based token
    offset of each MAXIMAL duplicated span (adjacent duplicated windows
    merged per doc via the start - row_number() island trick).

    Construction: one window-hash per token position (xxhash64 of the
    space-joined window — group equality stands in for window equality,
    collision odds 2^-64); window df comes from groupBy(whash).count()
    + an inner join back onto the positions. The aggregation has
    MAP-SIDE partial combine, so a hot boilerplate window (one whash in
    millions of docs) reduces to one row per map partition before the
    shuffle — a COUNT OVER (PARTITION BY whash) analytic would instead
    buffer every position of the hot key in a single window task (the
    skew this join-back shape avoids; hot whashes OUTSIDE the df band
    are absent from the join's build side, so their positions stream
    through the join unmatched and AQE can split what remains). The
    join consumes the token-granular explode twice, hence
    _persist_for_self_join on the positions (persist=False for
    one-shot small jobs). Then one per-doc window merges adjacent
    duplicated positions into maximal islands. Shuffles carry (8-byte
    hash, id, pos) per token position — token-granular, which IS the
    inherent cost of substring-level dedup; at 100 TB run it AFTER
    doc-level dedup on the surviving corpus, and bound hot boilerplate
    with max_doc_freq (min_df/max_doc_freq are the df band of interest
    — e.g. cap at 1e4 to drop license boilerplate that a targeted rule
    handles better).
    """
    from pyspark.sql.window import Window

    toks = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    wins = (
        df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
        .filter(F.size("__toks") >= span_tokens)
        .select(
            "id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(__toks) - {span_tokens - 1}), "
                    f"i -> xxhash64(array_join(slice(__toks, i, {span_tokens}), ' ')))"
                )
            ).alias("__p", "whash"),
        )
        .select("id", (F.col("__p") + 1).alias("start"), "whash")
    )
    wins = _persist_for_self_join(wins, persist)
    counts = wins.groupBy("whash").agg(F.count(F.lit(1)).alias("w_df")).filter(
        F.col("w_df") >= min_df
    )
    if max_doc_freq is not None:
        counts = counts.filter(F.col("w_df") <= max_doc_freq)
    dup = wins.join(counts, "whash").select("id", "start", "w_df")
    w = Window.partitionBy("id").orderBy("start")
    islands = dup.withColumn("__grp", F.col("start") - F.row_number().over(w))
    return (
        islands.groupBy(F.col("id").alias(id_col), "__grp")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") - F.min("start") + F.lit(span_tokens)).alias(
                "span_len"
            ),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(id_col, "span_start", "span_len", "n_windows")
    )


def remove_duplicate_spans(
    df: DataFrame,
    span_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_doc_freq: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Substring-level dedup REWRITE — the removal half of Lee et al.'s
    "Deduplicating Training Data Makes Language Models Better":
    duplicate_spans only REPORTS repeated spans; this drops them from
    the corpus. Every token covered by a `span_tokens`-token window
    that occurs >= min_df times corpus-wide is removed from every doc
    EXCEPT the window's keeper (the smallest doc_id containing it), so
    exactly one copy of each duplicated region survives and the rule
    is greedy/deterministic/SQL-replayable. Repeats wholly inside one
    doc keep that doc as their own keeper and survive (self-repetition
    is text_repetition's business, not corpus dedup's).

    Returns (id_col, clean_text, n_kept, n_removed) for EVERY input
    row — clean_text rebuilds from the kept tokens with single spaces
    (token-level surgery cannot preserve original whitespace; the
    declared-query oracle replays the identical reconstruction).

    At 100 TB: the window machinery is duplicate_spans' (token-granular
    whash explode, map-side-combined df counts, join-back — run it
    AFTER doc-level dedup, band hot boilerplate with max_doc_freq);
    the rewrite adds one explode of DUPLICATED ranges only (bounded by
    the duplicate volume), a (doc, pos)-keyed anti join, and one
    per-doc rebuild aggregate. No driver collects."""
    toks = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    # consumed three times (windows, token explode, totals)
    base = _persist_for_self_join(base, persist)
    wins = (
        base.filter(F.size("__toks") >= span_tokens)
        .select(
            "id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(__toks) - {span_tokens - 1}), "
                    f"i -> xxhash64(array_join(slice(__toks, i, {span_tokens}), ' ')))"
                )
            ).alias("__p", "whash"),
        )
        .select("id", (F.col("__p") + 1).alias("start"), "whash")
    )
    wdf = wins.groupBy("whash").agg(
        F.count(F.lit(1)).alias("w_df"), F.min("id").alias("keeper")
    ).filter(F.col("w_df") >= min_df)
    if max_doc_freq is not None:
        wdf = wdf.filter(F.col("w_df") <= max_doc_freq)
    drops = (
        wins.join(wdf, "whash")
        .filter(F.col("id") != F.col("keeper"))
        .select(
            "id",
            F.explode(
                F.sequence(
                    F.col("start"), F.col("start") + F.lit(span_tokens - 1)
                )
            ).alias("pos"),
        )
        .distinct()
    )
    toks_pos = base.select(
        "id", F.posexplode("__toks").alias("__p", "tok")
    ).select("id", (F.col("__p") + 1).alias("pos"), "tok")
    kept = toks_pos.join(drops, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = base.select("id", F.size("__toks").alias("n_toks"))
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_toks") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def pair_features(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Verification features for candidate pairs — the reranker input
    a two-stage dedup pipeline wants between cheap LSH candidate
    generation and an expensive final judgment: exact token-set
    overlap statistics per pair, all integer counts + double divisions
    (deterministic, oracle-replayable). Returns per (id_a, id_b):

      n_tok_a / n_tok_b   distinct normalized-token counts
      n_common            |tokens_a intersect tokens_b|
      jaccard_tokens      n_common / |union|
      containment         n_common / min(n_tok_a, n_tok_b)
      len_ratio           shorter/longer text length in chars

    Scale shape: the docs side reduces to (id, sorted distinct token
    array) ONCE (map-side), then the pair relation joins it twice on
    id — candidate pairs are bounded by the upstream generator's
    banding, so the array payload amplification is |pairs| x avg doc
    vocab, not corpus-squared. array_intersect is JVM-side; no Python
    anywhere."""
    toks = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.array_sort(
                F.array_distinct(
                    F.filter(
                        F.split(normalize_text(text_col), " "),
                        lambda t: t != "",
                    )
                )
            ).alias("__toks"),
            F.length(text_col).alias("__len"),
        )
    )
    a = toks.select(
        F.col("__id").alias("__ida"),
        F.col("__toks").alias("__ta"),
        F.col("__len").alias("__la"),
    )
    b = toks.select(
        F.col("__id").alias("__idb"),
        F.col("__toks").alias("__tb"),
        F.col("__len").alias("__lb"),
    )
    j = (
        pairs.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b"))
        .join(a, F.col("id_a") == F.col("__ida"))
        .join(b, F.col("id_b") == F.col("__idb"))
    )
    na, nb = F.size("__ta"), F.size("__tb")
    nc = F.size(F.array_intersect("__ta", "__tb"))
    union = na + nb - nc
    return j.select(
        "id_a",
        "id_b",
        na.cast("int").alias("n_tok_a"),
        nb.cast("int").alias("n_tok_b"),
        nc.cast("int").alias("n_common"),
        (nc.cast("double") / F.greatest(union, F.lit(1))).alias(
            "jaccard_tokens"
        ),
        (nc.cast("double") / F.greatest(F.least(na, nb), F.lit(1))).alias(
            "containment"
        ),
        (
            F.least(F.col("__la"), F.col("__lb")).cast("double")
            / F.greatest(F.greatest(F.col("__la"), F.col("__lb")), F.lit(1))
        ).alias("len_ratio"),
    )


def two_stage_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    candidates: DataFrame | None = None,
    persist: bool = True,
) -> DataFrame:
    """Two-stage near-duplicate detection (the gated rerank pipeline,
    VERDICT r7 #5): cheap recall-oriented LSH candidate generation,
    then an EXACT token-set rerank via pair_features, then a final
    threshold on exact jaccard_tokens. Returns confirmed pairs with
    their verification features (id_a, id_b, n_tok_a, n_tok_b,
    n_common, jaccard_tokens, containment, len_ratio).

    Stage 1 defaults to minhash LSH banding with estimator threshold
    0 (every banded collision survives to the rerank — banding itself
    is the precision knob; b=16 r=4 puts the S-curve midpoint at
    jaccard ~0.5, cheap to rerank). Pass `candidates` to plug any
    pair generator (simhash blocks, an md5-portable twin for oracle
    gating, an embedding blocker) — anything with (id_a, id_b).

    Scale shape: stage 1 is the audited banded equi-join (never
    all-pairs); stage 2 joins the candidate relation onto the
    (id, sorted distinct token array) reduction of the corpus twice
    by id, so the rerank cost is |candidates| x avg-vocab — output-
    linear (SCALE.md 10x probe), independent of corpus^2. The exact
    rerank de-noises the minhash estimator (stderr ~1/sqrt(num_hashes))
    so the FINAL threshold is exact set arithmetic, not an estimate."""
    if candidates is None:
        candidates = minhash_near_dup_pairs(
            docs,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            threshold=0.0,
            persist=persist,
        )
    feats = pair_features(
        candidates, docs, id_col=id_col, text_col=text_col
    )
    return feats.filter(F.col("jaccard_tokens") >= jaccard_threshold)


# --------------------------------------------------------- line dedup


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    keep: str = "first",
) -> DataFrame:
    """Corpus-GLOBAL line-level deduplication — the RefinedWeb/C4
    crawl stage that strips boilerplate (nav bars, cookie banners,
    copyright footers) by removing every LINE whose exact text repeats
    across the corpus, while document-level dedup above it only sees
    whole-page identity. Lines are `text_col` split on newline.

    Policy per line occurring `cnt` times corpus-wide (cnt counts
    EXACT line text; lines that are empty after trim are structure,
    not content — they never count and are always kept):

      keep="first": occurrences survive iff cnt < min_count OR the
        occurrence is the corpus-first one (min (id, pos)) — every
        distinct line keeps exactly one copy (RefinedWeb's rule);
      keep="none":  lines with cnt >= min_count are removed
        EVERYWHERE (C4's stricter span rule at line granularity).

    Returns one row per input doc: (id_col, text [kept lines joined
    by newline, original order], n_lines, n_removed). Docs whose
    every line is removed stay present with text ''. NULL text is
    treated as '' (one empty always-kept line). Metadata columns are
    dropped — join back on id_col.

    At 100 TB: one narrow posexplode, one groupBy on the line text
    (map-side combine collapses the Zipf-heavy boilerplate before the
    shuffle), one equi-join back on the line (hot boilerplate keys
    are exactly what AQE skew-join splits — a window over
    partitionBy(line) would put a 100M-copy cookie banner in ONE
    task, which is why this is groupBy+join, not a window), and one
    groupBy(id) whose collect_list state is bounded by a single
    document's line count."""
    if keep not in ("first", "none"):
        raise ValueError(f"line_dedup: keep must be 'first' or 'none', got {keep!r}")
    if min_count < 2:
        raise ValueError(f"line_dedup: min_count must be >= 2, got {min_count}")
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    eligible = F.trim(F.col("line")) != ""
    counts = (
        lines.filter(eligible)
        .groupBy("line")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.struct("id", "pos")).alias("keeper"),
        )
    )
    joined = lines.join(counts, "line", "left")
    kept = F.col("cnt").isNull() | (F.col("cnt") < min_count)
    if keep == "first":
        kept = kept | (
            (F.col("keeper.id") == F.col("id"))
            & (F.col("keeper.pos") == F.col("pos"))
        )
    flagged = joined.select("id", "pos", "line", kept.alias("kept"))
    return (
        flagged.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"), F.struct("pos", "line")
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("kept"), 0).otherwise(1)).alias("n_removed"),
        )
        .select(
            F.col("id").alias(id_col), "text", "n_lines", "n_removed"
        )
    )


# ----------------------------------------------------------- lsh tuner


def lsh_tune(
    threshold: float,
    max_hashes: int = 256,
    fp_weight: float = 1.0,
    fn_weight: float = 1.0,
) -> dict:
    """Pick MinHash-LSH banding parameters for a target Jaccard
    threshold t — the standard S-curve analysis (Mining of Massive
    Datasets §3.4; the same derivation datasketch ships): with b bands
    of r rows each, a pair at similarity s collides with probability
    p(s) = 1 - (1 - s^r)^b. Over every (b, r) with b*r <= max_hashes
    this minimizes

        fp_weight * integral_0^t p(s) ds            (false positives)
      + fn_weight * integral_t^1 (1 - p(s)) ds      (false negatives)

    by 1000-point midpoint quadrature — vectorized numpy with the
    per-rows power hoisted out of the bands loop (ADVICE r12), a few
    milliseconds driver-side, no Spark. Returns {num_hashes, bands, rows,
    threshold_midpoint, fp_area, fn_area, cost}: threshold_midpoint =
    (1/b)^(1/r), the similarity where p = 1 - (1 - 1/b)^b ~ 0.63,
    i.e. the S-curve's rise point. Weight fp_weight up when the
    downstream verify is expensive (candidate pairs cost compute);
    weight fn_weight up when recall is the contract (dedup
    completeness). Driver-side helper for choosing
    minhash_near_dup_pairs(num_hashes=, bands=) — it never touches
    data, so there is nothing to gate."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"lsh_tune: threshold must be in (0, 1), got {threshold}")
    if max_hashes < 2:
        raise ValueError(f"lsh_tune: max_hashes must be >= 2, got {max_hashes}")
    if fp_weight < 0 or fn_weight < 0 or fp_weight + fn_weight == 0:
        raise ValueError("lsh_tune: weights must be >= 0 and not both zero")
    import numpy as np

    n_pts = 1000
    best = None
    # midpoint grids on [0, t] and [t, 1]
    ks = (np.arange(n_pts) + 0.5) / n_pts
    s_lo = threshold * ks
    s_hi = threshold + (1.0 - threshold) * ks
    for rows in range(1, max_hashes + 1):
        # hoist the pow out of the bands loop (ADVICE r12): q = 1-s^r
        # is shared by every b, and (1-s^r)^b accumulates by one
        # elementwise multiply per band step — ~3M pow calls collapse
        # to ~3M vectorized multiplies (<10 ms at max_hashes=256)
        q_lo = 1.0 - s_lo**rows
        q_hi = 1.0 - s_hi**rows
        qb_lo = np.ones(n_pts)
        qb_hi = np.ones(n_pts)
        for bands in range(1, max_hashes // rows + 1):
            qb_lo *= q_lo
            qb_hi *= q_hi
            fp = float((1.0 - qb_lo).sum()) * threshold / n_pts
            fn = float(qb_hi.sum()) * (1.0 - threshold) / n_pts
            cost = fp_weight * fp + fn_weight * fn
            cand = {
                "num_hashes": bands * rows,
                "bands": bands,
                "rows": rows,
                "threshold_midpoint": (1.0 / bands) ** (1.0 / rows),
                "fp_area": fp,
                "fn_area": fn,
                "cost": cost,
            }
            # strict < : among equal-cost configs keep the FIRST
            # (smallest rows, then smallest bands) = cheapest signature
            if best is None or cost < best["cost"]:
                best = cand
    return best
