"""Dedup operator tests on constructed corpora with planted duplicates
(the testdata documents table has no true dups, so recall/precision are
asserted here; the workload entries then run the same operators on
testdata)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the birds sing in the old oak tree near "
    "the river that flows past the quiet village every single morning"
)


@pytest.fixture(scope="module")
def corpus(spark):
    """Docs 0/1: identical (mod case/space). 2: near-dup of 0 (one word
    changed). 3: half-overlapping. 4/5: unrelated."""
    rows = [
        (0, BASE),
        (1, BASE.upper().replace(" ", "  ")),
        (2, BASE.replace("lazy", "sleepy")),
        (3, BASE[: len(BASE) // 2] + " completely different ending about ships and storms at sea"),
        (4, "entirely unrelated text about numerical linear algebra and matrix factorizations on gpus"),
        (5, "another document on cooking pasta with garlic olive oil and fresh basil leaves tonight"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_collapses_normalized_duplicates(corpus):
    out = exact_dedup(corpus).orderBy("doc_id").collect()
    by_id = {r["doc_id"]: r["copies"] for r in out}
    assert by_id[0] == 2  # doc 1 collapsed into doc 0
    assert 1 not in by_id
    assert by_id[2] == 1 and by_id[4] == 1


def test_minhash_signature_shape_and_identity(corpus):
    sig = minhash_signature(corpus, num_hashes=32)
    rows = {r["doc_id"]: r["sig"] for r in sig.collect()}
    assert len(rows[0]) == 32
    assert rows[0] == rows[1]  # normalized-identical docs -> same signature
    assert rows[0] != rows[4]


def test_minhash_near_dup_pairs_recall_and_precision(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(corpus, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.7  # one-word edit (sig estimate)
    assert (1, 2) in pairs
    # unrelated docs never pair
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_exact_verify_returns_true_jaccard(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(
            corpus, threshold=0.5, exact_verify=True
        ).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.85 < pairs[(0, 2)] < 1.0  # true char-5-gram jaccard of the edit


def test_ngram_jaccard_matches_bruteforce(corpus, spark):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus, ngram_k=3, threshold=0.05).collect()
    }

    # brute-force oracle in python
    def grams(text: str) -> set[str]:
        toks = " ".join(text.lower().split()).split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(max(1, len(toks) - 2))}

    docs = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for (a, b), j in out.items():
        ga, gb = grams(docs[a]), grams(docs[b])
        expected = len(ga & gb) / len(ga | gb)
        assert abs(j - expected) < 1e-12, (a, b)
    assert (0, 1) in out and out[(0, 1)] == 1.0
    assert (0, 3) in out  # half-overlap above the low threshold


def test_ngram_jaccard_df_cap_bounds_hot_grams(spark):
    """A stop-gram shared by d docs contributes d^2/2 candidate pairs;
    the document-frequency cap must drop those while pairs backed by
    rare grams survive."""
    stop = "the of the and the"  # 5 tokens -> 3 full 3-grams, all hot
    rows = [(i, stop) for i in range(40)]
    rows += [
        (100, "unique protein folding simulation results chapter seven"),
        (101, "unique protein folding simulation results chapter eight"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # uncapped: the 40 identical stop-gram docs all pair (C(40,2) = 780)
    assert ngram_jaccard_pairs(df, threshold=0.2).count() >= 780
    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, threshold=0.2, max_doc_freq=10).collect()
    }
    assert (100, 101) in capped  # rare-gram pair survives
    assert all(a >= 100 for a, _ in capped)  # hot-gram-only pairs are gone


def test_ngram_jaccard_short_docs_emit_no_partial_grams(spark):
    """Docs with fewer than k tokens produce no postings (full k-grams
    only) — pins the oracle-parity semantics for short documents."""
    df = spark.createDataFrame(
        [(0, "tiny doc"), (1, "tiny doc"), (2, "three token doc")],
        ["doc_id", "text"],
    )
    assert ngram_jaccard_pairs(df, threshold=0.1).collect() == []


def test_simhash_identity_and_locality(corpus):
    rows = {r["doc_id"]: r["simhash"] for r in simhash(corpus).collect()}
    assert rows[0] == rows[1]
    ham_near = bin(rows[0] ^ rows[2]).count("1")
    ham_far = bin(rows[0] ^ rows[4]).count("1")
    assert ham_near < ham_far


def test_simhash_near_dup_pairs(corpus):
    # max_hamming=6 needs chunks > 6 for the pigeonhole guarantee
    # (chunks=8 -> C(8,2) two-block agreement keys)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(corpus, max_hamming=6, chunks=8).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert (0, 2) in pairs
    assert not any((a in (4, 5)) ^ (b in (4, 5)) for (a, b) in pairs), (
        "unrelated docs must not pair with the base cluster"
    )


def test_simhash_chunk_scaling_selectivity_and_recall(spark):
    """Scale parameterization: chunks=8 (C(8,5) ~40-bit combo keys)
    must generate far fewer false candidates than chunks=4 (16-bit
    single-block keys) on dissimilar docs, while still finding a
    planted duplicate (pigeonhole recall guarantee)."""
    import random

    from chapterhousedb_spark.operators.dedup import _simhash_block_keys

    random.seed(7)
    words = [f"w{i}" for i in range(5000)]
    rows = [(i, " ".join(random.sample(words, 30))) for i in range(3000)]
    rows.append((9999, rows[0][1]))  # planted exact dup of doc 0
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = simhash(df).cache()

    def n_candidates(chunks: int) -> int:
        keys = _simhash_block_keys(chunks, 3)
        blocked = sh.select("doc_id", F.explode(F.array(*keys)).alias("bk"))
        a, b = blocked.alias("a"), blocked.alias("b")
        return (
            a.join(
                b,
                (F.col("a.bk") == F.col("b.bk"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .dropDuplicates()
            .count()
        )

    c4, c8 = n_candidates(4), n_candidates(8)
    assert c8 < max(c4 / 3, 5), (c4, c8)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dup_pairs(df, max_hamming=3, chunks=8).collect()
    }
    assert (0, 9999) in pairs
    sh.unpersist()


def test_minhash_scales_without_cross_join(corpus):
    """Plan sanity: candidate generation must be an equi-join (hash or
    sort-merge on band hash), never a cartesian/broadcast-NL product."""
    plan = minhash_near_dup_pairs(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_rejects_void_blocking_params(spark):
    """chunks <= max_hamming voids the pigeonhole recall guarantee (a
    within-budget pair can differ in every block) — must raise, never
    silently clamp."""
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="chunks > max_hamming"):
        simhash_near_dup_pairs(df, chunks=3, max_hamming=3).collect()
    with pytest.raises(ValueError, match="chunks > max_hamming"):
        simhash_near_dup_pairs(df, chunks=2, max_hamming=5).collect()


def test_self_join_caches_are_released(spark):
    """Pair generation persists compact intermediates; a long-lived
    session must be able to release them all — no cached RDDs left
    behind (VERDICT r3 item 9: mirror cluster.py's sym.unpersist)."""
    from chapterhousedb_spark.operators.dedup import release_self_join_caches
    from chapterhousedb_spark.operators.similarity import embedding_near_dup_pairs

    def n_cached() -> int:
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    release_self_join_caches()  # drop anything left by earlier tests
    rows = [(i, f"doc {i} text body " * 3) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    minhash_near_dup_pairs(df).count()
    simhash_near_dup_pairs(df).count()
    vecs = [(i, [float(i), 1.0, 0.5]) for i in range(10)]
    embedding_near_dup_pairs(
        spark.createDataFrame(vecs, ["vec_id", "embedding"])
    ).count()
    # unpersist() is ASYNC: earlier tests' retiring caches can shrink
    # the raw storage count between any two reads (observed in a full
    # run: 4 stale entries retired while our 3 appeared), so assert
    # only on floors and on the registry's own accounting.
    assert n_cached() >= 3  # ours exist regardless of background drift
    assert release_self_join_caches() == 3
    assert release_self_join_caches() == 0  # idempotent


def test_self_join_caches_scoped_per_session(spark):
    """Caches are keyed per SparkSession: releasing one engine's session
    must not unpersist a concurrent engine's intermediates (VERDICT r4
    wrong #1 — Engine.submit runs on a thread pool, so a flat global
    list was a cross-engine hazard)."""
    from chapterhousedb_spark.operators.dedup import release_self_join_caches

    release_self_join_caches()  # clean slate across all sessions
    other = spark.newSession()
    rows = [(i, f"doc {i} text body " * 3) for i in range(10)]
    df_a = spark.createDataFrame(rows, ["doc_id", "text"])
    df_b = other.createDataFrame(rows, ["doc_id", "text"])
    minhash_near_dup_pairs(df_a).count()
    minhash_near_dup_pairs(df_b).count()
    # releasing session A leaves session B's cache tracked and cached
    assert release_self_join_caches(spark) == 1
    assert release_self_join_caches(spark) == 0
    assert release_self_join_caches(other) == 1
    assert release_self_join_caches() == 0


def test_contamination_pairs_flags_leaked_probe_docs(spark):
    """A probe doc whose text sits verbatim inside a corpus doc must
    flag at containment 1.0; a half-overlapping one scores its true
    gram fraction; unrelated docs never flag."""
    from chapterhousedb_spark.operators.dedup import contamination_pairs

    bench_q = "what is the capital of france and when was it founded exactly"
    corpus = spark.createDataFrame(
        [
            (1, f"some web page text {bench_q} plus trailing boilerplate here"),
            (2, "a completely different page about gardening tools and soil"),
            (3, "what is the capital of france and nothing else matters here today"),
        ],
        ["doc_id", "text"],
    )
    probe = spark.createDataFrame([(100, bench_q)], ["doc_id", "text"])
    got = {
        (r["corpus_id"], r["probe_id"]): r["containment"]
        for r in contamination_pairs(
            corpus, probe, ngram_k=5, threshold=0.3
        ).collect()
    }
    assert got[(1, 100)] == 1.0  # verbatim inclusion
    assert 0.3 <= got.get((3, 100), 0) < 1.0  # partial prefix overlap
    assert not any(c == 2 for c, _ in got)


def test_contamination_df_cap_is_lower_bound(spark):
    """With a corpus-side df cap, stop grams can no longer attest:
    scores only ever decrease, and hot-gram-only matches vanish."""
    from chapterhousedb_spark.operators.dedup import contamination_pairs

    hot = "the quick brown fox jumps again"
    corpus = spark.createDataFrame(
        [(i, hot) for i in range(20)] + [(99, "rare specific benchmark answer text here")],
        ["doc_id", "text"],
    )
    probe = spark.createDataFrame(
        [(1000, hot), (1001, "rare specific benchmark answer text here")],
        ["doc_id", "text"],
    )
    full = {
        (r["corpus_id"], r["probe_id"]): r["containment"]
        for r in contamination_pairs(corpus, probe, ngram_k=3, threshold=0.5).collect()
    }
    capped = {
        (r["corpus_id"], r["probe_id"]): r["containment"]
        for r in contamination_pairs(
            corpus, probe, ngram_k=3, threshold=0.5, max_doc_freq=5
        ).collect()
    }
    assert all(full[k] == 1.0 for k in full)
    assert (99, 1001) in capped  # rare-gram leak still flags
    assert not any(p == 1000 for _, p in capped)  # hot-gram matches gone
    assert all(capped[k] <= full[k] for k in capped)


def test_contamination_short_probes_reported(spark):
    """Probe docs with fewer than k tokens emit no k-grams and can
    never be flagged by contamination_pairs — the short-probe report
    must list exactly those (VERDICT r4 next #4)."""
    from chapterhousedb_spark.operators.dedup import (
        contamination_pairs,
        contamination_short_probes,
    )

    probe = spark.createDataFrame(
        [
            (1, "too short"),
            (2, "one two three four five six seven eight"),
            (3, "  Spaced   OUT  "),  # 2 tokens after normalization
        ],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame([(50, "too short")], ["doc_id", "text"])
    short = {
        r["probe_id"]: r["n_tokens"]
        for r in contamination_short_probes(probe, ngram_k=8).collect()
    }
    assert short == {1: 2, 3: 2}
    # blank/whitespace-only probes report 0 tokens, not split('')'s ['']
    blank = spark.createDataFrame([(9, ""), (10, "   ")], ["doc_id", "text"])
    assert {
        r["probe_id"]: r["n_tokens"]
        for r in contamination_short_probes(blank, ngram_k=8).collect()
    } == {9: 0, 10: 0}
    # and indeed the pairs op is blind to them, even verbatim matches
    flagged = contamination_pairs(
        corpus, probe, ngram_k=8, threshold=0.1
    ).collect()
    assert flagged == []


def test_duplicate_spans_finds_maximal_shared_spans(spark):
    """Planted repeated span: two docs share a 12-token run inside
    otherwise-unique text; with span_tokens=8 the merged island must
    cover exactly that run in both docs (maximal, correct offsets),
    and fully-unique docs must report nothing."""
    from chapterhousedb_spark.operators.dedup import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens
    rows = [
        (1, "a1 a2 a3 " + shared + " a4 a5"),       # span at tokens 4..15
        (2, "b1 " + shared + " b2 b3 b4 b5 b6"),     # span at tokens 2..13
        (3, " ".join(f"u{i}" for i in range(30))),   # unique
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["span_start"], r["span_len"], r["n_windows"])
        for r in duplicate_spans(df, span_tokens=8, min_df=2).collect()
    }
    # 12-token shared run with 8-token windows -> 5 duplicated windows,
    # island merges them into one span of length 12
    assert out[1] == (4, 12, 5)
    assert out[2] == (2, 12, 5)
    assert 3 not in out
    # max_doc_freq drops boilerplate windows above the band
    capped = duplicate_spans(df, span_tokens=8, min_df=3).collect()
    assert capped == []


def test_duplicate_spans_within_doc_repeat(spark):
    """min_df counts window POSITIONS corpus-wide, so a span repeated
    twice inside ONE document is also flagged (self-repetition)."""
    from chapterhousedb_spark.operators.dedup import duplicate_spans

    rep = " ".join(f"r{i}" for i in range(8))
    df = spark.createDataFrame(
        [(7, rep + " mid1 mid2 " + rep)], ["doc_id", "text"]
    )
    out = duplicate_spans(df, span_tokens=8, min_df=2).collect()
    assert {(r["span_start"], r["span_len"]) for r in out} == {(1, 8), (11, 8)}


def test_duplicate_spans_matches_bruteforce_on_random_corpus(spark):
    """Randomized (seeded) corpus from a tiny vocab so repeated windows
    arise naturally; exact brute-force Python reference for window df,
    duplicated positions, and island merging must match the operator
    output row for row."""
    import random

    from chapterhousedb_spark.operators.dedup import duplicate_spans

    rng = random.Random(42)
    vocab = [f"v{i}" for i in range(6)]  # tiny vocab -> natural repeats
    L = 4
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["span_start"]): (r["span_len"], r["n_windows"])
        for r in duplicate_spans(df, span_tokens=L, min_df=2).collect()
    }

    # brute force
    from collections import Counter, defaultdict

    win_df: Counter = Counter()
    doc_wins: dict[int, list[tuple[int, str]]] = defaultdict(list)
    for doc_id, text in rows:
        toks = text.strip().split()
        for i in range(len(toks) - L + 1):
            w = " ".join(toks[i : i + L])
            win_df[w] += 1
            doc_wins[doc_id].append((i + 1, w))  # 1-based
    expected = {}
    for doc_id, wins in doc_wins.items():
        dup_starts = sorted(s for s, w in wins if win_df[w] >= 2)
        # island merge over consecutive starts
        island: list[int] = []
        for s in dup_starts + [None]:
            if island and (s is None or s != island[-1] + 1):
                expected[(doc_id, island[0])] = (
                    island[-1] - island[0] + L,
                    len(island),
                )
                island = []
            if s is not None:
                island.append(s)
    assert got == expected
    assert expected  # non-vacuous: the vocab guarantees repeats


def test_minhash_cross_equals_self_join_cross_pairs(spark):
    """The bipartite form must find exactly the batch><corpus pairs the
    union self-join finds (restricted to cross pairs) — same hash
    family, same banding, no corpus-internal pairs."""
    from pyspark.sql import Row

    from chapterhousedb_spark.operators.dedup import (
        minhash_near_dup_pairs,
        minhash_near_dup_pairs_cross,
        release_self_join_caches,
    )

    base_texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "completely different content about spark and parquet tables",
        "a third document with its own unique words entirely",
    ]
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=t * 3) for i, t in enumerate(base_texts)]
    )
    batch = spark.createDataFrame(
        [
            # near-dup of corpus doc 0 (tail perturbation)
            Row(doc_id=100, text=base_texts[0] * 3 + " extra"),
            # novel doc
            Row(doc_id=101, text="nothing like anything in the corpus here"),
            # exact dup of corpus doc 1
            Row(doc_id=102, text=base_texts[1] * 3),
        ]
    )
    cross = {
        (r["batch_id"], r["corpus_id"])
        for r in minhash_near_dup_pairs_cross(
            batch, corpus, threshold=0.7
        ).collect()
    }
    assert (100, 0) in cross and (102, 1) in cross
    assert not any(b == 101 for b, _ in cross)
    # reference: union self-join restricted to cross pairs
    union = corpus.unionByName(batch)
    self_pairs = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
        for r in minhash_near_dup_pairs(union, threshold=0.7).collect()
        if (r["id_a"] >= 100) != (r["id_b"] >= 100)
    }
    release_self_join_caches()
    assert cross == self_pairs


def test_minhash_cross_never_pairs_corpus_internally(spark):
    """Two identical corpus docs must NOT appear in the cross output
    (the whole point: corpus x corpus work is skipped)."""
    from pyspark.sql import Row

    from chapterhousedb_spark.operators.dedup import minhash_near_dup_pairs_cross

    dup = "identical corpus text repeated enough to shingle " * 3
    corpus = spark.createDataFrame(
        [Row(doc_id=0, text=dup), Row(doc_id=1, text=dup)]
    )
    batch = spark.createDataFrame([Row(doc_id=100, text="unrelated words only")])
    assert minhash_near_dup_pairs_cross(batch, corpus).count() == 0


def test_simhash_cross_equals_self_join_cross_pairs(spark):
    """Bipartite SimHash gate == union self-join restricted to
    batch><corpus pairs; corpus-internal dups are never emitted."""
    from pyspark.sql import Row

    from chapterhousedb_spark.operators.dedup import (
        release_self_join_caches,
        simhash_near_dup_pairs,
        simhash_near_dup_pairs_cross,
    )

    t0 = "the quick brown fox jumps over the lazy dog again and again " * 3
    t1 = "completely different content about spark and parquet tables " * 3
    corpus = spark.createDataFrame(
        [Row(doc_id=0, text=t0), Row(doc_id=1, text=t1), Row(doc_id=2, text=t1)]
    )
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=t0 + " tail"),            # near corpus 0
            Row(doc_id=101, text="entirely novel words about nothing"),
        ]
    )
    # the tail perturbation lands at hamming 4 on this text, so run the
    # gate at max_hamming=4 (chunks=6 keeps the pigeonhole valid)
    cross = {
        (r["batch_id"], r["corpus_id"])
        for r in simhash_near_dup_pairs_cross(
            batch, corpus, max_hamming=4, chunks=6
        ).collect()
    }
    assert (100, 0) in cross
    assert not any(b == 101 for b, _ in cross)
    # corpus docs 1 and 2 are identical but must not appear
    assert all(b >= 100 for b, _ in cross)
    union = corpus.unionByName(batch)
    want = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
        for r in simhash_near_dup_pairs(union, max_hamming=4, chunks=6).collect()
        if (r["id_a"] >= 100) != (r["id_b"] >= 100)
    }
    release_self_join_caches()
    assert cross == want


def test_minhash_bands_must_divide_num_hashes(corpus):
    """A ragged band split would silently drop trailing signature
    components (recall loss + low-biased jaccard estimate) — both the
    self-join and cross entry points reject it up front (ADVICE r6)."""
    from chapterhousedb_spark.operators.dedup import (
        minhash_near_dup_pairs_cross,
    )

    with pytest.raises(ValueError, match="divide"):
        minhash_near_dup_pairs(corpus, num_hashes=64, bands=10)
    with pytest.raises(ValueError, match="divide"):
        minhash_near_dup_pairs_cross(corpus, corpus, num_hashes=64, bands=10)


def test_pair_features_composes_with_lsh_pairs(corpus):
    """pair_features over actual minhash candidates: features are
    sane (planted near-dups score high, jaccard<=containment<=1) and
    the n_common arithmetic is internally consistent."""
    from chapterhousedb_spark.operators.dedup import (
        minhash_near_dup_pairs,
        pair_features,
    )

    pairs = minhash_near_dup_pairs(corpus, threshold=0.5, persist=False)
    feats = pair_features(pairs, corpus).collect()
    assert feats
    for r in feats:
        assert 0 <= r["jaccard_tokens"] <= r["containment"] <= 1
        assert r["n_common"] <= min(r["n_tok_a"], r["n_tok_b"])
        union = r["n_tok_a"] + r["n_tok_b"] - r["n_common"]
        assert r["jaccard_tokens"] == r["n_common"] / max(union, 1)
    # near-dup candidates share most tokens
    assert sum(r["containment"] > 0.5 for r in feats) > len(feats) * 0.8


def test_two_stage_dedup_default_pipeline(corpus):
    """two_stage_dedup (LSH candidates -> exact rerank -> threshold):
    planted near-dups survive the exact-jaccard threshold, unrelated
    docs never do, and the output equals manually composing the
    stages."""
    from chapterhousedb_spark.operators.dedup import (
        minhash_near_dup_pairs,
        pair_features,
        two_stage_dedup,
    )
    from pyspark.sql import functions as F

    out = two_stage_dedup(corpus, jaccard_threshold=0.8, persist=False)
    got = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    assert (0, 1) in got  # identical mod case/space: jaccard 1.0
    assert got[(0, 1)]["jaccard_tokens"] == 1.0
    assert (0, 2) in got and got[(0, 2)]["jaccard_tokens"] >= 0.8
    assert all(a not in (4, 5) and b not in (4, 5) for a, b in got)
    # composition equality: the operator IS candidates -> features ->
    # threshold, nothing more
    cands = minhash_near_dup_pairs(corpus, threshold=0.0, persist=False)
    manual = (
        pair_features(cands, corpus)
        .filter(F.col("jaccard_tokens") >= 0.8)
        .collect()
    )
    assert {(r["id_a"], r["id_b"]) for r in manual} == set(got)


def test_two_stage_dedup_pluggable_candidates(corpus):
    """A plugged candidate generator (any (id_a, id_b) relation)
    bounds the rerank: only supplied pairs can appear, with exact
    features."""
    from chapterhousedb_spark.operators.dedup import two_stage_dedup

    spark = corpus.sparkSession
    cands = spark.createDataFrame(
        [(0, 2), (4, 5)], ["id_a", "id_b"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_tokens"]
        for r in two_stage_dedup(
            corpus, candidates=cands, jaccard_threshold=0.0
        ).collect()
    }
    assert set(got) == {(0, 2), (4, 5)}
    assert got[(0, 2)] > 0.8 > got[(4, 5)]

def test_remove_duplicate_spans_keeper_semantics(spark):
    """The span REWRITE: a corpus-duplicated window survives only in
    its keeper (smallest doc_id); partial overlap keeps the
    non-duplicated tokens; a repeat wholly inside one doc keeps that
    doc as its own keeper (self-repetition untouched); short and empty
    docs pass through with n_removed=0."""
    from chapterhousedb_spark.operators.dedup import remove_duplicate_spans

    span = " ".join(f"w{i}" for i in range(16))  # the shared 16 tokens
    rows = [
        (1, span + " tail1 tail2"),                     # keeper
        (2, "lead1 lead2 " + span),                     # loses the span
        (3, span),                                       # loses everything
        (4, span + " mid " + span),                      # intra-doc... also shares with 1-3
        (5, "a few short words"),                        # <16 tokens
        (6, ""),                                         # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_spans(docs, span_tokens=16, min_df=2).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6}
    # keeper keeps all tokens
    assert got[1]["clean_text"] == span + " tail1 tail2"
    assert got[1]["n_removed"] == 0
    # doc 2 keeps only its unique lead
    assert got[2]["clean_text"] == "lead1 lead2"
    assert got[2]["n_kept"] == 2 and got[2]["n_removed"] == 16
    # doc 3 loses everything but the ROW survives
    assert got[3]["clean_text"] == "" and got[3]["n_kept"] == 0
    # doc 4 shares the window with docs 1-3 -> both copies removed
    # (cross-corpus duplication wins over the intra-doc keeper rule);
    # the connective token survives
    assert got[4]["clean_text"] == "mid"
    # short/empty docs untouched
    assert got[5]["clean_text"] == "a few short words"
    assert got[5]["n_removed"] == 0
    assert got[6]["clean_text"] == "" and got[6]["n_kept"] == 0


def test_remove_duplicate_spans_intra_doc_only_repeat(spark):
    """A window duplicated ONLY within one doc keeps that doc as its
    own keeper — nothing is removed (self-repetition is
    text_repetition's business, not corpus dedup's)."""
    from chapterhousedb_spark.operators.dedup import remove_duplicate_spans

    span = " ".join(f"x{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(1, span + " gap " + span), (2, "totally unrelated words here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_spans(docs, span_tokens=16, min_df=2).collect()
    }
    assert got[1]["n_removed"] == 0
    assert got[1]["clean_text"] == span + " gap " + span
    assert got[2]["n_removed"] == 0


# --------------------------------------------------------- line dedup


@pytest.fixture(scope="module")
def line_corpus(spark):
    """Three docs sharing a boilerplate header; doc 1 repeats one of
    its own lines; doc 2 is boilerplate-only; blank lines throughout."""
    return spark.createDataFrame(
        [
            (0, "HOME | ABOUT\nalpha unique zero\n\nrepeat me\nrepeat me"),
            (1, "HOME | ABOUT\nbeta unique one\n\nrepeat me"),
            (2, "HOME | ABOUT"),
            (3, None),
        ],
        "doc_id long, text string",
    )


def test_line_dedup_keep_first(spark, line_corpus):
    from chapterhousedb_spark.operators.dedup import line_dedup

    out = {
        r["doc_id"]: r
        for r in line_dedup(line_corpus).collect()
    }
    # doc 0 is corpus-first for both dup groups: keeps header and the
    # FIRST "repeat me" (pos 3), loses the second (pos 4)
    assert out[0]["text"] == "HOME | ABOUT\nalpha unique zero\n\nrepeat me"
    assert (out[0]["n_lines"], out[0]["n_removed"]) == (5, 1)
    # doc 1 loses the header (doc 0 holds it) and its "repeat me"
    assert out[1]["text"] == "beta unique one\n"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (4, 2)
    # doc 2: every line removed -> present with empty text
    assert out[2]["text"] == ""
    assert (out[2]["n_lines"], out[2]["n_removed"]) == (1, 1)
    # NULL text behaves as one empty (always-kept) line
    assert out[3]["text"] == ""
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (1, 0)


def test_line_dedup_keep_none(spark, line_corpus):
    from chapterhousedb_spark.operators.dedup import line_dedup

    out = {
        r["doc_id"]: r["text"]
        for r in line_dedup(line_corpus, keep="none").collect()
    }
    # no keeper: every duplicated line vanishes everywhere
    assert out[0] == "alpha unique zero\n"
    assert out[1] == "beta unique one\n"
    assert out[2] == ""


def test_line_dedup_min_count_threshold(spark):
    from chapterhousedb_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(0, "twice\nunique a"), (1, "twice\nunique b")],
        "doc_id long, text string",
    )
    # min_count=3: a line seen twice is NOT a duplicate
    out = {
        r["doc_id"]: r["text"]
        for r in line_dedup(df, min_count=3).collect()
    }
    assert out[0] == "twice\nunique a"
    assert out[1] == "twice\nunique b"


def test_line_dedup_guards(spark, line_corpus):
    from chapterhousedb_spark.operators.dedup import line_dedup

    with pytest.raises(ValueError, match="keep"):
        line_dedup(line_corpus, keep="last")
    with pytest.raises(ValueError, match="min_count"):
        line_dedup(line_corpus, min_count=1)


# ----------------------------------------------------------- lsh tuner


def test_lsh_tune_midpoint_tracks_threshold():
    from chapterhousedb_spark.operators.dedup import lsh_tune

    for t in (0.5, 0.8, 0.9):
        r = lsh_tune(t, max_hashes=128)
        assert r["bands"] * r["rows"] == r["num_hashes"] <= 128
        # the S-curve's rise point lands near the target threshold
        assert abs(r["threshold_midpoint"] - t) < 0.1
        assert r["cost"] == pytest.approx(r["fp_area"] + r["fn_area"])


def test_lsh_tune_weights_shift_the_midpoint():
    from chapterhousedb_spark.operators.dedup import lsh_tune

    prec = lsh_tune(0.7, max_hashes=128, fp_weight=10.0)
    rec = lsh_tune(0.7, max_hashes=128, fn_weight=10.0)
    # precision-weighted tuning pushes the rise point ABOVE the
    # recall-weighted one (fewer low-sim collisions vs fewer misses)
    assert prec["threshold_midpoint"] > rec["threshold_midpoint"]
    assert prec["fp_area"] < rec["fp_area"]
    assert prec["fn_area"] > rec["fn_area"]


def test_lsh_tune_budget_monotone_and_guards():
    from chapterhousedb_spark.operators.dedup import lsh_tune

    small = lsh_tune(0.8, max_hashes=32)
    big = lsh_tune(0.8, max_hashes=256)
    assert big["cost"] <= small["cost"]  # more budget never hurts
    # the repo's 64/16 default is near-optimal for its ~0.5 midpoint
    d = lsh_tune(0.5, max_hashes=64)
    assert abs(d["threshold_midpoint"] - 0.5) < 0.06
    with pytest.raises(ValueError, match="threshold"):
        lsh_tune(1.0)
    with pytest.raises(ValueError, match="max_hashes"):
        lsh_tune(0.5, max_hashes=1)
    with pytest.raises(ValueError, match="weights"):
        lsh_tune(0.5, fp_weight=0.0, fn_weight=0.0)
