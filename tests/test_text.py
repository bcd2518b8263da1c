"""Text-analysis operator tests: stats vs python oracle, lang-id on real
multilingual samples, token counting edge cases, fingerprints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.text import (
    bpe_ish_token_count,
    lang_id,
    text_fingerprint,
    text_stats,
    token_count,
)

SAMPLES = [
    (0, "The quick brown fox jumps over the lazy dog, and it is happy for now.", "en"),
    (1, "El perro corre por el parque y la niña juega con un gato en los jardines.", "es"),
    (2, "Der Hund läuft durch den Park und die Kinder spielen mit dem Ball im Garten.", "de"),
    (3, "Le chat dort dans la maison et les enfants jouent dans le jardin près de une fontaine.", "fr"),
    (4, "今天天气很好我们一起去公园散步吧然后喝茶聊天看风景", "zh"),
    (5, "Сегодня хорошая погода и мы идем гулять в парк с друзьями", "ru"),
]


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in SAMPLES], ["doc_id", "text"]
    )


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "one"), (3, "a  b\tc\nd"), (4, " padded ")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", token_count("text").alias("n")).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 4, 4: 1}


def test_bpe_ish_token_count_splits_punct_and_numbers(spark):
    df = spark.createDataFrame([(0, "hello, world! 42x")], ["doc_id", "text"])
    n = df.select(bpe_ish_token_count("text").alias("n")).collect()[0]["n"]
    # hello , world ! 42 x -> 6 units
    assert n == 6


def test_text_stats_against_python(sample_df):
    rows = {r["doc_id"]: r for r in text_stats(sample_df).collect()}
    en = SAMPLES[0][1]
    r = rows[0]
    assert r["n_chars"] == len(en)
    assert r["n_tokens"] == len(en.split())
    alpha = sum(ch.isalpha() and ch.isascii() for ch in en)
    assert r["alpha_ratio"] == alpha / len(en)
    assert 0 < r["stopword_ratio"] < 1
    assert r["punct_ratio"] > 0


def test_lang_id_accuracy(sample_df):
    preds = {r["doc_id"]: r["lang_pred"] for r in lang_id(sample_df).collect()}
    expected = {i: lang for i, _, lang in SAMPLES}
    correct = sum(preds[i] == expected[i] for i in preds)
    assert correct >= 5, f"lang_id got {preds} want {expected}"


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [
            (0, "Hello   World  this is Fine"),
            (1, "hello world THIS is fine"),
            (2, "a completely different sentence here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text_fingerprint(df).collect()}
    assert rows[0]["md5_fp"] == rows[1]["md5_fp"]
    assert rows[0]["winnow_min"] == rows[1]["winnow_min"]
    assert rows[0]["winnow_max"] == rows[1]["winnow_max"]
    assert rows[0]["md5_fp"] != rows[2]["md5_fp"]


def test_token_chunks_overlap_and_coverage(spark):
    from chapterhousedb_spark.operators.text import token_chunks

    words = [f"w{i}" for i in range(300)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(
        token_chunks(df, chunk_tokens=128, overlap=32).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts at 1, 97, 193 (stride 96); 300 tokens -> 3 windows
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert [r["n_tokens"] for r in rows] == [128, 128, 108]
    c0, c1 = rows[0]["chunk_text"].split(" "), rows[1]["chunk_text"].split(" ")
    assert c0[96:] == c1[:32]  # 32-token overlap
    # every token covered, last window reaches the end
    assert rows[2]["chunk_text"].split(" ")[-1] == "w299"


def test_token_chunks_short_doc_single_window(spark):
    from chapterhousedb_spark.operators.text import token_chunks

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    rows = token_chunks(df, chunk_tokens=128, overlap=32).collect()
    assert len(rows) == 1 and rows[0]["n_tokens"] == 3


def test_repetition_stats_detects_duplicates(spark):
    from chapterhousedb_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "same line\nsame line\nsame line\nother"),
            (2, "all tokens unique here now"),
            (3, "loop loop loop loop"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["n_lines"] == 4
    assert rows[1]["dup_line_ratio"] == pytest.approx(0.5)  # 2 distinct of 4
    assert rows[2]["dup_token_ratio"] == 0.0
    assert rows[3]["dup_token_ratio"] == pytest.approx(0.75)


def test_pack_sequences_invariants(spark):
    """Every doc lands in exactly one pack; start offsets are the
    running token sum within (shard, id) order; a doc starts inside the
    budget window of its pack (concat-then-chunk semantics)."""
    from chapterhousedb_spark.operators.text import pack_sequences

    rows = [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 40))) for i in range(200)]
    rows.append((999, "   "))  # blank -> 0 tokens, still assigned
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, budget=64, n_shards=4).collect()
    assert len(out) == len(rows)
    assert {r["doc_id"] for r in out} == {r[0] for r in rows}
    assert all(0 <= r["shard"] < 4 for r in out)
    assert all(0 <= r["pack_offset"] < 64 for r in out)
    # replay the packing per shard in python
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        start = 0
        for r in shard_rows:
            assert r["pack_id"] == start // 64
            assert r["pack_offset"] == start % 64
            start += r["n_tokens"]
    blank = next(r for r in out if r["doc_id"] == 999)
    assert blank["n_tokens"] == 0


def test_pack_sequences_deterministic(spark):
    from chapterhousedb_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [(i, f"tok {i} " * (i % 9 + 1)) for i in range(50)], ["doc_id", "text"]
    )
    a = sorted(map(tuple, pack_sequences(df, budget=32).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(7), budget=32).collect()))
    assert a == b  # layout independent of input partitioning


def test_pack_materialize_fixed_length_rows(spark):
    """Materialized packs: exactly `budget` tokens per row except each
    shard's tail pack, tokens in concat order, and full consistency
    with pack_sequences' assignments (a doc's first token sits at its
    assigned (pack_id, pack_offset))."""
    from chapterhousedb_spark.operators.text import pack_materialize, pack_sequences

    rows = [(i, f"w{i} " * (i % 17 + 1)) for i in range(120)]
    rows.append((999, "   "))  # blank doc contributes no tokens
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    mat = pack_materialize(df, budget=64, n_shards=4).collect()
    asg = pack_sequences(df, budget=64, n_shards=4).collect()

    by_shard: dict[int, list] = {}
    for r in mat:
        assert r["n_tokens"] == len(r["tokens"])
        by_shard.setdefault(r["shard"], []).append(r)
    for packs in by_shard.values():
        tail = max(p["pack_id"] for p in packs)
        # contiguous pack ids, all non-tail packs exactly at budget
        assert sorted(p["pack_id"] for p in packs) == list(range(tail + 1))
        for p in packs:
            if p["pack_id"] != tail:
                assert p["n_tokens"] == 64
            else:
                assert 1 <= p["n_tokens"] <= 64

    pk = {(r["shard"], r["pack_id"]): r["tokens"] for r in mat}
    text_by_id = dict(rows)
    for a in asg:
        toks = text_by_id[a["doc_id"]].strip().split()
        if not toks:
            continue
        assert pk[(a["shard"], a["pack_id"])][a["pack_offset"]] == toks[0]
    # total token conservation
    assert sum(r["n_tokens"] for r in mat) == sum(
        len(t.strip().split()) for _, t in rows
    )


def test_redact_pii_categories_and_order(spark):
    """Every category redacts with its typed token; the fixed apply
    order protects IPs from the phone pattern; counts measure the
    original text; clean text passes through untouched."""
    from chapterhousedb_spark.operators.text import redact_pii

    rows = [
        (1, "mail a.b+c@ex-ample.org and x@y.io now"),
        (2, "server at 192.168.0.1 and 10.0.255.7"),
        (3, "ssn 123-45-6789 tel 555-867-5309 intl +4915112345678"),
        (4, "no pii here at all, just words"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    assert out[1]["text_redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert out[1]["n_email"] == 2
    assert out[2]["text_redacted"] == "server at <IP> and <IP>"
    assert out[2]["n_ip"] == 2 and out[2]["n_phone"] == 0  # IPs not eaten
    assert out[3]["text_redacted"] == "ssn <SSN> tel <PHONE> intl <PHONE>"
    assert out[3]["n_ssn"] == 1 and out[3]["n_phone"] == 2
    assert out[4]["text_redacted"] == rows[3][1]
    assert all(
        out[4][k] == 0 for k in ("n_email", "n_ip", "n_ssn", "n_phone")
    )


def test_vocabulary_counts_and_order(spark):
    from chapterhousedb_spark.operators.text import vocabulary

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "THE  cat\tran"), (3, "")],
        ["doc_id", "text"],
    )
    rows = vocabulary(df, top_k=10).collect()
    got = [(r["token"], r["freq"]) for r in rows]
    # normalized: lowercase, whitespace collapsed; '' from the empty doc dropped
    assert got == [("cat", 2), ("the", 2), ("ran", 1), ("sat", 1)]


def test_vocabulary_min_freq(spark):
    from chapterhousedb_spark.operators.text import vocabulary

    df = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    assert [r["token"] for r in vocabulary(df, min_freq=2).collect()] == ["a"]


def test_tfidf_top_terms_ranks_distinctive_words(spark):
    from chapterhousedb_spark.operators.text import tfidf_top_terms

    # 'shared' appears in every doc (df=3 -> low idf); each doc has a
    # unique word (df=1 -> high idf) that must rank first.
    df = spark.createDataFrame(
        [
            (1, "shared shared apple apple"),
            (2, "shared banana"),
            (3, "shared cherry cherry cherry"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(df, k=1)
    got = {r["id"]: r["token"] for r in out.collect()}
    assert got == {1: "apple", 2: "banana", 3: "cherry"}
    # score is the log-free tf*N/df and rank is dense within each doc
    r1 = out.filter(F.col("id") == 1).collect()[0]
    assert r1["tf"] == 2 and r1["df"] == 1 and r1["score"] == 6.0 and r1["rank"] == 1


def test_tfidf_min_token_len_filters_short_words(spark):
    from chapterhousedb_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame([(1, "aa bb elephant")], ["doc_id", "text"])
    toks = {r["token"] for r in tfidf_top_terms(df, k=5).collect()}
    assert toks == {"elephant"}


def test_rarity_stats_hand_computed(spark):
    """Hand-checkable corpus: doc 1's 'zzz' is a hapax; 'the' is
    corpus-common; mean_df exact."""
    from chapterhousedb_spark.operators.text import rarity_stats

    docs = spark.createDataFrame(
        [
            (1, "the cat zzz"),
            (2, "the cat sat"),
            (3, "the dog sat"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in rarity_stats(docs, common_k=2).collect()}
    # dfs: the=3, cat=2, sat=2, dog=1, zzz=1; top-2 common = {the, cat}
    d1 = got[1]
    assert d1["n_distinct"] == 3
    assert d1["hapax_frac"] == pytest.approx(1 / 3)  # zzz
    assert d1["common_frac"] == pytest.approx(2 / 3)  # the, cat
    assert d1["mean_df"] == pytest.approx((3 + 2 + 1) / 3)
    d3 = got[3]
    assert d3["hapax_frac"] == pytest.approx(1 / 3)  # dog
    assert d3["common_frac"] == pytest.approx(1 / 3)  # the
    # duplicate tokens in a doc count once (distinct postings)
    dup = spark.createDataFrame([(9, "a a a b")], "doc_id long, text string")
    both = docs.unionByName(dup)
    g9 = {r["doc_id"]: r for r in rarity_stats(both, common_k=1).collect()}[9]
    assert g9["n_distinct"] == 2


def test_rarity_stats_topk_is_take_ordered(spark):
    from chapterhousedb_spark.operators.text import rarity_stats
    from chapterhousedb_spark.workload.registry import load
    from tests.conftest import SF_SMOKE

    plan = (
        rarity_stats(load(spark, SF_SMOKE, "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocabulary_partials_merge_equals_direct(spark):
    """Incremental vocabulary: merging per-batch partials == the direct
    vocabulary over the union, for any merge tree."""
    from chapterhousedb_spark.operators.text import (
        vocabulary,
        vocabulary_merge,
        vocabulary_partials,
    )
    from chapterhousedb_spark.workload.registry import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    b1 = docs.filter("doc_id % 3 = 0")
    b2 = docs.filter("doc_id % 3 = 1")
    b3 = docs.filter("doc_id % 3 = 2")
    direct = {
        r["token"]: r["freq"] for r in vocabulary(docs).collect()
    }
    flat = vocabulary_merge(
        vocabulary_partials(b1), vocabulary_partials(b2), vocabulary_partials(b3)
    )
    assert {r["token"]: r["freq"] for r in flat.collect()} == direct
    # a different merge tree gives identical counts (associativity)
    staged = vocabulary_merge(
        vocabulary_merge(vocabulary_partials(b1), vocabulary_partials(b2)),
        vocabulary_partials(b3),
    )
    assert {r["token"]: r["freq"] for r in staged.collect()} == direct


def _py_bpe_train(texts, n_merges):
    """Independent python reference (Sennrich et al. 2016): word-freq
    table, best adjacent pair by (count desc, left asc, right asc)."""
    import collections
    import re

    words = collections.Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (l, r), _ = best
        merges.append((l, r))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _py_bpe_segment(text, merges):
    import re

    out = []
    for w in re.sub(r"\s+", " ", text.lower()).strip().split(" "):
        if not w:
            continue
        syms = list(w) + ["</w>"]
        for l, r in merges:
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        out.extend(syms)
    return out


def test_bpe_train_matches_python_reference(spark):
    """Spark-iterative BPE training == the classic sequential
    algorithm: identical merge list AND identical segmentations on the
    textbook corpus and on real testdata."""
    from chapterhousedb_spark.operators.text import bpe_segment, bpe_train

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest widest",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=8)
    assert merges == _py_bpe_train(texts, 8)
    seg = {
        r["doc_id"]: r["tokens"]
        for r in bpe_segment(docs, merges).collect()
    }
    for i, t in enumerate(texts):
        assert seg[i] == _py_bpe_segment(t, merges), i


def test_bpe_train_on_testdata_deterministic(spark):
    from chapterhousedb_spark.operators.text import bpe_train
    from chapterhousedb_spark.workload.registry import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").limit(50)
    texts = [r["text"] for r in docs.collect()]
    m1 = bpe_train(docs, n_merges=6)
    assert m1 == _py_bpe_train(texts, 6)
    # deterministic across runs
    assert m1 == bpe_train(docs, n_merges=6)


def test_bpe_segment_roundtrip_property(spark):
    """Segmentation conserves characters: concatenating a word's
    tokens (minus the marker) reproduces the word."""
    from chapterhousedb_spark.operators.text import bpe_segment, bpe_train

    texts = ["banana bandana cabana", "banana banana bandana"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=5)
    seg = {r["doc_id"]: r["tokens"] for r in bpe_segment(docs, merges).collect()}
    for i, t in enumerate(texts):
        flat = "".join(tok for tok in seg[i]).replace("</w>", " ").strip()
        assert flat == t, (flat, t)


def test_bpe_train_from_maintained_word_table(spark):
    """Incremental tokenizer training: word counts maintained as
    mergeable partials (counts add), merges retrained from the table —
    identical to training from the raw text."""
    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.text import (
        bpe_train,
        bpe_train_from_words,
        normalize_text,
    )

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest widest",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    def word_partial(df):
        return (
            df.select(F.explode(F.split(normalize_text("text"), " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
        )

    # two batches' partials merged == whole-corpus counts
    merged = (
        word_partial(docs.filter("doc_id < 2"))
        .unionByName(word_partial(docs.filter("doc_id >= 2")))
        .groupBy("word")
        .agg(F.sum("freq").alias("freq"))
    )
    assert bpe_train_from_words(merged, 8) == bpe_train(docs, 8)


def test_bpe_train_handles_backslash_and_quote_symbols(spark):
    """Merge application is parameterized (Column literals), never SQL
    string interpolation — corpora whose words contain backslashes or
    quotes train correctly (ADVICE r7: the interpolated form corrupted
    or failed on a symbol ending in '\\')."""
    from chapterhousedb_spark.operators.text import bpe_segment, bpe_train

    texts = [
        r"a\b a\b a\b a\b don't don't don't",
        r"x\ x\ x\ x\ 'q' 'q' 'q'",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=6)
    assert merges == _py_bpe_train(texts, 6)
    seg = {r["doc_id"]: r["tokens"] for r in bpe_segment(docs, merges).collect()}
    for i, t in enumerate(texts):
        assert seg[i] == _py_bpe_segment(t, merges), i


def test_bpe_segment_pandas_equals_jvm_fold_on_testdata(spark):
    """The production broadcast-rank pandas segmenter and the composed
    JVM fold produce IDENTICAL segmentations (VERDICT r7 #2) — checked
    on real testdata documents with a trained merge list, plus empty/
    blank/backslash edge rows."""
    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.text import bpe_segment, bpe_train
    from chapterhousedb_spark.workload.registry import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").limit(60).select("doc_id", "text")
    edge = spark.createDataFrame(
        [(100001, ""), (100002, "   "), (100003, r"x\ don't x\ don't")],
        "doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    merges = bpe_train(docs.filter(F.col("text") != ""), n_merges=24)
    jvm = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_segment(docs, merges, use_pandas=False).collect()
    }
    pdc = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_segment(docs, merges, use_pandas=True).collect()
    }
    assert jvm == pdc
    # empty/blank text segments to zero tokens on both paths
    assert jvm[100001] == ([], 0) and jvm[100002] == ([], 0)


def test_bpe_segment_auto_selects_pandas_past_threshold(spark):
    """Past _BPE_JVM_MAX_MERGES the segmenter switches to the
    broadcast pandas shape automatically, and the Catalyst plan stays
    FLAT in the merge count (a 30k-merge vocabulary must not explode
    codegen — the production-scale contract)."""
    from chapterhousedb_spark.operators.text import (
        _BPE_JVM_MAX_MERGES,
        bpe_segment,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(0, "low low lower newest"), (1, "newest widest low")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=6)
    small = merges[: _BPE_JVM_MAX_MERGES]
    # pad to a production-sized merge table with inert symbol pairs
    big = merges + [(f"\x00L{i}", f"\x00R{i}") for i in range(30000)]
    assert len(big) > _BPE_JVM_MAX_MERGES
    df = bpe_segment(docs, big)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" in plan
    assert len(plan) < 2000, len(plan)  # flat: no per-merge expressions
    # inert padding leaves the segmentation identical to the real list
    want = {
        r["doc_id"]: r["tokens"]
        for r in bpe_segment(docs, merges, use_pandas=True).collect()
    }
    assert {r["doc_id"]: r["tokens"] for r in df.collect()} == want
    # and a tiny list still uses the dependency-free JVM fold
    jvm_plan = (
        bpe_segment(docs, small)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "MapInPandas" not in jvm_plan


def test_bpe_train_driver_path_equals_iterative_spark_path(spark):
    """The bounded-collect driver trainer and the iterative Spark path
    learn IDENTICAL merge lists (same tie-break, same stop rule) — on
    real testdata and on a tie-heavy corpus."""
    from chapterhousedb_spark.operators.text import bpe_train_from_words
    from chapterhousedb_spark.operators.text import normalize_text
    from chapterhousedb_spark.workload.registry import load
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    def words_of(df):
        return (
            df.select(F.explode(F.split(normalize_text("text"), " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
        )

    docs = load(spark, SF_SMOKE, "documents").limit(40)
    w = words_of(docs)
    driver = bpe_train_from_words(w, 12)
    iterative = bpe_train_from_words(w, 12, driver_max_words=0)
    assert driver == iterative
    # tie-heavy: every pair count equal -> tie-break order decides
    ties = spark.createDataFrame(
        [(0, "ab cd ab cd ef gh ef gh")], "doc_id long, text string"
    )
    wt = words_of(ties)
    assert bpe_train_from_words(wt, 4) == bpe_train_from_words(
        wt, 4, driver_max_words=0
    )

def test_bpe_segment_pandas_schema_construction(spark):
    """ADVICE r8: the pandas path's output schema is a programmatic
    StructType, not DDL string surgery — id columns that need quoting
    (spaces) segment fine, and an id column colliding with an
    output name raises a clear error instead of a corrupt schema."""
    import pytest

    from chapterhousedb_spark.operators.text import bpe_segment, bpe_train

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=4)
    want = {
        r["doc_id"]: r["tokens"]
        for r in bpe_segment(docs, merges, use_pandas=False).collect()
    }

    weird = docs.withColumnRenamed("doc_id", "doc id")
    got = bpe_segment(
        weird, merges, id_col="doc id", use_pandas=True
    )
    assert got.schema.fieldNames() == ["doc id", "tokens", "n_tokens"]
    assert {r["doc id"]: r["tokens"] for r in got.collect()} == want

    collide = docs.withColumnRenamed("doc_id", "n_tokens")
    with pytest.raises(ValueError, match="collides"):
        bpe_segment(collide, merges, id_col="n_tokens", use_pandas=True)

def test_bigram_lm_stats_planted(spark):
    """bigram_lm_stats on a planted corpus: hand-computed coverage
    (doc 1/2 share 'the quick fox' bigrams; doc 3 is a unique word
    salad), multiplicity-weighted instances, and the <2-token
    no-row contract."""
    from chapterhousedb_spark.operators.text import bigram_lm_stats

    docs = spark.createDataFrame(
        [
            (1, "the quick fox jumps"),
            (2, "the quick fox sleeps"),
            (3, "zxq woble frim"),
            (4, "single"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in bigram_lm_stats(docs, min_count=2).collect()
    }
    # docs 4 (one token) and 5 (empty) produce no bigrams -> no row
    assert set(got) == {1, 2, 3}
    # doc 1 bigrams: 'the quick'(2), 'quick fox'(2), 'fox jumps'(1)
    assert got[1]["n_bigrams"] == 3
    assert abs(got[1]["known_frac"] - 2 / 3) < 1e-12
    assert abs(got[1]["mean_bg_count"] - 5 / 3) < 1e-12
    # doc 3: all bigrams unique in the corpus
    assert got[3]["n_bigrams"] == 2
    assert got[3]["known_frac"] == 0.0 and got[3]["mean_bg_count"] == 1.0


def test_bigram_lm_stats_surprisal_matches_python_reference(spark):
    """The add-k surprisal column equals a sequential python replay of
    the same count model (rel tol — log2 is float; this is exactly why
    surprisal stays OUT of the oracle-gated column set)."""
    import math

    from chapterhousedb_spark.operators.text import bigram_lm_stats

    rows = [
        (1, "a b c a b"),
        (2, "a b x y"),
        (3, "c a b c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["surprisal"]
        for r in bigram_lm_stats(docs, surprisal=True, add_k=0.5).collect()
    }

    def toks(t):
        return t.lower().split()

    bgs = {}
    for _, t in rows:
        w = toks(t)
        for i in range(len(w) - 1):
            bg = w[i] + " " + w[i + 1]
            bgs[bg] = bgs.get(bg, 0) + 1
    total, vocab = sum(bgs.values()), len(bgs)
    for did, t in rows:
        w = toks(t)
        nll = [
            -math.log2((bgs[w[i] + " " + w[i + 1]] + 0.5) / (total + 0.5 * vocab))
            for i in range(len(w) - 1)
        ]
        want = sum(nll) / len(nll)
        assert abs(got[did] - want) < 1e-9, (did, got[did], want)

def test_strip_markup_planted_and_hostile(spark):
    """strip_markup: container blocks drop WITH content, tags sweep,
    entities decode in the fixed order (a literal '&lt;p&gt;' in prose
    becomes visible text, never a strippable tag; '&amp;lt;' decodes
    exactly once), whitespace collapses; malformed HTML degrades to
    best-effort text, never an error."""
    from chapterhousedb_spark.operators.text import strip_markup

    rows = [
        (1, '<div><p>Hello <b>world</b></p><script>var a="<x>";</script></div>'),
        (2, "plain text, no markup at all"),
        (3, "literal &lt;p&gt; stays text &amp; this &amp;lt; decodes once"),
        (4, "<style>p { color: red; }</style>styled<!-- hidden -->done"),
        (5, "<broken <unclosed attr='x' text after"),
        (6, "a&nbsp;b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in strip_markup(docs).collect()}
    assert got[1]["text_clean"] == "Hello world"
    assert got[1]["n_tags"] >= 6
    assert got[2]["text_clean"] == rows[1][1] and got[2]["n_tags"] == 0
    # entity order: &lt;/&gt; decode AFTER the tag sweep so the result
    # is the visible text '<p>'; '&amp;lt;' -> '&lt;' (decoded once)
    assert got[3]["text_clean"] == "literal <p> stays text & this &lt; decodes once"
    assert got[4]["text_clean"] == "styled done"
    # hostile: unterminated tags — best effort, no exception
    assert "text after" in got[5]["text_clean"]
    assert got[6]["text_clean"] == "a b"
    for d in got.values():
        assert d["n_chars_clean"] == len(d["text_clean"])


def test_ngram_repetition_stats_hand_example(spark):
    """Hand-computed Gopher coverage fractions on a loop doc, a short
    doc (all-zero row must survive), and a no-repetition doc."""
    from chapterhousedb_spark.operators.text import ngram_repetition_stats

    df = spark.createDataFrame(
        [
            (1, "x y x y x y x y"),  # 8 tokens, 15 chars normalized
            (2, "hello"),            # too short for any n
            (3, "a b c d e f"),      # no repeated n-gram at all
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in ngram_repetition_stats(df).collect()
    }
    assert set(rows) == {1, 2, 3}
    r1 = rows[1]
    # "x y" x4 -> 4*3/15; tie "x y x"/"y x y" breaks lexicographically
    # to "x y x" (x3, len 5) -> 15/15; "x y x y" x3 (len 7) -> 21/15
    assert r1["top2gram_char_frac"] == pytest.approx(12 / 15)
    assert r1["top3gram_char_frac"] == pytest.approx(15 / 15)
    assert r1["top4gram_char_frac"] == pytest.approx(21 / 15)
    # both 5-grams appear twice (len 9): (2*9 + 2*9)/15; the 6-gram
    # "x y x y x y" twice (len 11): 22/15; 7+ grams never repeat
    assert r1["dup5gram_char_frac"] == pytest.approx(36 / 15)
    assert r1["dup6gram_char_frac"] == pytest.approx(22 / 15)
    assert r1["dup7gram_char_frac"] == 0.0
    assert r1["dup10gram_char_frac"] == 0.0
    for c, v in rows[2].items():
        if c != "doc_id":
            assert v == 0.0, c
    r3 = rows[3]
    assert r3["top2gram_char_frac"] == pytest.approx(3 / 11)  # any one bigram
    assert all(r3[f"dup{n}gram_char_frac"] == 0.0 for n in range(5, 11))


def test_ngram_repetition_stats_python_reference(spark):
    """Brute-force python replay of the documented semantics on mixed
    docs — every column, exact fractions."""
    from collections import Counter

    from chapterhousedb_spark.operators.text import ngram_repetition_stats

    texts = {
        10: "The  quick brown fox the quick brown fox jumps",
        11: "one two one two three one two one two three one two",
        12: "single",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict() for r in ngram_repetition_stats(df).collect()
    }

    def ref(text):
        import re

        norm = re.sub(r"\s+", " ", text.lower()).strip()
        toks = norm.split(" ")
        denom = max(len(norm), 1)
        out = {}
        for n in (2, 3, 4):
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if grams:
                cnt = Counter(grams)
                best = min(cnt, key=lambda g: (-cnt[g], g))
                out[f"top{n}gram_char_frac"] = cnt[best] * len(best) / denom
            else:
                out[f"top{n}gram_char_frac"] = 0.0
        for n in range(5, 11):
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            cnt = Counter(grams)
            mass = sum(c * len(g) for g, c in cnt.items() if c >= 2)
            out[f"dup{n}gram_char_frac"] = mass / denom
        return out

    for i, t in texts.items():
        want = ref(t)
        for c, v in want.items():
            assert got[i][c] == pytest.approx(v), (i, c)


def test_c4_line_filters_predicates(spark):
    """Every C4 predicate on one hand-built page, plus the page rule
    and the all-dropped degenerate (text_clean must be '', not null)."""
    from chapterhousedb_spark.operators.text import c4_line_filters

    page = "\n".join(
        [
            "This line has five words total.",        # kept
            "  Weird   spacing should still be kept here.  ",  # kept (collapsed)
            "no terminal punctuation so it drops",
            "Too few words.",
            "This {brace} line drops despite ending well.",
            "This javascript mention drops the line entirely.",
            "Lorem Ipsum boilerplate is dropped case-insensitively.",
            "",                                        # empty: never counted
            'Quoted lines ending like this stay kept."',
        ]
    )
    df = spark.createDataFrame(
        [(1, page), (2, "no punctuation here at all")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in c4_line_filters(df).collect()}
    r1 = rows[1]
    assert r1["text_clean"] == "\n".join(
        [
            "This line has five words total.",
            "Weird spacing should still be kept here.",
            'Quoted lines ending like this stay kept."',
        ]
    )
    assert r1["n_lines_kept"] == 3
    assert r1["n_lines_dropped"] == 5  # empty line is not a line
    assert r1["n_sentences"] == 3 and r1["keep"] is True
    r2 = rows[2]
    assert r2["text_clean"] == "" and r2["n_lines_kept"] == 0
    assert r2["n_lines_dropped"] == 1
    assert r2["n_sentences"] == 0 and r2["keep"] is False


def test_c4_line_filters_thresholds(spark):
    from chapterhousedb_spark.operators.text import c4_line_filters

    df = spark.createDataFrame(
        [(1, "One two three four.\nAlpha beta gamma delta epsilon.")],
        "doc_id long, text string",
    )
    strict = c4_line_filters(df).collect()[0]
    assert strict["n_lines_kept"] == 1  # 4-word line fails min_words=5
    loose = c4_line_filters(df, min_words=4, min_sentences=2).collect()[0]
    assert loose["n_lines_kept"] == 2 and loose["keep"] is True


def test_ngram_repetition_stats_validates_args(spark):
    from chapterhousedb_spark.operators.text import ngram_repetition_stats

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="both empty"):
        ngram_repetition_stats(df, top_ns=(), dup_ns=())
    with pytest.raises(ValueError, match=">= 1"):
        ngram_repetition_stats(df, top_ns=(0,), dup_ns=())
    df2 = spark.createDataFrame([(1, "a b")], "g long, text string")
    with pytest.raises(ValueError, match="collides"):
        ngram_repetition_stats(df2, id_col="g")


def test_repetition_stats_paragraph_ratio(spark):
    """Gopher's duplicate-paragraph ratio: blank-line-separated blocks
    compare after whitespace collapse, so reflowed copies count as
    duplicates; lines and paragraphs are independent signals."""
    from chapterhousedb_spark.operators.text import repetition_stats

    page = (
        "Alpha beta gamma.\n\n"
        "Alpha  beta   gamma.\n\n"      # same para, different spacing
        "Different paragraph here.\n\n"
        "unique line one\nunique line two"  # one para, two lines
    )
    r = repetition_stats(
        spark.createDataFrame([(1, page)], "doc_id long, text string")
    ).collect()[0]
    # 4 paras, 3 distinct -> 1 - 3/4
    assert r["dup_para_ratio"] == pytest.approx(0.25)
    # 5 non-empty lines, all distinct except the reflowed pair differs
    # textually -> dup_line_ratio 0 (paragraph collapse is what catches it)
    assert r["dup_line_ratio"] == 0.0
    assert r["n_lines"] == 5


def test_gopher_quality_stats_hand_computed(spark):
    """Each Gopher §A1.1 heuristic pinned on a constructed doc that
    isolates it, plus the empty-doc floor (ratios 0, keep False)."""
    from chapterhousedb_spark.operators.text import gopher_quality_stats

    df = spark.createDataFrame(
        [
            (1, "- a\n- b\n- c"),                       # all bullet lines
            (2, "first...\nsecond\nthird..."),           # 2/3 ellipsis lines
            (3, "### x ### y ### z"),                    # 9 symbols / 6 words
            (4, "12345 67890 11111"),                    # no alpha words
            (5, "the cat and dog that play with joy to be of use have fun"),
            (6, "rare uncommon lexicon entirely lacking connectives"),
            (7, ""),                                     # empty doc
            (8, "dot dot … dot ... and the end"),        # unicode + ascii ellipsis
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in gopher_quality_stats(df).collect()}
    assert r[1]["bullet_line_frac"] == 1.0 and r[1]["keep"] is False
    assert r[2]["ellipsis_line_frac"] == pytest.approx(2 / 3)
    assert r[2]["keep"] is False
    assert r[3]["symbol_word_ratio"] == 1.5  # 9 '#' over 6 words
    assert r[3]["alpha_word_frac"] == 0.5 and r[3]["keep"] is False
    assert r[4]["alpha_word_frac"] == 0.0 and r[4]["keep"] is False
    assert r[5]["stop_word_hits"] == 8 and r[5]["keep"] is True
    assert r[6]["stop_word_hits"] == 0 and r[6]["keep"] is False
    assert r[7]["n_words"] == 0 and r[7]["symbol_word_ratio"] == 0.0
    assert r[7]["keep"] is False
    # one '…' + one '...' = 2 symbols over 8 words; 'and'+'the' = 2 hits
    assert r[8]["symbol_word_ratio"] == 0.25
    assert r[8]["stop_word_hits"] == 2
    assert r[8]["keep"] is False  # 0.25 > 0.1 symbol threshold


def test_gopher_quality_stats_knobs_and_scan_shape(spark):
    """Thresholds are knobs, and the operator is a single-scan pure-JVM
    projection: no exchange, no Python eval in the plan."""
    from chapterhousedb_spark.operators.text import gopher_quality_stats

    df = spark.createDataFrame(
        [(1, "dot dot … dot ... and the end")], "doc_id long, text string"
    )
    # '…'/'...' count as words without alpha: 6/8 = 0.75 alpha frac,
    # so both knobs must loosen for the doc to pass
    loose = gopher_quality_stats(
        df, max_symbol_word_ratio=0.5, min_alpha_word_frac=0.7
    ).collect()[0]
    assert loose["keep"] is True
    out = gopher_quality_stats(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_bpe_prune_to_cap_trains_identical_merges(spark):
    """The frequency-floor pre-prune (VERDICT r9 #6): a word table 10x
    over the driver cap whose tail is freq-1 words with symbols
    DISJOINT from the head's (each tail pair below the count-2 stop
    rule, sharing no pair with a survivor) must train merges identical
    to the exact iterative path over the FULL table — the documented
    no-effect condition. Also pins the floor choice: survivors = the
    head (freq >= 2), tail pruned."""
    from pyspark.sql import Row

    from chapterhousedb_spark.operators.text import bpe_train_from_words

    head = [
        Row(word="banana", freq=400),
        Row(word="bandana", freq=300),
        Row(word="cabana", freq=200),
        Row(word="nababan", freq=100),
        Row(word="anan", freq=50),
    ]
    # 50 junk words, all freq 1, over unicode symbols the head never
    # uses; every char distinct within a word -> all tail pairs have
    # count 1 (< 2), selectable never, shared with the head never
    tail = [
        Row(word="".join(chr(0x4E00 + 7 * i + j) for j in range(4)), freq=1)
        for i in range(50)
    ]
    full = spark.createDataFrame(head + tail)
    cap = 5  # 55 rows = 11x over the cap
    exact = bpe_train_from_words(full, 8, driver_max_words=0)
    pruned = bpe_train_from_words(
        full, 8, driver_max_words=cap, prune_to_cap=True
    )
    assert pruned == exact and len(exact) == 8
    # without the prune, the same call takes the per-merge-job path
    # and still agrees (the exactness baseline the prune is bounded by)
    iterative = bpe_train_from_words(full, 8, driver_max_words=cap)
    assert iterative == exact


def test_bpe_prune_to_cap_falls_back_when_top_class_overflows(spark):
    """If even the most frequent class alone overflows the cap, no
    floor exists and the exact iterative path must run (not a silent
    truncation)."""
    from pyspark.sql import Row

    from chapterhousedb_spark.operators.text import bpe_train_from_words

    rows = [Row(word=w, freq=7) for w in ("banana", "bandana", "cabana")]
    df = spark.createDataFrame(rows)
    got = bpe_train_from_words(df, 3, driver_max_words=2, prune_to_cap=True)
    want = bpe_train_from_words(df, 3, driver_max_words=0)
    assert got == want and len(want) == 3


def _bfd_reference(rows, budget):
    """Sequential best-fit-decreasing reference: rows = [(id, n)]."""
    import bisect

    rows = sorted(rows, key=lambda r: (-r[1], r[0]))
    open_bins, n_bins, out = [], 0, {}
    for i, n in rows:
        j = bisect.bisect_left(open_bins, (n, -1))
        if j < len(open_bins):
            rem, b = open_bins.pop(j)
        else:
            rem, b = budget, n_bins
            n_bins += 1
        out[i] = (b, budget - rem)
        bisect.insort(open_bins, (rem - n, b))
    return out


def test_pack_best_fit_matches_reference_and_invariants(spark):
    """Document-integrity packing: equals the sequential BFD reference
    per shard, never overfills a pack, never splits a doc (one row per
    doc by construction), offsets are the in-pack prefix sums, and the
    layout is partitioning-invariant."""
    from chapterhousedb_spark.operators.text import pack_best_fit

    rows = [(i, " ".join(f"w{j}" for j in range(1 + (i * 13) % 60))) for i in range(300)]
    rows.append((999, "   "))  # empty doc packs too (0 tokens)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_best_fit(df, budget=64, n_shards=4).collect()
    assert len(out) == len(rows)
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        want = _bfd_reference(
            [(r["doc_id"], r["n_tokens"]) for r in shard_rows], 64
        )
        for r in shard_rows:
            assert (r["pack_id"], r["pack_offset"]) == want[r["doc_id"]], r
        # no pack overfills; offsets are the prefix sums within a pack
        packs: dict[int, list] = {}
        for r in shard_rows:
            packs.setdefault(r["pack_id"], []).append(r)
        for members in packs.values():
            assert sum(m["n_tokens"] for m in members) <= 64
            members.sort(key=lambda m: m["pack_offset"])
            run = 0
            for m in members:
                assert m["pack_offset"] == run
                run += m["n_tokens"]
    # partitioning invariance
    again = sorted(map(tuple, pack_best_fit(df.repartition(11), budget=64, n_shards=4).collect()))
    assert again == sorted(map(tuple, out))


def test_pack_best_fit_padding_beats_first_fit_id_order(spark):
    """BFD earns its sort: against a naive first-fit in id order on a
    bimodal length mix, best-fit-decreasing must not use more packs
    (and on this construction uses strictly fewer)."""
    import bisect

    from chapterhousedb_spark.operators.text import pack_best_fit

    # 40 big docs (36 tokens) + 40 small (28): BFD pairs big+small
    # into 64-token packs exactly; id-order first-fit pairs
    # same-size neighbors and wastes space
    rows = [(i, " ".join(["w"] * (36 if i % 2 == 0 else 28))) for i in range(80)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_best_fit(df, budget=64, n_shards=1).collect()
    n_packs_bfd = len({r["pack_id"] for r in out})

    open_bins, n_ff = [], 0
    for i, text in rows:  # first-fit, id order
        n = len(text.split())
        for k in range(len(open_bins)):
            if open_bins[k] >= n:
                open_bins[k] -= n
                break
        else:
            open_bins.append(64 - n)
            n_ff += 1
    assert n_packs_bfd == 40  # perfect pairing
    assert n_packs_bfd <= n_ff


def test_pack_best_fit_long_doc_contract(spark):
    from chapterhousedb_spark.operators.text import pack_best_fit

    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 100)), (2, "a b c")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="exceed budget"):
        pack_best_fit(df, budget=64).collect()
    kept = pack_best_fit(df, budget=64, long_docs="drop").collect()
    assert [r["doc_id"] for r in kept] == [2]
    with pytest.raises(ValueError, match="long_docs"):
        pack_best_fit(df, budget=64, long_docs="nope")


# ------------------------------------------------------- unigram LM tokenizer


def test_uni_viterbi_dp_and_ties():
    """Lattice DP picks the max-score path; equal-score ties keep the
    LONGEST piece (strict-> update over ascending start positions);
    unseen chars consume one UNK char each."""
    from chapterhousedb_spark.operators.text import _uni_viterbi

    m = {"a": -1.0, "b": -2.0, "ab": -2.5}
    assert _uni_viterbi("ab", m, 2) == (["ab"], -2.5)
    # tie: ['ab'] = -2.0 == ['a','b'] = -2.0 -> longest piece wins
    tie = {"a": -1.0, "b": -1.0, "ab": -2.0}
    assert _uni_viterbi("ab", tie, 2) == (["ab"], -2.0)
    # multigram loses when singles are cheaper
    m2 = {"a": -0.5, "b": -0.5, "ab": -2.0}
    assert _uni_viterbi("ab", m2, 2) == (["a", "b"], -1.0)
    # unk fallback: 'x' unseen
    ps, s = _uni_viterbi("axb", {"a": -1.0, "b": -1.0}, 2, unk_logp=-20.0)
    assert ps == ["a", "x", "b"] and s == -22.0


def test_unigram_train_learns_frequent_pieces(spark):
    """A corpus dominated by one word must learn that word (or its
    substrings) as multi-char pieces; singles always survive."""
    from chapterhousedb_spark.operators.text import unigram_train

    rows = [("sparky sparky sparky sparky row",)] * 20 + [("key row",)] * 3
    df = spark.createDataFrame(rows, "text string")
    model = unigram_train(df, vocab_size=20, max_piece_len=6)
    pieces = {p for p, _ in model}
    chars = {c for r in rows for c in r[0] if c != " "}
    assert chars <= pieces
    assert len(pieces) <= 20
    assert any(len(p) > 1 for p in pieces)
    # the dominant word's material is in the vocab as multigrams
    assert any(p in "sparky" and len(p) > 1 for p in pieces), pieces
    # probabilities normalize: sum(exp(logp)) == 1 up to float error
    import math

    assert abs(sum(math.exp(lp) for _, lp in model) - 1.0) < 1e-9


def test_unigram_distributed_equals_sequential(spark):
    """The bpe_train discipline: the iterative Spark path (mapInPandas
    E-step, integer-usage shuffle, driver M-step) must produce the
    BIT-identical model to the sequential Kudo reference on the same
    word table."""
    from chapterhousedb_spark.operators.text import (
        _unigram_train_driver,
        unigram_train_from_words,
    )

    words = [
        ("spark", 40), ("sparky", 25), ("park", 18), ("parquet", 11),
        ("query", 30), ("queue", 7), ("row", 50), ("rows", 22),
        ("order", 13), ("sort", 29), ("sorted", 9), ("key", 31),
    ]
    df = spark.createDataFrame(words, "word string, freq long")
    seq = _unigram_train_driver(list(words), 30, em_iters=2, shrink=0.75)
    dist = unigram_train_from_words(
        df, 30, em_iters=2, shrink=0.75, driver_max_words=0
    )
    assert dist == seq  # exact: pieces AND float logps
    # and the driver-collect fast path agrees too
    fast = unigram_train_from_words(df, 30)
    assert fast == seq


def test_unigram_train_guards(spark):
    from chapterhousedb_spark.operators.text import (
        unigram_train_from_words,
    )
    import pytest as _pytest

    df = spark.createDataFrame([("abc", 5)], "word string, freq long")
    with _pytest.raises(ValueError, match="alphabet"):
        unigram_train_from_words(df, 2)
    with _pytest.raises(ValueError, match="shrink"):
        unigram_train_from_words(df, 10, shrink=1.5)
    with _pytest.raises(ValueError, match="max_piece_len"):
        unigram_train_from_words(df, 10, max_piece_len=1)


def test_unigram_segment_output(spark):
    from chapterhousedb_spark.operators.text import unigram_segment

    model = [("a", -1.0), ("b", -2.0), ("ab", -2.5), ("c", -3.0)]
    df = spark.createDataFrame(
        [(1, "ab c"), (2, "AB  \t c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in unigram_segment(df, model).collect()}
    assert list(got[1]["pieces"]) == ["ab", "c"]
    assert got[1]["n_pieces"] == 2 and got[1]["score"] == -5.5
    # normalize_text folds case + whitespace -> same as doc 1
    assert list(got[2]["pieces"]) == ["ab", "c"] and got[2]["score"] == -5.5
    assert list(got[3]["pieces"]) == [] and got[3]["score"] == 0.0
    assert list(got[4]["pieces"]) == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collides"):
        unigram_segment(
            df.withColumnRenamed("doc_id", "score"), model, id_col="score"
        )
    with _pytest.raises(ValueError, match="empty model"):
        unigram_segment(df, [])


def test_unigram_segment_matches_viterbi_reference(spark):
    """Segmenting through Spark == calling _uni_viterbi per word —
    the operator adds no arithmetic of its own."""
    from chapterhousedb_spark.operators.text import (
        _uni_viterbi,
        unigram_segment,
        unigram_train,
    )

    rows = [
        (1, "spark row sort key"),
        (2, "query the sorted rows"),
        (3, "parquet queue order"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = unigram_train(df, vocab_size=25)
    lp = dict(model)
    ml = max(len(p) for p, _ in model)
    got = {r["doc_id"]: r for r in unigram_segment(df, model).collect()}
    for did, text in rows:
        want_pieces, want_score = [], 0.0
        for w in text.split():
            ps, s = _uni_viterbi(w, lp, ml)
            want_pieces.extend(ps)
            want_score += s
        assert list(got[did]["pieces"]) == want_pieces, did
        assert got[did]["score"] == want_score, did


# ---------------------------------------------------- Kneser-Ney bigram LM


def _kn_reference(docs, discount=0.75):
    """Sequential interpolated-KN reference: returns (probs dict
    (w1,w2)->p, per-doc (n_bigrams, sum_p) with the position-ordered
    left fold)."""
    import collections

    pairs_per_doc = {}
    c_bg = collections.Counter()
    for did, text in docs:
        toks = text.lower().split()
        ps = list(zip(toks, toks[1:]))
        pairs_per_doc[did] = ps
        c_bg.update(ps)
    c_w1 = collections.Counter()
    n1p_w1 = collections.Counter()
    n1p_dot = collections.Counter()
    for (w1, w2), c in c_bg.items():
        c_w1[w1] += c
        n1p_w1[w1] += 1
        n1p_dot[w2] += 1
    n_distinct = len(c_bg)
    probs = {}
    for (w1, w2), c in c_bg.items():
        probs[(w1, w2)] = (
            max(float(c) - discount, 0.0)
            + (discount * float(n1p_w1[w1]))
            * (float(n1p_dot[w2]) / float(n_distinct))
        ) / float(c_w1[w1])
    out = {}
    for did, ps in pairs_per_doc.items():
        if not ps:
            continue
        s = 0.0
        for p in ps:
            s += probs[p]
        out[did] = (len(ps), s)
    return probs, out


_KN_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the cat"),
    (3, "a dog and the cat and a mat"),
    (4, "san francisco san francisco san jose"),
    (5, "one"),  # < 2 tokens -> no row
    (6, "the cat sat"),
]


def test_kneser_ney_matches_sequential_reference(spark):
    """Distributed KN == the sequential closed-form reference,
    bit-exactly (integer counts + the same float op order)."""
    from chapterhousedb_spark.operators.text import kneser_ney_bigram

    df = spark.createDataFrame(_KN_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_kn_prob"], r["mean_kn_prob"])
        for r in kneser_ney_bigram(df).collect()
    }
    _, want = _kn_reference(_KN_DOCS)
    assert set(got) == set(want)
    for did, (n, s) in want.items():
        assert got[did][0] == n, did
        assert got[did][1] == s, (did, got[did][1], s)
        assert got[did][2] == s / n, did


def test_kneser_ney_sums_to_one_per_context(spark):
    """Interpolated KN is a proper distribution: for every context w1,
    sum over the SEEN vocab of p(w2|w1)'s discounted part plus
    lambda(w1) * sum(p_cont) == 1 (continuation probs sum to 1 over
    seen bigram types, so contexts whose followers cover the vocab sum
    to 1 exactly up to float tolerance)."""
    import collections

    probs, _ = _kn_reference(_KN_DOCS)
    # p(w2|w1) for UNSEEN (w1,w2) pairs = lambda(w1) * p_cont(w2);
    # extend the sum over the full seen-w2 vocab per context
    c_bg = collections.Counter()
    for _, text in _KN_DOCS:
        toks = text.lower().split()
        c_bg.update(zip(toks, toks[1:]))
    n1p_w1 = collections.Counter()
    c_w1 = collections.Counter()
    n1p_dot = collections.Counter()
    for (w1, w2), c in c_bg.items():
        c_w1[w1] += c
        n1p_w1[w1] += 1
        n1p_dot[w2] += 1
    n_distinct = len(c_bg)
    vocab_w2 = set(n1p_dot)
    for w1 in c_w1:
        lam = 0.75 * n1p_w1[w1] / c_w1[w1]
        total = 0.0
        for w2 in vocab_w2:
            if (w1, w2) in probs:
                total += probs[(w1, w2)]
            else:
                total += lam * (n1p_dot[w2] / n_distinct)
        assert abs(total - 1.0) < 1e-12, (w1, total)


def test_kneser_ney_surprisal_and_guards(spark):
    """surprisal=True adds mean -log2 p, pinned against the python
    reference (log stays out of gated sets — the bigram_lm_stats
    boundary); discount is range-checked."""
    import math

    import pytest as _pytest

    from chapterhousedb_spark.operators.text import kneser_ney_bigram

    df = spark.createDataFrame(_KN_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["kn_surprisal"]
        for r in kneser_ney_bigram(df, surprisal=True).collect()
    }
    probs, _ = _kn_reference(_KN_DOCS)
    for did, text in _KN_DOCS:
        toks = text.lower().split()
        ps = list(zip(toks, toks[1:]))
        if not ps:
            assert did not in got
            continue
        want = sum(-math.log2(probs[p]) for p in ps) / len(ps)
        assert abs(got[did] - want) < 1e-12, did
    with _pytest.raises(ValueError, match="discount"):
        kneser_ney_bigram(df, discount=1.5)


def test_bpe_segment_fixed_paths_agree(spark):
    """The bpe_segment_fixed gate applies the pinned merge list through
    the PRODUCTION pandas rank-greedy path; its DuckDB oracle replays
    merges IN ORDER. Those agree only under the trained-merge
    invariant the pinned list must satisfy (every operand is a base
    char or an earlier merge's product) — pin JVM fold == pandas
    rank-greedy == sequential in-order replay on the scaffold words,
    so an edit to _BPE_FIXED_MERGES that breaks the invariant fails
    here, not as an opaque hash mismatch."""
    from chapterhousedb_spark.operators.text import bpe_segment
    from chapterhousedb_spark.workload.llm import (
        _BPE_FIXED_MERGES,
        _BPE_FIXED_WORDS,
    )

    def in_order(word):
        syms = list(word) + ["</w>"]
        for left, right in _BPE_FIXED_MERGES:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    # invariant check on the list itself: operands must pre-exist
    available = set("abcdefghijklmnopqrstuvwxyz") | {"</w>"}
    for left, right in _BPE_FIXED_MERGES:
        assert left in available and right in available, (left, right)
        available.add(left + right)

    df = spark.createDataFrame(
        [(w,) for w in _BPE_FIXED_WORDS], "word string"
    )
    for use_pandas in (True, False):
        got = {
            r["word"]: list(r["tokens"])
            for r in bpe_segment(
                df,
                _BPE_FIXED_MERGES,
                text_col="word",
                id_col="word",
                use_pandas=use_pandas,
            ).collect()
        }
        for w in _BPE_FIXED_WORDS:
            assert got[w] == in_order(w), (use_pandas, w, got[w])
    # every pinned merge actually fires somewhere in the scaffold
    fired = set()
    for w in _BPE_FIXED_WORDS:
        fired.update(in_order(w))
    for left, right in _BPE_FIXED_MERGES:
        assert left + right in fired, (left, right)


def test_wordpiece_segment_semantics(spark):
    """Greedy longest-match-first vs a sequential reference on the
    pinned gate vocab: multi-piece beats shorter prefixes, '##'
    continuations apply after position 0, a word with no match
    anywhere (or over max_word_len) becomes ONE [UNK], and the output
    contract matches bpe/unigram (id, tokens, n_tokens)."""
    from chapterhousedb_spark.operators.text import wordpiece_segment
    from chapterhousedb_spark.workload.llm import _WP_FIXED_VOCAB

    starts = {p for p in _WP_FIXED_VOCAB if not p.startswith("##")}
    conts = {p[2:] for p in _WP_FIXED_VOCAB if p.startswith("##")}

    def ref(word, max_len=100):
        if not word or len(word) > max_len:
            return ["[UNK]"]
        toks, pos = [], 0
        while pos < len(word):
            table = starts if pos == 0 else conts
            end = len(word)
            while end > pos and word[pos:end] not in table:
                end -= 1
            if end == pos:
                return ["[UNK]"]
            toks.append(word[pos:end] if pos == 0 else "##" + word[pos:end])
            pos = end
        return toks

    words = [
        "the", "there", "thing", "data", "database", "sorting",
        "stream", "whale", "quay", "query", "a", "x" * 101,
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (list(r["tokens"]), r["n_tokens"])
        for r in wordpiece_segment(
            df, _WP_FIXED_VOCAB, text_col="word", id_col="word"
        ).collect()
    }
    for w in words:
        expect = ref(w)
        assert got[w] == (expect, len(expect)), (w, got[w], expect)
    # load-bearing greedy cases, pinned explicitly
    assert got["the"][0] == ["the"]  # not ['th', '##e'] or ['t', ...]
    assert got["sorting"][0] == ["sort", "##ing"]
    assert got["stream"][0] == ["str", "##e", "##a", "##m"]
    assert got["quay"][0] == ["[UNK]"]  # no 'q' piece in either form
    assert got["x" * 101][0] == ["[UNK]"]  # BERT max-word-length rule
    import pytest as _pytest

    with _pytest.raises(ValueError, match="id_col"):
        wordpiece_segment(df, _WP_FIXED_VOCAB, text_col="word", id_col="tokens")
    with _pytest.raises(ValueError, match="word-initial"):
        wordpiece_segment(df, ["##a"], text_col="word", id_col="word")


def test_chunk_text_semantics(spark):
    """Pinned chunking semantics (the chunk_overlap_docs oracle's
    contract): chunk i covers [i*stride, i*stride+chunk); the final
    chunk may be short; zero-token and NULL docs emit nothing; case
    and punctuation are preserved (chunking feeds an embedder, not the
    dedup normalizer); default stride = chunk (no overlap)."""
    import pytest

    from chapterhousedb_spark.operators.text import chunk_text

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "  Mixed,  CASE!  kept "),
            (3, "   "),
            (4, None),
            (5, "solo"),
        ],
        "doc_id long, text string",
    )
    got = [
        tuple(r)
        for r in chunk_text(df, chunk_tokens=3, stride=2)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    ]
    assert got == [
        (1, 0, 0, 3, "a b c"),
        (1, 1, 2, 3, "c d e"),
        (1, 2, 4, 3, "e f g"),
        (2, 0, 0, 3, "Mixed, CASE! kept"),
        (5, 0, 0, 1, "solo"),
    ]
    # no-overlap default; exact-multiple boundary emits no empty chunk
    got = [
        tuple(r)
        for r in chunk_text(df.filter("doc_id = 1"), chunk_tokens=7)
        .collect()
    ]
    assert got == [(1, 0, 0, 7, "a b c d e f g")]
    got = [
        tuple(r)
        for r in chunk_text(df.filter("doc_id = 1"), chunk_tokens=3)
        .orderBy("chunk_idx")
        .collect()
    ]
    assert [g[4] for g in got] == ["a b c", "d e f", "g"]
    # stride > chunk_tokens (gapped sampling): no degenerate empty
    # chunk when the formula lands a start exactly past the end
    got = [
        tuple(r)
        for r in chunk_text(df.filter("doc_id = 1"), chunk_tokens=2, stride=3)
        .orderBy("chunk_idx")
        .collect()
    ]
    assert got == [
        (1, 0, 0, 2, "a b"),
        (1, 1, 3, 2, "d e"),
        (1, 2, 6, 1, "g"),
    ]
    got = [
        tuple(r)
        for r in chunk_text(df.filter("doc_id = 5"), chunk_tokens=1, stride=5)
        .collect()
    ]
    assert got == [(5, 0, 0, 1, "solo")]
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_text(df, chunk_tokens=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_text(df, chunk_tokens=3, stride=0)
