"""Empty-input robustness: every operator must return an empty result
with the right schema (not crash) on zero-row inputs — the shape of a
fresh landing zone or a filter that matched nothing."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from chapterhousedb_spark.operators.asof import asof_join
from chapterhousedb_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from chapterhousedb_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_ann_topk,
    srp_ann_topk,
)
from chapterhousedb_spark.operators.text import (
    lang_id,
    repetition_stats,
    text_stats,
    token_chunks,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)
EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


@pytest.fixture(scope="module")
def empty_embs(spark):
    return spark.createDataFrame([], EMB_SCHEMA)


@pytest.mark.parametrize(
    "op",
    [
        exact_dedup,
        lambda d: minhash_near_dup_pairs(d, persist=False),
        lambda d: simhash_near_dup_pairs(d, persist=False),
        lambda d: ngram_jaccard_pairs(d, max_doc_freq=10, persist=False),
        text_stats,
        lang_id,
        repetition_stats,
        token_chunks,
    ],
)
def test_text_operators_on_empty(empty_docs, op):
    assert op(empty_docs).count() == 0


@pytest.mark.parametrize(
    "op",
    [
        lambda d: cosine_topk(d, [1.0] * 4),
        lambda d: srp_ann_topk(d, [1.0] * 4, planes=4),
        lambda d: embedding_near_dup_pairs(d, planes=4, persist=False),
        lambda d: ivf_ann_topk(d, [1.0] * 4, n_cells=2),
    ],
)
def test_similarity_operators_on_empty(empty_embs, op):
    assert op(empty_embs).count() == 0


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame([(1, 10, 5.0)], ["id", "k", "t"])
    right = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("rk", T.LongType()),
                T.StructField("rt", T.DoubleType()),
                T.StructField("v", T.StringType()),
            ]
        ),
    )
    out = asof_join(left, right, left_on="t", right_on="rt", left_by="k", right_by="rk")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["v"] is None  # left preserved, null fill


def test_asof_join_empty_left(spark):
    left = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("k", T.LongType()),
                T.StructField("t", T.DoubleType()),
            ]
        ),
    )
    right = spark.createDataFrame([(10, 4.0, "x")], ["rk", "rt", "v"])
    out = asof_join(left, right, left_on="t", right_on="rt", left_by="k", right_by="rk")
    assert out.count() == 0


def test_connected_components_empty(spark):
    from chapterhousedb_spark.operators.cluster import connected_components

    e = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(e).count() == 0
    # empty edges but real nodes: all singletons
    n = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {r["id"]: r["component"] for r in connected_components(e, nodes=n).collect()}
    assert got == {1: 1, 2: 2}


def test_dedup_survivors_empty(spark, empty_docs):
    from chapterhousedb_spark.operators.cluster import dedup_survivors

    e = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup_survivors(empty_docs, e)
    assert out.columns == ["doc_id", "cluster_size"]
    assert out.count() == 0


def test_sampling_empty(spark, empty_docs):
    from chapterhousedb_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
        train_val_test_split,
    )

    assert deterministic_sample(empty_docs, 0.5).count() == 0
    out = train_val_test_split(empty_docs)
    assert out.columns == ["doc_id", "text", "split"]
    assert out.count() == 0
    df = spark.createDataFrame([], "doc_id long, source string")
    assert stratified_sample(df, {"a": 1.0}).count() == 0


def test_round5_operators_empty(spark, empty_docs):
    """duplicate_spans / pack_materialize / contamination_short_probes
    on empty (and all-short) inputs: empty out, stable schemas."""
    from chapterhousedb_spark.operators.dedup import (
        contamination_short_probes,
        duplicate_spans,
    )
    from chapterhousedb_spark.operators.text import pack_materialize

    out = duplicate_spans(empty_docs, span_tokens=8)
    assert out.columns == ["doc_id", "span_start", "span_len", "n_windows"]
    assert out.count() == 0
    # docs all shorter than the span emit no windows at all
    short = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert duplicate_spans(short, span_tokens=8).count() == 0

    out = pack_materialize(empty_docs, budget=64)
    assert out.columns == ["shard", "pack_id", "n_tokens", "tokens"]
    assert out.count() == 0

    out = contamination_short_probes(empty_docs, ngram_k=8)
    assert out.columns == ["probe_id", "n_tokens"]
    assert out.count() == 0


def test_round6_operators_on_empty(spark):
    """vocabulary/tfidf/training_order/grouped_sample/histogram/diff/
    rollup/zorder all return empty-with-schema on zero-row inputs."""
    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.diff import diff_summary, table_diff
    from chapterhousedb_spark.operators.profile import histogram
    from chapterhousedb_spark.operators.rollup import (
        distinct_merge,
        distinct_partials,
        rollup_final,
        rollup_merge,
        rollup_partials,
    )
    from chapterhousedb_spark.operators.sampling import grouped_sample, training_order
    from chapterhousedb_spark.operators.text import tfidf_top_terms, vocabulary
    from chapterhousedb_spark.operators.zorder import zorder_cluster

    empty_docs = spark.createDataFrame([], DOC_SCHEMA)
    assert vocabulary(empty_docs).count() == 0
    assert vocabulary(empty_docs, top_k=5).columns == ["token", "freq"]
    t = tfidf_top_terms(empty_docs)
    assert t.count() == 0
    assert t.columns == ["id", "token", "tf", "df", "score", "rank"]
    assert training_order(empty_docs).count() == 0
    src = empty_docs.withColumn("src", F.lit("a"))
    assert grouped_sample(src, "src", k=3).count() == 0

    nums = spark.createDataFrame([], T.StructType([T.StructField("x", T.DoubleType())]))
    assert histogram(nums, "x", 0.0, 10.0, nbins=4).count() == 0

    d = table_diff(empty_docs, empty_docs, ["doc_id"])
    assert d.count() == 0 and d.columns == ["doc_id", "change_type"]
    assert diff_summary(d).count() == 0
    # diff against a non-empty side: everything is added / removed
    one = spark.createDataFrame([(1, "t")], DOC_SCHEMA)
    assert [r["change_type"] for r in table_diff(empty_docs, one, ["doc_id"]).collect()] == ["added"]
    assert [r["change_type"] for r in table_diff(one, empty_docs, ["doc_id"]).collect()] == ["removed"]

    ev = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("g", T.StringType()),
                T.StructField("v", T.DoubleType()),
            ]
        ),
    )
    p = rollup_partials(ev, ["g"], {"sv": "v"})
    assert p.count() == 0
    assert rollup_final(rollup_merge(p, ["g"], ["sv"]), ["sv"]).count() == 0
    assert distinct_merge(distinct_partials(ev, ["g"], "v"), ["g"]).count() == 0

    two = spark.createDataFrame(
        [], T.StructType([T.StructField("u", T.LongType()), T.StructField("w", T.LongType())])
    )
    # approxQuantile on empty input yields no boundaries -> bucket 0s
    assert zorder_cluster(two, ["u", "w"], n_files=2).count() == 0


def test_round7_operators_on_empty(spark, empty_docs):
    """Round-7 operators on zero-row inputs: empty results with correct
    schemas, no crashes."""
    from chapterhousedb_spark.operators.cluster import components_update
    from chapterhousedb_spark.operators.sampling import token_budget_mix
    from chapterhousedb_spark.operators.text import (
        rarity_stats,
        vocabulary_merge,
        vocabulary_partials,
    )

    # rarity over an empty corpus: zero rows, full schema
    r = rarity_stats(empty_docs)
    assert r.count() == 0
    assert set(r.columns) == {
        "doc_id", "n_distinct", "hapax_frac", "common_frac", "mean_df",
    }
    # vocabulary partials of nothing merge to nothing
    vp = vocabulary_partials(empty_docs)
    assert vocabulary_merge(vp, vp).count() == 0
    # budget mix with an empty corpus keeps nothing
    mix_in = empty_docs.selectExpr(
        "doc_id", "'a' AS source", "CAST(0 AS LONG) AS n_tok"
    )
    assert token_budget_mix(mix_in, {"a": 100}, token_col="n_tok").count() == 0
    # components_update: empty labels + empty edges + some new nodes ->
    # singleton labels; fully empty -> empty
    empty_lab = spark.createDataFrame([], "id long, component long")
    empty_edges = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(5,), (9,)], "doc_id long")
    got = {
        r["id"]: r["component"]
        for r in components_update(
            empty_lab, empty_edges, new_nodes=nodes
        ).collect()
    }
    assert got == {5: 5, 9: 9}
    assert components_update(empty_lab, empty_edges).count() == 0


def test_round8_operators_on_empty(spark, empty_docs, tmp_path):
    """Round-8 operators on zero-row inputs: empty results with
    correct schemas, no crashes."""
    from chapterhousedb_spark.operators.dedup import two_stage_dedup
    from chapterhousedb_spark.operators.similarity import (
        srp_probe_topk,
        srp_read_index,
        srp_write_index,
    )
    from chapterhousedb_spark.operators.text import bpe_segment

    out = two_stage_dedup(empty_docs, persist=False)
    assert out.count() == 0
    assert set(out.columns) == {
        "id_a", "id_b", "n_tok_a", "n_tok_b", "n_common",
        "jaccard_tokens", "containment", "len_ratio",
    }
    # explicit empty candidate relation short-circuits the same way
    cands = spark.createDataFrame([], "id_a long, id_b long")
    assert two_stage_dedup(empty_docs, candidates=cands).count() == 0

    # pandas BPE segmenter over an empty corpus: zero rows, schema kept
    merges = [("a", "b")] * 20  # > threshold -> pandas path
    seg = bpe_segment(empty_docs, merges)
    assert seg.count() == 0
    assert seg.columns == ["doc_id", "tokens", "n_tokens"]

    # SRP index over an empty corpus: probe returns zero rows
    empty_embs = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    path = str(tmp_path / "srp_empty")
    srp_write_index(empty_embs, path, planes=4)
    corpus, meta = srp_read_index(spark, path)
    assert srp_probe_topk(corpus, meta, [0.0] * 64, k=5, multiprobe=4).count() == 0


def test_jpeg_codec_property_random_images():
    """Hypothesis: random small images round-trip _encode_jpeg ->
    _decode_jpeg_pixels within the flat-quant DCT rounding bound,
    PER PIXEL (gray exact to +-2; 4:4:4 color to +-4 after the
    YCbCr double rounding)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from chapterhousedb_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        _encode_jpeg,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 20),
        gray=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(w, h, gray, seed):
        rng = np.random.default_rng(seed)
        c = 1 if gray else 3
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        got, samp = _decode_jpeg_pixels(_encode_jpeg(img))
        # unsubsampled encode -> every component at full (1, 1) rate
        assert set(samp) == {(1, 1)} and got.shape == img.shape
        err = np.abs(got.astype(int) - img.astype(int)).max()
        assert err <= (2 if gray else 4), err

    roundtrip()
