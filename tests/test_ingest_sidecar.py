"""Fingerprint-sidecar admission path (VERDICT r13 #1): admit_batch
gates against a PERSISTED fingerprint table seeded by init_ingest and
upserted on every commit, so corpus payloads are fingerprinted (for
images: decoded) exactly once, at write time — never per micro-batch."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.ingest import (
    admit_batch,
    fingerprint_kit,
    init_ingest,
    read_fingerprints,
)
from chapterhousedb_spark.streaming.batcher import (
    _write_latest_marker,
    read_versioned_base,
)

T0 = "the quick brown fox jumps over the lazy dog again and again " * 3
T1 = "completely different content about spark and parquet tables " * 3
NOVEL1 = "a genuinely new document with its own unique words " * 3
NOVEL2 = "another new arrival entirely unlike anything before it " * 3


def _seed(spark):
    return spark.createDataFrame(
        [Row(doc_id=0, text=T0, version=0), Row(doc_id=1, text=T1, version=0)]
    )


def _batches(spark):
    b1 = spark.createDataFrame(
        [
            Row(doc_id=100, text=T0 + " tail", version=1),  # dup of 0
            Row(doc_id=101, text=NOVEL1, version=1),  # admit
        ]
    )
    b2 = spark.createDataFrame(
        [
            Row(doc_id=200, text=NOVEL1 + " tweak", version=2),  # dup of 101
            Row(doc_id=201, text=NOVEL2, version=2),  # admit
        ]
    )
    return b1, b2


def test_minhash_sidecar_matches_default_gate(spark, tmp_path):
    """The default (kit-less) sidecar path is the MinHash kit with
    admit_batch's own params — chained admissions must be IDENTICAL to
    the raw-corpus default gate on the same batches, including a
    batch-2 near-dup of a batch-1 admission (proving the sidecar
    really advanced at the v1 commit)."""
    b1, b2 = _batches(spark)
    raw_root = str(tmp_path / "raw")
    sc_root = str(tmp_path / "side")
    fp_root = str(tmp_path / "side_fp")
    init_ingest(_seed(spark), raw_root)
    mh_fp, _mh_pairs = fingerprint_kit("minhash", id_col="doc_id")
    init_ingest(
        _seed(spark), sc_root,
        fingerprint_root=fp_root, fingerprint_fn=mh_fp,
    )
    for b in (b1, b2):
        r_raw = admit_batch(b, raw_root)
        r_sc = admit_batch(b, sc_root, fingerprint_root=fp_root)
        assert r_raw["n_admitted"] == r_sc["n_admitted"]
        assert r_raw["n_rejected"] == r_sc["n_rejected"]
    raw_final, _ = read_versioned_base(spark, raw_root)
    sc_final, ver = read_versioned_base(spark, sc_root)
    assert ver == 2
    ids = {r["doc_id"] for r in sc_final.collect()}
    assert ids == {r["doc_id"] for r in raw_final.collect()} == {0, 1, 101, 201}
    # sidecar rows track the corpus exactly: one signature per live doc
    fp, fp_ver = read_fingerprints(spark, sc_root, fp_root)
    assert fp_ver == 2
    assert {r["doc_id"] for r in fp.collect()} == ids
    # and the signatures are the real minhash signatures (spot-check
    # one against a fresh computation)
    fresh = mh_fp(sc_final.filter("doc_id = 201")).collect()[0]
    stored = fp.filter("doc_id = 201").collect()[0]
    assert list(stored["sig"]) == list(fresh["sig"])


def _gray_png(seed: int) -> bytes:
    from chapterhousedb_spark.operators.multimodal import encode_png_rgb

    px = bytearray()
    for y in range(8):
        for x in range(8):
            v = int(
                hashlib.md5(f"sidecar:{seed}:{y}:{x}".encode()).hexdigest()[:2],
                16,
            )
            px += bytes((v, v, v))
    return encode_png_rgb(bytes(px), 8, 8)


def _gray_bmp_2x(seed: int) -> bytes:
    """16x16 nearest-neighbor upscale of _gray_png(seed)'s raster in a
    different container — aHash-identical to the 1x PNG."""
    from chapterhousedb_spark.operators.multimodal import encode_bmp_rgb

    px = bytearray()
    for y in range(16):
        for x in range(16):
            v = int(
                hashlib.md5(
                    f"sidecar:{seed}:{y // 2}:{x // 2}".encode()
                ).hexdigest()[:2],
                16,
            )
            px += bytes((v, v, v))
    return encode_bmp_rgb(bytes(px), 16, 16)


def test_image_sidecar_decodes_corpus_exactly_once(spark, tmp_path):
    """THE sidecar contract (VERDICT r13 #1 'done' criterion): across
    N micro-batches, every payload — corpus seed and batch rows alike —
    passes through the fingerprint decode exactly ONCE. An accumulator
    tap on the payload column counts fingerprint evaluations; the gate
    still REJECTS re-encoded/upscaled twins of seeded images in every
    batch, proving the admissions really use the (persisted) sidecar
    fingerprints rather than skipping the corpus side."""
    acc = spark.sparkContext.accumulator(0)
    fp_fn, pairs_fn = fingerprint_kit("image", id_col="doc_id")

    def counting_fp(df):
        @F.udf("binary")
        def tap(p):
            acc.add(1)
            return p

        return fp_fn(df.withColumn("payload", tap("payload")))

    schema = "doc_id long, version int, payload binary"
    seed = spark.createDataFrame(
        [(0, 0, _gray_png(1)), (1, 0, _gray_png(2))], schema
    )
    root = str(tmp_path / "corpus")
    fp_root = str(tmp_path / "fp")
    init_ingest(
        seed, root, fingerprint_root=fp_root, fingerprint_fn=counting_fp
    )
    batches = [
        # b1: BMP 2x twin of seeded 0 -> reject; novel -> admit
        [(100, 1, _gray_bmp_2x(1)), (101, 1, _gray_png(3))],
        # b2: twin of b1's ADMITTED 101 -> reject; novel -> admit
        [(200, 2, _gray_bmp_2x(3)), (201, 2, _gray_png(4))],
        # b3: twin of the original seed again -> still rejected
        [(300, 3, _gray_bmp_2x(2)), (301, 3, _gray_png(5))],
    ]
    for rows in batches:
        res = admit_batch(
            spark.createDataFrame(rows, schema),
            root,
            fingerprint_root=fp_root,
            fingerprint_fn=counting_fp,
            fp_gate_fn=pairs_fn,
        )
        assert res["n_admitted"] == 1 and res["n_rejected"] == 1
    final, ver = read_versioned_base(spark, root)
    assert ver == 3
    assert {r["doc_id"] for r in final.collect()} == {0, 1, 101, 201, 301}
    # 2 seed payloads + 2 per batch x 3 batches = 8 decodes, total.
    # The raw-corpus gate would have re-decoded the growing corpus
    # every batch (2 + 3 + 4 extra decodes on this data).
    assert acc.value == 8
    fp, _ = read_fingerprints(spark, root, fp_root)
    got = {r["doc_id"]: r["ahash"] for r in fp.collect()}
    assert set(got) == {0, 1, 101, 201, 301}
    # stored fingerprint equals a fresh hash of the same payload
    fresh = fp_fn(seed.filter("doc_id = 0")).collect()[0]
    assert got[0] == fresh["ahash"]


def test_video_sidecar_upsert_replaces_frame_rows(spark, tmp_path):
    """Multi-row fingerprints (video: one row per frame) upsert
    WHOLESALE: re-admitting an id replaces all its frame rows, never
    appends to them."""
    from chapterhousedb_spark.operators.multimodal import encode_gif_gray

    def frame(seed, f):
        return bytes(
            int(
                hashlib.md5(f"vsc:{seed}:{f}:{i}".encode()).hexdigest()[:2],
                16,
            )
            for i in range(16 * 16)
        )

    def clip(seed, n):
        return encode_gif_gray([frame(seed, f) for f in range(n)], 16, 16)

    fp_fn, pairs_fn = fingerprint_kit(
        "video", id_col="doc_id", min_containment=0.99
    )
    schema = "doc_id long, version int, payload binary"
    root = str(tmp_path / "corpus")
    fp_root = str(tmp_path / "fp")
    init_ingest(
        spark.createDataFrame([(1, 0, clip(1, 4))], schema),
        root,
        fingerprint_root=fp_root,
        fingerprint_fn=fp_fn,
    )
    fp0, _ = read_fingerprints(spark, root, fp_root)
    old_hashes = {r["fhash"] for r in fp0.collect()}
    assert len(old_hashes) == 4
    # same id, entirely different 6-frame clip: not a near-dup, so it
    # is admitted and merge_upsert REPLACES the corpus row — the
    # sidecar must replace the frame rows the same way
    res = admit_batch(
        spark.createDataFrame([(1, 1, clip(2, 6))], schema),
        root,
        fingerprint_root=fp_root,
        fingerprint_fn=fp_fn,
        fp_gate_fn=pairs_fn,
    )
    assert res["n_admitted"] == 1
    fp1, _ = read_fingerprints(spark, root, fp_root)
    rows = fp1.collect()
    assert len(rows) == 6  # replaced, not 4 + 6
    assert {r["fhash"] for r in rows}.isdisjoint(old_hashes)
    # and a frame-sampled copy of the NEW clip is rejected via sidecar
    sampled = encode_gif_gray(
        [frame(2, f) for f in (0, 2, 4)], 16, 16
    )
    res2 = admit_batch(
        spark.createDataFrame([(9, 2, sampled)], schema),
        root,
        fingerprint_root=fp_root,
        fingerprint_fn=fp_fn,
        fp_gate_fn=pairs_fn,
    )
    assert res2["n_admitted"] == 0 and res2["n_rejected"] == 1


def test_sidecar_crash_replay_is_idempotent(spark, tmp_path):
    """The marker flip stays the single commit point: rewinding the
    corpus marker (simulating a crash after the v+1 writes but before
    the flip) and replaying the same batch rewrites corpus AND sidecar
    v+1 to the same state."""
    b1, _ = _batches(spark)
    root = str(tmp_path / "corpus")
    fp_root = str(tmp_path / "fp")
    mh_fp, _ = fingerprint_kit("minhash", id_col="doc_id")
    init_ingest(
        _seed(spark), root, fingerprint_root=fp_root, fingerprint_fn=mh_fp
    )
    admit_batch(b1, root, fingerprint_root=fp_root)
    fp_a, ver_a = read_fingerprints(spark, root, fp_root)
    ids_a = sorted(r["doc_id"] for r in fp_a.collect())
    # crash simulation: marker back to v0; v1 dirs remain on disk
    _write_latest_marker(spark, root, 0)
    res = admit_batch(b1, root, fingerprint_root=fp_root)
    assert res["version"] == 1
    fp_b, ver_b = read_fingerprints(spark, root, fp_root)
    assert ver_b == ver_a == 1
    assert sorted(r["doc_id"] for r in fp_b.collect()) == ids_a == [0, 1, 101]


def test_sidecar_maintains_labels_without_refingerprint(spark, tmp_path):
    """labels_root + sidecar: self-pairs among admitted docs come from
    the batch fingerprints (fp_gate_fn over batch_fp), so two near-dup
    docs admitted in one batch land in one component — with zero extra
    fingerprint passes."""
    root = str(tmp_path / "corpus")
    fp_root = str(tmp_path / "fp")
    labels_root = str(tmp_path / "labels")
    mh_fp, _ = fingerprint_kit("minhash", id_col="doc_id")
    init_ingest(
        _seed(spark),
        root,
        labels_root=labels_root,
        fingerprint_root=fp_root,
        fingerprint_fn=mh_fp,
    )
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=T0 + " tail", version=1),  # dup of corpus 0
            Row(doc_id=101, text=NOVEL1, version=1),
            Row(doc_id=102, text=NOVEL1 + " tweak", version=1),  # dup of 101
        ]
    )
    res = admit_batch(
        batch,
        root,
        labels_root=labels_root,
        fingerprint_root=fp_root,
        reject_near_dups=False,
    )
    assert res["n_admitted"] == 3
    labels = {
        r["id"]: r["component"]
        for r in spark.read.parquet(f"{labels_root}/v1").collect()
    }
    assert set(labels) == {0, 1, 100, 101, 102}
    assert labels[100] == labels[0]  # cross pair folded
    assert labels[101] == labels[102]  # self pair from fingerprints
    assert labels[101] != labels[0]


def test_sidecar_validation_errors(spark, tmp_path):
    b1, _ = _batches(spark)
    root = str(tmp_path / "corpus")
    fp_root = str(tmp_path / "fp")
    mh_fp, mh_pairs = fingerprint_kit("minhash", id_col="doc_id")
    with pytest.raises(ValueError, match="come together"):
        init_ingest(_seed(spark), root, fingerprint_root=fp_root)
    init_ingest(
        _seed(spark), root, fingerprint_root=fp_root, fingerprint_fn=mh_fp
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        admit_batch(
            b1, root, gate_fn=lambda b, c: None, fingerprint_root=fp_root
        )
    with pytest.raises(ValueError, match="pair"):
        admit_batch(b1, root, fingerprint_root=fp_root, fingerprint_fn=mh_fp)
    with pytest.raises(ValueError, match="need fingerprint_root"):
        admit_batch(b1, root, fingerprint_fn=mh_fp, fp_gate_fn=mh_pairs)
    with pytest.raises(ValueError, match="unknown kind"):
        fingerprint_kit("bloom")
    with pytest.raises(ValueError, match="unexpected kwargs"):
        fingerprint_kit("image", zoom=2)


def test_audio_and_simhash_kits_through_admit_batch(spark, tmp_path):
    """The remaining two fingerprint_kit families e2e: the audio kit
    rejects a G.711-style re-encode... (here: a 2x sample-repetition
    twin, the audio_phash invariance) of a seeded clip via the sidecar,
    and the simhash kit gates text without re-hashing the corpus."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import make_wav_blob

    def clip(seed):
        s = np.random.default_rng(seed).integers(
            -3000, 3000, 128, dtype=np.int64
        )
        return list(map(int, s))

    fp_fn, pairs_fn = fingerprint_kit("audio", id_col="doc_id")
    schema = "doc_id long, version int, payload binary"
    root = str(tmp_path / "acorpus")
    fp_root = str(tmp_path / "afp")
    init_ingest(
        spark.createDataFrame([(1, 0, make_wav_blob(clip(7)))], schema),
        root,
        fingerprint_root=fp_root,
        fingerprint_fn=fp_fn,
    )
    twin = make_wav_blob(
        list(map(int, np.repeat(np.array(clip(7)), 2))), sample_rate=16000
    )
    res = admit_batch(
        spark.createDataFrame(
            [(10, 1, twin), (11, 1, make_wav_blob(clip(9)))], schema
        ),
        root,
        fingerprint_root=fp_root,
        fingerprint_fn=fp_fn,
        fp_gate_fn=pairs_fn,
    )
    assert res["n_admitted"] == 1 and res["n_rejected"] == 1
    fp, _ = read_fingerprints(spark, root, fp_root)
    assert {r["doc_id"] for r in fp.collect()} == {1, 11}

    # simhash kit over text
    sh_fp, sh_pairs = fingerprint_kit(
        "simhash", id_col="doc_id", max_hamming=3
    )
    troot = str(tmp_path / "tcorpus")
    tfp = str(tmp_path / "tfp")
    init_ingest(
        _seed(spark), troot, fingerprint_root=tfp, fingerprint_fn=sh_fp
    )
    b = spark.createDataFrame(
        [
            Row(doc_id=100, text=T0.replace("dog", "cat", 1), version=1),
            Row(doc_id=101, text=NOVEL1, version=1),
        ]
    )
    res = admit_batch(
        b,
        troot,
        fingerprint_root=tfp,
        fingerprint_fn=sh_fp,
        fp_gate_fn=sh_pairs,
    )
    assert res["n_admitted"] == 1 and res["n_rejected"] == 1
    fp, _ = read_fingerprints(spark, troot, tfp)
    got = {r["doc_id"]: r["simhash"] for r in fp.collect()}
    assert set(got) == {0, 1, 101}


def test_vacuum_covers_sidecar_via_marker_root(spark, tmp_path):
    """The sidecar versions in lockstep with the corpus but has no
    marker of its own; vacuum_versions(marker_root=corpus_root) sweeps
    old sidecar versions under the corpus marker's protection."""
    from chapterhousedb_spark.streaming.batcher import vacuum_versions

    b1, b2 = _batches(spark)
    root = str(tmp_path / "corpus")
    fp_root = str(tmp_path / "fp")
    mh_fp, _ = fingerprint_kit("minhash", id_col="doc_id")
    # pin the PLAIN layout (B=1): this test models the plain retention
    # idiom; bucketed roots need vacuum_fingerprints instead
    init_ingest(
        _seed(spark), root, fingerprint_root=fp_root, fingerprint_fn=mh_fp,
        fingerprint_buckets=1,
    )
    admit_batch(b1, root, fingerprint_root=fp_root)
    admit_batch(b2, root, fingerprint_root=fp_root)
    removed = vacuum_versions(spark, fp_root, keep_last=1, marker_root=root)
    assert removed == [0, 1]
    # current version intact and readable
    fp, ver = read_fingerprints(spark, root, fp_root)
    assert ver == 2 and {r["doc_id"] for r in fp.collect()} == {0, 1, 101, 201}
    # a sidecar root alone (no marker anywhere) still raises loudly
    with pytest.raises(FileNotFoundError):
        vacuum_versions(spark, fp_root, keep_last=1)


def test_quality_gate_composes_with_sidecar(spark, tmp_path):
    """quality_fn runs BEFORE fingerprinting: a quality-rejected doc is
    never decoded (the accumulator tap counts survivors only) and never
    enters the sidecar; the dedup gate still rejects twins among the
    survivors."""
    acc = spark.sparkContext.accumulator(0)
    fp_fn, pairs_fn = fingerprint_kit("image", id_col="doc_id")

    def counting_fp(df):
        @F.udf("binary")
        def tap(p):
            acc.add(1)
            return p

        return fp_fn(df.withColumn("payload", tap("payload")))

    def quality(batch):
        # metadata predicate: odd versions are "low quality"
        return batch.filter(F.col("quality") >= 0)

    schema = "doc_id long, version int, quality int, payload binary"
    root = str(tmp_path / "corpus")
    fp_root = str(tmp_path / "fp")
    init_ingest(
        spark.createDataFrame([(0, 0, 1, _gray_png(1))], schema),
        root,
        fingerprint_root=fp_root,
        fingerprint_fn=counting_fp,
    )
    batch = spark.createDataFrame(
        [
            (100, 1, -1, _gray_png(9)),  # quality-rejected: never decoded
            (101, 1, 1, _gray_bmp_2x(1)),  # survivor, twin of seed 0
            (102, 1, 1, _gray_png(2)),  # survivor, novel
        ],
        schema,
    )
    res = admit_batch(
        batch,
        root,
        fingerprint_root=fp_root,
        fingerprint_fn=counting_fp,
        fp_gate_fn=pairs_fn,
        quality_fn=quality,
    )
    assert res["n_quality_rejected"] == 1
    assert res["n_admitted"] == 1 and res["n_rejected"] == 2
    # seed (1) + the two quality survivors (2) — doc 100 never decoded
    assert acc.value == 3
    fp, _ = read_fingerprints(spark, root, fp_root)
    assert {r["doc_id"] for r in fp.collect()} == {0, 102}


def test_bucketed_sidecar_writes_only_touched_buckets(spark, tmp_path):
    """The bucketed layout (init_ingest fingerprint_buckets=B): each
    commit's v+1 holds ONLY the buckets admitted ids touch; admissions,
    rejections and the resolved fingerprint set are IDENTICAL to the
    plain layout on the same chained batches; crash replay rewrites
    v+1 idempotently; vacuum keeps every version that is still the
    newest writer of some bucket."""
    import os

    from chapterhousedb_spark.operators.ingest import (
        _fp_bucket_col,
        vacuum_fingerprints,
    )

    b1, b2 = _batches(spark)
    mh_fp, _ = fingerprint_kit("minhash", id_col="doc_id")
    plain_root = str(tmp_path / "plain")
    plain_fp = str(tmp_path / "plain_fp")
    init_ingest(
        _seed(spark), plain_root,
        fingerprint_root=plain_fp, fingerprint_fn=mh_fp,
        fingerprint_buckets=1,  # pin plain: the equivalence baseline
    )
    B = 8
    root = str(tmp_path / "bucketed")
    fp_root = str(tmp_path / "bucketed_fp")
    init_ingest(
        _seed(spark), root,
        fingerprint_root=fp_root, fingerprint_fn=mh_fp,
        fingerprint_buckets=B,
    )
    for b in (b1, b2):
        r_plain = admit_batch(b, plain_root, fingerprint_root=plain_fp)
        r_buck = admit_batch(b, root, fingerprint_root=fp_root)
        assert r_plain["n_admitted"] == r_buck["n_admitted"]
        assert r_plain["n_rejected"] == r_buck["n_rejected"]
    fp_p, _ = read_fingerprints(spark, plain_root, plain_fp)
    fp_b, ver = read_fingerprints(spark, root, fp_root)
    assert ver == 2
    assert sorted(r["doc_id"] for r in fp_b.collect()) == sorted(
        r["doc_id"] for r in fp_p.collect()
    ) == [0, 1, 101, 201]
    # v1/v2 hold exactly the admitted ids' buckets (one admission each)
    expect = {
        1: {101},
        2: {201},
    }
    for v, ids in expect.items():
        got = {
            int(n.split("=")[1])
            for n in os.listdir(f"{fp_root}/v{v:06d}")
            if n.startswith("__b=")
        }
        want = {
            r["__b"]
            for r in spark.createDataFrame(
                [(i,) for i in ids], "doc_id long"
            ).select(_fp_bucket_col("doc_id", B).alias("__b")).collect()
        }
        assert got == want, (v, got, want)
    # crash replay: rewind the marker, re-admit b2 — same final state
    _write_latest_marker(spark, root, 1)
    r = admit_batch(b2, root, fingerprint_root=fp_root)
    assert r["version"] == 2
    fp_b2, _ = read_fingerprints(spark, root, fp_root)
    assert sorted(r["doc_id"] for r in fp_b2.collect()) == [0, 1, 101, 201]
    # vacuum: v0 is still the newest writer of the seed ids' buckets,
    # so it MUST survive keep_last=1; resolution stays intact
    removed = vacuum_fingerprints(spark, root, fp_root, keep_last=1)
    assert 0 not in removed
    fp_b3, _ = read_fingerprints(spark, root, fp_root)
    assert sorted(r["doc_id"] for r in fp_b3.collect()) == [0, 1, 101, 201]
    # validation
    with pytest.raises(ValueError, match="needs fingerprint_root"):
        init_ingest(_seed(spark), root, fingerprint_buckets=4)
    with pytest.raises(ValueError, match=">= 1"):
        init_ingest(
            _seed(spark), root,
            fingerprint_root=fp_root, fingerprint_fn=mh_fp,
            fingerprint_buckets=0,
        )


def test_auto_bucketing_derivation(spark, tmp_path):
    """VERDICT r14 #3: the bucketed layout is the DEFAULT — init_ingest
    derives B = ceil(seed_rows / expected_batch_size) (clamped to
    [1, 4096]) when fingerprint_buckets isn't pinned; without the hint
    the default batch-fraction assumption applies; B == 1 selects the
    plain layout; a pinned B plus the hint is rejected (the hint would
    be silently inert)."""
    from chapterhousedb_spark.operators.ingest import _fp_buckets_of

    mh_fp, _ = fingerprint_kit("minhash", id_col="doc_id")
    seed10 = spark.createDataFrame(
        [Row(doc_id=i, text=f"{T0} variant {i}", version=0) for i in range(10)]
    )
    # hint: 10 rows / batches of 2 -> B = 5
    root = str(tmp_path / "c1")
    fp_root = str(tmp_path / "fp1")
    init_ingest(
        seed10, root, fingerprint_root=fp_root, fingerprint_fn=mh_fp,
        expected_batch_size=2,
    )
    assert _fp_buckets_of(spark, fp_root) == 5
    assert any(
        n.startswith("__b=") for n in os.listdir(f"{fp_root}/v000000")
    )
    # no hint: the default heuristic floors bucket SIZE at ~4096 rows
    # (r15 — B = seed_rows for a tiny seed meant one-row buckets whose
    # per-commit directory overhead dwarfed the rewrite saving), so a
    # tiny seed derives B = 1 -> PLAIN layout
    root2, fp2 = str(tmp_path / "c2"), str(tmp_path / "fp2")
    init_ingest(seed10, root2, fingerprint_root=fp2, fingerprint_fn=mh_fp)
    assert _fp_buckets_of(spark, fp2) == 0
    assert not any(
        n.startswith("__b=") for n in os.listdir(f"{fp2}/v000000")
    )
    # hint >= seed -> B = 1 -> PLAIN layout (no marker, no __b dirs)
    root3, fp3 = str(tmp_path / "c3"), str(tmp_path / "fp3")
    init_ingest(
        seed10, root3, fingerprint_root=fp3, fingerprint_fn=mh_fp,
        expected_batch_size=100,
    )
    assert _fp_buckets_of(spark, fp3) == 0
    assert not any(
        n.startswith("__b=") for n in os.listdir(f"{fp3}/v000000")
    )
    # the auto layout round-trips through an admission
    b1, _ = _batches(spark)
    admit_batch(b1, root, fingerprint_root=fp_root)
    fp, ver = read_fingerprints(spark, root, fp_root)
    assert ver == 1 and 101 in {r["doc_id"] for r in fp.collect()}
    # pinned B + hint: mutually exclusive
    with pytest.raises(ValueError, match="mutually exclusive"):
        init_ingest(
            seed10, str(tmp_path / "c4"),
            fingerprint_root=str(tmp_path / "fp4"), fingerprint_fn=mh_fp,
            fingerprint_buckets=4, expected_batch_size=2,
        )
    # hint without a sidecar: silently inert -> rejected
    with pytest.raises(ValueError, match="needs fingerprint_root"):
        init_ingest(seed10, str(tmp_path / "c5"), expected_batch_size=2)
    with pytest.raises(ValueError, match=">= 1"):
        init_ingest(
            seed10, str(tmp_path / "c6"),
            fingerprint_root=str(tmp_path / "fp6"), fingerprint_fn=mh_fp,
            expected_batch_size=0,
        )


def test_bucketed_vacuum_preserves_time_travel(spark, tmp_path):
    """ADVICE r14 (medium): the bucketed sweep must keep every sidecar
    version referenced by the resolution of ANY corpus version still
    on disk — not just the marker's — so _read_fingerprints_at(v) at
    an older retained corpus version returns COMPLETE data (an absent
    bucket is indistinguishable from a never-populated one, so a
    silently thinner read is the failure mode)."""
    from chapterhousedb_spark.operators.ingest import (
        _fp_buckets_of,
        _read_fingerprints_at,
        vacuum_fingerprints,
    )
    from chapterhousedb_spark.streaming.batcher import vacuum_versions

    b1, b2 = _batches(spark)
    root = str(tmp_path / "corpus")
    fp_root = str(tmp_path / "fp")
    mh_fp, _ = fingerprint_kit("minhash", id_col="doc_id")
    init_ingest(
        _seed(spark), root, fingerprint_root=fp_root, fingerprint_fn=mh_fp,
        fingerprint_buckets=8,
    )
    admit_batch(b1, root, fingerprint_root=fp_root)
    admit_batch(b2, root, fingerprint_root=fp_root)
    B = _fp_buckets_of(spark, fp_root)
    # every corpus version still on disk (v0..v2) resolves completely
    ids_at = {
        v: sorted(
            r["doc_id"]
            for r in _read_fingerprints_at(spark, fp_root, v, B).collect()
        )
        for v in (0, 1, 2)
    }
    assert ids_at == {0: [0, 1], 1: [0, 1, 101], 2: [0, 1, 101, 201]}
    removed = vacuum_fingerprints(spark, root, fp_root, keep_last=1)
    # corpus v0/v1/v2 all on disk -> every sidecar version is part of
    # some retained resolution; nothing may be swept
    assert removed == []
    for v in (0, 1, 2):
        got = sorted(
            r["doc_id"]
            for r in _read_fingerprints_at(spark, fp_root, v, B).collect()
        )
        assert got == ids_at[v], (v, got)
    # drop corpus v0/v1 (retention sweep on the corpus itself), then
    # the sidecar sweep may remove versions only the vanished corpus
    # versions referenced — while v2's resolution stays complete
    vacuum_versions(spark, root, keep_last=1)
    vacuum_fingerprints(spark, root, fp_root, keep_last=1)
    got = sorted(
        r["doc_id"]
        for r in _read_fingerprints_at(spark, fp_root, 2, B).collect()
    )
    assert got == ids_at[2]


def test_resolution_listing_cache_bounds_per_batch_cost(spark, tmp_path):
    """ADVICE r14 (low): the bucketed read resolution caches committed
    version-dir listings process-locally, so a steady-state stream
    pays one root listing plus one listing per NEW version — not
    O(#versions) listings per micro-batch. Entries for vacuumed
    versions reconcile away against the fresh root listing."""
    import chapterhousedb_spark.operators.ingest as ing

    b1, b2 = _batches(spark)
    root = str(tmp_path / "corpus")
    fp_root = str(tmp_path / "fp")
    mh_fp, _ = fingerprint_kit("minhash", id_col="doc_id")
    init_ingest(
        _seed(spark), root, fingerprint_root=fp_root, fingerprint_fn=mh_fp,
        fingerprint_buckets=8,
    )
    calls = []
    real = ing._fp_buckets_in

    def counting(spark_, root_, ver):
        calls.append(ver)
        return real(spark_, root_, ver)

    ing._FP_LISTING_CACHE.pop(fp_root, None)
    try:
        ing._fp_buckets_in = counting
        admit_batch(b1, root, fingerprint_root=fp_root)
        admit_batch(b2, root, fingerprint_root=fp_root)
        # v0 listed exactly once across both admissions (first gate
        # read); v1 once (second gate read); v2 never (not yet read)
        assert calls.count(0) == 1 and calls.count(1) == 1
        assert 2 not in calls
        fp, _ = read_fingerprints(spark, root, fp_root)
        assert sorted(r["doc_id"] for r in fp.collect()) == [0, 1, 101, 201]
        # the current read listed only the NEW version
        assert calls.count(2) == 1 and calls.count(0) == 1
    finally:
        ing._fp_buckets_in = real
    # reconciliation: a vanished version drops out of the cache
    cache = ing._FP_LISTING_CACHE[fp_root]
    assert set(cache) == {0, 1, 2}
    ing._fp_buckets_map(spark, fp_root, [1, 2])
    assert set(ing._FP_LISTING_CACHE[fp_root]) == {1, 2}
