"""Multimodal binary-column plumbing tests (decode is a deterministic
stub; the Spark-side schema/batching/UDF shape is real)."""

from __future__ import annotations

import pytest

from chapterhousedb_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    chunk_binary,
    decode_real,
    decode_stub,
    documents_as_media,
    extract_features,
    make_fake_blob,
    sample_frames,
)
from chapterhousedb_spark.workload.registry import load
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", make_fake_blob(4, 3), ("s0", 4 * 3 + 16)),
        (1, "video", make_fake_blob(2, 2, n_frames=5, fill=7), ("s1", 2 * 2 * 5 + 16)),
        (2, "image", b"not a real blob", ("s2", 15)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features(media):
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows[0]["width"] == 4 and rows[0]["height"] == 3 and rows[0]["n_frames"] == 1
    # pixels are (fill + i) % 256 -> mean of 0..11 is 5.5
    assert rows[0]["mean_pixel"] == pytest.approx(5.5)
    assert rows[1]["n_frames"] == 5
    assert rows[2]["ok"] is False and rows[2]["width"] is None


def test_sample_frames(media):
    frames = sample_frames(media, every_nth=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert 0 in by_media and len(by_media[0]) == 1  # still image: frame 0
    assert 1 in by_media and [r["frame_idx"] for r in sorted(by_media[1], key=lambda r: r["frame_idx"])] == [0, 2, 4]
    assert 2 not in by_media  # undecodable blob skipped
    # frame payload is w*h bytes
    assert all(len(r["frame"]) == 4 for r in by_media[1])


def test_documents_as_media_roundtrip(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(20)
    media = documents_as_media(docs)
    feats = extract_features(media)
    ok = feats.filter("ok").count()
    assert ok == 20
    widths = [r["width"] for r in feats.collect()]
    assert all(1 <= w <= 64 for w in widths)


def test_chunk_binary_roundtrip(media):
    """Concatenating chunks in order must reproduce every payload."""
    chunks = chunk_binary(media, chunk_size=7).collect()
    by_id: dict[int, list] = {}
    for r in chunks:
        by_id.setdefault(r["media_id"], []).append((r["chunk_idx"], bytes(r["chunk"])))
    originals = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, payload in originals.items():
        parts = [c for _, c in sorted(by_id[mid])]
        assert b"".join(parts) == payload
        assert all(len(c) == 7 for c in parts[:-1])  # only last chunk short


def test_chunk_binary_stays_jvm_side(media):
    plan = (
        chunk_binary(media)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decode_real_rejects_compressed_formats():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG\r\n\x1a\n garbage")


def test_decode_real_ppm_roundtrip():
    from chapterhousedb_spark.operators.multimodal import make_ppm_blob

    blob = make_ppm_blob(4, 3, fill=10)
    d = decode_real(blob)
    body = bytes((10 + i) % 256 for i in range(4 * 3 * 3))
    assert d == {
        "width": 4,
        "height": 3,
        "n_frames": 1,
        "mean_pixel": sum(body) / len(body),
        "ok": True,
    }
    # comment- and whitespace-tolerant header
    blob2 = b"P6\n# a comment\n 4  3 \n255\n" + body
    assert decode_real(blob2)["ok"] is True
    # truncated body -> not ok, no exception
    assert decode_real(blob[:-1])["ok"] is False


def test_decode_real_wav_roundtrip():
    from chapterhousedb_spark.operators.multimodal import make_wav_blob

    samples = [0, 100, -100, 200, -200, 300]
    blob = make_wav_blob(samples, sample_rate=16000, channels=2)
    d = decode_real(blob)
    assert d == {
        "width": 16000,
        "height": 2,
        "n_frames": 3,
        "mean_pixel": sum(abs(s) for s in samples) / len(samples),
        "ok": True,
    }


def test_decode_real_through_mapinpandas(spark):
    """The real pure-python codecs through the Arrow-batched Spark
    path: PPM + WAV rows decode, an unsupported blob rows ok=False."""
    from chapterhousedb_spark.operators.multimodal import (
        extract_features,
        make_ppm_blob,
        make_wav_blob,
    )

    rows = [
        (1, "image", make_ppm_blob(8, 2), ("t", 0)),
        (2, "audio", make_wav_blob([10, -10, 20, -20]), ("t", 0)),
        (3, "video", b"\x00\x01\x02 not a real format", ("t", 0)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r.asDict()
        for r in extract_features(media, decoder=decode_real).collect()
    }
    assert got[1]["ok"] and got[1]["width"] == 8 and got[1]["height"] == 2
    assert got[2]["ok"] and got[2]["width"] == 8000 and got[2]["n_frames"] == 4
    assert got[3] == {
        "media_id": 3, "width": None, "height": None, "n_frames": None,
        "mean_pixel": None, "ok": False,
    }


def test_decode_stub_rejects_garbage():
    assert decode_stub(b"") == {
        "width": None, "height": None, "n_frames": None, "mean_pixel": None, "ok": False,
    }
