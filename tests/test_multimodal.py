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
    # MP3/MP4 still genuinely need ffmpeg — honest NotImplementedError
    with pytest.raises(NotImplementedError):
        decode_real(b"ID3\x04\x00 mp3 garbage")
    # PNG (round 7) and baseline JPEG (round 8) are decoded;
    # MALFORMED bytes of either are ok=False, not a raise
    assert decode_real(b"\x89PNG\r\n\x1a\n garbage")["ok"] is False
    assert decode_real(b"\xff\xd8\xff\xe0\x00\x10JFIF garbage")["ok"] is False


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


def test_decode_real_png_roundtrip_all_filters():
    """PNG decode through every unfilter path: make_png_blob cycles the
    five forward filters row by row, so a correct round-trip proves
    None/Sub/Up/Average/Paeth all invert properly, for RGB and RGBA."""
    from chapterhousedb_spark.operators.multimodal import make_png_blob

    for color_type, channels in ((2, 3), (6, 4), (0, 1), (4, 2)):
        w, h = 5, 7
        blob = make_png_blob(w, h, fill=13, color_type=color_type)
        body = bytes((13 + i) % 256 for i in range(w * h * channels))
        d = decode_real(blob)
        assert d == {
            "width": w,
            "height": h,
            "n_frames": 1,
            "mean_pixel": sum(body) / len(body),
            "ok": True,
        }, f"color_type={color_type}"


def test_decode_real_png_spec_direct_vector():
    """Independent vector: a 2x2 RGB PNG hand-assembled straight from
    the spec (no make_png_blob involvement) — type-0 filtered rows,
    one IDAT chunk, known pixel bytes."""
    import struct
    import zlib

    pixels = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (255, 255, 255)],
    ]
    raw = b"".join(
        b"\x00" + bytes(v for px in row for v in px) for row in pixels
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    d = decode_real(blob)
    flat = [v for row in pixels for px in row for v in px]
    assert d["ok"] and (d["width"], d["height"]) == (2, 2)
    assert d["mean_pixel"] == sum(flat) / len(flat)


def test_decode_real_png_honest_boundaries():
    """The full legal PNG matrix decodes (palette/16-bit/Adam7 all
    real now); malformed bytes — wrong stream length, missing PLTE,
    illegal depth/type combination, unknown interlace method — return
    ok=False."""
    import struct
    import zlib

    from chapterhousedb_spark.operators.multimodal import make_png_blob

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def png_with_ihdr(w, h, depth, color, interlace):
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b"")
        )

    # malformed: Adam7 flag but the stream length doesn't match passes
    assert decode_real(png_with_ihdr(2, 2, 8, 2, 1))["ok"] is False
    # malformed: unknown interlace method
    assert decode_real(png_with_ihdr(2, 2, 8, 2, 2))["ok"] is False
    # malformed: wrong stream length for the declared dims/depth
    assert decode_real(png_with_ihdr(2, 2, 16, 2, 0))["ok"] is False
    # malformed: palette stream without a PLTE chunk
    assert decode_real(png_with_ihdr(2, 2, 8, 3, 0))["ok"] is False
    # malformed: illegal depth/type combination (RGB at depth 4)
    assert decode_real(png_with_ihdr(2, 2, 4, 2, 0))["ok"] is False
    bad_len = png_with_ihdr(10, 10, 8, 2, 0)  # stream too short for 10x10
    assert decode_real(bad_len)["ok"] is False


def test_decode_real_png_adam7_interlaced():
    """Adam7-interlaced PNGs decode: the seven independently-filtered
    passes cover every pixel exactly once, so the feature row equals
    the sequential encoding of the same pixel grid — asserted for RGB,
    palette, 16-bit, and a 1-pixel image (six empty passes). The
    resize path deinterlaces and re-encodes sequentially."""
    from chapterhousedb_spark.operators.multimodal import make_png_blob

    for kwargs in (
        dict(color_type=2),
        dict(color_type=3, n_colors=6),
        dict(color_type=2, depth=16),
        dict(color_type=0, depth=4),
        dict(color_type=6),
    ):
        seq = decode_real(make_png_blob(13, 9, fill=5, **kwargs))
        lace = decode_real(make_png_blob(13, 9, fill=5, interlace=True, **kwargs))
        assert lace["ok"], kwargs
        assert lace == seq, kwargs
    tiny = decode_real(make_png_blob(1, 1, fill=7, interlace=True))
    assert tiny["ok"] and (tiny["width"], tiny["height"]) == (1, 1)


def test_resize_media_png_adam7_deinterlaces(spark):
    """resize_media on an interlaced PNG: deinterlace -> resample ->
    sequential re-encode; the output must decode equal to resizing the
    sequential twin of the same pixel grid."""
    from chapterhousedb_spark.operators.multimodal import (
        make_png_blob,
        resize_media,
    )

    lace = make_png_blob(12, 10, fill=3, interlace=True)
    seq = make_png_blob(12, 10, fill=3)
    media = spark.createDataFrame(
        [(1, "image", lace, ("t", 0)), (2, "image", seq, ("t", 0))],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r.asDict() for r in resize_media(media, 6, 5).collect()}
    assert got[1]["ok"] and got[2]["ok"]
    d1, d2 = decode_real(bytes(got[1]["payload"])), decode_real(bytes(got[2]["payload"]))
    assert d1 == d2 and d1["ok"] and (d1["width"], d1["height"]) == (6, 5)


def test_decode_real_png_palette_and_deep_variants():
    """The full legal PNG matrix decodes: palette (through the PLTE to
    real RGB bytes), 16-bit (samples scaled /257), and sub-byte grays
    (scaled to 0-255) — mean_pixel hand-verified against the
    generator's own ramp for each."""
    from chapterhousedb_spark.operators.multimodal import make_png_blob

    # palette 8-bit: indices ramp (fill+i) % n_colors over a known PLTE
    w, h, fill, n_colors = 6, 4, 2, 5
    d = decode_real(make_png_blob(w, h, fill=fill, color_type=3, n_colors=n_colors))
    plte = [
        ((fill + 3 * k) % 256, (fill + 3 * k + 1) % 256, (fill + 3 * k + 2) % 256)
        for k in range(n_colors)
    ]
    idx = [(fill + i) % n_colors for i in range(w * h)]
    want = sum(sum(plte[i]) for i in idx) / (3 * w * h)
    assert d["ok"] and (d["width"], d["height"]) == (w, h)
    assert abs(d["mean_pixel"] - want) < 1e-9

    # palette 4-bit (packed indices, PLTE lookup after unfilter)
    d4 = decode_real(
        make_png_blob(5, 3, fill=1, color_type=3, depth=4, n_colors=7)
    )
    plte7 = [
        ((1 + 3 * k) % 256, (1 + 3 * k + 1) % 256, (1 + 3 * k + 2) % 256)
        for k in range(7)
    ]
    idx4 = [(1 + i) % 7 for i in range(15)]
    want4 = sum(sum(plte7[i]) for i in idx4) / (3 * 15)
    assert d4["ok"] and abs(d4["mean_pixel"] - want4) < 1e-9

    # 16-bit RGB: u16 ramp, mean over samples/257
    d16 = decode_real(make_png_blob(4, 3, fill=9, color_type=2, depth=16))
    samples = [((9 + i) * 521) % 65536 for i in range(4 * 3 * 3)]
    want16 = sum(s / 257.0 for s in samples) / len(samples)
    assert d16["ok"] and abs(d16["mean_pixel"] - want16) < 1e-9

    # 1-bit gray: values {0,1} scale to {0,255}
    d1 = decode_real(make_png_blob(10, 2, fill=0, color_type=0, depth=1))
    vals = [i % 2 for i in range(10 * 2)]
    want1 = sum(v * 255 for v in vals) / len(vals)
    assert d1["ok"] and abs(d1["mean_pixel"] - want1) < 1e-9


def test_resize_media_png_palette_promotes_to_truecolor(spark):
    """resize_media on a palette PNG: decodes through the PLTE,
    resamples, and re-encodes as 8-bit truecolor (documented depth
    promotion — a resampled raster generally exceeds 256 colors);
    a 16-bit PNG resamples at FULL precision and stays depth 16."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        make_png_blob,
        resize_media,
    )

    pal = make_png_blob(8, 6, fill=4, color_type=3, n_colors=6)
    deep = make_png_blob(8, 6, fill=4, color_type=2, depth=16)
    media = spark.createDataFrame(
        [(1, "image", pal, ("t", 0)), (2, "image", deep, ("t", 0))],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r.asDict() for r in resize_media(media, 4, 3).collect()}
    assert got[1]["ok"]
    out = bytes(got[1]["payload"])
    d = decode_real(out)
    assert d["ok"] and (d["width"], d["height"]) == (4, 3)
    # IHDR color type byte: offset 8(sig)+8(len+type)+8(w,h)+1(depth)=25
    assert out[25] == 2 and out[24] == 8  # truecolor, 8-bit
    # 16-bit source: output is a decodable 16-bit PNG whose samples are
    # the exact nearest-neighbor gather of the source u16 grid
    assert got[2]["ok"]
    out16 = bytes(got[2]["payload"])
    assert out16[24] == 16 and out16[25] == 2
    d16 = decode_real(out16)
    assert d16["ok"] and (d16["width"], d16["height"]) == (4, 3)
    src = np.array(
        [((4 + i) * 521) % 65536 for i in range(8 * 6 * 3)], dtype=np.uint64
    ).reshape(6, 8, 3)
    ys, xs = (np.arange(3) * 6) // 3, (np.arange(4) * 8) // 4
    want_mean = (src[ys][:, xs] / 257.0).mean()
    assert abs(d16["mean_pixel"] - want_mean) < 1e-9


def test_decode_real_png_through_mapinpandas(spark):
    """PNG alongside PPM/WAV through the Arrow-batched path — the full
    real-codec trio plus a JPEG row that must mark ok=False."""
    from chapterhousedb_spark.operators.multimodal import (
        extract_features,
        make_png_blob,
        make_ppm_blob,
        make_wav_blob,
    )

    rows = [
        (1, "image", make_png_blob(6, 4, fill=3), ("t", 0)),
        (2, "image", make_ppm_blob(8, 2), ("t", 0)),
        (3, "audio", make_wav_blob([10, -10]), ("t", 0)),
        (4, "image", b"\xff\xd8\xff\xe0 jpeg-ish", ("t", 0)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r.asDict()
        for r in extract_features(media, decoder=decode_real).collect()
    }
    assert got[1]["ok"] and (got[1]["width"], got[1]["height"]) == (6, 4)
    body = bytes((3 + i) % 256 for i in range(6 * 4 * 3))
    assert got[1]["mean_pixel"] == sum(body) / len(body)
    assert got[2]["ok"] and got[3]["ok"]
    assert got[4]["ok"] is False


def test_resize_media_ppm_and_png(spark):
    """Real resize through mapInPandas: PPM and PNG payloads decode,
    nearest-neighbor resample, re-encode in their original format —
    verified against a numpy reference; undecodable rows ok=False."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        make_png_blob,
        make_ppm_blob,
        resize_media,
    )

    w, h, tw, th = 8, 6, 4, 3
    ppm = make_ppm_blob(w, h, fill=5)
    png = make_png_blob(w, h, fill=5, color_type=2)
    rows = [
        (1, "image", ppm, ("t", 0)),
        (2, "image", png, ("t", 0)),
        (3, "image", b"not an image", ("t", 0)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r.asDict()
        for r in resize_media(media, tw, th).collect()
    }
    # numpy nearest-neighbor reference on the shared pixel ramp
    body = np.frombuffer(
        bytes((5 + i) % 256 for i in range(w * h * 3)), dtype=np.uint8
    ).reshape(h, w, 3)
    ys, xs = (np.arange(th) * h) // th, (np.arange(tw) * w) // tw
    ref = body[ys][:, xs].tobytes()

    assert got[1]["ok"] and (got[1]["width"], got[1]["height"]) == (tw, th)
    out_ppm = bytes(got[1]["payload"])
    assert out_ppm.startswith(b"P6") and out_ppm.endswith(ref)
    # the resized PPM round-trips through decode_real
    d = decode_real(out_ppm)
    assert d["ok"] and (d["width"], d["height"]) == (tw, th)

    assert got[2]["ok"] and (got[2]["width"], got[2]["height"]) == (tw, th)
    d2 = decode_real(bytes(got[2]["payload"]))
    assert d2["ok"] and (d2["width"], d2["height"]) == (tw, th)
    # PNG mean equals the reference pixels' mean exactly
    assert d2["mean_pixel"] == sum(ref) / len(ref)

    assert got[3]["ok"] is False and got[3]["payload"] is None


def test_resize_media_preserves_rgba_and_gray(spark):
    from chapterhousedb_spark.operators.multimodal import (
        make_png_blob,
        resize_media,
    )

    rows = [
        (1, "image", make_png_blob(6, 6, color_type=6), ("t", 0)),  # RGBA
        (2, "image", make_png_blob(6, 6, color_type=0), ("t", 0)),  # gray
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r.asDict()
        for r in resize_media(media, 3, 3).collect()
    }
    for mid in (1, 2):
        assert got[mid]["ok"], mid
        d = decode_real(bytes(got[mid]["payload"]))
        assert d["ok"] and (d["width"], d["height"]) == (3, 3)


def test_resize_media_ppm_trailing_bytes(spark):
    """A PPM payload with trailing bytes after the raster (e.g. a
    trailing newline) resizes the TRUE raster, not a shifted window —
    the body offset comes from the header parse, never back-computed
    from the payload end (ADVICE r7)."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        make_ppm_blob,
        resize_media,
    )

    w, h, tw, th = 8, 6, 4, 3
    ppm = make_ppm_blob(w, h, fill=5) + b"\n\x00garbage"
    media = spark.createDataFrame([(1, "image", ppm, ("t", 0))], MEDIA_SCHEMA)
    (r,) = resize_media(media, tw, th).collect()
    assert r["ok"] and (r["width"], r["height"]) == (tw, th)
    body = np.frombuffer(
        bytes((5 + i) % 256 for i in range(w * h * 3)), dtype=np.uint8
    ).reshape(h, w, 3)
    ys, xs = (np.arange(th) * h) // th, (np.arange(tw) * w) // tw
    assert bytes(r["payload"]).endswith(body[ys][:, xs].tobytes())


def test_decode_real_jpeg_roundtrip():
    """Baseline sequential JPEG through the full pure-numpy pipeline
    (markers -> Huffman -> dequant -> IDCT -> color): gray round-trips
    the pixel-ramp mean exactly at flat quant=1; color within YCbCr
    rounding; non-multiple-of-8 dims crop the padding out of the
    mean."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import make_jpeg_blob

    d = decode_real(make_jpeg_blob(16, 12, fill=7, gray=True))
    src = np.frombuffer(
        bytes((7 + i) % 256 for i in range(16 * 12)), dtype=np.uint8
    )
    assert d["ok"] and (d["width"], d["height"], d["n_frames"]) == (16, 12, 1)
    assert abs(d["mean_pixel"] - src.mean()) < 0.5

    d = decode_real(make_jpeg_blob(16, 12, fill=5))
    src = np.frombuffer(
        bytes((5 + i) % 256 for i in range(16 * 12 * 3)), dtype=np.uint8
    )
    assert d["ok"] and (d["width"], d["height"]) == (16, 12)
    assert abs(d["mean_pixel"] - src.mean()) < 1.0

    d = decode_real(make_jpeg_blob(13, 9, fill=3))
    src = np.frombuffer(
        bytes((3 + i) % 256 for i in range(13 * 9 * 3)), dtype=np.uint8
    )
    assert d["ok"] and (d["width"], d["height"]) == (13, 9)
    assert abs(d["mean_pixel"] - src.mean()) < 1.0

    # 4:2:0 (the real-world camera/web layout): MCU-interleaved scan,
    # box-filtered chroma, replicate upsample — mean within the
    # chroma-downsample tolerance at odd dims too
    for w, h in ((16, 12), (13, 9), (17, 15)):
        d = decode_real(make_jpeg_blob(w, h, fill=5, subsample=True))
        src = np.frombuffer(
            bytes((5 + i) % 256 for i in range(w * h * 3)), dtype=np.uint8
        )
        assert d["ok"] and (d["width"], d["height"]) == (w, h)
        assert abs(d["mean_pixel"] - src.mean()) < 1.0, (w, h)

    # lossy path still decodes cleanly
    assert decode_real(make_jpeg_blob(16, 16, quant=16))["ok"]


def test_decode_real_jpeg_honest_boundary():
    """Arithmetic-coded (SOF9) and >2 sampling-factor JPEGs raise as
    unsupported (the honest codec boundary — progressive SOF2 decodes
    for real now); truncated/malformed bytes return ok=False like
    every other codec, including a baseline stream whose SOF marker
    was flipped to SOF2 (its full-band scan header is illegal in a
    progressive file)."""
    import pytest

    from chapterhousedb_spark.operators.multimodal import make_jpeg_blob

    blob = bytearray(make_jpeg_blob(16, 8))
    sof = blob.index(b"\xff\xc0")
    prog = bytearray(blob)
    prog[sof + 1] = 0xC2  # SOF2 + baseline Ss=0..Se=63 scan = malformed
    assert decode_real(bytes(prog))["ok"] is False
    arith = bytearray(blob)
    arith[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_real(bytes(arith))
    sub = bytearray(blob)
    sub[sof + 11] = 0x33  # sampling factor 3 — outside baseline-common
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_real(bytes(sub))
    assert decode_real(b"\xff\xd8\xff\xd9junk")["ok"] is False
    assert decode_real(bytes(blob)[: len(blob) // 2])["ok"] is False


def test_decode_real_jpeg_through_mapinpandas(spark):
    """JPEG rows decode through the Arrow-batched Spark path beside
    the other real codecs; an unsupported-variant row degrades to
    ok=False instead of killing the task."""
    from chapterhousedb_spark.operators.multimodal import (
        extract_features,
        make_jpeg_blob,
    )

    blob = make_jpeg_blob(24, 16, fill=9)
    prog = bytearray(blob)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    rows = [
        (1, "image", blob, ("t", 0)),
        (2, "image", make_jpeg_blob(8, 8, gray=True), ("t", 0)),
        (3, "image", bytes(prog), ("t", 0)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r.asDict()
        for r in extract_features(media, decoder=decode_real).collect()
    }
    assert got[1]["ok"] and (got[1]["width"], got[1]["height"]) == (24, 16)
    assert got[2]["ok"] and (got[2]["width"], got[2]["height"]) == (8, 8)
    assert got[3]["ok"] is False


def test_resize_media_jpeg(spark):
    """JPEG payloads resize through mapInPandas and re-encode as
    JPEG: output round-trips decode_real at the target dims with the
    source mean preserved (flat-quant re-encode); a 4:2:0 source
    stays decodable; progressive rows degrade to ok=False."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        make_jpeg_blob,
        resize_media,
    )

    blob = make_jpeg_blob(16, 12, fill=5)
    sub = make_jpeg_blob(16, 12, fill=5, subsample=True)
    prog = bytearray(blob)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    rows = [
        (1, "image", blob, ("t", 0)),
        (2, "image", sub, ("t", 0)),
        (3, "image", bytes(prog), ("t", 0)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r.asDict()
        for r in resize_media(media, 8, 6).collect()
    }
    src = np.frombuffer(
        bytes((5 + i) % 256 for i in range(16 * 12 * 3)), dtype=np.uint8
    ).reshape(12, 16, 3)
    ys, xs = (np.arange(6) * 12) // 6, (np.arange(8) * 16) // 8
    ref_mean = src[ys][:, xs].mean()
    for mid in (1, 2):
        assert got[mid]["ok"], mid
        out = bytes(got[mid]["payload"])
        assert out[:2] == b"\xff\xd8"  # still a JPEG
        d = decode_real(out)
        assert d["ok"] and (d["width"], d["height"]) == (8, 6)
        assert abs(d["mean_pixel"] - ref_mean) < 2.5, (mid, d["mean_pixel"])
    assert got[3]["ok"] is False and got[3]["payload"] is None

def test_decode_jpeg_truncated_tables_return_bad():
    """ADVICE r8: a truncated DQT (or a DHT whose bits/vals run past
    the segment) is MALFORMED bytes, not a crash — direct
    _decode_jpeg_pixels callers get None / ok=False instead of an
    IndexError escaping the documented contract."""
    import struct

    from chapterhousedb_spark.operators.multimodal import make_jpeg_blob

    blob = bytearray(make_jpeg_blob(16, 8))

    def resegment(marker: bytes, keep: int) -> bytes:
        """Truncate the first `marker` segment's payload to `keep`
        bytes (rewriting its length so the stream still parses)."""
        i = blob.index(marker)
        (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
        body = blob[i + 4 : i + 2 + ln][:keep]
        return (
            bytes(blob[:i])
            + marker
            + struct.pack(">H", len(body) + 2)
            + bytes(body)
            + bytes(blob[i + 2 + ln :])
        )

    # DQT cut mid-table: < 65 bytes of table payload remain
    assert decode_real(resegment(b"\xff\xdb", 30))["ok"] is False
    # DHT cut so sum(bits) overruns the remaining vals
    assert decode_real(resegment(b"\xff\xc4", 18))["ok"] is False
    # SOF cut mid-component list
    assert decode_real(resegment(b"\xff\xc0", 7))["ok"] is False


def test_resize_media_jpeg_preserves_sampling_layout(spark):
    """ADVICE r8: resize_media re-encodes a JPEG in the source's OWN
    chroma layout — a 4:2:2 source stays 4:2:2 (not silently 4:2:0)
    and a 4:2:0 source stays 4:2:0. The SOF component byte carries
    (h<<4|v) for component 1, so the layout is directly assertable."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        make_jpeg_blob,
        resize_media,
    )

    def luma_hv(payload: bytes) -> int:
        i = payload.index(b"\xff\xc0")
        return payload[i + 11]

    h422 = make_jpeg_blob(16, 12, fill=5, sampling=[(2, 1), (1, 1), (1, 1)])
    h420 = make_jpeg_blob(16, 12, fill=5, subsample=True)
    h444 = make_jpeg_blob(16, 12, fill=5)
    assert luma_hv(h422) == 0x21 and luma_hv(h420) == 0x22 and luma_hv(h444) == 0x11
    # the 4:2:2 blob decodes within the chroma-downsample tolerance
    src_mean = np.frombuffer(
        bytes((5 + i) % 256 for i in range(16 * 12 * 3)), dtype=np.uint8
    ).mean()
    d = decode_real(h422)
    assert d["ok"] and abs(d["mean_pixel"] - src_mean) < 1.0

    media = spark.createDataFrame(
        [(1, "image", h422, ("t", 0)), (2, "image", h420, ("t", 0)),
         (3, "image", h444, ("t", 0))],
        MEDIA_SCHEMA,
    )
    got = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_media(media, 8, 6).collect()
    }
    assert luma_hv(got[1]) == 0x21  # 4:2:2 stayed 4:2:2
    assert luma_hv(got[2]) == 0x22  # 4:2:0 stayed 4:2:0
    assert luma_hv(got[3]) == 0x11  # 4:4:4 stayed 4:4:4
    for mid in (1, 2, 3):
        d = decode_real(got[mid])
        assert d["ok"] and (d["width"], d["height"]) == (8, 6), mid

def test_decode_real_wav_g711_mulaw_alaw():
    """G.711 mu-law / A-law WAV decode: the full 256-code expansion
    table equals the stdlib audioop reference (st_ulaw2linear16 /
    st_alaw2linear16) code-for-code, and the feature row reflects the
    DECODED 16-bit stream."""
    import struct as st
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from chapterhousedb_spark.operators.multimodal import (
        _alaw_to_linear16,
        _ulaw_to_linear16,
        make_wav_compressed_blob,
    )

    for conv, ref in (
        (_ulaw_to_linear16, audioop.ulaw2lin),
        (_alaw_to_linear16, audioop.alaw2lin),
    ):
        for b in range(256):
            (want,) = st.unpack("<h", ref(bytes([b]), 2))
            assert conv(b) == want, (conv.__name__, b, conv(b), want)

    raw = bytes(range(256))
    d = decode_real(make_wav_compressed_blob(raw, 7, sample_rate=8000))
    want_mean = sum(abs(_ulaw_to_linear16(b)) for b in raw) / 256
    assert d["ok"] and d["width"] == 8000 and d["height"] == 1
    assert d["n_frames"] == 256 and abs(d["mean_pixel"] - want_mean) < 1e-9

    d = decode_real(make_wav_compressed_blob(raw, 6))
    want_mean = sum(abs(_alaw_to_linear16(b)) for b in raw) / 256
    assert d["ok"] and abs(d["mean_pixel"] - want_mean) < 1e-9


def test_decode_real_wav_ima_adpcm():
    """IMA-ADPCM WAV decode: a mono block equals the stdlib audioop
    DVI-ADPCM reference seeded with the block header state (audioop
    packs the first nibble HIGH, WAV packs it LOW, so the reference
    stream is nibble-swapped); a stereo block whose channels carry the
    same nibbles must decode to the mono stream duplicated."""
    import struct as st
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from chapterhousedb_spark.operators.multimodal import (
        make_wav_compressed_blob,
    )

    nibbles = bytes([0x17, 0x82, 0x3F, 0x40, 0x95, 0x06, 0xC8, 0x2B])
    pred0, idx0 = 1000, 20
    header = st.pack("<hBB", pred0, idx0, 0)
    block = header + nibbles  # mono: 1 + 16 samples, block_align 12
    blob = make_wav_compressed_blob(
        block, 0x11, channels=1, bits=4, block_align=12, samples_per_block=17
    )
    d = decode_real(blob)
    assert d["ok"] and d["height"] == 1 and d["n_frames"] == 17

    swapped = bytes(((b & 0x0F) << 4) | (b >> 4) for b in nibbles)
    ref, _state = audioop.adpcm2lin(swapped, 2, (pred0, idx0))
    want = [pred0] + list(st.unpack(f"<{len(ref) // 2}h", ref))
    want_mean = sum(abs(s) for s in want) / len(want)
    assert abs(d["mean_pixel"] - want_mean) < 1e-9, (d["mean_pixel"], want_mean)

    # stereo with identical per-channel nibbles == mono duplicated
    stereo_block = header + header + b"".join(
        nibbles[i : i + 4] + nibbles[i : i + 4] for i in range(0, 8, 4)
    )
    sblob = make_wav_compressed_blob(
        stereo_block, 0x11, channels=2, bits=4, block_align=24,
        samples_per_block=17,
    )
    sd = decode_real(sblob)
    assert sd["ok"] and sd["height"] == 2 and sd["n_frames"] == 17
    assert abs(sd["mean_pixel"] - want_mean) < 1e-9

    # malformed: step index past 88 in the block header
    bad = st.pack("<hBB", 0, 99, 0) + nibbles
    bb = make_wav_compressed_blob(bad, 0x11, bits=4, block_align=12)
    assert decode_real(bb)["ok"] is False

    # other registered formats (float PCM) degrade to ok=False
    f32 = make_wav_compressed_blob(b"\x00" * 8, 3, bits=32, block_align=4)
    assert decode_real(f32)["ok"] is False

def test_decode_real_jpeg_progressive_spectral_split(spark):
    """Spectral-selection progressive (SOF2: interleaved DC scan +
    per-component AC scans): the decoded raster is BIT-identical to
    the sequential encoding of the same pixels for gray, 4:4:4, 4:2:2
    and 4:2:0, at even and odd dims — and it decodes through the
    Arrow-batched Spark path."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        extract_features,
        make_jpeg_blob,
    )

    for w, h in ((16, 12), (13, 9)):
        for kwargs in (
            dict(), dict(gray=True), dict(subsample=True),
            dict(sampling=[(2, 1), (1, 1), (1, 1)]),
        ):
            prog = make_jpeg_blob(w, h, fill=5, progressive=True, **kwargs)
            seq = make_jpeg_blob(w, h, fill=5, **kwargs)
            assert prog.index(b"\xff\xc2") > 0
            pp, psamp = _decode_jpeg_pixels(prog)
            sp, ssamp = _decode_jpeg_pixels(seq)
            assert psamp == ssamp and np.array_equal(pp, sp), (w, h, kwargs)

    media = spark.createDataFrame(
        [(1, "image", make_jpeg_blob(24, 16, fill=9, progressive=True), ("t", 0))],
        MEDIA_SCHEMA,
    )
    got = extract_features(media, decoder=decode_real).collect()[0]
    assert got["ok"] and (got["width"], got["height"]) == (24, 16)


def _prog_jpeg_from_coeffs(blocks, bw, bh, scans):
    """Test-side progressive encoder from EXPLICIT quantized zigzag
    coefficient blocks (gray, flat q=1): a decoder-dual that exercises
    the successive-approximation scan kinds the production encoder's
    spectral split doesn't emit. `scans` lists (kind, ah, al) with
    kind in dc/ac; blocks are row-major over a bh x bw block grid."""
    import struct as st

    from chapterhousedb_spark.operators.multimodal import (
        _JPEG_ENC_AC_BITS, _JPEG_ENC_AC_VALS, _JPEG_ENC_DC_BITS,
        _JPEG_ENC_DC_VALS, _JpegBitWriter, _jpeg_category,
        _jpeg_huff_codes,
    )

    _, enc_dc = _jpeg_huff_codes(_JPEG_ENC_DC_BITS, _JPEG_ENC_DC_VALS)
    _, enc_ac = _jpeg_huff_codes(_JPEG_ENC_AC_BITS, _JPEG_ENC_AC_VALS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + st.pack(">H", len(payload) + 2) + payload

    def put(w, v, cat):
        if cat:
            w.write(v if v >= 0 else v + (1 << cat) - 1, cat)

    def dc_scan(ah, al):
        w = _JpegBitWriter()
        if ah == 0:
            pred = 0
            for blk in blocks:
                v = int(blk[0]) >> al  # DC point transform = arith shift
                diff = v - pred
                pred = v
                cat = _jpeg_category(diff)
                code, ln = enc_dc[cat]
                w.write(code, ln)
                put(w, diff, cat)
        else:
            for blk in blocks:
                w.write((int(blk[0]) >> al) & 1, 1)
        return seg(0xDA, bytes([1, 1, 0x00, 0, 0, (ah << 4) | al])) + w.flush()

    def ac_point(v, al):  # AC point transform = toward-zero division
        return (abs(int(v)) >> al) * (1 if v >= 0 else -1)

    def ac_first_scan(al):
        w = _JpegBitWriter()
        pending_eob = 0

        def flush_eob():
            nonlocal pending_eob
            while pending_eob:
                r = pending_eob.bit_length() - 1
                code, ln = enc_ac[r << 4]
                w.write(code, ln)
                if r:
                    w.write(pending_eob - (1 << r), r)
                pending_eob = 0

        for blk in blocks:
            vals = [ac_point(blk[k], al) for k in range(64)]
            nz = [k for k in range(1, 64) if vals[k]]
            if not nz:
                pending_eob += 1
                if pending_eob == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            k = 1
            for p in nz:
                run = p - k
                while run > 15:
                    code, ln = enc_ac[0xF0]
                    w.write(code, ln)
                    run -= 16
                v = vals[p]
                cat = _jpeg_category(v)
                code, ln = enc_ac[(run << 4) | cat]
                w.write(code, ln)
                put(w, v, cat)
                k = p + 1
            if k <= 63:
                pending_eob += 1
        flush_eob()
        return seg(0xDA, bytes([1, 1, 0x00, 1, 63, al])) + w.flush()

    def ac_refine_scan(ah, al):
        # dual of block_ac_refine, per-block EOB1 (history = values at
        # precision ah; this scan reveals bit `al`)
        w = _JpegBitWriter()
        for blk in blocks:
            hist = [ac_point(blk[k], ah) for k in range(64)]
            full = [ac_point(blk[k], al) for k in range(64)]
            k = 1
            while k <= 63:
                # next newly-nonzero position, counting zero-history zeros
                np_, r, j = None, 0, k
                while j <= 63:
                    if hist[j] == 0:
                        if full[j] != 0:
                            np_ = j
                            break
                        r += 1
                    j += 1
                if np_ is None:
                    code, ln = enc_ac[0x00]  # EOB1
                    w.write(code, ln)
                    for j in range(k, 64):
                        if hist[j] != 0:
                            w.write(abs(int(blk[j])) >> al & 1, 1)
                    k = 64
                    break
                while r > 15:
                    code, ln = enc_ac[0xF0]  # ZRL
                    w.write(code, ln)
                    zeros = 0
                    while zeros < 16:
                        if hist[k] != 0:
                            w.write(abs(int(blk[k])) >> al & 1, 1)
                        else:
                            zeros += 1
                        k += 1
                    r -= 16
                code, ln = enc_ac[(r << 4) | 1]
                w.write(code, ln)
                w.write(1 if full[np_] > 0 else 0, 1)
                j = k
                while j < np_:
                    if hist[j] != 0:
                        w.write(abs(int(blk[j])) >> al & 1, 1)
                    j += 1
                k = np_ + 1
        return seg(0xDA, bytes([1, 1, 0x00, 1, 63, (ah << 4) | al])) + w.flush()

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += seg(0xC2, bytes([8]) + st.pack(">HH", bh * 8, bw * 8) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00] + _JPEG_ENC_DC_BITS) + bytes(_JPEG_ENC_DC_VALS))
    out += seg(0xC4, bytes([0x10] + _JPEG_ENC_AC_BITS) + bytes(_JPEG_ENC_AC_VALS))
    for kind, ah, al in scans:
        out += dc_scan(ah, al) if kind == "dc" else (
            ac_first_scan(al) if ah == 0 else ac_refine_scan(ah, al)
        )
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_jpeg_progressive_successive_approximation():
    """Successive approximation (the scan kinds the production encoder
    doesn't emit): DC first at Al=1 + DC refine, AC first at Al=1 +
    AC refine — including EOBRUN>1 across empty blocks, a ZRL inside a
    refinement scan, newly-nonzero +-1 coefficients, and correction
    bits on history coefficients. The decoded raster must equal the
    direct IDCT of the coefficient blocks."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _decode_jpeg_pixels,
        _jpeg_dct_matrix,
    )

    rng = np.random.default_rng(7)
    blocks = []
    for b in range(6):
        blk = np.zeros(64, dtype=np.int64)
        blk[0] = int(rng.integers(-60, 60))
        if b == 0:
            blk[[1, 3, 20]] = [5, -3, 7]       # history coeffs + odd bits
            blk[25] = 1                          # newly nonzero in refine
        elif b == 1:
            blk[2] = -1                          # new-only block
            blk[40] = 2
        elif b == 2:
            blk[1] = 4
            blk[30] = -1                         # 28 zero-history run -> ZRL
        # blocks 3..5: AC-empty -> EOBRUN across blocks in ac_first
        blocks.append(blk)

    scans = [("dc", 0, 1), ("ac", 0, 1), ("dc", 1, 0), ("ac", 1, 0)]
    blob = _prog_jpeg_from_coeffs(blocks, 3, 2, scans)
    got, samp = _decode_jpeg_pixels(blob)
    assert samp == [(1, 1)] and got.shape == (16, 24, 1)

    a = _jpeg_dct_matrix()
    want = np.zeros((16, 24))
    for i, blk in enumerate(blocks):
        nat = np.zeros(64)
        nat[_JPEG_ZIGZAG] = blk
        pix = a.T @ nat.reshape(8, 8) @ a + 128.0
        r, c = divmod(i, 3)
        want[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = pix
    want = np.clip(np.rint(want), 0, 255).astype(np.uint8)
    assert np.array_equal(got[:, :, 0], want)

    # spectral-split-only decode of the SAME coefficients must agree
    blob2 = _prog_jpeg_from_coeffs(
        blocks, 3, 2, [("dc", 0, 0), ("ac", 0, 0)]
    )
    got2, _ = _decode_jpeg_pixels(blob2)
    assert np.array_equal(got, got2)

def test_resize_media_jpeg_progressive_source(spark):
    """resize_media decodes a progressive source and re-encodes it
    SEQUENTIAL (progression orders are a transmission choice with no
    raster meaning after resampling)."""
    from chapterhousedb_spark.operators.multimodal import (
        make_jpeg_blob,
        resize_media,
    )

    prog = make_jpeg_blob(16, 12, fill=5, progressive=True)
    media = spark.createDataFrame([(1, "image", prog, ("t", 0))], MEDIA_SCHEMA)
    row = resize_media(media, 8, 6).collect()[0]
    assert row["ok"]
    out = bytes(row["payload"])
    assert b"\xff\xc0" in out and b"\xff\xc2" not in out
    d = decode_real(out)
    assert d["ok"] and (d["width"], d["height"]) == (8, 6)

def test_audio_features_sine_vectors(spark):
    """audio_features over real WAV blobs: a pure sine's spectral
    centroid lands on the tone frequency (FFT-bin exact for a
    full-period tone), RMS equals amplitude/sqrt(2), ZCR equals
    2*f/rate; the features hold through a COMPRESSED (mu-law)
    container within quantization tolerance; stereo mixes to mono;
    undecodable rows mark ok=False."""
    import math

    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        audio_features,
        make_wav_blob,
        make_wav_compressed_blob,
    )

    rate, n, freq, amp = 8000, 4000, 440.0, 12000
    t = np.arange(n) / rate
    sine = np.rint(amp * np.sin(2 * np.pi * freq * t)).astype(int)
    pcm = make_wav_blob(list(sine), sample_rate=rate)

    # mu-law compressed container of the same tone
    def lin2ulaw(x):
        BIAS, CLIP = 0x84, 32635
        s = 0x80 if x < 0 else 0
        x = min(abs(x), CLIP) + BIAS
        e = x.bit_length() - 8
        m = (x >> (e + 3)) & 0x0F
        return ~(s | (e << 4) | m) & 0xFF

    ulaw = make_wav_compressed_blob(
        bytes(lin2ulaw(int(v)) for v in sine), 7, sample_rate=rate
    )
    stereo = make_wav_blob(
        [v for s in sine for v in (int(s), int(s))], sample_rate=rate,
        channels=2,
    )
    rows = [
        (1, "audio", pcm, ("t", 0)),
        (2, "audio", ulaw, ("t", 0)),
        (3, "audio", stereo, ("t", 0)),
        (4, "audio", b"not audio at all", ("t", 0)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in audio_features(media).collect()}

    # mu-law's ~38 dB quantization noise is broadband, so the
    # MAGNITUDE-weighted centroid of a compressed pure tone sits ~100
    # Hz above the tone (expected physics, not decoder error)
    for mid, tol in ((1, 1.0), (2, 160.0), (3, 1.0)):
        d = got[mid]
        assert d["ok"], mid
        assert abs(d["duration_s"] - n / rate) < 1e-12
        assert abs(d["spectral_centroid_hz"] - freq) < tol, (mid, d)
        assert abs(d["rms"] - amp / math.sqrt(2)) < amp * 0.02, (mid, d)
        assert abs(d["zero_crossing_rate"] - 2 * freq / rate) < 0.002, (mid, d)
    assert got[4]["ok"] is False and got[4]["rms"] is None

def test_decode_real_gif_multiframe(spark):
    """GIF decode: real LZW (variable-width codes, dict growth, 4096
    reset — all derivable from first principles, no memorized tables),
    global AND local color tables, multi-frame animation with
    n_frames, GIF87a magic, hand-verified mean over the palette ramp;
    malformed bytes return ok=False; decodes through the Arrow path."""
    from chapterhousedb_spark.operators.multimodal import (
        extract_features,
        make_gif_blob,
    )

    w, h, nf, fill, ncol = 10, 7, 3, 5, 5
    blob = make_gif_blob(w, h, n_frames=nf, fill=fill, n_colors=ncol)
    d = decode_real(blob)
    size = 1 << max(1, (ncol - 1).bit_length())
    pal = [
        ((fill + 3 * k) % 256, (fill + 3 * k + 1) % 256, (fill + 3 * k + 2) % 256)
        for k in range(size)
    ]
    tot = sum(
        sum(pal[(fill + f + i) % size]) for f in range(nf) for i in range(w * h)
    )
    want = tot / (3 * nf * w * h)
    assert d["ok"] and (d["width"], d["height"], d["n_frames"]) == (w, h, nf)
    assert abs(d["mean_pixel"] - want) < 1e-9

    lp = make_gif_blob(6, 4, n_colors=4, local_palette=True)
    assert decode_real(lp)["ok"]
    assert decode_real(b"GIF87a" + lp[6:])["ok"]  # 87a magic accepted
    assert decode_real(lp[:20])["ok"] is False
    assert decode_real(b"GIF89a" + b"\x00" * 20)["ok"] is False

    media = spark.createDataFrame(
        [(1, "video", blob, ("t", 0)), (2, "video", b"GIF89a junk", ("t", 0))],
        MEDIA_SCHEMA,
    )
    got = {
        r["media_id"]: r.asDict()
        for r in extract_features(media, decoder=decode_real).collect()
    }
    assert got[1]["ok"] and got[1]["n_frames"] == 3
    assert got[2]["ok"] is False


def test_gif_frames_real_sampling(spark):
    """gif_frames: one row per kept frame with the palette-resolved
    RGB raster — raster bytes equal the index-ramp lookup exactly;
    every_nth subsamples; foreign payloads are skipped."""
    from chapterhousedb_spark.operators.multimodal import (
        gif_frames,
        make_gif_blob,
    )

    w, h, nf, fill, ncol = 6, 4, 5, 2, 4
    blob = make_gif_blob(w, h, n_frames=nf, fill=fill, n_colors=ncol)
    media = spark.createDataFrame(
        [(1, "video", blob, ("t", 0)), (2, "video", b"not a gif", ("t", 0))],
        MEDIA_SCHEMA,
    )
    rows = gif_frames(media, every_nth=2).collect()
    by_idx = {r["frame_idx"]: r for r in rows}
    assert sorted(by_idx) == [0, 2, 4]
    size = 1 << max(1, (ncol - 1).bit_length())
    pal = [
        ((fill + 3 * k) % 256, (fill + 3 * k + 1) % 256, (fill + 3 * k + 2) % 256)
        for k in range(size)
    ]
    for fi, r in by_idx.items():
        assert (r["width"], r["height"]) == (w, h)
        want = b"".join(
            bytes(pal[(fill + fi + i) % size]) for i in range(w * h)
        )
        assert bytes(r["frame_rgb"]) == want, fi

def test_resize_media_gif(spark):
    """resize_media on a multi-frame GIF: nearest-neighbor in INDEX
    space with each frame's own palette (lossless — no quantization),
    all frames kept; output round-trips decode_real at the target
    dims with the exact gathered-pixel mean."""
    from chapterhousedb_spark.operators.multimodal import (
        make_gif_blob,
        resize_media,
    )

    w, h, nf, fill, ncol = 8, 6, 2, 3, 4
    blob = make_gif_blob(w, h, n_frames=nf, fill=fill, n_colors=ncol)
    media = spark.createDataFrame([(1, "video", blob, ("t", 0))], MEDIA_SCHEMA)
    row = resize_media(media, 4, 3).collect()[0]
    assert row["ok"]
    d = decode_real(bytes(row["payload"]))
    assert d["ok"] and (d["width"], d["height"], d["n_frames"]) == (4, 3, nf)
    size = 1 << max(1, (ncol - 1).bit_length())
    pal = [
        ((fill + 3 * k) % 256, (fill + 3 * k + 1) % 256, (fill + 3 * k + 2) % 256)
        for k in range(size)
    ]
    ys = [(y * h) // 3 for y in range(3)]
    xs = [(x * w) // 4 for x in range(4)]
    tot = sum(
        sum(pal[(fill + f + (y * w + x)) % size])
        for f in range(nf) for y in ys for x in xs
    )
    want = tot / (3 * nf * 4 * 3)
    assert abs(d["mean_pixel"] - want) < 1e-9

def test_gif_interlaced_deinterlaces(spark):
    """An interlaced GIF (flag 0x40, rows stored in the four passes)
    deinterlaces on decode: gif_frames' raster and decode_real's
    features equal the sequential encoding of the SAME pixel grid —
    and the resize path therefore gathers the right rows."""
    from chapterhousedb_spark.operators.multimodal import (
        gif_frames,
        make_gif_blob,
        resize_media,
    )

    w, h, fill, ncol = 7, 11, 4, 4  # odd dims exercise pass rounding
    seq = make_gif_blob(w, h, fill=fill, n_colors=ncol)
    lace = make_gif_blob(w, h, fill=fill, n_colors=ncol, interlace=True)
    assert decode_real(lace) == decode_real(seq)
    media = spark.createDataFrame(
        [(1, "video", seq, ("t", 0)), (2, "video", lace, ("t", 0))],
        MEDIA_SCHEMA,
    )
    rasters = {
        r["media_id"]: bytes(r["frame_rgb"]) for r in gif_frames(media).collect()
    }
    assert rasters[1] == rasters[2]
    resized = {
        r["media_id"]: decode_real(bytes(r["payload"]))
        for r in resize_media(media, 4, 5).collect()
    }
    assert resized[1] == resized[2] and resized[1]["ok"]

def test_decode_real_bmp_matrix(spark):
    """Windows BMP decode: 24/32-bit BI_RGB, 8-bit palette, RLE8 —
    bottom-up AND top-down row orders all yield the same top-down
    raster semantics (hand-verified means); a hand-crafted RLE stream
    exercises the delta + absolute escapes; malformed bytes ok=False;
    decodes through the Arrow path."""
    import struct as st

    from chapterhousedb_spark.operators.multimodal import (
        extract_features,
        make_bmp_blob,
    )

    def mean_rgb(w, h, fill):
        body = [(fill + i) % 256 for i in range(w * h * 3)]
        return sum(body) / len(body)

    for kwargs in (
        dict(), dict(top_down=True), dict(bpp=32),
    ):
        d = decode_real(make_bmp_blob(7, 5, fill=9, **kwargs))
        assert d["ok"] and (d["width"], d["height"]) == (7, 5), kwargs
        assert abs(d["mean_pixel"] - mean_rgb(7, 5, 9)) < 1e-9, kwargs

    def mean_pal(w, h, fill, ncol):
        palette = [
            ((fill + 3 * k) % 256, (fill + 3 * k + 1) % 256, (fill + 3 * k + 2) % 256)
            for k in range(ncol)
        ]
        tot = sum(
            sum(palette[(fill + y * w + x) % ncol])
            for y in range(h) for x in range(w)
        )
        return tot / (3 * w * h)

    for kwargs in (dict(), dict(rle=True), dict(rle=True, top_down=True)):
        d = decode_real(make_bmp_blob(9, 6, fill=2, bpp=8, n_colors=5, **kwargs))
        assert d["ok"] and abs(d["mean_pixel"] - mean_pal(9, 6, 2, 5)) < 1e-9, kwargs

    # hand-crafted RLE8 with delta + absolute escapes: 4x2 top-down,
    # palette [0]=(10,20,30), [1]=(40,50,60); row0 = 1,1,0,0 via
    # absolute(3) + run(1); delta skips to row1 which stays palette 0
    # except the last pixel set via run after the delta
    pal = bytes((30, 20, 10, 0)) + bytes((60, 50, 40, 0))
    # absolute mode (count>=3, word-aligned): 00 03 01 01 00 (pad) ->
    # pixels 1,1,0; then run 1 of palette 0; EOL; delta (3,0); run 1 of
    # palette 1; EOB
    rle = bytes((0, 3, 1, 1, 0, 0)) + bytes((1, 0)) + bytes((0, 0)) + bytes((0, 2, 3, 0)) + bytes((1, 1)) + bytes((0, 1))
    info = st.pack("<IiiHHIIiiII", 40, 4, -2, 1, 8, 1, len(rle), 0, 0, 2, 0)
    blob = b"BM" + st.pack("<IHHI", 62 + len(rle), 0, 0, 62) + info + pal + rle
    d = decode_real(blob)
    # row0: [1,1,0,0]; delta (3,0) from row1 x=0 -> skips 3 zero pixels
    # (already palette 0 = black fill? no: grid initializes to 0-bytes
    # = RGB(0,0,0), NOT palette[0]) -> then run 1 of palette 1 at x=3
    px0, px1 = (10, 20, 30), (40, 50, 60)
    tot = sum(px1) * 2 + sum(px0) * 2 + 0 * 3 + sum(px1)
    assert d["ok"] and (d["width"], d["height"]) == (4, 2)
    assert abs(d["mean_pixel"] - tot / 24) < 1e-9, d

    assert decode_real(b"BM" + b"\x00" * 30)["ok"] is False
    assert decode_real(make_bmp_blob(7, 5)[:-20])["ok"] is False

    media = spark.createDataFrame(
        [(1, "image", make_bmp_blob(8, 4, fill=1), ("t", 0))], MEDIA_SCHEMA
    )
    got = extract_features(media, decoder=decode_real).collect()[0]
    assert got["ok"] and (got["width"], got["height"]) == (8, 4)


def test_resize_media_bmp(spark):
    """resize_media on BMP: RGB gather + 24-bit BI_RGB re-encode
    (palette/RLE sources promote to truecolor); round-trips decode_real
    with the exact gathered-pixel mean."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        make_bmp_blob,
        resize_media,
    )

    blob = make_bmp_blob(8, 6, fill=5)
    rle = make_bmp_blob(8, 6, fill=5, bpp=8, n_colors=6, rle=True)
    media = spark.createDataFrame(
        [(1, "image", blob, ("t", 0)), (2, "image", rle, ("t", 0))],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r.asDict() for r in resize_media(media, 4, 3).collect()}
    for mid in (1, 2):
        assert got[mid]["ok"], mid
        d = decode_real(bytes(got[mid]["payload"]))
        assert d["ok"] and (d["width"], d["height"]) == (4, 3), mid
    src = np.array(
        [(5 + i) % 256 for i in range(8 * 6 * 3)], dtype=np.uint64
    ).reshape(6, 8, 3)
    ys, xs = (np.arange(3) * 6) // 3, (np.arange(4) * 8) // 4
    want = src[ys][:, xs].mean()
    d1 = decode_real(bytes(got[1]["payload"]))
    assert abs(d1["mean_pixel"] - want) < 1e-9


# ------------------------------------------------- perceptual near-dup


def _rand_rgb(seed: int, w: int, h: int):
    """Deterministic md5-decorrelated RGB raster (R=G=B), as bytes."""
    import hashlib

    import numpy as np

    img = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x, :] = int(
                hashlib.md5(f"t:{seed}:{y}:{x}".encode()).hexdigest()[:2], 16
            )
    return img


def test_phash_invariant_to_resize_and_reencode():
    """The whole point of perceptual hashing: an N-fold nearest-
    neighbor upscale re-encoded in a DIFFERENT container hashes
    identically; a distinct image lands far away in hamming space."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        _ahash_int,
        _dhash_int,
        _gray_grid,
        _nn_gather,
        encode_bmp_rgb,
        encode_png_rgb,
    )

    base = _rand_rgb(1, 16, 16)
    twin = np.kron(base, np.ones((3, 3, 1), np.uint8))  # 3x upscale
    other = _rand_rgb(2, 16, 16)

    def hashes(img, enc):
        h, w, _ = img.shape
        g = _gray_grid(enc(img.tobytes(), w, h))
        assert g is not None and g.shape == (h, w)
        assert (g == img[:, :, 0]).all()  # R=G=B -> luma == channel
        return _ahash_int(_nn_gather(g, 8, 8)), _dhash_int(
            _nn_gather(g, 9, 8)
        )

    hb = hashes(base, encode_png_rgb)
    ht = hashes(twin, encode_bmp_rgb)  # resized AND re-encoded
    ho = hashes(other, encode_png_rgb)
    assert hb == ht

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(hb[0], ho[0]) > 10 and ham(hb[1], ho[1]) > 10


def test_gray_grid_covers_every_codec():
    """One luma definition across containers: the same raster through
    PPM, PNG, BMP and GIF decodes to the same grayscale grid; JPEG
    (lossy) lands within quantization distance; junk returns None."""
    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        _encode_jpeg,
        _gray_grid,
        encode_bmp_rgb,
        encode_png_rgb,
        make_gif_blob,
    )

    img = _rand_rgb(3, 16, 16)
    raw = img.tobytes()
    ppm = b"P6\n16 16\n255\n" + raw
    g_ppm = _gray_grid(ppm)
    g_png = _gray_grid(encode_png_rgb(raw, 16, 16))
    g_bmp = _gray_grid(encode_bmp_rgb(raw, 16, 16))
    assert (g_ppm == g_png).all() and (g_ppm == g_bmp).all()
    # true-color luma: distinct channels weight 299/587/114
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2] = 200, 100, 50
    g = _gray_grid(encode_png_rgb(rgb.tobytes(), 2, 2))
    assert int(g[0, 0]) == (299 * 200 + 587 * 100 + 114 * 50) // 1000
    # JPEG: near-lossless flat-quant encode -> within a few levels
    g_jpg = _gray_grid(_encode_jpeg(img, quant=1))
    assert g_jpg.shape == (16, 16)
    assert int(np.abs(g_jpg.astype(int) - g_ppm.astype(int)).max()) <= 4
    # GIF first frame (grayscale palette ramp is exactly representable)
    gif = make_gif_blob(4, 4, n_frames=2)
    assert _gray_grid(gif) is not None and _gray_grid(gif).shape == (4, 4)
    assert _gray_grid(b"not an image") is None
    assert _gray_grid(None) is None


def test_media_near_dup_pairs_e2e(spark):
    """Planted resize-twin pairs (hamming 0), the distinct image does
    not pair, the undecodable payload is excluded not fatal — through
    the real Spark mapInPandas + blocked-join path, on both methods."""
    from chapterhousedb_spark.operators.multimodal import (
        encode_bmp_rgb,
        encode_png_rgb,
        media_near_dup_pairs,
        media_phash,
    )

    import numpy as np

    base = _rand_rgb(7, 16, 16)
    twin = np.kron(base, np.ones((2, 2, 1), np.uint8))
    other = _rand_rgb(8, 16, 16)
    rows = [
        (1, encode_png_rgb(base.tobytes(), 16, 16)),
        (2, encode_bmp_rgb(twin.tobytes(), 32, 32)),
        (3, encode_png_rgb(other.tobytes(), 16, 16)),
        (4, b"junk payload"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fp = {r["media_id"]: r for r in media_phash(media).collect()}
    assert fp[4]["ok"] is False and fp[4]["ahash"] is None
    assert fp[1]["ahash"] == fp[2]["ahash"]
    assert fp[1]["dhash"] == fp[2]["dhash"]
    for method in ("ahash", "dhash"):
        got = media_near_dup_pairs(
            media, method=method, max_hamming=3, persist=False
        ).collect()
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [
            (1, 2, 0)
        ]
    with pytest.raises(ValueError, match="method"):
        media_near_dup_pairs(media, method="phash")


def test_media_admission_gate_e2e(spark, tmp_path):
    """VERDICT r12 #6: the perceptual image gate composed into the
    ingest admission path (admit_batch with gate_fn =
    media_near_dup_pairs_cross). A batch image that is a RESIZED +
    RE-ENCODED copy of a corpus image is rejected; a distinct image
    and an undecodable payload are admitted (no fingerprint -> cannot
    pair); the versioned merge carries the binary payload column
    through parquet intact."""
    import numpy as np

    from chapterhousedb_spark.operators.ingest import admit_batch, init_ingest
    from chapterhousedb_spark.operators.multimodal import (
        encode_bmp_rgb,
        encode_png_rgb,
        media_near_dup_pairs_cross,
    )
    from chapterhousedb_spark.streaming.batcher import read_versioned_base

    seed_img = _rand_rgb(21, 16, 16)
    other_seed = _rand_rgb(22, 16, 16)
    twin = np.kron(seed_img, np.ones((2, 2, 1), np.uint8))
    fresh = _rand_rgb(23, 16, 16)
    corpus_rows = [
        (0, 0, encode_png_rgb(seed_img.tobytes(), 16, 16)),
        (1, 0, encode_png_rgb(other_seed.tobytes(), 16, 16)),
    ]
    batch_rows = [
        (10, 1, encode_bmp_rgb(twin.tobytes(), 32, 32)),  # resized copy
        (11, 1, encode_png_rgb(fresh.tobytes(), 16, 16)),  # new picture
        (12, 1, b"not an image"),  # undecodable: admitted, not fatal
    ]
    schema = "doc_id long, version int, payload binary"
    root = str(tmp_path / "corpus")
    init_ingest(spark.createDataFrame(corpus_rows, schema), root)

    from pyspark.sql import functions as F

    def media_gate(batch, corpus):
        return media_near_dup_pairs_cross(
            batch.select(F.col("doc_id").alias("media_id"), "payload"),
            corpus.select(F.col("doc_id").alias("media_id"), "payload"),
            method="ahash",
            max_hamming=3,
        ).select("batch_id", "corpus_id")

    res = admit_batch(
        spark.createDataFrame(batch_rows, schema), root, gate_fn=media_gate
    )
    assert res["n_batch"] == 3 and res["n_admitted"] == 2
    final, ver = read_versioned_base(spark, root)
    assert ver == 1
    got = {r["doc_id"]: r for r in final.collect()}
    assert sorted(got) == [0, 1, 11, 12]  # twin (10) rejected
    # payload bytes survive the merge byte-exactly
    assert bytes(got[11]["payload"]) == encode_png_rgb(
        fresh.tobytes(), 16, 16
    )


def test_audio_phash_invariances_and_pairs(spark):
    """audio_phash: mu-law re-encode and 2x sample-repetition twins
    hash identically; a distinct clip lands far away; stereo mixdown
    is the exact per-frame channel sum; too-short and undecodable
    clips mark their own row. Pairs flow through the shared hamming
    blocking."""
    import hashlib

    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        _ulaw_to_linear16,
        audio_near_dup_pairs,
        audio_phash,
        make_wav_blob,
        make_wav_compressed_blob,
    )

    def clip(seed):
        return [
            int(
                hashlib.md5(f"t:{seed}:{t}".encode()).hexdigest()[:2], 16
            )
            for t in range(512)
        ]

    cw = clip(1)
    pcm = [_ulaw_to_linear16(c) for c in cw]
    other = [_ulaw_to_linear16(c) for c in clip(2)]
    stereo = [s for s in pcm for _ in range(2)]  # L == R
    rows = [
        (1, make_wav_blob(pcm, 8000)),
        (2, make_wav_compressed_blob(bytes(cw), 7)),  # mu-law re-encode
        (3, make_wav_blob([s for s in pcm for _ in range(2)], 16000)),
        (4, make_wav_blob(other, 8000)),
        (5, make_wav_blob(pcm[:32], 8000)),  # < 64 frames: no hash
        (6, b"RIFFjunk"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fp = {r["media_id"]: r for r in audio_phash(media).collect()}
    assert fp[1]["aphash"] == fp[2]["aphash"] == fp[3]["aphash"]
    assert fp[5]["ok"] is False and fp[6]["ok"] is False
    h = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert h(fp[1]["aphash"], fp[4]["aphash"]) > 10
    # stereo frame (L+R) == 2x mono sample -> uniform gain -> same hash
    st = spark.createDataFrame(
        [(7, make_wav_blob(stereo, 8000, channels=2))],
        "media_id long, payload binary",
    )
    assert audio_phash(st).collect()[0]["aphash"] == fp[1]["aphash"]
    got = audio_near_dup_pairs(media, max_hamming=3, persist=False).collect()
    assert sorted((r["id_a"], r["id_b"], r["hamming"]) for r in got) == [
        (1, 2, 0),
        (1, 3, 0),
        (2, 3, 0),
    ]


def test_audio_admission_gate_e2e(spark, tmp_path):
    """The audio gate composes into admit_batch exactly like the image
    and text gates: a mu-law re-encoded copy of a corpus clip is
    rejected, a distinct clip is admitted."""
    import hashlib

    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.ingest import admit_batch, init_ingest
    from chapterhousedb_spark.operators.multimodal import (
        _ulaw_to_linear16,
        audio_near_dup_pairs_cross,
        make_wav_blob,
        make_wav_compressed_blob,
    )
    from chapterhousedb_spark.streaming.batcher import read_versioned_base

    def cw(seed):
        return [
            int(hashlib.md5(f"a:{seed}:{t}".encode()).hexdigest()[:2], 16)
            for t in range(512)
        ]

    seed_cw, fresh_cw = cw(1), cw(2)
    corpus_rows = [
        (0, 0, make_wav_blob([_ulaw_to_linear16(c) for c in seed_cw], 8000))
    ]
    batch_rows = [
        (10, 1, make_wav_compressed_blob(bytes(seed_cw), 7)),  # re-encode
        (11, 1, make_wav_blob([_ulaw_to_linear16(c) for c in fresh_cw], 8000)),
    ]
    schema = "doc_id long, version int, payload binary"
    root = str(tmp_path / "corpus")
    init_ingest(spark.createDataFrame(corpus_rows, schema), root)

    def audio_gate(batch, corpus):
        return audio_near_dup_pairs_cross(
            batch.select(F.col("doc_id").alias("media_id"), "payload"),
            corpus.select(F.col("doc_id").alias("media_id"), "payload"),
            max_hamming=3,
        ).select("batch_id", "corpus_id")

    res = admit_batch(
        spark.createDataFrame(batch_rows, schema), root, gate_fn=audio_gate
    )
    assert res["n_admitted"] == 1
    final, _ = read_versioned_base(spark, root)
    assert sorted(r["doc_id"] for r in final.collect()) == [0, 11]


def test_video_near_dup_containment(spark):
    """Frame-fingerprint containment: a 2x-upscaled re-encode matches
    on ALL frames, an every-second-frame sample reaches containment
    1.0 (Jaccard would dilute to 0.5), a distinct clip doesn't pair,
    max_df drops a stop-frame shared by everything, and an
    undecodable payload degrades its own row."""
    import hashlib

    import numpy as np

    from chapterhousedb_spark.operators.multimodal import (
        encode_gif_gray,
        video_near_dup_pairs,
        video_phash,
    )

    def frame(seed, f, scale=1):
        n = 16 * scale
        img = np.zeros((n, n), np.uint8)
        for y in range(16):
            for x in range(16):
                img[y * scale : (y + 1) * scale, x * scale : (x + 1) * scale] = int(
                    hashlib.md5(f"v:{seed}:{f}:{y}:{x}".encode()).hexdigest()[:2],
                    16,
                )
        return img.tobytes()

    base = encode_gif_gray([frame(1, f) for f in range(6)], 16, 16)
    up = encode_gif_gray([frame(1, f, 2) for f in range(6)], 32, 32)
    samp = encode_gif_gray([frame(1, f) for f in (0, 2, 4)], 16, 16)
    other = encode_gif_gray([frame(2, f) for f in range(6)], 16, 16)
    rows = [(1, base), (2, up), (3, samp), (4, other), (5, b"junk")]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fp = video_phash(media).collect()
    per = {}
    for r in fp:
        per.setdefault(r["media_id"], []).append(r)
    assert len(per[1]) == 6 and all(r["ok"] for r in per[1])
    assert len(per[5]) == 1 and per[5][0]["ok"] is False
    # every_nth sampling halves the rows
    assert len(
        [r for r in video_phash(media, every_nth=2).collect()
         if r["media_id"] == 1]
    ) == 3
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["containment"])
        for r in video_near_dup_pairs(media, min_containment=0.99).collect()
    }
    assert got[(1, 2)] == (6, 1.0)
    assert got[(1, 3)] == (3, 1.0)
    assert got[(2, 3)] == (3, 1.0)
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    # a shared stop-frame (black) must not glue distinct clips together
    blackish = [
        (10, encode_gif_gray([frame(7, 0), b"\x00" * 256], 16, 16)),
        (11, encode_gif_gray([frame(8, 0), b"\x00" * 256], 16, 16)),
    ]
    m2 = spark.createDataFrame(blackish, "media_id long, payload binary")
    with_df = video_near_dup_pairs(m2, min_containment=0.99, max_df=1)
    assert with_df.collect() == []
    without = video_near_dup_pairs(m2, min_containment=0.5)
    assert len(without.collect()) == 1  # the stop-frame pairs them
    with pytest.raises(ValueError, match="every_nth"):
        video_phash(media, every_nth=0)


def test_video_admission_gate_e2e(spark, tmp_path):
    """The video gate composes into admit_batch like the image/audio
    gates: a frame-sampled copy of a corpus clip is rejected (its
    distinct hashes are a subset -> containment 1.0), a distinct clip
    is admitted."""
    import hashlib

    import numpy as np
    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.ingest import admit_batch, init_ingest
    from chapterhousedb_spark.operators.multimodal import (
        encode_gif_gray,
        video_near_dup_pairs_cross,
    )
    from chapterhousedb_spark.streaming.batcher import read_versioned_base

    def frame(seed, f):
        return bytes(
            int(hashlib.md5(f"vg:{seed}:{f}:{i}".encode()).hexdigest()[:2], 16)
            for i in range(16 * 16)
        )

    corpus_rows = [
        (0, 0, encode_gif_gray([frame(1, f) for f in range(6)], 16, 16))
    ]
    batch_rows = [
        (10, 1, encode_gif_gray([frame(1, f) for f in (0, 2, 4)], 16, 16)),
        (11, 1, encode_gif_gray([frame(2, f) for f in range(6)], 16, 16)),
    ]
    schema = "doc_id long, version int, payload binary"
    root = str(tmp_path / "corpus")
    init_ingest(spark.createDataFrame(corpus_rows, schema), root)

    def video_gate(batch, corpus):
        return video_near_dup_pairs_cross(
            batch.select(F.col("doc_id").alias("media_id"), "payload"),
            corpus.select(F.col("doc_id").alias("media_id"), "payload"),
            min_containment=0.99,
        ).select("batch_id", "corpus_id")

    res = admit_batch(
        spark.createDataFrame(batch_rows, schema), root, gate_fn=video_gate
    )
    assert res["n_admitted"] == 1
    final, _ = read_versioned_base(spark, root)
    assert sorted(r["doc_id"] for r in final.collect()) == [0, 11]


def test_y4m_parse_roundtrip_and_corrupt():
    """Y4M (YUV4MPEG2) — the real video container (VERDICT r13 #4):
    encode_y4m_gray plants luma verbatim in the Y plane; _parse_y4m
    recovers it byte-exactly across chroma layouts; malformed streams
    (truncated frame, missing dims, unknown colorspace, bad frame
    magic, zero frames) return None rather than raising."""
    from chapterhousedb_spark.operators.multimodal import (
        _parse_y4m,
        decode_real,
        encode_y4m_gray,
    )

    f0 = bytes(range(256))
    f1 = bytes((3 * i) % 256 for i in range(256))
    for cs in ("420jpeg", "420mpeg2", "422", "444", "mono"):
        p = encode_y4m_gray([f0, f1], 16, 16, colorspace=cs)
        w, h, frames = _parse_y4m(p)
        assert (w, h, len(frames)) == (16, 16, 2)
        assert frames[0].tobytes() == f0
        assert frames[1].tobytes() == f1
    p = encode_y4m_gray([f0, f1], 16, 16)
    d = decode_real(p)
    assert d["ok"] and d["n_frames"] == 2 and d["width"] == 16
    assert d["mean_pixel"] == (sum(f0) + sum(f1)) / 512
    # corrupt / boundary cases: None (ok=False upstream), never raise
    assert _parse_y4m(p[: len(p) - 10]) is None  # truncated frame
    assert _parse_y4m(b"YUV4MPEG2 W16\nFRAME\n") is None  # no H
    assert _parse_y4m(b"YUV4MPEG2 W16 H16 Cfoo\n") is None  # colorspace
    assert _parse_y4m(p.replace(b"FRAME", b"FRAMX", 1)) is None
    assert _parse_y4m(b"YUV4MPEG2 W16 H16\n") is None  # zero frames
    assert _parse_y4m(b"YUV4MPEG2 W15 H15\nFRAME\n") is None  # odd@420
    assert _parse_y4m(b"YUV4MPEG2 W16 H16") is None  # header unterminated
    with pytest.raises(ValueError, match="even dimensions"):
        encode_y4m_gray([f0], 15, 15)
    with pytest.raises(ValueError, match="luma bytes"):
        encode_y4m_gray([f0[:-1]], 16, 16)


def test_video_near_dup_cross_container_gif_y4m(spark):
    """A Y4M re-encode of a GIF clip is a near-dup at containment 1.0:
    the per-frame fingerprint hashes the luma grid, and the Y4M Y
    plane IS the luma — container identity never enters the hash. A
    corrupt Y4M yields one ok=False accounting row and pairs with
    nothing."""
    import hashlib

    from chapterhousedb_spark.operators.multimodal import (
        encode_gif_gray,
        encode_y4m_gray,
        video_near_dup_pairs,
        video_phash,
    )

    def frame(seed, f):
        return bytes(
            int(hashlib.md5(f"y4x:{seed}:{f}:{i}".encode()).hexdigest()[:2], 16)
            for i in range(16 * 16)
        )

    clips = [
        (1, encode_gif_gray([frame(1, f) for f in range(5)], 16, 16)),
        (2, encode_y4m_gray([frame(1, f) for f in range(5)], 16, 16)),
        # Y4M frame-sampled copy: containment 1.0 via subset rule
        (3, encode_y4m_gray([frame(1, f) for f in (0, 2, 4)], 16, 16)),
        (4, encode_y4m_gray([frame(9, f) for f in range(5)], 16, 16)),
        (5, b"YUV4MPEG2 W16 H16\nFRAME\ntruncated"),
    ]
    media = spark.createDataFrame(clips, "media_id long, payload binary")
    fp = video_phash(media)
    bad = fp.filter("media_id = 5").collect()
    assert len(bad) == 1 and bad[0]["ok"] is False
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in video_near_dup_pairs(media, min_containment=0.99).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert all(c == 1.0 for c in got.values())
