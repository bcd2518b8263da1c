"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata
struct, processed by Arrow-batched pandas iterators (mapInPandas) —
the Spark-idiomatic shape for per-blob Python work: batches stream
through workers, nothing collects to the driver, and partition sizing
controls memory per task.

The actual codec decode is STUBBED (media libraries are not available
in this environment): `decode_stub` parses a deterministic fake header
instead of calling a real decoder, and `decode_real` raises
NotImplementedError where PIL/ffmpeg would plug in. Everything
Spark-side — schema, batching, UDF signatures, partitioning — is real
and tested (tests/test_multimodal.py).

Fake blob format (deterministic, produced by make_fake_blob):
  bytes 0-3   magic b"FAKE"
  bytes 4-7   width  (big-endian uint32)
  bytes 8-11  height (big-endian uint32)
  bytes 12-15 n_frames (big-endian uint32; 1 for still images)
  bytes 16..  payload: one byte per pixel per frame (w*h*n_frames)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def make_fake_blob(width: int, height: int, n_frames: int = 1, fill: int = 0) -> bytes:
    """Deterministic fake media payload (see module docstring)."""
    body = bytes((fill + i) % 256 for i in range(width * height * n_frames))
    return b"FAKE" + struct.pack(">III", width, height, n_frames) + body


def decode_real(payload: bytes) -> dict:
    """Where a real codec (PIL / soundfile / ffmpeg) would be called."""
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg, not available in this environment"
    )


def decode_stub(payload: bytes) -> dict:
    """Parse the deterministic fake header; mirrors what decode_real
    would return for an actual codec."""
    if payload is None or len(payload) < 16 or payload[:4] != b"FAKE":
        return {"width": None, "height": None, "n_frames": None, "mean_pixel": None, "ok": False}
    w, h, nf = struct.unpack(">III", payload[4:16])
    body = payload[16 : 16 + w * h * nf]
    mean = (sum(body) / len(body)) if body else None
    return {"width": w, "height": h, "n_frames": nf, "mean_pixel": mean, "ok": True}


def extract_features(media: DataFrame, batch_hint_rows: int = 1024) -> DataFrame:
    """Decode + feature-extract every blob via mapInPandas.

    Arrow streams batches of rows into Python; each batch is decoded
    row-wise in pandas (a real decoder would vectorize here). Output
    rows align 1:1 with input blobs. At 100 TB: throughput scales with
    partitions; `spark.sql.files.maxPartitionBytes` bounds per-task
    payload memory, and binary columns never pass through the driver.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "width", "height", "n_frames", "mean_pixel", "ok"]]

    return media.select("media_id", "payload").mapInPandas(_decode, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling for video-kind blobs: emit one row per kept frame
    (frame payloads sliced from the blob; demonstrates 1->N mapInPandas)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_stub(payload)
                if not d["ok"]:
                    continue
                w, h, nf = d["width"], d["height"], d["n_frames"]
                for f in range(0, nf, every_nth):
                    start = 16 + f * w * h
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(bytes(payload[start : start + w * h]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("media_id", "payload").mapInPandas(_sample, schema)


def chunk_binary(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    chunk_size: int = 4096,
) -> DataFrame:
    """Fixed-size binary chunking, fully JVM-side (substring slices
    binary): (id, chunk_idx, chunk), last chunk short. The standard
    shape for sharding large blobs into row-group-friendly pieces for
    storage/transport; concat(chunks in order) == original payload.
    At scale: one Generate per row, no Python, no driver involvement.
    """
    return (
        df.select(F.col(id_col), F.col(payload_col).alias("__p"))
        .select(
            id_col,
            "__p",
            F.explode(
                F.expr(
                    f"sequence(CAST(0 AS INT), "
                    f"CAST(greatest(ceil(octet_length(__p) / {chunk_size}.0), 1) - 1 AS INT))"
                )
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.expr(f"substring(__p, chunk_idx * {chunk_size} + 1, {chunk_size})").alias(
                "chunk"
            ),
        )
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/workload: wrap the documents table's text
    bytes as fake image blobs so the binary plumbing runs on real
    testdata shapes (JVM-side header construction, no Python)."""
    payload = F.concat(
        F.lit(b"FAKE"),
        # width = min(n_chars, 64), height = 1, n_frames = 1 (big-endian)
        F.expr(
            "concat(unhex(lpad(hex(least(n_chars, 64)), 8, '0')), "
            "unhex('00000001'), unhex('00000001'))"
        ),
        F.encode(F.substring("text", 1, 64), "UTF-8"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.octet_length(F.col("text")).alias("n_bytes"),
        ).alias("meta"),
    )
