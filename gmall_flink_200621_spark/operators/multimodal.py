"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schema convention, Arrow
batch shape, `mapInPandas` pipelines, partition sizing — while the actual
codec work is stubbed behind `DECODERS` (the image/audio libraries aren't
in this environment). Swap a stub for a real decoder (PIL/librosa/ffmpeg)
and nothing else changes: the UDF signature, batching, and schema are the
production shape.

Scale notes:
- binary payloads ride in Arrow record batches; keep
  `spark.sql.execution.arrow.maxRecordsPerBatch` low (payloads are MBs,
  not bytes — 10k-row default batches would blow executor memory).
- decode → feature-extract is mapInPandas (1:1-ish, no shuffle); frame
  sampling explodes rows (1:N) which mapInPandas also permits.
- metadata lives in typed columns NEXT TO the blob so filters/joins prune
  without touching bytes (columnar parquet never reads the blob column
  for a metadata-only query).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),  # image/video metadata
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),  # audio/video metadata
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: a feature vector
    derived from the payload digest. Replace with a real codec; the
    signature (bytes → fixed-dim float vector) is the production contract."""
    if payload is None:
        raise ValueError("null payload")
    digest = hashlib.sha256(kind.encode() + payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def _real_decode(payload: bytes, kind: str) -> list[float]:  # pragma: no cover
    raise NotImplementedError(
        "real decoders (PIL/librosa/pyav) are not available in this "
        "environment; production deployments register them in DECODERS"
    )


DECODERS = {"fake": _fake_decode, "real": _real_decode}


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """mapInPandas decode + feature extraction: per-Arrow-batch, vectorized
    iteration, blob column dropped on output (features replace payloads)."""
    decode = DECODERS[decoder]
    out_schema = "media_id long, kind string, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])],
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000, decoder: str = "fake") -> DataFrame:
    """Frame sampling (1:N row explosion inside mapInPandas): one feature
    row per sampled timestamp for video/audio, driven by duration_ms."""
    decode = DECODERS[decoder]
    out_schema = "media_id long, frame_ts_ms long, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.kind not in ("video", "audio") or r.duration_ms is None:
                    continue
                for ts in range(0, int(r.duration_ms), every_ms):
                    feats = decode(r.payload + ts.to_bytes(8, "little"), r.kind)
                    rows.append((r.media_id, ts, feats))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ts_ms", "features"])

    return media.mapInPandas(run, schema=out_schema)


def resize_images(media: DataFrame, width: int, height: int, decoder: str = "fake") -> DataFrame:
    """Image resize: binary→binary mapInPandas (stub re-digests; a real
    impl decodes, resizes, re-encodes). Metadata columns updated to the
    target dims — the part the engine owns either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"].copy()
            if decoder == "fake":
                img["payload"] = [
                    hashlib.sha256(p + f"{width}x{height}".encode()).digest() for p in img["payload"]
                ]
            else:  # pragma: no cover
                raise NotImplementedError("real resize requires PIL")
            img["width"] = width
            img["height"] = height
            yield img

    return media.mapInPandas(run, schema=media.schema)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus for tests (payload = seeded digest
    bytes); the plumbing under test is identical to real payloads."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                5000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
