"""Multimodal column plumbing (decode stubbed; Spark-side wiring real).

Treats media as opaque ``binary`` payloads + typed metadata, processed with
``mapInPandas`` so decode/feature-extraction runs Arrow-batched (never
row-at-a-time Python). The sandbox bundles no image/audio codecs, so the
decode step is a clearly-marked deterministic stub: real deployments replace
``_decode_stub`` with e.g. PIL/ffmpeg and keep the Spark plumbing (schema,
batch iteration, partitioning) unchanged.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature_norm", DoubleType()),
    ]
)


def _id(doc_id) -> int | None:
    """Null-safe id pass-through: a nullable long column reaches pandas as
    float64 with NaN for nulls, and ``int(nan)`` would kill the whole task
    — a null id must flow through as null, like any other per-row defect."""
    return None if pd.isna(doc_id) else int(doc_id)


def _decode_stub(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake decode. REPLACE with a real codec in production.

    Derives (width, height, feature_norm) purely from the bytes so tests are
    reproducible; raises on empty payload like a real decoder would.
    """
    if not payload:
        raise ValueError("empty media payload")
    n = len(payload)
    width = 16 + (payload[0] % 64)
    height = 16 + (payload[-1] % 64)
    feature_norm = float(sum(payload[:64])) / (64.0 * 255.0)
    return width, height, feature_norm


def extract_stub_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id") -> DataFrame:
    """binary payload -> typed feature rows via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                try:
                    w, h, fn = _decode_stub(b)
                except ValueError:
                    w, h, fn = -1, -1, 0.0  # decode failure -> sentinel row
                rows.append((_id(doc_id), len(b), w, h, fn))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload_bytes", "width", "height", "feature_norm"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized", BinaryType()),
    ]
)


def _resize_stub(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Deterministic fake resize. REPLACE with PIL's Image.resize in
    production — the Spark plumbing (schema, Arrow batches) is unchanged.

    Emits out_w*out_h bytes by nearest-neighbor sampling the payload, so
    output size and content are a pure function of the input."""
    if not payload:
        raise ValueError("empty media payload")
    n = len(payload)
    return bytes(payload[(i * n) // (out_w * out_h)] for i in range(out_w * out_h))


def resize_stub(df: DataFrame, out_width: int = 8, out_height: int = 8,
                payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Aspect-aware decode+resize plumbing over mapInPandas.

    Each output row carries the decoded source dims and the resized binary
    (out_width*out_height bytes). Decode failure -> sentinel dims, null blob.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                try:
                    w, h, _ = _decode_stub(b)
                    out = _resize_stub(b, out_width, out_height)
                except ValueError:
                    w, h, out = -1, -1, None
                rows.append((_id(doc_id), w, h, out_width, out_height, out))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_width", "out_height", "resized"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_offset", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample_stub(df: DataFrame, every_n: int = 4, frame_bytes: int = 256,
                      payload_col: str = "payload",
                      id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling plumbing: 1 input row -> N frame rows (a
    flat-map, which is why this is mapInPandas and not a scalar UDF).

    The stub treats the payload as fixed-size frames and keeps every
    ``every_n``-th one; production swaps the slicer for an ffmpeg/pyav
    decoder keeping the same exploded output shape. Output rows are narrow
    (frame blob + offsets), so downstream shuffles never carry the full
    source video."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                n_frames = len(b) // frame_bytes
                for k, f in enumerate(range(0, n_frames, every_n)):
                    off = f * frame_bytes
                    rows.append((_id(doc_id), k, off, b[off:off + frame_bytes]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_offset", "frame"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)
