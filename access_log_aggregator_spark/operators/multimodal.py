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
                rows.append((int(doc_id), len(b), w, h, fn))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload_bytes", "width", "height", "feature_norm"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)
