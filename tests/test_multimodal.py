"""Multimodal binary-column plumbing (operators/multimodal.py).

The decode/resize/frame-sample kernels are deterministic stubs (no codecs in
the sandbox — SURVEY.md §7.0); these tests pin the Spark-side contract that a
real codec would inherit: schema, Arrow batch shape, row explosion, and
driver-Python == distributed equality.
"""

from __future__ import annotations

import pytest

from access_log_aggregator_spark.operators.multimodal import (
    _decode_stub,
    _resize_stub,
    extract_stub_features,
    frame_sample_stub,
    resize_stub,
)

PAYLOADS = [
    (0, b"\x00" * 300),
    (1, bytes(range(256)) * 5),
    (2, b"x"),
    (3, b""),          # decode failure -> sentinel
    (4, None),         # null payload -> sentinel
    (5, b"frame-data" * 200),
]


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(
        [(i, p) for i, p in PAYLOADS], "doc_id long, payload binary"
    )


def test_features_match_local_stub(media):
    rows = {r["doc_id"]: r for r in extract_stub_features(media).collect()}
    assert len(rows) == len(PAYLOADS)
    for doc_id, payload in PAYLOADS:
        got = rows[doc_id]
        if not payload:
            assert (got["width"], got["height"], got["feature_norm"]) == (-1, -1, 0.0)
        else:
            w, h, fn = _decode_stub(payload)
            assert (got["width"], got["height"]) == (w, h)
            assert got["feature_norm"] == pytest.approx(fn)
            assert got["payload_bytes"] == len(payload)


def test_resize_match_local_stub(media):
    rows = {r["doc_id"]: r for r in resize_stub(media, 8, 8).collect()}
    for doc_id, payload in PAYLOADS:
        got = rows[doc_id]
        assert (got["out_width"], got["out_height"]) == (8, 8)
        if not payload:
            assert got["resized"] is None and got["width"] == -1
        else:
            assert bytes(got["resized"]) == _resize_stub(payload, 8, 8)
            assert len(got["resized"]) == 64


def test_frame_sample_explodes_rows(media):
    out = frame_sample_stub(media, every_n=4, frame_bytes=256)
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, payload in PAYLOADS:
        b = payload or b""
        n_frames = len(b) // 256
        expect = list(range(0, n_frames, 4))
        got = sorted(by_doc.get(doc_id, []), key=lambda r: r["frame_no"])
        assert [r["frame_no"] for r in got] == list(range(len(expect)))
        for k, f in enumerate(expect):
            assert got[k]["frame_offset"] == f * 256
            assert bytes(got[k]["frame"]) == b[f * 256:(f + 1) * 256]
