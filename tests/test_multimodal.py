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


def test_null_doc_id_flows_through(spark):
    """A NULL id must not kill the task: a nullable long column reaches
    pandas as float64 NaN, and the stubs previously did int(nan). The row
    flows through with a null doc_id, like any other per-row defect."""
    df = spark.createDataFrame(
        [(None, b"\x01" * 300), (7, b"\x02" * 300)],
        "doc_id long, payload binary",
    )
    feats = extract_stub_features(df).collect()
    assert sorted(r["doc_id"] for r in feats if r["doc_id"] is not None) == [7]
    assert sum(1 for r in feats if r["doc_id"] is None) == 1
    assert all(r["width"] > 0 for r in feats)  # payloads still decoded

    rs = resize_stub(df, 4, 4).collect()
    assert sum(1 for r in rs if r["doc_id"] is None) == 1

    frames = frame_sample_stub(df, every_n=1, frame_bytes=100).collect()
    assert sum(1 for r in frames if r["doc_id"] is None) == 3  # 300/100 frames


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


def test_registry_query_goldens(spark):
    """Driver-side GOLDEN value check for the two multimodal registry
    queries, INDEPENDENT of their DuckDB oracles (a 3-way triangle:
    Spark == pure Python here, Spark == DuckDB in run_entry_check): every
    output row — dims, norms, byte lengths, md5 digests — equals a
    pure-Python recomputation from the same documents parquet. Exact
    equality, all rows (both ops of the merged multimodal_transforms
    union are checked row-for-row)."""
    import hashlib

    import pyarrow.parquet as pq

    from access_log_aggregator_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"].encode("utf-8")
        for r in pq.read_table(f"{sf}/documents.parquet").to_pylist()
    }
    assert docs

    got = {r["doc_id"]: r for r in
           QUERIES["multimodal_stub_features"].spark_fn(spark, sf).collect()}
    assert set(got) == set(docs)
    for did, b in docs.items():
        w, h, fn = _decode_stub(b)
        r = got[did]
        assert (r["payload_bytes"], r["width"], r["height"], r["feature_norm"]) \
            == (len(b), w, h, fn), did

    rows = QUERIES["multimodal_transforms"].spark_fn(spark, sf).collect()
    resized = {r["doc_id"]: r for r in rows if r["op"] == "resize"}
    assert set(resized) == set(docs)
    for did, b in docs.items():
        out = _resize_stub(b, 8, 8)
        r = resized[did]
        assert (r["width"], r["height"], r["out_width"], r["out_height"]) \
            == (*_decode_stub(b)[:2], 8, 8)
        # registry hash is md5 over the UPPERCASE HEX encoding (DuckDB 1.0
        # cannot md5 raw blobs; both engines hash the hex string)
        assert (r["n_bytes"], r["content_md5"]) \
            == (len(out), hashlib.md5(out.hex().upper().encode()).hexdigest()), did
        assert r["byte_offset"] is None and r["item_no"] == 0

    want = {}
    for did, b in docs.items():
        for k, f in enumerate(range(0, len(b) // 256, 4)):
            chunk = b[f * 256:(f + 1) * 256]
            want[(did, k)] = (
                f * 256, len(chunk),
                hashlib.md5(chunk.hex().upper().encode()).hexdigest(),
            )
    got_frames = {
        (r["doc_id"], r["item_no"]): (r["byte_offset"], r["n_bytes"], r["content_md5"])
        for r in rows if r["op"] == "frame"
    }
    assert got_frames == want


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
