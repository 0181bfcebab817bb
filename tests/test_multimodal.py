"""Multimodal binary-column plumbing (X5): schema contracts, deterministic
fake decode, frame-sampling row explosion."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.multimodal import (
    FRAME_BYTES,
    binary_metadata,
    decode_image,
    extract_features,
    fake_decode_features,
    sample_frames,
    with_payload,
)


@pytest.fixture(scope="module")
def payloads(spark):
    df = spark.createDataFrame(
        [(0, "a" * 100), (1, "xyz " * 40), (2, "q")], ["doc_id", "text"]
    )
    return with_payload(df)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_binary_metadata_values(payloads):
    rows = {r["doc_id"]: r for r in binary_metadata(payloads, "doc_id").collect()}
    assert rows[0]["n_bytes"] == 100
    assert rows[0]["payload_md5"] == hashlib.md5(b"a" * 100).hexdigest()
    assert rows[0]["mime"] == "application/octet-stream"
    assert rows[0]["n_frames"] == 2  # ceil(100/64)
    assert rows[2]["n_frames"] == 1


def test_mime_sniff_magic_bytes(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"\x89PNG\r\n")), (1, bytearray(b"\xff\xd8\xff\xe0")),
         (2, bytearray(b"RIFFxxxx")), (3, bytearray(b"hello"))],
        ["doc_id", "payload"],
    )
    rows = {r["doc_id"]: r["mime"] for r in binary_metadata(df, "doc_id").collect()}
    assert rows[0] == "image/png"
    assert rows[1] == "image/jpeg"
    assert rows[2] == "audio/wav"
    assert rows[3] == "application/octet-stream"


def test_extract_features_matches_reference_impl(payloads):
    rows = {r["doc_id"]: r["features"] for r in
            extract_features(payloads, "doc_id").collect()}
    assert rows[0] == fake_decode_features(b"a" * 100)
    assert len(rows[1]) == 16
    assert abs(sum(rows[1]) - 1.0) < 1e-9  # L1-normalized histogram


def test_sample_frames_explosion(payloads):
    rows = sample_frames(payloads, "doc_id", every=1).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 160 bytes -> 3 frames at every=1 (64+64+32)
    f1 = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f1] == [0, 1, 2]
    raw = ("xyz " * 40).encode()
    assert bytes(f1[0]["frame_bytes"]) == raw[:FRAME_BYTES]
    assert f1[0]["frame_md5"] == hashlib.md5(raw[:FRAME_BYTES]).hexdigest()
    assert len(bytes(f1[2]["frame_bytes"])) == 160 - 2 * FRAME_BYTES
