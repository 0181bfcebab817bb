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


def test_decode_image_real_png_and_jpeg():
    """decode_image is REAL for PNG (pure zlib+numpy) AND baseline JPEG
    (functions/jpeg.py); malformed payloads of either raise CodecError."""
    import numpy as np

    from whisper_pandas_spark.functions.codecs import CodecError, encode_png
    from whisper_pandas_spark.functions.jpeg import encode_jpeg

    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    h, w, c, out = decode_image(encode_png(img))
    assert (h, w, c) == (2, 4, 3)
    assert (out == img).all()
    h, w, c, out = decode_image(encode_jpeg(img, quality=100))
    assert (h, w, c) == (2, 4, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6
    with pytest.raises(CodecError):
        decode_image(b"\x89PNG")  # truncated magic -> malformed
    with pytest.raises(CodecError):
        decode_image(b"\xff\xd8\xff\xe0 jfif")  # truncated JPEG


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


def test_resize_images_matches_numpy_nearest(spark):
    """resize_images must equal an independent numpy nearest-neighbor
    computation byte-for-byte, including the zero-pad of short payloads."""
    import hashlib

    import numpy as np

    from whisper_pandas_spark.operators.multimodal import resize_images

    rng = np.random.default_rng(7)
    rows = []
    shapes = {}
    for i, (h, w) in enumerate([(16, 16), (10, 7), (3, 5)]):
        n = h * w if i != 1 else h * w - 13  # one short (padded) payload
        payload = bytes(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        rows.append((i, payload, h, w))
        shapes[i] = (payload, h, w)
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, height int, width int"
    )
    out_h, out_w = 4, 4
    got = {
        r["doc_id"]: r
        for r in resize_images(
            df, "doc_id", out_h=out_h, out_w=out_w
        ).collect()
    }
    assert set(got) == {0, 1, 2}
    for i, (payload, h, w) in shapes.items():
        img = np.zeros(h * w, dtype=np.uint8)
        raw = np.frombuffer(payload, dtype=np.uint8)
        img[: min(len(raw), h * w)] = raw[: h * w]
        img = img.reshape(h, w)
        rr = (np.arange(out_h) * h) // out_h
        cc = (np.arange(out_w) * w) // out_w
        want = img[rr][:, cc].tobytes()
        assert bytes(got[i]["resized"]) == want
        assert got[i]["resized_md5"] == hashlib.md5(want).hexdigest()
        assert (got[i]["out_h"], got[i]["out_w"]) == (out_h, out_w)


def test_resize_images_degenerate_dims_emit_zero_block(spark):
    """h==0 or w==0 must not crash the Arrow task (tolerant-decode
    convention): degenerate rows emit an all-zero out_h*out_w block and
    healthy rows in the same batch are unaffected."""
    import hashlib

    import numpy as np

    from whisper_pandas_spark.operators.multimodal import resize_images

    rng = np.random.default_rng(11)
    healthy = bytes(rng.integers(0, 256, 6 * 6, dtype=np.uint8).tobytes())
    rows = [
        (0, healthy, 6, 6),
        (1, b"\x01\x02\x03", 0, 6),   # h == 0
        (2, b"", 6, 0),               # w == 0
        (3, b"\xff", 0, 0),           # both
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, height int, width int"
    )
    got = {
        r["doc_id"]: r
        for r in resize_images(df, "doc_id", out_h=4, out_w=4).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    zero = bytes(16)
    for i in (1, 2, 3):
        assert bytes(got[i]["resized"]) == zero
        assert got[i]["resized_md5"] == hashlib.md5(zero).hexdigest()
    # healthy row still does real nearest-neighbor math
    img = np.frombuffer(healthy, dtype=np.uint8).reshape(6, 6)
    rr = (np.arange(4) * 6) // 4
    want = img[rr][:, rr].tobytes()
    assert bytes(got[0]["resized"]) == want


# -- audio_features --------------------------------------------------------


def test_audio_features_pure_tone_vs_silence(spark):
    import numpy as np

    from whisper_pandas_spark.functions.codecs import encode_wav
    from whisper_pandas_spark.operators.multimodal import audio_features

    rate = 8000
    t = np.arange(rate)  # 1 s
    tone = (
        (0.5 * np.sin(2 * np.pi * 1000.0 * t / rate)) * 32767
    ).astype(np.int16)[:, None]
    silence = np.zeros((rate, 1), dtype=np.int16)
    half = np.concatenate([tone[: rate // 2], silence[: rate // 2]])
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(tone, rate))),
            (2, bytearray(encode_wav(silence, rate))),
            (3, bytearray(encode_wav(half, rate))),
            (4, None),
            (5, bytearray(b"not audio")),
        ],
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in audio_features(df, "doc_id", on_error="null").collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # 1 kHz tone: centroid near 1 kHz, tight bandwidth, no silent frames
    assert abs(out[1]["spectral_centroid_hz"] - 1000.0) < 50.0
    assert out[1]["spectral_bandwidth_hz"] < 200.0
    assert out[1]["silence_ratio"] == 0.0
    assert abs(out[1]["peak"] - 0.5) < 0.01
    # 1 kHz sine crosses zero 2x per cycle: zcr ~ 2*f/rate
    assert abs(out[1]["zcr"] - 2 * 1000.0 / rate) < 0.02
    # pure silence: every frame silent, no spectral stats
    assert out[2]["silence_ratio"] == 1.0
    assert out[2]["spectral_centroid_hz"] is None
    assert out[2]["rms_max"] == 0.0
    # half tone / half silence: ratio in between
    assert 0.3 < out[3]["silence_ratio"] < 0.7
    # tolerant decode: null row for bad payloads
    assert out[4]["n_frames"] is None and out[5]["n_frames"] is None


def test_audio_features_skip_and_validation(spark):
    import numpy as np

    from whisper_pandas_spark.functions.codecs import encode_wav
    from whisper_pandas_spark.operators.multimodal import audio_features

    ok = bytearray(
        encode_wav(np.ones((1000, 1), dtype=np.int16) * 1000, 8000)
    )
    df = spark.createDataFrame(
        [(1, ok), (2, bytearray(b"xx"))], "doc_id long, payload binary"
    )
    got = audio_features(df, "doc_id", on_error="skip").collect()
    assert [r["doc_id"] for r in got] == [1]
    # short clip pads to one frame
    assert got[0]["n_frames"] == ((1000 - 512) // 256) + 1
    with pytest.raises(ValueError):
        audio_features(df, "doc_id", frame=4, hop=8)
    with pytest.raises(ValueError):
        audio_features(df, "doc_id", on_error="explode")


def _pgm(arr) -> bytes:
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    return f"P5\n{w} {h}\n255\n".encode() + a.tobytes()


def test_fake_decode_features_bincount_parity():
    """The vectorized bincount path is bit-identical to the original
    per-byte loop (VERDICT r5 What's-wrong #1)."""
    for payload in (b"", b"\x00", bytes(range(256)) * 3, b"a" * 100):
        counts = [0] * 16
        for b in payload:
            counts[b % 16] += 1
        total = max(len(payload), 1)
        assert fake_decode_features(payload) == [c / total for c in counts]


def test_image_features_planted_gradient(spark):
    """A planted ramp image has analytically-known moments, gradient
    means, and orientation histogram."""
    import numpy as np

    from whisper_pandas_spark.operators.multimodal import (
        ORIENT_BINS,
        image_features,
    )

    # 4x4 horizontal ramp: row-independent, columns 0,10,20,30
    ramp = np.tile(np.arange(4) * 10, (4, 1)).astype(np.uint8)
    # flat image: zero std -> null skew, zero gradients
    flat = np.full((4, 4), 7, dtype=np.uint8)
    # vertical step at mid-height
    step = np.zeros((8, 8), dtype=np.uint8)
    step[4:, :] = 100
    df = spark.createDataFrame(
        [(0, bytearray(_pgm(ramp))), (1, bytearray(_pgm(flat))),
         (2, bytearray(_pgm(step)))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in image_features(df, "doc_id").collect()}

    r = rows[0]
    b = ramp.astype(np.float64)
    assert (r["height"], r["width"], r["channels"]) == (4, 4, 1)
    assert r["mean_px"] == b.mean()
    assert abs(r["std_px"] - b.std()) < 1e-12
    assert r["grad_x_mean"] == 10.0  # |diff| along rows is 10 everywhere
    assert r["grad_y_mean"] == 0.0
    # interior central gradients: cgx=20 (east), cgy=0 -> theta=0 -> bin 4
    hist = r["orient_hist"]
    assert len(hist) == ORIENT_BINS
    assert hist[ORIENT_BINS // 2] == 1.0

    f = rows[1]
    assert f["std_px"] == 0.0 and f["skew_px"] is None
    assert f["grad_x_mean"] == 0.0 and f["grad_y_mean"] == 0.0

    s = rows[2]
    # 8x8 step: vertical |diff| is 100 on one of 7 row-gaps
    assert s["grad_x_mean"] == 0.0
    assert abs(s["grad_y_mean"] - 100.0 / 7.0) < 1e-12
    # central gy is +100 on the two rows straddling the step (south =
    # theta pi/2 -> bin 6), 0 elsewhere (east tie handled by atan2(0,0)=0)
    assert abs(sum(s["orient_hist"]) - 1.0) < 1e-12


def test_image_features_on_error_contract(spark):
    from whisper_pandas_spark.operators.multimodal import image_features

    df = spark.createDataFrame(
        [(0, bytearray(b"not an image")), (1, None)],
        "doc_id long, payload binary",
    )
    assert image_features(df, "doc_id", on_error="skip").count() == 0
    nulls = image_features(df, "doc_id", on_error="null").collect()
    assert sorted(r["doc_id"] for r in nulls) == [0, 1]
    assert all(r["mean_px"] is None for r in nulls)
    with pytest.raises(Exception):
        image_features(df, "doc_id", on_error="fail").count()
    with pytest.raises(ValueError):
        image_features(df, "doc_id", on_error="bogus")
