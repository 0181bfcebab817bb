"""Pure-stdlib codec correctness (functions/codecs.py): PNG round-trips
and hand-built filter streams, BMP 24-bit + palette, binary PNM, RIFF-PCM
WAV — plus the Spark decode_image_stats / decode_audio_stats operators
over mixed clean/corrupt/unsupported payload columns."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from whisper_pandas_spark.functions.codecs import (
    CodecError,
    _PNG_MAGIC,
    _chunk,
    _paeth,
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    decode_wav,
    encode_png,
    encode_wav,
)


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Independent PNG encoder applying a chosen per-row filter cycle —
    exercises the decoder's Sub/Up/Average/Paeth reconstruction paths,
    which the filter-0-only encode_png cannot."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    raws = []
    for r in range(h):
        ft = ftypes[r % len(ftypes)]
        cur = flat[r]
        enc = cur.copy()
        if ft == 1:
            for i in range(stride - 1, c - 1, -1):
                enc[i] = (cur[i] - cur[i - c]) & 0xFF
        elif ft == 2:
            enc = (cur - prev) & 0xFF
        elif ft == 3:
            for i in range(stride):
                left = cur[i - c] if i >= c else 0
                enc[i] = (cur[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                left = cur[i - c] if i >= c else 0
                ul = prev[i - c] if i >= c else 0
                enc[i] = (cur[i] - _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        raws.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + _chunk(b"IEND", b"")
    )


def _bmp24(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    row = (w * 3 + 3) & ~3
    pix = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        line = img[r][:, ::-1].tobytes()  # RGB -> BGR
        pix += line + b"\x00" * (row - len(line))
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    off = 14 + 40
    return b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off) + info + bytes(pix)


def _bmp8(idx: np.ndarray, pal: list[tuple[int, int, int]]) -> bytes:
    h, w = idx.shape
    row = (w + 3) & ~3
    pix = bytearray()
    for r in range(h - 1, -1, -1):
        pix += idx[r].tobytes() + b"\x00" * (row - w)
    paltab = b"".join(bytes([b, g, rc, 0]) for rc, g, b in pal)
    off = 14 + 40 + len(paltab)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pix), 0, 0, len(pal), 0
    )
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + info
        + paltab
        + bytes(pix)
    )


# -- pure decoders ---------------------------------------------------------


def test_png_roundtrip_all_channel_counts():
    rng = np.random.default_rng(7)
    for shape in [(5, 7), (5, 7, 1), (4, 6, 2), (3, 9, 3), (8, 8, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ref = img if img.ndim == 3 else img[:, :, None]
        h, w, c, out = decode_image(encode_png(img))
        assert (h, w, c) == ref.shape
        assert (out == ref).all()


def test_png_all_filter_types_reconstruct():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for fts in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        h, w, c, out = decode_png(_png_with_filters(img, fts))
        assert (out == img).all(), fts


def test_png_palette_resolves_to_rgb():
    pal = np.array([[250, 1, 2], [3, 240, 5], [6, 7, 230]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(2))
    data = (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    h, w, c, out = decode_png(data)
    assert (h, w, c) == (2, 3, 3)
    assert (out == pal[idx]).all()


def test_png_malformed_variants_raise_codec_error():
    img = np.zeros((2, 2), dtype=np.uint8)
    good = encode_png(img)
    for bad in (
        b"",
        b"\x89PNG\r\n\x1a\n",          # magic only, no chunks
        good[: 8 + 25 + 10],            # truncated mid-IDAT
        good.replace(b"\x08\x00", b"\x10\x00", 1),  # 16-bit depth
    ):
        with pytest.raises(CodecError):
            decode_png(bad)


def test_bmp24_bottom_up_with_padding():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # row pad 3->12
    h, w, c, out = decode_bmp(_bmp24(img))
    assert (h, w, c) == (5, 3, 3)
    assert (out == img).all()


def test_bmp8_palette():
    rng = np.random.default_rng(6)
    pal = [(10, 20, 30), (200, 100, 50), (0, 0, 0), (255, 255, 255)]
    idx = rng.integers(0, 4, size=(4, 5)).astype(np.uint8)
    h, w, c, out = decode_bmp(_bmp8(idx, pal))
    assert (out == np.array(pal, dtype=np.uint8)[idx]).all()


def test_bmp_rejects_compressed_and_truncated():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = _bmp24(img)
    with pytest.raises(CodecError):
        decode_bmp(good[:40])
    rle = bytearray(good)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
    with pytest.raises(CodecError):
        decode_bmp(bytes(rle))


def test_pnm_p5_p6_with_comments():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    h, w, c, out = decode_pnm(b"P6\n# cmt\n6 4\n255\n" + img.tobytes())
    assert (h, w, c) == (4, 6, 3) and (out == img).all()
    g = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
    h, w, c, out = decode_pnm(b"P5 5 3 255 " + g.tobytes())
    assert (h, w, c) == (3, 5, 1) and (out[:, :, 0] == g).all()
    with pytest.raises(CodecError):
        decode_pnm(b"P6 2 2 255 " + b"\x00" * 5)  # short pixels


def test_wav_roundtrip_16bit_stereo_and_8bit_rescale():
    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, size=(100, 2)).astype(np.int16)
    rate, ch, out = decode_wav(encode_wav(s, 8000))
    assert (rate, ch) == (8000, 2) and (out == s).all()

    raw8 = rng.integers(0, 256, size=50, dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw8)) + raw8.tobytes()
    )
    rate, ch, out = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (out[:, 0] == ((raw8.astype(np.int16) - 128) << 8)).all()

    with pytest.raises(CodecError):
        decode_wav(b"RIFFxxxxWAVE")  # no fmt/data
    nonpcm = bytearray(encode_wav(s, 8000))
    struct.pack_into("<H", nonpcm, 20, 3)  # IEEE float format tag
    with pytest.raises(CodecError):
        decode_wav(bytes(nonpcm))


# -- Spark operators -------------------------------------------------------


def test_decode_image_stats_mixed_payloads(spark):
    """PNG + BMP + PNM in one binary column; corrupt rows are skipped
    (on_error=skip), nulled (on_error=null), or fail the task."""
    from whisper_pandas_spark.operators.multimodal import decode_image_stats

    rng = np.random.default_rng(21)
    png = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    bmp = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(2, 7), dtype=np.uint8)
    rows = [
        (0, encode_png(png)),
        (1, _bmp24(bmp)),
        (2, b"P5 7 2 255 " + gray.tobytes()),
        (3, b"\xff\xd8\xff\xe0 jpeg"),       # truncated JPEG
        (4, b"garbage bytes"),                # unrecognised
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    got = {r["doc_id"]: r for r in decode_image_stats(df, "doc_id").collect()}
    assert set(got) == {0, 1, 2}
    assert (got[0]["height"], got[0]["width"], got[0]["channels"]) == (6, 4, 3)
    assert got[0]["mean_px"] == pytest.approx(float(png.mean()))
    assert got[0]["px_md5"] == hashlib.md5(png.tobytes()).hexdigest()
    assert (got[1]["height"], got[1]["width"]) == (3, 5)
    assert got[1]["px_md5"] == hashlib.md5(bmp.tobytes()).hexdigest()
    assert got[2]["channels"] == 1
    assert got[2]["mean_px"] == pytest.approx(float(gray.mean()))

    nulled = {
        r["doc_id"]: r
        for r in decode_image_stats(df, "doc_id", on_error="null").collect()
    }
    assert set(nulled) == {0, 1, 2, 3, 4}
    assert nulled[3]["height"] is None and nulled[3]["px_md5"] is None
    assert nulled[0]["px_md5"] == got[0]["px_md5"]

    with pytest.raises(Exception):
        decode_image_stats(df, "doc_id", on_error="fail").collect()
    with pytest.raises(ValueError):
        decode_image_stats(df, "doc_id", on_error="bogus")


def test_decode_audio_stats(spark):
    from whisper_pandas_spark.operators.multimodal import decode_audio_stats

    rng = np.random.default_rng(22)
    mono = rng.integers(-2000, 2000, size=160).astype(np.int16)
    stereo = rng.integers(-32768, 32768, size=(50, 2)).astype(np.int16)
    rows = [
        (0, encode_wav(mono, 16000)),
        (1, encode_wav(stereo, 8000)),
        (2, b"not audio at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_audio_stats(df, "doc_id").collect()}
    assert set(got) == {0, 1}
    assert (got[0]["sample_rate"], got[0]["channels"]) == (16000, 1)
    assert got[0]["n_samples"] == 160
    assert got[0]["duration_s"] == pytest.approx(0.01)
    assert got[0]["rms"] == pytest.approx(
        float(np.sqrt(np.mean(np.square(mono.astype(np.float64)))))
    )
    assert (got[1]["sample_rate"], got[1]["channels"]) == (8000, 2)
    assert got[1]["rms"] == pytest.approx(
        float(np.sqrt(np.mean(np.square(stereo.astype(np.float64)))))
    )


def test_decode_stats_tolerate_null_payloads(spark):
    """A NULL binary cell must follow the on_error contract, not
    TypeError-crash the Arrow task."""
    from whisper_pandas_spark.operators.multimodal import (
        decode_audio_stats,
        decode_image_stats,
    )

    img = encode_png(np.zeros((2, 2), dtype=np.uint8))
    df = spark.createDataFrame(
        [(0, img), (1, None)], "doc_id long, payload binary"
    )
    assert [r["doc_id"] for r in decode_image_stats(df, "doc_id").collect()] == [0]
    nulled = {r["doc_id"]: r for r in
              decode_image_stats(df, "doc_id", on_error="null").collect()}
    assert nulled[1]["px_md5"] is None
    wav = encode_wav(np.zeros(10, dtype=np.int16))
    adf = spark.createDataFrame(
        [(0, wav), (1, None)], "doc_id long, payload binary"
    )
    assert [r["doc_id"] for r in decode_audio_stats(adf, "doc_id").collect()] == [0]


def test_codecs_reject_review_payloads():
    """The hostile payloads the round-5 review found escaping as
    struct.error / bare ValueError must raise CodecError."""
    import struct as _s

    from whisper_pandas_spark.functions.codecs import decode_bmp, decode_png

    # IHDR declaring a 5-byte body
    short_ihdr = (
        _PNG_MAGIC + _chunk(b"IHDR", b"\x00" * 5) + _chunk(b"IEND", b"")
    )
    with pytest.raises(CodecError):
        decode_png(short_ihdr)
    # PLTE not a multiple of 3
    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    bad_plte = (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", b"\x00" * 4)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(CodecError):
        decode_png(bad_plte)
    # BMP with negative width
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    neg = bytearray(_bmp24(img))
    _s.pack_into("<i", neg, 18, -2)
    with pytest.raises(CodecError):
        decode_bmp(bytes(neg))
