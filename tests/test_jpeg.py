"""Baseline JPEG codec correctness (functions/jpeg.py).

Round-trips use the in-repo encoder twin (same strategy as encode_png):
``quality=100`` forces all-ones quantization tables so the error bound
is pure DCT rounding and can be asserted tightly; the encoder builds
per-image canonical Huffman tables, so the decoder's variable-length
table walk is exercised with real multi-length codes, byte stuffing and
restart markers — no external fixture or codec library involved.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from whisper_pandas_spark.functions.codecs import CodecError, decode_image
from whisper_pandas_spark.functions.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    _build_decode_table,
    _canonical_encode_table,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3 + xx) % 256, (xx * 5) % 256, (yy * 2 + 40) % 256], axis=-1
    ).astype(np.uint8)


# -- round trips -----------------------------------------------------------


def test_gray_q100_roundtrip_tight():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 17), dtype=np.uint8)  # non-multiple of 8
    h, w, c, out = decode_jpeg(encode_jpeg(img, quality=100))
    assert (h, w, c) == (24, 17, 1)
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 4  # DCT rounding only
    assert err.mean() < 1.0


def test_rgb_q100_roundtrip_tight():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (16, 21, 3), dtype=np.uint8)
    h, w, c, out = decode_jpeg(encode_jpeg(img, quality=100))
    assert (h, w, c) == (16, 21, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 6  # DCT + two color-transform roundings
    assert err.mean() < 1.5


def test_rgb_q90_lossy_but_close_on_smooth_image():
    img = _gradient(32, 40)
    h, w, c, out = decode_jpeg(encode_jpeg(img, quality=90))
    assert (h, w, c) == (32, 40, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 6.0


def test_420_subsampling_roundtrip_on_smooth_image():
    img = _gradient(33, 30)  # odd dims exercise chroma edge padding
    h, w, c, out = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert (h, w, c) == (33, 30, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 24  # nearest-neighbor chroma upsample vs 2x2 mean
    assert err.mean() < 4.0


def test_restart_interval_decodes_identically():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=100))[3]
    restarted = decode_jpeg(encode_jpeg(img, quality=100, restart_interval=2))[3]
    assert np.array_equal(plain, restarted)


def test_single_block_and_single_pixel_images():
    img = np.full((8, 8), 200, dtype=np.uint8)
    h, w, c, out = decode_jpeg(encode_jpeg(img, quality=100))
    assert (h, w, c) == (8, 8, 1)
    assert np.abs(out[:, :, 0].astype(int) - 200).max() <= 1
    h, w, c, out = decode_jpeg(encode_jpeg(np.array([[123]], dtype=np.uint8), quality=100))
    assert (h, w, c) == (1, 1, 1)
    assert abs(int(out[0, 0, 0]) - 123) <= 1


def test_flat_color_image_is_near_exact_even_when_lossy():
    img = np.full((40, 40, 3), (10, 200, 77), dtype=np.uint8)
    _, _, _, out = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_byte_stuffing_survives():
    # many saturated blocks produce 0xFF bytes in the entropy stream with
    # high probability across these seeds; assert stuffing round-trips
    rng = np.random.default_rng(14)
    for seed in range(4):
        img = (rng.integers(0, 2, (16, 16), dtype=np.uint8)) * 255
        data = encode_jpeg(img, quality=100)
        _, _, _, out = decode_jpeg(data)
        assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 4


def test_dispatch_from_decode_image():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    h, w, c, _ = decode_image(encode_jpeg(img, quality=100))
    assert (h, w, c) == (8, 8, 1)


# -- malformed / unsupported payloads --------------------------------------


def _patch_sof(data: bytes, marker: int) -> bytes:
    i = data.find(b"\xff\xc0")
    assert i >= 0
    return data[:i] + bytes([0xFF, marker]) + data[i + 2 :]


def test_nonbaseline_sofs_raise_codec_error():
    data = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    # SOF2 is now SUPPORTED — but a baseline stream relabeled progressive
    # carries an invalid progressive scan header (Ss=0 with Se=63)
    with pytest.raises(CodecError, match="Se != 0"):
        decode_jpeg(_patch_sof(data, 0xC2))
    with pytest.raises(CodecError, match="non-baseline"):
        decode_jpeg(_patch_sof(data, 0xC3))
    with pytest.raises(CodecError, match="non-baseline"):
        decode_jpeg(_patch_sof(data, 0xCB))  # lossless arithmetic
    # SOF10 (progressive arithmetic) is now SUPPORTED — a Huffman
    # baseline stream relabeled SOF10 has an invalid progressive scan
    # header, the same contract as the SOF2 relabel above
    with pytest.raises(CodecError, match="Se != 0"):
        decode_jpeg(_patch_sof(data, 0xCA))


def test_progressive_decodes_bit_identical_to_baseline():
    """A progressive stream transmits the same quantized coefficients, so
    its decode must be BIT-identical to the baseline decode — across
    gray/color, subsampling, odd sizes, restarts, and qualities."""
    rng = np.random.default_rng(7)
    cases = [
        (rng.integers(0, 256, (37, 53), dtype=np.uint8), {}),
        (rng.integers(0, 256, (1, 1), dtype=np.uint8), {}),
        (rng.integers(0, 256, (41, 29, 3), dtype=np.uint8), {}),
        (rng.integers(0, 256, (33, 17, 3), dtype=np.uint8), {"subsample": True}),
        (rng.integers(0, 256, (33, 65, 3), dtype=np.uint8), {"restart_interval": 3}),
        (
            rng.integers(0, 256, (40, 56, 3), dtype=np.uint8),
            {"subsample": True, "restart_interval": 2},
        ),
        (np.tile(np.arange(64, dtype=np.uint8) * 4, (48, 1)), {}),
        (np.full((24, 16), 77, dtype=np.uint8), {}),  # all-EOB AC scans
    ]
    for img, kw in cases:
        for q in (25, 90, 100):
            base = decode_jpeg(encode_jpeg(img, quality=q, **kw))
            prog = decode_jpeg(encode_jpeg(img, quality=q, progressive=True, **kw))
            assert base[:3] == prog[:3]
            assert np.array_equal(base[3], prog[3]), (img.shape, kw, q)


def test_progressive_sparse_exercises_zrl_and_eob_refinement():
    """Sparse high-frequency content drives the ZRL-in-refinement and
    buffered-correction-bit paths (T.81 G.1.2.3)."""
    rng = np.random.default_rng(11)
    img = np.where(rng.random((64, 64)) > 0.985, 255, 0).astype(np.uint8)
    for q in (50, 100):
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg(img, quality=q, progressive=True))
        assert np.array_equal(base[3], prog[3])


def test_progressive_truncated_scan_raises():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = encode_jpeg(np.tile(img, (2, 2)), quality=90, progressive=True)
    # chop inside the last entropy segment (before EOI)
    with pytest.raises(CodecError):
        decode_jpeg(data[: len(data) - 8])


def test_progressive_mutation_fuzz_never_crashes():
    """Bit flips in a progressive stream must decode or raise CodecError
    — never crash with an arbitrary exception (same contract as the
    baseline fuzz test)."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=80, progressive=True))
    for _ in range(300):
        i = int(rng.integers(2, len(data)))
        mutated = bytearray(data)
        mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_jpeg(bytes(mutated))
        except CodecError:
            pass


def test_truncated_and_garbage_payloads_raise():
    data = encode_jpeg(np.full((16, 16), 90, dtype=np.uint8), quality=100)
    with pytest.raises(CodecError):
        decode_jpeg(b"\xff\xd8\xff\xe0")  # SOI + bare APP0 marker
    with pytest.raises(CodecError):
        decode_jpeg(data[: len(data) // 2])  # mid-entropy truncation
    with pytest.raises(CodecError):
        decode_jpeg(b"NOPE")


def test_zero_quantizer_and_missing_tables_raise():
    data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(data).find(b"\xff\xdb")
    data[i + 5] = 0  # first quant step -> 0
    with pytest.raises(CodecError, match="zero quantizer"):
        decode_jpeg(bytes(data))
    # drop the DHT segments entirely -> missing Huffman table
    raw = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    out = bytearray()
    pos = 2
    out += raw[:2]
    while pos + 4 <= len(raw):
        marker = raw[pos + 1]
        (ln,) = struct.unpack_from(">H", raw, pos + 2)
        if marker != 0xC4:
            out += raw[pos : pos + 2 + ln]
        if marker == 0xDA:
            out += raw[pos + 2 + ln :]
            break
        pos += 2 + ln
    with pytest.raises(CodecError, match="Huffman"):
        decode_jpeg(bytes(out))


def test_entropy_exhaustion_and_invalid_codes_raise():
    data = encode_jpeg(np.full((16, 16), 55, dtype=np.uint8), quality=100)
    eoi = data.rfind(b"\xff\xd9")
    with pytest.raises(CodecError):
        decode_jpeg(data[: eoi - (eoi - data.find(b"\xff\xda")) // 2] + b"\xff\xd9")


def test_dimension_cap():
    data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    struct.pack_into(">HH", data, i + 5, 60000, 60000)
    with pytest.raises(CodecError, match="limit"):
        decode_jpeg(bytes(data))


# -- table machinery -------------------------------------------------------


def test_canonical_tables_are_prefix_free_and_invertible():
    rng = np.random.default_rng(15)
    freqs = {int(s): int(f) for s, f in zip(rng.choice(256, 40, replace=False), rng.integers(1, 1000, 40))}
    counts, symbols, enc = _canonical_encode_table(freqs)
    assert sum(counts) == len(symbols) == len(freqs)
    dec = _build_decode_table(counts, symbols)
    for sym, (code, ln) in enc.items():
        assert dec[(ln, code)] == sym
    # prefix-freedom: no code is a prefix of another
    codes = sorted((ln, code) for code, ln in enc.values())
    as_bits = [format(code, f"0{ln}b") for ln, code in codes]
    for i, a in enumerate(as_bits):
        for b in as_bits[i + 1 :]:
            assert not b.startswith(a)


def test_zigzag_is_a_permutation_and_quant_table_is_annex_k():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert QUANT_LUMA[0] == 16 and QUANT_LUMA[1] == 11 and QUANT_LUMA[63] == 99


# -- Spark integration -----------------------------------------------------


def test_decode_image_stats_handles_jpeg_payloads(spark):
    from whisper_pandas_spark.operators.multimodal import decode_image_stats

    img = _gradient(24, 24)
    rows = [
        (1, bytearray(encode_jpeg(img, quality=100))),
        (2, bytearray(encode_jpeg(img[:, :, 0], quality=100, restart_interval=3))),
        (3, bytearray(_patch_sof(encode_jpeg(img, quality=90), 0xC2))),  # progressive
        (4, bytearray(b"\xff\xd8\xffgarbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in decode_image_stats(df, "doc_id").collect()
    }
    assert set(got) == {1, 2}  # progressive + garbage skipped
    assert (got[1]["height"], got[1]["width"], got[1]["channels"]) == (24, 24, 3)
    assert (got[2]["height"], got[2]["width"], got[2]["channels"]) == (24, 24, 1)
    # decoded pixels approximate the source (q=100 tight bound)
    assert abs(got[1]["mean_px"] - float(img.mean())) < 2.0


def test_mutation_fuzz_decoder_never_crashes():
    """Bit-flip / truncation mutations of a VALID stream — deeper fuzz
    than magic-prefix noise because the mutants pass marker parsing and
    reach the entropy decoder. Contract: decode or CodecError, nothing
    else, and always terminate."""
    rng = np.random.default_rng(99)
    img = _gradient(24, 24)
    base = bytearray(encode_jpeg(img, quality=85, subsample=True, restart_interval=2))
    for trial in range(300):
        mutant = bytearray(base)
        kind = trial % 3
        if kind == 0:  # flip 1-4 random bytes (skip SOI so dispatch holds)
            for _ in range(rng.integers(1, 5)):
                mutant[int(rng.integers(2, len(mutant)))] = int(rng.integers(0, 256))
        elif kind == 1:  # truncate
            mutant = mutant[: int(rng.integers(2, len(mutant)))]
        else:  # splice a random chunk
            at = int(rng.integers(2, len(mutant)))
            mutant[at : at + 8] = bytes(rng.integers(0, 256, 8, dtype=np.uint8))
        try:
            decode_jpeg(bytes(mutant))
        except CodecError:
            pass


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker."""
    img = _gradient(16, 16)
    data = encode_jpeg(img, quality=100)
    base = decode_jpeg(data)[3]
    i = data.find(b"\xff\xc0")  # pad before SOF0 and before SOS
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    j = padded.find(b"\xff\xda")
    padded = padded[:j] + b"\xff" + padded[j:]
    assert np.array_equal(decode_jpeg(padded)[3], base)


def test_truncated_sof_component_list_raises_codec_error():
    data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    struct.pack_into(">H", data, i + 2, 8)  # body shrinks to 6 bytes
    with pytest.raises(CodecError):
        decode_jpeg(bytes(data))


def test_progressive_subset_component_dc_scans(monkeypatch):
    """Legal-but-rare scan scripts: a DC scan covering a SUBSET of
    components (interleaved over two, the third non-interleaved) must
    decode bit-identical to baseline — pins the subset-MCU geometry
    branch the default script never exercises."""
    import whisper_pandas_spark.functions.jpeg as J

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    custom = [
        ("DC", [0, 1], 0, 0, 0, 1),
        ("DC", [2], 0, 0, 0, 1),
        ("AC", [0], 1, 63, 0, 1),
        ("AC", [1], 1, 63, 0, 1),
        ("AC", [2], 1, 63, 0, 1),
        ("AC", [0], 1, 63, 1, 0),
        ("AC", [1], 1, 63, 1, 0),
        ("AC", [2], 1, 63, 1, 0),
        ("DC", [0, 1], 0, 0, 1, 0),
        ("DC", [2], 0, 0, 1, 0),
    ]
    monkeypatch.setattr(J, "_prog_script", lambda nch: custom)
    prog = J.decode_jpeg(J.encode_jpeg(img, quality=90, progressive=True))
    monkeypatch.undo()
    base = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    assert base[:3] == prog[:3]
    assert np.array_equal(base[3], prog[3])
