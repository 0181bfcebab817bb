"""Pure-stdlib image/audio codecs for the multimodal operators.

The container ships no codec libraries (no PIL / opencv / soundfile), but
several common container formats need nothing beyond ``zlib`` + ``struct``
+ numpy, all of which ARE here. This module implements REAL decoders for:

- **PNG** (8-bit gray / gray+alpha / RGB / RGBA / palette, non-interlaced)
  — zlib inflate + the five scanline filters (None/Sub/Up/Average/Paeth)
  per the public PNG spec (RFC 2083 / ISO 15948);
- **BMP** (uncompressed BI_RGB 24-bit and 8-bit palette, BITMAPINFOHEADER);
- **PGM/PPM** (binary ``P5``/``P6`` netpbm);
- **WAV** (RIFF PCM, 8-bit unsigned / 16-bit signed little-endian).

plus minimal ENCODERS for PNG (filter 0) and WAV so tests can round-trip
random arrays without any external fixture. **JPEG** (baseline DCT:
huffman entropy decode, dequant, vectorized IDCT, chroma upsampling,
restart intervals) lives in the sibling :mod:`.jpeg` module and is
dispatched from :func:`decode_image` — no stubbed leaf remains;
recognised-but-unsupported JPEG variants (progressive, arithmetic,
12-bit) raise :class:`CodecError` like every other decoder here.

Everything is deterministic and byte-exact, so the Spark operators built
on top (`operators/multimodal.py`) can be golden-tested. Decoders return
``(height, width, channels, np.ndarray[h, w, c] uint8)`` for images and
``(sample_rate, channels, np.ndarray[n, c] int16)`` for audio.

No reference-repo parity: the reference (whisper_pandas.py) has no
multimodal surface; this backs the training-data-pipeline extension ops.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # PNG color type -> samples/px


class CodecError(ValueError):
    """Malformed or unsupported payload (tolerant callers skip the row)."""


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a non-interlaced 8-bit PNG. Returns (h, w, c, array[h,w,c])."""
    if data[:8] != _PNG_MAGIC:
        raise CodecError("not a PNG")
    pos, h = 8, 0
    w = bit_depth = color_type = interlace = -1
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise CodecError("truncated chunk")
        if ctype == b"IHDR":
            if len(body) != 13:
                raise CodecError(f"IHDR must be 13 bytes, got {len(body)}")
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            if not body or len(body) % 3:
                raise CodecError(f"PLTE length {len(body)} not a multiple of 3")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + body + crc
    if w < 0 or not idat:
        raise CodecError("missing IHDR/IDAT")
    if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise CodecError(
            f"unsupported PNG (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); only 8-bit non-interlaced supported"
        )
    nch = _CHANNELS[color_type]
    stride = w * nch
    expected = h * (stride + 1)
    if expected > 1 << 31:
        raise CodecError("image dimensions exceed decoder limit")
    try:
        # bounded inflate: a malicious tiny IDAT cannot expand past the
        # declared geometry (+1 byte to detect overrun as a mismatch)
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:  # pragma: no cover - corrupt stream
        raise CodecError(f"bad IDAT stream: {exc}") from exc
    if len(raw) != expected or d.unconsumed_tail:
        raise CodecError("IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:
            # Sub: out[i] = in[i] + out[i-nch] mod 256 — a per-channel
            # prefix sum; uint8 add.accumulate wraps mod 256 natively,
            # so the whole scanline vectorizes (no per-pixel Python)
            acc = np.add.accumulate(
                line.astype(np.uint8).reshape(w, nch), axis=0, dtype=np.uint8
            )
            cur = acc.reshape(-1).astype(np.int32)
        elif ftype == 3:  # Average — left-dependence stays sequential
            cur = line.copy()
            for i in range(stride):
                left = cur[i - nch] if i >= nch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth — left-dependence stays sequential
            cur = line.copy()
            for i in range(stride):
                left = cur[i - nch] if i >= nch else 0
                ul = prev[i - nch] if i >= nch else 0
                cur[i] = (cur[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise CodecError(f"bad filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, nch)
    if color_type == 3:
        if palette is None:
            raise CodecError("palette image without PLTE")
        idx = img[:, :, 0]
        if idx.size and int(idx.max()) >= len(palette):
            raise CodecError("palette index out of range")
        img = palette[idx]
        nch = 3
    return h, w, nch, img


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0 every scanline) for tests/fixtures.

    ``img`` is uint8 with shape (h, w) or (h, w, c) for c in {1, 2, 3, 4}.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * c
    flat = img.reshape(h, stride)
    raw = b"".join(b"\x00" + flat[r].tobytes() for r in range(h))
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------


def decode_bmp(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode an uncompressed BMP (BI_RGB 24-bit, or 8-bit palette)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise CodecError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise CodecError("pre-BITMAPINFOHEADER BMP unsupported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    _planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise CodecError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (8, 24):
        raise CodecError(f"{bpp}-bpp BMP unsupported (8/24 only)")
    flip = h_signed > 0  # positive height = bottom-up rows
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise CodecError(f"bad BMP dimensions {w}x{h_signed}")
    row_bytes = (w * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
    need = pix_off + row_bytes * h
    if len(data) < need:
        raise CodecError("truncated pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pix_off)
    rows = rows.reshape(h, row_bytes)
    if flip:
        rows = rows[::-1]
    if bpp == 24:
        img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()  # BGR->RGB
        return h, w, 3, img
    # 8-bit palette: table of BGRA quads directly after the info header
    ncolors_field = struct.unpack_from("<I", data, 46)[0]
    ncolors = ncolors_field or 256
    pal_off = 14 + hdr_size
    if ncolors > 256 or pal_off + ncolors * 4 > len(data):
        raise CodecError("palette table out of bounds")
    pal = np.frombuffer(
        data, dtype=np.uint8, count=ncolors * 4, offset=pal_off
    ).reshape(ncolors, 4)[:, :3][:, ::-1]  # BGRA -> RGB
    idx = rows[:, :w]
    if int(idx.max(initial=0)) >= ncolors:
        raise CodecError("palette index out of range")
    img = pal[idx].copy()
    return h, w, 3, img


# --------------------------------------------------------------------------
# PGM / PPM (binary netpbm)
# --------------------------------------------------------------------------


def decode_pnm(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode binary P5 (gray) / P6 (RGB) netpbm, maxval <= 255."""
    if data[:2] not in (b"P5", b"P6"):
        raise CodecError("not a binary PGM/PPM")
    nch = 1 if data[:2] == b"P5" else 3
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comment lines start with '#'); pixel data follows ONE whitespace byte
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(data):
            raise CodecError("truncated PNM header")
        ch = data[pos : pos + 1]
        if ch == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tok = data[start:pos]
            if not tok.isdigit():
                raise CodecError(f"non-numeric PNM header token {tok!r}")
            fields.append(int(tok))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise CodecError("16-bit PNM unsupported")
    need = w * h * nch
    if len(data) - pos < need:
        raise CodecError("truncated PNM pixel data")
    img = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos).reshape(
        h, w, nch
    )
    return h, w, nch, img.copy()


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------


def decode_image(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode PNG / BMP / PGM / PPM / baseline JPEG by magic bytes.

    Raises :class:`CodecError` on malformed input and on
    recognised-but-unsupported codec variants (progressive JPEG,
    interlaced PNG, compressed BMP, ...), so tolerant callers can skip.
    """
    data = bytes(data)
    if data[:8] == _PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P5", b"P6"):
        return decode_pnm(data)
    if data[:2] == b"\xff\xd8":
        from whisper_pandas_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    raise CodecError("unrecognised image magic")


# --------------------------------------------------------------------------
# WAV (RIFF PCM)
# --------------------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode RIFF PCM WAV (8-bit unsigned or 16-bit signed LE).

    Returns (sample_rate, channels, samples[n, channels] int16); 8-bit
    input is rescaled to int16 ((x - 128) << 8) so callers see one dtype.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks pad to even
    if fmt is None or pcm is None:
        raise CodecError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1:
        raise CodecError(f"non-PCM WAV (format {audio_fmt}) unsupported")
    if channels < 1:
        raise CodecError("zero-channel WAV")
    if bits == 16:
        n = len(pcm) // (2 * channels)
        arr = np.frombuffer(pcm, dtype="<i2", count=n * channels)
    elif bits == 8:
        n = len(pcm) // channels
        raw = np.frombuffer(pcm, dtype=np.uint8, count=n * channels)
        arr = ((raw.astype(np.int16) - 128) << 8).astype(np.int16)
    else:
        raise CodecError(f"{bits}-bit WAV unsupported (8/16 only)")
    return rate, channels, arr.reshape(n, channels).copy()


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal 16-bit PCM WAV encoder for tests. ``samples`` is int16 with
    shape (n,) or (n, channels)."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    pcm = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
