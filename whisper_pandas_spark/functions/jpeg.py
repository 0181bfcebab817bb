"""Pure-stdlib baseline JPEG codec (ITU-T T.81 / JFIF).

Closes the last stubbed leaf in the multimodal decode family: a REAL
baseline-DCT JPEG decoder built from the public spec with nothing beyond
``struct`` + numpy — no PIL / libjpeg in this container.

Decoder (`decode_jpeg`) supports the baseline process — SOF0/SOF1 8-bit,
1- or 3-component (grayscale / JFIF YCbCr), arbitrary integer chroma
subsampling (4:4:4, 4:2:2, 4:2:0, 4:1:1 …), restart intervals, multiple
DQT/DHT segments, 8- or 16-bit quantization tables — AND the progressive
process (SOF2, T.81 Annex G): any spectral-selection / successive-
approximation scan script, interleaved or single-component DC scans,
EOB runs, AC refinement correction bits, restarts inside every scan
kind (~10% of real web-crawl JPEGs are progressive) — AND, since round
8, the ARITHMETIC-coded processes (SOF9 sequential / SOF10 progressive,
T.81 Annexes D+F+G): the QM-coder state machine (Table D.3, values
bit-verified against this container's libjpeg-turbo ``jpeg_aritab``
export), DAC conditioning, and the DC/AC statistical models, verified
COEFFICIENT-EXACT against libjpeg's own ``jpeg_read_coefficients`` on
libjpeg-encoded fixtures (tests/fixtures/jpeg_arith — quantized
coefficients are integers, so the gate is IDCT-independent).
Recognised but unsupported variants (hierarchical, lossless, 12-bit,
CMYK) raise
:class:`~whisper_pandas_spark.functions.codecs.CodecError` so the
tolerant Arrow operators skip the row — the same contract as the
PNG/BMP/PNM decoders.

Encoder (`encode_jpeg`) is the test/fixture twin (same role as
``encode_png``): baseline or progressive (``progressive=True`` emits the
standard scan script — spectral split + successive approximation — so
the decoder's Annex-G paths are exercised fixture-free), Annex-K
quantization tables with libjpeg-style quality scaling, per-image (per-
scan, when progressive) canonical Huffman tables, optional 2x2 chroma
subsampling and restart intervals. ``quality=100`` forces all-ones
quantization tables, making the round-trip error bound a tight
DCT-rounding bound (≤2 LSB) that tests assert directly; a progressive
stream transmits the same coefficients exactly, so its decode is
bit-identical to the baseline decode of the same pixels (asserted).

Entropy decode is a sequential bit walk (inherently so); the IDCT, color
transform and upsampling are vectorized numpy over all blocks at once.
The Spark-side batching (`operators/multimodal.py`) keeps payloads on
executors, so per-image Python cost parallelizes across cores.

No reference-repo parity: the reference (whisper_pandas.py) has no image
surface; this backs the training-data-pipeline multimodal operators.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

from whisper_pandas_spark.functions.codecs import CodecError

# zigzag scan: ZIGZAG[i] = raster index of the i-th coefficient in scan order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU T.81 Annex K.1 example quantization tables (the de-facto defaults)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99]
    + [18, 21, 26, 66, 99, 99, 99, 99]
    + [24, 26, 56, 99, 99, 99, 99, 99]
    + [47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix: T[k, n] = c(k) cos((2n+1) k pi / 16)
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )

_MAX_PIXELS = 1 << 26  # 64M samples — same spirit as the PNG geometry cap


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------


def _build_decode_table(counts: list[int], symbols: bytes) -> dict:
    """Canonical JPEG Huffman table -> {(length, code): symbol}."""
    if sum(counts) != len(symbols):
        raise CodecError("DHT symbol count mismatch")
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if code >= (1 << length):
                raise CodecError("DHT code overflow")
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code lengths for a canonical Huffman table over ``freqs``.

    Standard heap merge with a reserved dummy symbol (-1, freq 0-ish) so
    no real symbol gets the all-ones code (T.81 Annex K reserves it). If
    a pathological distribution exceeds 16 bits, fall back to fixed-length
    codes — always valid, merely less compact.
    """
    import heapq

    items = [(f, sym) for sym, f in freqs.items() if f > 0]
    items.append((0, -1))  # dummy claims the longest (all-ones) code
    if len(items) == 1:
        return {items[0][1]: 1}
    heap = [(f, sym, {sym: 0}) for f, sym in items]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, s1, d1 = heapq.heappop(heap)
        f2, s2, d2 = heapq.heappop(heap)
        merged = {s: ln + 1 for s, ln in d1.items()}
        merged.update({s: ln + 1 for s, ln in d2.items()})
        heapq.heappush(heap, (f1 + f2, min(s1, s2), merged))
    lengths = heap[0][2]
    lengths.pop(-1, None)
    if lengths and max(lengths.values()) > 16:
        n = len(lengths)
        fixed = 1
        while (1 << fixed) - 1 < n:
            fixed += 1
        return {sym: fixed for sym in lengths}
    return lengths


def _canonical_encode_table(freqs: dict[int, int]):
    """(counts[16], symbols bytes, {sym: (code, length)}) for ``freqs``."""
    lengths = _huff_lengths(freqs)
    ordered = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    counts = [0] * 16
    symbols = bytearray()
    enc = {}
    code = 0
    prev_len = 0
    for sym, ln in ordered:
        code <<= ln - prev_len
        prev_len = ln
        counts[ln - 1] += 1
        symbols.append(sym)
        enc[sym] = (code, ln)
        code += 1
    return counts, bytes(symbols), enc


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


_LUT_BITS = 10


@lru_cache(maxsize=64)
def _decode_luts(counts: tuple, symbols: bytes):
    """Table-driven Huffman decode structures for one DHT table.

    Returns ``(sym_list, len_list, long_codes)``: plain-list LUTs over a
    10-bit peek (one index replaces the per-bit tree walk for codes up
    to 10 bits — in practice almost every decoded symbol, since Huffman
    puts frequent symbols on short codes) plus a ``{(length, code):
    symbol}`` dict for the rare 11-16-bit codes. ``len == 0`` in the LUT
    means "longer than 10 bits or invalid" -> dict fallback. Cached
    because real streams reuse the same (often standard Annex-K) tables
    across files; the 1024-entry build stays ~50 us so unique-per-file
    tables cost nothing either.
    """
    sym_arr = np.zeros(1 << _LUT_BITS, dtype=np.uint8)
    len_arr = np.zeros(1 << _LUT_BITS, dtype=np.uint8)
    long_codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if length <= _LUT_BITS:
                lo = code << (_LUT_BITS - length)
                hi = (code + 1) << (_LUT_BITS - length)
                sym_arr[lo:hi] = symbols[k]
                len_arr[lo:hi] = length
            else:
                long_codes[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    # plain lists: ~30 ns indexing in the hot loop vs ~300 ns numpy scalar
    return sym_arr.tolist(), len_arr.tolist(), long_codes


class _BitReader:
    """Sequential MSB-first bit reader over an unstuffed entropy segment.

    The segment is unpacked once into 64-bit words; a small-int
    accumulator (kept < 2^80 by masking after every consume) serves
    16-bit peeks for the LUT decode. Zero-padding past the end keeps
    refills in bounds; ``n`` bounds actual consumption so padding is
    never *read* as data.
    """

    __slots__ = ("words", "wi", "acc", "navail", "consumed", "n")

    def __init__(self, segment: bytes):
        padded = segment + b"\x00" * (8 + (-len(segment)) % 8)
        self.words = struct.unpack(f">{len(padded) // 8}Q", padded)
        self.wi = 0
        self.acc = 0
        self.navail = 0
        self.consumed = 0
        self.n = len(segment) * 8

    def read_bits(self, count: int) -> int:
        if self.consumed + count > self.n:
            raise CodecError("entropy data exhausted")
        if self.navail < count:
            self.acc = (self.acc << 64) | self.words[self.wi]
            self.wi += 1
            self.navail += 64
        self.navail -= count
        v = self.acc >> self.navail
        self.acc &= (1 << self.navail) - 1
        self.consumed += count
        return v

    def decode_symbol(self, luts) -> int:
        sym_list, len_list, long_codes = luts
        if self.navail < 16:
            self.acc = (self.acc << 64) | self.words[self.wi]
            self.wi += 1
            self.navail += 64
        peek = (self.acc >> (self.navail - 16)) & 0xFFFF
        length = len_list[peek >> (16 - _LUT_BITS)]
        if length:
            sym = sym_list[peek >> (16 - _LUT_BITS)]
        else:  # longer than the LUT covers, or invalid
            for length in range(_LUT_BITS + 1, 17):
                sym = long_codes.get((length, peek >> (16 - length)))
                if sym is not None:
                    break
            else:
                raise CodecError("invalid Huffman code")
        if self.consumed + length > self.n:
            raise CodecError("entropy data exhausted")
        self.navail -= length
        self.acc &= (1 << self.navail) - 1
        self.consumed += length
        return sym


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` received bits to a signed value."""
    if size and v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _split_entropy(data: bytes, start: int):
    """Return (list of unstuffed entropy segments split at RSTn, end pos).

    Segments end at any marker that is not a stuffed 0x00 or RST0-7.
    """
    segments = []
    seg = bytearray()
    pos = start
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            seg.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        m = data[pos + 1]
        if m == 0x00:
            seg.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segments.append(bytes(seg))
            seg = bytearray()
            pos += 2
        else:  # real marker terminates the scan
            break
    segments.append(bytes(seg))
    return segments, pos


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _first_ac(reader, ac_luts, block, ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC first scan (T.81 G.1.2.2) for one block; returns
    the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_luts)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run < 15:  # EOBn: run length (1 << run) + extra - 1 more
                eobrun = (1 << run) - 1
                if run:
                    eobrun += reader.read_bits(run)
                break
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise CodecError("AC run past band end")
        block[k] = _extend(reader.read_bits(size), size) << al
        k += 1
    return eobrun


def _refine_ac(reader, ac_luts, block, ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC refinement scan (T.81 G.1.2.3) for one block;
    returns the updated EOB run. Appends the bit at ``al`` to already-
    nonzero coefficients (correction bits) and places newly-nonzero
    ±(1 << al) values."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_luts)
            run, size = rs >> 4, rs & 0x0F
            val = 0
            if size == 0:
                if run < 15:
                    # full count here — the shared tail below decrements
                    # for the current block
                    eobrun = 1 << run
                    if run:
                        eobrun += reader.read_bits(run)
                    break
                # run == 15: ZRL — skip 16 zero-history coefficients
            else:
                if size != 1:
                    raise CodecError("bad AC refinement magnitude")
                val = p1 if reader.read_bits(1) else m1
            # advance over `run` zero-history coefficients, emitting a
            # correction bit for every nonzero-history one passed
            while k <= se:
                cur = int(block[k])
                if cur:
                    if reader.read_bits(1) and not (cur & p1):
                        block[k] = cur + (p1 if cur > 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        # EOB run covers the rest of this band: correction bits only
        while k <= se:
            cur = int(block[k])
            if cur:
                if reader.read_bits(1) and not (cur & p1):
                    block[k] = cur + (p1 if cur > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


# --------------------------------------------------------------------------
# arithmetic-coded entropy decoding (T.81 Annexes D + F, SOF9/SOF10)
# --------------------------------------------------------------------------

# ITU-T T.81 Table D.3 — the QM-coder probability state machine:
# (Qe, Next_Index_MPS, Next_Index_LPS, Switch_MPS) for states 0..112,
# plus the fixed ~0.5 state 113 (NMPS = NLPS = 113, never leaves itself)
# used for AC sign / DC-refinement decisions. Values are from the
# published standard and are asserted bit-identical to the system
# libjpeg-turbo's exported jpeg_aritab in
# tests/test_jpeg_arith.py::test_qe_table_matches_libjpeg (the committed
# dump tests/fixtures/jpeg_arith/jpeg_aritab.txt keeps the gate alive on
# hosts without libjpeg).
_QE_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)


class _QMDecoder:
    """T.81 Annex D QM arithmetic decoder over ONE entropy segment
    (restart markers reset everything, so the caller makes a fresh
    decoder per segment). The segment is already FF00-unstuffed by
    _split_entropy; past the segment end zero bytes are fed (the
    convention libjpeg encodes/decodes with at markers — verified by
    the coefficient-exact fixture gate).

    Register scheme (D.2.4-D.2.6 with lazy renormalization): the MPS
    subinterval sits at the bottom [0, A-Qe), LPS on top; C accumulates
    raw input bytes and NEVER shifts — instead CT counts how many
    pending renormalization shifts separate A's alignment from C's, and
    the decision boundary is scaled by ``<< ct`` at compare time.
    Renormalization (and byte feeding) happens at the START of the next
    decision; probability estimation fires exactly when a decision
    requires renormalization, per the spec. Verified bit-exact against
    libjpeg-turbo on every committed fixture."""

    __slots__ = ("data", "bp", "n", "c", "a", "ct")

    def __init__(self, segment: bytes):
        self.data = segment
        self.n = len(segment)
        self.bp = 0
        self.c = 0
        self.a = 0
        self.ct = -16  # two initial bytes wanted before the first decision

    def decode(self, st: bytearray, i: int) -> int:
        """One binary decision against stats bin ``st[i]`` (bit 7 = MPS
        sense, bits 0-6 = Table D.3 state index)."""
        a, ct, c = self.a, self.ct, self.c
        while a < 0x8000:  # deferred RENORMD + BYTEIN
            ct -= 1
            if ct < 0:
                b = self.data[self.bp] if self.bp < self.n else 0
                self.bp += 1
                c = (c << 8) | b
                ct += 8
                if ct < 0:  # still inside the 2-byte initial fill
                    ct += 1
                    if ct == 0:
                        a = 0x8000  # -> 0x10000 after the shift below
            a <<= 1
        sv = st[i]
        qe, nmps, nlps, sw = _QE_TABLE[sv & 0x7F]
        mps = sv >> 7
        a -= qe
        boundary = a << ct
        if c < boundary:
            # MPS subinterval; estimate only if renorm will be needed
            if a & 0x8000:
                d = mps
            elif a < qe:  # conditional exchange
                d = mps ^ 1
                if sw:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            else:
                d = mps
                st[i] = (mps << 7) | nmps
        else:
            c -= boundary
            if a < qe:  # conditional exchange
                d = mps
                st[i] = (mps << 7) | nmps
            else:
                d = mps ^ 1
                if sw:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            a = qe
        self.a, self.ct, self.c = a, ct, c
        return d


def _arith_dc_diff(dec, st: bytearray, ctx: int, lo: int, hi: int):
    """Decode one DC difference (T.81 F.2.4.1, figures F.19-F.24).
    ctx is the conditioning-category base bin (0/4/8/12/16 from the
    previous diff); returns (diff, next_ctx). Bin layout per Table F.4:
    X1 at 20, magnitude bits at the X bin + 14."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    m = dec.decode(st, ctx + 2 + sign)
    si = ctx + 2 + sign
    if m:
        si = 20
        while dec.decode(st, si):
            m <<= 1
            if m == 0x8000:
                raise CodecError("arithmetic DC magnitude overflow")
            si += 1
    # conditioning category for the NEXT block (F.1.4.4.1.2): compare the
    # magnitude CATEGORY against the DAC (L, U) bounds
    if m < (1 << lo) >> 1:
        nctx = 0
    elif m > (1 << hi) >> 1:
        nctx = 12 + sign * 4
    else:
        nctx = 4 + sign * 4
    v = m
    si += 14
    while m >> 1:
        m >>= 1
        if dec.decode(st, si):
            v |= m
    v += 1
    return (-v if sign else v), nctx


def _arith_ac_band(dec, st, fixed, block, ss, se, al, kx):
    """Decode one block's AC band [ss, se] — sequential (al=0) or a
    progressive first scan (T.81 F.2.4.2 + G: EOB decision per index,
    run of insignificance, fixed-state sign, magnitude with low/high
    sections split at the DAC Kx)."""
    k = ss
    while k <= se:
        ctx = 3 * (k - 1)
        if dec.decode(st, ctx):
            break  # EOB
        while dec.decode(st, ctx + 1) == 0:
            k += 1
            if k > se:
                raise CodecError("arithmetic AC run past band end")
            ctx = 3 * (k - 1)
        sign = dec.decode(fixed, 0)
        m = dec.decode(st, ctx + 2)
        si = ctx + 2
        if m:
            if dec.decode(st, si):
                m <<= 1
                si = 189 if k <= kx else 217
                while dec.decode(st, si):
                    m <<= 1
                    if m == 0x8000:
                        raise CodecError("arithmetic AC magnitude overflow")
                    si += 1
        v = m
        si += 14
        while m >> 1:
            m >>= 1
            if dec.decode(st, si):
                v |= m
        v += 1
        block[k] = (-v if sign else v) << al
        k += 1


def _arith_ac_refine(dec, st, fixed, block, ss, se, al):
    """Progressive AC refinement scan for one block (T.81 G.2 arithmetic
    variant): correction bit per already-nonzero coefficient, newly
    significant coefficients signed via the fixed state; the EOB
    decision only exists above the block's last prior nonzero index."""
    p1 = 1 << al
    m1 = -(1 << al)
    kex = se
    while kex > 0 and block[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        ctx = 3 * (k - 1)
        if k > kex and dec.decode(st, ctx):
            break  # EOB
        while True:
            cur = int(block[k])
            if cur:
                if dec.decode(st, ctx + 2):
                    block[k] = cur + (m1 if cur < 0 else p1)
                break
            if dec.decode(st, ctx + 1):
                block[k] = m1 if dec.decode(fixed, 0) else p1
                break
            k += 1
            if k > se:
                raise CodecError("arithmetic AC refinement past band end")
            ctx = 3 * (k - 1)
        k += 1


def _arith_scan(
    segments,
    entries,
    planes,
    comps,
    scan,
    progressive,
    ss,
    se_b,
    ah,
    al,
    restart_interval,
    mcus_x,
    n_mcus,
    hmax,
    vmax,
    h,
    w,
    dac_dc,
    dac_ac,
):
    """Execute one arithmetic-coded scan (sequential SOF9 or any
    progressive SOF10 scan kind) into ``planes``. Restart segments reset
    EVERYTHING — the QM decoder, every statistics area, DC predictors
    and conditioning contexts (T.81 F.2.1.3 / jdarith process_restart;
    the coefficient-exact fixture gate covers restarts)."""
    if progressive:
        if ss == 0 and se_b != 0:
            raise CodecError("progressive DC scan with Se != 0")
        if ss > 0 and not (ss <= se_b <= 63):
            raise CodecError("bad spectral band")
        if ss > 0 and len(scan) != 1:
            raise CodecError("progressive AC scan must be single-component")
    else:
        if len(scan) != len(comps):
            raise CodecError("SOS/SOF component count mismatch")
        ss, se_b, ah, al = 0, 63, 0, 0
    refine = progressive and ah > 0

    def fresh_stats():
        dc_stats = {td: bytearray(64) for _, _, _, td, _ in entries}
        ac_stats = {ta: bytearray(256) for _, _, _, _, ta in entries}
        return dc_stats, ac_stats, bytearray([113])

    interleaved = ss == 0 and len(scan) > 1 or not progressive
    if interleaved:
        per_seg = restart_interval or n_mcus
        mcu = 0
        for segment in segments:
            if mcu >= n_mcus:
                break
            dec = _QMDecoder(segment)
            dc_stats, ac_stats, fixed = fresh_stats()
            last_dc = [0] * len(entries)
            dc_ctx = [0] * len(entries)
            seg_end = min(mcu + per_seg, n_mcus)
            for m in range(mcu, seg_end):
                my, mx = divmod(m, mcus_x)
                for si, (ci, hs, vs, td, ta) in enumerate(entries):
                    lo, hi = dac_dc.get(td, (0, 1))
                    kx = dac_ac.get(ta, 5)
                    for by in range(vs):
                        for bx in range(hs):
                            block = planes[ci][my * vs + by, mx * hs + bx]
                            if refine:  # progressive DC refinement
                                if dec.decode(fixed, 0):
                                    block[0] = int(block[0]) | (1 << al)
                                continue
                            diff, dc_ctx[si] = _arith_dc_diff(
                                dec, dc_stats[td], dc_ctx[si], lo, hi
                            )
                            last_dc[si] += diff
                            block[0] = last_dc[si] << al
                            if not progressive:
                                _arith_ac_band(
                                    dec, ac_stats[ta], fixed, block,
                                    1, 63, 0, kx,
                                )
            mcu = seg_end
        if mcu < n_mcus:
            raise CodecError("entropy data ended before last MCU")
        return

    # progressive single-component scan: DC (ss == 0) or an AC band
    ci, hs, vs, td, ta = entries[0]
    lo, hi = dac_dc.get(td, (0, 1))
    kx = dac_ac.get(ta, 5)
    bw = _ceil_div(_ceil_div(w * hs, hmax), 8)
    bh = _ceil_div(_ceil_div(h * vs, vmax), 8)
    nb = bw * bh
    per_seg = restart_interval or nb
    b = 0
    for segment in segments:
        if b >= nb:
            break
        dec = _QMDecoder(segment)
        dc_stats, ac_stats, fixed = fresh_stats()
        pred = 0
        ctx = 0
        seg_end = min(b + per_seg, nb)
        for bi in range(b, seg_end):
            by_, bx_ = divmod(bi, bw)
            block = planes[ci][by_, bx_]
            if ss == 0:
                if refine:
                    if dec.decode(fixed, 0):
                        block[0] = int(block[0]) | (1 << al)
                    continue
                diff, ctx = _arith_dc_diff(dec, dc_stats[td], ctx, lo, hi)
                pred += diff
                block[0] = pred << al
            elif not refine:
                _arith_ac_band(
                    dec, ac_stats[ta], fixed, block, ss, se_b, al, kx
                )
            else:
                _arith_ac_refine(
                    dec, ac_stats[ta], fixed, block, ss, se_b, al
                )
        b = seg_end
    if b < nb:
        raise CodecError("entropy data ended before last block")


def decode_jpeg_coefficients(data: bytes):
    """Entropy-decode only: the QUANTIZED coefficient planes, for
    bit-exact parity tests against libjpeg's jpeg_read_coefficients
    (integers — independent of IDCT/color differences). Returns
    ``[(ci, blocks_h, blocks_w, plane)]`` with ``plane`` shaped
    (mcu_rows, mcu_cols, 64) in ZIGZAG coefficient order; callers crop
    to (blocks_h, blocks_w) — the MCU padding blocks are decode
    artifacts libjpeg does not expose."""
    return decode_jpeg(data, _coefficients=True)


def decode_jpeg(
    data: bytes, _coefficients: bool = False
) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG.
    Returns ``(h, w, channels, array[h,w,c])``.

    channels is 1 (grayscale) or 3 (RGB via the JFIF BT.601 transform).
    Progressive streams may use any spectral-selection / successive-
    approximation scan script, interleaved or single-component scans,
    and restart intervals (EOB runs and DC predictors reset per
    restart segment, per G.1.2).
    """
    if data[:2] != b"\xff\xd8":
        raise CodecError("not a JPEG (missing SOI)")
    pos = 2
    n = len(data)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq), ...], progressive)
    restart_interval = 0
    saw_scan = False
    progressive = False
    arith = False
    # DAC conditioning (T.81 B.2.4.3): DC tables carry the (L, U)
    # difference-category bounds, AC tables the low/high split index Kx.
    dac_dc: dict[int, tuple[int, int]] = {}
    dac_ac: dict[int, int] = {}
    # geometry, filled at SOF
    comps: list = []
    idx_of: dict[int, int] = {}
    planes: list = []
    hmax = vmax = mcus_x = mcus_y = 0

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise CodecError(f"marker expected at offset {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + length]
        if length < 2 or len(body) != length - 2:
            raise CodecError("truncated marker segment")
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                if pq not in (0, 1):
                    raise CodecError(f"bad DQT precision {pq}")
                width = 2 if pq else 1
                if bp + 64 * width > len(body):
                    raise CodecError("truncated DQT")
                if pq:
                    vals = np.frombuffer(body, dtype=">u2", count=64, offset=bp)
                else:
                    vals = np.frombuffer(body, dtype=np.uint8, count=64, offset=bp)
                q = vals.astype(np.int64)
                if (q == 0).any():
                    raise CodecError("zero quantizer step")
                qtables[tq] = q
                bp += 64 * width
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp + 17 <= len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                counts = list(body[bp + 1 : bp + 17])
                total = sum(counts)
                syms = body[bp + 17 : bp + 17 + total]
                if len(syms) != total or tc not in (0, 1):
                    raise CodecError("truncated/invalid DHT")
                _build_decode_table(counts, syms)  # validates code space
                htables[(tc, th)] = (tuple(counts), syms)
                bp += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # baseline / ext sequential / progressive — Huffman (C0-C2)
            # or arithmetic (C9 sequential, CA progressive)
            if frame is not None:
                raise CodecError("multiple SOF segments")
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            if len(body) < 6:
                raise CodecError("truncated SOF")
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise CodecError(f"{precision}-bit JPEG unsupported (8 only)")
            if ncomp not in (1, 3):
                raise CodecError(f"{ncomp}-component JPEG unsupported (1/3 only)")
            if h == 0 or w == 0:
                raise CodecError("zero JPEG dimension")
            if h * w * ncomp > _MAX_PIXELS:
                raise CodecError("image dimensions exceed decoder limit")
            if len(body) < 6 + 3 * ncomp:
                raise CodecError("truncated SOF component list")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise CodecError(f"bad sampling factors {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps, progressive)
            idx_of = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
            if len(idx_of) != ncomp:
                raise CodecError("duplicate SOF component id")
            hmax = max(hs for _, hs, _, _ in comps)
            vmax = max(vs for _, _, vs, _ in comps)
            for _, hs, vs, _ in comps:
                if hmax % hs or vmax % vs:
                    raise CodecError("non-integer chroma subsampling ratio")
            mcus_x = _ceil_div(w, 8 * hmax)
            mcus_y = _ceil_div(h, 8 * vmax)
            planes = [
                np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int32)
                for _, hs, vs, _ in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise CodecError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning
            bp = 0
            while bp + 2 <= len(body):
                tc, tb = body[bp] >> 4, body[bp] & 0x0F
                val = body[bp + 1]
                if tc == 0:
                    lo, hi = val & 0x0F, val >> 4
                    if lo > hi or hi > 15:
                        raise CodecError("bad DAC DC conditioning")
                    dac_dc[tb] = (lo, hi)
                elif tc == 1:
                    if not 1 <= val <= 63:
                        raise CodecError("bad DAC AC conditioning")
                    dac_ac[tb] = val
                else:
                    raise CodecError("bad DAC table class")
                bp += 2
            if bp != len(body):
                raise CodecError("truncated DAC")
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                raise CodecError("bad DRI length")
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS
            ns = body[0] if body else 0
            if len(body) != 1 + 2 * ns + 3 or ns < 1:
                raise CodecError("truncated SOS")
            if frame is None:
                raise CodecError("SOS before SOF")
            scan = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            ss = body[1 + 2 * ns]
            se_b = body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F

            # resolve this scan's components + entropy tables: Huffman
            # LUTs, or for arithmetic frames the (td, ta) stats-table ids
            entries = []
            for cid, td, ta in scan:
                if cid not in idx_of:
                    raise CodecError(f"SOS references unknown component {cid}")
                ci = idx_of[cid]
                _, hs, vs, _tq = comps[ci]
                if arith:
                    entries.append((ci, hs, vs, td, ta))
                    continue
                # DC refinement scans read raw bits only — no Huffman
                # table needed (and encoders routinely omit the DHT)
                need_dc = (not progressive) or (ss == 0 and ah == 0)
                need_ac = (not progressive) or se_b > 0
                dc_l = ac_l = None
                if need_dc:
                    if (0, td) not in htables:
                        raise CodecError("missing Huffman table")
                    dc_l = _decode_luts(*htables[(0, td)])
                if need_ac:
                    if (1, ta) not in htables:
                        raise CodecError("missing Huffman table")
                    ac_l = _decode_luts(*htables[(1, ta)])
                entries.append((ci, hs, vs, dc_l, ac_l))

            segments, endpos = _split_entropy(data, pos + 2 + length)
            h, w = frame[0], frame[1]
            n_mcus = mcus_x * mcus_y

            if arith:
                _arith_scan(
                    segments,
                    entries,
                    planes,
                    comps,
                    scan,
                    progressive,
                    ss,
                    se_b,
                    ah,
                    al,
                    restart_interval,
                    mcus_x,
                    n_mcus,
                    hmax,
                    vmax,
                    h,
                    w,
                    dac_dc,
                    dac_ac,
                )
                saw_scan = True
                pos = endpos
                continue

            if not progressive:
                # sequential: one scan covering every component
                if len(scan) != len(comps):
                    raise CodecError("SOS/SOF component count mismatch")
                per_seg = restart_interval or n_mcus
                mcu = 0
                for segment in segments:
                    if mcu >= n_mcus:
                        break
                    reader = _BitReader(segment)
                    preds = [0] * len(entries)
                    seg_end = min(mcu + per_seg, n_mcus)
                    for m in range(mcu, seg_end):
                        my, mx = divmod(m, mcus_x)
                        for si, (ci, hs, vs, dc_tab, ac_tab) in enumerate(entries):
                            for by in range(vs):
                                for bx in range(hs):
                                    block = planes[ci][my * vs + by, mx * hs + bx]
                                    size = reader.decode_symbol(dc_tab)
                                    if size > 11:
                                        raise CodecError("bad DC category")
                                    diff = (
                                        _extend(reader.read_bits(size), size)
                                        if size
                                        else 0
                                    )
                                    preds[si] += diff
                                    block[0] = preds[si]
                                    k = 1
                                    while k < 64:
                                        rs = reader.decode_symbol(ac_tab)
                                        run, ssss = rs >> 4, rs & 0x0F
                                        if ssss == 0:
                                            if run == 15:  # ZRL
                                                k += 16
                                                continue
                                            break  # EOB
                                        k += run
                                        if k > 63:
                                            raise CodecError("AC run past block end")
                                        block[k] = _extend(
                                            reader.read_bits(ssss), ssss
                                        )
                                        k += 1
                    mcu = seg_end
                if mcu < n_mcus:
                    raise CodecError("entropy data ended before last MCU")
            elif ss == 0 and len(scan) > 1:
                # progressive DC scan, interleaved (MCU order)
                if se_b != 0:
                    raise CodecError("progressive DC scan with Se != 0")
                refine = ah > 0
                per_seg = restart_interval or n_mcus
                mcu = 0
                for segment in segments:
                    if mcu >= n_mcus:
                        break
                    reader = _BitReader(segment)
                    preds = [0] * len(entries)
                    seg_end = min(mcu + per_seg, n_mcus)
                    for m in range(mcu, seg_end):
                        my, mx = divmod(m, mcus_x)
                        for si, (ci, hs, vs, dc_tab, _a) in enumerate(entries):
                            for by in range(vs):
                                for bx in range(hs):
                                    block = planes[ci][my * vs + by, mx * hs + bx]
                                    if refine:
                                        if reader.read_bits(1):
                                            block[0] = int(block[0]) | (1 << al)
                                        continue
                                    size = reader.decode_symbol(dc_tab)
                                    if size > 11:
                                        raise CodecError("bad DC category")
                                    diff = (
                                        _extend(reader.read_bits(size), size)
                                        if size
                                        else 0
                                    )
                                    preds[si] += diff
                                    block[0] = preds[si] << al
                    mcu = seg_end
                if mcu < n_mcus:
                    raise CodecError("entropy data ended before last MCU")
            else:
                # progressive single-component scan (non-interleaved):
                # DC (Ss == 0) or an AC spectral band (Ss > 0)
                if len(scan) != 1:
                    raise CodecError("progressive AC scan must be single-component")
                if ss == 0:
                    if se_b != 0:
                        raise CodecError("progressive DC scan with Se != 0")
                elif not (ss <= se_b <= 63):
                    raise CodecError("bad spectral band")
                ci, hs, vs, dc_tab, ac_tab = entries[0]
                bw = _ceil_div(_ceil_div(w * hs, hmax), 8)
                bh = _ceil_div(_ceil_div(h * vs, vmax), 8)
                nb = bw * bh
                refine = ah > 0
                per_seg = restart_interval or nb
                b = 0
                for segment in segments:
                    if b >= nb:
                        break
                    reader = _BitReader(segment)
                    pred = 0
                    eobrun = 0
                    seg_end = min(b + per_seg, nb)
                    for bi in range(b, seg_end):
                        by_, bx_ = divmod(bi, bw)
                        block = planes[ci][by_, bx_]
                        if ss == 0:
                            if refine:
                                if reader.read_bits(1):
                                    block[0] = int(block[0]) | (1 << al)
                                continue
                            size = reader.decode_symbol(dc_tab)
                            if size > 11:
                                raise CodecError("bad DC category")
                            diff = (
                                _extend(reader.read_bits(size), size)
                                if size
                                else 0
                            )
                            pred += diff
                            block[0] = pred << al
                        elif not refine:
                            eobrun = _first_ac(
                                reader, ac_tab, block, ss, se_b, al, eobrun
                            )
                        else:
                            eobrun = _refine_ac(
                                reader, ac_tab, block, ss, se_b, al, eobrun
                            )
                    b = seg_end
                if b < nb:
                    raise CodecError("entropy data ended before last block")

            saw_scan = True
            pos = endpos
            continue
        pos += 2 + length

    if frame is None or not saw_scan:
        raise CodecError("missing SOF/SOS")
    h, w = frame[0], frame[1]

    if _coefficients:
        out = []
        for ci, ((cid, hs, vs, tq), plane) in enumerate(zip(comps, planes)):
            bw = _ceil_div(_ceil_div(w * hs, hmax), 8)
            bh = _ceil_div(_ceil_div(h * vs, vmax), 8)
            out.append((ci, bh, bw, plane))
        return out

    # dequantize + de-zigzag + IDCT, vectorized per component
    out_planes = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if tq not in qtables:
            raise CodecError(f"missing quantization table {tq}")
        q = qtables[tq]
        by, bx, _ = plane.shape
        coefs = plane.reshape(-1, 64).astype(np.float64) * q[np.newaxis, :]
        raster = np.zeros_like(coefs)
        raster[:, ZIGZAG] = coefs
        blocks = raster.reshape(-1, 8, 8)
        pixels = np.einsum("ki,nkl,lj->nij", _T, blocks, _T) + 128.0
        pixels = np.clip(np.round(pixels), 0, 255).astype(np.uint8)
        # blocks -> plane image
        img = pixels.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full MCU grid resolution, then crop to (h, w)
        ry, rx = vmax // vs, hmax // hs
        if ry > 1:
            img = np.repeat(img, ry, axis=0)
        if rx > 1:
            img = np.repeat(img, rx, axis=1)
        out_planes.append(img[:h, :w])

    if len(out_planes) == 1:
        return h, w, 1, out_planes[0][:, :, np.newaxis].copy()
    y = out_planes[0].astype(np.float64)
    cb = out_planes[1].astype(np.float64) - 128.0
    cr = out_planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return h, w, 3, rgb


# --------------------------------------------------------------------------
# encoder (test/fixture twin)
# --------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, count: int) -> None:
        self.acc = (self.acc << count) | (value & ((1 << count) - 1))
        self.nbits += count
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _block_symbols(zz: np.ndarray, pred: int):
    """(dc_sym, dc_bits, [(ac_sym, ac_bits), ...], new_pred) for one block."""
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    dc_bits = (diff if diff >= 0 else diff + (1 << size) - 1, size)
    acs = []
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        s = _category(v)
        acs.append(((run << 4) | s, (v if v >= 0 else v + (1 << s) - 1, s)))
        run = 0
    if last_nz < 63:
        acs.append((0x00, (0, 0)))  # EOB
    return size, dc_bits, acs, dc


def _prog_script(nch: int) -> list:
    """Scan script for the progressive encoder: (kind, comps, Ss, Se,
    Ah, Al) — DC first at Al=1, spectral-split AC first scans, successive
    approximation refinements down to Al=0, DC refinement last. The
    shape libjpeg's default scan script uses (public knowledge)."""
    if nch == 1:
        return [
            ("DC", [0], 0, 0, 0, 1),
            ("AC", [0], 1, 5, 0, 2),
            ("AC", [0], 6, 63, 0, 2),
            ("AC", [0], 1, 63, 2, 1),
            ("AC", [0], 1, 63, 1, 0),
            ("DC", [0], 0, 0, 1, 0),
        ]
    return [
        ("DC", [0, 1, 2], 0, 0, 0, 1),
        ("AC", [0], 1, 5, 0, 2),
        ("AC", [1], 1, 63, 0, 1),
        ("AC", [2], 1, 63, 0, 1),
        ("AC", [0], 6, 63, 0, 2),
        ("AC", [0], 1, 63, 2, 1),
        ("AC", [0], 1, 63, 1, 0),
        ("AC", [1], 1, 63, 1, 0),
        ("AC", [2], 1, 63, 1, 0),
        ("DC", [0, 1, 2], 0, 0, 1, 0),
    ]


def _dc_scan_events(
    comp_zz, samp, scan_comps, ah, al, restart_interval, mcus_x, mcus_y, bw_of
):
    """Event list for a progressive DC scan: ("SYM", 0, tid, sym) /
    ("BITS", v, n) / ("RST", i). Interleaved in MCU order when the scan
    has several components, non-interleaved block raster otherwise."""
    ev: list = []
    tsel = [0] + [1] * (len(samp) - 1)
    interleaved = len(scan_comps) > 1
    if interleaved:
        units = mcus_x * mcus_y
    else:
        bw, bh = bw_of(scan_comps[0])
        units = bw * bh
    per_seg = restart_interval or units
    preds = {ci: 0 for ci in scan_comps}
    rst = 0

    def unit_blocks(u):
        if interleaved:
            my, mx = divmod(u, mcus_x)
            for ci in scan_comps:
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        yield ci, comp_zz[ci][my * vs + by, mx * hs + bx]
        else:
            ci = scan_comps[0]
            bw, _bh = bw_of(ci)
            by, bx = divmod(u, bw)
            yield ci, comp_zz[ci][by, bx]

    for u in range(units):
        if u and u % per_seg == 0:
            ev.append(("RST", rst & 7))
            rst += 1
            preds = {ci: 0 for ci in scan_comps}
        for ci, zz in unit_blocks(u):
            t = int(zz[0]) >> al  # arithmetic shift, same as the decoder's <<
            if ah:
                ev.append(("BITS", t & 1, 1))
                continue
            diff = t - preds[ci]
            preds[ci] = t
            s = _category(diff)
            ev.append(("SYM", 0, tsel[ci], s))
            if s:
                ev.append(("BITS", diff if diff >= 0 else diff + (1 << s) - 1, s))
    return ev


def _ac_scan_events(comp_zz, ci, ss, se, ah, al, restart_interval, bw_of):
    """Event list for a progressive AC scan of one component — first
    scan (Ah == 0) with EOB runs, or refinement (Ah > 0) with the
    buffered-correction-bit discipline of T.81 G.1.2.3 (ZRLs emitted
    only before the last newly-nonzero coefficient, so the decoder's
    positional bit reads line up)."""
    ev: list = []
    bw, bh = bw_of(ci)
    nb = bw * bh
    per_seg = restart_interval or nb
    eobrun = 0
    be: list = []  # correction bits pending behind the EOB run
    rst = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            ev.append(("SYM", 1, 0, r << 4))
            if r:
                ev.append(("BITS", eobrun - (1 << r), r))
            for b in be:
                ev.append(("BITS", b, 1))
            be.clear()
            eobrun = 0

    for bi in range(nb):
        if bi and bi % per_seg == 0:
            flush_eob()
            ev.append(("RST", rst & 7))
            rst += 1
        by, bx = divmod(bi, bw)
        zz = comp_zz[ci][by, bx]
        if ah == 0:
            tv = []
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                tv.append(t if v >= 0 else -t)
            nz = [i for i, t in enumerate(tv) if t]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            r = 0
            for i in range(nz[-1] + 1):
                t = tv[i]
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    ev.append(("SYM", 1, 0, 0xF0))
                    r -= 16
                s = _category(t)
                ev.append(("SYM", 1, 0, (r << 4) | s))
                ev.append(("BITS", t if t >= 0 else t + (1 << s) - 1, s))
                r = 0
            if nz[-1] < se - ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        else:
            vals = [int(zz[k]) for k in range(ss, se + 1)]
            tabs = [abs(v) >> al for v in vals]
            newly = [i for i, t in enumerate(tabs) if t == 1]
            eob_pos = newly[-1] if newly else -1
            r = 0
            br: list = []
            for i, t in enumerate(tabs):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob_pos:
                    flush_eob()
                    ev.append(("SYM", 1, 0, 0xF0))
                    for b in br:
                        ev.append(("BITS", b, 1))
                    br.clear()
                    r -= 16
                if t > 1:
                    br.append(t & 1)
                    continue
                flush_eob()
                ev.append(("SYM", 1, 0, (r << 4) | 1))
                ev.append(("BITS", 1 if vals[i] > 0 else 0, 1))
                for b in br:
                    ev.append(("BITS", b, 1))
                br.clear()
                r = 0
            if r or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF or len(be) > 900:
                    flush_eob()
    flush_eob()
    return ev


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Minimal baseline/progressive JPEG encoder for tests/fixtures.

    ``img`` is uint8 (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB.
    ``subsample=True`` emits 4:2:0 chroma (2x2 mean); ``quality=100``
    uses all-ones quantization tables (round-trip error is then pure
    DCT rounding, ≤2 LSB). ``restart_interval`` > 0 emits DRI + RSTn.
    ``progressive=True`` emits SOF2 with the standard spectral-selection
    + successive-approximation scan script (_prog_script) — the
    transmitted coefficients are identical to the baseline stream, so
    decoded pixels are bit-identical to the sequential encoding.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    if h == 0 or w == 0 or nch not in (1, 3):
        raise ValueError(f"unsupported image shape {img.shape}")
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if nch == 1:
        planes = [img[:, :, 0].astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        if subsample:
            he, we = (h + 1) & ~1, (w + 1) & ~1
            cbp = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
            crp = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
            cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qsel = [0, 1, 1]

    hmax = max(hs for hs, _ in samp)
    vmax = max(vs for _, vs in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad each plane to its MCU-grid size and quantize all blocks
    comp_zz = []  # per component: array (blocks_y, blocks_x, 64) of zigzag coefs
    for (hs, vs), plane, qs in zip(samp, planes, qsel):
        ph, pw = mcus_y * vs * 8, mcus_x * hs * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        blocks = (
            padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        ).reshape(-1, 8, 8)
        coefs = np.einsum("ik,nkl,jl->nij", _T, blocks, _T).reshape(-1, 64)
        q = (qy if qs == 0 else qc).astype(np.float64)
        # both sides indexed to scan order: coef at scan pos i / step q[ZIGZAG[i]]
        zz = np.round(coefs[:, ZIGZAG] / q[np.newaxis, ZIGZAG]).astype(np.int64)
        comp_zz.append(zz.reshape(ph // 8, pw // 8, 64))

    def seg_(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    if progressive:
        hmax_, vmax_ = max(hs for hs, _ in samp), max(vs for _, vs in samp)

        def bw_of(ci):
            hs, vs = samp[ci]
            return (
                -(-(-(-w * hs // hmax_)) // 8),
                -(-(-(-h * vs // vmax_)) // 8),
            )

        out = bytearray(b"\xff\xd8")
        out += seg_(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        out += seg_(0xDB, bytes([0x00]) + bytes(qy[ZIGZAG].astype(np.uint8)))
        if nch == 3:
            out += seg_(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
        sof = struct.pack(">BHHB", 8, h, w, nch)
        for i, (hs, vs) in enumerate(samp):
            sof += bytes([i + 1, (hs << 4) | vs, qsel[i]])
        out += seg_(0xC2, sof)
        if restart_interval:
            out += seg_(0xDD, struct.pack(">H", restart_interval))

        tsel_dc = [0] + [1] * (nch - 1)
        for kind, scomps, ss, se_, ah, al in _prog_script(nch):
            if kind == "DC":
                events = _dc_scan_events(
                    comp_zz, samp, scomps, ah, al, restart_interval,
                    mcus_x, mcus_y, bw_of,
                )
            else:
                events = _ac_scan_events(
                    comp_zz, scomps[0], ss, se_, ah, al, restart_interval,
                    bw_of,
                )
            # per-scan canonical Huffman tables from this scan's symbols
            freqs: dict[tuple[int, int], dict[int, int]] = {}
            for ev in events:
                if ev[0] == "SYM":
                    _, cls, tid, sym = ev
                    f = freqs.setdefault((cls, tid), {})
                    f[sym] = f.get(sym, 0) + 1
            tables = {
                key: _canonical_encode_table(f or {0: 1})
                for key, f in freqs.items()
            }
            for (cls, tid), (c, s, _enc) in sorted(tables.items()):
                out += seg_(0xC4, bytes([(cls << 4) | tid]) + bytes(c) + s)
            sos = bytes([len(scomps)])
            for ci in scomps:
                td = tsel_dc[ci] if kind == "DC" else 0
                sos += bytes([ci + 1, (td << 4) | 0])
            sos += bytes([ss, se_, (ah << 4) | al])
            out += seg_(0xDA, sos)
            writer = _BitWriter()
            for ev in events:
                if ev[0] == "SYM":
                    _, cls, tid, sym = ev
                    code, ln = tables[(cls, tid)][2][sym]
                    writer.write(code, ln)
                elif ev[0] == "BITS":
                    _, v, nbits = ev
                    if nbits:
                        writer.write(v, nbits)
                else:  # RST
                    writer.flush()
                    writer.out += bytes([0xFF, 0xD0 + ev[1]])
            writer.flush()
            out += writer.out
        out += b"\xff\xd9"
        return bytes(out)

    # gather symbol streams twice: once for frequencies, once to write
    def walk(emit_dc, emit_ac):
        per_seg = restart_interval or (mcus_x * mcus_y)
        preds = [0] * len(samp)
        for m in range(mcus_x * mcus_y):
            if m and m % per_seg == 0:
                preds = [0] * len(samp)
                yield ("RST", (m // per_seg - 1) % 8)
            my, mx = divmod(m, mcus_x)
            for ci, (hs, vs) in enumerate(samp):
                for by in range(vs):
                    for bx in range(hs):
                        zz = comp_zz[ci][my * vs + by, mx * hs + bx]
                        size, dc_bits, acs, dc = _block_symbols(zz, preds[ci])
                        preds[ci] = dc
                        emit_dc(ci, size)
                        yield ("BITS", dc_bits)
                        for sym, extra in acs:
                            emit_ac(ci, sym)
                            yield ("BITS", extra)

    dc_freq = [dict() for _ in range(2)]
    ac_freq = [dict() for _ in range(2)]
    tsel = [0] + [1] * (len(samp) - 1)

    def count_dc(ci, sym):
        f = dc_freq[tsel[ci]]
        f[sym] = f.get(sym, 0) + 1

    def count_ac(ci, sym):
        f = ac_freq[tsel[ci]]
        f[sym] = f.get(sym, 0) + 1

    for _ in walk(count_dc, count_ac):
        pass

    ntab = 1 if nch == 1 else 2
    dc_tabs = [_canonical_encode_table(dc_freq[i] or {0: 1}) for i in range(ntab)]
    ac_tabs = [_canonical_encode_table(ac_freq[i] or {0: 1}) for i in range(ntab)]

    writer = _BitWriter()
    events = []

    def emit_dc(ci, sym):
        events.append(("DC", tsel[ci], sym))

    def emit_ac(ci, sym):
        events.append(("AC", tsel[ci], sym))

    for ev in walk(emit_dc, emit_ac):
        while events:
            kind, ti, sym = events.pop(0)
            table = dc_tabs[ti][2] if kind == "DC" else ac_tabs[ti][2]
            code, ln = table[sym]
            writer.write(code, ln)
        if ev[0] == "RST":
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + ev[1]])
        else:
            v, s = ev[1]
            if s:
                writer.write(v, s)
    while events:
        kind, ti, sym = events.pop(0)
        table = dc_tabs[ti][2] if kind == "DC" else ac_tabs[ti][2]
        code, ln = table[sym]
        writer.write(code, ln)
    writer.flush()

    # ---- assemble the file ----
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qy[ZIGZAG].astype(np.uint8)))
    if nch == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nch)
    for i, (hs, vs) in enumerate(samp):
        sof += bytes([i + 1, (hs << 4) | vs, qsel[i]])
    out += seg(0xC0, sof)
    for ti in range(ntab):
        c, s, _ = dc_tabs[ti]
        out += seg(0xC4, bytes([0x00 | ti]) + bytes(c) + s)
        c, s, _ = ac_tabs[ti]
        out += seg(0xC4, bytes([0x10 | ti]) + bytes(c) + s)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nch])
    for i in range(nch):
        sos += bytes([i + 1, (tsel[i] << 4) | tsel[i]])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
