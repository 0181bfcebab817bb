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
kind (~10% of real web-crawl JPEGs are progressive). Recognised but
unsupported variants (arithmetic coding, hierarchical, 12-bit, CMYK)
raise :class:`~whisper_pandas_spark.functions.codecs.CodecError` so the
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


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
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
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            if frame is not None:
                raise CodecError("multiple SOF segments")
            progressive = marker == 0xC2
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
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = {0xCA: "progressive (arithmetic)"}.get(marker, "non-baseline")
            raise CodecError(f"{kind} JPEG (SOF{marker - 0xC0}) unsupported")
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

            # resolve this scan's components + Huffman tables
            entries = []
            for cid, td, ta in scan:
                if cid not in idx_of:
                    raise CodecError(f"SOS references unknown component {cid}")
                ci = idx_of[cid]
                _, hs, vs, _tq = comps[ci]
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
