"""Arithmetic-coded JPEG (SOF9/SOF10) decoder verification.

The round-7 blocker — "a from-memory QM table can't be falsified in this
container" — is resolved by using the system libjpeg-turbo as the
authoritative oracle (public IJG/turbo code, shipped as
libjpeg62-turbo-dev):

- the Table D.3 state machine in ``functions/jpeg.py`` is asserted
  bit-identical to libjpeg's exported ``jpeg_aritab`` (committed dump +
  a live re-dump whenever gcc/libjpeg are present);
- committed fixtures (tests/fixtures/jpeg_arith) were ENCODED by
  libjpeg with ``arith_code=TRUE`` across gray/RGB, sequential and
  progressive, subsampling, odd sizes and restart intervals, and the
  engine's entropy decode must reproduce libjpeg's own
  ``jpeg_read_coefficients`` output EXACTLY — quantized coefficients
  are integers, so the gate is independent of IDCT/color differences
  and a single wrong Qe entry or mis-indexed stats bin desynchronizes
  everything downstream;
- when the toolchain is available, an EXTENDED randomized battery
  regenerates fresh fixtures on the fly (tools/jpeg_arith_oracle.c).
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg_arith")
ORACLE_SRC = os.path.join(
    os.path.dirname(__file__), "..", "tools", "jpeg_arith_oracle.c"
)


def _unpack_aritab(vals):
    return [
        (v >> 16, (v >> 8) & 0x7F, v & 0x7F, (v >> 7) & 1) for v in vals
    ]


def _load_oracle_coefs(path):
    comps = {}
    cur = None
    for line in open(path):
        p = line.split()
        if p[0] == "comp":
            cur = int(p[1])
            comps[cur] = {"h": int(p[2]), "w": int(p[3]), "blocks": []}
        else:
            comps[cur]["blocks"].append([int(x) for x in p])
    return comps


def _assert_coefficient_parity(jpg_bytes, oracle):
    from whisper_pandas_spark.functions.jpeg import (
        ZIGZAG,
        decode_jpeg_coefficients,
    )

    mine = decode_jpeg_coefficients(jpg_bytes)
    assert len(mine) == len(oracle)
    for ci, bh, bw, plane in mine:
        o = oracle[ci]
        assert (o["h"], o["w"]) == (bh, bw)
        for bi, raster in enumerate(o["blocks"]):
            by, bx = divmod(bi, bw)
            mr = np.zeros(64, dtype=np.int64)
            mr[ZIGZAG] = plane[by, bx]
            assert (mr == np.array(raster)).all(), (ci, bi)


def test_qe_table_matches_libjpeg_dump():
    """Every (Qe, NMPS, NLPS, SWITCH) row equals the authoritative
    libjpeg-turbo jpeg_aritab (committed dump; 113 states + the fixed
    ~0.5 state 113 used for signs/DC refinement)."""
    from whisper_pandas_spark.functions.jpeg import _QE_TABLE

    vals = [int(x) for x in open(os.path.join(FIXDIR, "jpeg_aritab.txt"))]
    assert len(vals) == 114
    assert list(_QE_TABLE) == _unpack_aritab(vals)
    # structural spot checks straight from T.81 Table D.3
    assert _QE_TABLE[0] == (0x5A1D, 1, 1, 1)
    assert _QE_TABLE[113] == (0x5A1D, 113, 113, 0)  # the fixed bin


def test_arith_fixtures_coefficient_exact():
    """Every committed libjpeg-encoded fixture — sequential SOF9 and
    progressive SOF10, gray + subsampled RGB, odd sizes, restart
    intervals — entropy-decodes to the EXACT quantized coefficients
    libjpeg itself reports."""
    jpgs = sorted(glob.glob(os.path.join(FIXDIR, "*.jpg")))
    assert len(jpgs) >= 7
    saw_seq = saw_prog = False
    for jp in jpgs:
        data = open(jp, "rb").read()
        sofs = [
            data[i + 1]
            for i in range(len(data) - 1)
            if data[i] == 0xFF and data[i + 1] in (0xC9, 0xCA)
        ]
        assert sofs, jp  # all fixtures are arithmetic-coded
        saw_seq |= 0xC9 in sofs
        saw_prog |= 0xCA in sofs
        _assert_coefficient_parity(data, _load_oracle_coefs(jp[:-4] + ".coefs.txt"))
    assert saw_seq and saw_prog


def test_arith_pixel_decode_and_dispatch():
    """Full pixel decode runs (dims/channels right, plausible output)
    and decode_image dispatches arithmetic JPEGs by magic like any
    other; progressive and sequential encodings of the SAME image give
    identical pixels (they transmit the same coefficients)."""
    from whisper_pandas_spark.functions.codecs import decode_image
    from whisper_pandas_spark.functions.jpeg import decode_jpeg

    seq = open(os.path.join(FIXDIR, "rgb24x40_q75_seq.jpg"), "rb").read()
    prog = open(os.path.join(FIXDIR, "rgb24x40_q75_prog.jpg"), "rb").read()
    h, w, c, img = decode_image(seq)
    assert (h, w, c) == (24, 40, 3) and img.shape == (24, 40, 3)
    h2, w2, c2, img2 = decode_jpeg(prog)
    assert np.array_equal(img, img2)
    g = decode_image(open(os.path.join(FIXDIR, "gray16_q90_seq.jpg"), "rb").read())
    assert g[:3] == (16, 16, 1)


def test_arith_mutation_fuzz_fails_closed():
    """Random mutations/truncations of arithmetic JPEGs must decode or
    raise CodecError — never hang or throw an unhandled error (the
    tolerant-skip contract). The QM decoder zero-feeds past the segment
    end, so truncation degrades instead of crashing."""
    import random

    from whisper_pandas_spark.functions.codecs import CodecError
    from whisper_pandas_spark.functions.jpeg import decode_jpeg

    rnd = random.Random(88)
    bases = [
        open(p, "rb").read()
        for p in sorted(glob.glob(os.path.join(FIXDIR, "*.jpg")))
    ]
    for trial in range(200):
        data = bytearray(rnd.choice(bases))
        for _ in range(rnd.randint(1, 4)):
            data[rnd.randrange(len(data))] = rnd.randrange(256)
        if rnd.random() < 0.3:
            data = data[: rnd.randrange(2, len(data))]
        try:
            decode_jpeg(bytes(data))
        except CodecError:
            pass


@pytest.fixture(scope="module")
def oracle_bin(tmp_path_factory):
    """Build the libjpeg oracle harness; skip the extended battery when
    the toolchain isn't available (the committed fixtures above still
    gate every run)."""
    if shutil.which("gcc") is None:
        pytest.skip("no gcc for the live libjpeg oracle")
    exe = str(tmp_path_factory.mktemp("arith") / "oracle")
    r = subprocess.run(
        ["gcc", "-O2", "-o", exe, ORACLE_SRC, "-ljpeg"],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"libjpeg dev toolchain unavailable: {r.stderr[:200]}")
    return exe


def test_qe_table_matches_live_libjpeg(oracle_bin):
    from whisper_pandas_spark.functions.jpeg import _QE_TABLE

    out = subprocess.run(
        [oracle_bin, "dumptab"], capture_output=True, text=True, check=True
    ).stdout
    assert list(_QE_TABLE) == _unpack_aritab([int(x) for x in out.split()])


def test_arith_extended_random_battery(oracle_bin, tmp_path):
    """Fresh randomized images encoded by libjpeg on the fly — shapes
    crossing MCU boundaries, quality extremes, progressive, restart
    intervals — every one must decode coefficient-exact."""
    rng = np.random.default_rng(777)
    cases = []
    for i in range(12):
        ch = 3 if i % 2 else 1
        h = int(rng.integers(8, 50))
        w = int(rng.integers(8, 50))
        shape = (h, w, ch) if ch == 3 else (h, w)
        smooth = rng.random() < 0.5
        if smooth:
            base = np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256
            img = (
                np.stack([(base + 40 * k) % 256 for k in range(ch)], axis=2)
                if ch == 3
                else base
            ).astype(np.uint8)
        else:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
        q = int(rng.choice([10, 50, 75, 95, 100]))
        prog = int(rng.random() < 0.5)
        rst = int(rng.choice([0, 0, 1, 3]))
        cases.append((img, q, prog, rst))
    for idx, (img, q, prog, rst) in enumerate(cases):
        pnm = tmp_path / f"c{idx}.pnm"
        hh, ww = img.shape[:2]
        magic = b"P6" if img.ndim == 3 else b"P5"
        pnm.write_bytes(
            magic + f" {ww} {hh} 255\n".encode() + img.tobytes()
        )
        jp = tmp_path / f"c{idx}.jpg"
        subprocess.run(
            [oracle_bin, "encode", str(pnm), str(jp), str(q), str(prog), str(rst)],
            check=True,
        )
        co = subprocess.run(
            [oracle_bin, "coefs", str(jp)],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        cpath = tmp_path / f"c{idx}.coefs.txt"
        cpath.write_text(co)
        _assert_coefficient_parity(
            jp.read_bytes(), _load_oracle_coefs(str(cpath))
        ), (idx, q, prog, rst)
