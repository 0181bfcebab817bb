"""Synthetic Whisper file generator (FIXTURES.md §F1).

Writes spec-conformant .wsp files (big-endian, 16 B file header, 12 B
archive headers, 12 B points) with a deterministic fill pattern, a
ring-buffer wrap (earliest timestamp mid-buffer) and configurable fill
ratios — mirroring the geometry of the reference's golden fixture at
~1/1000 scale (reference test expectations:
/root/reference/test_whisper_pandas.py:19-103).
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass

import numpy as np

FILE_HEADER = struct.Struct(">LLfL")
ARCHIVE_HEADER = struct.Struct(">LLL")
POINT = struct.Struct(">Ld")

AGG = {"average": 1, "sum": 2, "last": 3, "max": 4, "min": 5,
       "avg_zero": 6, "absmax": 7, "absmin": 8}

#: Default geometry: (seconds_per_point, points, fill_ratio)
DEFAULT_ARCHIVES = [(10, 1600, 1.0), (60, 5300, 0.44), (3600, 90, 0.44)]

#: End of the synthetic data range (epoch seconds, aligned to 3600).
END_TS = 1_626_766_400 // 3600 * 3600  # ≈ 2021-07-20, matching the fixture era


@dataclass
class SynthArchive:
    seconds_per_point: int
    points: int
    filled: np.ndarray  # (n, 2) [ts, value]


def build_wsp(
    path: str,
    aggregation: str = "average",
    x_files_factor: float = 0.5,
    archives: list[tuple[int, int, float]] | None = None,
    seed: int = 42,
    gzip_out: bool = False,
    truncate_to: int | None = None,
) -> list[SynthArchive]:
    """Write a synthetic .wsp; returns per-archive filled (ts, value) arrays
    (chronologically sorted) for golden assertions."""
    archives = archives or DEFAULT_ARCHIVES
    rng = np.random.default_rng(seed)

    header_size = FILE_HEADER.size + ARCHIVE_HEADER.size * len(archives)
    offsets = []
    off = header_size
    for spp, points, _ in archives:
        offsets.append(off)
        off += 12 * points

    max_retention = max(spp * points for spp, points, _ in archives)
    buf = bytearray(off)
    FILE_HEADER.pack_into(buf, 0, AGG[aggregation], max_retention,
                          x_files_factor, len(archives))
    for i, (spp, points, _) in enumerate(archives):
        ARCHIVE_HEADER.pack_into(buf, FILE_HEADER.size + 12 * i,
                                 offsets[i], spp, points)

    out: list[SynthArchive] = []
    for i, (spp, points, fill) in enumerate(archives):
        n_fill = max(1, int(points * fill))
        # Newest point at END_TS; contiguous recent range of n_fill points.
        ts = END_TS - spp * np.arange(n_fill, dtype="int64")
        ts = ts[::-1]  # ascending
        # Smooth walk around 4.1 ± 0.05 (fixture-era value scale).
        vals = 4.1 + np.cumsum(rng.normal(0, 0.002, n_fill))
        vals = 4.05 + (vals - vals.min()) % 0.1
        # Ring placement: slot = (ts // spp) % points → wraps mid-buffer.
        # Vectorized write (a Python pack_into loop takes ~30 s for the
        # full 6.9M-point reference geometry used by bench.py).
        slots = (ts // spp) % points
        base = offsets[i]
        arch = np.zeros(points, dtype=[("ts", ">u4"), ("val", ">f8")])
        arch["ts"][slots] = ts
        arch["val"][slots] = vals
        buf[base : base + 12 * points] = arch.tobytes()
        out.append(SynthArchive(spp, points, np.column_stack([ts, vals])))

    data = bytes(buf)
    if truncate_to is not None:
        data = data[:truncate_to]
    if gzip_out:
        with open(path, "wb") as f:
            f.write(gzip.compress(data, 6))
    else:
        with open(path, "wb") as f:
            f.write(data)
    return out
