"""Per-document compression-ratio quality signal — the cheap
RefinedWeb/Dolma-style gibberish & boilerplate screen.

Extension beyond the reference (whisper_pandas.py, a 299-line .wsp
decoder, has no text surface). Web-curation pipelines use the zlib
ratio of a document as a two-sided quality gate (e.g. RefinedWeb /
MassiveText-style heuristics and Dolma's paragraph-level dedup
precursor checks):

- a document that compresses TOO WELL (low ratio) is repetitive
  boilerplate — navigation chrome, keyword stuffing, template spam;
- a document that barely compresses (ratio near 1) is high-entropy
  non-text — base64 blobs, minified bundles, binary-in-text.

It complements the engine's other quality signals (trained classifier,
KN perplexity, repetition profile, readability): one zlib pass costs
~100 MB/s/core — orders of magnitude below classifier inference — so
it runs FIRST in a funnel and cheaply discards the worst mass.

Determinism / oracle design: zlib with a pinned level is a
deterministic byte function (RFC 1950/1951 + the fixed deflate
implementation every CPython links), but no SQL engine exposes it — so
the DuckDB oracle pins the exact per-document compressed byte counts,
computed independently driver-side over the same parquet (a VALUES
table, the queries_whisper geometry-oracle precedent), and replays the
raw lengths and all ratio/flag arithmetic in SQL. The distributed
claim under test — partitioning, Arrow batching, row alignment, the
ratio/flag expressions — is exactly what the hash gate compares.

Scale shape: ONE zero-shuffle Arrow pass (mapInPandas); a document
never leaves its partition, output is 5 scalar columns (no text), so
downstream filters push to the scan side of any later exchange. At
100 TB the pass is scan-bound + one zlib call per document — the same
shape as the C4/span Arrow passes, linear, no skew sensitivity (cost
scales with document bytes, and the pass carries no per-key state).
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: deflate level — pinned; changing it changes the signal and the oracle
ZLIB_LEVEL = 6

#: default two-sided gate: ratio < LO -> too repetitive;
#: ratio > HI -> too random. Tuned for whitespace-tokenized English-like
#: text (word-soup fixtures land ~0.4-0.7; iid printable-ASCII noise
#: lands ~0.84-0.89 — zlib cannot get UTF-8 text much above 0.9, so a
#: 0.95-style cut would never fire on TEXT columns).
RATIO_LO = 0.30
RATIO_HI = 0.80


def zlib_len(text: str, level: int = ZLIB_LEVEL) -> int:
    """Compressed byte count of *text*'s UTF-8 form — the driver-side
    twin the oracle builder uses (same call the executors make)."""
    return len(zlib.compress(text.encode("utf-8"), level))


def compression_ratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    level: int = ZLIB_LEVEL,
    lo: float = RATIO_LO,
    hi: float = RATIO_HI,
) -> DataFrame:
    """(id, raw_len, comp_len, ratio, too_repetitive, too_random).

    - ``raw_len``  — UTF-8 byte length of the document
    - ``comp_len`` — zlib(level) compressed byte length
    - ``ratio``    — comp_len / raw_len rounded half-up at 6 decimals
      via the exact shared formula ``floor(r * 1e6 + 0.5) / 1e6``
      (same IEEE ops in the same order on both engines — Python's
      banker's ``round`` would diverge from SQL ``round`` on exact
      half-ulp ties); NULL for an empty document (both flags false —
      an empty doc is neither verdict; callers drop empties with their
      own length gate)
    - flags        — the two-sided quality gate, composable with the
      engine's quality-funnel predicates
    """
    import math

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    lvl = int(level)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw, comp, ratio, rep, rnd = [], [], [], [], []
            for text in pdf.iloc[:, 1]:
                b = (text or "").encode("utf-8")
                n = len(b)
                raw.append(n)
                if n == 0:
                    comp.append(len(zlib.compress(b, lvl)))
                    ratio.append(None)
                    rep.append(False)
                    rnd.append(False)
                    continue
                c = len(zlib.compress(b, lvl))
                r = math.floor(c / n * 1000000 + 0.5) / 1000000
                comp.append(c)
                ratio.append(r)
                rep.append(r < lo)
                rnd.append(r > hi)
            yield pd.DataFrame(
                {
                    id_col: pdf.iloc[:, 0],
                    "raw_len": raw,
                    "comp_len": comp,
                    "ratio": ratio,
                    "too_repetitive": rep,
                    "too_random": rnd,
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run,
        f"{id_col} {id_type}, raw_len long, comp_len long, ratio double,"
        " too_repetitive boolean, too_random boolean",
    )
