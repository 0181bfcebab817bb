"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm).

Extension beyond the reference (no text surface in whisper_pandas.py).
Complements the existing fingerprint family: `text_fingerprints` is a
whole-document rolling hash (any edit changes it), MinHash/SimHash are
set-level sketches; winnowing yields POSITIONED local fingerprints with
the paper's guarantee — any shared substring of length >= w + k - 1
produces at least one shared fingerprint — which is what plagiarism /
near-verbatim-overlap detection at corpus scale needs.

Algorithm (paper §3): hash every k-gram, slide a window of w
consecutive k-gram hashes, select the minimum of each window, breaking
ties by RIGHTMOST position; record each selected (hash, position) once.

Scale design
------------
- k-gram hashing is a zero-shuffle projection: the token array and the
  k-gram hash array are built per-row with codegen higher-order
  functions (`transform` over a `sequence`), reusing the repo's
  cross-engine md5→BIGINT hash family so DuckDB can replay the exact
  fingerprints.
- Window minima use ONE window pass partitioned by document: after the
  per-document explode, `min(struct(hash, -pos))` over
  ``ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING`` selects the
  rightmost-minimal k-gram of each window (struct ordering compares
  hash first, then -pos, so the larger position wins ties) — the
  standard winnowing recurrence as a single Catalyst window operator,
  partition-local per document (one hash exchange on doc id, then
  linear).
- The distinct over selected (doc, pos) is a map-side partial
  aggregate on the SAME doc partitioning — AQE coalesces it into the
  window stage's exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: cross-engine hash: first 15 md5 hex chars of "win:<gram>" as BIGINT
#: (same family as operators/sketches.py `_kmv_hash`).
HASH_PREFIX = "win"


def _gram_hash(gram_sql: str) -> str:
    return (
        f"cast(conv(substring(md5(concat('{HASH_PREFIX}:', {gram_sql})),"
        " 1, 15), 16, 10) as bigint)"
    )


def winnow_duck_hash(gram_sql: str) -> str:
    """DuckDB twin of the k-gram hash — oracles build on this."""
    return (
        f"('0x' || substr(md5('{HASH_PREFIX}:' || {gram_sql}), 1, 15))::BIGINT"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing fingerprints of the token-array column *tokens_col*.

    Returns ``(id, pos, fp)`` — the selected k-gram start positions
    (0-based over the token sequence) and their 60-bit hashes, one row
    per DISTINCT selection, ordered by (id, pos). Documents with fewer
    than ``k`` tokens produce no rows; documents with fewer than
    ``k + w - 1`` tokens produce the minimum of their single short
    window (matching the paper's treatment of short suffixes is not
    needed — every window shorter than w is the whole sequence).
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    # per-row k-gram hash array: positions 0 .. n-k. The transform is
    # guarded with IF rather than relying on the row filter: Spark's
    # sequence() DESCENDS when stop < start (sequence(0,-1) = [0,-1]),
    # and common-subexpression elimination can evaluate the projection
    # while the short-doc filter is still being applied.
    grams = df.filter(F.size(F.col(tokens_col)) >= k).select(
        F.col(id_col),
        F.expr(
            f"IF(size({tokens_col}) >= {k},"
            f" transform(sequence(0, size({tokens_col}) - {k}),"
            f" s -> {_gram_hash(f'array_join(slice({tokens_col}, s + 1, {k}), chr(32))')}),"
            " slice(array(0L), 1, 0))"
        ).alias("gh"),
    )

    pos = grams.select(
        F.col(id_col),
        F.size("gh").alias("ng"),
        F.posexplode("gh").alias("pos", "h"),
    )
    # rightmost-min of each w-window: struct(h, -pos) min over the
    # FORWARD frame starting at every window start. Only FULL windows
    # are winnowing windows (starts 0 .. ng-w); a document with fewer
    # than w k-grams has exactly one (short) window at start 0.
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = pos.select(
        F.col(id_col),
        F.col("ng"),
        F.col("pos").alias("start"),
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(win).alias("m"),
    ).filter(F.col("start") <= F.greatest(F.col("ng") - w, F.lit(0)))
    return (
        sel.select(
            F.col(id_col),
            (-F.col("m.np")).alias("pos"),
            F.col("m.h").alias("fp"),
        )
        .distinct()
        .orderBy(id_col, "pos")
    )
