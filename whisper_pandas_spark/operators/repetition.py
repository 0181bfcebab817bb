"""Gopher/Dolma-style repetition and symbol quality rules (X4+).

The reference (`whisper_pandas.py`, 299 lines) has no text surface; this
module extends the engine with the standard pre-training repetition
filter pack published in Rae et al. 2021 ("Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", table A1) and kept
by Soldaini et al. 2024 (Dolma): per document,

- duplicate word n-gram share for n = 2, 3, 4 (what fraction of n-gram
  OCCURRENCES are repeats of an earlier occurrence in the same doc),
- top n-gram share for n = 2, 3, 4 (the most frequent n-gram's share of
  all n-gram occurrences — Gopher's "fraction in most common n-gram",
  measured over occurrences rather than characters so every count is an
  exact integer both engines agree on),
- symbol-to-word ratio (``#``, ``...`` and ``…`` occurrences per word),
- bullet-line and ellipsis-line fractions,

plus one boolean gate ANDing the published thresholds. Generated or
boilerplate text trips these rules long before it duplicates another
document, which is why every production corpus pipeline runs them
*before* the cross-document dedup pass.

Design (scale-first):

- **Counts fuse into the scan.** Word counts, n-gram totals and distinct
  counts (the ``arrays_zip``-of-slices codegen form from
  functions/text.py:word_shingle_stats — no lambda HOFs), line counts
  and symbol counts are all row-local whole-stage-codegen expressions:
  ZERO shuffles for everything except the top-n-gram counts.
- **Top counts need a frequency table**, which arrays cannot express in
  codegen, so that branch explodes the zipped (w, w+1, w+2, w+3) window
  structs LOCALLY (linear bytes — no O(n²) array duplication, no window
  shuffle over raw tokens), stacks the 2/3/4-grams, and takes exactly
  TWO keyed exchanges: groupBy(doc, n, gram) → count, then groupBy(doc)
  with three conditional maxes. Partial aggregation absorbs per-doc
  skew in the first; the second carries ≤3 rows per document.
- **No regex anchors.** Line metrics count ``\\n``-delimited patterns on
  the text with an explicit newline prepended/appended instead of
  ``(?m)^``/``$`` — Java and RE2 disagree on multiline ``$`` semantics
  around ``\\r\\n`` and Unicode line separators; plain ``\\n`` literals
  read identically in both engines.
- **Exact integers, one fixed-order division each.** Every share is an
  int/int IEEE division (+ round 6), so the oracle replays bit-for-bit.

Thresholds (Gopher table A1, adapted to occurrence shares):
top 2-gram ≤ 0.20, top 3-gram ≤ 0.18, top 4-gram ≤ 0.16,
symbol-to-word ≤ 0.10, bullet lines ≤ 0.90, ellipsis lines ≤ 0.30.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from whisper_pandas_spark.functions.text import tokenize, word_shingle_stats

# Gopher table A1 thresholds (the top-n-gram and symbol/line rules; the
# duplicate-share columns are reported unthresholded — Gopher's dup rules
# are character-weighted for n=5..10, a different estimator).
TOP_SHARE_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
SYMBOL_WORD_MAX = 0.10
BULLET_LINE_MAX = 0.90
ELLIPSIS_LINE_MAX = 0.30

# Explicit patterns shared verbatim with the DuckDB oracle (no anchors,
# no \s — Java/RE2 dialect-identical).
BULLET_RE = "\\n[ \\t]*[-*\u2022]"  # line starts with -, * or •
ELLIPSIS_LINE_RE = "(\\.\\.\\.|\u2026)[ \\t\\r]*\\n"  # line ends with ... or …
ELLIPSIS3_RE = "\\.\\.\\."


def _char_count(text: Column, ch: str) -> Column:
    """Occurrences of a single literal character, as a length diff
    (cheaper than regex, identical in DuckDB)."""
    return F.length(text) - F.length(F.replace(text, F.lit(ch), F.lit("")))


def repetition_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Gopher/Dolma repetition profile.

    Returns (doc_id, n_words, n_lines, dup2_share, dup3_share,
    dup4_share, top2_share, top3_share, top4_share, symbol_word_ratio,
    bullet_line_frac, ellipsis_line_frac, pass_repetition). Shares are
    NULL when the document has no n-gram of that order; NULL shares
    count as passing (a two-word doc isn't "repetitive").

    Tokenization is functions/text.py:tokenize (lowercase alphanumeric
    runs) — the same normalization the other text_* operators use, with
    the same DuckDB spelling.
    """
    from whisper_pandas_spark.operators.dedup import _spread

    # _spread: the single-file fixture arrives as ONE scan partition,
    # which would run BOTH branches' heavy map work — the interpreted
    # shingle-stat HOFs and the gram explode — on one core (measured
    # 2.4x at sf0.1); no-op on a wide scan
    df = _spread(df.select(F.col(id_col), F.col(text_col)))
    text = F.col(text_col)
    toks = tokenize(text_col)

    # -- branch 1: everything countable in the scan (zero shuffles) ------
    totals: dict[int, tuple[Column, Column]] = {
        n: word_shingle_stats(toks, n) for n in (2, 3, 4)
    }
    # n_lines = newline count + 1 (an empty doc is one empty line);
    # bullet/ellipsis counts use an explicit sentinel newline so no
    # regex anchor is ever needed.
    n_lines = _char_count(text, "\n") + 1
    scal = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_words"),
        n_lines.cast("bigint").alias("n_lines"),
        F.regexp_count(F.concat(F.lit("\n"), text), F.lit(BULLET_RE))
        .cast("bigint")
        .alias("bullet_lines"),
        F.regexp_count(F.concat(text, F.lit("\n")), F.lit(ELLIPSIS_LINE_RE))
        .cast("bigint")
        .alias("ellipsis_lines"),
        (
            _char_count(text, "#")
            + F.regexp_count(text, F.lit(ELLIPSIS3_RE))
            + _char_count(text, "\u2026")
        )
        .cast("bigint")
        .alias("symbol_cnt"),
        *[
            c
            for n, (tot, dis) in totals.items()
            for c in (
                tot.cast("bigint").alias(f"total{n}"),
                dis.cast("bigint").alias(f"dist{n}"),
            )
        ],
    )

    # -- branch 2: top n-gram counts (the one thing arrays can't) --------
    # Zip the token array with its three shifted copies: element i is
    # (w_i, w_{i+1}|null, w_{i+2}|null, w_{i+3}|null) — arrays_zip pads
    # the shorter slices with null, and null propagates through concat,
    # so short tails drop out via the IS NOT NULL filter. The explode is
    # LOCAL (no shuffle) and linear: each output row carries 4 tokens,
    # never the whole array.
    L = F.size(toks)
    zipped = F.arrays_zip(
        toks.alias("w0"),
        F.slice(toks, 2, F.greatest(L - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 3, F.greatest(L - 2, F.lit(0))).alias("w2"),
        F.slice(toks, 4, F.greatest(L - 3, F.lit(0))).alias("w3"),
    )
    ex = df.select(
        F.col(id_col).alias("doc_id"), F.explode(zipped).alias("g")
    )
    g2 = F.concat(F.col("g.w0"), F.lit(" "), F.col("g.w1"))
    g3 = F.concat(g2, F.lit(" "), F.col("g.w2"))
    g4 = F.concat(g3, F.lit(" "), F.col("g.w3"))
    grams = ex.select(
        "doc_id",
        F.stack(
            F.lit(3),
            F.lit(2), g2,
            F.lit(3), g3,
            F.lit(4), g4,
        ).alias("n", "gram"),
    ).where(F.col("gram").isNotNull())
    tops = (
        grams.groupBy("doc_id", "n", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            *[
                F.max(F.when(F.col("n") == n, F.col("cnt"))).alias(
                    f"top{n}_cnt"
                )
                for n in (2, 3, 4)
            ]
        )
    )

    out = scal.join(tops, "doc_id", "left")

    def share(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")), 6
        )

    cols = [
        F.col("doc_id"),
        F.col("n_words"),
        F.col("n_lines"),
    ]
    gates: list[Column] = []
    for n in (2, 3, 4):
        cols.append(
            share(
                F.col(f"total{n}") - F.col(f"dist{n}"), F.col(f"total{n}")
            ).alias(f"dup{n}_share")
        )
    for n in (2, 3, 4):
        top_share = share(F.col(f"top{n}_cnt"), F.col(f"total{n}"))
        cols.append(top_share.alias(f"top{n}_share"))
        gates.append(F.coalesce(top_share, F.lit(0.0)) <= TOP_SHARE_MAX[n])
    symbol_ratio = share(F.col("symbol_cnt"), F.col("n_words"))
    bullet_frac = share(F.col("bullet_lines"), F.col("n_lines"))
    ellipsis_frac = share(F.col("ellipsis_lines"), F.col("n_lines"))
    cols += [
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
    ]
    gates += [
        F.coalesce(symbol_ratio, F.lit(0.0)) <= SYMBOL_WORD_MAX,
        F.coalesce(bullet_frac, F.lit(0.0)) <= BULLET_LINE_MAX,
        F.coalesce(ellipsis_frac, F.lit(0.0)) <= ELLIPSIS_LINE_MAX,
    ]
    gate = gates[0]
    for g in gates[1:]:
        gate = gate & g
    cols.append(gate.alias("pass_repetition"))
    return out.select(*cols)
