"""Web-corpus cleaning operators: C4-style line filtering and HTML
boilerplate extraction.

Extension beyond the reference (whisper_pandas.py, a 299-line .wsp
decoder, has no text surface): these are the first two stages every
public web-scale pretraining pipeline runs — C4 (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning", §2.2) line/document rules
and tag/boilerplate stripping (the role trafilatura/jusText play in
CCNet/RefinedWeb-style pipelines, here as a deterministic regex chain).

Scale design
------------
Both operators are single-projection, ZERO-shuffle column expressions.
No Python UDFs, no explode — a document never leaves its partition, so
the operators scale exactly as the scan does (100 TB = more partitions,
same plan). Filter decisions ride WITH the row (`doc_kept` boolean) so
callers can push the resulting predicate into downstream scans rather
than materializing an intermediate corpus.

Execution tiers, stated honestly: the HTML chain is regexp_replace
built-ins — true WholeStageCodegen. The C4 line rules run as an ARROW
batch pass (mapInPandas, round 13): the previous higher-order
`filter()` lambda was CodegenFallback — interpreted per LINE, ~60
us/doc, the single largest per-row CPU tax in the engine at the sf1
stress (12.6 s). The Arrow form keeps the same zero-shuffle shape (a
document never leaves its partition; Arrow serialization is a
bandwidth cost, ~GB/s, not a per-element interpreter cost) and drops
the per-line work to C-speed numpy/str operations — the
`semantic_contamination` Arrow-pass precedent. The SQL-expression
twin is kept as `_c4_line_filter_expr` and pinned bit-equal in
pytest, so the rule semantics stay engine-replayable and the DuckDB
oracle is unchanged.

C4 rules implemented (the published subset that is deterministic and
locale-free; citations are to the C4 paper's §2.2 rule list):

- keep only lines that end in a terminal punctuation mark (. ! ? ")
- keep only lines with >= ``min_words`` words (paper: 5)
- drop lines containing the word "javascript" (cookie/JS warnings)
- drop lines that are cookie/policy boilerplate ("privacy policy",
  "terms of use", "cookie policy", "uses cookies")
- drop the whole document if it has fewer than ``min_kept_lines``
  surviving lines (paper: 3 sentences)
- drop the whole document if it contains "lorem ipsum" or a curly
  brace "{" (code/placeholder pages)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Lowercased substrings whose presence drops a LINE (C4's
# javascript/policy rules).
LINE_BAD_SUBSTRINGS = (
    "javascript",
    "privacy policy",
    "terms of use",
    "cookie policy",
    "uses cookies",
)

# Lowercased substrings whose presence drops the whole DOCUMENT.
DOC_BAD_SUBSTRINGS = ("lorem ipsum", "{")

TERMINAL_PUNCT_RE = '[.!?"]$'


def _line_keep_predicate(line: str, min_words: int) -> str:
    """SQL boolean: does trimmed line *line* survive the C4 line rules?

    Written as a SQL-expression fragment so the whole filter stays one
    codegen `filter()` higher-order function over the split array.
    """
    bad = " OR ".join(
        f"contains(lower({line}), '{s}')" for s in LINE_BAD_SUBSTRINGS
    )
    return (
        f"{line} rlike '{TERMINAL_PUNCT_RE}'"
        f" AND size(split({line}, ' +')) >= {min_words}"
        f" AND NOT ({bad})"
    )


def _c4_line_filter_expr(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """The SQL-expression form of the C4 rules (higher-order `filter()`
    lambda — CodegenFallback, interpreted per line). Kept as the
    engine-replayable semantic twin of :func:`c4_line_filter`; pytest
    pins both forms bit-equal. Do not use in hot paths — ~60 us/doc
    interpreter cost at the sf1 stress."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.expr(
        f"filter(split({text_col}, '\\n'),"
        f" l -> {_line_keep_predicate('trim(l)', min_words)})"
    )
    doc_bad = " OR ".join(
        f"contains(lower({text_col}), '{s}')" for s in DOC_BAD_SUBSTRINGS
    )
    doc_kept = (F.size(kept) >= min_kept_lines) & ~F.expr(doc_bad)
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        doc_kept.alias("doc_kept"),
        F.when(doc_kept, F.array_join(kept, "\n"))
        .otherwise(F.lit(""))
        .alias("clean_text"),
    )


def _c4_keep_line(t: str, min_words: int) -> bool:
    """Python twin of ``_line_keep_predicate`` over the TRIMMED line.

    Chunk counting matches SQL ``size(split(t, ' +'))`` for every
    decision: non-empty space-run-separated chunks are counted the same
    way, and the one representational difference (SQL counts '' as one
    empty chunk, Python as zero) cannot flip the verdict because ''
    already fails the terminal-punctuation rule. The end-anchor check
    is `str.endswith`, which agrees with DuckDB's RE2 `$`
    (end-of-text); Java's `$` would also match before a trailing
    ``\\r`` — the Python form is the oracle-consistent one.
    """
    if not t.endswith(('.', '!', '?', '"')):
        return False
    if sum(1 for c in t.split(" ") if c) < min_words:
        return False
    lt = t.lower()
    return not any(s in lt for s in LINE_BAD_SUBSTRINGS)


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """Apply the C4 cleaning rules to newline-separated *text_col*.

    Returns one row per input document:

    - ``n_lines``   — lines before filtering
    - ``n_kept``    — lines surviving the line rules
    - ``doc_kept``  — document-level verdict (line count + banned
      substrings); callers filter on this
    - ``clean_text``— the surviving lines re-joined with ``\\n``
      (empty string when the document is dropped, so the column is
      never null and downstream md5/token passes need no guards)

    Arrow batch pass (round 13 — replaces the interpreted higher-order
    `filter()` lambda, the engine's largest per-row CPU tax): one
    mapInPandas stage, zero shuffles, a document never leaves its
    partition. Per-line work is plain C-speed str operations; semantics
    are pinned bit-equal to :func:`_c4_line_filter_expr` in pytest and
    the DuckDB oracle replays the same rules unchanged.
    """
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    mw, mk = int(min_words), int(min_kept_lines)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_lines, n_kept, doc_kept, clean = [], [], [], []
            for text in pdf.iloc[:, 1]:
                if text is None:
                    text = ""  # null-tolerant (SQL twin yields SQL NULLs)
                lines = text.split("\n")
                kept = [l for l in lines if _c4_keep_line(l.strip(" "), mw)]
                lt = text.lower()
                ok = len(kept) >= mk and not any(
                    s in lt for s in DOC_BAD_SUBSTRINGS
                )
                n_lines.append(len(lines))
                n_kept.append(len(kept))
                doc_kept.append(ok)
                clean.append("\n".join(kept) if ok else "")
            yield pd.DataFrame(
                {
                    id_col: pdf.iloc[:, 0],
                    "n_lines": n_lines,
                    "n_kept": n_kept,
                    "doc_kept": doc_kept,
                    "clean_text": clean,
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run,
        f"{id_col} {id_type}, n_lines int, n_kept int,"
        " doc_kept boolean, clean_text string",
    )


# ---------------------------------------------------------------------------
# HTML extraction
# ---------------------------------------------------------------------------
# An ordered regexp_replace chain; order matters (script/style/comment
# blocks must vanish BEFORE the generic tag strip, or their inner "<"
# text could desynchronize the tag regex). Patterns use (?is) inline
# flags so Java (Spark) and RE2 (DuckDB, flags passed separately)
# agree; all are non-greedy to stay linear in document length.

# (pattern, replacement, needs_dotall) applied in order.
HTML_STRIP_STEPS: tuple[tuple[str, str, bool], ...] = (
    (r"<script\b[^>]*>.*?</script\s*>", " ", True),
    (r"<style\b[^>]*>.*?</style\s*>", " ", True),
    (r"<!--.*?-->", " ", True),
    # block-level tags become newlines so paragraph structure survives
    (r"</?(?:p|div|br|h[1-6]|li|ul|ol|tr|table|section|article)\b[^>]*/?>",
     "\n", False),
    # inline tags vanish WITHOUT a space (HTML semantics: <b>/<a> do
    # not break tokens — "Hello <b>world</b>," must yield "world,")
    (r"<[^>]+>", "", False),
)

# Entity decode map (the common named set + numeric apostrophe).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: so "&amp;lt;" decodes to the literal "&lt;"
)


def html_extract_expr(html: Column) -> Column:
    """The tag-strip + entity-decode + whitespace-collapse chain as one
    column expression (callers compose it into wider projections)."""
    out = html
    for pattern, repl, dotall in HTML_STRIP_STEPS:
        flags = "(?is)" if dotall else "(?i)"
        out = F.regexp_replace(out, flags + pattern, repl)
    for entity, char in HTML_ENTITIES:
        out = F.regexp_replace(out, entity, char)
    out = F.regexp_replace(out, "[ \t]+", " ")
    out = F.regexp_replace(out, " *\n[ \n]*", "\n")
    # trim spaces AND newlines at both ends (plain trim() is space-only)
    return F.btrim(out, F.lit(" \n"))


def html_extract(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Strip tags/boilerplate from *html_col*, returning
    ``(id, clean_text, n_lines, n_chars)``.

    Same scale shape as :func:`c4_line_filter`: one zero-shuffle
    projection, all regexes RE2/Java-compatible and non-greedy
    (linear-time), no UDFs. At 100 TB this is scan-bound.
    """
    clean = html_extract_expr(F.col(html_col))
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        (F.size(F.split(clean, "\n")) ).alias("n_lines"),
        F.length(clean).alias("n_chars"),
    )
