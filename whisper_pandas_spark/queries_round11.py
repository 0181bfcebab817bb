"""Round-11 registry entries.

- text_repetition_profile  Gopher/Dolma repetition-rule pack (Rae et al.
                           2021 table A1): duplicate and top word
                           2/3/4-gram occurrence shares, symbol-to-word
                           ratio, bullet/ellipsis line fractions, and the
                           ANDed threshold gate — counts fused into ONE
                           scan, top counts via a local explode + two
                           keyed exchanges (the conditional-max pivot
                           plan shape no earlier text entry has).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from whisper_pandas_spark.registry import _table, register

# -- Gopher/Dolma repetition profile ------------------------------------------

_DUCK_TOKS = (
    "regexp_split_to_array(trim(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g')), ' ')"
)


def _rep_oracle() -> str:
    from whisper_pandas_spark.operators.repetition import (
        BULLET_LINE_MAX,
        ELLIPSIS_LINE_MAX,
        SYMBOL_WORD_MAX,
        TOP_SHARE_MAX,
    )

    def duck_shingle_distinct(n: int) -> str:
        join = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
        return (
            f"len(list_distinct(list_transform("
            f"range(1, greatest(len(t)-{n - 1}, 0)+1), i -> {join})))"
        )

    def duck_grams(n: int) -> str:
        join = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
        return f"""
    SELECT doc_id, {n} AS n, {join} AS gram
    FROM (SELECT doc_id, t,
                 unnest(range(1, greatest(len(t)-{n - 1}, 0)+1)) AS i
          FROM toks)"""

    dup_cols = ",\n  ".join(
        f"round(CASE WHEN total{n} > 0 THEN (total{n} - dist{n})::DOUBLE"
        f" / total{n} END, 6) AS dup{n}_share"
        for n in (2, 3, 4)
    )
    top_cols = ",\n  ".join(
        f"round(CASE WHEN total{n} > 0 THEN top{n}_cnt::DOUBLE"
        f" / total{n} END, 6) AS top{n}_share"
        for n in (2, 3, 4)
    )
    gate_terms = [
        f"coalesce(round(CASE WHEN total{n} > 0 THEN top{n}_cnt::DOUBLE"
        f" / total{n} END, 6), 0.0) <= {TOP_SHARE_MAX[n]}"
        for n in (2, 3, 4)
    ] + [
        "coalesce(round(CASE WHEN n_words > 0 THEN symbol_cnt::DOUBLE"
        f" / n_words END, 6), 0.0) <= {SYMBOL_WORD_MAX}",
        "coalesce(round(CASE WHEN n_lines > 0 THEN bullet_lines::DOUBLE"
        f" / n_lines END, 6), 0.0) <= {BULLET_LINE_MAX}",
        "coalesce(round(CASE WHEN n_lines > 0 THEN ellipsis_lines::DOUBLE"
        f" / n_lines END, 6), 0.0) <= {ELLIPSIS_LINE_MAX}",
    ]
    gate = "\n    AND ".join(gate_terms)
    # No regex anchors: bullet/ellipsis lines count \n-delimited patterns
    # on text with a sentinel newline prepended/appended — Java and RE2
    # disagree on multiline ^/$ around \r\n, plain \n literals don't.
    return f"""
WITH toks AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents
),
scal AS (
  SELECT doc_id,
    CAST(len(t) AS BIGINT) AS n_words,
    CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT)
      AS n_lines,
    CAST(len(regexp_extract_all(chr(10) || text, '\\n[ \\t]*[-*\u2022]'))
      AS BIGINT) AS bullet_lines,
    CAST(len(regexp_extract_all(text || chr(10),
      '(\\.\\.\\.|\u2026)[ \\t\\r]*\\n')) AS BIGINT) AS ellipsis_lines,
    CAST(length(text) - length(replace(text, '#', ''))
      + len(regexp_extract_all(text, '\\.\\.\\.'))
      + length(text) - length(replace(text, '\u2026', '')) AS BIGINT)
      AS symbol_cnt,
    CAST(greatest(len(t)-1, 0) AS BIGINT) AS total2,
    CAST(greatest(len(t)-2, 0) AS BIGINT) AS total3,
    CAST(greatest(len(t)-3, 0) AS BIGINT) AS total4,
    CAST({duck_shingle_distinct(2)} AS BIGINT) AS dist2,
    CAST({duck_shingle_distinct(3)} AS BIGINT) AS dist3,
    CAST({duck_shingle_distinct(4)} AS BIGINT) AS dist4
  FROM toks
),
grams AS ({duck_grams(2)}
  UNION ALL{duck_grams(3)}
  UNION ALL{duck_grams(4)}
),
tops AS (
  SELECT doc_id,
    max(CASE WHEN n = 2 THEN cnt END) AS top2_cnt,
    max(CASE WHEN n = 3 THEN cnt END) AS top3_cnt,
    max(CASE WHEN n = 4 THEN cnt END) AS top4_cnt
  FROM (SELECT doc_id, n, gram, count(*) AS cnt FROM grams
        GROUP BY doc_id, n, gram)
  GROUP BY doc_id
)
SELECT doc_id, n_words, n_lines,
  {dup_cols},
  {top_cols},
  round(CASE WHEN n_words > 0 THEN symbol_cnt::DOUBLE / n_words END, 6)
    AS symbol_word_ratio,
  round(CASE WHEN n_lines > 0 THEN bullet_lines::DOUBLE / n_lines END, 6)
    AS bullet_line_frac,
  round(CASE WHEN n_lines > 0 THEN ellipsis_lines::DOUBLE / n_lines END, 6)
    AS ellipsis_line_frac,
  ({gate}) AS pass_repetition
FROM scal LEFT JOIN tops USING (doc_id)
ORDER BY doc_id
"""


@register("text_repetition_profile", oracle=_rep_oracle())
def text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: the Gopher/Dolma pre-training repetition filter pack
    (operators/repetition.py:repetition_profile) — duplicate and top
    word-2/3/4-gram occurrence shares, symbol-to-word ratio,
    bullet/ellipsis line fractions, and the published threshold gate,
    per document.  Plan: every COUNT except the top-n-gram frequencies
    fuses into one codegen scan (zip-of-slices shingle counts, sentinel
    -newline regexp_count line rules — no multiline anchors, no lambda
    HOFs); the top counts explode the zipped token window LOCALLY
    (linear bytes, no shuffle) and take exactly two keyed exchanges
    (groupBy(doc,n,gram) count with map-side partial agg, then a 3-row
    -per-doc conditional-max pivot).  Scale: the only shuffled bytes
    are distinct-gram counts, and every share is an exact-integer IEEE
    division — the oracle replays bit-for-bit."""
    from whisper_pandas_spark.operators.repetition import repetition_profile

    docs = _table(spark, sf_dir, "documents")
    return repetition_profile(docs, "doc_id", "text").orderBy("doc_id")
