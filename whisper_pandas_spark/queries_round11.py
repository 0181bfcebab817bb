"""Round-11 registry entries.

- text_repetition_profile  Gopher/Dolma repetition-rule pack (Rae et al.
                           2021 table A1): duplicate and top word
                           2/3/4-gram occurrence shares, symbol-to-word
                           ratio, bullet/ellipsis line fractions, and the
                           ANDed threshold gate — counts fused into ONE
                           scan, top counts via a local explode + two
                           keyed exchanges (the conditional-max pivot
                           plan shape no earlier text entry has).
- text_bpe_bytes           byte-level BPE (GPT-2 style): trained
                           in-engine over regex pre-tokens on the byte
                           alphabet (public byte→unicode stand-in
                           table), corpus re-encoded under the learned
                           merges; the oracle replays training AND
                           encoding via unrolled boundary-anchored
                           string-replace merge stages.
- graphite_series_by_tag   graphite 1.1 seriesByTag over an explicit
                           TagDB dimension table: tag pivot + predicate
                           filter + LEFT SEMI join (=, !=, anchored =~);
                           the fact scan never shuffles.
- sketch_bloom_membership  Bloom filter membership: sparse set-bit rows,
                           union-distinct merge law (idempotent,
                           replay-safe), all-k-bits probe verdicts with
                           exact truth joined alongside — one-sided
                           error replayed bit-for-bit.
- stream_bloom_replay      streaming Bloom maintenance: foreachBatch
                           union-distinct merges into versioned state,
                           whole stream deliberately REPROCESSED with a
                           fresh checkpoint — idempotence means no
                           exactly-once markers anywhere, hash-gated by
                           the shared batch oracle.
- decontam_bloom_flags     Bloom-filtered decontamination: held-out
                           shingles compressed into one fixed-size
                           filter, training shingles probe via k-way bit
                           explode + broadcast anti-join pair; verdicts
                           are a SUPERSET of the exact overlap (no false
                           negatives), false positives replay exactly.
- text_bpe_bytes_ids       the byte-BPE encode-to-ids half: full per-doc
                           token-id sequences (GPT-2 id convention),
                           positional reassembly with no window; oracle
                           replays training, id assignment AND the
                           ordered readout — whole sequences hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


# -- byte-level BPE ------------------------------------------------------------

_BPE_BYTES_MERGES = 16
_BPE_BYTES_MIN_FREQ = 2

# BPE_REGEX as a DuckDB string literal ('' = escaped quote) — the same
# Java∩RE2 pattern text_bpe_token_count already oracles with.
_DUCK_BPE_RE = (
    "'''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s'']+'"
)

# UTF-8 byte expansion + the GPT-2 byte→unicode stand-in table, as one
# DuckDB list expression over a word (mirrors operators/bpe_bytes.py:
# pretoken_syms exactly — printable bytes keep chr(b), the 68 excluded
# bytes (0..32, 127..160, 173) take chr(256+k) in ascending byte order).
_DUCK_SYMS0 = """' ' || array_to_string(list_transform(
  flatten(list_transform(
    list_transform(range(1, length(word)+1),
                   i -> unicode(substr(word, CAST(i AS INT), 1))),
    cp -> CASE
      WHEN cp < 128 THEN [cp]
      WHEN cp < 2048 THEN [192 + cp//64, 128 + cp%64]
      WHEN cp < 65536 THEN [224 + cp//4096, 128 + (cp//64)%64, 128 + cp%64]
      ELSE [240 + cp//262144, 128 + (cp//4096)%64,
            128 + (cp//64)%64, 128 + cp%64] END)),
  b -> CASE
    WHEN (b BETWEEN 33 AND 126) OR (b BETWEEN 161 AND 172)
         OR (b BETWEEN 174 AND 255) THEN chr(CAST(b AS INT))
    WHEN b <= 32 THEN chr(CAST(256 + b AS INT))
    WHEN b <= 160 THEN chr(CAST(256 + 33 + b - 127 AS INT))
    ELSE chr(323) END), '  ') || ' '"""


def _bpe_bytes_stages() -> str:
    """The shared WITH-prefix replaying byte-level BPE TRAINING.

    Symbols never contain a space (the stand-in table maps every byte to
    a non-space character), so each word's symbol sequence serializes as
    ``' t1  t2  …  tn '`` — single-space outer sentinels, double-space
    separators. One merge (a,b) is then ONE string replace of
    ``' a  b '`` with ``' ab '``: both boundary spaces are asserted (no
    prefix/suffix false matches) but only the LEADING one is consumed,
    so a left-to-right replace-all pass merges exactly the leftmost
    non-overlapping occurrences — the same pass _merge_syms makes.
    Training unrolls K (pairs → argmax → apply) stages; an empty
    argmax (best pair below min_freq) no-ops that stage and every later
    one, matching the engine's early stop. CTEs are MATERIALIZED: each
    stage references its predecessor twice, and DuckDB's default CTE
    inlining would blow up 2^K."""
    k_stages = []
    for k in range(1, _BPE_BYTES_MERGES + 1):
        p = k - 1
        k_stages.append(f"""toks_{p} AS MATERIALIZED (
  SELECT word, freq,
         string_split(substr(s, 2, length(s)-2), '  ') AS t
  FROM syms_{p}
),
pairs_{k} AS MATERIALIZED (
  SELECT a, b, sum(freq) AS n FROM (
    SELECT t[i] AS a, t[i+1] AS b, freq
    FROM (SELECT freq, t, unnest(range(1, len(t))) AS i FROM toks_{p})
  ) GROUP BY a, b
),
m_{k} AS MATERIALIZED (
  SELECT a, b FROM pairs_{k} WHERE n >= {_BPE_BYTES_MIN_FREQ}
  ORDER BY n DESC, a, b LIMIT 1
),
syms_{k} AS MATERIALIZED (
  SELECT word, freq,
    CASE WHEN m.a IS NULL THEN s
         ELSE replace(s, ' ' || m.a || '  ' || m.b || ' ',
                         ' ' || m.a || m.b || ' ') END AS s
  FROM syms_{p} LEFT JOIN m_{k} m ON TRUE
)""")
    stages = ",\n".join(k_stages)
    return f"""pt AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_extract_all(text, {_DUCK_BPE_RE})) AS word
  FROM documents WHERE text IS NOT NULL
),
syms_0 AS MATERIALIZED (
  SELECT word, count(*) AS freq, {_DUCK_SYMS0} AS s
  FROM pt GROUP BY word
),
{stages}"""


def _bpe_bytes_oracle() -> str:
    """Training-stage prefix (see :func:`_bpe_bytes_stages`) + the
    per-document count readout."""
    kk = _BPE_BYTES_MERGES
    return f"""
WITH {_bpe_bytes_stages()},
enc AS (
  SELECT word,
         CAST(octet_length(encode(word)) AS BIGINT) AS nb,
         CAST(len(string_split(substr(s, 2, length(s)-2), '  '))
              AS BIGINT) AS nt
  FROM syms_{kk}
),
agg AS (
  SELECT doc_id, count(*) AS n_pretokens, sum(e.nb) AS n_bytes,
         sum(e.nt) AS n_tokens
  FROM pt JOIN enc e USING (word) GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(n_pretokens, 0) AS BIGINT) AS n_pretokens,
  CAST(coalesce(n_bytes, 0) AS BIGINT) AS n_bytes,
  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN agg USING (doc_id)
ORDER BY doc_id
"""


@register("text_bpe_bytes", oracle=_bpe_bytes_oracle())
def text_bpe_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: byte-level BPE (GPT-2 style, operators/bpe_bytes.py) trained
    in-engine on the corpus' regex pre-tokens ({K} merges, byte alphabet
    via the public byte→unicode stand-in table — no UNK ever), then the
    same corpus encoded under the learned table: per-document pre-token
    / byte / token counts.  Plan: training is one corpus shuffle to the
    pre-token vocabulary then per-merge ONE partial-agg exchange + a
    1-row driver top-1 + one Arrow pass (checkpointed, constant plan
    depth); encoding is one Arrow pass over UNIQUE pre-tokens joined
    back (two exchanges, independent of merge count and document
    length).  The oracle replays training AND encoding exactly: {K}
    unrolled (pair-count → argmax → string-replace merge) stages where
    a boundary-anchored replace IS the left-to-right merge pass —
    symbols never contain the space separator, so no false matches."""
    from whisper_pandas_spark.operators.bpe_bytes import (
        bpe_bytes_counts,
        bpe_bytes_train,
    )

    docs = _table(spark, sf_dir, "documents")
    merges = bpe_bytes_train(
        docs, "text", _BPE_BYTES_MERGES, _BPE_BYTES_MIN_FREQ
    )
    return bpe_bytes_counts(docs, "doc_id", "text", merges).orderBy("doc_id")


# the GPT-2 byte→stand-in mapping as a scalar CASE over a byte column
# (the same mapping _DUCK_SYMS0 applies inside its lambda)
_DUCK_BYTE_TOK = """CASE
    WHEN (b BETWEEN 33 AND 126) OR (b BETWEEN 161 AND 172)
         OR (b BETWEEN 174 AND 255) THEN chr(CAST(b AS INT))
    WHEN b <= 32 THEN chr(CAST(256 + b AS INT))
    WHEN b <= 160 THEN chr(CAST(256 + 33 + b - 127 AS INT))
    ELSE chr(323) END"""


def _bpe_bytes_ids_oracle() -> str:
    """Training-stage prefix + vocabulary id assignment + the ordered
    per-document id-sequence readout. Ids follow the GPT-2 convention
    the engine's bpe_bytes_vocab implements: byte stand-ins get ids
    0..255 (byte value IS the id), merge outputs get 256.. in training
    order with first-occurrence wins for duplicate outputs."""
    kk = _BPE_BYTES_MERGES
    merges_union = "\n  UNION ALL ".join(
        f"SELECT {k} AS k, a, b FROM m_{k}" for k in range(1, kk + 1)
    )
    return f"""
WITH {_bpe_bytes_stages()},
merges_all AS (
  {merges_union}
),
firsts AS (
  SELECT a || b AS tok, min(k) AS k0 FROM merges_all GROUP BY tok
),
mvocab AS (
  SELECT tok, 255 + row_number() OVER (ORDER BY k0) AS id FROM firsts
),
base AS (
  SELECT {_DUCK_BYTE_TOK} AS tok, CAST(b AS BIGINT) AS id
  FROM (SELECT unnest(range(0, 256)) AS b)
),
vt AS (
  SELECT tok, id FROM base UNION ALL SELECT tok, CAST(id AS BIGINT) FROM mvocab
),
vmap AS (
  SELECT map(list(tok ORDER BY id), list(id ORDER BY id)) AS m FROM vt
),
wids AS (
  SELECT word,
    array_to_string(list_transform(
      string_split(substr(s, 2, length(s)-2), '  '),
      t -> CAST(m[t][1] AS VARCHAR)), ',') AS wcsv,
    CAST(len(string_split(substr(s, 2, length(s)-2), '  ')) AS BIGINT) AS nt
  FROM syms_{kk}, vmap
),
ptp AS (
  SELECT doc_id, i.i AS pos, ta[i.i] AS word
  FROM (SELECT doc_id, regexp_extract_all(text, {_DUCK_BPE_RE}) AS ta
        FROM documents WHERE text IS NOT NULL) d,
       LATERAL (SELECT unnest(range(1, len(ta) + 1)) AS i) i
),
agg AS (
  SELECT p.doc_id,
         string_agg(w.wcsv, ',' ORDER BY p.pos) AS ids_csv,
         CAST(sum(w.nt) AS BIGINT) AS n_tokens
  FROM ptp p JOIN wids w USING (word) GROUP BY p.doc_id
)
SELECT d.doc_id,
  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
  coalesce(ids_csv, '') AS ids_csv
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN agg USING (doc_id)
ORDER BY doc_id
"""


@register("text_bpe_bytes_ids", oracle=_bpe_bytes_ids_oracle())
def text_bpe_bytes_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: the byte-level BPE ENCODE-TO-IDS half (operators/bpe_bytes.py:
    bpe_bytes_encode_ids) — every document's full token-id sequence
    under the in-engine-trained merge table, with the GPT-2 id
    convention (byte value IS the id for the 256 stand-ins; merge
    outputs number 256.. in training order, first occurrence wins).
    Byte fallback means no unknown id can ever occur.  Plan: the merge
    loop runs once per UNIQUE pre-token (Arrow pass), id strings join
    back to the POSITIONAL pre-token stream, and each document
    reassembles with one sort_array-over-structs aggregation —
    order-correct under any partitioning, no window; two exchanges
    independent of merge count.  The oracle replays training, id
    assignment AND the ordered reassembly (string_agg ORDER BY
    position), so whole id sequences hash-match."""
    from whisper_pandas_spark.operators.bpe_bytes import (
        bpe_bytes_encode_ids,
        bpe_bytes_train,
    )

    docs = _table(spark, sf_dir, "documents")
    merges = bpe_bytes_train(
        docs, "text", _BPE_BYTES_MERGES, _BPE_BYTES_MIN_FREQ
    )
    return bpe_bytes_encode_ids(docs, "doc_id", "text", merges).orderBy(
        "doc_id"
    )


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


# -- graphite tag functions ----------------------------------------------------

_TAG_PREDICATES = ("shard=s0", "type=~(purch|sign).*", "name!=web")


def _tag_table(series: DataFrame) -> DataFrame:
    """The demo TagDB: a (metric, tag, tag_value) dimension table derived
    deterministically from the metric paths (name/type from path nodes,
    shard from a length parity) — standing in for graphite-web's tagdb,
    which a migrating deployment would load as exactly this shape."""
    from pyspark.sql import functions as F

    m = series.select("metric").distinct()
    node = F.split(F.col("metric"), r"\.")
    entries = F.array(
        F.struct(
            F.lit("name").alias("tag"), node.getItem(0).alias("tag_value")
        ),
        F.struct(
            F.lit("type").alias("tag"), node.getItem(1).alias("tag_value")
        ),
        F.struct(
            F.lit("shard").alias("tag"),
            F.concat(
                F.lit("s"), (F.length(node.getItem(1)) % 2).cast("string")
            ).alias("tag_value"),
        ),
    )
    return m.select("metric", F.explode(entries).alias("t")).select(
        "metric", "t.tag", "t.tag_value"
    )


def _series_by_tag_oracle() -> str:
    from whisper_pandas_spark.queries_round6 import _METRIC_SERIES_SQL

    return f"""
WITH series AS ({_METRIC_SERIES_SQL}),
m AS (SELECT DISTINCT metric FROM series),
tags AS (
  SELECT metric, 'name' AS tag, str_split(metric, '.')[1] AS tag_value FROM m
  UNION ALL
  SELECT metric, 'type', str_split(metric, '.')[2] FROM m
  UNION ALL
  SELECT metric, 'shard',
         's' || CAST(length(str_split(metric, '.')[2]) % 2 AS VARCHAR)
  FROM m
),
wide AS (
  SELECT metric,
    coalesce(max(CASE WHEN tag = 'name' THEN tag_value END), '') AS t_name,
    coalesce(max(CASE WHEN tag = 'type' THEN tag_value END), '') AS t_type,
    coalesce(max(CASE WHEN tag = 'shard' THEN tag_value END), '') AS t_shard
  FROM tags GROUP BY metric
),
matched AS (
  SELECT metric FROM wide
  WHERE t_shard = 's0'
    AND regexp_matches(t_type, '^(?:(purch|sign).*)')
    AND t_name <> 'web'
)
SELECT s.metric, s.timestamp, s.value
FROM series s JOIN matched USING (metric)
ORDER BY metric, timestamp
"""


@register("graphite_series_by_tag", oracle=_series_by_tag_oracle())
def graphite_series_by_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10+/Y97+: graphite 1.1 ``seriesByTag('shard=s0',
    'type=~(purch|sign).*', 'name!=web')`` over an EXPLICIT tagdb
    dimension table (functions/graphite.py:series_by_tag) — the
    formerly out-of-scope tag family made in-scope by modeling
    graphite-web's TagDB as one (metric, tag, tag_value) table; the
    Whisper format itself still carries no tags (COVERAGE.md scope
    note), so deployments supply the table.  Exercises all of '='
    equality, '!=' inequality-with-missing-as-empty, and anchored '=~'
    regex.  Plan: a conditional-max tag pivot over the series-sized
    tagdb (one exchange), every predicate evaluated on that single row
    per series, then a LEFT SEMI join against the points — the
    matched-series set is series-cardinality, so it broadcasts and the
    fact scan never shuffles (the new plan shape: broadcast semi-join
    driven by a tag-predicate dimension filter)."""
    from whisper_pandas_spark.functions.graphite import series_by_tag
    from whisper_pandas_spark.queries_round6 import _metric_series

    s = _metric_series(spark, sf_dir)
    return series_by_tag(s, _tag_table(s), *_TAG_PREDICATES).orderBy(
        "metric", "timestamp"
    )


# -- Bloom filter membership ----------------------------------------------------

_BLOOM_K = 3
_BLOOM_M = 4096
_BLOOM_SPREAD = 25  # items live on a sparse lattice so most probes are absent
_BLOOM_PROBES = 40


def _bloom_oracle() -> str:
    from whisper_pandas_spark.operators.sketches import bloom_duck_hash

    k, m, sp, np_ = _BLOOM_K, _BLOOM_M, _BLOOM_SPREAD, _BLOOM_PROBES
    return f"""
WITH items AS (
  SELECT DISTINCT (user_id % 1000) * {sp} AS item
  FROM events WHERE user_id IS NOT NULL
),
seeds AS (SELECT CAST(i AS INT) AS s FROM generate_series(0, {k - 1}) t(i)),
bits AS (
  SELECT DISTINCT {bloom_duck_hash("i.item", "s.s", m)} AS bit
  FROM items i, seeds s
),
probes AS (
  SELECT CAST(i AS BIGINT) AS item FROM generate_series(0, {np_ - 1}) t(i)
),
pbits AS (
  SELECT DISTINCT p.item, {bloom_duck_hash("p.item", "s.s", m)} AS bit
  FROM probes p, seeds s
),
nb AS (SELECT item, count(*) AS nbits FROM pbits GROUP BY item),
hits AS (
  SELECT p.item,
         CAST(sum(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_hits
  FROM pbits p LEFT JOIN bits b ON b.bit = p.bit
  GROUP BY p.item
)
SELECT 'all' AS scope, h.item, h.n_hits,
       h.n_hits = nb.nbits AS maybe_present,
       coalesce(x.present, FALSE) AS truly_present
FROM hits h
JOIN nb USING (item)
LEFT JOIN (SELECT item, TRUE AS present FROM items) x USING (item)
ORDER BY item
"""


@register("sketch_bloom_membership", oracle=_bloom_oracle())
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch family +: Bloom filter membership (Bloom 1970 — the sketch
    Dolma-style streaming dedup runs at corpus scale;
    operators/sketches.py:bloom_*).  Per-event-type shard filters over
    the sparse user-bucket lattice (user_id % 1000, spread x25 so most
    of the probe range is truly absent), merged to one global filter by
    the set-union law (idempotent — replay-safe with NO exactly-once
    machinery, the structural contrast to the additive CMS), probed for
    items 0..39 with the exact truth joined alongside.  The md5 hash
    family is cross-engine, so the probe verdicts — false positives
    included — replay bit-for-bit; maybe_present is never false for a
    truly present item (one-sided error, pytest-pinned).  Scale: the
    only raw-data exchange is the distinct on (group, bit), bounded by
    groups x m rows with map-side combine; rollup and probes touch
    sketch rows only."""
    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.sketches import (
        bloom_contains,
        bloom_rollup,
        bloom_shard_sketches,
    )

    ev = _table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    items = ev.select(
        F.col("event_type").alias("scope"),
        ((F.col("user_id") % 1000) * _BLOOM_SPREAD).alias("item"),
    )
    shards = bloom_shard_sketches(
        items, ("scope",), "item", k=_BLOOM_K, m=_BLOOM_M
    )
    merged = bloom_rollup(
        shards.withColumn("scope", F.lit("all")), ("scope",)
    )
    probes = spark.range(_BLOOM_PROBES).select(F.col("id").alias("item"))
    got = bloom_contains(
        merged, ("scope",), probes, "item", k=_BLOOM_K, m=_BLOOM_M
    )
    truth = (
        items.select("item").distinct().withColumn("__t", F.lit(True))
    )
    return (
        got.join(truth, "item", "left")
        .select(
            "scope",
            "item",
            "n_hits",
            "maybe_present",
            F.coalesce(F.col("__t"), F.lit(False)).alias("truly_present"),
        )
        .orderBy("item")
    )


# -- streaming Bloom maintenance -------------------------------------------------


def _stream_bloom_oracle() -> str:
    # state merged over all batches — AND deliberately re-merged over a
    # full reprocess — equals the direct build (union-distinct is
    # idempotent), so the oracle is the batch recompute of the same
    # membership verdicts
    return _bloom_oracle()


@register("stream_bloom_replay", oracle=_stream_bloom_oracle())
def stream_bloom_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+: streaming Bloom maintenance (streaming/sketches.py:
    stream_bloom_update) replayed end-to-end — the sparse item lattice
    streams through foreachBatch union-distinct merges into the
    versioned filter state, and then the WHOLE stream is deliberately
    reprocessed into the same state by a second checkpoint-less query
    (every batch is a replay): the idempotent merge law means no
    `_LAST_BATCH` marker machinery exists anywhere in this path, and
    the final state still equals the direct build — which is exactly
    what the shared batch oracle hash-gates (the structural contrast to
    `stream_cms_replay`, whose additive merge REQUIRES exactly-once
    markers).  Probes 0..39 read membership verdicts off the final
    state with the exact truth joined alongside."""
    import tempfile

    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.operators.sketches import bloom_contains
    from whisper_pandas_spark.streaming.sketches import stream_bloom_update

    ev = _table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    items = ev.select(
        F.lit("all").alias("scope"),
        F.col("event_id"),
        ((F.col("user_id") % 1000) * _BLOOM_SPREAD).alias("item"),
    )
    d = tempfile.mkdtemp(prefix="wps_bloomstream_")
    items.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{d}/changes/f1"
    )
    items.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{d}/changes/f2"
    )

    def run_pass(ckpt: str) -> None:
        sdf = (
            spark.readStream.schema("scope string, event_id long, item long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/changes/*")
        )
        q = stream_bloom_update(
            sdf,
            f"{d}/state",
            ("scope",),
            "item",
            k=_BLOOM_K,
            m=_BLOOM_M,
            checkpoint_dir=ckpt,
        )
        q.processAllAvailable()
        q.stop()

    run_pass(f"{d}/ckpt1")
    # full reprocess with a FRESH checkpoint: every batch re-merges into
    # the existing state — harmless by idempotence, proven by the hash
    run_pass(f"{d}/ckpt2")
    state = spark.read.parquet(current_version_path(f"{d}/state"))
    probes = spark.range(_BLOOM_PROBES).select(F.col("id").alias("item"))
    got = bloom_contains(
        state, ("scope",), probes, "item", k=_BLOOM_K, m=_BLOOM_M
    )
    truth = (
        items.select("item").distinct().withColumn("__t", F.lit(True))
    )
    return (
        got.join(truth, "item", "left")
        .select(
            "scope",
            "item",
            "n_hits",
            "maybe_present",
            F.coalesce(F.col("__t"), F.lit(False)).alias("truly_present"),
        )
        .orderBy("item")
    )


# -- Bloom-filtered decontamination ---------------------------------------------

_DC_BLOOM_K = 3
_DC_BLOOM_M = 1 << 16


def _decontam_bloom_oracle() -> str:
    from whisper_pandas_spark.functions.text import (
        DUCK_SHINGLES,
        duck_base_hash32,
    )
    from whisper_pandas_spark.operators.sketches import bloom_duck_hash
    from whisper_pandas_spark.queries_dedup import _split_case

    k, m = _DC_BLOOM_K, _DC_BLOOM_M
    return f"""
WITH assigned AS (
  SELECT doc_id, text, {_split_case()} AS split FROM documents
), toks AS (
  SELECT doc_id, split, {_DUCK_TOKS} AS t FROM assigned
), shing AS (
  SELECT doc_id, split, {DUCK_SHINGLES} AS s FROM toks
), shf AS (
  SELECT doc_id, split,
         list_distinct(list_transform(s, x -> {duck_base_hash32("x")})) AS hh
  FROM shing WHERE len(s) > 0
), held AS (
  SELECT DISTINCT unnest(hh) AS h FROM shf WHERE split = 'test'
), seeds AS (
  SELECT CAST(i AS INT) AS s FROM generate_series(0, {k - 1}) t(i)
), bits AS (
  SELECT DISTINCT {bloom_duck_hash("held.h", "s.s", m)} AS bit
  FROM held, seeds s
), train_h AS (
  SELECT doc_id, unnest(hh) AS h FROM shf WHERE split = 'train'
), pb AS (
  SELECT DISTINCT t.doc_id, t.h, {bloom_duck_hash("t.h", "s.s", m)} AS bit
  FROM train_h t, seeds s
), miss AS (
  SELECT DISTINCT p.doc_id, p.h
  FROM pb p LEFT JOIN bits b USING (bit) WHERE b.bit IS NULL
), flagged AS (
  SELECT doc_id, h FROM train_h
  EXCEPT
  SELECT doc_id, h FROM miss
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""


@register("decontam_bloom_flags", oracle=_decontam_bloom_oracle())
def decontam_bloom_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-pipeline+: Bloom-filtered train/eval decontamination
    (operators/decontam.py:bloom_contamination) composed with the
    deterministic splitter — the production shape when the benchmark
    suite's shingle set is too large to broadcast raw: the held-out
    shingles compress into one fixed-size (m-bit) Bloom filter, and
    training shingles probe it with a k-way bit explode + broadcast
    anti-join pair.  One-sided by the Bloom law: the verdict set is a
    SUPERSET of `decontam_ngram_overlap`'s exact answer (scrubbing
    over-drops, never leaks; the md5 bit family is cross-engine, so the
    false positives themselves replay bit-for-bit in the oracle).
    Scale: the filter is m bits REGARDLESS of held-out cardinality; the
    corpus side stays scan-shaped with no self-shuffle."""
    from whisper_pandas_spark.operators.decontam import bloom_contamination
    from whisper_pandas_spark.operators.sampling import split_assign
    from whisper_pandas_spark.queries_dedup import TEST_FRAC, VAL_FRAC

    docs = _table(spark, sf_dir, "documents")
    assigned = split_assign(docs, "doc_id", TEST_FRAC, VAL_FRAC)
    train = assigned.filter(F.col("split") == "train")
    test = assigned.filter(F.col("split") == "test")
    return bloom_contamination(
        train, test, k=_DC_BLOOM_K, m=_DC_BLOOM_M
    ).orderBy("doc_id")
