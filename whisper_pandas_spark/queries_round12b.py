"""Registry entries: round 12b (post-VERDICT-r11 extension wave).

- text_c4_line_filter      C4 (Raffel et al. 2020 §2.2) line/document
                           cleaning rules over synthesized multi-line docs
- text_html_strip          HTML boilerplate extraction (regex chain:
                           script/style/comment blocks, tags, entities,
                           whitespace) over synthesized HTML containers
- text_winnow_fingerprints winnowing / MOSS positioned local fingerprints
                           (Schleimer et al. 2003)
- sketch_hll_rollup        HyperLogLog distinct sketches — the idempotent
                           MAX merge law; both estimate regimes exercised
- stream_hll_replay        streaming HLL maintenance, full-reprocess-proof
                           (the distinct-count sibling of stream_bloom_replay)
- emb_kmeans_int8          distributed Lloyd's k-means over int8 codes —
                           exact integer distances/updates, bit-replayable
- text_wordpiece_ids       WordPiece (BERT): likelihood-scored training +
                           greedy longest-match encode-to-ids
- ingest_orc_roundtrip     documents -> ORC sink -> explicit-schema scan
- pipeline_web_end_to_end  the integrated CommonCrawl-style chain: HTML
                           strip -> C4 -> exact dedup -> domain quota,
                           per-domain funnel value-checked
- emb_rp_topk              Johnson-Lindenstrauss +-1 random projection
                           ANN with an in-query full-dim recall audit
- text_kn_trigram_score    interpolated Kneser-Ney trigram LM trained on
                           the corpus, scoring every document
- text_span_corruption     T5 span corruption: deterministic md5-block
                           masking, sentinel (input, target) pairs
- emb_pca_top_component    corpus top principal component by power
                           iteration (exact int64 Gram, bit-replayable)
- emb_abtt_topk            all-but-the-top corrected similarity (shared
                           _pca_stages oracle prefix)
- dedup_winnow_pairs       MOSS overlap readout: pairs ranked by shared
                           winnowing fingerprints, stop-fp guard
- ingest_xml_roundtrip     Spark 4 built-in XML source behind the
                           tolerant-ingest contract
- emb_hard_negatives       contrastive hard negatives: top-k nearest
                           DIFFERENT-label vectors per query
- sample_group_split       leakage-free split keyed on the registered
                           domain (group integrity pinned)
- text_fim_transform       fill-in-the-middle PSM reordering, 50%
                           md5-gated, deterministic cut points
- stream_kn_replay         streaming KN trigram-count maintenance
                           (additive, exactly-once), scored live

No reference-repo parity: whisper_pandas (reference, 299-line .wsp
decoder) has no text/vector/sketch surface; these back SURVEY.md §2
extension rows Y125-Y144.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register

# ---------------------------------------------------------------------------
# text_c4_line_filter
# ---------------------------------------------------------------------------
# Fixture geometry: documents.text is single-line word soup, so both
# engines synthesize the SAME multi-line document deterministically:
# 12-word chunks become lines; per line i (di = doc_id + i):
#   di % 7 == 3  -> line truncated to 3 words (fails the min-word rule)
#   di % 11 == 7 -> " javascript required" appended (fails the bad-
#                   substring rule even when punctuated)
#   di % 5       -> terminal suffix: . ! ? (kept) / none / ; (dropped)
# plus planted document-level poison lines:
#   doc_id % 37 == 5 -> "lorem ipsum dolor sit amet."
#   doc_id % 41 == 9 -> "function f() { return 1; }"
# The operator (operators/cleaning.py:c4_line_filter) then applies the
# C4 rules; the oracle rebuilds the identical lines and replays the
# rules with DuckDB list/regex functions.

_C4_MIN_WORDS = 5
_C4_MIN_KEPT = 3


def _c4_lines_spark() -> str:
    """SQL expr building the synthesized line array from (doc_id, text)."""
    chunk = "array_join(slice(ws, i * 12 + 1, 12), ' ')"
    short = "array_join(slice(ws, i * 12 + 1, 3), ' ')"
    body = (
        f"concat(IF((doc_id + i) % 7 = 3, {short}, {chunk}),"
        " IF((doc_id + i) % 11 = 7, ' javascript required', ''))"
    )
    line = (
        f"concat({body}, element_at(array('.', '!', '?', '', ';'),"
        " cast((doc_id + i) % 5 as int) + 1))"
    )
    base = (
        f"transform(sequence(0, cast((size(ws) + 11) div 12 as int) - 1),"
        f" i -> {line})"
    )
    empty = "slice(array(''), 1, 0)"  # typed empty array<string>
    return (
        f"concat({base},"
        f" IF(doc_id % 37 = 5, array('lorem ipsum dolor sit amet.'), {empty}),"
        f" IF(doc_id % 41 = 9, array('function f() "
        + "{ return 1; }"
        + f"'), {empty}))"
    )


_C4_ORACLE = f"""
WITH ws0 AS (
  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS ws FROM documents
), lined AS (
  SELECT doc_id,
    list_concat(
      list_transform(range(0, (len(ws) + 11) // 12), i ->
        array_to_string(
          list_slice(ws, CAST(i * 12 + 1 AS INT),
                     CAST(i * 12 + CASE WHEN (doc_id + i) % 7 = 3
                                        THEN 3 ELSE 12 END AS INT)), ' ')
        || CASE WHEN (doc_id + i) % 11 = 7 THEN ' javascript required'
                ELSE '' END
        || (['.', '!', '?', '', ';'])[CAST((doc_id + i) % 5 AS INT) + 1]),
      list_concat(
        CASE WHEN doc_id % 37 = 5
             THEN ['lorem ipsum dolor sit amet.'] ELSE [] END,
        CASE WHEN doc_id % 41 = 9
             THEN ['function f() {{ return 1; }}'] ELSE [] END)
    ) AS lines
  FROM ws0
), filt AS (
  SELECT doc_id, lines,
    list_filter(lines, l ->
      regexp_matches(trim(l), '[.!?"]$')
      AND len(regexp_split_to_array(trim(l), ' +')) >= {_C4_MIN_WORDS}
      AND NOT (contains(lower(l), 'javascript')
               OR contains(lower(l), 'privacy policy')
               OR contains(lower(l), 'terms of use')
               OR contains(lower(l), 'cookie policy')
               OR contains(lower(l), 'uses cookies'))) AS kept
  FROM lined
), verdict AS (
  SELECT doc_id,
    CAST(len(lines) AS INT) AS n_lines,
    CAST(len(kept) AS INT) AS n_kept,
    (len(kept) >= {_C4_MIN_KEPT}
     AND NOT (contains(lower(array_to_string(lines, chr(10))), 'lorem ipsum')
              OR contains(array_to_string(lines, chr(10)), '{{'))) AS doc_kept,
    kept
  FROM filt
)
SELECT doc_id, n_lines, n_kept, doc_kept,
  md5(CASE WHEN doc_kept THEN array_to_string(kept, chr(10)) ELSE '' END)
    AS clean_md5
FROM verdict ORDER BY doc_id
"""


@register("text_c4_line_filter", oracle=_C4_ORACLE)
def text_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: the C4 cleaning rules (terminal punctuation, min words,
    javascript/policy lines, lorem-ipsum / curly-brace documents,
    min surviving lines) as one zero-shuffle projection (higher-order
    filter, CodegenFallback-interpreted — the deliberate trade vs a
    corpus-wide explode/regroup exchange; see operators/cleaning.py). The fixture synthesizes
    identical multi-line documents on both engines (see module
    comment); the oracle replays every rule over DuckDB list lambdas."""
    from whisper_pandas_spark.operators.cleaning import c4_line_filter

    docs = _table(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id", F.split(F.trim("text"), " +").alias("ws")
    ).select("doc_id", F.expr(_c4_lines_spark()).alias("line_arr"))
    lined = lined.select(
        "doc_id", F.array_join("line_arr", "\n").alias("lined")
    )
    out = c4_line_filter(
        lined, "doc_id", "lined",
        min_words=_C4_MIN_WORDS, min_kept_lines=_C4_MIN_KEPT,
    )
    return out.select(
        "doc_id", "n_lines", "n_kept", "doc_kept",
        F.md5(F.encode("clean_text", "utf-8")).alias("clean_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# text_html_strip
# ---------------------------------------------------------------------------
# Fixture: each document is wrapped into a deterministic HTML container
# (comment, head/title, script, style, h1, entity-bearing paragraph,
# footer div with &quot;/&#39;/&nbsp;) — built with IDENTICAL string
# concatenation on both engines. The operator strips it
# (operators/cleaning.py:html_extract); the oracle replays the exact
# regex chain with RE2 flags.


def _html_fixture_spark() -> F.Column:
    return F.concat(
        F.lit("<html><!-- doc "), F.col("doc_id").cast("string"),
        F.lit(" --><head><title>"), F.col("lang"),
        F.lit('</title><script type="text/javascript">var s = "'),
        F.col("source"),
        F.lit('";</script><style>p { color: red; }</style></head><body><h1>'),
        F.upper("lang"), F.lit(" &amp; "), F.col("source"),
        F.lit("</h1><p>"),
        F.regexp_replace("text", "table", "&lt;tbl&gt;"),
        F.lit('</p><div class="foot">&quot;fin&#39;&nbsp;'),
        F.col("doc_id").cast("string"),
        F.lit("&quot;</div></body></html>"),
    )


def _html_fixture_duck() -> str:
    return (
        "'<html><!-- doc ' || CAST(doc_id AS VARCHAR) || ' --><head><title>'"
        " || lang ||"
        " '</title><script type=\"text/javascript\">var s = \"' || source ||"
        " '\";</script><style>p { color: red; }</style></head><body><h1>'"
        " || upper(lang) || ' &amp; ' || source || '</h1><p>'"
        " || replace(text, 'table', '&lt;tbl&gt;')"
        " || '</p><div class=\"foot\">&quot;fin&#39;&nbsp;'"
        " || CAST(doc_id AS VARCHAR) || '&quot;</div></body></html>'"
    )


def _html_strip_duck(html_sql: str) -> str:
    from whisper_pandas_spark.operators.cleaning import (
        HTML_ENTITIES,
        HTML_STRIP_STEPS,
    )

    out = html_sql
    for pattern, repl, dotall in HTML_STRIP_STEPS:
        flags = "gis" if dotall else "gi"
        p = pattern.replace("'", "''")
        r = repl.replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{p}', '{r}', '{flags}')"
    for entity, char in HTML_ENTITIES:
        c = char.replace("'", "''")
        out = f"replace({out}, '{entity}', '{c}')"
    out = f"regexp_replace({out}, '[ \t]+', ' ', 'g')"
    out = (
        f"regexp_replace({out}, ' *' || chr(10) || '[ ' || chr(10) || ']*',"
        " chr(10), 'g')"
    )
    return f"trim({out}, ' ' || chr(10))"


_HTML_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_html_fixture_duck()} AS html FROM documents
), c AS (
  SELECT doc_id, {_html_strip_duck('html')} AS clean FROM h
)
SELECT doc_id, md5(clean) AS clean_md5,
  CAST(len(string_split(clean, chr(10))) AS INT) AS n_lines,
  CAST(length(clean) AS INT) AS n_chars
FROM c ORDER BY doc_id
"""


@register("text_html_strip", oracle=_HTML_ORACLE)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: HTML boilerplate extraction — ordered non-greedy regex chain
    (script/style/comment blocks first, block tags to newlines, generic
    tag strip, entity decode with &amp; LAST, whitespace collapse), all
    inside one zero-shuffle codegen projection
    (operators/cleaning.py:html_extract). The fixture wraps every
    document into an identical HTML container on both engines; the
    oracle replays the exact chain under RE2."""
    from whisper_pandas_spark.operators.cleaning import html_extract

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", _html_fixture_spark().alias("html")
    )
    out = html_extract(docs, "doc_id", "html")
    return out.select(
        "doc_id",
        F.md5(F.encode("clean_text", "utf-8")).alias("clean_md5"),
        "n_lines",
        "n_chars",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# text_winnow_fingerprints
# ---------------------------------------------------------------------------

_WINNOW_K = 4
_WINNOW_W = 5


def _winnow_sel_sql(source_sql: str) -> str:
    """CTE chain selecting winnowing fingerprints from a
    ``(doc_id, text)`` source expression — shared by the fingerprint
    entry and the overlap-pairs entry (one generator, no drift)."""
    from whisper_pandas_spark.operators.winnow import winnow_duck_hash

    k, w = _WINNOW_K, _WINNOW_W
    gram = f"array_to_string(list_slice(t, CAST(s + 1 AS INT), CAST(s + {k} AS INT)), ' ')"
    return f"""toks AS (
  SELECT doc_id,
    regexp_split_to_array(trim(regexp_replace(lower(text),
      '[^a-z0-9]+', ' ', 'g')), ' ') AS t
  FROM ({source_sql})
), g AS (
  SELECT doc_id,
    list_transform(range(0, len(t) - {k} + 1),
      s -> {winnow_duck_hash(gram)}) AS gh
  FROM toks WHERE len(t) >= {k}
), starts AS (
  SELECT doc_id, gh, len(gh) AS ng,
    unnest(range(0, greatest(len(gh) - {w}, 0) + 1)) AS s
  FROM g
), sel AS (
  SELECT doc_id,
    list_slice(gh, CAST(s + 1 AS INT),
               CAST(least(s + {w}, ng) AS INT)) AS win, s
  FROM starts
), mins AS (
  SELECT doc_id, s, win,
    list_reduce(win, (a, b) -> least(a, b)) AS fp
  FROM sel
), selected AS (
  SELECT DISTINCT doc_id,
    CAST(s + len(win) - list_position(list_reverse(win), fp) AS BIGINT) AS pos,
    fp
  FROM mins
)"""


def _winnow_oracle() -> str:
    return f"""
WITH {_winnow_sel_sql("SELECT doc_id, text FROM documents")}
SELECT doc_id, pos, fp FROM selected ORDER BY doc_id, pos
"""


@register("text_winnow_fingerprints", oracle=_winnow_oracle())
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4/X2 bridge: winnowing (MOSS) positioned local fingerprints —
    k-gram hash array as a zero-shuffle codegen projection, then ONE
    doc-partitioned window pass selecting each w-window's rightmost
    minimum via min(struct(hash, -pos)) over a forward frame
    (operators/winnow.py). Guarantees a shared fingerprint for any
    shared substring of >= w + k - 1 tokens. The oracle replays hash,
    windows, and the rightmost-tie rule with DuckDB list lambdas
    (list_reverse + list_position — an independent idiom from the
    struct-min)."""
    from whisper_pandas_spark.functions.text import tokenize
    from whisper_pandas_spark.operators.winnow import winnow_fingerprints_arrow

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", tokenize("text").alias("toks")
    )
    return winnow_fingerprints_arrow(
        docs, "doc_id", "toks", k=_WINNOW_K, w=_WINNOW_W
    ).orderBy("doc_id", "pos")


# ---------------------------------------------------------------------------
# sketch_hll_rollup
# ---------------------------------------------------------------------------
# Two scopes through ONE sketch pass so both estimate regimes are
# value-gated: 'prio:*' groups count ~1300 distinct customers (raw
# harmonic-mean regime) and 'status:*' groups count 5 distinct
# priorities (small-range linear-counting regime, V > 0).

_HLL_M = 64


def _hll_oracle() -> str:
    from whisper_pandas_spark.operators.hll import hll_alpha, hll_duck_hash

    m = _HLL_M
    amm = repr(hll_alpha(m) * m * m)
    mask = (1 << 55) - 1
    return f"""
WITH items AS (
  SELECT 'prio:' || o_orderpriority AS grp, CAST(o_custkey AS VARCHAR) AS val
  FROM orders
  UNION ALL
  SELECT 'status:' || o_orderstatus AS grp, o_orderpriority AS val
  FROM orders
), hashed AS (
  SELECT grp, {hll_duck_hash('val')} AS h FROM items
), rho AS (
  SELECT grp, h % {m} AS bucket,
    CASE WHEN h // {m} = 0 THEN 55
         ELSE bit_count(((h // {m}) & -(h // {m})) - 1) + 1 END AS rho
  FROM hashed
), regs AS (
  SELECT grp, bucket, max(rho) AS reg FROM rho GROUP BY grp, bucket
), lattice AS (
  SELECT g.grp, t.j AS bucket
  FROM (SELECT DISTINCT grp FROM items) g CROSS JOIN range(0, {m}) t(j)
), dense AS (
  SELECT l.grp, array_agg(coalesce(r.reg, 0) ORDER BY l.bucket) AS regs
  FROM lattice l LEFT JOIN regs r
    ON r.grp = l.grp AND r.bucket = l.bucket
  GROUP BY l.grp
), est0 AS (
  SELECT grp,
    CAST(len(list_filter(regs, r -> r = 0)) AS INT) AS n_zero_regs,
    list_reduce(list_prepend(0::BIGINT, regs),
      (a, r) -> (a * 31 + r) & {mask}) AS reg_checksum,
    {amm} / list_reduce(
      list_prepend(0.0::DOUBLE,
        list_transform(regs, r -> 1.0 / CAST(1::BIGINT << r AS DOUBLE))),
      (a, x) -> a + x) AS raw,
    len(list_filter(regs, r -> r = 0)) AS v
  FROM dense
), est AS (
  SELECT grp, n_zero_regs, reg_checksum,
    round(CASE WHEN raw <= {2.5 * m!r} AND v > 0
               THEN {float(m)!r} * ln({float(m)!r} / CAST(v AS DOUBLE))
               ELSE raw END, 6) AS est
  FROM est0
), exact AS (
  SELECT grp, count(DISTINCT val) AS n_exact FROM items GROUP BY grp
)
SELECT e.grp, e.n_zero_regs, e.reg_checksum, e.est, x.n_exact
FROM est e JOIN exact x ON e.grp = x.grp
ORDER BY e.grp
"""


def _hll_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _table(spark, sf_dir, "orders")
    return orders.select(
        F.concat(F.lit("prio:"), "o_orderpriority").alias("grp"),
        F.col("o_custkey").cast("string").alias("val"),
    ).unionByName(
        orders.select(
            F.concat(F.lit("status:"), "o_orderstatus").alias("grp"),
            F.col("o_orderpriority").alias("val"),
        )
    )


@register("sketch_hll_rollup", oracle=_hll_oracle())
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch family +: HyperLogLog (Flajolet et al. 2007) — the
    idempotent element-wise-MAX merge law, completing the repo's merge-
    law matrix (operators/hll.py). The md5 hash family is cross-engine,
    so registers AND the floating estimates replay bit-for-bit: the
    harmonic sum folds registers in bucket order with exact power-of-two
    terms, and the small-range linear-counting branch is exercised by
    the low-cardinality 'status:*' scopes. Scale: one (grp, bucket)
    partial-agg exchange bounded by groups x m rows; estimates touch
    only m-element arrays."""
    from whisper_pandas_spark.operators.hll import (
        hll_estimate,
        hll_rollup,
        hll_shard_sketches,
    )

    items = _hll_items(spark, sf_dir)
    sk = hll_rollup(
        hll_shard_sketches(items, ("grp",), "val", m=_HLL_M), ("grp",)
    )
    est = hll_estimate(sk, ("grp",), m=_HLL_M)
    exact = items.groupBy("grp").agg(
        F.countDistinct("val").alias("n_exact")
    )
    return est.join(exact, "grp").orderBy("grp")


# ---------------------------------------------------------------------------
# stream_hll_replay
# ---------------------------------------------------------------------------


@register("stream_hll_replay", oracle=None)  # oracle set below (shares batch)
def stream_hll_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+: streaming HLL maintenance (streaming/sketches.py:
    stream_hll_update) replayed end-to-end — per-batch sketches MAX-
    merged into versioned register state, then the WHOLE stream
    deliberately reprocessed by a second checkpoint-less pass: the
    idempotent merge law means the double-processed state still equals
    the direct batch build, which is exactly what the shared batch
    oracle hash-gates (the distinct-count sibling of
    stream_bloom_replay; contrast stream_cms_replay, whose additive
    merge requires exactly-once markers)."""
    import tempfile

    from whisper_pandas_spark.operators.hll import hll_estimate
    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.streaming.sketches import stream_hll_update

    items = _hll_items(spark, sf_dir).withColumn(
        "row_id", F.monotonically_increasing_id()
    )
    d = tempfile.mkdtemp(prefix="wps_hllstream_")
    items.filter(F.col("row_id") % 2 == 0).coalesce(1).write.parquet(
        f"{d}/changes/f1"
    )
    items.filter(F.col("row_id") % 2 == 1).coalesce(1).write.parquet(
        f"{d}/changes/f2"
    )

    def run_pass(ckpt: str) -> None:
        sdf = (
            spark.readStream.schema("grp string, val string, row_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/changes/*")
        )
        q = stream_hll_update(
            sdf, f"{d}/state", ("grp",), "val", m=_HLL_M, checkpoint_dir=ckpt
        )
        q.processAllAvailable()
        q.stop()

    run_pass(f"{d}/ckpt1")
    # full reprocess with a FRESH checkpoint: harmless by idempotence
    run_pass(f"{d}/ckpt2")
    state = spark.read.parquet(current_version_path(f"{d}/state"))
    est = hll_estimate(state, ("grp",), m=_HLL_M)
    exact = _hll_items(spark, sf_dir).groupBy("grp").agg(
        F.countDistinct("val").alias("n_exact")
    )
    return est.join(exact, "grp").orderBy("grp")


from whisper_pandas_spark.registry import ORACLES as _ORACLES  # noqa: E402

_ORACLES["stream_hll_replay"] = _hll_oracle()


# ---------------------------------------------------------------------------
# emb_kmeans_int8
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 2
_KM_DIM = 64


def _km_dist(vq: str, cq: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT,"
        f" list_transform(range(1, {_KM_DIM} + 1),"
        f" i -> ({vq}[CAST(i AS INT)] - {cq}[CAST(i AS INT)])"
        f" * ({vq}[CAST(i AS INT)] - {cq}[CAST(i AS INT)]))),"
        " (a, x) -> a + x)"
    )


def _kmeans_oracle() -> str:
    """CTE chain replaying the exact iteration history: codes -> c0 ->
    (assign -> floored-integer-mean update) x iters -> final assign ->
    per-cluster audit. Generated programmatically so the Spark loop and
    the SQL replay can never drift in iteration count."""
    from whisper_pandas_spark.queries_embeddings import (
        _duck_codes,
        _duck_scale,
    )

    k, dim = _KM_K, _KM_DIM
    ctes = [
        f"""codes AS (
  SELECT vec_id, {_duck_codes("embedding", _duck_scale("embedding"))} AS q
  FROM embeddings
)""",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, q
  FROM codes ORDER BY vec_id LIMIT {k}
)""",
    ]
    prev = "c0"
    for it in range(1, _KM_ITERS + 1):
        ctes.append(
            f"""a{it} AS (
  SELECT vec_id, cid AS cluster, dist FROM (
    SELECT v.vec_id, c.cid, {_km_dist("v.q", "c.q")} AS dist,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {_km_dist("v.q", "c.q")}, c.cid) AS rn
    FROM codes v CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""u{it} AS (
  SELECT a.cluster AS cid, CAST(t.d AS INT) AS dim,
    CAST(floor(CAST(CAST(sum(v.q[CAST(t.d + 1 AS INT)]) AS BIGINT) AS DOUBLE)
               / count(*)) AS BIGINT) AS comp
  FROM a{it} a JOIN codes v USING (vec_id)
  CROSS JOIN range(0, {dim}) t(d)
  GROUP BY a.cluster, t.d
)"""
        )
        ctes.append(
            f"""c{it} AS (
  SELECT p.cid, array_agg(coalesce(u.comp, p.q[pd.d + 1]) ORDER BY pd.d) AS q
  FROM {prev} p CROSS JOIN range(0, {dim}) pd(d)
  LEFT JOIN u{it} u ON u.cid = p.cid AND u.dim = pd.d
  GROUP BY p.cid
)"""
        )
        prev = f"c{it}"
    final = _KM_ITERS + 1
    ctes.append(
        f"""a{final} AS (
  SELECT vec_id, cid AS cluster, dist FROM (
    SELECT v.vec_id, c.cid, {_km_dist("v.q", "c.q")} AS dist,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {_km_dist("v.q", "c.q")}, c.cid) AS rn
    FROM codes v CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT cluster, CAST(count(*) AS BIGINT) AS size,
  CAST(sum(vec_id) AS BIGINT) AS id_sum,
  CAST(sum(dist) AS BIGINT) AS inertia
FROM a{final} GROUP BY cluster ORDER BY cluster
"""
    )


@register("emb_kmeans_int8", oracle=_kmeans_oracle())
def emb_kmeans_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: distributed Lloyd's k-means over int8 codes with EXACT
    integer distances and floored-integer-mean updates
    (operators/kmeans.py) — the auditable clustering front-end for
    SemDeDup cells / domain mixtures / IVF training. Assign is a
    map-side Arrow pass (centroid matrix in the closure, vectorized
    exact-int64 numpy distances; zero shuffle); codes materialize once
    per run; update is one (cluster, dim) partial-agg exchange + a
    k x dim bounded collect per iteration. The oracle replays the FULL iteration history in SQL
    (generated CTE chain — same iteration count by construction)."""
    from whisper_pandas_spark.operators.kmeans import (
        kmeans_int8,
        kmeans_summary,
    )

    emb = _table(spark, sf_dir, "embeddings")
    assigned = kmeans_int8(emb, "vec_id", "embedding", k=_KM_K, iters=_KM_ITERS)
    return kmeans_summary(assigned, "vec_id").orderBy("cluster")


# ---------------------------------------------------------------------------
# text_wordpiece_ids
# ---------------------------------------------------------------------------
# Training replay reuses the round-11 serialized-symbols trick (symbols
# never contain a space, so one merge is ONE string replace of
# ' a  b ' with ' ab ' — see queries_round11._bpe_bytes_stages), with
# the WordPiece differences: initial units are first-char + ##-chars,
# the argmax joins per-unit totals to score n_ab / (n_a * n_b)
# (exact-integer operands -> bit-identical IEEE division), and the
# merged piece is a || substr(b, 3). Encoding unrolls MAX_WORD_CHARS
# greedy longest-match stages (each consumes >= 1 char; every char
# position of a corpus word generates its unit, so no UNK except the
# over-long-word clamp).

_WP_MERGES = 10
_WP_MIN_FREQ = 2


def _wp_oracle() -> str:
    from whisper_pandas_spark.operators.wordpiece import MAX_WORD_CHARS, UNK_ID

    maxc = MAX_WORD_CHARS
    stages = []
    vocab_union = ["SELECT u AS piece FROM units_0"]
    for k in range(1, _WP_MERGES + 1):
        p = k - 1
        stages.append(f"""toks_{p} AS MATERIALIZED (
  SELECT word, freq, string_split(substr(s, 2, length(s) - 2), '  ') AS t
  FROM syms_{p}
),
units_{p} AS MATERIALIZED (
  SELECT u, sum(freq) AS n FROM (
    SELECT freq, unnest(t) AS u FROM toks_{p}
  ) GROUP BY u
),
pairs_{k} AS MATERIALIZED (
  SELECT a, b, sum(freq) AS n FROM (
    SELECT t[i] AS a, t[i+1] AS b, freq
    FROM (SELECT freq, t, unnest(range(1, len(t))) AS i FROM toks_{p})
  ) GROUP BY a, b
),
m_{k} AS MATERIALIZED (
  SELECT p.a, p.b, p.a || substr(p.b, 3) AS ab
  FROM pairs_{k} p
  JOIN units_{p} ua ON ua.u = p.a
  JOIN units_{p} ub ON ub.u = p.b
  WHERE p.n >= {_WP_MIN_FREQ}
  ORDER BY CAST(p.n AS DOUBLE) / CAST(ua.n * ub.n AS DOUBLE) DESC, p.a, p.b
  LIMIT 1
),
syms_{k} AS MATERIALIZED (
  SELECT word, freq,
    CASE WHEN m.a IS NULL THEN s
         ELSE replace(s, ' ' || m.a || '  ' || m.b || ' ',
                         ' ' || m.ab || ' ') END AS s
  FROM syms_{p} LEFT JOIN m_{k} m ON TRUE
)""")
        vocab_union.append(f"SELECT ab AS piece FROM m_{k}")

    enc_stages = []
    prev = "e_0"
    for i in range(1, maxc + 1):
        enc_stages.append(f"""b_{i} AS MATERIALIZED (
  SELECT word, rem, first, ids, unk, best, best_id FROM (
    SELECT e.word, e.rem, e.first, e.ids, e.unk,
      v.piece AS best, v.id AS best_id,
      row_number() OVER (PARTITION BY e.word
        ORDER BY (CASE WHEN e.first THEN length(v.piece)
                       ELSE length(v.piece) - 2 END) DESC) AS rn
    FROM {prev} e JOIN vocab_ids v
      ON (CASE WHEN e.first
               THEN NOT starts_with(v.piece, '##')
                    AND starts_with(e.rem, v.piece)
               ELSE starts_with(v.piece, '##')
                    AND starts_with(e.rem, substr(v.piece, 3)) END)
    WHERE e.rem <> ''
  ) WHERE rn = 1
),
e_{i} AS MATERIALIZED (
  SELECT word,
    substr(rem, (CASE WHEN first THEN length(best)
                      ELSE length(best) - 2 END) + 1) AS rem,
    false AS first, list_append(ids, best_id) AS ids, unk
  FROM b_{i}
  UNION ALL
  SELECT word, rem, first, ids, unk FROM {prev} WHERE rem = ''
)""")
        prev = f"e_{i}"

    train_sql = ",\n".join(stages)
    enc_sql = ",\n".join(enc_stages)
    vocab_sql = " UNION ALL ".join(vocab_union)
    return f"""
WITH pt AS MATERIALIZED (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[CAST(i AS INT)] AS word FROM (
    SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text),
      '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
    FROM documents
  ), unnest(range(1, len(ws) + 1)) AS t(i)
  WHERE ws[CAST(i AS INT)] <> ''
),
wvocab AS MATERIALIZED (
  SELECT word, count(*) AS freq FROM pt GROUP BY word
),
syms_0 AS MATERIALIZED (
  SELECT word, freq,
    ' ' || substr(word, 1, 1) ||
    CASE WHEN length(word) > 1
         THEN '  ' || array_to_string(
                list_transform(range(2, length(word) + 1),
                  i -> '##' || substr(word, CAST(i AS INT), 1)), '  ')
         ELSE '' END || ' ' AS s
  FROM wvocab
),
{train_sql},
vocab AS MATERIALIZED (
  SELECT DISTINCT piece FROM ({vocab_sql})
),
vocab_ids AS MATERIALIZED (
  SELECT piece, row_number() OVER (ORDER BY piece) - 1 AS id FROM vocab
),
e_0 AS MATERIALIZED (
  SELECT word,
    CASE WHEN length(word) > {maxc} THEN '' ELSE word END AS rem,
    true AS first,
    CASE WHEN length(word) > {maxc}
         THEN [CAST({UNK_ID} AS BIGINT)] ELSE []::BIGINT[] END AS ids,
    length(word) > {maxc} AS unk
  FROM (SELECT DISTINCT word FROM pt)
),
{enc_sql},
enc AS MATERIALIZED (
  SELECT word, array_to_string(ids, ',') AS wid,
    CAST(len(ids) AS BIGINT) AS nt,
    CASE WHEN unk THEN 1 ELSE 0 END AS unkn
  FROM {prev}
),
agg AS (
  SELECT p.doc_id, count(*) AS n_pretokens, sum(e.nt) AS n_tokens,
    sum(e.unkn) AS n_unk,
    string_agg(e.wid, ',' ORDER BY p.pos) AS ids_csv
  FROM pt p JOIN enc e USING (word) GROUP BY p.doc_id
)
SELECT d.doc_id,
  CAST(coalesce(n_pretokens, 0) AS BIGINT) AS n_pretokens,
  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(n_unk, 0) AS BIGINT) AS n_unk,
  coalesce(ids_csv, '') AS ids_csv
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN agg USING (doc_id)
ORDER BY d.doc_id
"""


@register("text_wordpiece_ids", oracle=_wp_oracle())
def text_wordpiece_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: WordPiece (BERT) — likelihood-scored merge training
    (score = n_ab / (n_a * n_b), the objective BPE's raw-frequency rule
    does NOT share) and greedy longest-match-first encode-to-ids
    (operators/wordpiece.py). Training is the blessed histogram-collect
    + driver-local loop; encode runs once per UNIQUE pre-token (Arrow
    pass) and reassembles per-document id sequences with the
    sort_array-over-structs pattern — two exchanges, independent of
    vocab size. The oracle replays training (serialized-symbol merge
    stages with the scored argmax), id assignment, AND the full greedy
    encode loop (one longest-match stage per consumed char), so whole
    id sequences hash-match."""
    from whisper_pandas_spark.operators.wordpiece import (
        wordpiece_encode_ids,
        wordpiece_train,
    )

    docs = _table(spark, sf_dir, "documents")
    pieces = wordpiece_train(docs, "text", _WP_MERGES, _WP_MIN_FREQ)
    return wordpiece_encode_ids(docs, "doc_id", "text", pieces).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# ingest_orc_roundtrip
# ---------------------------------------------------------------------------


@register(
    "ingest_orc_roundtrip",
    oracle="""
SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id
""",
)
def ingest_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+: documents -> ORC sink -> explicit-schema vectorized scan
    (sources/ingest.py:read_orc/write_orc) — the Hive-ecosystem
    interchange twin of the parquet path. Losslessness IS the
    assertion: the oracle reads the original parquet, so any ORC
    encode/decode drift (unicode, nulls, type mapping) hash-fails."""
    import hashlib
    import tempfile
    from pathlib import Path

    from whisper_pandas_spark.sources.ingest import read_orc, write_orc

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = Path(tempfile.gettempdir()) / f"wps_orc_{tag}"
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    write_orc(docs, str(out))
    back = read_orc(
        spark,
        str(out),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return back.orderBy("doc_id")


# ---------------------------------------------------------------------------
# pipeline_web_end_to_end
# ---------------------------------------------------------------------------
# The INTEGRATED web-crawl pipeline — what a CommonCrawl-style build
# actually chains, composed from operators whose own entries are
# independently bit-exact: HTML wrap fixture -> html_extract (Y126) ->
# c4_line_filter (Y125) -> exact dedup on the cleaned text -> URL
# registered-domain keying (Y116) -> per-domain quota (Y120), with a
# per-domain funnel (raw / post-C4 / post-dedup / post-quota) as the
# checked value. The fixture reuses the C4 entry's synthesized line
# array INSIDE an HTML container, plants constant-body duplicate docs
# (doc_id % 53 == 11) so the dedup stage has real work, and keeps the
# C4 poison plants so document drops flow through the whole chain.

_WEB_QUOTA = 15
_WEB_DUP_LINE = "the corpus pipeline keeps this sentence exactly the same here."


def _web_oracle() -> str:
    from whisper_pandas_spark.queries_round12b import (  # self, for clarity
        _C4_MIN_KEPT,
        _C4_MIN_WORDS,
    )

    html = (
        "'<html><!-- doc ' || CAST(doc_id AS VARCHAR) || ' --><head><title>'"
        " || lang ||"
        " '</title><script type=\"text/javascript\">var s = \"' || source ||"
        " '\";</script><style>p { color: red; }</style></head><body>'"
        " || array_to_string(list_transform(lines,"
        " l -> '<p>' || l || '</p>'), '')"
        " || '</body></html>'"
    )
    return f"""
WITH ws0 AS (
  SELECT doc_id, lang, source,
         regexp_split_to_array(trim(text), ' +') AS ws
  FROM documents
), lined AS (
  SELECT doc_id, lang, source,
    CASE WHEN doc_id % 53 = 11
         THEN ['{_WEB_DUP_LINE}', '{_WEB_DUP_LINE}', '{_WEB_DUP_LINE}']
         ELSE list_concat(
      list_transform(range(0, (len(ws) + 11) // 12), i ->
        array_to_string(
          list_slice(ws, CAST(i * 12 + 1 AS INT),
                     CAST(i * 12 + CASE WHEN (doc_id + i) % 7 = 3
                                        THEN 3 ELSE 12 END AS INT)), ' ')
        || CASE WHEN (doc_id + i) % 11 = 7 THEN ' javascript required'
                ELSE '' END
        || (['.', '!', '?', '', ';'])[CAST((doc_id + i) % 5 AS INT) + 1]),
      list_concat(
        CASE WHEN doc_id % 37 = 5
             THEN ['lorem ipsum dolor sit amet.'] ELSE [] END,
        CASE WHEN doc_id % 41 = 9
             THEN ['function f() {{ return 1; }}'] ELSE [] END)
    ) END AS lines
  FROM ws0
), stripped AS (
  SELECT doc_id, lang, source,
         source || '.com' AS reg_domain,
         {_html_strip_duck(html)} AS clean1
  FROM lined
), c4 AS (
  SELECT doc_id, reg_domain, clean1,
    list_filter(string_split(clean1, chr(10)), l ->
      regexp_matches(trim(l), '[.!?"]$')
      AND len(regexp_split_to_array(trim(l), ' +')) >= {_C4_MIN_WORDS}
      AND NOT (contains(lower(l), 'javascript')
               OR contains(lower(l), 'privacy policy')
               OR contains(lower(l), 'terms of use')
               OR contains(lower(l), 'cookie policy')
               OR contains(lower(l), 'uses cookies'))) AS kept
  FROM stripped
), verdict AS (
  SELECT doc_id, reg_domain,
    (len(kept) >= {_C4_MIN_KEPT}
     AND NOT (contains(lower(clean1), 'lorem ipsum')
              OR contains(clean1, '{{'))) AS c4_kept,
    array_to_string(kept, chr(10)) AS clean2
  FROM c4
), d1 AS (
  SELECT doc_id, reg_domain, clean2 FROM verdict WHERE c4_kept
), d2 AS (
  SELECT doc_id, reg_domain, clean2 FROM d1
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(clean2))
), d3 AS (
  SELECT doc_id, reg_domain, clean2 FROM (
    SELECT *, row_number() OVER (PARTITION BY reg_domain
                                 ORDER BY doc_id) AS rn
    FROM d2
  ) WHERE rn <= {_WEB_QUOTA}
), raw_agg AS (
  SELECT reg_domain, count(*) AS n_raw FROM verdict GROUP BY reg_domain
), c4_agg AS (
  SELECT reg_domain, count(*) AS n_c4 FROM d1 GROUP BY reg_domain
), dd_agg AS (
  SELECT reg_domain, count(*) AS n_dedup FROM d2 GROUP BY reg_domain
), q_agg AS (
  SELECT reg_domain, count(*) AS n_kept,
         CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids,
         CAST(sum(length(clean2)) AS BIGINT) AS kept_chars
  FROM d3 GROUP BY reg_domain
)
SELECT r.reg_domain, r.n_raw,
  CAST(coalesce(c.n_c4, 0) AS BIGINT) AS n_c4,
  CAST(coalesce(d.n_dedup, 0) AS BIGINT) AS n_dedup,
  CAST(coalesce(q.n_kept, 0) AS BIGINT) AS n_kept,
  coalesce(q.sum_kept_ids, 0) AS sum_kept_ids,
  coalesce(q.kept_chars, 0) AS kept_chars
FROM raw_agg r
LEFT JOIN c4_agg c USING (reg_domain)
LEFT JOIN dd_agg d USING (reg_domain)
LEFT JOIN q_agg q USING (reg_domain)
ORDER BY r.reg_domain
"""


def _web_funnel(spark: SparkSession, sf_dir: str, mangler=None) -> DataFrame:
    """Shared body of the web-funnel entries; *mangler* (Column ->
    Column), when given, is applied to the raw HTML column BEFORE the
    strip stage — the round-14 mojibake composition hooks in exactly
    where encoding damage lives in a real crawl (between fetch and
    extraction)."""
    """The INTEGRATED web-crawl pipeline over `documents` — the stages a
    CommonCrawl-style build chains, end to end:

      1. HTML boilerplate extraction (operators/cleaning.py:html_extract
         — codegen regex chain, rides the scan);
      2. C4 line/document cleaning (c4_line_filter — zero-shuffle
         projection, verdict rides the row);
      3. exact dedup of the CLEANED text — min-doc_id keeper per md5,
         the window shuffles digests, never documents;
      4. URL registered-domain keying (operators/urlkey.py — codegen
         strings) + per-domain quota (per_group_quota ->
         WindowGroupLimit: a hot crawl domain moves ~quota rows per
         input partition, never its bulk).

    Output: the per-domain FUNNEL (raw / post-C4 / post-dedup /
    post-quota + kept id-sum and byte totals) — each stage reuses an
    operator whose own entry is independently bit-exact; this entry
    proves the composition stays exact. Shuffle budget at 100 TB:
    strip+clean ride the scan, dedup and quota are one hash exchange
    each, the funnel aggregation reuses the quota partitioning."""
    from pyspark.sql import Window

    from whisper_pandas_spark.operators.cleaning import (
        c4_line_filter,
        html_extract,
    )
    from whisper_pandas_spark.operators.urlkey import url_key_df

    docs = _table(spark, sf_dir, "documents")
    dup = F.array(*[F.lit(_WEB_DUP_LINE)] * 3)
    lined = docs.select(
        "doc_id", "lang", "source", F.split(F.trim("text"), " +").alias("ws")
    ).select(
        "doc_id",
        "lang",
        "source",
        F.when(F.col("doc_id") % 53 == 11, dup)
        .otherwise(F.expr(_c4_lines_spark()))
        .alias("lines"),
    )
    html = lined.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("<html><!-- doc "), F.col("doc_id").cast("string"),
            F.lit(" --><head><title>"), F.col("lang"),
            F.lit('</title><script type="text/javascript">var s = "'),
            F.col("source"),
            F.lit('";</script><style>p { color: red; }</style></head><body>'),
            F.expr("array_join(transform(lines, l -> concat('<p>', l, '</p>')), '')"),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    if mangler is not None:
        html = html.select(
            "doc_id", "source", mangler(F.col("html")).alias("html")
        )
    stripped = html_extract(html, "doc_id", "html").join(
        html.select("doc_id", "source"), "doc_id"
    )
    urls = stripped.withColumn(
        "url",
        F.concat(F.lit("https://www."), F.col("source"),
                 F.lit(".com/doc/"), F.col("doc_id").cast("string")),
    )
    keyed = url_key_df(urls, "url").select(
        "doc_id", "reg_domain", F.col("clean_text").alias("clean1")
    )
    c4 = c4_line_filter(keyed, "doc_id", "clean1").join(
        keyed.select("doc_id", "reg_domain"), "doc_id"
    )
    # eager localCheckpoint: the funnel reads base/d1/d2 from FOUR
    # aggregation consumers — without it each one re-runs the whole
    # strip+C4 chain (the pipeline_corpus_end_to_end lesson)
    base = c4.select(
        "doc_id", "reg_domain", F.col("doc_kept").alias("c4_kept"),
        F.col("clean_text").alias("clean2"),
    ).localCheckpoint(eager=True)
    # One fused pass instead of four aggregation consumers + three
    # left joins (round 14, guide §2.4): every stage verdict becomes a
    # per-row FLAG computed by the same two windows the staged form
    # already paid —
    #   canonical: min kept doc_id per content digest (min over a CASE
    #     ignores the non-kept rows, so the dedup group is identical to
    #     the old filter-then-window on d1);
    #   kept: running count of canonical rows per domain in doc_id
    #     order == per_group_quota's row_number among canonicals;
    # then ONE groupBy(reg_domain) with conditional aggregates reuses
    # the domain window's partitioning (no extra exchange). The funnel
    # checkpoint is scanned once, not four times, and the three
    # count-table joins vanish. Flag semantics are pinned bit-exact by
    # the shared oracle (pipeline_web_end_to_end AND pipeline_web_
    # mojibake hash-match it).
    w = Window.partitionBy(F.md5(F.encode("clean2", "utf-8")))
    wq = (
        Window.partitionBy("reg_domain")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_doc = F.when(F.col("c4_kept"), F.col("doc_id"))
    flagged = base.withColumn(
        "canonical",
        F.col("c4_kept") & (F.col("doc_id") == F.min(kept_doc).over(w)),
    ).withColumn(
        "kept",
        F.col("canonical")
        & (
            F.count(F.when(F.col("canonical"), F.lit(1))).over(wq)
            <= _WEB_QUOTA
        ),
    )
    out = (
        flagged.groupBy("reg_domain")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.count(F.when(F.col("c4_kept"), F.lit(1)))
            .cast("bigint")
            .alias("n_c4"),
            F.count(F.when(F.col("canonical"), F.lit(1)))
            .cast("bigint")
            .alias("n_dedup"),
            F.count(F.when(F.col("kept"), F.lit(1)))
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("kept"), F.col("doc_id"))), F.lit(0)
            )
            .cast("bigint")
            .alias("sum_kept_ids"),
            F.coalesce(
                F.sum(F.when(F.col("kept"), F.length("clean2"))), F.lit(0)
            )
            .cast("bigint")
            .alias("kept_chars"),
        )
        .orderBy("reg_domain")
    )
    return out


@register("pipeline_web_end_to_end", oracle=None)
def pipeline_web_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _web_funnel — the plain composition (docstring retained
    there); this wrapper is the registered face."""
    return _web_funnel(spark, sf_dir)


@register("pipeline_web_mojibake", oracle=None)
def pipeline_web_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+/Y161b (round 14): the encoding-fix stage composed INTO the
    web-crawl chain, at the stage where mojibake actually lives —
    between fetch and HTML extraction. The raw HTML is cp1252-
    mis-decoded in-query (doc_id % 3 == 1 once, % 3 == 2 twice — the
    text_encoding_fix populations) and repaired by the bounded 2-pass
    fix (operators/encoding.py) BEFORE html_extract; because the
    repair is byte-exact and a no-op on the clean population, the
    whole downstream funnel (strip -> C4 -> dedup -> domain quota)
    must land on the identical per-domain table — this entry shares
    pipeline_web_end_to_end's oracle VERBATIM, so the hash gate proves
    the composed stage changes NOTHING but survives real corruption.
    The added stage is pure codegen riding the scan (zero shuffle
    delta)."""
    from whisper_pandas_spark.operators.encoding import (
        corrupt_encoding,
        fix_encoding,
    )

    def mangler(html_col):
        pop = F.col("doc_id") % 3
        once = corrupt_encoding(html_col)
        mangled = (
            F.when(pop == 1, once)
            .when(pop == 2, corrupt_encoding(once))
            .otherwise(html_col)
        )
        return fix_encoding(mangled, passes=2)

    return _web_funnel(spark, sf_dir, mangler=mangler)


_ORACLES["pipeline_web_end_to_end"] = _web_oracle()
_ORACLES["pipeline_web_mojibake"] = _web_oracle()


# ---------------------------------------------------------------------------
# emb_rp_topk
# ---------------------------------------------------------------------------
# JL random projection: 64-dim int8 codes -> 16-dim exact-integer
# projected vectors (md5 +-1 signs), brute top-k in PROJECTED space,
# with per-pair membership in the FULL-dimensional integer-dot top-k
# joined alongside (the in-query recall audit). Everything is exact
# BIGINT arithmetic, so the oracle replays projection, both rankings,
# and the flag bit-for-bit.

_RP_K = 10
_RP_NQ = 5
_RP_IN_DIM = 64


def _rp_oracle() -> str:
    from whisper_pandas_spark.operators.randproj import RP_OUT_DIM, rp_duck_sign
    from whisper_pandas_spark.queries_embeddings import _duck_codes, _duck_scale

    dot_p = (
        "CAST(list_reduce(list_prepend(0::BIGINT,"
        " list_transform(range(1, {n} + 1),"
        " i -> a.p[CAST(i AS INT)] * b.p[CAST(i AS INT)])),"
        " (acc, x) -> acc + x) AS BIGINT)"
    ).format(n=RP_OUT_DIM)
    dot_q = (
        "CAST(list_reduce(list_prepend(0::BIGINT,"
        f" list_transform(range(1, {_RP_IN_DIM} + 1),"
        " i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])),"
        " (acc, x) -> acc + x) AS BIGINT)"
    )
    return f"""
WITH codes AS (
  SELECT vec_id, {_duck_codes("embedding", _duck_scale("embedding"))} AS q
  FROM embeddings
), proj AS (
  SELECT vec_id, t.j,
    CAST(list_reduce(list_prepend(0::BIGINT,
      list_transform(range(1, {_RP_IN_DIM} + 1),
        d -> q[CAST(d AS INT)] * {rp_duck_sign("d - 1", "t.j")})),
      (acc, x) -> acc + x) AS BIGINT) AS pv
  FROM codes CROSS JOIN range(0, {RP_OUT_DIM}) t(j)
), parr AS (
  SELECT vec_id, array_agg(pv ORDER BY j) AS p FROM proj GROUP BY vec_id
), fullrank AS (
  SELECT a.vec_id AS query_id, b.vec_id, {dot_q} AS dot_q,
    row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY {dot_q} DESC, b.vec_id) AS frnk
  FROM codes a JOIN codes b ON a.vec_id < {_RP_NQ} AND a.vec_id != b.vec_id
), projrank AS (
  SELECT a.vec_id AS query_id, b.vec_id, {dot_p} AS dot_p,
    row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY {dot_p} DESC, b.vec_id) AS rnk
  FROM parr a JOIN parr b ON a.vec_id < {_RP_NQ} AND a.vec_id != b.vec_id
)
SELECT p.query_id, p.vec_id, p.dot_p, p.rnk,
  coalesce(f.frnk <= {_RP_K}, false) AS in_full_topk
FROM projrank p
LEFT JOIN fullrank f ON f.query_id = p.query_id AND f.vec_id = p.vec_id
WHERE p.rnk <= {_RP_K}
ORDER BY p.query_id, p.rnk
"""


@register("emb_rp_topk", oracle=_rp_oracle())
def emb_rp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: Johnson-Lindenstrauss random projection ANN
    (operators/randproj.py) — 64-dim int8 codes projected to 16 dims by
    the md5 +-1 sign matrix (one map-side Arrow int64 matmul, zero
    shuffle), brute top-{_RP_K} by exact integer dot in PROJECTED space
    (4x cheaper per pair), with membership in the full-dimensional
    integer-dot top-{_RP_K} joined alongside as the in-query recall
    audit. All arithmetic is exact BIGINT, so projection, both
    rankings, and the recall flag replay bit-for-bit in SQL."""
    from pyspark.sql import Window

    from whisper_pandas_spark.operators.kmeans import int8_codes
    from whisper_pandas_spark.operators.randproj import (
        RP_OUT_DIM,
        rp_project_int8,
    )

    emb = _table(spark, sf_dir, "embeddings")
    codes = int8_codes(emb, "vec_id", "embedding").localCheckpoint(eager=True)
    proj = rp_project_int8(
        emb, "vec_id", "embedding", _RP_IN_DIM, RP_OUT_DIM
    ).localCheckpoint(eager=True)

    def topk(df: DataFrame, vcol: str, n: int, out_dot: str, out_rnk: str):
        q = df.filter(F.col("vec_id") < _RP_NQ).select(
            F.col("vec_id").alias("query_id"), F.col(vcol).alias("qv")
        )
        dot = F.expr(
            f"aggregate(zip_with(qv, {vcol}, (x, y) -> x * y), 0L,"
            " (acc, v) -> acc + v)"
        )
        scored = (
            df.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", dot.alias(out_dot))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col(out_dot).desc(), F.col("vec_id")
        )
        return scored.withColumn(out_rnk, F.row_number().over(w))

    pr = topk(proj, "p", RP_OUT_DIM, "dot_p", "rnk").filter(
        F.col("rnk") <= _RP_K
    )
    fr = topk(codes, "q", _RP_IN_DIM, "dot_q", "frnk").filter(
        F.col("frnk") <= _RP_K
    ).select("query_id", "vec_id", F.lit(True).alias("__in"))
    return (
        pr.join(fr, ["query_id", "vec_id"], "left")
        .select(
            "query_id", "vec_id", "dot_p", "rnk",
            F.coalesce("__in", F.lit(False)).alias("in_full_topk"),
        )
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# text_kn_trigram_score
# ---------------------------------------------------------------------------


def _kn_oracle() -> str:
    from whisper_pandas_spark.operators.knlm import BOS, EOS, KN_DISCOUNT

    d = repr(KN_DISCOUNT)
    return f"""
WITH seqs AS (
  SELECT doc_id,
    list_concat(list_concat(['{BOS}', '{BOS}'],
      list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),
        '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> '')),
      ['{EOS}']) AS seq
  FROM documents
), tri AS (
  SELECT doc_id, CAST(i + 2 AS BIGINT) AS pos,
    seq[CAST(i AS INT)] AS w1,
    seq[CAST(i + 1 AS INT)] AS w2,
    seq[CAST(i + 2 AS INT)] AS w3
  FROM seqs, unnest(range(1, len(seq) - 1)) AS t(i)
), c123 AS (
  SELECT w1, w2, w3, count(*) AS c123 FROM tri GROUP BY w1, w2, w3
), ctx12 AS (
  SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12,
         count(*) AS n1p_12dot
  FROM c123 GROUP BY w1, w2
), n1p23 AS (
  SELECT w2, w3, count(*) AS n1p_dot23 FROM c123 GROUP BY w2, w3
), mid AS (
  SELECT w2, count(*) AS n1p_dot2dot,
         count(DISTINCT w3) AS n1p_2dot
  FROM c123 GROUP BY w2
), cont AS (
  SELECT w3, count(*) AS n1p_dotw3 FROM n1p23 GROUP BY w3
), nt AS (
  SELECT count(*) AS n_bigram_types FROM n1p23
), scored AS (
  SELECT t.doc_id, t.pos,
    ln(
      greatest(CAST(c.c123 AS DOUBLE) - {d}, 0.0) / CAST(x.c12 AS DOUBLE)
      + (({d} * CAST(x.n1p_12dot AS DOUBLE)) / CAST(x.c12 AS DOUBLE))
        * (
          greatest(CAST(b.n1p_dot23 AS DOUBLE) - {d}, 0.0)
            / CAST(m.n1p_dot2dot AS DOUBLE)
          + (({d} * CAST(m.n1p_2dot AS DOUBLE))
             / CAST(m.n1p_dot2dot AS DOUBLE))
            * (CAST(u.n1p_dotw3 AS DOUBLE) / CAST(nt.n_bigram_types AS DOUBLE))
        )
    ) AS lp
  FROM tri t
  JOIN c123 c USING (w1, w2, w3)
  JOIN ctx12 x USING (w1, w2)
  JOIN n1p23 b USING (w2, w3)
  JOIN mid m USING (w2)
  JOIN cont u USING (w3)
  CROSS JOIN nt
)
SELECT doc_id, count(*) AS n_trigrams,
  round(list_reduce(list_prepend(0.0::DOUBLE, array_agg(lp ORDER BY pos)),
        (a, x) -> a + x), 6) AS logprob
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@register("text_kn_trigram_score", oracle=_kn_oracle())
def text_kn_trigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: interpolated Kneser-Ney trigram LM (operators/knlm.py) —
    the corpus trains the model and scores every document in one plan,
    the CCNet-class perplexity quality signal with the real smoothing
    machinery (absolute discounting, CONTINUATION counts for the lower
    orders, two-level interpolation). All six count tables are
    vocab-bounded grouped aggregates of the padded trigram stream
    (winnowing's posexplode+lead idiom, codegen); scoring joins the
    stream back on its keys; the per-doc reduction is an order-pinned
    ln-probability fold (bit-parity doubles). The oracle replays
    counts, the exact arithmetic tree, and the ordered fold."""
    from whisper_pandas_spark.operators.knlm import kn_trigram_score

    docs = _table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return kn_trigram_score(docs, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# text_span_corruption
# ---------------------------------------------------------------------------


def _span_oracle() -> str:
    from whisper_pandas_spark.operators.spancorrupt import (
        BLOCK,
        EOS_TOKEN,
        SPAN_LEN,
    )

    b, sl = BLOCK, SPAN_LEN
    off = (
        f"(('0x' || substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':'"
        f" || CAST(i // {b} AS VARCHAR)), 1, 15))::BIGINT % {b - sl + 1})"
    )
    mask = (
        f"CASE WHEN ((i // {b}) * {b} + {b} <= len(t))"
        f" AND (i % {b}) >= {off} AND (i % {b}) < {off} + {sl}"
        f" THEN (i // {b}) + 1 ELSE 0 END"
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),
      '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS t
  FROM documents
), marked AS (
  SELECT doc_id, t, CAST(len(t) AS INT) AS n_tokens,
    list_transform(range(0, len(t)), i -> {mask}) AS m,
    list_transform(range(0, len(t)), i -> {off}) AS offs
  FROM toks
)
SELECT doc_id, n_tokens,
  CAST(len(list_filter(m, v -> v <> 0)) AS INT) AS n_masked,
  CAST(len(list_distinct(list_filter(m, v -> v <> 0))) AS INT) AS n_spans,
  coalesce(array_to_string(list_filter(
    list_transform(range(0, len(t)), i ->
      CASE WHEN m[CAST(i + 1 AS INT)] = 0 THEN t[CAST(i + 1 AS INT)]
           WHEN i % {b} = offs[CAST(i + 1 AS INT)]
             THEN '<X_' || m[CAST(i + 1 AS INT)] || '>'
           ELSE '' END), x -> x <> ''), ' '), '') AS input_text,
  coalesce(array_to_string(list_filter(
    list_transform(range(0, len(t)), i ->
      CASE WHEN m[CAST(i + 1 AS INT)] = 0 THEN ''
           WHEN i % {b} = offs[CAST(i + 1 AS INT)]
             THEN '<X_' || m[CAST(i + 1 AS INT)] || '> '
                  || t[CAST(i + 1 AS INT)]
           ELSE t[CAST(i + 1 AS INT)] END), x -> x <> ''), ' '), '')
  || CASE WHEN len(list_filter(m, v -> v <> 0)) > 0 THEN ' ' ELSE '' END
  || '{EOS_TOKEN}' AS target_text
FROM marked ORDER BY doc_id
"""


@register("text_span_corruption", oracle=_span_oracle())
def text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: T5-style span corruption (operators/spancorrupt.py) — the
    seq2seq pre-training data-prep step: block-randomized masked spans
    (md5-driven placement — no RNG state, resume-safe, engine-
    replayable; same 15% corruption rate as T5's iid sampling),
    sentinel-tokened (input, target) pair per document. One
    zero-shuffle projection; the oracle replays block arithmetic, md5
    offsets, and both output sequences verbatim."""
    from whisper_pandas_spark.operators.spancorrupt import span_corrupt

    docs = _table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return span_corrupt(docs, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# emb_pca_top_component
# ---------------------------------------------------------------------------

_PCA_DIM = 64


def _pca_stages() -> str:
    """Shared WITH-prefix: codes -> centered codes -> exact int64 Gram ->
    unrolled power iteration -> the top-component array `va` (and the
    final norm `n_<iters>`). Reused by _pca_oracle and _abtt_oracle —
    same generator, so the two entries can never drift."""
    from whisper_pandas_spark.operators.pca import PCA_ITERS
    from whisper_pandas_spark.queries_embeddings import _duck_codes, _duck_scale

    n = _PCA_DIM
    fold = "list_reduce(list_prepend(0.0::DOUBLE, {arr}), (x, y) -> x + y)"
    stages = []
    prev = "v_0"
    for k in range(1, PCA_ITERS + 1):
        wagg = fold.format(
            arr="array_agg(CAST(c.c AS DOUBLE) * v.val ORDER BY c.b)"
        )
        nagg = fold.format(arr="array_agg(wv * wv ORDER BY dim)")
        stages.append(f"""w_{k} AS MATERIALIZED (
  SELECT c.a AS dim, {wagg} AS wv
  FROM cmat c JOIN {prev} v ON v.dim = c.b
  GROUP BY c.a
),
n_{k} AS MATERIALIZED (
  SELECT sqrt({nagg}) AS nv FROM w_{k}
),
v_{k} AS MATERIALIZED (
  SELECT dim, wv / nv AS val FROM w_{k} CROSS JOIN n_{k}
)""")
        prev = f"v_{k}"
    stage_sql = ",\n".join(stages)
    return f"""codes AS MATERIALIZED (
  SELECT vec_id, {_duck_codes("embedding", _duck_scale("embedding"))} AS q
  FROM embeddings
), mu AS MATERIALIZED (
  SELECT CAST(t.d AS INT) AS d,
    CAST(floor(CAST(CAST(sum(q[CAST(t.d + 1 AS INT)]) AS BIGINT) AS DOUBLE)
               / count(*)) AS BIGINT) AS mu
  FROM codes CROSS JOIN range(0, {n}) t(d) GROUP BY t.d
), mua AS (
  SELECT array_agg(mu ORDER BY d) AS m FROM mu
), qcs AS MATERIALIZED (
  SELECT vec_id,
    list_transform(range(1, {n} + 1),
      i -> q[CAST(i AS INT)] - m[CAST(i AS INT)]) AS qc
  FROM codes CROSS JOIN mua
), cmat AS MATERIALIZED (
  SELECT CAST(a.d AS INT) AS a, CAST(b.d AS INT) AS b,
    CAST(sum(qc[CAST(a.d + 1 AS INT)] * qc[CAST(b.d + 1 AS INT)]) AS BIGINT)
      AS c
  FROM qcs CROSS JOIN range(0, {n}) a(d) CROSS JOIN range(0, {n}) b(d)
  GROUP BY 1, 2
), v_0 AS (
  SELECT CAST(d AS INT) AS dim, 0.125::DOUBLE AS val FROM range(0, {n}) t(d)
),
{stage_sql},
va AS (
  SELECT array_agg(val ORDER BY dim) AS v FROM v_{PCA_ITERS}
)
"""


def _pca_fold(arr: str) -> str:
    return f"list_reduce(list_prepend(0.0::DOUBLE, {arr}), (x, y) -> x + y)"


def _pca_proj_sql() -> str:
    n = _PCA_DIM
    return _pca_fold(
        f"list_transform(range(1, {n} + 1),"
        " i -> CAST(qc[CAST(i AS INT)] AS DOUBLE) * va.v[CAST(i AS INT)])"
    )


def _pca_oracle() -> str:
    from whisper_pandas_spark.operators.pca import PCA_ITERS

    return f"""
WITH {_pca_stages()}
SELECT q.vec_id, round({_pca_proj_sql()}, 6) AS proj,
  round((SELECT nv FROM n_{PCA_ITERS}), 6) AS eig
FROM qcs q CROSS JOIN va
ORDER BY q.vec_id
"""


@register("emb_pca_top_component", oracle=_pca_oracle())
def emb_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: corpus top principal component by power iteration
    (operators/pca.py) — the all-but-the-top / whitening primitive:
    centered int8 codes (exact BIGINT), exact int64 Gram matrix via
    per-batch Arrow matmuls + one bounded exchange, driver-side
    left-to-right-fold power iteration from v0 = 1/8, and a map-side
    dimension-sequential Arrow projection pass — every double matches
    the SQL replay bit-for-bit (the oracle unrolls all iterations as
    materialized CTE stages with ORDER BY folds)."""
    from whisper_pandas_spark.operators.pca import pca_top_component

    emb = _table(spark, sf_dir, "embeddings")
    return pca_top_component(emb, "vec_id", "embedding", _PCA_DIM).orderBy(
        "vec_id"
    )


# ---------------------------------------------------------------------------
# emb_abtt_topk
# ---------------------------------------------------------------------------

_ABTT_K = 10
_ABTT_NQ = 5


def _abtt_oracle() -> str:
    n = _PCA_DIM
    proj = _pca_proj_sql()
    dot = _pca_fold(
        f"list_transform(range(1, {n} + 1),"
        " i -> qq.a[CAST(i AS INT)] * dd.a[CAST(i AS INT)])"
    )
    return f"""
WITH {_pca_stages()},
pr AS MATERIALIZED (
  SELECT q.vec_id, q.qc, {proj} AS proj FROM qcs q CROSS JOIN va
),
qa AS MATERIALIZED (
  SELECT p.vec_id,
    list_transform(range(1, {n} + 1),
      i -> CAST(p.qc[CAST(i AS INT)] AS DOUBLE)
           - p.proj * va.v[CAST(i AS INT)]) AS a
  FROM pr p CROSS JOIN va
),
scored AS (
  SELECT qq.vec_id AS query_id, dd.vec_id, {dot} AS rawdot
  FROM qa qq JOIN qa dd
    ON qq.vec_id < {_ABTT_NQ} AND qq.vec_id != dd.vec_id
), ranked AS (
  SELECT query_id, vec_id, rawdot,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY rawdot DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id, round(rawdot, 6) AS dot, rnk
FROM ranked WHERE rnk <= {_ABTT_K}
ORDER BY query_id, rnk
"""


@register("emb_abtt_topk", oracle=_abtt_oracle())
def emb_abtt_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: all-but-the-top corrected similarity (Mu & Viswanath 2018)
    — the standard embedding post-processing: remove the corpus top
    component (operators/pca.py:abtt_correct, pinned arithmetic over
    centered int8 codes) and rank by dot product in the CORRECTED
    space. Completes the PCA story: emb_pca_top_component finds the
    common direction, this entry searches without it. Every double
    (projection, correction, pairwise dots, ranking) replays
    bit-for-bit via the shared _pca_stages oracle prefix."""
    from pyspark.sql import Window

    from whisper_pandas_spark.operators.pca import abtt_correct

    emb = _table(spark, sf_dir, "embeddings")
    qa = abtt_correct(emb, "vec_id", "embedding", _PCA_DIM).localCheckpoint(
        eager=True
    )
    q = qa.filter(F.col("vec_id") < _ABTT_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("a").alias("qv")
    )
    dot = F.expr(
        "aggregate(zip_with(qv, a, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, x) -> acc + x)"
    )
    scored = qa.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select("query_id", "vec_id", dot.alias("rawdot"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rawdot").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ABTT_K)
        .select(
            "query_id", "vec_id", F.round("rawdot", 6).alias("dot"), "rnk"
        )
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# dedup_winnow_pairs
# ---------------------------------------------------------------------------
# Fixture: every document gets a planted 10-token snippet appended;
# docs 2i and 2i+1 share snippet p<i> (tokens p<i>x0..p<i>x9 — pairwise
# distinct across pairs), so each adjacent pair shares a >= w+k-1-token
# run and the winnowing guarantee forces at least one shared
# fingerprint. The overlap readout joins fingerprints (equi-join on the
# hash value, stop-fingerprint guard) and counts shared selections.

_WINNOW_MIN_SHARED = 1
_WINNOW_MAX_FP_DOCS = 64

_WINNOW_PAIR_SOURCE = """
  SELECT doc_id,
    text || ' ' || array_to_string(list_transform(range(0, 10),
      j -> 'p' || CAST(doc_id // 2 AS VARCHAR) || 'x'
           || CAST(j AS VARCHAR)), ' ') AS text
  FROM documents
"""


def _winnow_pairs_oracle() -> str:
    return f"""
WITH {_winnow_sel_sql(_WINNOW_PAIR_SOURCE)},
dfps AS (
  SELECT DISTINCT doc_id, fp FROM selected
), keepfp AS (
  SELECT fp FROM dfps GROUP BY fp
  HAVING count(*) <= {_WINNOW_MAX_FP_DOCS}
), kept AS (
  SELECT d.doc_id, d.fp FROM dfps d JOIN keepfp USING (fp)
)
SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
  CAST(count(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {_WINNOW_MIN_SHARED}
ORDER BY doc_i, doc_j
"""


@register("dedup_winnow_pairs", oracle=_winnow_pairs_oracle())
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+: the MOSS overlap readout (operators/winnow.py:
    winnow_overlap_pairs) — document pairs ranked by shared winnowing
    fingerprints: an equi-join on the fingerprint VALUE (never
    all-pairs) over per-doc distinct selections, with the
    stop-fingerprint guard (max_fp_docs — the stopword/skew analogue of
    the LSH max_bucket caps) bounding any hash value's fan-out. The
    planted snippet pairs exercise the paper's guarantee end to end:
    every >= w+k-1-token shared run surfaces as a pair."""
    from whisper_pandas_spark.functions.text import tokenize
    from whisper_pandas_spark.operators.winnow import (
        winnow_fingerprints_arrow,
        winnow_overlap_pairs,
    )

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "concat(text, ' ', array_join(transform(sequence(0, 9),"
            " j -> concat('p', cast(doc_id div 2 as string), 'x',"
            " cast(j as string))), ' '))"
        ).alias("text"),
    )
    toked = docs.select("doc_id", tokenize("text").alias("toks"))
    # the Arrow variant skips the window form's (id, pos) sort — the
    # overlap join is order-independent
    fps = winnow_fingerprints_arrow(
        toked, "doc_id", "toks", k=_WINNOW_K, w=_WINNOW_W
    )
    return winnow_overlap_pairs(
        fps,
        "doc_id",
        min_shared=_WINNOW_MIN_SHARED,
        max_fp_docs=_WINNOW_MAX_FP_DOCS,
    )


# ---------------------------------------------------------------------------
# ingest_xml_roundtrip
# ---------------------------------------------------------------------------


@register(
    "ingest_xml_roundtrip",
    oracle="""
SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id
""",
)
def ingest_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+: documents -> XML sink -> explicit-schema tolerant scan
    (sources/ingest.py:read_xml/write_xml, Spark 4's built-in XML
    source) — the enterprise-interchange sibling of the
    JSONL/CSV/ORC round trips. Losslessness IS the assertion: the
    oracle reads the original parquet, so any entity-escaping or
    whitespace drift in the XML encode/decode chain hash-fails."""
    import hashlib
    import tempfile
    from pathlib import Path

    from whisper_pandas_spark.sources.ingest import read_xml, write_xml

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = Path(tempfile.gettempdir()) / f"wps_xml_{tag}"
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    write_xml(docs, str(out))
    back = read_xml(
        spark,
        str(out),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return back.orderBy("doc_id")


# ---------------------------------------------------------------------------
# emb_hard_negatives
# ---------------------------------------------------------------------------
# Contrastive-training prep: for each query vector, the top-k NEAREST
# vectors with a DIFFERENT label (hard negatives — the pairs that teach
# a contrastive model the most; Robinson et al. 2021). Exact integer
# code dots (the emb_int8_topk arithmetic) + the label predicate INSIDE
# the join condition, so excluded same-label pairs never rank.

_HN_K = 5
_HN_NQ = 5


def _hn_oracle() -> str:
    from whisper_pandas_spark.queries_embeddings import _duck_codes, _duck_scale

    dot = (
        "CAST(list_reduce(list_prepend(0::BIGINT,"
        " list_transform(range(1, 65),"
        " i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])),"
        " (acc, x) -> acc + x) AS BIGINT)"
    )
    return f"""
WITH codes AS (
  SELECT vec_id, label,
    {_duck_codes("embedding", _duck_scale("embedding"))} AS q
  FROM embeddings
), scored AS (
  SELECT a.vec_id AS query_id, a.label AS query_label,
         b.vec_id, b.label AS neg_label, {dot} AS dot_q
  FROM codes a JOIN codes b
    ON a.vec_id < {_HN_NQ} AND a.label != b.label
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dot_q DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, query_label, vec_id, neg_label, dot_q, rnk
FROM ranked WHERE rnk <= {_HN_K}
ORDER BY query_id, rnk
"""


@register("emb_hard_negatives", oracle=_hn_oracle())
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: hard-negative mining for contrastive training — per query,
    the top-{_HN_K} NEAREST vectors with a DIFFERENT label (exact
    integer code dots; the label predicate lives in the join condition,
    so same-label pairs never materialize). Broadcast query side,
    per-query rank — the sim_topk reduction with a semantic filter."""
    from pyspark.sql import Window

    from whisper_pandas_spark.operators.kmeans import int8_codes

    emb = _table(spark, sf_dir, "embeddings")
    codes = int8_codes(emb, "vec_id", "embedding").join(
        emb.select("vec_id", "label"), "vec_id"
    )
    q = codes.filter(F.col("vec_id") < _HN_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("q").alias("qv"),
    )
    dot = F.expr(
        "aggregate(zip_with(qv, q, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
    )
    scored = codes.join(
        F.broadcast(q), F.col("label") != F.col("query_label")
    ).select(
        "query_id", "query_label", "vec_id",
        F.col("label").alias("neg_label"), dot.alias("dot_q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_q").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _HN_K)
        .select("query_id", "query_label", "vec_id", "neg_label",
                "dot_q", "rnk")
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# sample_group_split
# ---------------------------------------------------------------------------
# Leakage-free GROUPED split: the split key is the registered DOMAIN,
# not the document — all of a domain's documents land in the same
# split (near-duplicate pages within a crawl domain would otherwise
# leak across train/test and inflate eval). The in-query audit column
# proves it: every domain's doc-distinct split count is 1.


@register(
    "sample_group_split",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source || '.com' AS reg_domain FROM documents
), assigned AS (
  SELECT doc_id, reg_domain,
    CASE WHEN ('0x' || substr(md5('0:' || reg_domain), 1, 8))::BIGINT
              < {int(0.2 * (1 << 32))} THEN 'test' ELSE 'train' END AS split
  FROM keyed
)
SELECT split, count(*) AS n_docs,
  count(DISTINCT reg_domain) AS n_domains,
  CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM assigned GROUP BY split ORDER BY split
""",
)
def sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline +: leakage-free GROUPED train/test split — the split is
    a pure function of the DOMAIN key (operators/sampling.py:
    split_assign on reg_domain), so every domain's documents land in
    one split and near-duplicate pages cannot straddle train/test (the
    grouped analogue of sample_train_test_split; group-integrity is
    pytest-pinned). Zero extra shuffles: the md5 bucket rides the
    scan, the summary is one aggregation."""
    from whisper_pandas_spark.operators.sampling import split_assign
    from whisper_pandas_spark.operators.urlkey import url_key_df

    docs = _table(spark, sf_dir, "documents").select("doc_id", "source")
    urls = docs.withColumn(
        "url",
        F.concat(F.lit("https://www."), F.col("source"),
                 F.lit(".com/doc/"), F.col("doc_id").cast("string")),
    )
    keyed = url_key_df(urls, "url").select("doc_id", "reg_domain")
    assigned = split_assign(keyed, "reg_domain", test_fraction=0.2)
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("reg_domain").alias("n_domains"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# text_fim_transform
# ---------------------------------------------------------------------------
# Fill-in-the-middle (Bavarian et al. 2022 "Efficient Training of
# Language Models to Fill in the Middle"): reorder each document into
# PSM form — <PRE> prefix <SUF> suffix <MID> middle — at a 50% apply
# rate, so the model learns infilling without losing left-to-right
# ability. Deterministic variant: the apply gate and both cut points
# are md5 functions of doc_id (no RNG state, resume-safe — the span-
# corruption convention). Cut points: c1 = h1 % (n+1),
# c2 = c1 + h2 % (n - c1 + 1) over the token sequence.

_FIM_PRE, _FIM_SUF, _FIM_MID = "<fim_pre>", "<fim_suf>", "<fim_mid>"


def _fim_h(tag: str, doc_sql: str, spark: bool) -> str:
    if spark:
        return (
            f"cast(conv(substring(md5(concat('{tag}:',"
            f" cast({doc_sql} as string))), 1, 15), 16, 10) as bigint)"
        )
    return (
        f"('0x' || substr(md5('{tag}:' || CAST({doc_sql} AS VARCHAR)),"
        " 1, 15))::BIGINT"
    )


def _fim_oracle() -> str:
    h0 = _fim_h("fim0", "doc_id", False)
    h1 = _fim_h("fim1", "doc_id", False)
    h2 = _fim_h("fim2", "doc_id", False)
    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),
      '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS t
  FROM documents
), cuts AS (
  SELECT doc_id, t, len(t) AS n,
    ({h0} % 2 = 0) AS fim_applied,
    CAST({h1} % (len(t) + 1) AS BIGINT) AS c1
  FROM toks
), cuts2 AS (
  SELECT *, c1 + CAST({h2} % (n - c1 + 1) AS BIGINT) AS c2 FROM cuts
)
SELECT doc_id, fim_applied,
  CAST(CASE WHEN fim_applied THEN c1 ELSE n END AS INT) AS n_prefix,
  CAST(CASE WHEN fim_applied THEN c2 - c1 ELSE 0 END AS INT) AS n_middle,
  CAST(CASE WHEN fim_applied THEN n - c2 ELSE 0 END AS INT) AS n_suffix,
  CASE WHEN fim_applied THEN
    '{_FIM_PRE} '
    || coalesce(array_to_string(t[1:CAST(c1 AS INT)], ' '), '')
    || ' {_FIM_SUF} '
    || coalesce(array_to_string(
         t[CAST(c2 + 1 AS INT):CAST(n AS INT)], ' '), '')
    || ' {_FIM_MID} '
    || coalesce(array_to_string(
         t[CAST(c1 + 1 AS INT):CAST(c2 AS INT)], ' '), '')
  ELSE coalesce(array_to_string(t, ' '), '') END AS fim_text
FROM cuts2 ORDER BY doc_id
"""


@register("text_fim_transform", oracle=_fim_oracle())
def text_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: fill-in-the-middle data prep (Bavarian et al. 2022) — PSM
    reordering (<PRE> prefix <SUF> suffix <MID> middle) at a 50% apply
    rate with md5-driven cut points (no RNG state, resume-safe; the
    span-corruption determinism convention). One zero-shuffle
    projection; the oracle replays gates, cut arithmetic, and the
    reordered text verbatim."""
    from whisper_pandas_spark.functions.text import tokenize

    h0 = _fim_h("fim0", "doc_id", True)
    h1 = _fim_h("fim1", "doc_id", True)
    h2 = _fim_h("fim2", "doc_id", True)
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", tokenize("text").alias("t0")
    ).select(
        "doc_id", F.expr("filter(t0, x -> x != '')").alias("t")
    ).select(
        "doc_id",
        "t",
        F.size("t").alias("n"),
        F.expr(f"({h0} % 2) = 0").alias("fim_applied"),
        F.expr(f"{h1} % (size(t) + 1)").alias("c1"),
    ).select(
        "*",
        F.expr(f"c1 + ({h2} % (n - c1 + 1))").alias("c2"),
    )
    join_slice = (
        "array_join(slice(t, {start}, {length}), ' ')"
    )
    pre = join_slice.format(start="1", length="cast(c1 as int)")
    mid = join_slice.format(
        start="cast(c1 + 1 as int)", length="cast(c2 - c1 as int)"
    )
    suf = join_slice.format(
        start="cast(c2 + 1 as int)", length="cast(n - c2 as int)"
    )
    return docs.select(
        "doc_id",
        "fim_applied",
        F.expr("cast(IF(fim_applied, c1, n) as int)").alias("n_prefix"),
        F.expr("cast(IF(fim_applied, c2 - c1, 0) as int)").alias("n_middle"),
        F.expr("cast(IF(fim_applied, n - c2, 0) as int)").alias("n_suffix"),
        F.expr(
            f"IF(fim_applied,"
            f" concat('{_FIM_PRE} ', {pre}, ' {_FIM_SUF} ', {suf},"
            f" ' {_FIM_MID} ', {mid}),"
            " array_join(t, ' '))"
        ).alias("fim_text"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# stream_kn_replay
# ---------------------------------------------------------------------------


@register("stream_kn_replay", oracle=None)  # shares the batch KN oracle below
def stream_kn_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+: streaming LM-statistics maintenance (streaming/sketches.py:
    stream_kn_counts_update) replayed end-to-end — the corpus streams
    through foreachBatch as two document files, each batch's trigram
    counts elementwise-SUM-merged into the versioned (w1,w2,w3,c123)
    state (ADDITIVE law -> exactly-once via checkpoint-scoped batch
    markers, the CMS contrast to the idempotent Bloom/HLL maintainers),
    then the WHOLE corpus is scored against the final state
    (operators/knlm.py:kn_score_from_counts). Exactly-once merging
    makes stream state == batch counts bit-for-bit, so this shares
    `text_kn_trigram_score`'s oracle — one hash gate proving batch
    counting, additive merges, version flips, AND the scoring readout
    over live-maintained statistics."""
    import tempfile

    from whisper_pandas_spark.operators.knlm import (
        kn_score_from_counts,
        trigram_stream,
    )
    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.streaming.sketches import stream_kn_counts_update

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="wps_knstream_")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        f"{d}/changes/f1"
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        f"{d}/changes/f2"
    )
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/changes/*")
    )
    q = stream_kn_counts_update(
        sdf, f"{d}/state", "doc_id", "text", checkpoint_dir=f"{d}/ckpt"
    )
    q.processAllAvailable()
    q.stop()
    c123 = spark.read.parquet(current_version_path(f"{d}/state"))
    tri = trigram_stream(docs, "doc_id", "text").localCheckpoint(eager=True)
    return kn_score_from_counts(tri, c123, "doc_id").orderBy("doc_id")


_ORACLES["stream_kn_replay"] = _kn_oracle()
