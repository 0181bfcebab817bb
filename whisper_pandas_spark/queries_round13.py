"""Registry entries: round 13 (post-VERDICT-r12 extension wave).

- text_compression_ratio        per-document zlib compression ratio — the
                                cheap RefinedWeb/Dolma-style gibberish &
                                boilerplate screen (two-sided gate)
- dedup_duplicate_spans_bytes   Lee et al. ExactSubstr over the RAW UTF-8
                                byte stream (hex image) — catches
                                cross-tokenization duplicates the word
                                form misses
- pipeline_multimodal_curation  image+caption pair curation: a pair
                                survives iff its image survives dHash
                                canonicalization AND its caption survives
                                exact text dedup — the cross-modal
                                composition of two independently-green
                                operators

No reference-repo parity: whisper_pandas (reference, 299-line .wsp
decoder) has no text/image surface; these back SURVEY.md §2 extension
rows Y145-Y147.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register

# ---------------------------------------------------------------------------
# text_compression_ratio
# ---------------------------------------------------------------------------
# zlib is a deterministic byte function no SQL engine exposes, so the
# oracle pins the exact per-document compressed byte counts — computed
# INDEPENDENTLY driver-side over the same parquet at oracle-build time
# (the queries_whisper geometry-VALUES precedent) — and replays raw
# lengths and all ratio/flag arithmetic in SQL. What the hash gate then
# verifies is exactly the distributed claim: partitioning, Arrow
# batching, row alignment, and the shared rounded-ratio/flag
# expressions. The fixture plants both pathological tails so the gate
# exercises BOTH flags: doc_id % 31 == 7 repeats one sentence
# (compresses far below the lo threshold); doc_id % 43 == 11 becomes
# md5-derived iid printable-ASCII noise (each hex byte pair maps to
# chr(33 + b % 94) — ~6.5 bits/char entropy, ratio ~0.85-0.9, above
# the hi threshold; raw md5 HEX would not work: a 16-symbol alphabet
# compresses to ~0.56).

_COMPRATIO_NOISE_MD5S = 40  # 40 md5s -> 640 noise chars per doc


def _compratio_fixture(docs: DataFrame) -> DataFrame:
    """(doc_id, t) — the fixture corpus. Two-stage projection: the
    40-md5 noise hex materializes into its OWN column first (the
    word_shingles PERF CONTRACT — an inline reference inside the
    per-char lambda would re-evaluate the whole concat per element),
    guarded by the same condition as its consumer (the
    CSE-before-filter trap). The consumer tests ``nh != ''`` instead
    of repeating the ``% 43`` predicate so that ``nh`` is referenced
    TWICE — CollapseProject inlines a once-referenced alias into the
    lambda body, which re-ran the inner 40-md5 transform per character
    (measured 4.7 s of pure fixture at sf0.1; double-reference keeps
    the barrier and the fixture drops to scan cost)."""
    noise_hex = (
        f"IF(doc_id % 43 = 11,"
        f" array_join(transform(sequence(0, {_COMPRATIO_NOISE_MD5S - 1}),"
        " i -> md5(concat('noise:', cast(doc_id as string), ':',"
        " cast(i as string)))), ''), '')"
    )
    printable = (
        f"array_join(transform(sequence(0, {_COMPRATIO_NOISE_MD5S * 16 - 1}),"
        " j -> char(33 + cast(conv(substring(nh, j * 2 + 1, 2),"
        " 16, 10) as int) % 94)), '')"
    )
    case = (
        "CASE WHEN doc_id % 31 = 7 THEN"
        " repeat('the same boilerplate sentence repeats endlessly here. ', 40)"
        f" WHEN nh != '' THEN {printable}"
        " ELSE text END"
    )
    return docs.select(
        "doc_id", "text", F.expr(noise_hex).alias("nh")
    ).select("doc_id", F.expr(case).alias("t"))


_COMPRATIO_FIXTURE_DUCK = f"""
  CASE WHEN doc_id % 31 = 7 THEN
    repeat('the same boilerplate sentence repeats endlessly here. ', 40)
  WHEN doc_id % 43 = 11 THEN
    array_to_string(list_transform(range(0, {_COMPRATIO_NOISE_MD5S * 16}),
      j -> chr(33 + CAST(('0x' || substr(
             array_to_string(list_transform(range(0, {_COMPRATIO_NOISE_MD5S}),
               i -> md5('noise:' || CAST(doc_id AS VARCHAR) || ':'
                        || CAST(i AS VARCHAR))), ''),
             CAST(j * 2 + 1 AS INT), 2))::BIGINT % 94 AS INT))), '')
  ELSE text END
"""


def _compratio_oracle() -> str | None:
    """Build the VALUES-pinned oracle: per-doc zlib lengths computed
    driver-side (single pass, same pinned level the executors use) over
    the sweep's own parquet — SF-aware via ORACLE_SF_DIR so the
    sf0.001/sf0.1 re-check geometries stay valid.

    Runs at registry IMPORT time (decorator argument), so it must not
    crash a session that lacks the fixture: if the parquet is
    unreadable the entry degrades to the rows-only tier (oracle=None)
    instead of breaking every registry import."""
    import duckdb

    from whisper_pandas_spark.operators.compratio import (
        RATIO_HI,
        RATIO_LO,
        zlib_len,
    )

    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    try:
        rows = (
            duckdb.connect()
            .execute(
                f"""
                SELECT doc_id, {_COMPRATIO_FIXTURE_DUCK} AS t
                FROM read_parquet('{sf_dir}/documents.parquet')
                ORDER BY doc_id
                """
            )
            .fetchall()
        )
    except Exception:
        return None  # fixture absent: rows-only tier, import survives
    vals = ",".join(f"({i},{zlib_len(t)})" for i, t in rows)
    return f"""
WITH comp(doc_id, comp_len) AS (VALUES {vals}),
fix AS (
  SELECT doc_id, {_COMPRATIO_FIXTURE_DUCK} AS t FROM documents
), base AS (
  SELECT f.doc_id,
         octet_length(encode(f.t)) AS raw_len,
         c.comp_len
  FROM fix f JOIN comp c USING (doc_id)
), r AS (
  SELECT doc_id, raw_len, comp_len,
         floor(CAST(comp_len AS DOUBLE) / CAST(raw_len AS DOUBLE)
               * 1000000 + 0.5) / 1000000 AS ratio
  FROM base
)
SELECT doc_id, raw_len, comp_len, ratio,
       (ratio < {RATIO_LO}) AS too_repetitive,
       (ratio > {RATIO_HI}) AS too_random
FROM r ORDER BY doc_id
"""


@register("text_compression_ratio", oracle=_compratio_oracle())
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: per-document zlib compression ratio
    (operators/compratio.py) — the cheap two-sided quality gate
    curation pipelines run FIRST: too-compressible = repetitive
    boilerplate, incompressible = high-entropy non-text. One
    zero-shuffle Arrow pass; the oracle pins independently-computed
    compressed byte counts and replays the ratio/flag arithmetic."""
    from whisper_pandas_spark.operators.compratio import compression_ratio

    docs = _compratio_fixture(_table(spark, sf_dir, "documents"))
    return compression_ratio(docs, "doc_id", "t").orderBy("doc_id")


# ---------------------------------------------------------------------------
# dedup_duplicate_spans_bytes
# ---------------------------------------------------------------------------
# Same duplicated-span splice as dedup_duplicate_spans (buddy-group
# 12-token prefix + global boilerplate sentence), but the election runs
# over 24-BYTE windows of the raw UTF-8 stream (as its hex image).
# Byte windows catch duplicates the word form cannot see — pytest pins
# a cross-tokenization case — and here they also cut the same planted
# spans at byte granularity. The oracle replays the hex-space window
# hashes with an independent winner idiom (window row_number).

_BSPAN_W = 24

_BSPAN_ORACLE = f"""
WITH fix AS (
  SELECT d.doc_id,
         d.text || ' ' ||
         array_to_string(list_slice(string_split(b.text, ' '), 1, 12), ' ')
         || ' the quick brown fox jumps over the lazy dog again and again'
           AS text
  FROM documents d JOIN documents b ON b.doc_id = d.doc_id - d.doc_id % 10
), meta AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS INT) AS nb
  FROM fix
), winds AS (
  -- window starts derived per-document from nb (no fixed byte-length cap;
  -- scalar range() accepts column bounds where the table function cannot)
  SELECT doc_id, CAST(q AS INT) AS q,
         md5(substr(hx, CAST(q * 2 + 1 AS INT), {2 * _BSPAN_W})) AS h
  FROM (
    SELECT doc_id, hx, unnest(range(0, nb - {_BSPAN_W} + 1)) AS q
    FROM meta WHERE nb >= {_BSPAN_W}
  )
), marked AS (
  SELECT doc_id, q,
         count(*) OVER (PARTITION BY h) AS n_occ,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, q) AS rn
  FROM winds
), rem AS (
  SELECT DISTINCT doc_id, CAST(q + t.k AS INT) AS p
  FROM marked CROSS JOIN range(0, {_BSPAN_W}) AS t(k)
  WHERE n_occ > 1 AND rn > 1
), cells AS (
  SELECT doc_id, CAST(i AS INT) AS p,
         substr(hx, CAST(i * 2 + 1 AS INT), 2) AS b
  FROM (SELECT doc_id, hx, unnest(range(0, nb)) AS i FROM meta)
), kept AS (
  SELECT c.doc_id, c.p, c.b FROM cells c
  ANTI JOIN rem r ON c.doc_id = r.doc_id AND c.p = r.p
), agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(b, '' ORDER BY p) AS text_dedup_hex
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, nb AS n_bytes FROM meta
)
SELECT tot.doc_id, tot.n_bytes,
       CAST(tot.n_bytes - coalesce(agg.n_kept, 0) AS INT) AS n_removed,
       coalesce(agg.text_dedup_hex, '') AS text_dedup_hex
FROM tot LEFT JOIN agg USING (doc_id)
ORDER BY doc_id
"""


@register("dedup_duplicate_spans_bytes", oracle=_BSPAN_ORACLE)
def dedup_duplicate_spans_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 extension: byte-level ExactSubstr
    (operators/dedup.py:duplicate_span_removal_bytes — Lee et al. 2022
    operate on raw bytes). Window hashes are codegen
    md5(substring(hex)) projections over exploded starts (no
    higher-order lambdas); the election shuffles 16-byte hashes +
    (doc, pos) ids only. The oracle replays hex-space windows with a
    window row_number winner (independent idiom)."""
    from whisper_pandas_spark.operators.dedup import (
        duplicate_span_removal_bytes,
    )

    docs = _table(spark, sf_dir, "documents")
    buddy = docs.select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btext")
    )
    fix = (
        docs.join(
            buddy,
            (F.col("doc_id") - F.col("doc_id") % 10) == F.col("bid"),
        )
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.array_join(
                    F.slice(F.split(F.col("btext"), " ", -1), 1, 12), " "
                ),
                F.lit(
                    " the quick brown fox jumps over the lazy dog"
                    " again and again"
                ),
            ).alias("text"),
        )
    )
    return duplicate_span_removal_bytes(
        fix, "doc_id", "text", window=_BSPAN_W
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# pipeline_multimodal_curation
# ---------------------------------------------------------------------------
# The multimodal training-set curation step: image+caption PAIRS where
# a pair survives iff BOTH faces survive their modality's dedup —
# the image through dHash near-dup canonicalization
# (mm_phash_canonical's operator chain), the caption through exact
# min-id text dedup. Fixture: each even doc contributes pair A
# (pair_id = doc_id, base PGM image, caption = doc text) and pair B
# (pair_id = doc_id + 1_000_000, the PERTURBED near-dup image;
# caption = the SAME text when doc_id % 3 == 0, else text || ' v2') —
# so B's image face always loses to A, and B's caption face loses only
# in the % 3 == 0 stratum; the output funnel separates the two faces.

_MM_DUP_CAP_MOD = 3


def _mm_curation_oracle() -> str:
    from whisper_pandas_spark.queries_round12 import _PHASH_PAIRS_CTE

    return f"""
WITH RECURSIVE {_PHASH_PAIRS_CTE.lstrip().removeprefix("WITH ")},
edges AS (
  SELECT doc_i AS a, doc_j AS b FROM ph_pairs
  UNION
  SELECT doc_j AS a, doc_i AS b FROM ph_pairs
), reach AS (
  SELECT a AS node, a AS comp FROM edges
  UNION
  SELECT e.b AS node, r.comp FROM reach r JOIN edges e ON e.a = r.node
), comp AS (
  SELECT node, min(comp) AS comp FROM reach GROUP BY node
), pairs0 AS (
  SELECT doc_id AS pair_id, doc_id AS src_doc, 0 AS pert
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id + 1000000, doc_id, 1 FROM documents WHERE doc_id % 2 = 0
), caps AS (
  SELECT p.pair_id,
         CASE WHEN p.pert = 1 AND p.src_doc % {_MM_DUP_CAP_MOD} <> 0
              THEN d.text || ' v2' ELSE d.text END AS caption
  FROM pairs0 p JOIN documents d ON d.doc_id = p.src_doc
), img_drop AS (
  SELECT node AS pair_id FROM comp WHERE node <> comp
), cap_win AS (
  SELECT pair_id FROM (
    SELECT pair_id,
           row_number() OVER (PARTITION BY md5(caption)
                              ORDER BY pair_id) AS rn
    FROM caps
  ) WHERE rn = 1
)
SELECT p.pair_id,
  p.pair_id NOT IN (SELECT pair_id FROM img_drop) AS img_kept,
  p.pair_id IN (SELECT pair_id FROM cap_win) AS cap_kept,
  (p.pair_id NOT IN (SELECT pair_id FROM img_drop)
   AND p.pair_id IN (SELECT pair_id FROM cap_win)) AS kept
FROM pairs0 p ORDER BY pair_id
"""


@register("pipeline_multimodal_curation", oracle=_mm_curation_oracle())
def pipeline_multimodal_curation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X5/X1 composition: multimodal pair curation — keep an
    image+caption pair iff the image survives dHash near-dup
    canonicalization (phash_neardup_pairs -> connected components ->
    min-id canonical, the mm_phash_canonical chain) AND the caption
    survives exact min-id text dedup. Pure composition of two
    independently-green operators; the funnel (img_kept / cap_kept /
    kept per pair) is the checked value. Shuffle budget: the banded
    image pair join + pointer-doubling closure (both hash-bounded), one
    md5-keyed caption window, two id-only joins — captions and payloads
    never shuffle beyond their own keyed exchange."""
    from whisper_pandas_spark.operators.components import canonical_filter
    from whisper_pandas_spark.operators.multimodal import phash_neardup_pairs

    docs = _table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    base_px = F.expr(
        "array_join(transform(split(rpad(text, 288, text), ''),"
        " c -> char(ascii(c) % 128)), '')"
    )
    pert_px = F.expr(
        "array_join(transform(split(rpad(text, 288, text), ''),"
        " (c, i) -> char((ascii(c) % 128"
        "   + IF(i % 97 = 0, 3, 0)) % 128)), '')"
    )
    header = F.lit("P5\n18 16\n255\n")
    imgs = (
        docs.select(
            F.col("doc_id").alias("img_id"),
            F.encode(F.concat(header, base_px), "utf-8").alias("payload"),
        )
    ).unionByName(
        docs.select(
            (F.col("doc_id") + 1000000).alias("img_id"),
            F.encode(F.concat(header, pert_px), "utf-8").alias("payload"),
        )
    )
    pairs = phash_neardup_pairs(imgs, "img_id", max_hamming=6)
    from whisper_pandas_spark.stage import stage_materialize

    pairs_ck = stage_materialize(pairs)
    for c in getattr(pairs, "_wps_cached", []):
        c.unpersist()
    kept_imgs = canonical_filter(
        imgs.select("img_id"), pairs_ck, id_col="img_id"
    ).withColumnRenamed("img_id", "pair_id")

    pa = docs.select(
        F.col("doc_id").alias("pair_id"), F.col("text").alias("caption")
    )
    pb = docs.select(
        (F.col("doc_id") + 1000000).alias("pair_id"),
        F.when(F.col("doc_id") % _MM_DUP_CAP_MOD == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" v2")))
        .alias("caption"),
    )
    caps = pa.unionByName(pb)
    w = Window.partitionBy(F.md5(F.encode("caption", "utf-8"))).orderBy(
        "pair_id"
    )
    cap_win = (
        caps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pair_id")
    )
    all_pairs = caps.select("pair_id")
    out = (
        all_pairs.join(
            kept_imgs.withColumn("ik", F.lit(True)), "pair_id", "left"
        )
        .join(cap_win.withColumn("ck", F.lit(True)), "pair_id", "left")
        .select(
            "pair_id",
            F.coalesce(F.col("ik"), F.lit(False)).alias("img_kept"),
            F.coalesce(F.col("ck"), F.lit(False)).alias("cap_kept"),
            (
                F.coalesce(F.col("ik"), F.lit(False))
                & F.coalesce(F.col("ck"), F.lit(False))
            ).alias("kept"),
        )
    )
    return out.orderBy("pair_id")
