"""Round-7 registry entries.

- sketch_kll_rollup        KLL bounded-error mergeable quantile sketches
                           (unknown value range), exact-regime oracle
- merge_schema_evolution   add-only MERGE schema evolution across two
                           change batches (null-backfill, then a second
                           added column + deletes)
- mm_tiff_image_features   round-7 TIFF decoder end-to-end (constant
                           LE header + mod-128 plane, real IFD/strip
                           parse, integer-power-sum feature head)
- graphite_n_percentile    NIST rank pick at a fractional-rank q, so
                           the pre-r7 percentile_cont implementation
                           hash-mismatches (advisory fix gated)
- sketch_kmv_setops        KMV/theta set-operation sketches: union,
                           intersection, Jaccard estimates whose
                           APPROXIMATE values replay bit-for-bit
- stream_kmv_replay        streaming KMV maintenance (idempotent
                           set-union merge: safe under at-least-once)
- layout_bloom_prune       per-file md5-Bloom sidecar index: point
                           lookups skip files min/max cannot prune
                           (in-query pruning-bound assertion)
- merge_compact_state      small-file compaction: fragmented partitions
                           rewrite to one file, tidy ones re-point
- incr_join_view           incremental join-view maintenance
                           (key-scoped delete+insert, change-bounded)
- merge_change_feed        change-data-feed read between retained CoW
                           versions (Delta CDF parity, fingerprint diff)
- mmr_diversified_topk     Maximal Marginal Relevance selection; the
                           whole greedy trajectory replays in SQL
- cohort_retention_daily   first-seen-bucket cohort retention triangle
- ts_linear_trend          per-group OLS trend from exact integer
                           sufficient statistics

Same conventions as every other queries_* module: each entry pairs a
Spark implementation with a DuckDB oracle that replays the algorithm
value-exactly at the driver's sf0.01 scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register

# -- KLL mergeable quantile sketch tables ------------------------------------

_KQ_QS = (0.05, 0.5, 0.95, 0.99)
_KQ_K = 8192  # level-0 capacity; documents stays in the exact regime
# (no compaction) through sf0.1, so shard -> merge -> read-off must
# reproduce the true quantiles — value-checking the sketch PLUMBING the
# same way sketch_distinct_rollup checks HLL in its sparse regime. The
# compacting regime's O(1/k) rank-error bound is pytest-pinned
# (tests/test_extensions.py::test_kll_rank_error_bound_in_compacting_regime).


@register(
    "sketch_kll_rollup",
    oracle=f"""
WITH cnts AS (
  SELECT lang, n_chars AS v, count(*) AS c
  FROM documents GROUP BY lang, n_chars
), cum AS (
  SELECT lang, v,
         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM cnts
), qs AS (SELECT unnest([{", ".join(str(q) for q in _KQ_QS)}]) AS q)
SELECT lang, q,
       CAST(min(n) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum >= ceil(q * n) THEN v END) AS DOUBLE)
         AS quantile
FROM cum CROSS JOIN qs
GROUP BY lang, q
ORDER BY lang, q
""",
)
def sketch_kll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: KLL quantile sketch tables (operators/sketches.py kll_*
    family, Karnin-Lang-Liberty 2016) — the bounded-error mergeable
    quantile state for UNKNOWN value ranges, complementing the exact
    fixed-bin hist_* family (which needs a known [lo, hi) and
    resolution). Per-(lang, shard) sketches over n_chars merge to
    per-lang state; quantiles read off the merged ladder JVM-side
    (smallest value whose cumulative weight reaches ceil(q*n) — the
    family's shared definition, which the oracle replays from raw
    data)."""
    from whisper_pandas_spark.operators.sketches import (
        kll_merge,
        kll_quantiles,
        kll_shard_sketches,
    )

    docs = _table(spark, sf_dir, "documents").withColumn(
        "__shard", F.pmod(F.col("doc_id"), F.lit(4))
    )
    shards = kll_shard_sketches(docs, ("lang", "__shard"), "n_chars", k=_KQ_K)
    merged = kll_merge(shards, ("lang",))
    return kll_quantiles(merged, ("lang",), _KQ_QS).orderBy("lang", "q")


# -- MERGE add-only schema evolution ------------------------------------------


@register(
    "merge_schema_evolution",
    oracle="""
WITH c1 AS (
  SELECT doc_id, text || ' [v2]' AS text, n_chars / 100.0 AS quality
  FROM documents WHERE doc_id % 5 = 0
), s1 AS (
  SELECT d.doc_id, d.text, CAST(NULL AS DOUBLE) AS quality FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM c1)
  UNION ALL
  SELECT doc_id, text, quality FROM c1
), c2 AS (
  SELECT doc_id, text || ' [v3]' AS text, n_chars / 50.0 AS quality,
         CAST(2 AS INT) AS rev, false AS is_delete
  FROM documents WHERE doc_id % 11 = 0 AND doc_id % 97 <> 3
  UNION ALL
  SELECT doc_id, NULL, NULL, NULL, true
  FROM documents WHERE doc_id % 97 = 3
)
SELECT doc_id, text, round(quality, 6) AS quality, rev FROM (
  SELECT s.doc_id, s.text, s.quality, CAST(NULL AS INT) AS rev FROM s1 s
  WHERE s.doc_id NOT IN (SELECT doc_id FROM c2)
  UNION ALL
  SELECT doc_id, text, quality, rev FROM c2 WHERE NOT is_delete
) ORDER BY doc_id
""",
)
def merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y28+: add-only MERGE schema evolution (operators/merge.py) — the
    Delta/Iceberg ``mergeSchema`` contract on the plain copy-on-write
    MERGE. Batch 1 adds a typed ``quality`` column (every pre-existing
    row null-backfills); batch 2 adds ``rev`` on top AND deletes a key
    slice, proving evolved state keeps merging. The oracle replays both
    merges relationally (anti-join + union with explicit NULL casts)."""
    from whisper_pandas_spark.operators.merge import merge_changes

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    state0 = docs.select("doc_id", "text")
    c1 = docs.where(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.concat("text", F.lit(" [v2]")).alias("text"),
        (F.col("n_chars") / 100.0).alias("quality"),
    )
    state1 = merge_changes(state0, c1, "doc_id")
    upserts = docs.where(
        (F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 97 != 3)
    ).select(
        "doc_id",
        F.concat("text", F.lit(" [v3]")).alias("text"),
        (F.col("n_chars") / 50.0).alias("quality"),
        F.lit(2).cast("int").alias("rev"),
        F.lit(False).alias("is_delete"),
    )
    deletes = docs.where(F.col("doc_id") % 97 == 3).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("double").alias("quality"),
        F.lit(None).cast("int").alias("rev"),
        F.lit(True).alias("is_delete"),
    )
    final = merge_changes(
        state1, upserts.unionByName(deletes), "doc_id", "is_delete"
    )
    return final.select(
        "doc_id", "text", F.round("quality", 6).alias("quality"), "rev"
    ).orderBy("doc_id")


# -- TIFF decode path, driver-verified ----------------------------------------
#
# mm_image_features proves the feature head over the PGM container; this
# entry proves the round-7 TIFF decoder end-to-end in the driver: the same
# mod-128 byte plane is wrapped as an UNCOMPRESSED little-endian TIFF
# (constant 110-byte header + IFD computed once — strip offset is fixed
# for the 16x16 gray geometry, so the wrap is one pure-JVM concat, no
# Python in the payload build), decoded by functions/codecs.py:decode_tiff
# (real IFD parse, tag validation, strip read), and featurized by the
# same integer-power-sum head. The oracle enumerates the identical pixels.

# II, 8 IFD entries: 16x16, 8-bit gray (BlackIsZero), uncompressed,
# one strip at offset 110 of 256 bytes (regenerate with the snippet in
# the round-7 commit if the geometry ever changes).
_TIFF16_HEADER_HEX = (
    "49492A00080000000800"
    "00010300010000001000000001010300010000001000000002010300010000000800"
    "00000301030001000000010000000601030001000000010000001101040001000000"
    "6E00000016010300010000001000000017010400010000000001000000000000"
)


@register(
    "mm_tiff_image_features",
    oracle="""
WITH px AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS i,
         ord(substr(rpad(text, 256, text), CAST(t.i + 1 AS INT), 1)) % 128 AS b
  FROM documents CROSS JOIN range(0, 256) AS t(i)
), g AS (
  SELECT doc_id, i, b,
         CASE WHEN i % 16 < 15 THEN abs(lead(b, 1) OVER w - b) END AS gx,
         CASE WHEN i < 240 THEN abs(lead(b, 16) OVER w - b) END AS gy
  FROM px
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
), s AS (
  SELECT doc_id,
         CAST(sum(b) AS BIGINT) AS s1,
         CAST(sum(b*b) AS BIGINT) AS s2,
         CAST(sum(gx) AS BIGINT) AS gxs,
         CAST(sum(gy) AS BIGINT) AS gys
  FROM g GROUP BY doc_id
)
SELECT doc_id,
       CAST(16 AS INT) AS height, CAST(16 AS INT) AS width,
       CAST(1 AS INT) AS channels,
       round(s1 / 256.0 + 1e-9, 6) AS mean_px,
       round(sqrt(greatest(s2 / 256.0 - (s1 / 256.0) * (s1 / 256.0), 0))
             + 1e-9, 6) AS std_px,
       round(gxs / 240.0 + 1e-9, 6) AS grad_x_mean,
       round(gys / 240.0 + 1e-9, 6) AS grad_y_mean
FROM s ORDER BY doc_id
""",
)
def mm_tiff_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y21+/X5: the round-7 TIFF decoder driven end-to-end — document
    text cycled to a 256-byte mod-128 plane, wrapped as an uncompressed
    little-endian TIFF by concatenating the constant header (pure JVM),
    decoded by the real IFD/strip parser, featurized by the integer
    power-sum head; DuckDB replays the pixel enumeration. Compressed
    variants (LZW early-width-change, PackBits, predictor) are
    bit-parity-tested in tests/test_codecs.py."""
    from whisper_pandas_spark.operators.multimodal import image_features

    docs = _table(spark, sf_dir, "documents")
    tiff = docs.select(
        "doc_id",
        F.concat(
            F.unhex(F.lit(_TIFF16_HEADER_HEX)),
            F.encode(
                F.expr(
                    "array_join(transform(split(rpad(text, 256, text), ''),"
                    " c -> char(ascii(c) % 128)), '')"
                ),
                "utf-8",
            ),
        ).alias("payload"),
    )
    feats = image_features(tiff, "doc_id")
    eps = F.lit(1e-9)
    return feats.select(
        "doc_id",
        "height",
        "width",
        "channels",
        F.round(F.col("mean_px") + eps, 6).alias("mean_px"),
        F.round(F.col("std_px") + eps, 6).alias("std_px"),
        F.round(F.col("grad_x_mean") + eps, 6).alias("grad_x_mean"),
        F.round(F.col("grad_y_mean") + eps, 6).alias("grad_y_mean"),
    ).orderBy("doc_id")


# -- graphite nPercentile, driver-verified -------------------------------------

_NPQ = 37.5  # deliberately fractional-rank q: the NIST ceil pick differs
# from percentile_cont here, so the oracle FAILS against the pre-r7
# interpolating implementation — the advisory fix is hash-gated.


@register(
    "graphite_n_percentile",
    oracle=f"""
WITH series AS (
  SELECT 'app.' || event_type || '.value' AS metric,
         to_timestamp((floor(epoch(ts))::BIGINT // 600) * 600)::TIMESTAMP
           AS timestamp,
         round(sum(value), 6) AS value
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT metric, value,
         row_number() OVER (PARTITION BY metric ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY metric) AS n
  FROM series WHERE value IS NOT NULL
), pick AS (
  SELECT metric, value AS p FROM ranked
  WHERE rn = least(greatest(CAST(ceil({_NPQ} / 100.0 * (n + 1)) AS BIGINT),
                            1), n)
)
SELECT s.metric, s.timestamp, round(pick.p, 6) AS value
FROM series s JOIN pick USING (metric)
ORDER BY s.metric, s.timestamp
""",
)
def graphite_n_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/Y26+: graphite ``nPercentile`` (functions/graphite.py) over
    the shared 10-minute metric grid — each series replaced by its flat
    q-th percentile line using graphite's exact non-interpolating NIST
    rank pick (r6 advisory fix: q=37.5 lands on a fractional rank, so a
    percentile_cont implementation hash-mismatches here)."""
    from whisper_pandas_spark.functions.graphite import n_percentile
    from whisper_pandas_spark.queries_round6 import _metric_series

    series = _metric_series(spark, sf_dir)
    out = n_percentile(series, _NPQ)
    return out.select(
        "metric", "timestamp", F.round("value", 6).alias("value")
    ).orderBy("metric", "timestamp")


# -- KMV set-operation sketches, driver-verified --------------------------------

_KMV_K = 64  # events has ~150 distinct users per type at sf0.01, so the
# sketch runs in its APPROXIMATE regime here — and the oracle still
# hash-matches, because the md5 bottom-k content and the estimator
# arithmetic are bit-deterministic on both engines. This is the property
# HLL can't offer (its entry needs the exact sparse regime).


@register(
    "sketch_kmv_setops",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5('kmv0:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
), bk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
), sk AS (
  SELECT event_type, list(h ORDER BY h) AS hs
  FROM bk WHERE rn <= {_KMV_K} GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS key_a, b.event_type AS key_b,
         a.hs AS ha, b.hs AS hb,
         (list_sort(list_distinct(a.hs || b.hs)))[1:{_KMV_K}] AS u
  FROM sk a JOIN sk b ON a.event_type < b.event_type
), calc AS (
  SELECT key_a, key_b, ha, hb, u,
         CASE WHEN len(u) >= {_KMV_K}
              THEN ({_KMV_K} - 1.0) * 1152921504606846976.0
                   / CAST(u[{_KMV_K}] AS DOUBLE)
              ELSE CAST(len(u) AS DOUBLE) END AS union_est,
         CAST(len(list_filter(u,
               x -> list_contains(ha, x) AND list_contains(hb, x)))
              AS DOUBLE) / CAST(len(u) AS DOUBLE) AS jaccard
  FROM pairs
)
SELECT key_a, key_b,
       round(union_est + 1e-9, 6) AS union_est,
       round(jaccard + 1e-9, 6) AS jaccard,
       round(jaccard * union_est + 1e-9, 6) AS inter_est
FROM calc ORDER BY key_a, key_b
""",
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: KMV / bottom-k theta set-operation sketches
    (operators/sketches.py kmv_*, Bar-Yossef et al. 2002 / the
    DataSketches theta family) — the mergeable-summary capability HLL
    lacks: union, INTERSECTION and Jaccard cardinalities across groups.
    Per-(event_type, shard) sketches of the user_id set merge to
    per-type state (bottom-k mergeability is exact, bit-asserted in
    pytest), then every type pair gets union/jaccard/intersection
    estimates. Built on the cross-engine md5 hash family, so the
    APPROXIMATE estimates themselves replay bit-for-bit in DuckDB —
    the estimator, not just the plumbing, sits under the hash gate."""
    from whisper_pandas_spark.operators.sketches import (
        kmv_pair_ops,
        kmv_rollup,
        kmv_shard_sketches,
    )

    ev = _table(spark, sf_dir, "events").withColumn(
        "__shard", F.pmod(F.col("user_id"), F.lit(4))
    )
    shards = kmv_shard_sketches(
        ev, ("event_type", "__shard"), "user_id", k=_KMV_K
    )
    # the merged sketch IS the persistable state table (group-count-sized);
    # materialize it once so the pairwise self-join reads state rather
    # than recomputing the raw-data pipeline on both sides — exactly what
    # a deployment does by writing the sketch table to parquet
    merged = kmv_rollup(shards, ("event_type",)).localCheckpoint(eager=True)
    ops = kmv_pair_ops(merged, "event_type")
    eps = F.lit(1e-9)
    return ops.select(
        "key_a",
        "key_b",
        F.round(F.col("union_est") + eps, 6).alias("union_est"),
        F.round(F.col("jaccard") + eps, 6).alias("jaccard"),
        F.round(F.col("inter_est") + eps, 6).alias("inter_est"),
    ).orderBy("key_a", "key_b")


# -- streaming KMV maintenance, driver-verified ---------------------------------


@register(
    "stream_kmv_replay",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5('kmv0:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
), bk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
), sk AS (
  SELECT event_type,
         CAST(count(*) AS INT) AS n_kept,
         min(h) AS h_min, max(h) AS h_kth
  FROM bk WHERE rn <= {_KMV_K} GROUP BY event_type
)
SELECT event_type, n_kept,
       CASE WHEN n_kept >= {_KMV_K}
            THEN round(({_KMV_K} - 1.0) * 1152921504606846976.0
                       / CAST(h_kth AS DOUBLE) + 1e-9, 6)
            ELSE CAST(n_kept AS DOUBLE) END AS n_distinct_est,
       h_min, h_kth
FROM sk ORDER BY event_type
""",
)
def stream_kmv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+/Y66: streaming KMV maintenance
    (streaming/sketches.py:stream_kmv_update) replayed end-to-end —
    `events` split into two files streams through foreachBatch
    set-union merges into the versioned sketch state. The KMV merge is
    IDEMPOTENT (replayed batches cannot corrupt the state, asserted in
    tests), so unlike the additive histogram stream this maintenance is
    safe under at-least-once delivery. Final state summarized as
    (n_kept, distinct estimate, min/k-th hash) — the oracle recomputes
    the identical bottom-k from raw data, proving batch sketching,
    union merge, version flips AND the estimator in one hash check."""
    import tempfile

    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.streaming.sketches import stream_kmv_update

    ev = _table(spark, sf_dir, "events").select("event_type", "user_id")
    d = tempfile.mkdtemp(prefix="wps_kmvstream_")
    ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(
        f"{d}/changes/f1"
    )
    ev.filter(F.col("user_id") % 2 == 1).coalesce(1).write.parquet(
        f"{d}/changes/f2"
    )
    sdf = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/changes/*")
    )
    q = stream_kmv_update(
        sdf,
        f"{d}/state",
        ("event_type",),
        "user_id",
        k=_KMV_K,
        checkpoint_dir=f"{d}/ckpt",
    )
    q.processAllAvailable()
    q.stop()
    state = spark.read.parquet(current_version_path(f"{d}/state"))
    kk = F.col("k")
    full = F.size("hs") >= kk
    est = F.when(
        full,
        F.round(
            (kk.cast("double") - 1.0)
            * F.lit(1152921504606846976.0)
            / F.element_at("hs", kk).cast("double")
            + F.lit(1e-9),
            6,
        ),
    ).otherwise(F.size("hs").cast("double"))
    return state.select(
        "event_type",
        F.size("hs").cast("int").alias("n_kept"),
        est.alias("n_distinct_est"),
        F.element_at("hs", 1).alias("h_min"),
        F.element_at("hs", F.least(kk, F.size("hs"))).alias("h_kth"),
    ).orderBy("event_type")


# -- bloom file index, driver-verified -----------------------------------------

_BLOOM_M = 1 << 13
_BLOOM_H = 7
_BLOOM_PROBE = (7, 123, 400)
_BLOOM_DIR: dict[str, str] = {}


def _bloom_table(spark: SparkSession, sf_dir: str) -> str:
    """documents written as 8 files range-clustered on (lang, n_chars) —
    deliberately NOT on doc_id, so per-file doc_id min/max spans nearly
    the whole id range and statistics-based pruning is useless for a
    doc_id point lookup; once per process per sf_dir."""
    import tempfile

    from whisper_pandas_spark.sources.clustered import (
        materialize_range_clustered,
    )

    if sf_dir not in _BLOOM_DIR:
        d = tempfile.mkdtemp(prefix="wps_bloom_")
        materialize_range_clustered(
            _table(spark, sf_dir, "documents").select(
                "doc_id", "lang", "n_chars"
            ),
            d,
            ["lang", "n_chars"],
            num_files=8,
        )
        _BLOOM_DIR[sf_dir] = d
    return _BLOOM_DIR[sf_dir]


@register(
    "layout_bloom_prune",
    oracle=f"""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE doc_id IN ({", ".join(str(v) for v in _BLOOM_PROBE)})
ORDER BY doc_id
""",
)
def layout_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y25+/§4: Bloom FILE index proven end-to-end
    (sources/bloom_index.py) — documents laid out so doc_id min/max
    CANNOT prune (files clustered on (lang, n_chars)), then a 3-key
    doc_id point lookup through the per-file md5-Bloom sidecar. The
    entry RAISES unless the index actually restricted the scan (the
    zorder-entry discipline: a pruning regression turns the driver row
    red, not just slow); Bloom admits no false negatives by
    construction, so results equal the plain relational filter the
    oracle runs."""
    from whisper_pandas_spark.sources.bloom_index import (
        bloom_lookup,
        build_bloom_index,
    )

    d = _bloom_table(spark, sf_dir)
    idx = build_bloom_index(
        spark, d, "doc_id", m_bits=_BLOOM_M, n_hashes=_BLOOM_H
    )
    rows, scanned, total = bloom_lookup(
        spark,
        d,
        idx,
        "doc_id",
        list(_BLOOM_PROBE),
        m_bits=_BLOOM_M,
        n_hashes=_BLOOM_H,
    )
    if total < 4 or scanned > total // 2:
        raise RuntimeError(
            f"bloom index stopped pruning: scanned {scanned}/{total} files "
            f"for a {len(_BLOOM_PROBE)}-key point lookup"
        )
    return rows.select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    ).orderBy("doc_id")


# -- CoW compaction, driver-verified -------------------------------------------


@register(
    "merge_compact_state",
    oracle="""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang ORDER BY lang
""",
)
def merge_compact_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y59+: small-file compaction for partitioned CoW tables
    (operators/merge.py:compact_partitioned — the Delta OPTIMIZE /
    Iceberg rewrite_data_files maintenance op). `documents` lands
    partitioned by lang with a deliberately fragmented write (8-way
    repartition -> up to 8 files per partition); compaction rewrites
    every fragmented partition to one file in a new version while tidy
    partitions keep re-pointing (zero copy). The entry RAISES unless
    compaction actually ran and bounded the per-partition file count
    (the zorder/bloom in-query discipline), then returns per-lang
    aggregates of the live state — which must be UNCHANGED by layout,
    as the oracle's plain relational recompute verifies."""
    import tempfile
    from pathlib import Path

    from whisper_pandas_spark.operators.merge import (
        _part_dirs,
        _read_manifest,
        compact_partitioned,
        current_version_path,
        merge_into_parquet_partitioned,
        read_current_state_partitioned,
    )

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    d = tempfile.mkdtemp(prefix="wps_compact_")
    t = f"{d}/table"
    merge_into_parquet_partitioned(
        spark, t, docs.repartition(8), "doc_id", "lang"
    )
    new_dir, compacted = compact_partitioned(
        spark, t, "lang", max_files_per_partition=1
    )
    if new_dir is None or not compacted:
        raise RuntimeError("fragmented write produced nothing to compact")
    man = _read_manifest(current_version_path(t))
    for p in compacted:
        pdir = _part_dirs(Path(new_dir) / "data", "lang")[p]
        n = len(list(Path(pdir).glob("*.parquet")))
        if n != 1 or man[p] != Path(new_dir).name:
            raise RuntimeError(
                f"compaction left partition {p!r} at {n} files"
            )
    state = read_current_state_partitioned(spark, t, "lang")
    return (
        state.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


# -- incremental join-view maintenance, driver-verified -------------------------


@register(
    "incr_join_view",
    oracle="""
WITH oc AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 13 = 0
              THEN CAST(round(o_totalprice * 100) AS BIGINT) + 500
              ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 97 <> 5
), cc AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 11 = 0 THEN 'MOVED' ELSE c_mktsegment END
           AS seg
  FROM customer
)
SELECT seg, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM oc JOIN cc ON oc.o_custkey = cc.c_custkey
GROUP BY seg ORDER BY seg
""",
)
def incr_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y51+: incremental JOIN-view maintenance
    (operators/incremental.py join_view_*) — the materialized
    orders-x-customer view kept current under one change batch per
    side by key-scoped delete+insert (work proportional to the touched
    custkeys' data, not the corpus). Orders batch: +5.00 repricing at
    o_orderkey%13 (touches those orders' custkeys), deletes at
    o_orderkey%97=5; customer batch: segment rewrite at c_custkey%11.
    The maintained view then aggregates per segment; the oracle applies
    the same mutations relationally and recomputes the join from
    scratch — any IVM drift (stale rows surviving, double inserts)
    hash-mismatches. (Plan note: the audited plan recomputes base
    lineage because this self-contained entry derives everything from
    one scan; in production A/B/V are PERSISTED state tables — the
    operator itself is the minimal 2-semi + 1-anti + 1-slice-join
    shape, exchange-free when bucketed on the join key.)"""
    from whisper_pandas_spark.operators.incremental import (
        join_view_apply,
        join_view_touched,
    )
    from whisper_pandas_spark.operators.merge import merge_changes

    orders = _table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    cust = _table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )
    view = orders.join(cust, "o_custkey")

    da = (
        orders.where(
            (F.col("o_orderkey") % 13 == 0) & (F.col("o_orderkey") % 97 != 5)
        )
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("cents") + 500).alias("cents"),
            F.lit(False).alias("del"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 97 == 5).select(
                "o_orderkey",
                "o_custkey",
                F.lit(None).cast("bigint").alias("cents"),
                F.lit(True).alias("del"),
            )
        )
    )
    db = cust.where(F.col("o_custkey") % 11 == 0).select(
        "o_custkey", F.lit("MOVED").alias("seg"), F.lit(False).alias("del")
    )
    orders2 = merge_changes(orders, da, "o_orderkey", "del")
    cust2 = merge_changes(cust, db, "o_custkey", "del")
    touched = join_view_touched(
        da.select("o_custkey"), db.select("o_custkey"), "o_custkey"
    )
    view2 = join_view_apply(view, orders2, cust2, "o_custkey", touched)
    return (
        view2.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("seg")
    )


# -- change data feed, driver-verified -----------------------------------------


@register(
    "merge_change_feed",
    oracle="""
WITH changes AS (
  SELECT doc_id, text || ' [rev]' AS text, false AS is_delete
  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 97 <> 2
  UNION ALL
  SELECT doc_id + 500000, 'new doc ' || doc_id, false
  FROM documents WHERE doc_id < 3
  UNION ALL
  SELECT doc_id, NULL, true FROM documents WHERE doc_id % 97 = 2
)
SELECT c.doc_id AS key,
       CASE WHEN c.is_delete THEN 'removed'
            WHEN d.doc_id IS NULL THEN 'added'
            ELSE 'changed' END AS change
FROM changes c LEFT JOIN documents d ON d.doc_id = c.doc_id
ORDER BY key
""",
)
def merge_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y28+/Y20: change-data-feed read over the versioned CoW table
    (operators/merge.py:change_feed, Delta CDF parity on plain
    versioned parquet) — documents merged to v0, the standard mutation
    batch (rev updates at doc_id%7, three inserts, deletes at
    doc_id%97=2) applied as v1, then the (key, change) feed diffed
    BETWEEN THE VERSIONS on disk. The oracle derives the expected feed
    from the change batch itself: every update really changes text
    ([rev] suffix) and every insert uses fresh keys, so batch == feed
    exactly; fingerprint-diff drift (missed changes, phantom rows)
    hash-mismatches."""
    import tempfile

    from whisper_pandas_spark.operators.merge import (
        change_feed,
        merge_into_parquet,
    )

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="wps_cdf_")
    t = f"{d}/table"
    merge_into_parquet(spark, t, docs, "doc_id")  # v0
    changes = (
        docs.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 97 != 2))
        .select(
            "doc_id",
            F.concat("text", F.lit(" [rev]")).alias("text"),
            F.lit(False).alias("is_delete"),
        )
        .unionByName(
            docs.where(F.col("doc_id") < 3).select(
                (F.col("doc_id") + 500000).alias("doc_id"),
                F.concat(F.lit("new doc "), F.col("doc_id")).alias("text"),
                F.lit(False).alias("is_delete"),
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 97 == 2).select(
                "doc_id",
                F.lit(None).cast("string").alias("text"),
                F.lit(True).alias("is_delete"),
            )
        )
    )
    merge_into_parquet(spark, t, changes, "doc_id", delete_col="is_delete")
    return change_feed(spark, t, 0, 1, "doc_id").orderBy("key")


# -- MMR diversified selection, driver-verified ---------------------------------

_MMR_K = 8
_MMR_LAM = 0.5  # exactly representable; SQL literals cast to DOUBLE
# (DuckDB parses bare 0.5 as DECIMAL — the pagerank-oracle lesson)


def _mmr_oracle() -> str:
    from whisper_pandas_spark.functions.duck import duck_cos

    steps = []
    for i in range(1, _MMR_K + 1):
        prev = f"s{i - 1}"
        steps.append(f"""p{i} AS (
  SELECT vec_id AS pid, v AS pv, rel AS prel,
         CASE WHEN ms IS NULL THEN CAST({_MMR_LAM} AS DOUBLE) * rel
              ELSE CAST({_MMR_LAM} AS DOUBLE) * rel
                   - CAST({1.0 - _MMR_LAM} AS DOUBLE) * ms END AS psc
  FROM {prev} ORDER BY psc DESC, vec_id LIMIT 1
), s{i} AS (
  SELECT s.vec_id, s.v, s.rel,
         greatest(coalesce(s.ms, -1e18), {duck_cos("s.v", "p.pv")}) AS ms
  FROM {prev} s, p{i} p WHERE s.vec_id <> p.pid
)""")
    picks_sql = "\nUNION ALL\n".join(
            f"SELECT {j} AS rnk, pid AS vec_id, "
            f"round(prel + 1e-9, 6) AS relevance, "
            f"round(psc + 1e-9, 6) AS score FROM p{j}"
            for j in range(1, _MMR_K + 1)
        )
    return f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings ORDER BY vec_id LIMIT 1
), qid AS (
  SELECT min(vec_id) AS qid FROM embeddings
), cand AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s0 AS (
  SELECT c.vec_id, c.v,
         {duck_cos("c.v", "q.qv")} AS rel,
         CAST(NULL AS DOUBLE) AS ms
  FROM cand c CROSS JOIN q CROSS JOIN qid
  WHERE c.vec_id <> qid.qid
),
{",".join(steps)}
SELECT * FROM ({picks_sql}) ORDER BY rnk
"""


@register("mmr_diversified_topk", oracle=_mmr_oracle())
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: Maximal Marginal Relevance diversified selection
    (operators/diversify.py, Carbonell & Goldstein 1998) — the curation
    step after similarity search: greedy picks trading relevance
    against similarity to the already-selected set (lam=0.5). Query =
    the min-vec_id embedding (excluded from candidates); 8 greedy
    rounds. The oracle unrolls the ENTIRE greedy trajectory in SQL
    (per-step argmax + running max-sim update, the kmeans/SemDeDup
    replay pattern), so a single wrong pick anywhere in the sequence
    hash-mismatches."""
    from whisper_pandas_spark.operators.diversify import mmr_select

    emb = _table(spark, sf_dir, "embeddings")
    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    out = mmr_select(
        emb.where(F.col("vec_id") != qrow["vec_id"]),
        [float(x) for x in qrow["embedding"]],
        k=_MMR_K,
        lam=_MMR_LAM,
    )
    eps = F.lit(1e-9)
    return out.select(
        "rnk",
        "vec_id",
        F.round(F.col("relevance") + eps, 6).alias("relevance"),
        F.round(F.col("score") + eps, 6).alias("score"),
    ).orderBy("rnk")


# -- cohort retention, driver-verified ------------------------------------------

_COHORT_B = 86400  # daily buckets: 2 cohorts x ~30 offsets on this fixture


@register(
    "cohort_retention_daily",
    oracle=f"""
WITH act AS (
  SELECT DISTINCT user_id AS u,
         (floor(epoch(ts))::BIGINT // {_COHORT_B}) AS b
  FROM events WHERE ts IS NOT NULL
), fs AS (
  SELECT u, min(b) AS cohort FROM act GROUP BY u
), per AS (
  SELECT f.cohort, a.b - f.cohort AS "offset", count(*) AS n_active
  FROM act a JOIN fs f USING (u) GROUP BY 1, 2
), sz AS (
  SELECT cohort, count(*) AS cohort_size FROM fs GROUP BY cohort
)
SELECT p.cohort, p."offset",
       CAST(p.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       round(CAST(p.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
             + 1e-9, 6) AS retention
FROM per p JOIN sz s USING (cohort)
ORDER BY p.cohort, p."offset"
""",
)
def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11+: cohort retention (operators/cohort.py) — users bucketed
    by first-seen day over the events log, per-(cohort, day-offset)
    active counts and retention fractions: the growth-dashboard
    retention triangle, as two user-keyed partial aggregations + one
    user join (no windows, no Python). Integer counts make the oracle
    trivially exact; the fraction divides the same BIGINTs on both
    sides."""
    from whisper_pandas_spark.operators.cohort import cohort_retention

    ev = _table(spark, sf_dir, "events")
    out = cohort_retention(ev, "user_id", "ts", _COHORT_B)
    eps = F.lit(1e-9)
    return out.select(
        "cohort",
        "offset",
        "n_active",
        "cohort_size",
        F.round(F.col("retention") + eps, 6).alias("retention"),
    ).orderBy("cohort", "offset")


# -- per-group linear trend, driver-verified -------------------------------------


@register(
    "ts_linear_trend",
    oracle="""
WITH base AS (
  SELECT event_type AS k, floor(epoch(ts))::BIGINT AS x,
         CAST(round(value * 1000) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), m AS (
  SELECT k, min(x) AS x0 FROM base GROUP BY k
), s AS (
  SELECT b.k, min(m.x0) AS x0, count(*) AS n,
         sum(CAST(b.x - m.x0 AS HUGEINT)) AS sx,
         sum(CAST(b.y AS HUGEINT)) AS sy,
         sum(CAST((b.x - m.x0) * (b.x - m.x0) AS HUGEINT)) AS sxx,
         sum(CAST(b.y AS HUGEINT) * CAST(b.y AS HUGEINT)) AS syy,
         sum(CAST((b.x - m.x0) * b.y AS HUGEINT)) AS sxy
  FROM base b JOIN m ON b.k = m.k GROUP BY b.k
), f AS (
  SELECT k, n, x0,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM s
)
SELECT k AS event_type, CAST(n AS BIGINT) AS n, x0,
       round(CASE WHEN vx <> 0 THEN cv / vx / 1000.0 END + 1e-9, 9)
         AS slope,
       round(CASE WHEN vx <> 0
                  THEN (syd - (cv / vx) * sxd) / CAST(n AS DOUBLE) / 1000.0
             END + 1e-9, 6) AS intercept,
       round(CASE WHEN vx <> 0 AND vy <> 0 THEN cv * cv / (vx * vy) END
             + 1e-9, 6) AS r2
FROM f ORDER BY event_type
""",
)
def ts_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8+: per-metric OLS trend (operators/decompose.py:linear_trend)
    — slope / intercept-at-first-timestamp / r² of value-vs-time per
    event_type, from EXACT integer sufficient statistics (x recentred
    per group, y in milli-units, DECIMAL(38,0) folds) so the fit is
    partitioning-independent and the oracle replays the closed-form
    double arithmetic bit-for-bit. Complements seasonal decomposition
    and Holt forecasting in the time-series family."""
    from whisper_pandas_spark.operators.decompose import linear_trend

    ev = _table(spark, sf_dir, "events")
    out = linear_trend(ev, "event_type", "ts", "value", y_scale=1000)
    eps = F.lit(1e-9)
    return out.select(
        "event_type",
        "n",
        "x0",
        F.round(F.col("slope") + eps, 9).alias("slope"),
        F.round(F.col("intercept") + eps, 6).alias("intercept"),
        F.round(F.col("r2") + eps, 6).alias("r2"),
    ).orderBy("event_type")
