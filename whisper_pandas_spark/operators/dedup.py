"""Deduplication operator family (SURVEY.md §2.10 X1/X2).

The reference (`whisper_pandas.py`) has no dedup — its nearest semantic is
last-write-wins per ring slot (`whisper_pandas.py:201-215`, slot overwrite).
This module supplies the dedup surface a 100 TB training-data pipeline
needs, Spark-first:

- **exact_dedup** — content-hash groupBy. One shuffle on a uniformly
  distributed sha2 digest: no skew by construction, map-side partial agg,
  scales linearly with executors.
- **minhash_lsh_pairs** — MinHash signatures (shuffle-free, per-row,
  whole-stage-codegen md5 family from `functions.text`) → banded LSH
  bucketing (shuffle keyed on (band, band_hash) — rows are tiny
  (doc_id + 2 ints), so the shuffle is O(num_bands × docs), NOT O(text)) →
  candidate pairs by self-join within buckets → exact Jaccard verification
  on the candidates only. This is the canonical sub-quadratic near-dup
  join: all-pairs O(n²) work never happens; only bucket-collision pairs are
  verified.
- **simhash** — 60-bit charge/discharge fingerprint computed with
  higher-order `aggregate` over the token-hash array: zero shuffles, zero
  Python. Near-dup pairs via the pigeonhole band trick (hamming ≤ k over
  4 bands ⟹ ≥ 1 band identical) then `bit_count(xor) ≤ k` verification.
- **ngram_jaccard_pairs** — exact n-gram Jaccard restricted to a blocking
  key (lang, length bucket): the honest "small" baseline the LSH paths are
  validated against.

Skew guard: LSH buckets over-populated by degenerate content (e.g. empty
docs) explode the within-bucket self-join quadratically. `lsh_pairs`
drops buckets larger than `max_bucket` (configurable) — the standard
recall/cost trade; at 100 TB you would log and route such buckets to the
exact path keyed by content hash instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisper_pandas_spark.functions.text import (
    hash64,
    seeded_hash64,
    tokenize,
    word_shingles,
)

SIMHASH_BITS = 60


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest id per distinct text; report group size.

    Deterministic representative choice (min id) — `dropDuplicates` would be
    nondeterministic under parallel scan order.
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, num_perm: int, shingle_n: int = 3
) -> DataFrame:
    """id + MinHash signature array (one 60-bit min-hash per permutation).

    Entirely narrow (no shuffle): tokenize → shingle → per-seed
    array_min(transform(shingles, md5-hash)). Docs with no shingles get
    NULL mins and are dropped (they cannot near-dup by shingle overlap).
    """
    sh = F.array_distinct(word_shingles(tokenize(text_col), shingle_n))
    out = df.select(
        F.col(id_col).alias("doc_id"), sh.alias("shingles")
    ).filter(F.size("shingles") > 0)
    # NB: factory closure, NOT `lambda s, i=i: ...` — PySpark counts every
    # parameter (defaults included) as a lambda variable, so a defaulted
    # second arg silently becomes transform's index Column.
    def perm_hash(seed: int):
        return lambda s: seeded_hash64(s, seed)

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), perm_hash(i)))
            for i in range(num_perm)
        ]
    )
    return out.select("doc_id", "shingles", sig.alias("sig"))


def lsh_pairs(
    sig_df: DataFrame,
    bands: int,
    rows: int,
    jaccard_threshold: float,
    max_bucket: int = 1000,
) -> DataFrame:
    """Banded LSH candidate pairs + exact Jaccard verification.

    sig_df: output of :func:`minhash_signature` (doc_id, shingles, sig with
    len == bands*rows). Returns (doc_i, doc_j, jaccard) with doc_i < doc_j
    and jaccard >= threshold.
    """
    band_rows = []
    for b in range(bands):
        key = F.md5(
            F.concat_ws(
                ",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)]
            )
        )
        band_rows.append(
            sig_df.select(
                "doc_id", F.lit(b).alias("band"), key.alias("bkey")
            )
        )
    bucketed = band_rows[0]
    for extra in band_rows[1:]:
        bucketed = bucketed.unionByName(extra)

    # Skew guard: drop degenerate buckets before the quadratic self-join.
    sized = bucketed.withColumn(
        "bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("band", "bkey")),
    ).filter(F.col("bucket_n") <= max_bucket)

    left = sized.select("band", "bkey", F.col("doc_id").alias("doc_i"))
    right = sized.select("band", "bkey", F.col("doc_id").alias("doc_j"))
    cand = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc_i") < F.col("doc_j"))
        .select("doc_i", "doc_j")
        .distinct()
    )

    sh = sig_df.select("doc_id", "shingles")
    a = sh.select(F.col("doc_id").alias("doc_i"), F.col("shingles").alias("sh_i"))
    b = sh.select(F.col("doc_id").alias("doc_j"), F.col("shingles").alias("sh_j"))
    inter = F.size(F.array_intersect("sh_i", "sh_j"))
    union = F.size(F.array_union("sh_i", "sh_j"))
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.join(a, "doc_i")
        .join(b, "doc_j")
        .select("doc_i", "doc_j", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def simhash_from_hashes(hashes: Column) -> Column:
    """60-bit SimHash from a token-hash array — one expression, no shuffle.

    bit b of the fingerprint is 1 iff Σ_tokens (±1 by token-hash bit b) > 0.
    Frequency-weighted (duplicate tokens vote repeatedly), the classic
    Charikar construction. Callers must MATERIALIZE the hash array in its
    own projection first (see :func:`simhash_df`) so the md5 family is
    evaluated once per row, not once per bit.
    """
    def bit_vote(b: int):
        # factory closure: see perm_hash note in minhash_signature
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    total = F.lit(0).cast("bigint")
    for b in range(SIMHASH_BITS):
        vote = F.aggregate(hashes, F.lit(0).cast("bigint"), bit_vote(b))
        total = total + F.when(vote > 0, F.lit(2 ** b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return total


def simhash_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, simhash) — hash array materialized once, then 60 bit votes."""
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokenize(text_col), lambda t: hash64(t)).alias("hashes"),
    )
    return hashed.select(
        "doc_id", simhash_from_hashes(F.col("hashes")).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the 60 bits into 4 bands of 15; hamming ≤ 3
    guarantees at least one identical band, so joining on any-band-equal
    has NO false negatives — the banded result provably equals the O(n²)
    brute force (which is exactly what the DuckDB oracle computes,
    making this an independent-algorithm check, not a replication).
    Verification is `bit_count(xor) <= k`.
    """
    base = simhash_df(df, id_col, text_col)
    bands = None
    for b in range(4):
        part = base.select(
            "doc_id",
            "simhash",
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * 15).bitwiseAND(F.lit((1 << 15) - 1)).alias("bkey"),
        )
        bands = part if bands is None else bands.unionByName(part)
    left = bands.select("band", "bkey", F.col("doc_id").alias("doc_i"), F.col("simhash").alias("sh_i"))
    right = bands.select("band", "bkey", F.col("doc_id").alias("doc_j"), F.col("simhash").alias("sh_j"))
    ham = F.bit_count(F.expr("sh_i ^ sh_j"))
    return (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc_i") < F.col("doc_j"))
        .select("doc_i", "doc_j", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
