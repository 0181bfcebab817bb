"""Train/eval decontamination: flag training documents sharing word
n-grams with a held-out set.

The standard LLM-corpus hygiene step (the reference has no text surface;
this is the engine's own bar): any training document that shares even
one shingle with an eval/benchmark document is suspect — exact-substring
leakage survives paraphrase-level edits far better than whole-doc
near-dup detection, which is why decontamination runs on raw n-gram
overlap rather than MinHash estimates.

Shape at 100 TB: the held-out side is a benchmark suite — thousands of
docs, millions of distinct shingles — tiny next to the corpus. Its
distinct-shingle set builds in one pass and arrives at the join as the
small side (AQE broadcasts it from runtime shuffle stats); the corpus
side streams scan-shaped through the Arrow shingler with no
self-shuffle. Cost: one corpus scan + one small-side join + one groupBy
on doc_id — the same budget as a filter."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.dedup import shingle_hashes_arrow


def ngram_contamination(
    train: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, n_shared): for each *train* doc, how many of its distinct
    word-``shingle_n``-grams appear in ANY *heldout* doc. Only
    contaminated docs (n_shared >= 1) are returned; anti-join the result
    against the corpus to scrub it."""
    held_h = (
        shingle_hashes_arrow(heldout, id_col, text_col, shingle_n)
        .select(F.explode("hh").alias("h"))
        .distinct()
    )
    train_h = shingle_hashes_arrow(train, id_col, text_col, shingle_n).select(
        F.col("doc_id"), F.explode("hh").alias("h")
    )
    # hh is distinct per doc, so (doc_id, h) rows are unique and a plain
    # count is the distinct shared-shingle count
    return (
        train_h.join(held_h, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def bloom_contamination(
    train: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 3,
    m: int = 1 << 16,
    seed: int = 0,
) -> DataFrame:
    """Bloom-filtered decontamination: like :func:`ngram_contamination`,
    but the held-out shingle set is compressed into an m-bit Bloom
    filter (operators/sketches.py bloom_*) before it meets the corpus —
    the production pattern when the benchmark suite's distinct-shingle
    set is itself too large to broadcast comfortably: the filter is a
    FIXED size (m bits) regardless of how many shingles it holds.

    Returns (doc_id, n_flagged): per train doc, how many of its distinct
    shingles the filter reports present; only flagged docs are returned.
    One-sided by construction: every truly-shared shingle is flagged
    (the Bloom filter has no false negatives), so the verdict set is a
    SUPERSET of the exact operator's — scrubbing on it can only
    over-drop, never leak (n_flagged >= n_shared per doc,
    pytest-pinned). The false-positive rate is the documented knob:
    k/m size the filter against the held-out cardinality.

    Plan: the filter's set bits (<= m rows, kilobytes) broadcast; the
    corpus side is one scan + a k-way bit explode + an anti-join pair
    that keeps exactly the all-bits-present shingles — no corpus-side
    self-shuffle, same budget as the exact operator with a
    constant-size small side.
    """
    from whisper_pandas_spark.operators.sketches import (
        _bloom_bit,
        bloom_shard_sketches,
    )

    held_h = (
        shingle_hashes_arrow(heldout, id_col, text_col, shingle_n)
        .select(F.explode("hh").alias("h"))
        .distinct()
    )
    bits = bloom_shard_sketches(
        held_h.select(F.lit("g").alias("g"), "h"),
        ("g",),
        "h",
        k=k,
        m=m,
        seed=seed,
    ).select("bit").distinct()
    train_h = shingle_hashes_arrow(train, id_col, text_col, shingle_n).select(
        "doc_id", F.explode("hh").alias("h")
    )
    barr = F.array_distinct(
        F.array(*[_bloom_bit("h", seed * k + i, m) for i in range(k)])
    )
    pb = train_h.select("doc_id", "h", F.explode(barr).alias("bit"))
    # a shingle is flagged iff NONE of its bits is missing from the
    # filter: miss-list anti-join keeps the all-bits-present shingles
    miss = (
        pb.join(F.broadcast(bits), "bit", "left_anti")
        .select("doc_id", "h")
        .distinct()
    )
    flagged = train_h.join(miss, ["doc_id", "h"], "left_anti")
    # (doc_id, h) rows are unique (hh is distinct per doc), so a plain
    # count is the distinct flagged-shingle count
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_flagged")
    )


def semantic_contamination(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    arrow: bool = False,
) -> DataFrame:
    """Embedding-level decontamination — the SEMANTIC member of the
    family (exact n-gram overlap: :func:`ngram_contamination`;
    fixed-size probabilistic: :func:`bloom_contamination`): flag every
    corpus vector whose maximum cosine against ANY held-out vector
    reaches *threshold*. Catches paraphrased/translated benchmark
    leakage that no exact-shingle pass can see (public recipe: e.g.
    the Llama/GPT-4 report-style embedding decontamination).

    Returns (id, max_cos DOUBLE, contaminated INT) for EVERY corpus
    row — max_cos is the evidence, so thresholds can be re-cut without
    recomputing.

    Shape at 100 TB: the held-out side is a benchmark suite — tiny by
    definition — so it BROADCASTS and the corpus side streams
    scan-shaped through one crossJoin + max aggregation (map-side
    partial: each task folds its broadcast copy locally; no corpus
    shuffle at all until the per-id max combine, which carries one
    double per row).

    Two equivalent engines for the cosine:

    - ``arrow=False`` (default): the engine's order-pinned expression
      fold (operators/similarity.py:cosine) — a SQL engine replaying
      the same element order reproduces every double bit-for-bit (what
      the registry oracle checks).
    - ``arrow=True``: one numpy matmul per Arrow batch against the
      collected held-out matrix (tiny by definition — it rides to every
      task in the closure, the broadcast's moral twin) — the production
      path: measured 168x over the expression fold at sf1 (177 -> 1.05 s,
      PERF_sf1.md),
      same verdicts, doubles equal to float tolerance rather than
      bit-identical (BLAS summation order).
    """
    if arrow:
        from typing import Iterator

        import numpy as np
        import pandas as pd

        hm = np.array(
            [list(r[0]) for r in heldout.select(vec_col).collect()],
            dtype=np.float64,
        )
        hn = hm / np.linalg.norm(hm, axis=1, keepdims=True)

        def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cm = np.array([list(v) for v in pdf["_cv"]], dtype=np.float64)
                cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
                mx = (cn @ hn.T).max(axis=1)
                yield pd.DataFrame({"_cid": pdf["_cid"], "max_cos": mx})

        scored = corpus.select(
            F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv")
        ).mapInPandas(score, "_cid long, max_cos double")
        return scored.select(
            F.col("_cid").alias(id_col),
            "max_cos",
            (F.col("max_cos") >= F.lit(threshold))
            .cast("int")
            .alias("contaminated"),
        )

    from whisper_pandas_spark.operators.similarity import cosine

    c = corpus.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv")
    )
    h = heldout.select(F.col(vec_col).alias("_hv"))
    scored = c.crossJoin(F.broadcast(h)).select(
        "_cid", cosine(F.col("_cv"), F.col("_hv")).alias("_cos")
    )
    return (
        scored.groupBy("_cid")
        .agg(F.max("_cos").alias("max_cos"))
        .select(
            F.col("_cid").alias(id_col),
            "max_cos",
            (F.col("max_cos") >= F.lit(threshold))
            .cast("int")
            .alias("contaminated"),
        )
    )
