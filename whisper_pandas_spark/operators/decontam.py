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
