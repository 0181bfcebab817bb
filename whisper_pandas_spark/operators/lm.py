"""In-engine bigram language-model scoring (LLM-pipeline; extension
beyond the reference).

The classic corpus-quality signal (CCNet, Gopher, most pretraining
pipelines): train a small LM on the corpus (or a clean reference
corpus), score every document by its average token log-probability, and
gate or re-weight on the score. A full KenLM stays outside the engine;
the add-one-smoothed bigram model here IS expressible as pure
relational algebra, which makes it deterministic, distributed, and
DuckDB-oracle-able — the same trade the quality/langid ops make.

Model: p(w2 | w1) = (c(w1, w2) + 1) / (c(w1) + V), V = corpus vocab.
Doc score = mean over the doc's bigrams of ln p — higher = more typical
of the training corpus; documents with < 2 tokens get a null score.

Scale shape (mirrors BM25, operators/textrank.py):
- two count aggregations over exploded bigrams (shuffle on token keys;
  partial aggregation halves traffic);
- scoring joins the doc bigrams to the count tables on (w1, w2)/(w1) —
  at 100 TB these are plain shuffle equi-joins; the count tables are
  O(observed bigrams), usually small enough that AQE broadcast-converts
  them;
- per-doc fold as DECIMAL(38,12) so scores are partition-order
  independent, then rounded to 6 dp.

Stop-word keys dominate c(w1) traffic exactly like hot terms in BM25 —
both aggregations are partial-agg'd map-side, which is the standard
mitigation; `operators/skew.py` has the salted fallback if a corpus
ever needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whisper_pandas_spark.functions.text import tokenize


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("t")
    )
    bi = F.when(
        F.size("t") >= 2,
        F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"),
    ).otherwise(F.expr("array()"))
    return toks.select("doc_id", F.explode(bi).alias("b")).select(
        "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )


def bigram_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, lm_score): add-one bigram LM trained on *docs*
    and applied to *docs* (self-scoring — to score against a separate
    reference corpus, train/apply can be split along the same joins).

    lm_score = round(avg ln p(w2|w1), 6); null when n_bigrams = 0.
    """
    big = _doc_bigrams(docs, id_col, text_col)
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        docs.select(F.explode(tokenize(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    logp = F.log(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    scored = (
        big.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # decimal FOLD (order-independent), then double DIVISION —
            # decimal-division scale rules differ across engines, IEEE
            # double division does not
            F.round(
                F.sum(logp.cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("lm_score"),
        )
    )
    # docs with < 2 tokens have no bigrams: emit (doc_id, 0, null)
    all_ids = docs.select(F.col(id_col).alias("doc_id"))
    return (
        all_ids.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_score",
        )
    )
