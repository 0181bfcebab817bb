"""Deterministic negative sampling for contrastive / recommender training.

`negative_samples` — for every user in an interaction log, k items the
user did NOT interact with, drawn pseudo-randomly but DETERMINISTICALLY
from the engine's cross-engine md5 hash family (functions/text.py): the
i-th candidate for user u is `base_hash32(u || ':' || i) mod n_items`.
Candidates that collide with a real interaction (or repeat an earlier
candidate) are discarded and the oversampled tail fills the gap — the
standard rejection-sampling recipe for implicit-feedback negatives
(BPR, Rendle et al. 2009; word2vec negative sampling), made replayable:
the same (user, i) always yields the same item on any engine, so a SQL
oracle reproduces every sampled row bit-for-bit — and so does a re-run
after a retry, which keeps training data stable across pipeline
restarts.

Scale: the candidate table is |users| × k·oversample rows built by one
`sequence` explode (no Python), the rejection is ONE left-anti join
against the distinct interaction pairs keyed on (user, item), and the
per-user fill/rank is one window over k·oversample rows per user —
constant per user. Nothing is O(|users| × |items|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisper_pandas_spark.functions.text import base_hash32


def negative_samples(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    n_items: int,
    *,
    k: int = 5,
    oversample: int = 4,
    seed: int = 0,
) -> DataFrame:
    """(user, item, rnk) — k non-interacted items per user, rnk = 1..k
    in candidate order. Users whose rejection survivors run out (< k
    after oversampling) keep the survivors they have; raise `oversample`
    for pathological users who interacted with most of the catalog."""
    if n_items < 1:
        raise ValueError("n_items must be >= 1")
    users = interactions.select(F.col(user_col).alias("user")).distinct()
    cand = users.select(
        "user",
        F.explode(F.sequence(F.lit(1), F.lit(k * oversample))).alias("i"),
    ).withColumn(
        "item",
        F.pmod(
            base_hash32(
                F.concat(
                    F.lit(f"{seed}:"),
                    F.col("user").cast("string"),
                    F.lit(":"),
                    F.col("i").cast("string"),
                )
            ),
            F.lit(n_items),
        ),
    )
    # drop duplicate candidate items per user (keep the earliest i)
    wdup = Window.partitionBy("user", "item").orderBy("i")
    cand = (
        cand.withColumn("__rn", F.row_number().over(wdup))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    pos = interactions.select(
        F.col(user_col).alias("user"), F.col(item_col).alias("item")
    ).distinct()
    neg = cand.join(pos, ["user", "item"], "left_anti")
    wfill = Window.partitionBy("user").orderBy("i")
    return (
        neg.withColumn("rnk", F.row_number().over(wfill))
        .where(F.col("rnk") <= k)
        .select("user", "item", "rnk")
    )
