#!/usr/bin/env python
"""Interleaved same-session A/B of pipeline_corpus_end_to_end: the r14
two-pass decontam form (replicated inline) vs the committed r15 fused
one-pass form. Interleaving makes the comparison robust to host drift."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("R15_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from whisper_pandas_spark.functions.text import tokenize
    from whisper_pandas_spark.operators.decontam import ngram_contamination
    from whisper_pandas_spark.operators.packing import pack_bins
    from whisper_pandas_spark.operators.textstats import quality_gate_filter
    from whisper_pandas_spark.queries_pipeline import (
        PACK_BUDGET,
        PACK_SHARDS,
        TEST_FRAC,
        VAL_FRAC,
        pipeline_corpus_end_to_end,
        split_assign,
    )
    from whisper_pandas_spark.session import get_spark

    spark = get_spark(app_name="r15_corpus_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    def old_form():
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "lang", "text"
        )
        gated = quality_gate_filter(docs, "doc_id", "text")
        w = Window.partitionBy(F.sha2(F.col("text"), 256))
        deduped = (
            gated.withColumn("__keep", F.min("doc_id").over(w))
            .filter(F.col("doc_id") == F.col("__keep"))
            .drop("__keep")
        )
        assigned = split_assign(
            deduped, "doc_id", TEST_FRAC, VAL_FRAC
        ).localCheckpoint(eager=True)
        train = assigned.filter(F.col("split") == "train")
        heldout = assigned.filter(F.col("split") == "test")
        dirty = ngram_contamination(train, heldout).select("doc_id")
        corpus = train.join(dirty, "doc_id", "left_anti").unionByName(
            assigned.filter(F.col("split") != "train")
        )
        corpus = corpus.withColumn("blk", F.concat_ws("|", "split", "lang"))
        binned = pack_bins(
            corpus,
            "doc_id",
            F.size(tokenize("text")),
            "blk",
            PACK_BUDGET,
            n_shards=PACK_SHARDS,
        )
        return (
            binned.groupBy("split", "lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("doc_id").alias("sum_ids"),
                F.sum("n_tok").alias("n_tokens"),
                F.countDistinct(
                    F.col("shard").cast("bigint") * F.lit(1000000000)
                    + F.col("bin_id")
                ).alias("n_bins"),
            )
            .orderBy("split", "lang")
        )

    def new_form():
        return pipeline_corpus_end_to_end(spark, SF_DIR)

    # warm both
    old_form().write.format("noop").mode("overwrite").save()
    new_form().write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {"old": [], "new": []}
    for _ in range(5):
        for name, fn in (("old", old_form), ("new", new_form)):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts.sort()
        print(f"{name}: best={ts[0]:.3f} median={ts[len(ts)//2]:.3f} all={[round(t,2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
