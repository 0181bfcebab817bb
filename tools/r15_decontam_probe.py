#!/usr/bin/env python
"""A/B the corpus-pipeline decontam stage: current two Arrow shingle
passes (train, heldout) vs ONE carry_cols pass over split<>'val' with a
checkpoint feeding both consumers."""

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

    from whisper_pandas_spark.operators.decontam import ngram_contamination
    from whisper_pandas_spark.operators.dedup import shingle_hashes_arrow
    from whisper_pandas_spark.operators.textstats import quality_gate_filter
    from whisper_pandas_spark.queries_pipeline import (
        TEST_FRAC,
        VAL_FRAC,
        split_assign,
    )
    from whisper_pandas_spark.session import get_spark

    spark = get_spark(app_name="r15_decontam_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

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
    assigned = split_assign(deduped, "doc_id", TEST_FRAC, VAL_FRAC).localCheckpoint(
        eager=True
    )
    train = assigned.filter(F.col("split") == "train")
    heldout = assigned.filter(F.col("split") == "test")

    def current():
        return ngram_contamination(train, heldout).select("doc_id")

    def fused():
        shf = shingle_hashes_arrow(
            assigned.filter(F.col("split") != "val"),
            "doc_id",
            "text",
            3,
            carry_cols=("split",),
        ).localCheckpoint(eager=True)
        held_h = (
            shf.filter(F.col("split") == "test")
            .select(F.explode("hh").alias("h"))
            .distinct()
        )
        train_h = shf.filter(F.col("split") == "train").select(
            "doc_id", F.explode("hh").alias("h")
        )
        return (
            train_h.join(held_h, "h")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .select("doc_id")
        )

    # verify identical results first
    a = {r.doc_id for r in current().collect()}
    b = {r.doc_id for r in fused().collect()}
    print("sets equal:", a == b, len(a))

    for name, fn in (("current", current), ("fused", fused)):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name}: best={ts[0]:.3f} median={ts[2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
