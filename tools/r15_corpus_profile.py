#!/usr/bin/env python
"""Stage-level timing of pipeline_corpus_end_to_end (guide §1): the
eager checkpoint splits the entry into job A (gate + sha2-window dedup +
split assign) and job B (decontam + packing + final agg); time each,
plus the decontam subtree alone."""

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
    from whisper_pandas_spark.operators.textstats import quality_gate_filter
    from whisper_pandas_spark.queries_pipeline import (
        TEST_FRAC,
        VAL_FRAC,
        pipeline_corpus_end_to_end,
        split_assign,
    )
    from whisper_pandas_spark.session import get_spark

    spark = get_spark(app_name="r15_corpus_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    # warm-up rep
    pipeline_corpus_end_to_end(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    for rep in range(2):
        marks = {}
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "lang", "text"
        )
        t0 = time.perf_counter()
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
        marks["A: gate+dedup+split ckpt"] = time.perf_counter() - t0

        t = time.perf_counter()
        gated.write.format("noop").mode("overwrite").save()
        marks["A1: gate only"] = time.perf_counter() - t

        train = assigned.filter(F.col("split") == "train")
        heldout = assigned.filter(F.col("split") == "test")
        t = time.perf_counter()
        dirty = ngram_contamination(train, heldout).select("doc_id")
        dirty.write.format("noop").mode("overwrite").save()
        marks["B1: decontam"] = time.perf_counter() - t

        t = time.perf_counter()
        pipeline_corpus_end_to_end(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        marks["full entry"] = time.perf_counter() - t
        print(f"--- rep {rep} ---")
        for k, v in marks.items():
            print(f"{v:8.3f}s  {k}")
    spark.stop()


if __name__ == "__main__":
    main()
