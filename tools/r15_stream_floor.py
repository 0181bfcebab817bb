#!/usr/bin/env python
"""VERDICT r14 #7: split a stream_* replay entry's cost into
(a) fixture write, (b) availableNow micro-batch machinery, (c) the
batch operator work — and measure how the machinery scales with
micro-batch COUNT (maxFilesPerTrigger=1 -> 2 batches vs unset -> 1
batch; the state/result is invariant under batching by the additive
merge law). Uses stream_kn_replay, the KN counts maintainer."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("R15_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.knlm import (
        kn_score_from_counts,
        trigram_stream,
    )
    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.session import get_spark
    from whisper_pandas_spark.streaming.sketches import stream_kn_counts_update

    spark = get_spark(app_name="r15_stream_floor")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )

    def run(mfpt: int | None, label: str) -> None:
        for rep in range(3):
            d = tempfile.mkdtemp(prefix="wps_floor_")
            try:
                t0 = time.perf_counter()
                docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
                    f"{d}/changes/f1"
                )
                docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
                    f"{d}/changes/f2"
                )
                t_write = time.perf_counter() - t0

                t0 = time.perf_counter()
                rs = spark.readStream.schema("doc_id long, text string")
                if mfpt is not None:
                    rs = rs.option("maxFilesPerTrigger", str(mfpt))
                sdf = rs.parquet(f"{d}/changes/*")
                q = stream_kn_counts_update(
                    sdf, f"{d}/state", "doc_id", "text",
                    checkpoint_dir=f"{d}/ckpt",
                )
                q.processAllAvailable()
                nb = len(q.recentProgress)
                q.stop()
                t_stream = time.perf_counter() - t0

                t0 = time.perf_counter()
                c123 = spark.read.parquet(current_version_path(f"{d}/state"))
                tri = trigram_stream(docs, "doc_id", "text").localCheckpoint(
                    eager=True
                )
                kn_score_from_counts(tri, c123, "doc_id").orderBy(
                    "doc_id"
                ).write.format("noop").mode("overwrite").save()
                t_score = time.perf_counter() - t0
                print(
                    f"{label} rep{rep}: write={t_write:.2f}s "
                    f"stream={t_stream:.2f}s ({nb} micro-batches) "
                    f"score={t_score:.2f}s "
                    f"total={t_write + t_stream + t_score:.2f}s"
                )
            finally:
                shutil.rmtree(d, ignore_errors=True)

    run(1, "mfpt=1 (entry's shape)")
    run(None, "unset (single batch) ")
    spark.stop()


if __name__ == "__main__":
    main()
