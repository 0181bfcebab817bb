#!/usr/bin/env python
"""A/B trigram_stream (posexplode + doc-window + 2 leads) vs a one-pass
Arrow tokenizer (the shingle_hashes_arrow precedent). Verifies exact
row-multiset equality, then times the checkpoint job and the full
KN score path on each."""

from __future__ import annotations

import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("R15_SF_DIR", "/root/testdata/sf0.1")


def arrow_stream(df, id_col, text_col):
    import pandas as pd

    def gen(batches):
        non_alnum = re.compile(r"[^a-z0-9]+")
        for pdf in batches:
            ids, poss, w1s, w2s, w3s = [], [], [], [], []
            for doc_id, text in zip(pdf["_id"], pdf["_text"]):
                if text is None:
                    continue
                toks = [
                    t
                    for t in non_alnum.sub(" ", str(text).lower())
                    .strip()
                    .split(" ")
                    if t != ""
                ]
                padded = ["<s>", "<s>", *toks, "</s>"]
                for i in range(len(padded) - 2):
                    ids.append(doc_id)
                    poss.append(i + 2)
                    w1s.append(padded[i])
                    w2s.append(padded[i + 1])
                    w3s.append(padded[i + 2])
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "pos": poss, "w1": w1s, "w2": w2s, "w3": w3s}
                )

    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(gen, f"{id_col} long, pos int, w1 string, w2 string, w3 string")


def main() -> None:
    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.knlm import (
        kn_score_from_counts,
        trigram_stream,
    )
    from whisper_pandas_spark.session import get_spark

    spark = get_spark(app_name="r15_tristream_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("text").isNotNull()
    )

    old = trigram_stream(docs, "doc_id", "text")
    new = arrow_stream(docs, "doc_id", "text")
    # exact multiset equality via sorted counts
    cnt_old = old.groupBy("doc_id", "pos", "w1", "w2", "w3").count()
    cnt_new = new.select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "w1", "w2", "w3"
    ).groupBy("doc_id", "pos", "w1", "w2", "w3").count()
    diff = cnt_old.exceptAll(cnt_new).count() + cnt_new.exceptAll(cnt_old).count()
    print("stream multiset diff rows:", diff)

    def path(stream_fn):
        tri = stream_fn(docs, "doc_id", "text")
        if "pos" in tri.columns:
            tri = tri.select(
                "doc_id", F.col("pos").cast("long").alias("pos"), "w1", "w2", "w3"
            )
        tri = tri.localCheckpoint(eager=True)
        c123 = (
            tri.select("w1", "w2", "w3")
            .groupBy("w1", "w2", "w3")
            .agg(F.count(F.lit(1)).alias("c123"))
            .localCheckpoint(eager=True)
        )
        return kn_score_from_counts(tri, c123, "doc_id")

    for name, fn in (("old", trigram_stream), ("new", arrow_stream)):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            path(fn).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name} full-kn: best={ts[0]:.3f} median={ts[2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
