#!/usr/bin/env python
"""Probe the PER-ROUND subplan of label_propagation (hidden from the
final explain by the eager per-round checkpoints).

Rebuilds the operator's internals verbatim on the bench LPA edge set
(co-order part pairs at sf0.1), materializes round-1 labels through the
same localCheckpoint, then explains the round-2 subplan:

    python tools/r15_lpa_probe.py current   # shipped round shape
    python tools/r15_lpa_probe.py fused     # repartition(node)-fused shape

Writes plans/r15/lpa_round_<variant>.txt and prints Exchange counts.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("R15_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = Path(__file__).resolve().parents[1] / "plans" / "r15"


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "current"
    from pyspark.sql import functions as F

    from whisper_pandas_spark.plans.inspect import formatted_plan
    from whisper_pandas_spark.session import get_spark

    spark = get_spark(app_name="r15_lpa_probe")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    arr = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        arr.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") < F.col("dst"))
    )
    und = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).where(
        F.col("u") != F.col("v")
    )
    shp = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    both = (
        und.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
                    F.struct(F.col("v").alias("a"), F.col("u").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .repartition(shp, "b")
        .dropDuplicates(["a", "b"])
        .persist()
    )

    def round_subplan(labels, variant: str):
        lab = labels.select(F.col("node").alias("b"), "label")
        if "shj" in variant:
            lab = lab.hint("shuffle_hash")
        nbr = both.join(lab, "b").select("a", "label")
        if "fused" in variant:
            nbr = nbr.repartition(shp, "a")
        cnt = nbr.groupBy(F.col("a").alias("node"), "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        return cnt.groupBy("node").agg(
            F.min_by("label", F.struct(-F.col("c"), F.col("label"))).alias("label")
        )

    # round 1 exactly as shipped, checkpointed like the operator does
    nbr1 = both.select("a", F.col("b").alias("label"))
    cnt1 = nbr1.groupBy(F.col("a").alias("node"), "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    pick1 = cnt1.groupBy("node").agg(
        F.min_by("label", F.struct(-F.col("c"), F.col("label"))).alias("label")
    )
    labels1 = pick1.localCheckpoint(eager=True)

    r2 = round_subplan(labels1, variant)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r2.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    plan = formatted_plan(round_subplan(labels1, variant))
    PLANS_DIR.mkdir(parents=True, exist_ok=True)
    (PLANS_DIR / f"lpa_round_{variant}.txt").write_text(plan + "\n")
    n_exch = plan.count("Exchange")
    print(f"variant={variant} round2_noop={dt:.3f}s exchanges_in_round_plan={n_exch}")
    print(plan[:4000])
    spark.stop()


if __name__ == "__main__":
    main()
