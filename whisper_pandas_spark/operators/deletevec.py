"""Merge-on-read deletion vectors (Iceberg v2 / Delta DV style) — the
OTHER lakehouse delete paradigm next to the copy-on-write merge family
(operators/merge.py): instead of rewriting data files, a delete
records (file_id, pos) coordinates in a small side table and the READ
path anti-joins them out. Rewrites are deferred to compaction; the
base bytes never change on delete — the property that makes deletes
O(deleted) instead of O(table).

The position coordinate here is LOGICAL: the base table persists its
own (file_id, pos) columns assigned deterministically at write time
(doc order), so the mechanism is engine-checkable without relying on
physical parquet row order — the same modelling choice the manifest
family uses for partition pointers. Scale: the DV table is keyed
(file_id, pos) — ids only, broadcastable until deletes approach table
size, at which point compaction (merge.py's rewrite path) folds them
in; the read anti-join is the standard null-safe hash shape.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_base(df: DataFrame, id_col: str, base: str, n_files: int) -> None:
    """Materialize *df* as the DV-addressable base table: file_id =
    id % n_files, pos = dense rank within the file (id order)."""
    w = Window.partitionBy("file_id").orderBy(id_col)
    out = (
        df.withColumn("file_id", (F.col(id_col) % n_files).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
    )
    out.write.mode("overwrite").partitionBy("file_id").parquet(
        f"{base}/data"
    )


def base_file_state(base: str) -> dict[str, int]:
    """(path -> size) of every base data file — the no-rewrite
    witness."""
    root = Path(base) / "data"
    return {
        str(p.relative_to(root)): p.stat().st_size
        for p in root.rglob("*.parquet")
    }


def add_deletes(
    spark: SparkSession, base: str, positions: DataFrame, version: int
) -> None:
    """Record a delete wave: *positions* is (file_id, pos). Writing a
    version is idempotent (deterministic overwrite)."""
    positions.select(
        F.col("file_id").cast("int"), F.col("pos").cast("bigint")
    ).write.mode("overwrite").parquet(f"{base}/dv/v{version}")


def read_with_dv(spark: SparkSession, base: str) -> DataFrame:
    """The MoR read path: base rows minus every recorded (file_id,
    pos) across all DV versions."""
    data = spark.read.parquet(f"{base}/data")
    dv_root = Path(base) / "dv"
    versions = sorted(p.name for p in dv_root.iterdir()) if dv_root.exists() else []
    if not versions:
        return data
    dv = spark.read.parquet(*[f"{base}/dv/{v}" for v in versions]).distinct()
    return data.join(dv, ["file_id", "pos"], "left_anti")


def compact_dv(spark: SparkSession, base: str) -> dict[str, int]:
    """Fold every recorded DV into the base: rewrite ONLY the files
    that carry deletes (file-granular, the CoW partitioned-manifest
    bound), leave untouched files byte-identical, then clear the DV
    state. Returns {"rewritten": n, "untouched": m} so callers can
    assert the rewrite bound."""
    import shutil

    dv_root = Path(base) / "dv"
    versions = (
        sorted(p.name for p in dv_root.iterdir()) if dv_root.exists() else []
    )
    if not versions:
        return {"rewritten": 0, "untouched": len(base_file_state(base))}
    dv = spark.read.parquet(
        *[f"{base}/dv/{v}" for v in versions]
    ).distinct()
    touched = [
        int(r["file_id"])
        for r in dv.select("file_id").distinct().collect()
    ]  # bounded: one row per base file
    data_root = Path(base) / "data"
    all_files = sorted(
        int(p.name.split("=")[1]) for p in data_root.glob("file_id=*")
    )
    for fid in touched:
        part = spark.read.parquet(f"{base}/data/file_id={fid}")
        dv_f = dv.filter(F.col("file_id") == fid).select("pos")
        kept = part.join(dv_f, "pos", "left_anti")
        tmp = f"{base}/compact_tmp/file_id={fid}"
        kept.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(data_root / f"file_id={fid}")
        shutil.move(tmp, data_root / f"file_id={fid}")
    shutil.rmtree(dv_root)
    shutil.rmtree(Path(base) / "compact_tmp", ignore_errors=True)
    return {
        "rewritten": len(touched),
        "untouched": len(all_files) - len(touched),
    }
