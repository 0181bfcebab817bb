#!/usr/bin/env python
"""Multi-file scale demonstration: scan throughput vs tree size.

Generates N reference-geometry Whisper files (82.8 MB each) under /tmp
(cached across runs), scans 1 / N/3 / N of them through the distributed
DataSource, and prints MB/s. This is the scenario the reference cannot
address at all (one file at a time, whole file in RAM, README.md:64):
the engine's scan should hold its per-file cost roughly constant as the
tree grows — the 100 TB argument in miniature. Usage:

    python tools/scale_bench.py [n_files=12]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

TREE = Path("/tmp/whisper_scale_tree")


def build_tree(n: int) -> list[Path]:
    from bench import WHISPER_GEOMETRY
    from wsp_fixtures import build_wsp

    TREE.mkdir(parents=True, exist_ok=True)
    files = []
    for i in range(n):
        p = TREE / f"srv{i // 4}" / f"metric{i}.wsp"
        if not p.exists():
            p.parent.mkdir(parents=True, exist_ok=True)
            build_wsp(str(p), archives=WHISPER_GEOMETRY, seed=100 + i)
        files.append(p)
    return files


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    files = build_tree(n)
    size_mb = sum(f.stat().st_size for f in files) / 1e6

    from whisper_pandas_spark.session import get_spark
    from whisper_pandas_spark.sources.whisper import register_whisper

    spark = get_spark(app_name="whisper_scale_bench")
    register_whisper(spark)
    # warm the DataSource machinery on one small read
    spark.read.format("whisper").load(str(files[0])).limit(1).count()

    for label, paths in [
        ("1 file", [files[0]]),
        (f"{max(n // 3, 2)} files", files[: max(n // 3, 2)]),
        (f"{n} files", files),
    ]:
        mb = sum(p.stat().st_size for p in paths) / 1e6
        t0 = time.perf_counter()
        df = spark.read.format("whisper").load([str(p) for p in paths])
        rows = df.groupBy("archive").count().collect()
        dt = time.perf_counter() - t0
        total = sum(r["count"] for r in rows)
        print(
            f"{label:>10}: {mb:8.1f} MB  {total:>10} points  "
            f"{dt:6.2f} s  {mb / dt:8.0f} MB/s"
        )
    print(f"tree total: {size_mb:.1f} MB in {len(files)} files")
    spark.stop()


if __name__ == "__main__":
    main()
