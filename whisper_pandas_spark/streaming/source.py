"""Whisper tree as a LIVE STREAM source — `spark.readStream.format
("whisper")` (§2.9 × §2.1, beyond reference parity).

Graphite's carbon daemon appends points to .wsp ring buffers forever;
this reader turns that tree into a Structured Streaming source so the
engine's streaming operators (rollup, EWMA, sinks) run directly off the
files — the live twin of the batch scan.

Offset model: a single high-water mark ``{"wm": <epoch seconds>}`` over
the FINEST archive (new writes land there; coarser archives are derived
rollups and would double-count). Each micro-batch emits points with
``wm_start < timestamp <= wm_end`` across the tree, where wm_end is the
newest timestamp currently stored. Replay (``readBetweenOffsets``) is
deterministic for any committed offset range because stored points are
keyed by timestamp.

Assumption (documented, inherent to tailing a last-write-wins ring):
ingestion is append-style — a new point carries a timestamp newer than
the high-water mark. An in-place OVERWRITE of an already-emitted slot
does not re-emit (its timestamp is ≤ wm). Retention wrap-around is
safe: expired points only ever disappear below the watermark.

Scale note: this is a ``SimpleDataSourceStreamReader`` — offsets and
rows are produced driver-side, the right trade for the metric-tree
sizes a single Graphite node serves (the batch scan stays fully
distributed). A cluster-scale firehose would instead land points on a
message bus or parquet drop directory and use the distributed file
source; `materialize_to_parquet` is that bridge.
"""

from __future__ import annotations

import glob as globmod
import os
from datetime import datetime, timezone
from typing import Iterator, Tuple

from pyspark.sql.datasource import SimpleDataSourceStreamReader

from whisper_pandas_spark.sources.format import (
    read_file_bytes,
    read_header,
    read_points,
)


def _files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            globmod.glob(os.path.join(path, "**", "*.wsp"), recursive=True)
            + globmod.glob(os.path.join(path, "**", "*.wsp.gz"), recursive=True)
        )
    return sorted(globmod.glob(path))


class WhisperStreamReader(SimpleDataSourceStreamReader):
    """Tail the finest archive of every file under the load path."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("whisper stream source requires a load path")
        self.base_dir = options.get("base_dir")
        self.to_datetime = str(
            options.get("to_datetime") or "true"
        ).strip().lower() in ("true", "1", "yes")

    # -- offset bookkeeping -------------------------------------------------
    def initialOffset(self) -> dict:
        # start of time: the first batch picks up every stored point
        return {"wm": 0}

    def _scan(self, lo: int, hi: int | None) -> Tuple[list, int]:
        """Points with lo < ts <= hi (hi=None → no upper bound) plus the
        tree's current high-water mark."""
        from whisper_pandas_spark.sources.whisper import metric_name

        rows: list = []
        wm = lo
        for f in _files(self.path):
            info = read_header(f)
            arch = info.archives[0]
            buf = read_file_bytes(f, info.compression)
            data = read_points(buf, arch)
            metric = metric_name(f, self.base_dir)
            ts_all = data["timestamp"].astype("int64")
            mask = (ts_all > lo) if hi is None else ((ts_all > lo) & (ts_all <= hi))
            mask &= ts_all != 0
            sel = mask.nonzero()[0]
            for slot in sel:
                ts = int(ts_all[slot])
                wm = max(wm, ts)
                out_ts = (
                    datetime.fromtimestamp(ts, tz=timezone.utc)
                    if self.to_datetime
                    else ts
                )
                rows.append(
                    (metric, 0, int(slot), out_ts, float(data["value"][slot]))
                )
        return rows, wm

    # -- contract -----------------------------------------------------------
    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        rows, wm = self._scan(int(start["wm"]), None)
        return iter(rows), {"wm": wm}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        rows, _ = self._scan(int(start["wm"]), int(end["wm"]))
        return iter(rows)

    def commit(self, end: dict) -> None:  # nothing to clean up
        return None
