"""Custom stateful streaming operator: per-key EWMA smoothing via
``applyInPandasWithState`` (SURVEY.md §2.9 — the escape hatch for
semantics the built-in windowed aggregations can't express).

EWMA (exponentially weighted moving average) is the classic metric
smoother: ``ewma_t = α·x_t + (1-α)·ewma_{t-1}``. It is inherently
SEQUENTIAL per key — no tumbling/sliding window expresses it — which is
exactly the shape ``applyInPandasWithState`` exists for: Spark delivers
each key's new rows per micro-batch (Arrow-batched pandas), the operator
keeps one tiny state row (last ewma + last ts) per key in the state
store, and emits smoothed points.

Scale: state is O(#keys) × 16 B — a million metrics is megabytes. Rows
within a micro-batch arrive unordered → sorted per group here; ACROSS
micro-batches ordering relies on the source being time-ordered per key
(true for file sources replaying history and for per-key-ordered Kafka
partitions — the standard assumption for streaming EWMA).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ewma", DoubleType()),
        StructField("last_ts", LongType()),
    ]
)


def ewma_update_factory(alpha: float):
    """Returns the applyInPandasWithState update function for a given α."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ewma, last_ts = state.get
        else:
            last_ewma, last_ts = None, -1
        rows = pd.concat(list(pdfs)).sort_values("timestamp")
        out_ts, out_v, out_e = [], [], []
        for ts, v in zip(rows["timestamp"], rows["value"]):
            ep = int(ts.timestamp())
            if ep <= last_ts:
                continue  # duplicate/late beyond state: drop (slot overwrite
                # would need retraction, out of scope for append streams)
            last_ewma = v if last_ewma is None else alpha * v + (1 - alpha) * last_ewma
            last_ts = ep
            out_ts.append(ts)
            out_v.append(float(v))
            out_e.append(float(last_ewma))
        state.update((last_ewma, last_ts))
        yield pd.DataFrame(
            {
                "metric": [key[0]] * len(out_ts),
                "timestamp": out_ts,
                "value": out_v,
                "ewma": out_e,
            }
        )

    return update


def streaming_ewma(
    sdf: DataFrame,
    alpha: float = 0.2,
    key_col: str = "metric",
) -> DataFrame:
    """Per-key streaming EWMA. Input stream needs (metric, timestamp,
    value); output appends an `ewma` column, one row per accepted point."""
    return sdf.groupBy(key_col).applyInPandasWithState(
        ewma_update_factory(alpha),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
