"""Data-layout clustering for scan pruning: range- and Z-order-clustered
parquet materialization.

At 100 TB the cheapest rows are the ones never read. Parquet scans prune
at two levels — files (partition/file listing) and row groups (min/max
statistics) — and BOTH only bite when the writer laid rows out so that
each file/row-group covers a narrow value range. These helpers are that
writer:

- `materialize_range_clustered`: global range partition + in-partition
  sort on the cluster columns. Perfect pruning on the LEADING column
  (row groups tile its value space), prefix-pruning on the rest — the
  right layout when one column dominates predicates.
- `materialize_zorder`: interleave the bits of (bucketized) numeric
  columns into a Z-value and range-cluster on that. Each row group then
  covers a small HYPER-RECTANGLE of the joint value space, so min/max
  stats prune on EVERY clustered column independently — the layout for
  mixed predicates (the same trick Delta's OPTIMIZE ZORDER and
  ClickHouse's order-by-tuple apply; public algorithm: the Z-order /
  Morton curve).

Both return nothing exotic — plain parquet any engine reads; the
clustering is pure layout. Scale shape: ONE range exchange (sampling +
shuffle) + the write; Z-value computation is codegen bit arithmetic
(shift/or folds), no Python, no extra pass.

Verification strategy (tests): decode the written files' row-group
min/max statistics with pyarrow and assert the geometric claim itself —
row-group bounding boxes cover a small fraction of the value space —
plus Spark-side PushedFilters, so the pruning evidence is in the bytes,
not just the plan.

No reference-repo parity: whisper_pandas stops at decoding .wsp; this
backs the engine's 100 TB scan story (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def materialize_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``:
    files tile the leading column's value space; rows are sorted within
    each file so row-group stats are tight."""
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_value(cols: list[Column], mins: list[float], maxs: list[float], bits: int = 16) -> Column:
    """Morton/Z-value of numeric columns as a codegen expression.

    Each column is scaled to a ``bits``-bit integer bucket over its
    [min, max] range (nulls -> bucket 0), then the buckets' bits are
    interleaved. Pure shift/or arithmetic — whole-stage codegen, no UDF.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds 63 bits")
    n = len(cols)
    buckets = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi) - float(lo)
        if span <= 0:
            buckets.append(F.lit(0).cast("long"))
            continue
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(
            float((1 << bits) - 1)
        )
        b = F.least(
            F.greatest(F.round(scaled).cast("long"), F.lit(0)),
            F.lit((1 << bits) - 1),
        )
        buckets.append(F.coalesce(b, F.lit(0)))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return z


def materialize_zorder(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet Z-order-clustered on numeric
    ``cluster_cols``: row groups cover small hyper-rectangles of the
    joint value space, so min/max stats prune every clustered column.

    Column ranges come from one cheap min/max aggregate (a single
    partial-agg job — at 100 TB this is the metadata-only pass every
    OPTIMIZE implementation performs)."""
    if len(cluster_cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use range clustering for 1)")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cluster_cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cluster_cols],
    ).collect()[0]
    mins = [stats[f"lo_{c}"] for c in cluster_cols]
    maxs = [stats[f"hi_{c}"] for c in cluster_cols]
    if any(v is None for v in mins + maxs):
        raise ValueError("zorder columns must have non-null min/max")
    z = zorder_value([F.col(c) for c in cluster_cols], mins, maxs, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def row_group_stats(path: str, columns: list[str]) -> list[dict]:
    """Decode per-row-group min/max for ``columns`` from the parquet
    files under ``path`` (pyarrow footer metadata — the same stats a
    scan's pruning consults). Returns one dict per row group."""
    from pathlib import Path

    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).glob("*.parquet")):
        meta = pq.ParquetFile(str(f)).metadata
        name_to_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            row = {"file": f.name, "row_group": rg, "num_rows": group.num_rows}
            for c in columns:
                st = group.column(name_to_idx[c]).statistics
                row[c] = (st.min, st.max) if st is not None else None
            out.append(row)
    return out
