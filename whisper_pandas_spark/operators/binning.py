"""Equi-depth (quantile) feature binning.

`equidepth_bins` — the ML-preprocessing discretizer (scikit-learn's
KBinsDiscretizer strategy='quantile'; Catlett's discretization): per
group, B buckets whose edges are the j/B exact quantile picks, then
each row labeled with its bucket. Equi-depth (not equi-width) bins are
what downstream consumers want for skewed features — every bucket holds
~n/B rows by construction.

Determinism (oracle-parity): edges use the engine's shared exact
quantile definition — the smallest value whose cumulative count reaches
ceil(j·n/B), computed with INTEGER ceil ((j·n + B−1) div B) so no float
ever touches the rank arithmetic — and bucket assignment is
`1 + #edges(strictly below x)`, an integer count. A SQL engine replays
every label bit-for-bit.

Scale: one groupBy collapses raw rows to the per-group distinct-value
count table (the same bounded-cardinality trick as operators/robust.py
— the cumulative windows never see raw rows), the B−1 edges per group
form a tiny broadcast table, and the labeling join + bucket count are
one broadcast join and one partial-aggregable groupBy over the input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def equidepth_edges(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_bins: int,
) -> DataFrame:
    """(group..., j, edge) for j = 1..n_bins-1: the exact j/n_bins
    quantile picks over the integer column `value_col`."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    gcols = list(group_cols)
    cnt = df.groupBy(*gcols, value_col).agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy(*gcols).orderBy(value_col)
    wall = Window.partitionBy(*gcols)
    cum = cnt.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(wall)
    )
    js = F.explode(
        F.sequence(F.lit(1), F.lit(n_bins - 1))
    ).alias("j")
    # integer ceil(j*n/B): (j*n + B - 1) div B — no float rank arithmetic
    return (
        cum.select(*gcols, value_col, "__cum", "__n")
        .select("*", js)
        .where(
            F.col("__cum")
            >= F.expr(f"(j * __n + {n_bins - 1}) div {n_bins}")
        )
        .groupBy(*gcols, "j")
        .agg(F.min(value_col).alias("edge"))
    )


def equidepth_bins(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_bins: int,
) -> DataFrame:
    """Input rows plus a `bucket` column in 1..n_bins: bucket =
    1 + (number of edges strictly below the value)."""
    gcols = list(group_cols)
    edges = equidepth_edges(df, gcols, value_col, n_bins)
    # count edges per DISTINCT value (joining raw rows first would scale
    # the count by each value's multiplicity), then label rows by value
    vals = df.select(*gcols, value_col).distinct()
    below = (
        vals.join(F.broadcast(edges), gcols)
        .where(F.col("edge") < F.col(value_col))
        .groupBy(*gcols, value_col)
        .agg(F.count(F.lit(1)).alias("__below"))
    )
    return df.join(F.broadcast(below), [*gcols, value_col], "left").withColumn(
        "bucket", (F.coalesce(F.col("__below"), F.lit(0)) + 1).cast("int")
    ).drop("__below")
