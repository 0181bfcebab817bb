"""Exponential-smoothing forecasts per metric series (Holt's linear
method) — the capacity-planning companion to seasonal decomposition
(operators/decompose.py) and the graphite holtWinters* family's core
recurrence, Spark-first.

Holt's recurrences are inherently SEQUENTIAL per series:

    l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})
    b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}

so the distribution unit is the SERIES, not the point: one
``collect_list`` per series (bounded by retention — the Whisper ring
guarantees a series fits a row, the same contract the reference's
whole-file reads rely on), then ONE higher-order ``aggregate`` fold in
element order. No Python, no window, one exchange for the groupBy;
millions of series parallelize across executors while each fold stays
a tight codegen loop.

Determinism / oracle-parity: the fold is left-to-right in time order
with double arithmetic written EXPRESSION-IDENTICAL to the DuckDB
``list_reduce`` replay (staged entry ``ts_holt_forecast``) — same init
(l0 = x0, b0 = x1 - x0), same recurrence text, so the states match
bit-for-bit, not within tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def holt_forecast(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    horizon: int,
) -> DataFrame:
    """h-step-ahead Holt linear forecasts per series.

    Returns one row per (series, h) for h = 1..horizon:
    (*keys, n_points, level, slope, h, yhat) with
    ``yhat = level + h * slope`` (rounded to 6). Series need >= 2 points
    (the standard l0 = x0, b0 = x1 - x0 init); shorter series are
    dropped — forecasting from one observation is a caller decision,
    not a default.
    """
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError("need 0 < alpha <= 1 and 0 <= beta <= 1")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    kcols = [F.col(k) for k in keys]
    a = F.lit(float(alpha))
    b = F.lit(float(beta))

    pts = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v")))
    )
    series = (
        df.groupBy(*kcols)
        .agg(pts.alias("__pts"))
        .withColumn("__xs", F.transform(F.col("__pts"), lambda p: p["v"].cast("double")))
        .withColumn("n_points", F.size("__xs"))
        .filter(F.col("n_points") >= 2)
    )

    def step(acc: Column, x: Column) -> Column:
        # l' appears twice on purpose — the oracle's list_reduce has no
        # let-binding, and expression-identical text is what guarantees
        # bit-parity of the recomputation
        new_l = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        new_b = (
            b * (a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"]) - acc["l"])
            + (F.lit(1.0) - b) * acc["b"]
        )
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    init = F.struct(
        F.element_at("__xs", 1).alias("l"),
        (F.element_at("__xs", 2) - F.element_at("__xs", 1)).alias("b"),
    )
    # the init state is the state AT t=0 (l0 = x0; b0 from the first
    # difference), so the recursion starts at t=1 — x1 participates in
    # both the trend init and the first update (the heuristic init that
    # makes a perfectly linear series track EXACTLY: l_t = x_t, b_t = m)
    rest = F.slice(F.col("__xs"), 2, F.size("__xs") - 1)
    state = F.aggregate(rest, init, step)
    fitted = series.withColumn("__st", state).select(
        *kcols,
        "n_points",
        F.round(F.col("__st.l"), 6).alias("level"),
        F.round(F.col("__st.b"), 6).alias("slope"),
        F.col("__st.l").alias("__l"),
        F.col("__st.b").alias("__b"),
    )
    return (
        fitted.select(
            *kcols,
            "n_points",
            "level",
            "slope",
            F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("h"),
            "__l",
            "__b",
        )
        .withColumn(
            "yhat",
            F.round(F.col("__l") + F.col("h").cast("double") * F.col("__b"), 6),
        )
        .drop("__l", "__b")
    )
