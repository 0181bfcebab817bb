"""In-engine trainable linear classifier (quality-gate learning).

Full-batch gradient descent for a logistic-style linear model whose link
is the SOFTSIGN squash ``p = 0.5 * (1 + m / (1 + |m|))`` instead of the
logistic sigmoid — a deliberate engine-portability choice: softsign is
pure +,*,/,|·| (every op correctly rounded under IEEE-754), so the
entire training trajectory is bit-identical on any engine, whereas
``exp`` differs in the last ulp between libm implementations and would
eventually flip a rounded decimal. This is what lets the
`text_quality_classifier` registry entry replay TRAINING ITSELF in the
DuckDB oracle (unrolled per-iteration CTEs, the `kmeans`/`PQ` recipe).

Scale shape: per iteration ONE partial-agg exchange over the corpus
producing k+1 gradient sums (map-side combined; the shuffle carries a
handful of DECIMAL cells per task), and the driver holds only the
weight vector — the same bounded-driver pattern as k-means/BPE. Row
count is computed once. Gradient sums fold through DECIMAL(38,12), so
the fit is independent of partitioning (asserted in tests).

The model is the learning-based face of the quality-scoring family
(operators/textstats.py provides the hand-tuned heuristics; this learns
weights from labels — e.g. a seed set of known-good/known-bad docs in a
training-data pipeline).

No reference parity: whisper_pandas has no modeling surface; SURVEY
§2.11 pipeline engineering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _margin(w: list[float], feature_cols: list[str]) -> Column:
    # feature terms first, bias LAST — the exact left-to-right addition
    # order the SQL replay uses (double addition is not associative, so
    # the order is part of the contract)
    m = F.lit(float(w[0])) * F.col(feature_cols[0])
    for wj, c in zip(w[1:-1], feature_cols[1:]):
        m = m + F.lit(float(wj)) * F.col(c)
    return m + F.lit(float(w[-1]))


def _softsign_prob(m: Column) -> Column:
    return F.lit(0.5) * (F.lit(1.0) + m / (F.lit(1.0) + F.abs(m)))


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    lr: float = 1.0,
) -> list[float]:
    """Fit weights ``[w_1..w_k, bias]`` by full-batch gradient descent
    on the softsign-link model, starting from zeros. ``label_col`` is
    0/1 (numeric or boolean). Returns plain Python floats — the whole
    model state, suitable for broadcasting into `logreg_score`.

    The frame is scanned once per iteration; for many iterations over an
    expensive upstream plan, persist/checkpoint the feature frame first
    (the trainer deliberately does not cache on the caller's behalf —
    cache lifetime belongs to the owner of the DataFrame)."""
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    y = F.col(label_col).cast("double")
    n = df.count()
    if n == 0:
        raise ValueError("empty training frame")
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(iters):
        p = _softsign_prob(_margin(w, feature_cols))
        err = p - y
        aggs = [
            F.sum((err * F.col(c)).cast("decimal(38,12)")).alias(f"g{j}")
            for j, c in enumerate(feature_cols)
        ] + [F.sum(err.cast("decimal(38,12)")).alias("gb")]
        row = df.agg(*aggs).collect()[0]
        grads = [float(row[f"g{j}"]) for j in range(len(feature_cols))] + [
            float(row["gb"])
        ]
        w = [wj - lr * g / n for wj, g in zip(w, grads)]
    return w


def logreg_score(
    df: DataFrame, w: list[float], feature_cols: list[str]
) -> DataFrame:
    """Attach ``margin``, ``prob`` (softsign link), and ``pred``
    (prob >= 0.5, i.e. margin >= 0) columns — pure codegen expressions,
    scan-shaped."""
    m = _margin(w, feature_cols)
    return (
        df.withColumn("margin", m)
        .withColumn("prob", _softsign_prob(F.col("margin")))
        .withColumn("pred", F.col("margin") >= 0)
    )


def training_replay_sql(
    feats_cte: str,
    feature_exprs: list[str],
    label_expr: str,
    iters: int,
    lr: float,
) -> str:
    """Generate the DuckDB SQL that replays `logreg_train` exactly:
    ``feats_cte`` must define a relation ``feats`` with the feature
    expressions and label available; returns the WITH-chain defining
    ``w{iters}`` with columns ``w0..w{k-1}, wb``. The caller appends its
    own SELECT using the final weights. Every arithmetic step mirrors
    the Python trainer operation-for-operation (softsign link, DECIMAL
    gradient folds, ``w - lr*g/n`` update order)."""
    k = len(feature_exprs)
    parts = [feats_cte]
    parts.append(
        "cnt AS (SELECT count(*) AS n FROM feats)"
    )
    w_cols = ", ".join(
        [f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(k)]
        + ["CAST(0.0 AS DOUBLE) AS wb"]
    )
    parts.append(f"w0_ AS (SELECT {w_cols})")
    for it in range(iters):
        m = " + ".join([f"w.w{j} * f.x{j}" for j in range(k)] + ["w.wb"])
        p = f"(0.5 * (1.0 + ({m}) / (1.0 + abs({m}))))"
        gsel = ", ".join(
            [
                f"sum(CAST(({p} - f.y) * f.x{j} AS DECIMAL(38,12))) AS g{j}"
                for j in range(k)
            ]
            + [f"sum(CAST(({p} - f.y) AS DECIMAL(38,12))) AS gb"]
        )
        parts.append(
            f"g{it}_ AS (SELECT {gsel} FROM feats f CROSS JOIN w{it}_ w)"
        )
        upd = ", ".join(
            [
                f"w.w{j} - {lr} * CAST(g.g{j} AS DOUBLE) / cnt.n AS w{j}"
                for j in range(k)
            ]
            + [f"w.wb - {lr} * CAST(g.gb AS DOUBLE) / cnt.n AS wb"]
        )
        parts.append(
            f"w{it + 1}_ AS (SELECT {upd} FROM g{it}_ g "
            f"CROSS JOIN w{it}_ w CROSS JOIN cnt)"
        )
    return "WITH " + ",\n".join(parts)
