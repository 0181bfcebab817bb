"""DoReMi-style domain reweighting: mirror-descent mixture weights
over per-domain excess loss.

Extension beyond the reference (whisper_pandas.py, a 299-line .wsp
decoder, has no modeling surface): DoReMi (Xie et al. 2023, "DoReMi:
Optimizing Data Mixtures Speeds Up Language Model Pretraining")
derives pretraining mixture weights by exponentiated-gradient /
mirror-descent updates over per-domain excess loss, then mixes with
the uniform distribution for stability. This operator implements the
weight-iteration half as the published multiplicative-weights form
(Arora-Hazan-Kale: ``w <- w * (1 + eta * excess)``, the first-order
EG update) so the ENTIRE trajectory stays in exact BIGINT arithmetic
— the same engine-portability trade the softsign classifier makes
against exp (operators/classifier.py): every step is replayable
bit-for-bit in a DuckDB oracle (unrolled CTEs, the k-means/PQ/
classifier recipe), where a float ``exp`` would drift in the last ulp
across libm implementations.

Fixed-point contract (all integers, all floor divisions on
non-negative operands — trunc == floor, identical on both engines):

- per-doc integer loss ``il`` in [0, LOSS_SCALE] (the caller converts
  its model loss once: ``round(loss * LOSS_SCALE)``),
- per-domain mean ``m_k = s_k // n_k``; overall ``m = S // N``,
- excess ``ex_k = max(0, m_k - m)`` — the hard-domain signal
  (Group-DRO upweights domains whose loss exceeds the mixture's),
- T multiplicative-weights steps from uniform ``w0 = W_SCALE``:
    ``w'  = (w * (F_SCALE + ex)) // F_SCALE``      (eta = 1/LOSS_SCALE)
    ``w'' = ((SMOOTH_DEN-1) * w' + sum(w') // K) // SMOOTH_DEN``
  (the uniform-smoothing step, c = 1/SMOOTH_DEN, per the paper).

Overflow bound: ``w <= W_SCALE * 2^T`` and the update multiplies by
``<= 2 * F_SCALE``, so T <= 8 keeps everything under 2^63 with an
~350x margin; larger T or LOSS_SCALE moves the fold to DECIMAL(38,0)
unchanged.

Scale shape: the corpus reduces to (domain, sum, count) in ONE
partial-agg exchange (map-side combined); the K-row domain table
collects to the driver (bounded — domains are a catalog, not data;
the k-means k x dim precedent) where the T-step integer recursion
runs; the (T+1) x K history frame is created directly. Nothing
corpus-sized ever recurses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LOSS_SCALE = 1_000_000  # per-doc integer-loss scale (loss in [0,1])
F_SCALE = 1_000_000  # update factor scale: w *= (F_SCALE + ex)/F_SCALE
W_SCALE = 1_000_000_000  # initial (uniform) weight per domain
SMOOTH_DEN = 100  # uniform-smoothing c = 1/SMOOTH_DEN


def doremi_weights(
    losses: DataFrame,
    domain_col: str,
    iloss_col: str,
    iters: int = 8,
) -> DataFrame:
    """Mixture-weight iteration history from per-document integer
    losses.

    *losses* carries one row per document with its domain and integer
    loss (``[0, LOSS_SCALE]``). Returns one row per (iteration 0..T,
    domain): ``iter``, the domain, the exact BIGINT weight ``w``, and
    ``weight`` — the normalized fraction within its iteration
    (round-6, the established read-off convention)."""
    if iters < 1 or iters > 8:
        raise ValueError("iters must be in 1..8 (BIGINT overflow bound)")
    spark = losses.sparkSession
    per = (
        losses.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.sum(iloss_col).cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .collect()
    )  # K rows — bounded driver read (domains are a catalog)
    if not per:
        raise ValueError("empty loss frame")
    doms = sorted(r["domain"] for r in per)
    s = {r["domain"]: int(r["s"]) for r in per}
    n = {r["domain"]: int(r["n"]) for r in per}
    total_s = sum(s.values())
    total_n = sum(n.values())
    m_all = total_s // total_n
    ex = {d: max(0, s[d] // n[d] - m_all) for d in doms}
    k = len(doms)

    w = {d: W_SCALE for d in doms}
    history: list[tuple[int, str, int]] = [(0, d, w[d]) for d in doms]
    for t in range(1, iters + 1):
        wp = {d: (w[d] * (F_SCALE + ex[d])) // F_SCALE for d in doms}
        u = sum(wp.values()) // k
        w = {d: ((SMOOTH_DEN - 1) * wp[d] + u) // SMOOTH_DEN for d in doms}
        history.extend((t, d, w[d]) for d in doms)

    hist = spark.createDataFrame(
        history, "iter int, domain string, w long"
    )
    tot = F.sum("w").over(Window.partitionBy("iter"))
    return hist.select(
        "iter",
        "domain",
        "w",
        F.round(
            F.col("w").cast("double") / tot.cast("double") + F.lit(1e-9), 6
        ).alias("weight"),
    )


def doremi_replay_sql(
    loss_cte_name: str,
    domain_expr: str,
    iloss_expr: str,
    iters: int = 8,
) -> str:
    """DuckDB CTE chain replaying :func:`doremi_weights` exactly (the
    classifier's ``training_replay_sql`` recipe). The caller provides
    the name of a CTE with one row per document; this appends the
    domain reduction + the unrolled iteration chain and leaves a CTE
    ``hist`` with columns ``iter, domain, w`` for the caller's final
    SELECT. All arithmetic is BIGINT with ``//`` floor division on
    non-negative operands — operation-for-operation the Python loop."""
    parts = [
        f"""d0_ AS MATERIALIZED (
  SELECT {domain_expr} AS domain,
         CAST(sum({iloss_expr}) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM {loss_cte_name} GROUP BY 1
)""",
        """tot_ AS MATERIALIZED (SELECT sum(s) AS ts, sum(n) AS tn,
  CAST(count(*) AS BIGINT) AS k FROM d0_)""",
        f"""ex_ AS MATERIALIZED (
  SELECT domain, greatest(0, (s // n) - (SELECT ts // tn FROM tot_)) AS ex
  FROM d0_
)""",
        f"""i0_ AS MATERIALIZED (SELECT domain, CAST({W_SCALE} AS BIGINT) AS w FROM ex_)""",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""p{t}_ AS MATERIALIZED (
  SELECT i.domain, (i.w * ({F_SCALE} + e.ex)) // {F_SCALE} AS w
  FROM i{t - 1}_ i JOIN ex_ e USING (domain)
)"""
        )
        parts.append(
            f"""i{t}_ AS MATERIALIZED (
  SELECT domain,
    (({SMOOTH_DEN - 1}) * w
     + (SELECT sum(w) FROM p{t}_) // (SELECT k FROM tot_))
    // {SMOOTH_DEN} AS w
  FROM p{t}_
)"""
        )
    hist = " UNION ALL ".join(
        f"SELECT {t} AS iter, domain, w FROM i{t}_" for t in range(iters + 1)
    )
    parts.append(f"hist AS MATERIALIZED ({hist})")
    return ",\n".join(parts)
