"""Round-6 staged entries: full value-level Spark-vs-DuckDB comparison
TODAY (same compare the driver runs), so promotion next round is a
one-line registry change with zero new risk."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from whisper_pandas_spark.queries_round6 import STAGED

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_entry_matches_duckdb(spark, duck, name):
    fn, oracle = STAGED[name]
    sdf = fn(spark, SF_DIR).toPandas()
    ddf = duck.execute(oracle).fetchdf()
    assert len(sdf) == len(ddf), (len(sdf), len(ddf))
    assert sorted(sdf.columns) == sorted(ddf.columns)
    s = sdf[sorted(sdf.columns)].sort_values(list(sorted(sdf.columns))).reset_index(drop=True)
    d = ddf[sorted(ddf.columns)].sort_values(list(sorted(ddf.columns))).reset_index(drop=True)
    for c in s.columns:
        if s[c].dtype.kind in "fc" or d[c].dtype.kind in "fc":
            a = pd.to_numeric(s[c]).to_numpy(dtype=float)
            b = pd.to_numeric(d[c]).to_numpy(dtype=float)
            assert np.allclose(a, b, atol=1e-9, equal_nan=True), (name, c)
        else:
            assert (s[c].astype(str) == d[c].astype(str)).all(), (name, c)


def test_promote_registers_every_staged_entry_with_oracle():
    """Round-6 promotion integrity: registry import promotes every staged
    entry into the live QUERIES/ORACLES with its exact fn and oracle, and
    any still-unrecorded entry sorts ahead of the green refresh bucket so
    the driver's bounded sweep records it first.

    The ordering half is scoped to entries with NO CORRECTNESS record:
    once the driver sweeps them (green), ``registry._reorder`` correctly
    moves them to the END of the green bucket (newest record last), so
    asserting the pre-sweep ordering for recorded entries would encode a
    transient state and go red the moment CORRECTNESS_rNN.json lands
    (exactly what happened between the r6 gate run and the r6 judgment).
    """
    from whisper_pandas_spark import registry
    from whisper_pandas_spark.queries_round6 import STAGED
    from whisper_pandas_spark.registry import ORACLES, QUERIES

    for name, (fn, oracle) in STAGED.items():
        assert QUERIES[name] is fn
        assert ORACLES[name] == oracle
    order = list(QUERIES)
    unrecorded = [n for n in STAGED if n not in registry._latest]
    if unrecorded:
        green = [
            i
            for i, n in enumerate(order)
            if registry._order_key(n)[0] == 2
        ]
        first_green = min(green) if green else len(order)
        assert max(order.index(n) for n in unrecorded) < first_green or not green, (
            unrecorded,
            order[:5],
        )
