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
    the never-recorded entries sort ahead of the long-green ones so the
    driver's bounded sweep records them first."""
    from whisper_pandas_spark.queries_round6 import STAGED
    from whisper_pandas_spark.registry import ORACLES, QUERIES

    for name, (fn, oracle) in STAGED.items():
        assert QUERIES[name] is fn
        assert ORACLES[name] == oracle
    order = list(QUERIES)
    # every staged (no CORRECTNESS record yet at promotion time) entry
    # must precede the oldest-green refresh bucket's tail
    staged_pos = max(order.index(n) for n in STAGED)
    assert staged_pos < len(order) - len(STAGED), order[:5]
