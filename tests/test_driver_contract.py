"""Emulate the driver's correctness gate: run every __spark_entry__
query on Spark and its oracle on DuckDB at sf0.001, compare row count,
column names/order-insensitive sorted values (strict equality after the
query's own rounding)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("KAMAE_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)
    return pdf


def _compare(spark_pdf: pd.DataFrame, ddb_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(ddb_pdf.columns), f"{name}: column mismatch"
    assert len(spark_pdf) == len(ddb_pdf), f"{name}: row count {len(spark_pdf)} vs {len(ddb_pdf)}"
    a, b = _canon(spark_pdf), _canon(ddb_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            np.testing.assert_allclose(
                av.astype(float).to_numpy(),
                bv.astype(float).to_numpy(),
                rtol=0,
                atol=1e-9,
                err_msg=f"{name}.{col}",
                equal_nan=True,
            )
        else:
            assert av.astype(str).tolist() == bv.astype(str).tolist(), f"{name}.{col}"


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(got) > 0, f"{name}: rows-only check failed"
        return
    exp = ddb.execute(oracle).df()
    _compare(got, exp, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert {"conv_id", "turn_idx", "session_id", "tool_ff", "label_asof"} <= set(df.columns)
