"""Vectorized user-function escape hatches + save/load of pickled fns."""

from __future__ import annotations

import numpy as np
import pandas as pd

from kamae_spark.core.pipeline import PipelineModel
from kamae_spark.operators.pandas_fn import MapInPandasTransformer, PandasFunctionTransformer


def _double_plus(a: pd.Series, b: pd.Series) -> pd.Series:
    return a * 2 + b


def test_pandas_function_transformer(spark):
    df = spark.createDataFrame([(1.0, 10.0), (2.0, 20.0)], "a double, b double")
    op = PandasFunctionTransformer(
        input_cols=["a", "b"], output_col="out", return_type="double", fn=_double_plus
    )
    got = PipelineModel([op]).transform(df).toPandas().sort_values("a")
    assert got["out"].tolist() == [12.0, 24.0]


def test_pandas_function_save_load(spark, tmp_path):
    df = spark.createDataFrame([(3.0, 1.0)], "a double, b double")
    op = PandasFunctionTransformer(
        input_cols=["a", "b"], output_col="out", return_type="double", fn=_double_plus
    )
    m = PipelineModel([op])
    p = str(tmp_path / "m.json")
    m.save(p)
    m2 = PipelineModel.load(p)
    assert m2.transform(df).first()["out"] == 7.0


def _batch_fn(batches):
    for pdf in batches:
        out = pdf[pdf["a"] > 1.0].copy()
        out["doubled"] = out["a"] * 2
        yield out[["a", "doubled"]]


def test_map_in_pandas_transformer(spark):
    df = spark.createDataFrame([(0.5,), (1.5,), (2.5,)], "a double")
    op = MapInPandasTransformer(schema="a double, doubled double", fn=_batch_fn)
    got = op.transform(df).toPandas().sort_values("a")
    assert got["a"].tolist() == [1.5, 2.5]
    assert got["doubled"].tolist() == [3.0, 5.0]
