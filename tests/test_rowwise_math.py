"""Golden tests for math transformers (reference test pattern: golden
DataFrames over scalar and nested-array fixtures, SURVEY.md §5)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from kamae_spark.core.pipeline import PipelineModel
from kamae_spark.operators.math import (
    AbsoluteValue,
    BearingAngle,
    Divide,
    Exp,
    Exponent,
    HaversineDistance,
    Log,
    LogicalAnd,
    LogicalNot,
    LogicalOr,
    Max,
    Mean,
    Min,
    Modulo,
    Multiply,
    Round,
    RoundToDecimal,
    Subtract,
    Sum,
)


def test_scalar_math_golden(scalar_features):
    model = PipelineModel(
        [
            Log(input_col="col1", output_col="log1", alpha=1.0),
            Exp(input_col="col2", output_col="exp2"),
            AbsoluteValue(input_col="col3", output_col="abs3"),
            Sum(input_cols=["col1", "col2", "col3"], output_col="sum123"),
            Subtract(input_cols=["col1", "col2"], output_col="sub12"),
            Multiply(input_cols=["col1", "col2"], output_col="mul12"),
            Divide(input_cols=["col1", "col2"], output_col="div12"),
            Mean(input_cols=["col1", "col2", "col3"], output_col="mean123"),
            Max(input_cols=["col1", "col2"], output_col="max12"),
            Min(input_cols=["col1", "col2"], output_col="min12"),
            Exponent(input_cols=["col1"], output_col="pow2", constant=2.0),
            Sum(input_cols=["col1"], output_col="plus10", constant=10.0),
        ]
    )
    got = model.transform(scalar_features).toPandas().sort_values("col1")
    c1, c2, c3 = got["col1"], got["col2"], got["col3"]
    np.testing.assert_allclose(got["log1"], np.log(1.0 + c1), atol=1e-9)
    np.testing.assert_allclose(got["exp2"], np.exp(c2), atol=1e-9)
    np.testing.assert_allclose(got["abs3"], np.abs(c3))
    np.testing.assert_allclose(got["sum123"], c1 + c2 + c3)
    np.testing.assert_allclose(got["sub12"], c1 - c2)
    np.testing.assert_allclose(got["mul12"], c1 * c2)
    np.testing.assert_allclose(got["div12"], c1 / c2)
    np.testing.assert_allclose(got["mean123"], (c1 + c2 + c3) / 3)
    np.testing.assert_allclose(got["max12"], np.maximum(c1, c2))
    np.testing.assert_allclose(got["min12"], np.minimum(c1, c2))
    np.testing.assert_allclose(got["pow2"], c1**2)
    np.testing.assert_allclose(got["plus10"], c1 + 10)


def test_nested_array_elementwise(nested_arrays):
    got = (
        PipelineModel([AbsoluteValue(input_col="col1", output_col="a")])
        .transform(nested_arrays)
        .toPandas()
    )
    for row_in, row_out in zip(got["col1"], got["a"]):
        exp = [[abs(v) for v in inner] for inner in row_in]
        assert [list(x) for x in row_out] == exp


def test_array_scalar_broadcast(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0], 10.0)], "arr array<double>, s double"
    )
    got = (
        PipelineModel([Sum(input_cols=["arr", "s"], output_col="out")])
        .transform(df)
        .toPandas()
    )
    assert list(got["out"][0]) == [11.0, 12.0]


@pytest.mark.parametrize(
    "x,y,expected",
    [(7.0, 3.0, 1.0), (-7.0, 3.0, 2.0), (7.0, -3.0, 1.0), (-7.0, -3.0, -4.0)],
)
def test_modulo_divisor_sign(spark, x, y, expected):
    """Reference rule (modulo.py:182-190): C remainder, + divisor only
    when negative — floormod for y>0, keeps positive remainders for y<0
    (3.0 mod -1.2 = 0.6 pinned by the reference's own array vector)."""
    df = spark.createDataFrame([(x, y)], "a double, b double")
    got = (
        PipelineModel([Modulo(input_cols=["a", "b"], output_col="m")])
        .transform(df)
        .first()["m"]
    )
    assert got == expected


def test_round_modes(spark):
    df = spark.createDataFrame([(2.5,), (-1.3,), (1.7,)], "x double")
    model = PipelineModel(
        [
            Round(input_col="x", output_col="r", mode="round"),
            Round(input_col="x", output_col="f", mode="floor"),
            Round(input_col="x", output_col="c", mode="ceil"),
            RoundToDecimal(input_col="x", output_col="d", scale=0),
        ]
    )
    got = model.transform(df).toPandas().sort_values("x").reset_index(drop=True)
    assert got["f"].tolist() == [-2.0, 1.0, 2.0]
    assert got["c"].tolist() == [-1.0, 2.0, 3.0]
    assert got["r"].tolist() == [-1.0, 2.0, 3.0]


def test_logical_ops(spark):
    df = spark.createDataFrame(
        [(True, False), (True, True), (False, False)], "a boolean, b boolean"
    )
    model = PipelineModel(
        [
            LogicalAnd(input_cols=["a", "b"], output_col="and_"),
            LogicalOr(input_cols=["a", "b"], output_col="or_"),
            LogicalNot(input_col="a", output_col="not_"),
        ]
    )
    got = model.transform(df).toPandas()
    assert got["and_"].tolist() == [x and y for x, y in zip(got["a"], got["b"])]
    assert got["or_"].tolist() == [x or y for x, y in zip(got["a"], got["b"])]
    assert got["not_"].tolist() == [not x for x in got["a"]]


def _haversine(lat1, lon1, lat2, lon2):
    p = math.pi / 180
    a = (
        math.sin((lat2 - lat1) * p / 2) ** 2
        + math.cos(lat1 * p) * math.cos(lat2 * p) * math.sin((lon2 - lon1) * p / 2) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def test_haversine_and_bearing(spark):
    rows = [(51.5074, -0.1278, 40.7128, -74.0060), (0.0, 0.0, 0.0, 90.0)]
    df = spark.createDataFrame(rows, "lat1 double, lon1 double, lat2 double, lon2 double")
    model = PipelineModel(
        [
            HaversineDistance(
                input_cols=["lat1", "lon1", "lat2", "lon2"], output_col="dist"
            ),
            BearingAngle(input_cols=["lat1", "lon1", "lat2", "lon2"], output_col="brg"),
            HaversineDistance(
                input_cols=["lat1", "lon1"],
                output_col="dist_const",
                lat_lon_constant=[40.7128, -74.0060],
            ),
        ]
    )
    got = model.transform(df).toPandas()
    for i, (la1, lo1, la2, lo2) in enumerate(rows):
        assert abs(got["dist"][i] - _haversine(la1, lo1, la2, lo2)) < 1e-6
    # equator eastward bearing is 90 degrees
    assert abs(got["brg"][1] - 90.0) < 1e-9
    assert abs(got["dist_const"][0] - _haversine(*rows[0])) < 1e-6


def test_out_of_bounds_latlon_is_null(spark):
    df = spark.createDataFrame([(95.0, 0.0, 0.0, 0.0)], "lat1 double, lon1 double, lat2 double, lon2 double")
    got = (
        PipelineModel(
            [HaversineDistance(input_cols=["lat1", "lon1", "lat2", "lon2"], output_col="d")]
        )
        .transform(df)
        .first()["d"]
    )
    assert got is None
