"""Round-5 reference test-matrix port, batch 9: bearing-angle goldens
and N-ary fold goldens (sum/multiply/subtract over 3 columns). Vectors
from the reference's test_bearing_angle.py:20-58, test_sum.py:45-57,
test_multiply.py:46-58, test_subtract.py (expected_2)."""

from __future__ import annotations

import pytest

from kamae_spark.operators.math import BearingAngle, Multiply, Subtract, Sum


def _col(df, name):
    return [r[name] for r in df.orderBy("__ord").collect()]


def test_bearing_angle_golden(spark):
    rows = [
        (0, -12.05, -77.04, 37.77, -122.42),
        (1, 39.90, 116.41, -33.87, 151.21),
        (2, 39.90, 116.41, -12.05, -77.04),
    ]
    df = spark.createDataFrame(
        rows, "__ord int, lat1 double, lon1 double, lat2 double, lon2 double"
    )
    out = BearingAngle(
        input_cols=["lat1", "lon1", "lat2", "lon2"], output_col="b"
    ).transform(df)
    assert _col(out, "b") == pytest.approx(
        [321.7967, 151.2820, 26.8186], abs=1e-4
    )


def test_bearing_angle_lat_lon_constant(spark):
    """2 input cols + lat_lon_constant destination equals the 4-col form."""
    rows = [(0, -12.05, -77.04), (1, 39.90, 116.41)]
    df = spark.createDataFrame(rows, "__ord int, lat1 double, lon1 double")
    out = BearingAngle(
        input_cols=["lat1", "lon1"], output_col="b",
        lat_lon_constant=[37.77, -122.42],
    ).transform(df)
    got = _col(out, "b")
    assert got[0] == pytest.approx(321.7967, abs=1e-4)


NARY_ROWS = [(0, 1, 2, 3), (1, 4, 2, 6), (2, 7, 8, 3)]
NARY_SCHEMA = "__ord int, col1 int, col2 int, col3 int"


@pytest.mark.parametrize(
    "op, expected",
    [
        (Sum, [6, 12, 18]),
        (Multiply, [6, 48, 168]),
        (Subtract, [-4, -4, -4]),
    ],
)
def test_nary_fold_golden(spark, op, expected):
    df = spark.createDataFrame(NARY_ROWS, NARY_SCHEMA)
    out = op(input_cols=["col1", "col2", "col3"], output_col="o").transform(df)
    assert _col(out, "o") == expected
