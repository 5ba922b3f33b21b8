"""Round-5 reference test-matrix port, batch 12: log (ln(alpha+x) incl.
nested), round-to-decimal. Vectors from the reference's
test_log.py:24-137 and test_round_to_decimal.py:59-150."""

from __future__ import annotations

import pytest

from kamae_spark.operators.math import Log, RoundToDecimal


def _col(df, name):
    return [r[name] for r in df.orderBy("__ord").collect()]


def _approx_nested(got, exp):
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g == pytest.approx(e)


NUM_ROWS = [(0, 1, 2), (1, 4, 2), (2, 7, 8)]


@pytest.mark.parametrize(
    "col, alpha, expected",
    [
        ("col1", 1.0, [0.6931471805599453, 1.6094379124341003, 2.0794415416798357]),
        ("col2", 5.0, [1.9459101490553132, 1.9459101490553132, 2.5649493574615367]),
    ],
)
def test_log_alpha_golden(spark, col, alpha, expected):
    df = spark.createDataFrame(NUM_ROWS, "__ord int, col1 int, col2 int")
    out = Log(input_col=col, output_col="l", alpha=alpha).transform(df)
    assert _col(out, "l") == pytest.approx(expected)


def test_log_alpha_nested_golden(spark):
    """log_transform_alpha_10_expected_array, first row: ln(10+x)
    elementwise through nesting (negative x fine while alpha+x > 0)."""
    nested = [[1.0, -2.0, 3.0], [1.0, 2.0, 3.0], [1.0, 2.0, -3.0], [4.0, 2.0, -6.0]]
    df = spark.createDataFrame([(nested,)], "col1 array<array<double>>")
    out = Log(input_col="col1", output_col="l", alpha=10.0).transform(df)
    _approx_nested(out.first()["l"], [
        [2.3978952727983707, 2.0794415416798357, 2.5649493574615367],
        [2.3978952727983707, 2.4849066497880004, 2.5649493574615367],
        [2.3978952727983707, 2.4849066497880004, 1.9459101490553132],
        [2.6390573296152584, 2.4849066497880004, 1.3862943611198906],
    ])


FLOAT_ROWS = [(0, 1.53465, 2.345), (1, 4.243242, 2.234324234), (2, 7.7978, 8.547)]


@pytest.mark.parametrize(
    "col, decimals, expected",
    [
        ("col1", 2, [1.53, 4.24, 7.80]),
        ("col2", 3, [2.345, 2.234, 8.547]),
    ],
)
def test_round_to_decimal_golden(spark, col, decimals, expected):
    df = spark.createDataFrame(FLOAT_ROWS, "__ord int, col1 double, col2 double")
    out = RoundToDecimal(
        input_col=col, output_col="r", scale=decimals
    ).transform(df)
    assert _col(out, "r") == pytest.approx(expected)
