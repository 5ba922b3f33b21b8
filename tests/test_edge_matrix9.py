"""Round-5 reference test-matrix port, batch 5: divide operand/nesting
matrix, string-sequence-to-embedding pad/truncate/reverse goldens, and
the unix-timestamp <-> datetime family (UTC-pinned, date-only mode,
double epochs). Golden values pinned from the reference's parametrized
vectors (file:line cited per test)."""

from __future__ import annotations

import pytest

from kamae_spark.operators.datetimes import (
    DateTimeToUnixTimestamp,
    UnixTimestampToDateTime,
)
from kamae_spark.operators.math import Divide
from kamae_spark.operators.strings import StringSequenceToEmbedding


def _col(df, name):
    return [r[name] for r in df.orderBy("__ord").collect()]


def _approx_nested(got, exp):
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g == pytest.approx(e)


# -- Divide (reference test_divide.py:24-135) --------------------------------

DIV_ROWS = [
    (0, 1.0, 2.0, [[1.0, 2.0, 2.0], [1.0, 2.0, 2.0]]),
    (1, 4.0, 2.0, [[4.0, 2.0, 5.0], [4.0, 2.0, 5.0]]),
    (2, 7.0, 8.0, [[7.0, 8.0, 2.0], [7.0, 8.0, 2.0]]),
]
DIV_SCHEMA = "__ord int, col1 double, col2 double, col3 array<array<double>>"


def test_divide_constant_golden(spark):
    """divide_transform_expected_1: col1 / 5."""
    df = spark.createDataFrame(DIV_ROWS, DIV_SCHEMA)
    out = Divide(input_cols=["col1"], output_col="d", constant=5.0).transform(df)
    assert _col(out, "d") == pytest.approx([0.2, 0.8, 1.4])


def test_divide_negative_constant_golden(spark):
    """divide_transform_expected_4: col2 / -10."""
    df = spark.createDataFrame(DIV_ROWS, DIV_SCHEMA)
    out = Divide(input_cols=["col2"], output_col="d", constant=-10.0).transform(df)
    assert _col(out, "d") == pytest.approx([-0.2, -0.2, -0.8])


def test_divide_scalar_scalar_nested_fold(spark):
    """divide_transform_expected_2: (col1 / col2) / col3 — the scalar
    quotient broadcasts elementwise into the nested divisor."""
    df = spark.createDataFrame(DIV_ROWS, DIV_SCHEMA)
    out = Divide(input_cols=["col1", "col2", "col3"], output_col="d").transform(df)
    got = _col(out, "d")
    exp = [
        [[0.5, 0.25, 0.25], [0.5, 0.25, 0.25]],
        [[0.5, 1.0, 0.4], [0.5, 1.0, 0.4]],
        [[0.125, 0.109375, 0.4375], [0.125, 0.109375, 0.4375]],
    ]
    for g, e in zip(got, exp):
        _approx_nested(g, e)


def test_divide_scalar_by_nested(spark):
    """divide_transform_expected_3: col1 / col3."""
    df = spark.createDataFrame(DIV_ROWS, DIV_SCHEMA)
    out = Divide(input_cols=["col1", "col3"], output_col="d").transform(df)
    got = _col(out, "d")
    exp = [
        [[1.0, 0.5, 0.5], [1.0, 0.5, 0.5]],
        [[1.0, 2.0, 0.8], [1.0, 2.0, 0.8]],
        [[1.0, 0.875, 3.5], [1.0, 0.875, 3.5]],
    ]
    for g, e in zip(got, exp):
        _approx_nested(g, e)


# -- StringSequenceToEmbedding (reference
#    test_string_sequence_to_embedding.py:22-140) -----------------------------


def test_string_sequence_to_embedding_basic(spark):
    rows = [
        (0, "1|2|3,4|5|6,0|0|0,0|0|0"),
        (1, "7|8|9,1|1|1,0|0|0,0|0|0"),
        (2, "1|2|3"),                      # short -> pad
        (3, "1|2|3,4|5|6,7|8|9,1|1|1,9|9|9"),  # long -> truncate
    ]
    df = spark.createDataFrame(rows, "__ord int, s string")
    out = StringSequenceToEmbedding(
        input_col="s", output_col="e", seq_len=4, embedding_dim=3,
        separator="|", sequence_separator=",", pad_value="0",
    ).transform(df)
    got = _col(out, "e")
    z = [0.0, 0.0, 0.0]
    exp = [
        [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], z, z],
        [[7.0, 8.0, 9.0], [1.0, 1.0, 1.0], z, z],
        [[1.0, 2.0, 3.0], z, z, z],
        [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0], [1.0, 1.0, 1.0]],
    ]
    for g, e in zip(got, exp):
        _approx_nested(g, e)


def test_string_sequence_to_embedding_reverse(spark):
    """Reversal is positional over SUPPLIED vectors only; padding stays
    at the tail (reference test :88-140)."""
    rows = [
        (0, "1|2|3,4|5|6"),
        (1, "1|2|3"),
        (2, "1|2|3,4|5|6,7|8|9,1|1|1"),
    ]
    df = spark.createDataFrame(rows, "__ord int, s string")
    out = StringSequenceToEmbedding(
        input_col="s", output_col="e", seq_len=4, embedding_dim=3,
        separator="|", sequence_separator=",", pad_value="0", reverse=True,
    ).transform(df)
    got = _col(out, "e")
    z = [0.0, 0.0, 0.0]
    exp = [
        [[4.0, 5.0, 6.0], [1.0, 2.0, 3.0], z, z],
        [[1.0, 2.0, 3.0], z, z, z],
        [[1.0, 1.0, 1.0], [7.0, 8.0, 9.0], [4.0, 5.0, 6.0], [1.0, 2.0, 3.0]],
    ]
    for g, e in zip(got, exp):
        _approx_nested(g, e)


# -- UnixTimestampToDateTime (reference
#    test_unix_timestamp_to_date_time.py:22-245) -----------------------------

UTS_ROWS = [
    (0, 1724410227, [[3986011876, 3986011876], [3986011876, 3986011876]]),
    (1, 1587639027, [[1587639027, 4107667827], [1587639027, 4107667827]]),
    (2, 3986011876, [[3986011876, 1587639027], [3986011876, 1587639027]]),
]
UTS_SCHEMA = "__ord int, ts_s bigint, ts_arr array<array<bigint>>"


def test_unix_to_datetime_date_only(spark):
    """'seconds' unit alias + include_time=False -> yyyy-MM-dd."""
    df = spark.createDataFrame(UTS_ROWS, UTS_SCHEMA)
    out = UnixTimestampToDateTime(
        input_col="ts_s", output_col="d", unit="seconds", include_time=False
    ).transform(df)
    assert _col(out, "d") == ["2024-08-23", "2020-04-23", "2096-04-23"]


def test_unix_to_datetime_ms_include_time(spark):
    """'milliseconds' alias, full format with .SSS."""
    df = spark.createDataFrame(
        [(i, v * 1000) for i, v, _ in UTS_ROWS], "__ord int, ts_ms bigint"
    )
    out = UnixTimestampToDateTime(
        input_col="ts_ms", output_col="d", unit="milliseconds"
    ).transform(df)
    assert _col(out, "d") == [
        "2024-08-23 10:50:27.000",
        "2020-04-23 10:50:27.000",
        "2096-04-23 09:31:16.000",
    ]


def test_unix_to_datetime_nested_array(spark):
    df = spark.createDataFrame(UTS_ROWS, UTS_SCHEMA)
    out = UnixTimestampToDateTime(
        input_col="ts_arr", output_col="d", unit="s"
    ).transform(df)
    got = _col(out, "d")
    # reference unix_timestamp_to_date_time_transform_timestamp_seconds_array
    a, b, c = ("2096-04-23 09:31:16.000", "2020-04-23 10:50:27.000",
               "2100-03-02 10:50:27.000")
    assert got[0] == [[a, a], [a, a]]
    assert got[1] == [[b, c], [b, c]]
    assert got[2] == [[a, b], [a, b]]


def test_datetime_to_unix_golden_doubles(spark):
    """reference test_date_diff-adjacent family: epoch is a DOUBLE with
    millisecond fraction; ms unit multiplies by 1000."""
    df = spark.createDataFrame(
        [(0, "2024-08-23 10:50:27.500"), (1, "2020-04-23")],
        "__ord int, d string",
    )
    out_s = DateTimeToUnixTimestamp(input_col="d", output_col="u", unit="s").transform(df)
    got = _col(out_s, "u")
    assert got[0] == pytest.approx(1724410227.5)
    assert got[1] == pytest.approx(1587600000.0)  # midnight UTC
    out_ms = DateTimeToUnixTimestamp(
        input_col="d", output_col="u", unit="ms"
    ).transform(df)
    got_ms = _col(out_ms, "u")
    assert got_ms[0] == pytest.approx(1724410227500.0, abs=0.01)
    assert got_ms[1] == pytest.approx(1587600000000.0, abs=0.01)
