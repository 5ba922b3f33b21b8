"""Round-5 reference test-matrix port, batch 3: modulo operand matrix,
numerical-if-statement operand matrix, date-diff (incl. missing-date
defaults and scalar-vs-nested broadcast), sub-string-delim-at-index,
current-date-family shape broadcast, and min-hash mask/null properties.
Golden values pinned from the reference's parametrized vectors
(file:line cited per test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamae_spark.core.pipeline import PipelineModel
from kamae_spark.operators.conditional import NumericalIfStatement
from kamae_spark.operators.datetimes import (
    CurrentDate,
    CurrentDateTime,
    CurrentUnixTimestamp,
    DateDiff,
)
from kamae_spark.operators.hashing import MinHashIndex
from kamae_spark.operators.math import Modulo
from kamae_spark.operators.strings import SubStringDelimAtIndex


def _col(df, name):
    return [r[name] for r in df.orderBy("__ord").collect()]


def _approx_nested(got, exp):
    """Row-by-row approx for [[float]] nests (pytest.approx is flat-only)."""
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g == pytest.approx(e)


# -- Modulo (reference test_modulo.py:125-191) -------------------------------

NESTED_A = [[1.0, -2.0, 3.0], [1.0, 2.0, 3.0], [1.0, 2.0, -3.0], [4.0, 2.0, -6.0]]
NESTED_B = [[4.0, 5.0, -1.2], [41.0, -89.45, 56.5], [14.0, -6.0, 9.5], [43.45, -2.0, 4.5]]


@pytest.mark.parametrize(
    "col, divisor, expected",
    [
        # reference modulo_transform_expected_col1_mod_4 / col2_mod_7
        ("a", 4, [2, 3, 0]),
        ("b", 7, [5, 6, 2]),
    ],
)
def test_modulo_constant_golden(spark, col, divisor, expected):
    df = spark.createDataFrame(
        [(0, 10, 5), (1, 31, 6), (2, 56, 9)], "__ord int, a int, b int"
    )
    out = Modulo(input_cols=[col], output_col="m", constant=float(divisor)).transform(df)
    assert _col(out, "m") == pytest.approx(expected)


def test_modulo_two_columns_golden(spark):
    """reference modulo_transform_expected_col1_col2: 10%5, 31%6, 56%9."""
    df = spark.createDataFrame(
        [(0, 10, 5), (1, 31, 6), (2, 56, 9)], "__ord int, a int, b int"
    )
    out = Modulo(input_cols=["a", "b"], output_col="m").transform(df)
    assert _col(out, "m") == [0, 1, 2]


def test_modulo_nested_constant_golden(spark):
    """reference mod_transform_array_col1 (mod 3): pure floor-mod since
    the divisor is positive."""
    df = spark.createDataFrame([(NESTED_A,)], "col1 array<array<double>>")
    out = Modulo(input_cols=["col1"], output_col="m", constant=3.0).transform(df)
    _approx_nested(
        out.first()["m"],
        [[1.0, 1.0, 0.0], [1.0, 2.0, 0.0], [1.0, 2.0, 0.0], [1.0, 2.0, 0.0]],
    )


def test_modulo_nested_two_columns_golden(spark):
    """reference mod_transform_array_col1_col2 — pins the asymmetric
    negative-divisor rule: 3.0 mod -1.2 keeps the POSITIVE C remainder
    0.6 (true floormod would give -0.6; reference modulo.py:182-190
    only adds the divisor when the remainder is negative)."""
    df = spark.createDataFrame(
        [(NESTED_A, NESTED_B)],
        "col1 array<array<double>>, col2 array<array<double>>",
    )
    out = Modulo(input_cols=["col1", "col2"], output_col="m").transform(df)
    _approx_nested(
        out.first()["m"],
        [[1.0, 3.0, 0.6000000000000001], [1.0, 2.0, 3.0], [1.0, 2.0, 6.5], [4.0, 0.0, 3.0]],
    )


# -- NumericalIfStatement (reference test_numerical_if_statement.py:129-186) --

NIF_ROWS = [(0, 1, 2, 3), (1, 4, 2, 6), (2, 7, 8, 3)]


@pytest.mark.parametrize(
    "input_cols, kw, expected",
    [
        # case 1: col1 >= 4 ? 1 : -1
        (["col1"],
         dict(condition_operator="geq", value_to_compare_constant=4.0,
              result_if_true_constant=1.0, result_if_false_constant=-1.0),
         [-1.0, 1.0, 1.0]),
        # case 2: col1 < col2 ? 1 : col3 (operands fill in column order)
        (["col1", "col2", "col3"],
         dict(condition_operator="lt", result_if_true_constant=1.0),
         [1.0, 6.0, 1.0]),
        # case 3: col3 == 3 ? col1 : -1
        (["col3", "col1"],
         dict(condition_operator="eq", value_to_compare_constant=3.0,
              result_if_false_constant=-1.0),
         [1.0, -1.0, 7.0]),
        # case 4: col2 > 5 ? 1 : -1
        (["col2"],
         dict(condition_operator="gt", value_to_compare_constant=5.0,
              result_if_true_constant=1.0, result_if_false_constant=-1.0),
         [-1.0, -1.0, 1.0]),
    ],
)
def test_numerical_if_statement_golden(spark, input_cols, kw, expected):
    df = spark.createDataFrame(NIF_ROWS, "__ord int, col1 int, col2 int, col3 int")
    out = NumericalIfStatement(input_cols=input_cols, output_col="o", **kw).transform(df)
    assert [float(v) for v in _col(out, "o")] == pytest.approx(expected)


def test_numerical_if_statement_nested_golden(spark):
    """reference numerical_if_statement_transform_array_expected:
    col1 >= 2 ? 1 : -1 elementwise through the nested array."""
    df = spark.createDataFrame([(NESTED_A,)], "col1 array<array<double>>")
    out = NumericalIfStatement(
        input_cols=["col1"], output_col="o", condition_operator="geq",
        value_to_compare_constant=2.0, result_if_true_constant=1.0,
        result_if_false_constant=-1.0,
    ).transform(df)
    _approx_nested(
        out.first()["o"],
        [[-1.0, -1.0, 1.0], [-1.0, 1.0, 1.0], [-1.0, 1.0, -1.0], [1.0, 1.0, -1.0]],
    )


# -- DateDiff (reference test_date_diff.py:25-297) ---------------------------

DD_NESTED = [["2019-01-02"] * 4, ["2019-01-02"] * 4]


def test_date_diff_scalar_vs_nested_broadcast(spark):
    """reference date_diff_transform_expected_1: scalar col2 diffs
    elementwise against every element of nested col3."""
    rows = [
        (0, "2019-01-01", [["2019-01-02"] * 4] * 2),
        (1, "2019-01-01", [["2019-01-03"] * 4] * 2),
        (2, "2019-01-01", [["2019-01-04"] * 4] * 2),
    ]
    df = spark.createDataFrame(
        rows, "__ord int, col2 string, col3 array<array<string>>"
    )
    out = DateDiff(input_cols=["col2", "col3"], output_col="d").transform(df)
    assert _col(out, "d") == [[[n] * 4] * 2 for n in (1, 2, 3)]


def test_date_diff_timestamps_calendar_days(spark):
    """reference date_diff_transform_expected_2: timestamp strings diff
    at DATE granularity (calendar days, time-of-day ignored)."""
    rows = [
        (0, "2019-01-01 17:28:32", "2019-01-05 18:28:32"),
        (1, "2019-01-01 15:28:32", "2019-01-03 17:40:32"),
        (2, "2019-01-01 18:35:28", "2019-01-04 17:15:12"),
    ]
    df = spark.createDataFrame(rows, "__ord int, col4 string, col5 string")
    out = DateDiff(input_cols=["col4", "col5"], output_col="d").transform(df)
    assert _col(out, "d") == [4, 2, 3]


def test_date_diff_missing_default_nested(spark):
    """reference date_diff_transform_w_missing_expected_1: empty string
    on EITHER side -> default_value, elementwise through nesting."""
    rows = [
        (0, "", [["2019-01-02"] * 4] * 2),
        (1, "2019-01-01", [["2019-01-03", "", "2019-01-03", "2019-01-03"],
                           ["2019-01-03", "2019-01-03", "2019-01-03", ""]]),
        (2, "", [["2019-01-04"] * 4] * 2),
    ]
    df = spark.createDataFrame(
        rows, "__ord int, col2 string, col3 array<array<string>>"
    )
    out = DateDiff(
        input_cols=["col2", "col3"], output_col="d", default_value=-1
    ).transform(df)
    assert _col(out, "d") == [
        [[-1] * 4] * 2,
        [[2, -1, 2, 2], [2, 2, 2, -1]],
        [[-1] * 4] * 2,
    ]


def test_date_diff_missing_default_scalar(spark):
    """reference date_diff_transform_w_missing_expected_2."""
    rows = [
        (0, "2019-01-01 17:28:32", "2019-01-05 18:28:32"),
        (1, "2019-01-01 15:28:32", "2019-01-03 17:40:32"),
        (2, "2019-01-01 18:35:28", ""),
    ]
    df = spark.createDataFrame(rows, "__ord int, col4 string, col5 string")
    out = DateDiff(
        input_cols=["col4", "col5"], output_col="d", default_value=-1
    ).transform(df)
    assert _col(out, "d") == [4, 2, -1]


# -- SubStringDelimAtIndex (reference test_sub_string_delim_at_index.py) -----


@pytest.mark.parametrize(
    "col, delimiter, index, default, expected",
    [
        # reference :140-183
        ("col1", " ", 0, "NOT_FOUND", ["hello", "adventure", "begins"]),
        ("col1", " ", 1, "NOT_FOUND", ["world", "time", "NOT_FOUND"]),
        ("col2", "_", 1, "NOT_FOUND", ["US", "CA", "US"]),
        # empty delimiter -> character at index
        ("col1", "", 3, "NOT_FOUND", ["l", "e", "i"]),
    ],
)
def test_sub_string_delim_scalar_golden(spark, col, delimiter, index, default, expected):
    rows = [
        (0, "hello world", "en_US"),
        (1, "adventure time", "en_CA"),
        (2, "begins", "es_US"),
    ]
    df = spark.createDataFrame(rows, "__ord int, col1 string, col2 string")
    out = SubStringDelimAtIndex(
        input_col=col, output_col="s", delimiter=delimiter, index=index,
        default_value=default,
    ).transform(df)
    assert _col(out, "s") == expected


def test_sub_string_delim_array_golden(spark):
    """reference sub_string_delim_transform_col3_expected."""
    rows = [
        (0, ["en_US", "en_US", "en_US"]),
        (1, ["en_CA", "ch_CH", "es_US"]),
        (2, ["es_BR", "ch_CH", "es_US"]),
    ]
    df = spark.createDataFrame(rows, "__ord int, col3 array<string>")
    out = SubStringDelimAtIndex(
        input_col="col3", output_col="s", delimiter="_", index=0,
        default_value="NOT_FOUND",
    ).transform(df)
    assert _col(out, "s") == [["en", "en", "en"], ["en", "ch", "es"], ["es", "ch", "es"]]


def test_sub_string_delim_nested_golden(spark):
    """reference sub_string_delim_at_index_nested_arrays: '?' at 1 with
    DEFAULT for out-of-bounds; trailing empty splits drop (Java split),
    so 'k?l?' -> 'l' and 'a' -> DEFAULT."""
    data = [["a", "b?c", "c?d"], ["d?e", "e?f", "f?g"],
            ["g?h", "h?i", "i?j"], ["j?k", "k?l?", "l?m?n?o"]]
    df = spark.createDataFrame([(data,)], "col1 array<array<string>>")
    out = SubStringDelimAtIndex(
        input_col="col1", output_col="s", delimiter="?", index=1,
        default_value="DEFAULT",
    ).transform(df)
    assert out.first()["s"] == [["DEFAULT", "c", "d"], ["e", "f", "g"],
                               ["h", "i", "j"], ["k", "l", "m"]]


# -- CurrentDate family: shape broadcast (reference test_current_date.py) ----


def test_current_date_scalar_and_array_shape(spark):
    """reference current_date_transform_expected_1/2: with an input
    column the constant broadcasts into its array shape."""
    df = spark.createDataFrame(
        [(0, "2022-01-02", ["2022-01-02", "2022-01-02"])],
        "__ord int, col5 string, col5a array<string>",
    )
    model = PipelineModel([
        CurrentDate(output_col="d_scalar", input_col="col5", now="2020-12-31 10:00:00"),
        CurrentDate(output_col="d_arr", input_col="col5a", now="2020-12-31 10:00:00"),
        CurrentDate(output_col="d_noinput", now="2020-12-31 10:00:00"),
    ])
    row = model.transform(df).first()
    assert row["d_scalar"] == "2020-12-31"
    assert row["d_arr"] == ["2020-12-31", "2020-12-31"]
    assert row["d_noinput"] == "2020-12-31"


def test_current_date_nested_shape(spark):
    """reference current_date_transform_expected_array: 3-level nesting."""
    df = spark.createDataFrame(
        [([[["a", "b"], ["c", "d"]], [["e", "f"], ["g", "h"]]],)],
        "col1 array<array<array<string>>>",
    )
    out = CurrentDate(
        output_col="d", input_col="col1", now="2024-02-29 00:30:00"
    ).transform(df)
    assert out.first()["d"] == [
        [["2024-02-29"] * 2] * 2, [["2024-02-29"] * 2] * 2
    ]


def test_current_datetime_and_unix_shape(spark):
    df = spark.createDataFrame(
        [(["x", "y"],)], "col array<string>"
    )
    model = PipelineModel([
        CurrentDateTime(output_col="dt", input_col="col", now="2020-12-31 10:00:01"),
        CurrentUnixTimestamp(output_col="ts", input_col="col", unit="s",
                             now="2020-12-31 10:00:01"),
    ])
    row = model.transform(df).first()
    assert row["dt"] == ["2020-12-31 10:00:01.000"] * 2
    assert row["ts"] == [1609408801] * 2


# -- MinHashIndex mask/null properties (reference test_min_hash_index.py) ----


def test_min_hash_mask_equals_no_mask(spark):
    """reference :387-427: masked values must not contribute — the
    signature equals the one over the pre-filtered array."""
    rows_masked = [(0, ["a", "-1", "c"]), (1, ["-1", "b", "-1", "d"])]
    rows_clean = [(0, ["a", "c"]), (1, ["b", "d"])]
    dfm = spark.createDataFrame(rows_masked, "__ord int, col array<string>")
    dfc = spark.createDataFrame(rows_clean, "__ord int, col array<string>")
    t = MinHashIndex(input_col="col", output_col="sig", num_permutations=10,
                     mask_value="-1")
    assert _col(t.transform(dfm), "sig") == _col(t.transform(dfc), "sig")


def test_min_hash_nulls_filtered(spark):
    """reference :429-455: None elements are dropped before hashing."""
    with_nulls = spark.createDataFrame(
        [(0, ["a", None, "c"]), (1, ["a", "c", None])],
        "__ord int, col array<string>",
    )
    without = spark.createDataFrame(
        [(0, ["a", "c"]), (1, ["a", "c"])], "__ord int, col array<string>"
    )
    t = MinHashIndex(input_col="col", output_col="sig", num_permutations=25)
    got_w = _col(t.transform(with_nulls), "sig")
    got_wo = _col(t.transform(without), "sig")
    assert got_w == got_wo
    assert got_w[0] == got_w[1]


def test_min_hash_all_masked_falls_back_to_empty_token(spark):
    """All-masked / empty residue hashes [''] so the signature is total
    (reference min_hash_udf:179-181 appends '' to an empty label list)."""
    df = spark.createDataFrame(
        [(0, ["-1", "-1"]), (1, [])], "__ord int, col array<string>"
    )
    t = MinHashIndex(input_col="col", output_col="sig", num_permutations=5,
                     mask_value="-1")
    got = _col(t.transform(df), "sig")
    assert got[0] == got[1]
    assert all(v is not None for v in got[0])
