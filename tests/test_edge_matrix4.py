"""Round-5 reference-parity matrices (VERDICT r4 #3).

Pinned golden vectors ported from the reference's richest test matrices:

- IfStatement operand/column-combination matrix
  (reference tests/kamae/spark/transformers/test_if_statement.py)
- Bucketize boundary table incl. elementwise + nested arrays
  (reference tests/.../test_bucketize.py)
- ArrayCrop pad/crop combinations incl. nested + dtype variants
  (reference tests/.../test_array_crop.py)
- DateParse all-parts x edge dates (leap day, missing-default)
  (reference tests/.../test_date_parse.py)

Every expected value below is copied verbatim from the reference's
fixtures (values only, not code) so any divergence is a parity bug.
"""

from __future__ import annotations

import pytest

from kamae_spark.operators.arrays import ArrayCrop
from kamae_spark.operators.conditional import Bucketize, IfStatement, NumericalIfStatement
from kamae_spark.operators.datetimes import DateParse


# ---------------------------------------------------------------------------
# IfStatement: operand-combination matrix
# (reference test_if_statement.py fixtures expected_1..4 + string + arrays)
# ---------------------------------------------------------------------------

_NUM_ROWS = [(1, 2, 3), (4, 2, 6), (7, 8, 3)]
_STR_ROWS = [("a", "c", "a"), ("b", "c", "b"), ("a", "a", "a")]


@pytest.mark.parametrize(
    "cols, op, b_const, t_const, f_const, want",
    [
        # numeric: constant compare/results (expected_1)
        (["c1"], "geq", 4.0, 1.0, -1.0, [-1.0, 1.0, 1.0]),
        # numeric: 3 cols = input, compare, result_if_false (expected_2)
        (["c1", "c2", "c3"], "lt", None, 1.0, None, [1.0, 6.0, 1.0]),
        # numeric: 2 cols = input, result_if_true (expected_3; input is c3)
        (["c3", "c1"], "eq", 3.0, None, -1.0, [1.0, -1.0, 7.0]),
        # numeric: different input col, gt (expected_4)
        (["c2"], "gt", 5.0, 1.0, -1.0, [-1.0, -1.0, 1.0]),
    ],
)
def test_if_statement_numeric_matrix(spark, cols, op, b_const, t_const, f_const, want):
    df = spark.createDataFrame(_NUM_ROWS, "c1 int, c2 int, c3 int")
    out = IfStatement(
        input_cols=cols, output_col="o", condition_operator=op,
        value_to_compare_constant=b_const,
        result_if_true_constant=t_const,
        result_if_false_constant=f_const,
    ).transform(df)
    got = [float(r["o"]) for r in out.orderBy("c1").collect()]
    assert got == want


@pytest.mark.parametrize(
    "cols, op, b_const, t_const, f_const, want",
    [
        # string: constant compare/results (string_expected_1)
        (["c1"], "eq", "a", "TRUE", "FALSE", ["TRUE", "FALSE", "TRUE"]),
        # string: 3 cols = input, compare, result_if_false (string_expected_2)
        (["c1", "c2", "c3"], "eq", None, "TRUE", None, ["a", "b", "TRUE"]),
        # string: 2 cols = input(c3), result_if_true(c1) (string_expected_3)
        (["c3", "c1"], "eq", "a", None, "FALSE", ["a", "FALSE", "a"]),
        # string: c2 vs constant (string_expected_4)
        (["c2"], "eq", "c", "TRUE", "FALSE", ["TRUE", "TRUE", "FALSE"]),
    ],
)
def test_if_statement_string_matrix(spark, cols, op, b_const, t_const, f_const, want):
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(_STR_ROWS)],
        "idx int, c1 string, c2 string, c3 string",
    )
    out = IfStatement(
        input_cols=cols, output_col="o", condition_operator=op,
        value_to_compare_constant=b_const,
        result_if_true_constant=t_const,
        result_if_false_constant=f_const,
    ).transform(df)
    got = [r["o"] for r in out.orderBy("idx").collect()]
    assert got == want


def test_if_statement_numeric_nested_array(spark):
    # reference if_statement_transform_array_expected: geq 2.0 elementwise
    data = [[1.0, -2.0, 3.0], [1.0, 2.0, 3.0], [1.0, 2.0, -3.0], [4.0, 2.0, -6.0]]
    want = [[-1.0, -1.0, 1.0], [-1.0, 1.0, 1.0], [-1.0, 1.0, -1.0], [1.0, 1.0, -1.0]]
    df = spark.createDataFrame([(data,)], "c1 array<array<double>>")
    out = NumericalIfStatement(
        input_cols=["c1"], output_col="o", condition_operator="geq",
        value_to_compare_constant=2.0,
        result_if_true_constant=1.0, result_if_false_constant=-1.0,
    ).transform(df)
    assert out.first()["o"] == want


def test_if_statement_string_nested_array(spark):
    # reference string_if_statement_transform_array_expected: eq "a"
    data = [["a", "b", "c"], ["d", "e", "f"], ["g", "h", "i"], ["j", "k", "l"]]
    want = [["TRUE", "FALSE", "FALSE"]] + [["FALSE"] * 3] * 3
    df = spark.createDataFrame([(data,)], "c1 array<array<string>>")
    out = IfStatement(
        input_cols=["c1"], output_col="o", condition_operator="eq",
        value_to_compare_constant="a",
        result_if_true_constant="TRUE", result_if_false_constant="FALSE",
    ).transform(df)
    assert out.first()["o"] == want


# ---------------------------------------------------------------------------
# Bucketize: boundary table (reference test_bucketize.py)
# bucket = #splits strictly greater side + 1; equal values fall RIGHT
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "x, splits, want",
    [
        (1, [2.0, 3.0, 5.0], 1), (4, [2.0, 3.0, 5.0], 3), (7, [2.0, 3.0, 5.0], 4),
        (2, [1.0, 5.0, 7.0, 7.5], 2), (8, [1.0, 5.0, 7.0, 7.5], 5),
        # equal-to-split falls right (reference col1_2_3 vector: 1 -> 2)
        (1, [1.0, 5.0, 6.0, 7.0, 7.5], 2),
        (6, [1.0, 5.0, 6.0, 7.0, 7.5], 4),
        (8, [1.0, 5.0, 6.0, 7.0, 7.5], 6),
        (3, [1.0, 5.0, 6.0, 7.0, 7.5], 2),
        # single split (reference tf-parity vector [1.0])
        (0, [1.0], 1), (1, [1.0], 2), (5, [1.0], 2),
    ],
)
def test_bucketize_boundary_table(spark, x, splits, want):
    df = spark.createDataFrame([(x,)], "v int")
    out = Bucketize(input_col="v", output_col="b", splits=splits).transform(df)
    assert out.first()["b"] == want


def test_bucketize_nested_array(spark):
    # reference bucketizer_array_col1_expected rows 1-3, splits [2,3,5]
    rows = [
        ([[1.0, -2.0, 3.0], [1.0, 2.0, 3.0], [1.0, 2.0, -3.0], [4.0, 2.0, -6.0]],
         [[1, 1, 3], [1, 2, 3], [1, 2, 1], [3, 2, 1]]),
        ([[4.0, -2.0, 6.0], [4.0, -2.0, 6.0], [4.0, 2.0, -6.0], [7.0, 8.0, 3.0]],
         [[3, 1, 4], [3, 1, 4], [3, 2, 1], [4, 4, 3]]),
        ([[7.0, 8.0, 3.0], [7.0, -8.0, 3.0], [7.0, 8.0, -3.0], [-1.0, 2.0, -3.0]],
         [[4, 4, 3], [4, 1, 3], [4, 4, 1], [1, 2, 1]]),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, (v, _) in enumerate(rows)], "idx int, v array<array<double>>"
    )
    out = Bucketize(
        input_col="v", output_col="b", splits=[2.0, 3.0, 5.0]
    ).transform(df)
    got = [r["b"] for r in out.orderBy("idx").collect()]
    assert got == [w for _, w in rows]


def test_bucketize_unsorted_splits_raises():
    with pytest.raises(ValueError):
        Bucketize(input_col="v", output_col="b", splits=[10.0, 3.0, 5.0])


# ---------------------------------------------------------------------------
# ArrayCrop: pad/crop combinations (reference test_array_crop.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "dtype, rows, length, pad, want",
    [
        # strings, ragged incl. empty (expected_1)
        ("array<string>",
         [["a", "a", "a", "b", "c"], ["x", "z", "y"], ["a", "b"], ["a", "x", "a", "b"], []],
         3, "-1",
         [["a", "a", "a"], ["x", "z", "y"], ["a", "b", "-1"], ["a", "x", "a"], ["-1", "-1", "-1"]]),
        # ints (expected_2)
        ("array<int>",
         [[1, 2, 3, 4, 5], [6, 7, 8], [1, 2], []],
         3, -1,
         [[1, 2, 3], [6, 7, 8], [1, 2, -1], [-1, -1, -1]]),
        # floats (expected_3)
        ("array<float>",
         [[1.0, 2.0, 3.0, 4.0, 5.0], [6.0, 7.0, 8.0], [1.0, 2.0], []],
         3, -1.0,
         [[1.0, 2.0, 3.0], [6.0, 7.0, 8.0], [1.0, 2.0, -1.0], [-1.0, -1.0, -1.0]]),
        # crop to 1 (expected_4)
        ("array<float>",
         [[1.0, 2.0, 3.0, 4.0, 5.0], [6.0, 7.0, 8.0], [1.0, 2.0], []],
         1, -1.0,
         [[1.0], [6.0], [1.0], [-1.0]]),
        # bigints (expected_7)
        ("array<bigint>",
         [[1687087026136] * 5, [1687087026136] * 3, [1687087026136] * 2, []],
         3, -1,
         [[1687087026136] * 3, [1687087026136] * 3,
          [1687087026136, 1687087026136, -1], [-1, -1, -1]]),
    ],
)
def test_array_crop_matrix(spark, dtype, rows, length, pad, want):
    df = spark.createDataFrame([(i, r) for i, r in enumerate(rows)], f"idx int, v {dtype}")
    out = ArrayCrop(
        input_col="v", output_col="o", length=length, pad_value=pad
    ).transform(df)
    got = [r["o"] for r in out.orderBy("idx").collect()]
    assert got == want


@pytest.mark.parametrize(
    "length, pad, want",
    [
        # nested: crop innermost to 3 (expected_5)
        (3, "-1", [[["-1", "a", "b"]], [["a", "a", "b"]], [["b", "b", "b"]]]),
        # nested: pad innermost to 5 (expected_6)
        (5, "pad", [[["-1", "a", "b", "-1", "pad"]], [["a", "a", "b", "c", "pad"]],
                    [["b", "b", "b", "a", "pad"]]]),
    ],
)
def test_array_crop_nested(spark, length, pad, want):
    rows = [[["-1", "a", "b", "-1"]], [["a", "a", "b", "c"]], [["b", "b", "b", "a"]]]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "idx int, v array<array<string>>"
    )
    out = ArrayCrop(
        input_col="v", output_col="o", length=length, pad_value=pad
    ).transform(df)
    got = [r["o"] for r in out.orderBy("idx").collect()]
    assert got == want


# ---------------------------------------------------------------------------
# DateParse: parts x edge dates (reference test_date_parse.py expected_1..7
# + w_missing default). Dates: Sunday, Saturday, leap-day Saturday.
# ---------------------------------------------------------------------------

_DATES = ["2022-01-02", "2023-08-12", "2020-02-29"]


@pytest.mark.parametrize(
    "part, want",
    [
        ("MonthOfYear", [1, 8, 2]),
        ("DayOfWeek", [7, 6, 6]),       # Mon=1..Sun=7 (reference remap)
        ("Year", [2022, 2023, 2020]),
        ("DayOfYear", [2, 224, 60]),    # leap-day = day 60
        ("DayOfMonth", [2, 12, 29]),
        ("Minute", [0, 0, 0]),          # date-only input -> minute 0
    ],
)
def test_date_parse_parts_matrix(spark, part, want):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(_DATES)], "idx int, d string")
    out = DateParse(input_col="d", output_col="p", date_part=part).transform(df)
    assert [r["p"] for r in out.orderBy("idx").collect()] == want


def test_date_parse_millisecond_timestamps(spark):
    # reference expected_7: millis of the timestamp string
    ts = ["2022-01-02 17:28:32.321", "2023-08-12 18:19:20.444",
          "2020-02-29 11:23:20.212"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(ts)], "idx int, d string")
    out = DateParse(input_col="d", output_col="p", date_part="Millisecond").transform(df)
    assert [r["p"] for r in out.orderBy("idx").collect()] == [321, 444, 212]


def test_date_parse_nested_millisecond(spark):
    # reference expected_8: col6 three-level nested timestamps
    col6 = [
        [["2035-03-16 13:01:45.345"], ["2023-11-02 00:05:00.00"]],
        [["2025-03-06 23:01:45.345"], ["2090-01-02 00:05:00.00"]],
    ]
    df = spark.createDataFrame([(col6,)], "d array<array<array<string>>>")
    out = DateParse(input_col="d", output_col="p", date_part="Millisecond").transform(df)
    assert out.first()["p"] == [[[345], [0]], [[345], [0]]]


@pytest.mark.parametrize(
    "part, want_row1",
    [
        ("MonthOfYear", -1), ("DayOfWeek", -1), ("Year", -1),
        ("DayOfYear", -1), ("DayOfMonth", -1), ("Minute", -1),
        ("Millisecond", -1),
    ],
)
def test_date_parse_missing_default(spark, part, want_row1):
    # reference w_missing fixtures: empty string -> default_value
    df = spark.createDataFrame(
        [(0, ""), (1, "2023-08-12 18:19:20.444")], "idx int, d string"
    )
    out = DateParse(
        input_col="d", output_col="p", date_part=part, default_value=-1
    ).transform(df)
    rows = [r["p"] for r in out.orderBy("idx").collect()]
    assert rows[0] == want_row1
    assert rows[1] is not None and rows[1] != -1
