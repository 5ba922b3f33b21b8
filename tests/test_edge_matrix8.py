"""Round-5 reference test-matrix port, batch 4: bin label typing,
nested cosine similarity, innermost-axis array split, array subtract
minimum pad matrix, ordinal array encode, nested min-max fit, impute
transform (string + nested numeric). Golden values pinned from the
reference's parametrized vectors (file:line cited per test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamae_spark.operators.arrays import (
    ArraySplit,
    ArraySubtractMinimum,
    CosineSimilarity,
    OrdinalArrayEncode,
)
from kamae_spark.operators.conditional import Bin
from kamae_spark.operators.scalers import ImputeTransformer, MinMaxScaleEstimator


def _col(df, name):
    return [r[name] for r in df.orderBy("__ord").collect()]


NESTED_1 = [[1.0, -2.0, 3.0], [1.0, 2.0, 3.0], [1.0, 2.0, -3.0], [4.0, 2.0, -6.0]]
NESTED_2 = [[4.0, -2.0, 6.0], [4.0, -2.0, 6.0], [4.0, 2.0, -6.0], [7.0, 8.0, 3.0]]
NESTED_3 = [[7.0, 8.0, 3.0], [7.0, -8.0, 3.0], [7.0, 8.0, -3.0], [-1.0, 2.0, -3.0]]


# -- Bin (reference test_bin.py:25-222) ---------------------------------------


@pytest.mark.parametrize(
    "col, conditions, default, expected",
    [
        # bin_transform_expected_1 / _2
        ("col1", [("leq", 2, "less_than_equal_to_2"), ("gt", 6, "greater_than_6")],
         "default", ["less_than_equal_to_2", "default", "greater_than_6"]),
        ("col2", [("eq", 2, "equal_to_2"), ("neq", 10, "not_equal_to_10")],
         "default", ["equal_to_2", "equal_to_2", "not_equal_to_10"]),
    ],
)
def test_bin_string_labels_golden(spark, col, conditions, default, expected):
    df = spark.createDataFrame(
        [(0, 1.0, 2.0, 3.0), (1, 4.0, 2.0, 6.0), (2, 7.0, 8.0, 3.0)],
        "__ord int, col1 double, col2 double, col3 double",
    )
    out = Bin(input_col=col, output_col="b", conditions=conditions,
              default_label=default).transform(df)
    assert _col(out, "b") == expected


def test_bin_numeric_labels_stay_numeric(spark):
    """reference bin_transform_expected_3: labels 0.0/1.0/2.0 with
    default -1.0 emit as DOUBLES, not strings (bin.py:296-299 lits the
    labels raw)."""
    df = spark.createDataFrame(
        [(0, 3.0), (1, 6.0), (2, 3.0)], "__ord int, col3 double"
    )
    out = Bin(
        input_col="col3", output_col="b",
        conditions=[("lt", 3, 0.0), ("eq", 3, 1.0), ("gt", 6, 2.0)],
        default_label=-1.0,
    ).transform(df)
    assert dict(out.dtypes)["b"] == "double"
    assert _col(out, "b") == [1.0, -1.0, 1.0]


def test_bin_nested_golden(spark):
    """reference bin_transform_array_expected_3, first row."""
    df = spark.createDataFrame([(NESTED_1,)], "col1 array<array<double>>")
    out = Bin(
        input_col="col1", output_col="b",
        conditions=[("lt", 3, "less_than_3"), ("eq", 3, "equal_to_3"),
                    ("gt", 6, "greater_than_6")],
        default_label="default",
    ).transform(df)
    assert out.first()["b"] == [
        ["less_than_3", "less_than_3", "equal_to_3"],
        ["less_than_3", "less_than_3", "equal_to_3"],
        ["less_than_3", "less_than_3", "less_than_3"],
        ["default", "less_than_3", "less_than_3"],
    ]


# -- CosineSimilarity nested (reference test_cosine_similarity.py:20-140) ----


def test_cosine_similarity_flat(spark):
    df = spark.createDataFrame(
        [([1.456, -15.45, 20.890], [-6.0, 5.789, 0.678])],
        "a array<double>, b array<double>",
    )
    out = CosineSimilarity(input_cols=["a", "b"], output_col="c").transform(df)
    assert out.first()["c"] == pytest.approx(-0.38593899785873664)


def test_cosine_similarity_nested_reduces_innermost(spark):
    """reference cosine_similarity_transform_col1_col2_expected: shape
    [2][1][2][3] x same -> [2][1][2] of the innermost-vector cosines."""
    v1 = [1.456, -15.45, 20.890]
    v2 = [-6.0, 5.789, 0.678]
    a = [[[v1, v1]], [[v1, v1]]]
    b = [[[v2, v2]], [[v2, v2]]]
    df = spark.createDataFrame(
        [(a, b)],
        "a array<array<array<array<double>>>>, b array<array<array<array<double>>>>",
    )
    out = CosineSimilarity(input_cols=["a", "b"], output_col="c").transform(df)
    got = out.first()["c"]
    exp = -0.38593899785873664
    assert got == [
        [[pytest.approx(exp), pytest.approx(exp)]],
        [[pytest.approx(exp), pytest.approx(exp)]],
    ]


# -- ArraySplit (reference test_array_split.py:23-120) -----------------------


def test_array_split_flat(spark):
    df = spark.createDataFrame(
        [(0, [1, 2, 3]), (1, [4, 2, 6]), (2, [7, 8, 3])],
        "__ord int, arr array<int>",
    )
    out = ArraySplit(
        input_col="arr", output_cols=["s1", "s2", "s3"]
    ).transform(df)
    assert _col(out, "s1") == [1, 4, 7]
    assert _col(out, "s2") == [2, 2, 8]
    assert _col(out, "s3") == [3, 6, 3]


def test_array_split_nested_innermost_axis(spark):
    """reference array_split_nested_expected: [4][3] -> three [4]
    columns, one per INNERMOST index."""
    df = spark.createDataFrame(
        [(0, NESTED_1), (1, NESTED_2), (2, NESTED_3)],
        "__ord int, col1 array<array<double>>",
    )
    out = ArraySplit(
        input_col="col1", output_cols=["s1", "s2", "s3"]
    ).transform(df)
    assert _col(out, "s1") == [[1.0, 1.0, 1.0, 4.0], [4.0, 4.0, 4.0, 7.0],
                               [7.0, 7.0, 7.0, -1.0]]
    assert _col(out, "s2") == [[-2.0, 2.0, 2.0, 2.0], [-2.0, -2.0, 2.0, 8.0],
                               [8.0, -8.0, 8.0, 2.0]]
    assert _col(out, "s3") == [[3.0, 3.0, -3.0, -6.0], [6.0, 6.0, -6.0, 3.0],
                               [3.0, 3.0, -3.0, -3.0]]


# -- ArraySubtractMinimum (reference test_array_subtract_minimum.py:143-181) --


@pytest.mark.parametrize(
    "pad, expected",
    [
        (-1.0, [[2.0, 1.0, 0.0, -1.0], [96.0, 2.0, 0.0, -1.0], [4.0, 0.0, -1.0, -1.0]]),
        (None, [[4.0, 3.0, 2.0, 0.0], [101.0, 7.0, 5.0, 0.0], [13.0, 9.0, 0.0, 0.0]]),
        (0.0, [[4.0, 3.0, 2.0, 0.0], [101.0, 7.0, 5.0, 0.0], [13.0, 9.0, 0.0, 0.0]]),
    ],
)
def test_array_subtract_minimum_pad_matrix(spark, pad, expected):
    df = spark.createDataFrame(
        [(0, [3.0, 2.0, 1.0, -1.0]), (1, [100.0, 6.0, 4.0, -1.0]),
         (2, [12.0, 8.0, -1.0, -1.0])],
        "__ord int, col2 array<double>",
    )
    out = ArraySubtractMinimum(
        input_col="col2", output_col="d", pad_value=pad
    ).transform(df)
    assert _col(out, "d") == expected


def test_array_subtract_minimum_nested(spark):
    """reference array_subtract_minimum_nested_expected_1, first row:
    the minimum is per INNERMOST list."""
    data = [[[100.0, 98.0, 2.0, 5.0, -1.0],
             [1000.0, 67.0, 84.0, -1.0, -1.0],
             [1000.0, 67.0, 84.0, -1.0, -1.0]]]
    df = spark.createDataFrame([(data,)], "col1 array<array<array<double>>>")
    out = ArraySubtractMinimum(
        input_col="col1", output_col="d", pad_value=-1.0
    ).transform(df)
    assert out.first()["d"] == [[[98.0, 96.0, 0.0, 3.0, -1.0],
                                 [933.0, 0.0, 17.0, -1.0, -1.0],
                                 [933.0, 0.0, 17.0, -1.0, -1.0]]]


# -- OrdinalArrayEncode (reference test_ordinal_array_encode.py:25-135) ------

ORD_ROWS = [(0, ["-1", "a", "b", "-1"]), (1, ["a", "a", "b", "c"]),
            (2, ["b", "b", "b", "a"])]


@pytest.mark.parametrize(
    "pad, expected",
    [
        ("-1", [[-1, 0, 1, -1], [0, 0, 1, 2], [0, 0, 0, 1]]),
        (None, [[0, 1, 2, 0], [0, 0, 1, 2], [0, 0, 0, 1]]),
    ],
)
def test_ordinal_array_encode_golden(spark, pad, expected):
    df = spark.createDataFrame(ORD_ROWS, "__ord int, col2 array<string>")
    out = OrdinalArrayEncode(
        input_col="col2", output_col="o", pad_value=pad
    ).transform(df)
    assert _col(out, "o") == expected


def test_ordinal_array_encode_nested_golden(spark):
    df = spark.createDataFrame(
        [(i, [v]) for i, v in [(0, ["-1", "a", "b", "-1"]),
                               (1, ["a", "a", "b", "c"]),
                               (2, ["b", "b", "b", "a"])]],
        "__ord int, col2 array<array<string>>",
    )
    out = OrdinalArrayEncode(
        input_col="col2", output_col="o", pad_value="-1"
    ).transform(df)
    assert _col(out, "o") == [[[-1, 0, 1, -1]], [[0, 0, 1, 2]], [[0, 0, 0, 1]]]


# -- MinMaxScale nested fit (reference test_min_max_scale.py:24-95) ----------


def test_min_max_scale_nested_fit_pools_outer_dims(spark):
    """reference min_max_scale_expected_nested: per-innermost-index
    min/max over every inner list of every row -> min [-1,-8,-6],
    max [7,8,6]."""
    df = spark.createDataFrame(
        [(0, NESTED_1), (1, NESTED_2), (2, NESTED_3)],
        "__ord int, col1 array<array<double>>",
    )
    model = MinMaxScaleEstimator(input_col="col1", output_col="s").fit(df)
    assert model.min == [-1.0, -8.0, -6.0]
    assert model.max == [7.0, 8.0, 6.0]
    got = _col(model.transform(df), "s")
    exp = [
        [[0.25, 0.375, 0.75], [0.25, 0.625, 0.75],
         [0.25, 0.625, 0.25], [0.625, 0.625, 0.0]],
        [[0.625, 0.375, 1.0], [0.625, 0.375, 1.0],
         [0.625, 0.625, 0.0], [1.0, 1.0, 0.75]],
        [[1.0, 1.0, 0.75], [1.0, 0.0, 0.75],
         [1.0, 1.0, 0.25], [0.0, 0.625, 0.25]],
    ]
    for row_got, row_exp in zip(got, exp):
        for inner_got, inner_exp in zip(row_got, row_exp):
            assert inner_got == pytest.approx(inner_exp)


# -- ImputeTransformer (reference test_impute.py:24-155) ---------------------


def test_impute_transform_string(spark):
    """reference impute_expected: mask 'a' -> impute 'hello' on strings."""
    df = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "a")], "__ord int, col4 string"
    )
    out = ImputeTransformer(
        input_col="col4", output_col="i", statistic="hello", mask_value="a"
    ).transform(df)
    assert _col(out, "i") == ["hello", "b", "hello"]


def test_impute_transform_nested_numeric(spark):
    """reference impute_nested_arrays_expected: mask 2.0 -> 100.0
    elementwise through nesting."""
    df = spark.createDataFrame(
        [(0, NESTED_1), (1, NESTED_2), (2, NESTED_3)],
        "__ord int, col1 array<array<double>>",
    )
    out = ImputeTransformer(
        input_col="col1", output_col="i", statistic=100.0, mask_value=2.0
    ).transform(df)
    assert _col(out, "i") == [
        [[1.0, -2.0, 3.0], [1.0, 100.0, 3.0], [1.0, 100.0, -3.0], [4.0, 100.0, -6.0]],
        [[4.0, -2.0, 6.0], [4.0, -2.0, 6.0], [4.0, 100.0, -6.0], [7.0, 8.0, 3.0]],
        [[7.0, 8.0, 3.0], [7.0, -8.0, 3.0], [7.0, 8.0, -3.0], [-1.0, 100.0, -3.0]],
    ]
