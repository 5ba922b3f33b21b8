"""Round-5 reference test-matrix port, batch 6: StringIndexTransformer
layout matrix (mask/oov/label offsets, nulls, nested arrays) and
StringMap default behavior. Golden values pinned from the reference's
parametrized vectors (test_string_index.py:121-215,
test_string_map.py:29-85)."""

from __future__ import annotations

import pytest

from kamae_spark.operators.conditional import StringMap
from kamae_spark.operators.indexers import StringIndexTransformer


def _col(df, name):
    return [r[name] for r in df.orderBy("__ord").collect()]


# -- StringIndexTransformer layout matrix ------------------------------------
# Layout (reference string_index.py:118-130): [mask=0 if set] then
# num_oov OOV buckets, then labels in order. The reference vectors use
# only mask/known/null values wherever num_oov > 1, so no engine-specific
# OOV hash value is pinned.

ROWS = [(0, "a", "c"), (1, "b", "c"), (2, "a", "a")]
NULL_ROWS = [(0, "a", "c"), (1, "b", None), (2, None, "a"), (3, "a", "a")]


@pytest.mark.parametrize(
    "col, labels, mask, num_oov, rows, expected",
    [
        # string_indexer_expected_0/1/2/3: label order shifts indices
        ("c4", ["a", "b"], None, 1, ROWS, [1, 2, 1]),
        ("c4", ["b", "a"], None, 1, ROWS, [2, 1, 2]),
        ("c5", ["a", "c"], None, 1, ROWS, [2, 2, 1]),
        ("c4", ["c"], None, 1, ROWS, [0, 0, 0]),  # all OOV -> bucket 0
        # string_indexer_w_nulls_expected_4: mask 'b', 5 OOV slots ->
        # labels start at 6; mask and null both -> 0
        ("c4", ["a"], "b", 5, NULL_ROWS, [6, 0, 0, 6]),
        # string_indexer_w_nulls_expected_5: mask 'mask', 3 OOV ->
        # labels at 4,5; null -> 0
        ("c5", ["a", "c"], "mask", 3, NULL_ROWS, [5, 0, 4, 4]),
    ],
)
def test_string_index_layout_golden(spark, col, labels, mask, num_oov, rows, expected):
    df = spark.createDataFrame(rows, "__ord int, c4 string, c5 string")
    out = StringIndexTransformer(
        input_col=col, output_col="i", labels=labels,
        mask_token=mask, num_oov_indices=num_oov,
    ).transform(df)
    assert _col(out, "i") == expected


def test_string_index_nested_array_golden(spark):
    """string_index_col4_array_expected: labels [a, c], 1 OOV bucket,
    elementwise through the nested array."""
    rows = [
        (0, [["a", "c", "c"], ["a", "c", "c"], ["a", "a", "a"]]),
        (1, [["a", "d", "c"], ["a", "t", "s"], ["x", "o", "p"]]),
        (2, [["l", "c", "c"], ["a", "h", "c"], ["a", "w", "a"]]),
    ]
    df = spark.createDataFrame(rows, "__ord int, col4 array<array<string>>")
    out = StringIndexTransformer(
        input_col="col4", output_col="e", labels=["a", "c"], num_oov_indices=1
    ).transform(df)
    assert _col(out, "e") == [
        [[1, 2, 2], [1, 2, 2], [1, 1, 1]],
        [[1, 0, 2], [1, 0, 0], [0, 0, 0]],
        [[0, 2, 2], [1, 0, 2], [1, 0, 1]],
    ]


# -- StringMap (reference test_string_map.py:29-85) --------------------------


def test_string_map_no_default_passes_through(spark):
    df = spark.createDataFrame(
        [(0, "abc"), (1, "def"), (2, "hij")], "__ord int, s string"
    )
    out = StringMap(
        input_col="s", output_col="o",
        mapping={"abc": "xyz1", "def": "xyz2"},
    ).transform(df)
    assert _col(out, "o") == ["xyz1", "xyz2", "hij"]


def test_string_map_with_default(spark):
    df = spark.createDataFrame(
        [(0, "abc"), (1, "def"), (2, "hij")], "__ord int, s string"
    )
    out = StringMap(
        input_col="s", output_col="o",
        mapping={"abc": "xyz1", "def": "xyz2"}, default_value="default",
    ).transform(df)
    assert _col(out, "o") == ["xyz1", "xyz2", "default"]


# -- StringIndexEstimator fit matrix (reference
#    tests/kamae/spark/estimators/test_string_index.py:23-135) ---------------

FIT_ROWS = [(0, "a", "c"), (1, "b", "c"), (2, "a", "a")]
FIT_NULL_ROWS = [(0, "a", "c"), (1, "b", None), (2, None, "a"), (3, "a", "a")]


@pytest.mark.parametrize(
    "col, order, max_labels, rows, expected",
    [
        ("c4", "frequencyAsc", None, FIT_ROWS, ["b", "a"]),
        ("c4", "frequencyAsc", 1, FIT_ROWS, ["b"]),
        ("c4", "frequencyDesc", None, FIT_ROWS, ["a", "b"]),
        ("c4", "frequencyDesc", 1, FIT_ROWS, ["a"]),
        ("c5", "alphabeticalAsc", None, FIT_ROWS, ["a", "c"]),
        ("c5", "alphabeticalDesc", None, FIT_ROWS, ["c", "a"]),
        # nulls never enter the vocab (estimators/test_string_index.py:99-135)
        ("c4", "frequencyAsc", None, FIT_NULL_ROWS, ["b", "a"]),
        ("c5", "alphabeticalDesc", 1, FIT_NULL_ROWS, ["c"]),
    ],
)
def test_string_index_fit_order_matrix(spark, col, order, max_labels, rows, expected):
    from kamae_spark.operators.indexers import StringIndexEstimator

    df = spark.createDataFrame(rows, "__ord int, c4 string, c5 string")
    model = StringIndexEstimator(
        input_col=col, output_col="i", string_order_type=order,
        max_num_labels=max_labels,
    ).fit(df)
    assert list(model.labels) == expected


def test_string_index_fit_nested_array_vocab(spark):
    """Nested-array input explodes into the vocab (reference fit case 7:
    alphabeticalAsc over example_index_input_with_string_arrays)."""
    from kamae_spark.operators.indexers import StringIndexEstimator

    rows = [
        (0, [["a", "c", "c"], ["a", "c", "c"], ["a", "a", "a"]]),
        (1, [["a", "d", "c"], ["a", "t", "s"], ["x", "o", "p"]]),
        (2, [["l", "c", "c"], ["a", "h", "c"], ["a", "w", "a"]]),
    ]
    df = spark.createDataFrame(rows, "__ord int, col4 array<array<string>>")
    model = StringIndexEstimator(
        input_col="col4", output_col="i", string_order_type="alphabeticalAsc",
    ).fit(df)
    assert list(model.labels) == ["a", "c", "d", "h", "l", "o", "p", "s", "t", "w", "x"]
