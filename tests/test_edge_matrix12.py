"""Round-5 reference test-matrix port, batch 8: OneHotEncodeEstimator
fit+transform matrix (drop_unseen layouts, nested arrays, max-label
caps, frequency ordering). Golden vectors from the reference's
tests/kamae/spark/estimators/test_one_hot_encode.py:20-290."""

from __future__ import annotations

import pytest

from kamae_spark.operators.indexers import OneHotEncodeEstimator


def _col(df, name):
    return [r[name] for r in df.orderBy("__ord").collect()]


OHE_ROWS = [(0, "a"), (1, "b"), (2, "a"), (3, "c"), (4, "d")]
FREQ_ROWS = [(i, v) for i, v in enumerate(
    ["a", "a", "b", "b", "a", "c", "d", "c", "a", "c"])]


def _fit(spark, rows, **kw):
    df = spark.createDataFrame(rows, "__ord int, col1 string")
    model = OneHotEncodeEstimator(input_col="col1", output_col="ohe", **kw).fit(df)
    return model, model.transform(df)


def test_one_hot_fit_alpha_drop_unseen(spark):
    """expected_output_dataframe_oov0: drop_unseen -> width == |labels|,
    no OOV slot."""
    model, out = _fit(spark, OHE_ROWS, string_order_type="alphabeticalAsc",
                      num_oov_indices=1, drop_unseen=True)
    assert list(model.labels) == ["a", "b", "c", "d"]
    assert _col(out, "ohe") == [
        [1, 0, 0, 0], [0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]
    ]


def test_one_hot_fit_alpha_keep_oov(spark):
    """expected_output_dataframe_oov1: OOV slot leads the layout."""
    model, out = _fit(spark, OHE_ROWS, string_order_type="alphabeticalAsc",
                      num_oov_indices=1, drop_unseen=False)
    assert _col(out, "ohe") == [
        [0, 1, 0, 0, 0], [0, 0, 1, 0, 0], [0, 1, 0, 0, 0],
        [0, 0, 0, 1, 0], [0, 0, 0, 0, 1]
    ]


def test_one_hot_fit_max_num_labels_unseen_all_zero(spark):
    """expected_output_dataframe_max_num_labels: cap 2 + drop_unseen ->
    capped-out values encode all-zero."""
    model, out = _fit(spark, OHE_ROWS, string_order_type="alphabeticalAsc",
                      num_oov_indices=1, drop_unseen=True, max_num_labels=2)
    assert list(model.labels) == ["a", "b"]
    assert _col(out, "ohe") == [
        [1, 0], [0, 1], [1, 0], [0, 0], [0, 0]
    ]


def test_one_hot_fit_frequency_desc_cap(spark):
    """expected_output_dataframe_frequency_desc_max_num_labels: cap 3 by
    frequency desc keeps a(4), c(3), b(2); d dropped."""
    model, out = _fit(spark, FREQ_ROWS, string_order_type="frequencyDesc",
                      num_oov_indices=1, drop_unseen=True, max_num_labels=3)
    assert sorted(model.labels) == ["a", "b", "c"]
    got = {r["col1"]: r["ohe"] for r in
           model.transform(spark.createDataFrame(FREQ_ROWS, "__ord int, col1 string")).collect()}
    # frequencyDesc order: a, c, b
    assert got["a"] == [1, 0, 0]
    assert got["c"] == [0, 1, 0]
    assert got["b"] == [0, 0, 1]
    assert got["d"] == [0, 0, 0]


def test_one_hot_fit_nested_array_drop_unseen(spark):
    """one_hot_encoder_col4_array_drop_unseen_expected (first row):
    11-label alphabetical vocab over nested arrays; elementwise one-hot."""
    rows = [
        (0, [["a", "c", "c"], ["a", "c", "c"], ["a", "a", "a"]]),
        (1, [["a", "d", "c"], ["a", "t", "s"], ["x", "o", "p"]]),
        (2, [["l", "c", "c"], ["a", "h", "c"], ["a", "w", "a"]]),
    ]
    df = spark.createDataFrame(rows, "__ord int, col4 array<array<string>>")
    model = OneHotEncodeEstimator(
        input_col="col4", output_col="e", string_order_type="alphabeticalAsc",
        num_oov_indices=1, drop_unseen=True,
    ).fit(df)
    assert list(model.labels) == ["a", "c", "d", "h", "l", "o", "p", "s", "t", "w", "x"]
    first = model.transform(df).orderBy("__ord").first()["e"]
    one = lambda i: [1 if j == i else 0 for j in range(11)]
    assert first == [
        [one(0), one(1), one(1)], [one(0), one(1), one(1)], [one(0), one(0), one(0)]
    ]
