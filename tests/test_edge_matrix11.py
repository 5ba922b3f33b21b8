"""Round-5 reference test-matrix port, batch 7: estimator FIT matrices —
impute (mask/null/nested pooling), standard-scale (per-index population
stats incl. nested), shared-string-index (pooled vocab x 4 orders).
Golden values pinned from the reference's parametrized vectors
(tests/kamae/spark/estimators/*, file:line cited per test)."""

from __future__ import annotations

import pytest

from kamae_spark.operators.indexers import SharedStringIndexEstimator
from kamae_spark.operators.scalers import ImputeEstimator, StandardScaleEstimator

NESTED_1 = [[1.0, -2.0, 3.0], [1.0, 2.0, 3.0], [1.0, 2.0, -3.0], [4.0, 2.0, -6.0]]
NESTED_2 = [[4.0, -2.0, 6.0], [4.0, -2.0, 6.0], [4.0, 2.0, -6.0], [7.0, 8.0, 3.0]]
NESTED_3 = [[7.0, 8.0, 3.0], [7.0, -8.0, 3.0], [7.0, 8.0, -3.0], [-1.0, 2.0, -3.0]]


# -- ImputeEstimator fit (reference estimators/test_impute.py:20-77) ---------


@pytest.mark.parametrize(
    "rows, schema, strategy, mask, expected",
    [
        # example_dataframe col1 = [1, 4, 7]
        ([(1.0,), (4.0,), (7.0,)], "col1 double", "median", -999.0, 4.0),
        ([(1.0,), (4.0,), (7.0,)], "col1 double", "median", 7.0, 2.5),
        ([(1.0,), (4.0,), (7.0,)], "col1 double", "mean", -999.0, 4.0),
        ([(1.0,), (4.0,), (7.0,)], "col1 double", "mean", 7.0, 2.5),
        # example_dataframe_with_nulls col1 = [None, 4, 7, 7], mask 4
        ([(None,), (4.0,), (7.0,), (7.0,)], "col1 double", "mean", 4.0, 7.0),
    ],
)
def test_impute_fit_scalar(spark, rows, schema, strategy, mask, expected):
    df = spark.createDataFrame(rows, schema)
    model = ImputeEstimator(
        input_col="col1", output_col="i", strategy=strategy, mask_value=mask
    ).fit(df)
    assert model.statistic == pytest.approx(expected)


def test_impute_fit_nested_pools_all_elements(spark):
    """reference estimators/test_impute.py nested case: ONE statistic
    over every element of the nested column -> mean 2.0."""
    df = spark.createDataFrame(
        [(NESTED_1,), (NESTED_2,), (NESTED_3,)], "col1 array<array<double>>"
    )
    model = ImputeEstimator(
        input_col="col1", output_col="i", strategy="mean", mask_value=-999.0
    ).fit(df)
    assert model.statistic == pytest.approx(2.0)


# -- StandardScaleEstimator fit (reference
#    estimators/test_standard_scale.py:23-72) --------------------------------


def test_standard_scale_fit_flat_array(spark):
    """col1_col2_col3 = [[1,2,3],[4,2,6],[7,8,3]]: per-index mean 4 and
    POPULATION stddev."""
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([4.0, 2.0, 6.0],), ([7.0, 8.0, 3.0],)],
        "v array<double>",
    )
    model = StandardScaleEstimator(input_col="v", output_col="z").fit(df)
    assert model.mean == pytest.approx([4.0, 4.0, 4.0])
    assert model.stddev == pytest.approx(
        [2.449489742783178, 2.8284271247461903, 1.4142135623730951]
    )


def test_standard_scale_fit_scalar(spark):
    df = spark.createDataFrame([(1.0,), (4.0,), (7.0,)], "v double")
    model = StandardScaleEstimator(input_col="v", output_col="z").fit(df)
    assert model.mean == pytest.approx(4.0)
    assert model.stddev == pytest.approx(2.449489742783178)


def test_standard_scale_fit_nested_pools_outer_dims(spark):
    """Nested fit pools per-index stats across rows AND outer lists."""
    df = spark.createDataFrame(
        [(NESTED_1,), (NESTED_2,), (NESTED_3,)], "v array<array<double>>"
    )
    model = StandardScaleEstimator(input_col="v", output_col="z").fit(df)
    assert model.mean == pytest.approx([3.8333333, 1.6666667, 0.5], abs=1e-6)
    assert model.stddev == pytest.approx([2.7028791, 4.6067583, 4.2130749], abs=1e-6)


# -- SharedStringIndexEstimator fit (reference
#    estimators/test_shared_string_index.py:23-96) ---------------------------

SHARED_ROWS = [(0, "a", "c"), (1, "b", "c"), (2, "a", "a")]


@pytest.mark.parametrize(
    "order, max_labels, expected",
    [
        ("frequencyAsc", None, ["b", "c", "a"]),
        ("frequencyDesc", None, ["a", "c", "b"]),
        ("alphabeticalAsc", None, ["a", "b", "c"]),
        ("alphabeticalDesc", None, ["c", "b", "a"]),
        ("alphabeticalDesc", 2, ["c", "b"]),
        ("alphabeticalDesc", 20, ["c", "b", "a"]),
    ],
)
def test_shared_string_index_fit_pools_columns(spark, order, max_labels, expected):
    df = spark.createDataFrame(SHARED_ROWS, "__ord int, col4 string, col5 string")
    model = SharedStringIndexEstimator(
        input_cols=["col4", "col5"], output_cols=["i4", "i5"],
        string_order_type=order, max_num_labels=max_labels,
    ).fit(df)
    assert list(model.labels) == expected


# -- ConditionalStandardScaleEstimator fit (reference
#    estimators/test_conditional_standard_scale.py:20-72) --------------------


def test_conditional_standard_scale_fit_matches_plain_standard(spark):
    """With no filter, the conditional scaler's stats equal the plain
    standard scaler's (flat + nested pooling)."""
    from kamae_spark.operators.scalers import ConditionalStandardScaleEstimator

    flat = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([4.0, 2.0, 6.0],), ([7.0, 8.0, 3.0],)],
        "v array<double>",
    )
    m = ConditionalStandardScaleEstimator(input_col="v", output_col="z").fit(flat)
    assert m.mean == pytest.approx([4.0, 4.0, 4.0])
    assert m.stddev == pytest.approx(
        [2.449489742783178, 2.8284271247461903, 1.4142135623730951]
    )

    nested = spark.createDataFrame(
        [(NESTED_1,), (NESTED_2,), (NESTED_3,)], "v array<array<double>>"
    )
    m2 = ConditionalStandardScaleEstimator(input_col="v", output_col="z").fit(nested)
    assert m2.mean == pytest.approx([3.8333333, 1.6666667, 0.5], abs=1e-6)
    assert m2.stddev == pytest.approx([2.7028791, 4.6067583, 4.2130749], abs=1e-6)


# -- SingleFeatureArrayStandardScaleEstimator fit (reference
#    estimators/test_single_feature_array_standard_scale.py:42-140) ----------


def test_single_feature_array_fit_with_masking(spark):
    """maskValue=-1: only non-pad elements pool — mean 4.3636364,
    stddev_pop 2.8371794 over the 11 real values."""
    from kamae_spark.operators.scalers import SingleFeatureArrayStandardScaleEstimator

    rows = [([4.0, 2.0, 3.0, -1.0, -1.0],), ([4.0, 3.0, -1.0, -1.0, -1.0],),
            ([7.0, -1.0, -1.0, -1.0, -1.0],), ([7.0, 8.0, 1.0, 9.0, 0.0],)]
    df = spark.createDataFrame(rows, "col4 array<double>")
    model = SingleFeatureArrayStandardScaleEstimator(
        input_col="col4", output_col="z", mask_value=-1.0
    ).fit(df)
    assert model.mean == pytest.approx(4.3636364, abs=1e-6)
    assert model.stddev == pytest.approx(2.8371794, abs=1e-6)
    # transform: mask elements pass through unscaled
    first = model.transform(df).first()["z"]
    assert first[3] == -1.0 and first[4] == -1.0
    assert first[0] == pytest.approx((4.0 - 4.3636364) / 2.8371794, abs=1e-6)


def test_single_feature_array_fit_skips_nulls(spark):
    """Null elements never contribute: mean 5.625, stddev_pop 2.1758619
    over the non-null residue."""
    from kamae_spark.operators.scalers import SingleFeatureArrayStandardScaleEstimator

    rows = [([None, 2.0, 3.0],), ([4.0, None, 6.0],),
            ([7.0, 8.0, None],), ([7.0, 8.0, None],)]
    df = spark.createDataFrame(rows, "v array<double>")
    model = SingleFeatureArrayStandardScaleEstimator(
        input_col="v", output_col="z"
    ).fit(df)
    assert model.mean == pytest.approx(5.625, abs=1e-6)
    assert model.stddev == pytest.approx(2.1758619, abs=1e-6)
