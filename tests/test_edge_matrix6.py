"""Round-5 reference test-matrix port, part 2: the ListAgg family
(list_max/min/mean/median/std_dev golden tables with min-filter, top-N
gate, and segmentation), ListRank, HaversineDistance golden distances
(incl. nested-array elementwise), DateAdd scalar/array x dynamic/static,
and the fitted-params StandardScaleTransformer golden vectors (incl.
mask passthrough). Golden values pinned from the reference's
parametrized vectors (file:line cited per test)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kamae_spark.operators.datetimes import DateAdd
from kamae_spark.operators.math import HaversineDistance
from kamae_spark.operators.scalers import StandardScaleTransformer
from kamae_spark.operators.windows import ListAgg, ListRank


# -- ListAgg family (reference test_list_{max,min,mean,median,std_dev}.py) ---
#
# Shared fixture shapes, reference test_list_max.py:27-115:
#   no_filter: groups {1: [2,2,2,8], 2: [10,20], 3: [None,5]}
#   min_value: groups {1: [-999,2,2,8], 2: [-999,20], 3: [None,5]},
#              min_filter_value=0.0 drops the -999s
#   sort_desc: group 1 values [1,2,2,8] at sort_col [1,2,3,4], top3 by
#              sort_col DESC keeps sort_col 4,3,2 -> values [8,2,2]
#   sort_asc:  group 1 values [5,2,2,8] at sort_col [1,2,3,4], top3 ASC
#              keeps sort_col 1,2,3 -> values [5,2,2]
#   segment:   group 1 segmented {seg1: [5,8], seg2: [2,2]}


def _listagg_rows(spark, rows, schema, **kw):
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)], "__ord int, " + schema
    )
    out = ListAgg(input_col="value_col", output_col="got", **kw).transform(df)
    return [r["got"] for r in out.orderBy("__ord").collect()]


NO_FILTER = [(1, 2), (1, 2), (1, 2), (1, 8), (2, 10), (2, 20), (3, None), (3, 5)]
MIN_VALUE = [(1, -999), (1, 2), (1, 2), (1, 8), (2, -999), (2, 20), (3, None), (3, 5)]
SORT_DESC = [(1, 1, 1), (1, 2, 2), (1, 2, 3), (1, 8, 4)]
SEGMENT = [(1, 5, 1), (1, 2, 2), (1, 2, 2), (1, 8, 1)]
SORT_ASC = [(1, 5, 1), (1, 2, 2), (1, 2, 3), (1, 8, 4)]

GROUP_SCHEMA = "search_id int, value_col int"
SORT_SCHEMA = "search_id int, value_col int, sort_col int"
SEG_SCHEMA = "search_id int, value_col int, segment_col int"

S3 = math.sqrt(12.0)  # stddev of [1|5,2,2,8]-style spreads, see cases


@pytest.mark.parametrize(
    "agg, rows, schema, kw, expected",
    [
        # reference test_list_max.py:117-165
        ("max", NO_FILTER, GROUP_SCHEMA, {}, [8, 8, 8, 8, 20, 20, 5, 5]),
        ("max", MIN_VALUE, GROUP_SCHEMA, {"min_filter_value": 0.0},
         [8, 8, 8, 8, 20, 20, 5, 5]),
        # reference test_list_min.py:117-165
        ("min", NO_FILTER, GROUP_SCHEMA, {}, [2, 2, 2, 2, 10, 10, 5, 5]),
        ("min", MIN_VALUE, GROUP_SCHEMA, {"min_filter_value": 0.0},
         [2, 2, 2, 2, 20, 20, 5, 5]),
        # reference test_list_mean.py:117-165
        ("mean", NO_FILTER, GROUP_SCHEMA, {},
         [3.5, 3.5, 3.5, 3.5, 15.0, 15.0, 5.0, 5.0]),
        ("mean", MIN_VALUE, GROUP_SCHEMA, {"min_filter_value": 0.0},
         [4.0, 4.0, 4.0, 4.0, 20.0, 20.0, 5.0, 5.0]),
        # reference test_list_median.py:117-165
        ("median", NO_FILTER, GROUP_SCHEMA, {},
         [2.0, 2.0, 2.0, 2.0, 15.0, 15.0, 5.0, 5.0]),
        ("median", MIN_VALUE, GROUP_SCHEMA, {"min_filter_value": 0.0},
         [2.0, 2.0, 2.0, 2.0, 20.0, 20.0, 5.0, 5.0]),
        # reference test_list_std_dev.py:117-165 — SAMPLE stddev, and the
        # reference transformer defaults nanFillValue=0.0 so a singleton
        # group's NaN stddev reads 0.0 (list_std_dev.py:93)
        ("stddev", NO_FILTER, GROUP_SCHEMA, {"nan_fill": 0.0},
         [3.0, 3.0, 3.0, 3.0,
          7.0710678118654755, 7.0710678118654755, 0.0, 0.0]),
        ("stddev", MIN_VALUE, GROUP_SCHEMA,
         {"min_filter_value": 0.0, "nan_fill": 0.0},
         [3.4641016151377544] * 4 + [0.0, 0.0, 0.0, 0.0]),
    ],
)
def test_listagg_golden(spark, agg, rows, schema, kw, expected):
    got = _listagg_rows(spark, rows, schema, agg=agg,
                        group_cols=["search_id"], **kw)
    assert got == pytest.approx(expected)


@pytest.mark.parametrize(
    "agg, rows, sort_by, expected",
    [
        # top3 by sort_col DESC -> [8,2,2]; ASC -> [5,2,2]
        # (reference test_list_{max,min,mean,std_dev}.py:167-222)
        ("max", SORT_DESC, ["-sort_col"], [8.0] * 4),
        ("max", SORT_ASC, ["sort_col"], [5.0] * 4),
        ("min", SORT_DESC, ["-sort_col"], [2.0] * 4),
        ("min", SORT_ASC, ["sort_col"], [2.0] * 4),
        ("mean", SORT_DESC, ["-sort_col"], [4.0] * 4),
        ("mean", SORT_ASC, ["sort_col"], [3.0] * 4),
        ("median", SORT_DESC, ["-sort_col"], [2.0] * 4),
        ("median", SORT_ASC, ["sort_col"], [2.0] * 4),
        ("stddev", SORT_DESC, ["-sort_col"], [3.4641016151377544] * 4),
        ("stddev", SORT_ASC, ["sort_col"], [1.7320508075688772] * 4),
    ],
)
def test_listagg_topn_golden(spark, agg, rows, sort_by, expected):
    got = _listagg_rows(spark, rows, SORT_SCHEMA, agg=agg,
                        group_cols=["search_id"], top_n=3, sort_by=sort_by,
                        nan_fill=0.0)
    assert got == pytest.approx(expected)


@pytest.mark.parametrize(
    "agg, expected",
    [
        # segments {1: [5,8], 2: [2,2]} (reference :224-280)
        ("max", [8.0, 2.0, 2.0, 8.0]),
        ("min", [5.0, 2.0, 2.0, 5.0]),
        ("mean", [6.5, 2.0, 2.0, 6.5]),
    ],
)
def test_listagg_segment_golden(spark, agg, expected):
    got = _listagg_rows(spark, SEGMENT, SEG_SCHEMA, agg=agg,
                        group_cols=["search_id"], segment_col="segment_col")
    assert got == pytest.approx(expected)


def test_list_rank_golden(spark):
    """Reference test_list_rank.py:26-70: rank of value_col within
    search_id, descending then ascending."""
    rows = [(1, 1, 1.0, 6), (1, 2, 1.5, 5), (1, 3, 9.0, 1), (1, 4, 4.0, 3),
            (1, 5, 6.0, 2), (1, 6, 2.0, 4), (1, 7, 0.5, 7), (1, 8, 0.0, 8),
            (2, 9, 1.0, 3), (2, 10, 2.0, 2), (2, 11, 3.0, 1)]
    df = spark.createDataFrame(
        rows, "search_id int, row_id int, value_col double, exp_desc int")
    for sort, col in ((["-value_col"], "exp_desc"), (["value_col"], None)):
        out = ListRank(output_col="got", group_cols=["search_id"],
                       sort_by=sort).transform(df)
        got = {r["row_id"]: r["got"] for r in out.collect()}
        if col:
            assert got == {r[1]: r[3] for r in rows}
        else:
            # asc ranks, reference :72-96
            exp_asc = {1: 3, 2: 4, 3: 8, 4: 6, 5: 7, 6: 5, 7: 2, 8: 1,
                       9: 1, 10: 2, 11: 3}
            assert got == exp_asc


# -- HaversineDistance (reference test_haversine_distance.py) ----------------

HAV_ROWS = [(45.78, 23.09, 67.89, 12.34),
            (-45.90, -167.78, -0.12, 91.07),
            (-90.0, 180.0, 90.0, -180.0)]


@pytest.mark.parametrize(
    "input_cols, const, expected",
    [
        # :220-231 (lat1,lon1) vs constant (85.0, 76.0)
        (["lat1", "lon1"], [85.0, 76.0],
         [4598.788027037987, 15335.826999933153, 19459.112162797792]),
        # :284-295 (lat2,lon2) vs constant (23.89, -123.8)
        (["lat2", "lon2"], [23.89, -123.8],
         [9195.820595615063, 15420.239622812023, 7351.096600471779]),
        # both column pairs, no constant
        (["lat1", "lon1", "lat2", "lon2"], None,
         [2535.3581302297216, 10857.854909388832, 20015.086796020572]),
    ],
)
def test_haversine_golden(spark, input_cols, const, expected):
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(HAV_ROWS)],
        "__ord int, lat1 double, lon1 double, lat2 double, lon2 double",
    )
    out = HaversineDistance(input_cols=input_cols, output_col="d",
                            lat_lon_constant=const).transform(df)
    got = [r["d"] for r in out.orderBy("__ord").collect()]
    assert got == pytest.approx(expected, abs=1e-2)


def test_haversine_invalid_coords_null(spark):
    """Reference :72-80,115-124: out-of-range lat/lon -> null output."""
    rows = [(180.9, 23.09, 67.89, 12.34),
            (-45.90, -167.78, -0.12, 91.07),
            (-90.0, 180.0, 90.0, -270.0)]
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "__ord int, lat1 double, lon1 double, lat2 double, lon2 double",
    )
    out = HaversineDistance(input_cols=["lat1", "lon1", "lat2", "lon2"],
                            output_col="d").transform(df)
    got = [r["d"] for r in out.orderBy("__ord").collect()]
    assert got[0] is None and got[2] is None
    assert got[1] == pytest.approx(10857.854909388832, abs=1e-2)


def test_haversine_nested_arrays_golden(spark):
    """Reference :34-68,126-160: 3-level nested lat/lon arrays compute
    elementwise."""
    df = spark.createDataFrame(
        [(
            [[[45.78, 23.09]], [[67.89, 12.34]]],
            [[[-45.90, -167.78]], [[-0.12, 91.07]]],
            [[[-90.0, -12.0]], [[90.0, -18.0]]],
            [[[-34.89, 12.09]], [[-61.9, 0.34]]],
        )],
        "lat1 array<array<array<double>>>, lon1 array<array<array<double>>>, "
        "lat2 array<array<array<double>>>, lon2 array<array<array<double>>>",
    )
    out = HaversineDistance(input_cols=["lat1", "lon1", "lat2", "lon2"],
                            output_col="d").transform(df)
    got = out.first()["d"]
    exp = [[[15098.047139798186, 18781.858349523165]],
           [[2458.519828111194, 10504.20591993853]]]
    for a, b in zip(got, exp):
        for aa, bb in zip(a, b):
            assert aa == pytest.approx(bb, abs=1e-2)


# -- DateAdd (reference test_date_add.py) ------------------------------------


@pytest.fixture(scope="module")
def date_add_df(spark):
    return spark.createDataFrame(
        [(
            "2019-01-01", "2019-01-01 17:28:32", 10,
            [["2020-01-25", "2019-11-22", "2002-04-30"],
             ["2024-11-02", "2029-01-02", "2039-01-02"]],
            [[-1, 45, 23], [-10, -23, 13]],
        )],
        "single_date string, single_datetime string, num_days int, "
        "array_dates array<array<string>>, array_num_days array<array<int>>",
    )


@pytest.mark.parametrize(
    "cols, num_days, expected",
    [
        # reference test_date_add.py:48-75 dynamic scalar
        (["single_date", "num_days"], None, "2019-01-11"),
        # :77-104 static 62
        (["single_date"], 62, "2019-03-04"),
        # :106-133 datetime dynamic (time part dropped, date_add returns date)
        (["single_datetime", "num_days"], None, "2019-01-11"),
        # :135-162 datetime static 37
        (["single_datetime"], 37, "2019-02-07"),
        # :164-196 array dynamic: per-element day counts
        (["array_dates", "array_num_days"], None,
         [["2020-01-24", "2020-01-06", "2002-05-23"],
          ["2024-10-23", "2028-12-10", "2039-01-15"]]),
        # :198-225 array static -13
        (["array_dates"], -13,
         [["2020-01-12", "2019-11-09", "2002-04-17"],
          ["2024-10-20", "2028-12-20", "2038-12-20"]]),
    ],
)
def test_date_add_golden(spark, date_add_df, cols, num_days, expected):
    out = DateAdd(input_cols=cols, output_col="got",
                  num_days=num_days).transform(date_add_df)
    assert out.first()["got"] == expected


# -- StandardScaleTransformer fitted-params golden (test_standard_scale.py) --

SS_MEAN, SS_STD = [2.0, 1.0, 8.0], [3.05, 3.46, 1.73]


def test_standard_scale_vector_golden(spark):
    """Reference test_standard_scale.py:95-135,270-331: per-index stats
    over an int array column."""
    df = spark.createDataFrame(
        [(0, [1, 2, 3]), (1, [4, 2, 6]), (2, [7, 8, 3])],
        "__ord int, vec array<int>",
    )
    out = StandardScaleTransformer(
        input_col="vec", output_col="scaled", mean=SS_MEAN, stddev=SS_STD,
    ).transform(df)
    got = [r["scaled"] for r in out.orderBy("__ord").collect()]
    exp = [
        [-0.3278688524590164, 0.28901734104046245, -2.8901734104046244],
        [0.6557377049180328, 0.28901734104046245, -1.1560693641618498],
        [1.639344262295082, 2.023121387283237, -2.8901734104046244],
    ]
    for g, e in zip(got, exp):
        assert g == pytest.approx(e)


def test_standard_scale_scalar_golden(spark):
    """Reference :135-170,281-296 (scalar column form; our API takes
    scalar stats directly)."""
    df = spark.createDataFrame([(0, 1.0), (1, 4.0), (2, 7.0)],
                               "__ord int, col1 double")
    out = StandardScaleTransformer(
        input_col="col1", output_col="s", mean=2.0, stddev=3.05,
    ).transform(df)
    got = [r["s"] for r in out.orderBy("__ord").collect()]
    assert got == pytest.approx(
        [-0.3278688524590164, 0.6557377049180328, 1.639344262295082])


def test_standard_scale_nested_golden(spark):
    """Reference :27-93,297-305: 2-level nested input, per-innermost-index
    stats."""
    df = spark.createDataFrame(
        [([[1.0, -2.0, 3.0], [1.0, 2.0, 3.0], [1.0, 2.0, -3.0], [4.0, 2.0, -6.0]],)],
        "col1 array<array<double>>",
    )
    out = StandardScaleTransformer(
        input_col="col1", output_col="scaled", mean=SS_MEAN, stddev=SS_STD,
    ).transform(df)
    got = out.first()["scaled"]
    exp = [
        [-0.3278688524590164, -0.8670520231213874, -2.8901734104046244],
        [-0.3278688524590164, 0.28901734104046245, -2.8901734104046244],
        [-0.3278688524590164, 0.28901734104046245, -6.358381502890174],
        [0.6557377049180328, 0.28901734104046245, -8.092485549132949],
    ]
    for g, e in zip(got, exp):
        assert g == pytest.approx(e)


def test_standard_scale_mask_golden(spark):
    """Reference :224-253,332-367: maskValue=-1 entries pass through
    unscaled."""
    df = spark.createDataFrame(
        [(0, [4, 2, 3, -1, -1]), (1, [4, 3, -1, -1, -1]), (2, [7, -1, -1, -1, -1])],
        "__ord int, col4 array<int>",
    )
    out = StandardScaleTransformer(
        input_col="col4", output_col="s", mean=[4.8] * 5, stddev=[2.6] * 5,
        mask_value=-1,
    ).transform(df)
    got = [r["s"] for r in out.orderBy("__ord").collect()]
    exp = [
        [-0.3076923076923076, -1.0769230769230766, -0.6923076923076922, -1.0, -1.0],
        [-0.3076923076923076, -0.6923076923076922, -1.0, -1.0, -1.0],
        [0.8461538461538461, -1.0, -1.0, -1.0, -1.0],
    ]
    for g, e in zip(got, exp):
        assert g == pytest.approx(e)
