"""Per-operator edge tables, part 2 (round-3 depth pass, VERDICT item 8).

Families not covered by test_edge_matrix.py: the window/listwise family
(frame boundaries, defaults, gates, ties), conditional ops (first-match
ordering, boundary equality, null routing), geo ops (identity, bounds,
cardinal bearings), string ops (null propagation, negative indexes,
separators in regex position), and array ops (pad interaction, mixed
scalar/array assembly, zero-denominator handling)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# windows: frame boundaries, defaults, gates
# ---------------------------------------------------------------------------

def _turns(spark, vals):
    return spark.createDataFrame(
        [("c1", i, v) for i, v in enumerate(vals)], "conv_id string, turn_idx int, x double"
    )


def test_lag_default_and_offset_past_partition(spark):
    from kamae_spark.operators.windows import Lag

    df = _turns(spark, [1.0, 2.0, 3.0])
    out = Lag(
        input_col="x", output_col="l", order_by=["turn_idx"], offset=5, default=-9.0
    ).transform(df)
    assert [r["l"] for r in out.orderBy("turn_idx").collect()] == [-9.0] * 3
    out1 = Lag(
        input_col="x", output_col="l", order_by=["turn_idx"], default=-9.0
    ).transform(df)
    assert [r["l"] for r in out1.orderBy("turn_idx").collect()] == [-9.0, 1.0, 2.0]


def test_lead_is_not_point_in_time(spark):
    from kamae_spark.operators.windows import Lead

    df = _turns(spark, [1.0, 2.0, 3.0])
    out = Lead(input_col="x", output_col="l", order_by=["turn_idx"]).transform(df)
    assert [r["l"] for r in out.orderBy("turn_idx").collect()] == [2.0, 3.0, None]


def test_rolling_rows_frame_shorter_partition(spark):
    """rows=3 over a 2-row partition counts what exists; the frame is
    [current-2, current], never an error."""
    from kamae_spark.operators.windows import RollingAgg

    df = _turns(spark, [10.0, 20.0])
    out = RollingAgg(
        input_col="x", output_col="s", agg="sum", order_by=["turn_idx"], rows=3
    ).transform(df)
    assert [r["s"] for r in out.orderBy("turn_idx").collect()] == [10.0, 30.0]


def test_rolling_range_boundary_is_inclusive(spark):
    """range_seconds=60: an event EXACTLY 60s earlier is inside the
    frame ([ts-60, ts] inclusive both ends)."""
    from kamae_spark.operators.windows import RollingAgg

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [("c1", base, 1.0),
            ("c1", base + dt.timedelta(seconds=60), 1.0),
            ("c1", base + dt.timedelta(seconds=121), 1.0)]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, x double")
    out = RollingAgg(
        input_col="x", output_col="n", agg="count",
        order_by=["ts"], range_seconds=60,
    ).transform(df)
    got = [r["n"] for r in out.orderBy("ts").collect()]
    assert got == [1, 2, 1]  # row 3 is 61s after row 2 -> alone


def test_conditional_rolling_count_null_values_do_not_match(spark):
    from kamae_spark.operators.windows import ConditionalRollingCount

    df = spark.createDataFrame(
        [("c1", 0, "a"), ("c1", 1, None), ("c1", 2, "a")],
        "conv_id string, turn_idx int, role string",
    )
    out = ConditionalRollingCount(
        input_col="role", output_col="n", value="a", order_by=["turn_idx"]
    ).transform(df)
    assert [r["n"] for r in out.orderBy("turn_idx").collect()] == [1, 1, 2]


def test_backfill_leading_nulls_stay_null(spark):
    from kamae_spark.operators.windows import Backfill

    df = spark.createDataFrame(
        [("c1", 0, None), ("c1", 1, "t"), ("c1", 2, None)],
        "conv_id string, turn_idx int, tool string",
    )
    out = Backfill(
        input_col="tool", output_col="ff", order_by=["turn_idx"]
    ).transform(df)
    assert [r["ff"] for r in out.orderBy("turn_idx").collect()] == [None, "t", "t"]


def test_sessionize_gap_boundary_is_strict(spark):
    """A gap EXACTLY equal to gap_seconds does NOT open a new session
    (strict >, pinned); one second more does."""
    from kamae_spark.operators.windows import Sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [("c1", 0, base),
            ("c1", 1, base + dt.timedelta(seconds=1800)),
            ("c1", 2, base + dt.timedelta(seconds=1800 + 1801))]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    out = Sessionize(
        ts_col="ts", output_col="s", gap_seconds=1800,
        order_by=["ts", "turn_idx"], session_id_col="sid",
    ).transform(df)
    got = out.orderBy("turn_idx").collect()
    assert [r["s"] for r in got] == [0, 0, 1]
    assert got[-1]["sid"] == "c1#1"


def test_list_agg_topn_gate_rows_still_receive_stat(spark):
    """Rows OUTSIDE the top-N gate contribute nothing but still receive
    the group statistic (reference list_utils.py:112-159 contract)."""
    from kamae_spark.operators.windows import ListAgg

    df = spark.createDataFrame(
        [("c1", 1.0, 3), ("c1", 2.0, 2), ("c1", 100.0, 1)],
        "conv_id string, x double, pos int",
    )
    out = ListAgg(
        input_col="x", output_col="m", agg="mean",
        group_cols=["conv_id"], top_n=2, sort_by=["pos"],
    ).transform(df)
    vals = {r["pos"]: r["m"] for r in out.collect()}
    # top-2 by pos asc are pos 1,2 (x=100,2) -> mean 51; pos 3 gets it too
    assert vals == {1: 51.0, 2: 51.0, 3: 51.0}


def test_list_agg_stddev_single_row_nan_fill(spark):
    from kamae_spark.operators.windows import ListAgg

    df = spark.createDataFrame([("c1", 5.0)], "conv_id string, x double")
    raw = ListAgg(
        input_col="x", output_col="sd", agg="stddev", group_cols=["conv_id"]
    ).transform(df).collect()[0]["sd"]
    assert raw is None or math.isnan(raw)  # sample stddev of n=1
    filled = ListAgg(
        input_col="x", output_col="sd", agg="stddev",
        group_cols=["conv_id"], nan_fill=0.0,
    ).transform(df).collect()[0]["sd"]
    assert filled == 0.0


def test_list_agg_median_even_and_odd(spark):
    from kamae_spark.operators.windows import ListAgg

    odd = spark.createDataFrame(
        [("c1", v) for v in (3.0, 1.0, 2.0)], "conv_id string, x double"
    )
    even = spark.createDataFrame(
        [("c1", v) for v in (4.0, 1.0, 2.0, 3.0)], "conv_id string, x double"
    )
    t = ListAgg(input_col="x", output_col="md", agg="median", group_cols=["conv_id"])
    assert t.transform(odd).collect()[0]["md"] == 2.0
    assert t.transform(even).collect()[0]["md"] == 2.5


def test_list_rank_tie_methods(spark):
    from kamae_spark.operators.windows import ListRank

    df = spark.createDataFrame(
        [("c1", "a", 1.0), ("c1", "b", 1.0), ("c1", "c", 2.0)],
        "conv_id string, k string, score double",
    )
    by_k = lambda out: {r["k"]: r["r"] for r in out.collect()}
    rank = by_k(ListRank(output_col="r", group_cols=["conv_id"],
                         sort_by=["score", "k"], method="rank").transform(df))
    assert rank == {"a": 1, "b": 2, "c": 3}  # tie broken by k
    dense = by_k(ListRank(output_col="r", group_cols=["conv_id"],
                          sort_by=["score"], method="dense_rank").transform(df))
    assert dense == {"a": 1, "b": 1, "c": 2}


# ---------------------------------------------------------------------------
# conditional: ordering, boundaries, null routing
# ---------------------------------------------------------------------------

def test_bin_first_match_wins_and_null_defaults(spark):
    from kamae_spark.operators.conditional import Bin

    t = Bin(
        input_col="x", output_col="b",
        conditions=[("lt", 10.0, "small"), ("lt", 100.0, "mid")],
        default_label="big",
    )
    df = spark.createDataFrame(
        [(5.0,), (50.0,), (500.0,), (None,)], "x double"
    )
    got = {r["x"]: r["b"] for r in t.transform(df).collect()}
    assert got[5.0] == "small"    # matches BOTH conditions; first wins
    assert got[50.0] == "mid"
    assert got[500.0] == "big"
    assert got[None] == "big"     # null matches nothing -> default


@pytest.mark.parametrize(
    "x,expected",
    [(-1.0, 1), (0.0, 2), (5.0, 2), (10.0, 3), (19.9, 3), (20.0, 4), (None, None)],
)
def test_bucketize_boundary_falls_right(spark, x, expected):
    """bisect_right: a value EQUAL to a split belongs to the bucket on
    the right; index 0 stays reserved; null stays null."""
    from kamae_spark.operators.conditional import Bucketize

    t = Bucketize(input_col="x", output_col="b", splits=[0.0, 10.0, 20.0])
    df = spark.createDataFrame([(x,)], "x double")
    assert t.transform(df).collect()[0]["b"] == expected


def test_bucketize_through_nested_arrays(spark):
    from kamae_spark.operators.conditional import Bucketize

    t = Bucketize(input_col="xs", output_col="b", splits=[0.0, 10.0, 20.0])
    df = spark.createDataFrame(
        [([[0.5, 15.0], [25.0]],)], "xs array<array<double>>"
    )
    assert t.transform(df).collect()[0]["b"] == [[2, 3], [4]]


def test_if_statement_null_operand_takes_false_branch(spark):
    """A null comparison operand makes the condition unknown -> the
    false branch (F.when semantics, pinned)."""
    from kamae_spark.operators.conditional import IfStatement

    t = IfStatement(
        input_cols=["x"], output_col="o", condition_operator="eq",
        value_to_compare_constant=1.0,
        result_if_true_constant="yes", result_if_false_constant="no",
    )
    df = spark.createDataFrame([(1.0,), (2.0,), (None,)], "x double")
    got = {r["x"]: r["o"] for r in t.transform(df).collect()}
    assert got == {1.0: "yes", 2.0: "no", None: "no"}


def test_string_map_unmapped_passthrough_vs_default(spark):
    from kamae_spark.operators.conditional import StringMap

    df = spark.createDataFrame([("a",), ("zz",), (None,)], "s string")
    no_default = StringMap(
        input_col="s", output_col="o", mapping={"a": "A"}
    ).transform(df)
    got = {r["s"]: r["o"] for r in no_default.collect()}
    assert got == {"a": "A", "zz": "zz", None: None}  # passthrough
    with_default = StringMap(
        input_col="s", output_col="o", mapping={"a": "A"}, default_value="<d>"
    ).transform(df)
    got = {r["s"]: r["o"] for r in with_default.collect()}
    assert got == {"a": "A", "zz": "<d>", None: "<d>"}


# ---------------------------------------------------------------------------
# geo: identity, cardinal directions, bounds validation
# ---------------------------------------------------------------------------

def test_haversine_same_point_zero_and_out_of_range_null(spark):
    from kamae_spark.operators.math import HaversineDistance

    t = HaversineDistance(
        input_cols=["la1", "lo1", "la2", "lo2"], output_col="d"
    )
    df = spark.createDataFrame(
        [(48.85, 2.35, 48.85, 2.35), (91.0, 0.0, 0.0, 0.0)],
        "la1 double, lo1 double, la2 double, lo2 double",
    )
    rows = {r["la1"]: r["d"] for r in t.transform(df).collect()}
    assert rows[48.85] == pytest.approx(0.0, abs=1e-9)
    assert rows[91.0] is None  # lat out of [-90, 90]


def test_haversine_known_distance(spark):
    """Paris -> London ~343-344 km (public great-circle figure)."""
    from kamae_spark.operators.math import HaversineDistance

    t = HaversineDistance(
        input_cols=["la1", "lo1"], output_col="d",
        lat_lon_constant=[51.5074, -0.1278],
    )
    df = spark.createDataFrame([(48.8566, 2.3522)], "la1 double, lo1 double")
    d = t.transform(df).collect()[0]["d"]
    assert 330.0 < d < 355.0


@pytest.mark.parametrize(
    "lat2,lon2,expected",
    [(1.0, 0.0, 0.0), (0.0, 1.0, 90.0), (-1.0, 0.0, 180.0), (0.0, -1.0, 270.0)],
)
def test_bearing_cardinal_directions(spark, lat2, lon2, expected):
    from kamae_spark.operators.math import BearingAngle

    t = BearingAngle(input_cols=["la1", "lo1", "la2", "lo2"], output_col="b")
    df = spark.createDataFrame(
        [(0.0, 0.0, lat2, lon2)], "la1 double, lo1 double, la2 double, lo2 double"
    )
    assert t.transform(df).collect()[0]["b"] == pytest.approx(expected, abs=1e-9)


# ---------------------------------------------------------------------------
# strings: null propagation, negative index, separator edges
# ---------------------------------------------------------------------------

def test_string_affix_null_propagates(spark):
    from kamae_spark.operators.strings import StringAffix

    t = StringAffix(input_col="s", output_col="o", prefix="<", suffix=">")
    df = spark.createDataFrame([("x",), (None,)], "s string")
    got = {r["s"]: r["o"] for r in t.transform(df).collect()}
    assert got == {"x": "<x>", None: None}


def test_string_concatenate_skips_null_elements(spark):
    """concat_ws semantics: null columns are skipped, not nulled out."""
    from kamae_spark.operators.strings import StringConcatenate

    t = StringConcatenate(input_cols=["a", "b", "c"], output_col="o", separator="_")
    df = spark.createDataFrame([("x", None, "z")], "a string, b string, c string")
    assert t.transform(df).collect()[0]["o"] == "x_z"


def test_string_contains_null_and_negation(spark):
    from kamae_spark.operators.strings import StringContains

    t = StringContains(
        input_cols=["s"], output_col="o", constant="bc", negation=True
    )
    df = spark.createDataFrame([("abcd",), ("xyz",), (None,)], "s string")
    got = {r["s"]: r["o"] for r in t.transform(df).collect()}
    assert got == {"abcd": False, "xyz": True, None: None}


def test_string_isin_list_null_is_null(spark):
    from kamae_spark.operators.strings import StringIsInList

    t = StringIsInList(input_col="s", output_col="o", constants=["a", "b"])
    df = spark.createDataFrame([("a",), ("z",), (None,)], "s string")
    got = {r["s"]: r["o"] for r in t.transform(df).collect()}
    assert got == {"a": True, "z": False, None: None}


def test_substring_delim_negative_index(spark):
    from kamae_spark.operators.strings import SubStringDelimAtIndex

    t = SubStringDelimAtIndex(
        input_col="s", output_col="o", delimiter=",", index=-1, default_value="<d>"
    )
    df = spark.createDataFrame([("a,b,c",), ("solo",)], "s string")
    got = {r["s"]: r["o"] for r in t.transform(df).collect()}
    assert got == {"a,b,c": "c", "solo": "solo"}  # -1 = last element


def test_substring_delim_regex_special_delimiter(spark):
    """A delimiter that is a regex metacharacter must split literally."""
    from kamae_spark.operators.strings import SubStringDelimAtIndex

    t = SubStringDelimAtIndex(
        input_col="s", output_col="o", delimiter=".", index=1, default_value=""
    )
    df = spark.createDataFrame([("a.b.c",)], "s string")
    assert t.transform(df).collect()[0]["o"] == "b"


def test_string_list_to_string_consumes_one_level(spark):
    from kamae_spark.operators.strings import StringListToString

    t = StringListToString(input_col="xs", output_col="o", separator=",")
    df = spark.createDataFrame(
        [([["a", "b"], ["c"], []],)], "xs array<array<string>>"
    )
    assert t.transform(df).collect()[0]["o"] == ["a,b", "c", ""]


# ---------------------------------------------------------------------------
# arrays: pads, mixed assembly, zero denominators
# ---------------------------------------------------------------------------

def test_array_subtract_minimum_respects_pad(spark):
    from kamae_spark.operators.arrays import ArraySubtractMinimum

    t = ArraySubtractMinimum(input_col="xs", output_col="o", pad_value=-1.0)
    df = spark.createDataFrame([([5.0, 1.0, -1.0, 3.0],)], "xs array<double>")
    assert t.transform(df).collect()[0]["o"] == [4.0, 0.0, -1.0, 2.0]


def test_array_concatenate_mixes_scalars_and_arrays(spark):
    from kamae_spark.operators.arrays import ArrayConcatenate

    t = ArrayConcatenate(input_cols=["a", "xs", "b"], output_col="v")
    df = spark.createDataFrame(
        [(1.0, [2.0, 3.0], 4.0)], "a double, xs array<double>, b double"
    )
    assert t.transform(df).collect()[0]["v"] == [1.0, 2.0, 3.0, 4.0]


def test_pairwise_cosine_zero_candidate_coalesces_to_zero(spark):
    from kamae_spark.operators.arrays import PairwiseCosineSimilarity

    t = PairwiseCosineSimilarity(
        input_cols=["q", "flat"], output_col="sims", embedding_dim=2
    )
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0, 0.0, 1.0, 0.0, 0.0])],
        "q array<double>, flat array<double>",
    )
    sims = t.transform(df).collect()[0]["sims"]
    assert sims[0] == pytest.approx(1.0)
    assert sims[1] == pytest.approx(0.0)
    assert sims[2] == 0.0  # zero-norm candidate -> coalesced 0


def test_ordinal_array_encode_repeats_and_pad(spark):
    from kamae_spark.operators.arrays import OrdinalArrayEncode

    t = OrdinalArrayEncode(input_col="xs", output_col="o", pad_value="<p>")
    df = spark.createDataFrame(
        [(["x", "y", "x", "<p>", "z"],)], "xs array<string>"
    )
    assert t.transform(df).collect()[0]["o"] == [0, 1, 0, -1, 2]


# ---------------------------------------------------------------------------
# math: rounding modes on negatives, mean with constant
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "mode,x,expected",
    [
        ("floor", -1.5, -2.0), ("ceil", -1.5, -1.0), ("round", -1.5, -2.0),
        ("round", 2.5, 3.0),  # Spark HALF_UP away from zero
    ],
)
def test_round_modes_negative_and_half(spark, mode, x, expected):
    from kamae_spark.operators.math import Round

    df = spark.createDataFrame([(x,)], "x double")
    got = Round(input_col="x", output_col="r", mode=mode).transform(df).collect()[0]["r"]
    assert got == expected


def test_mean_counts_constant_as_operand(spark):
    from kamae_spark.operators.math import Mean

    df = spark.createDataFrame([(4.0,)], "x double")
    got = Mean(
        input_cols=["x"], output_col="m", constant=2.0
    ).transform(df).collect()[0]["m"]
    assert got == 3.0  # (4 + 2) / 2


def test_exponent_left_fold_chain(spark):
    from kamae_spark.operators.math import Exponent

    df = spark.createDataFrame([(2.0, 3.0, 2.0)], "a double, b double, c double")
    got = Exponent(
        input_cols=["a", "b", "c"], output_col="p"
    ).transform(df).collect()[0]["p"]
    assert got == 64.0  # (2^3)^2


# ---------------------------------------------------------------------------
# datetimes: diff sign, every parse part, injected now
# ---------------------------------------------------------------------------

def test_date_diff_is_second_minus_first(spark):
    from kamae_spark.operators.datetimes import DateDiff

    df = spark.createDataFrame(
        [("2024-01-01", "2024-01-11"), ("2024-01-11", "2024-01-01")],
        "a string, b string",
    )
    out = DateDiff(input_cols=["a", "b"], output_col="d").transform(df)
    got = {r["a"]: r["d"] for r in out.collect()}
    assert got["2024-01-01"] == 10 and got["2024-01-11"] == -10


@pytest.mark.parametrize(
    "part,expected",
    [
        ("Year", 2024), ("MonthOfYear", 3), ("DayOfMonth", 5),
        ("DayOfYear", 65),  # leap year: 31 + 29 + 5
        ("Hour", 7), ("Minute", 8), ("Second", 9), ("Millisecond", 123),
    ],
)
def test_date_parse_all_parts(spark, part, expected):
    from kamae_spark.operators.datetimes import DateParse

    df = spark.createDataFrame([("2024-03-05 07:08:09.123",)], "d string")
    got = DateParse(
        input_col="d", output_col="p", date_part=part
    ).transform(df).collect()[0]["p"]
    assert got == expected


def test_date_parse_empty_string_takes_default(spark):
    from kamae_spark.operators.datetimes import DateParse

    df = spark.createDataFrame([("",), ("2024-03-05",)], "d string")
    out = DateParse(
        input_col="d", output_col="p", date_part="Year", default_value=-1
    ).transform(df)
    got = {r["d"]: r["p"] for r in out.collect()}
    assert got[""] == -1 and got["2024-03-05"] == 2024


def test_current_unix_timestamp_injected_now(spark):
    from kamae_spark.operators.datetimes import CurrentUnixTimestamp

    df = spark.createDataFrame([(1,)], "i int")
    s = CurrentUnixTimestamp(
        output_col="t", unit="s", now="2024-01-01 00:00:00"
    ).transform(df).collect()[0]["t"]
    ms = CurrentUnixTimestamp(
        output_col="t", unit="ms", now="2024-01-01 00:00:00"
    ).transform(df).collect()[0]["t"]
    assert s == 1704067200 and ms == 1704067200000


def test_date_add_days_from_second_column(spark):
    from kamae_spark.operators.datetimes import DateAdd

    df = spark.createDataFrame(
        [("2024-01-01", 5), ("2024-01-01", -1)], "d string, n int"
    )
    out = DateAdd(input_cols=["d", "n"], output_col="o").transform(df)
    got = {r["n"]: r["o"] for r in out.collect()}
    assert got == {5: "2024-01-06", -1: "2023-12-31"}


# ---------------------------------------------------------------------------
# as-of join: no-match, ties, tolerance bound, strategy parity
# ---------------------------------------------------------------------------

def _asof_frames(spark):
    base = dt.datetime(2024, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)
    left = spark.createDataFrame(
        [("c1", t(5)), ("c1", t(10)), ("c1", t(100)), ("c2", t(50))],
        "conv_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("c1", t(10), "a10"), ("c1", t(40), "a40")],
        "conv_id string, ts timestamp, ann string",
    )
    return left, right, t


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
def test_asof_no_match_tie_and_missing_key(spark, strategy):
    """Pins for both physical strategies: a left row BEFORE every
    annotation gets null; an EXACT-ts tie attaches the annotation; a key
    absent from the right gets null."""
    from kamae_spark.operators.joins import AsOfJoin

    left, right, t = _asof_frames(spark)
    out = AsOfJoin(
        on=["conv_id"], left_ts="ts", right_ts="ts", right=right,
        strategy=strategy,
    ).transform(left)
    got = {(r["conv_id"], r["ts"]): r["ann_asof"] for r in out.collect()}
    assert got[("c1", t(5))] is None        # before all annotations
    assert got[("c1", t(10))] == "a10"      # tie -> annotation wins
    assert got[("c1", t(100))] == "a40"     # latest at-or-before
    assert got[("c2", t(50))] is None       # key only on the left
    assert len(got) == 4                    # row count preserved


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
def test_asof_tolerance_bound_is_inclusive(spark, strategy):
    """An annotation EXACTLY tolerance_seconds old still fills; one
    second older does not (<= bound, pinned for both strategies)."""
    from kamae_spark.operators.joins import AsOfJoin

    left, right, t = _asof_frames(spark)
    out = AsOfJoin(
        on=["conv_id"], left_ts="ts", right_ts="ts", right=right,
        strategy=strategy, tolerance_seconds=60,
    ).transform(left)
    got = {(r["conv_id"], r["ts"]): r["ann_asof"] for r in out.collect()}
    assert got[("c1", t(100))] == "a40"     # 60s old: inclusive bound
    out2 = AsOfJoin(
        on=["conv_id"], left_ts="ts", right_ts="ts", right=right,
        strategy=strategy, tolerance_seconds=59,
    ).transform(left)
    got2 = {(r["conv_id"], r["ts"]): r["ann_asof"] for r in out2.collect()}
    assert got2[("c1", t(100))] is None     # 60s old > 59s bound


# ---------------------------------------------------------------------------
# hashing: reserved zero, salt independence, offsets, empty sets
# ---------------------------------------------------------------------------

def test_hash_index_reserved_zero_and_range(spark):
    from kamae_spark.operators.hashing import HashIndex

    t = HashIndex(input_col="s", output_col="h", num_bins=10, mask_value="<m>")
    df = spark.createDataFrame(
        [(f"tok{i}",) for i in range(50)] + [(None,), ("<m>",)], "s string"
    )
    rows = {r["s"]: r["h"] for r in t.transform(df).collect()}
    assert rows[None] == 0 and rows["<m>"] == 0
    assert all(1 <= v < 10 for k, v in rows.items() if k not in (None, "<m>"))


def test_bloom_encode_offsets_disjoint_ranges(spark):
    from kamae_spark.operators.hashing import BloomEncode

    t = BloomEncode(
        input_col="s", output_col="b", num_bins=100, num_hash_fns=3,
        use_offsets=True,
    )
    df = spark.createDataFrame([(f"tok{i}",) for i in range(30)], "s string")
    for r in t.transform(df).collect():
        assert len(r["b"]) == 3
        for k, v in enumerate(r["b"]):
            assert k * 100 + 1 <= v < (k + 1) * 100  # disjoint per-hash range
    # null routes to the reserved slot of each hash's range
    nulls = t.transform(spark.createDataFrame([(None,)], "s string")).collect()
    assert nulls[0]["b"] == [0, 100, 200]


def test_token_count_empty_whitespace_and_null(spark):
    from kamae_spark.data.text import TokenCount

    t = TokenCount(input_col="s", output_col="n", mode="whitespace")
    df = spark.createDataFrame(
        [("",), ("   ",), ("a  b",), (None,)], "s string"
    )
    got = {r["s"]: r["n"] for r in t.transform(df).collect()}
    assert got[""] == 0 and got["   "] == 0
    assert got["a  b"] == 2        # runs of whitespace = one separator
    assert got[None] is None


def test_token_count_regex_splits_punctuation(spark):
    from kamae_spark.data.text import TokenCount

    t = TokenCount(input_col="s", output_col="n", mode="regex")
    df = spark.createDataFrame([("don't stop!",)], "s string")
    # word pieces: don, t, stop (3) + punctuation tokens: ' ! (2)
    assert t.transform(df).collect()[0]["n"] == 5


def test_language_id_und_and_tie_break(spark):
    from kamae_spark.data.text import LanguageId

    t = LanguageId(input_col="s", output_col="lang")
    df = spark.createDataFrame(
        [("the cat and the dog",), ("el perro que corre",),
         ("zzz qqq",), ("",), ("the el",)],
        "s string",
    )
    got = {r["s"]: r["lang"] for r in t.transform(df).collect()}
    assert got["the cat and the dog"] == "en"
    assert got["el perro que corre"] == "es"
    assert got["zzz qqq"] == "und"   # no marker anywhere
    assert got[""] == "und"
    assert got["the el"] == "en"     # 1-1 tie -> first language code wins


def test_fingerprint_invariant_to_case_punct_whitespace(spark):
    from kamae_spark.data.text import Fingerprint

    t = Fingerprint(input_col="s", output_col="fp")
    df = spark.createDataFrame(
        [("Hello, World!",), ("hello   world",), ("different",)], "s string"
    )
    got = {r["s"]: r["fp"] for r in t.transform(df).collect()}
    assert got["Hello, World!"] == got["hello   world"]
    assert got["different"] != got["hello   world"]


def test_min_hash_parity_bit_layout_and_empty_set(spark):
    from kamae_spark.operators.hashing import MinHashIndex

    t = MinHashIndex(
        input_col="toks", output_col="sig", num_permutations=8, parity_bit=True
    )
    df = spark.createDataFrame(
        [(["a", "b", "c"],), ([],)], "toks array<string>"
    )
    rows = {len(r["toks"]): r["sig"] for r in t.transform(df).collect()}
    assert len(rows[3]) == 8 and all(v in (0, 1) for v in rows[3])
    # r5: empty token set hashes [''] so the signature is total — the
    # reference's min_hash_udf:179-181 appends '' to an empty label list
    assert len(rows[0]) == 8 and all(v in (0, 1) for v in rows[0])
    empty_sig = MinHashIndex(
        input_col="toks", output_col="sig", num_permutations=8, parity_bit=True
    ).transform(
        spark.createDataFrame([([""],)], "toks array<string>")
    ).first()["sig"]
    assert rows[0] == empty_sig
