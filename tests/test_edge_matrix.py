"""Per-operator edge tables (round-3 depth pass, VERDICT item 8).

Modeled on the reference's per-transformer parametrization breadth
(reference tests/kamae/spark/transformers/test_string_replace.py,
test_string_index.py): null / mask / OOV interaction matrices for the
encoder family, empty-array and short-array behavior for array ops,
ms-boundary and pre-epoch datetimes, and dtype-cast edges. Each case
pins semantics the oracles can't see (they only sample the testdata
distributions)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kamae_spark.operators.indexers import (
    OneHotTransformer,
    StringIndexTransformer,
)


# ---------------------------------------------------------------------------
# StringIndex: mask x OOV x null x unseen matrix
# ---------------------------------------------------------------------------

LABELS = ["b", "a", "c"]  # fitted order is positional, not alphabetical


@pytest.mark.parametrize(
    "mask,num_oov,value,expected",
    [
        # no mask, 1 oov: layout oov=0, vocab at 1..3
        (None, 1, "b", 1),
        (None, 1, "a", 2),
        (None, 1, "c", 3),
        (None, 1, None, 0),          # null -> 0 (the single OOV bucket)
        # no mask, 0 oov: unseen/null -> null (reference raises per-row)
        (None, 0, "b", 1 - 1),       # vocab starts at 0
        (None, 0, "zzz", None),
        (None, 0, None, None),
        # mask + 2 oov: mask=0, oov in {1,2}, vocab at 3..5
        ("<m>", 2, "<m>", 0),
        ("<m>", 2, "b", 3),
        ("<m>", 2, "c", 5),
        ("<m>", 2, None, 0),
        # mask + 0 oov: mask still -> 0, vocab at 1..3
        ("<m>", 0, "<m>", 0),
        ("<m>", 0, "a", 2),
        ("<m>", 0, "zzz", None),
    ],
)
def test_string_index_layout_matrix(spark, mask, num_oov, value, expected):
    t = StringIndexTransformer(
        input_col="w", output_col="idx", labels=LABELS,
        mask_token=mask, num_oov_indices=num_oov,
    )
    df = spark.createDataFrame([(value,)], "w string")
    got = t.transform(df).collect()[0]["idx"]
    assert got == expected


@pytest.mark.parametrize("mask,num_oov", [(None, 1), ("<m>", 2), (None, 3)])
def test_string_index_oov_bucket_range_and_determinism(spark, mask, num_oov):
    """Unseen tokens hash into [start, start+num_oov) and the same token
    always lands in the same bucket."""
    t = StringIndexTransformer(
        input_col="w", output_col="idx", labels=LABELS,
        mask_token=mask, num_oov_indices=num_oov,
    )
    start = 1 if mask is not None else 0
    df = spark.createDataFrame(
        [(f"unseen{i % 5}",) for i in range(20)], "w string"
    )
    rows = t.transform(df).collect()
    by_tok = {}
    for r in rows:
        assert start <= r["idx"] < start + num_oov
        by_tok.setdefault(r["w"], set()).add(r["idx"])
    assert all(len(v) == 1 for v in by_tok.values())


def test_string_index_nested_arrays_with_null_elements(spark):
    """Level-1 arrays index elementwise; null ELEMENTS follow the null
    rule; empty arrays stay empty."""
    t = StringIndexTransformer(
        input_col="ws", output_col="idx", labels=LABELS, num_oov_indices=1
    )
    df = spark.createDataFrame(
        [(["b", None, "a"],), ([],)], "ws array<string>"
    )
    rows = {tuple(r["ws"] or ()): r["idx"] for r in t.transform(df).collect()}
    assert rows[("b", None, "a")] == [1, 0, 2]
    assert rows[()] == []


@pytest.mark.parametrize(
    "drop_unseen,value,hot_pos,width",
    [
        # layout with 1 oov, no mask: oov=0, vocab at 1..3, width 4
        (False, "b", 1, 4),
        (False, "zzz", 0, 4),   # OOV one-hot on the OOV slot
        (False, None, 0, 4),
        # drop_unseen: width = |vocab|, unseen/null -> all zeros
        (True, "b", 0, 3),
        (True, "c", 2, 3),
        (True, "zzz", None, 3),
        (True, None, None, 3),
    ],
)
def test_one_hot_matrix(spark, drop_unseen, value, hot_pos, width):
    t = OneHotTransformer(
        input_col="w", output_col="oh", labels=LABELS,
        num_oov_indices=1, drop_unseen=drop_unseen,
    )
    df = spark.createDataFrame([(value,)], "w string")
    oh = t.transform(df).collect()[0]["oh"]
    assert len(oh) == width
    if hot_pos is None:
        assert all(x == 0.0 for x in oh)
    else:
        assert oh[hot_pos] == 1.0 and sum(oh) == 1.0


# ---------------------------------------------------------------------------
# array ops: empty / short / null arrays
# ---------------------------------------------------------------------------

def test_array_crop_pads_empty_and_null_elements(spark):
    from kamae_spark.operators.arrays import ArrayCrop

    t = ArrayCrop(input_col="xs", output_col="out", length=3, pad_value=-1.0)
    df = spark.createDataFrame(
        [([],), ([1.0],), ([1.0, 2.0, 3.0, 4.0],)], "xs array<double>"
    )
    rows = {len(r["xs"]): r["out"] for r in t.transform(df).collect()}
    assert rows[0] == [-1.0, -1.0, -1.0]
    assert rows[1] == [1.0, -1.0, -1.0]
    assert rows[4] == [1.0, 2.0, 3.0]


def test_array_split_short_array_yields_nulls(spark):
    from kamae_spark.operators.arrays import ArraySplit

    t = ArraySplit(input_col="xs", output_cols=["a", "b", "c"])
    df = spark.createDataFrame([([1.0, 2.0],)], "xs array<double>")
    r = t.transform(df).collect()[0]
    assert (r["a"], r["b"], r["c"]) == (1.0, 2.0, None)


def test_array_reduce_on_empty_array_is_null(spark):
    from kamae_spark.operators.arrays import ArrayReduceMax, ArrayReduceMin

    df = spark.createDataFrame([([],), ([2.0, 1.0],)], "xs array<double>")
    out = ArrayReduceMax(input_col="xs", output_col="mx").transform(df)
    out = ArrayReduceMin(input_col="xs", output_col="mn").transform(out)
    rows = {len(r["xs"]): (r["mx"], r["mn"]) for r in out.collect()}
    assert rows[0] == (None, None)
    assert rows[2] == (2.0, 1.0)


def test_cosine_similarity_zero_vector_is_nan_or_null(spark):
    """Zero-norm input must not raise (ANSI divide) — NaN/null is the
    pinned contract."""
    from kamae_spark.operators.arrays import CosineSimilarity

    t = CosineSimilarity(input_cols=["a", "b"], output_col="cos")
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0])], "a array<double>, b array<double>"
    )
    v = t.transform(df).collect()[0]["cos"]
    assert v is None or math.isnan(v)


# ---------------------------------------------------------------------------
# datetimes: ms boundaries, pre-epoch, month-end
# ---------------------------------------------------------------------------

def test_unix_roundtrip_ms_and_pre_epoch(spark):
    from kamae_spark.operators.datetimes import (
        DateTimeToUnixTimestamp,
        UnixTimestampToDateTime,
    )

    df = spark.createDataFrame(
        [(0,), (-86400000,), (1700000000123,)], "ms long"
    )
    out = UnixTimestampToDateTime(
        input_col="ms", output_col="dt", unit="ms"
    ).transform(df)
    out = DateTimeToUnixTimestamp(
        input_col="dt", output_col="back_ms", unit="ms"
    ).transform(out)
    rows = {r["ms"]: (r["dt"], r["back_ms"]) for r in out.collect()}
    assert rows[0][0] == "1970-01-01 00:00:00.000"
    assert rows[0][1] == pytest.approx(0.0, abs=0.01)
    assert rows[-86400000][0] == "1969-12-31 00:00:00.000"
    assert rows[-86400000][1] == pytest.approx(-86400000, abs=0.01)
    assert rows[1700000000123][1] == pytest.approx(1700000000123, abs=0.01)


def test_date_add_month_end_and_leap_day(spark):
    from kamae_spark.operators.datetimes import DateAdd

    df = spark.createDataFrame(
        [("2024-01-31",), ("2024-02-28",), ("2023-12-31",)], "d string"
    )
    out = DateAdd(input_cols=["d"], output_col="plus1", num_days=1).transform(df)
    got = {r["d"]: r["plus1"] for r in out.collect()}
    assert got == {
        "2024-01-31": "2024-02-01",
        "2024-02-28": "2024-02-29",  # leap year
        "2023-12-31": "2024-01-01",
    }


def test_date_parse_day_of_week_full_week(spark):
    """DayOfWeek must be Mon=1..Sun=7 (reference convention) for every
    day of a known week."""
    from kamae_spark.operators.datetimes import DateParse

    days = [f"2024-01-{d:02d}" for d in range(1, 8)]  # Mon Jan 1 2024
    df = spark.createDataFrame([(d,) for d in days], "d string")
    out = DateParse(
        input_col="d", output_col="dow", date_part="DayOfWeek"
    ).transform(df)
    got = [r["dow"] for r in out.orderBy("d").collect()]
    assert got == [1, 2, 3, 4, 5, 6, 7]


# ---------------------------------------------------------------------------
# strings: null propagation and delimiter edges
# ---------------------------------------------------------------------------

def test_substring_delim_out_of_range_and_null(spark):
    from kamae_spark.operators.strings import SubStringDelimAtIndex

    t = SubStringDelimAtIndex(
        input_col="s", output_col="tok", delimiter=",", index=2
    )
    df = spark.createDataFrame([("a,b,c",), ("a",), (None,), ("",)], "s string")
    got = {r["s"]: r["tok"] for r in t.transform(df).collect()}
    assert got["a,b,c"] == "c"
    # out-of-range, empty and NULL all fall back to default_value
    # (reference sub_string_delim_at_index.py:181 default semantics)
    assert got["a"] == ""
    assert got[""] == ""
    assert got[None] == ""


def test_string_replace_literal_vs_regex_specials(spark):
    from kamae_spark.operators.strings import StringReplace

    df = spark.createDataFrame([("a.b.c",)], "s string")
    lit = StringReplace(
        input_cols=["s"], output_col="out", pattern_constant=".",
        replacement_constant="_", regex=False,
    ).transform(df).collect()[0]["out"]
    rex = StringReplace(
        input_cols=["s"], output_col="out", pattern_constant=".",
        replacement_constant="_", regex=True,
    ).transform(df).collect()[0]["out"]
    assert lit == "a_b_c"      # literal dot only
    assert rex == "_____"      # regex dot matches everything


def test_string_to_list_empty_string(spark):
    from kamae_spark.operators.strings import StringToStringList

    t = StringToStringList(
        input_col="s", output_col="xs", separator=",", list_length=2,
        default_value="<pad>",
    )
    df = spark.createDataFrame([("",), ("a,b",), ("a",)], "s string")
    got = {r["s"]: r["xs"] for r in t.transform(df).collect()}
    assert got["a,b"] == ["a", "b"]
    assert got["a"] == ["a", "<pad>"]   # padded to list_length
    assert got[""] == ["", "<pad>"]     # split('') -> [''], then padded


# ---------------------------------------------------------------------------
# scalers: degenerate fits
# ---------------------------------------------------------------------------

def test_standard_scale_zero_variance_column(spark):
    """A constant column has stddev 0; the scaled output must be finite
    or null, never an ANSI division error."""
    from kamae_spark.operators.scalers import StandardScaleEstimator

    df = spark.createDataFrame([(5.0,)] * 10, "x double")
    model = StandardScaleEstimator(input_col="x", output_col="z").fit(df)
    vals = [r["z"] for r in model.transform(df).collect()]
    assert all(v is None or math.isfinite(v) or math.isnan(v) for v in vals)


def test_impute_all_null_column(spark):
    """Impute fitted on an all-null column must not crash; the fitted
    fill value is null -> output stays null (pinned; the reference
    would propagate NaN from a null mean the same way)."""
    from kamae_spark.operators.scalers import ImputeEstimator

    df = spark.createDataFrame([(None,), (None,)], "x double")
    model = ImputeEstimator(input_col="x", output_col="y", strategy="mean").fit(df)
    vals = [r["y"] for r in model.transform(df).collect()]
    assert all(v is None or (isinstance(v, float) and math.isnan(v)) for v in vals)


def test_min_max_scale_degenerate_range(spark):
    from kamae_spark.operators.scalers import MinMaxScaleEstimator

    df = spark.createDataFrame([(3.0,)] * 5, "x double")
    model = MinMaxScaleEstimator(input_col="x", output_col="z").fit(df)
    vals = [r["z"] for r in model.transform(df).collect()]
    assert all(v is None or math.isfinite(v) or math.isnan(v) for v in vals)


# ---------------------------------------------------------------------------
# math: modulo divisor-sign convention and log edges
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "a,b,expected",
    [(7.0, 3.0, 1.0), (-7.0, 3.0, 2.0), (7.0, -3.0, 1.0), (-7.0, -3.0, -4.0)],
)
def test_modulo_follows_divisor_sign(spark, a, b, expected):
    from kamae_spark.operators.math import Modulo

    df = spark.createDataFrame([(a, b)], "a double, b double")
    got = Modulo(input_cols=["a", "b"], output_col="m").transform(df).collect()[0]["m"]
    assert got == expected


def test_log_nonpositive_inputs(spark):
    """log of 0 / negative must yield null or NaN/-inf, never raise."""
    from kamae_spark.operators.math import Log

    df = spark.createDataFrame([(0.0,), (-1.0,), (1.0,)], "x double")
    rows = {r["x"]: r["lx"] for r in
            Log(input_col="x", output_col="lx").transform(df).collect()}
    assert rows[1.0] == pytest.approx(0.0)
    for v in (rows[0.0], rows[-1.0]):
        assert v is None or math.isnan(v) or v == float("-inf")
