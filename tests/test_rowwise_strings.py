"""Golden tests for string / conditional / datetime / array transformers."""

from __future__ import annotations

import pytest

from kamae_spark.core.pipeline import PipelineModel
from kamae_spark.operators.arrays import (
    ArrayConcatenate,
    ArrayCrop,
    ArrayReduceMax,
    ArrayReduceMin,
    ArraySplit,
    ArraySubtractMinimum,
    CosineSimilarity,
    OrdinalArrayEncode,
    PairwiseCosineSimilarity,
)
from pyspark.sql import functions as F

from kamae_spark.operators.conditional import (
    Bin,
    Bucketize,
    Identity,
    IfStatement,
    StringMap,
)
from kamae_spark.operators.datetimes import (
    CurrentDate,
    CurrentUnixTimestamp,
    DateAdd,
    DateDiff,
    DateParse,
    DateTimeToUnixTimestamp,
    UnixTimestampToDateTime,
)
from kamae_spark.operators.strings import (
    StringAffix,
    StringArrayConstant,
    StringCase,
    StringConcatenate,
    StringContains,
    StringContainsList,
    StringIsInList,
    StringListToString,
    StringReplace,
    StringSequenceToEmbedding,
    StringToStringList,
    SubStringDelimAtIndex,
)


def test_string_ops_golden(scalar_features):
    model = PipelineModel(
        [
            StringAffix(input_col="col4", output_col="affixed", prefix="pre_", suffix="_post"),
            StringCase(input_col="col4", output_col="upper4", case="upper"),
            StringConcatenate(input_cols=["col4", "col5"], output_col="cat45", separator="-"),
            StringContains(input_cols=["col4"], output_col="has_a", constant="a"),
            StringContainsList(input_col="col4", output_col="has_ab", constants=["a", "b"]),
            StringIsInList(input_col="col5", output_col="in_ac", constants=["a", "c"]),
            StringReplace(input_cols=["col4"], output_col="repl", pattern_constant="a", replacement_constant="X"),
        ]
    )
    got = model.transform(scalar_features).toPandas().sort_values("col1").reset_index(drop=True)
    assert got["affixed"].tolist() == ["pre_a_post", "pre_b_post", "pre_a_post"]
    assert got["upper4"].tolist() == ["A", "B", "A"]
    assert got["cat45"].tolist() == ["a-c", "b-c", "a-a"]
    assert got["has_a"].tolist() == [True, False, True]
    assert got["has_ab"].tolist() == [True, True, True]
    assert got["in_ac"].tolist() == [True, True, True]
    assert got["repl"].tolist() == ["X", "b", "X"]


def test_substring_delim_and_lists(spark):
    df = spark.createDataFrame([("a_b_c",), ("x",), ("",)], "s string")
    model = PipelineModel(
        [
            SubStringDelimAtIndex(input_col="s", output_col="second", delimiter="_", index=1, default_value="NA"),
            SubStringDelimAtIndex(input_col="s", output_col="last", delimiter="_", index=-1),
            StringToStringList(input_col="s", output_col="lst", separator="_", list_length=4, default_value="PAD"),
        ]
    )
    got = model.transform(df).toPandas().set_index("s")
    assert got.loc["a_b_c", "second"] == "b"
    assert got.loc["x", "second"] == "NA"
    assert got.loc["a_b_c", "last"] == "c"
    assert list(got.loc["a_b_c", "lst"]) == ["a", "b", "c", "PAD"]


def test_string_list_to_string_and_constant(spark):
    df = spark.createDataFrame([(["a", "b", "c"],)], "arr array<string>")
    model = PipelineModel(
        [
            StringListToString(input_col="arr", output_col="joined", separator="|"),
            StringArrayConstant(output_col="const", values=["x", "y"]),
        ]
    )
    got = model.transform(df).first()
    assert got["joined"] == "a|b|c"
    assert list(got["const"]) == ["x", "y"]


def test_string_sequence_to_embedding(spark):
    df = spark.createDataFrame([("1.0,2.0;3.0,4.0",), ("5.0,6.0",)], "s string")
    op = StringSequenceToEmbedding(
        input_col="s", output_col="emb", seq_len=3, embedding_dim=2, pad_value="-1.0"
    )
    got = PipelineModel([op]).transform(df).toPandas().set_index("s")
    assert [list(v) for v in got.loc["1.0,2.0;3.0,4.0", "emb"]] == [
        [1.0, 2.0], [3.0, 4.0], [-1.0, -1.0]]
    assert [list(v) for v in got.loc["5.0,6.0", "emb"]] == [
        [5.0, 6.0], [-1.0, -1.0], [-1.0, -1.0]]
    # reverse: only the supplied prefix is reversed
    op_r = StringSequenceToEmbedding(
        input_col="s", output_col="emb", seq_len=3, embedding_dim=2,
        pad_value="-1.0", reverse=True,
    )
    got_r = PipelineModel([op_r]).transform(df).toPandas().set_index("s")
    assert [list(v) for v in got_r.loc["1.0,2.0;3.0,4.0", "emb"]] == [
        [3.0, 4.0], [1.0, 2.0], [-1.0, -1.0]]


def test_conditionals(scalar_features):
    model = PipelineModel(
        [
            Identity(input_col="col1", output_col="ident"),
            IfStatement(
                input_cols=["col1", "col2"], output_col="bigger",
                condition_operator="gt",
                result_if_true_constant="yes", result_if_false_constant="no",
            ),
            IfStatement(
                input_cols=["col4"], output_col="is_a",
                condition_operator="eq", value_to_compare_constant="a",
                result_if_true_constant=1.0, result_if_false_constant=0.0,
            ),
            Bin(
                input_col="col1", output_col="bucket",
                conditions=[("lt", 2.0, "small"), ("lt", 5.0, "mid")],
                default_label="large",
            ),
            StringMap(
                input_col="col4", output_col="mapped",
                mapping={"a": "alpha", "b": "beta"}, default_value="other",
            ),
        ]
    )
    got = model.transform(scalar_features).toPandas().sort_values("col1").reset_index(drop=True)
    assert got["ident"].tolist() == got["col1"].tolist()
    assert got["bigger"].tolist() == ["no", "yes", "no"]
    assert got["is_a"].tolist() == [1.0, 0.0, 1.0]
    assert got["bucket"].tolist() == ["small", "mid", "large"]
    assert got["mapped"].tolist() == ["alpha", "beta", "alpha"]


def test_bucketize_golden(spark, scalar_features):
    """Reference golden values (tests/kamae/spark/transformers/
    test_bucketize.py:118-148): bisect_right + 1, null -> null."""
    model = PipelineModel(
        [
            Bucketize(input_col="col1", output_col="b1", splits=[2.0, 3.0, 5.0]),
            Bucketize(input_col="col2", output_col="b2", splits=[1.0, 5.0, 7.0, 7.5]),
            Bucketize(
                input_col="col1_col2_col3", output_col="b_arr",
                splits=[1.0, 5.0, 6.0, 7.0, 7.5],
            ),
        ]
    )
    got = model.transform(scalar_features).toPandas().sort_values("col1").reset_index(drop=True)
    assert got["b1"].tolist() == [1, 3, 4]
    assert got["b2"].tolist() == [2, 2, 5]
    assert [list(a) for a in got["b_arr"]] == [[2, 2, 2], [2, 2, 4], [5, 6, 2]]

    # equal-to-split falls right (bisect_right); null propagates
    df = spark.createDataFrame([(2.0,), (None,)], "x double")
    out = Bucketize(input_col="x", output_col="b", splits=[2.0, 3.0, 5.0]).transform(df)
    vals = [r["b"] for r in out.orderBy(F.col("x").asc_nulls_last()).collect()]
    assert vals == [2, None]

    with pytest.raises(ValueError):
        Bucketize(input_col="x", output_col="b", splits=[10.0, 3.0, 5.0])


def test_datetime_ops(datetimes):
    model = PipelineModel(
        [
            DateParse(input_col="dt", output_col="year", date_part="Year"),
            DateParse(input_col="dt", output_col="dow", date_part="DayOfWeek"),
            DateParse(input_col="dtt", output_col="ms", date_part="Millisecond"),
            DateAdd(input_cols=["dt"], output_col="plus7", num_days=7),
            DateDiff(input_cols=["dt", "dt"], output_col="diff0"),
            DateTimeToUnixTimestamp(input_col="dtt", output_col="unix_s_out", unit="s"),
            DateTimeToUnixTimestamp(input_col="dtt", output_col="unix_ms_out", unit="ms"),
            UnixTimestampToDateTime(input_col="unix_ms", output_col="dt_out", unit="ms"),
        ]
    )
    got = model.transform(datetimes).toPandas().set_index("dt")
    assert got.loc["2024-02-29", "year"] == 2024
    assert got.loc["2024-02-29", "dow"] == 4  # leap day 2024 is a Thursday
    assert got.loc["2023-12-31", "ms"] == 123
    assert got.loc["2024-02-29", "plus7"] == "2024-03-07"
    assert (got["diff0"] == 0).all()
    # double epoch with the millisecond fraction (reference
    # date_time_to_unix_timestamp.py:121-127)
    assert got["unix_s_out"].tolist() == pytest.approx(
        (got["unix_ms"] / 1000.0).tolist()
    )
    assert got["unix_ms_out"].tolist() == pytest.approx(
        got["unix_ms"].tolist(), abs=0.01
    )
    assert got.loc["2023-12-31", "dt_out"] == "2023-12-31 23:59:59.123"


def test_current_ops_injected_now(spark):
    df = spark.range(1)
    model = PipelineModel(
        [
            CurrentDate(output_col="today", now="2025-06-15 12:30:45"),
            CurrentUnixTimestamp(output_col="now_s", unit="s", now="2025-06-15 12:30:45"),
            CurrentUnixTimestamp(output_col="now_ms", unit="ms", now="2025-06-15 12:30:45"),
        ]
    )
    got = model.transform(df).first()
    assert got["today"] == "2025-06-15"
    assert got["now_s"] == 1749990645
    assert got["now_ms"] == 1749990645000


def test_array_ops(padded_sequences):
    model = PipelineModel(
        [
            ArrayCrop(input_col="col2", output_col="crop3", length=3, pad_value=-1.0),
            ArrayCrop(input_col="col2", output_col="crop6", length=6, pad_value=-1.0),
            ArrayReduceMax(input_col="col2", output_col="amax"),
            ArrayReduceMin(input_col="col2", output_col="amin"),
            ArraySubtractMinimum(input_col="col2", output_col="sub_min", pad_value=-1.0),
            ArraySplit(input_col="col2", output_cols=["e1", "e2", "e3", "e4"]),
            ArrayConcatenate(input_cols=["col1", "col2"], output_col="vec"),
        ]
    )
    got = model.transform(padded_sequences).toPandas().sort_values("col1").reset_index(drop=True)
    assert list(got["crop3"][0]) == [3.0, 2.0, 1.0]
    assert list(got["crop6"][0]) == [3.0, 2.0, 1.0, -1.0, -1.0, -1.0]
    assert got["amax"].tolist() == [3.0, 100.0, 12.0]
    assert got["amin"].tolist() == [-1.0, -1.0, -1.0]
    # pad positions preserved, others shifted by non-pad min
    assert list(got["sub_min"][0]) == [2.0, 1.0, 0.0, -1.0]
    assert list(got["sub_min"][2]) == [4.0, 0.0, -1.0, -1.0]
    assert got["e2"].tolist() == [2.0, 6.0, 8.0]
    assert list(got["vec"][0]) == [1.0, 3.0, 2.0, 1.0, -1.0]


def test_cosine_similarity(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0], [1.0, 0.0, 0.0, 1.0, 1.0, 0.0])],
        "q array<double>, v array<double>, cands array<double>",
    )
    model = PipelineModel(
        [
            CosineSimilarity(input_cols=["q", "v"], output_col="cos"),
            PairwiseCosineSimilarity(
                input_cols=["q", "cands"], output_col="sims", embedding_dim=2
            ),
        ]
    )
    got = model.transform(df).first()
    assert abs(got["cos"] - 1.0) < 1e-9
    assert [round(s, 6) for s in got["sims"]] == [1.0, 0.0, 1.0]


def test_ordinal_array_encode(spark):
    df = spark.createDataFrame(
        [(["b", "a", "b", "PAD"],)], "arr array<string>"
    )
    got = (
        PipelineModel(
            [OrdinalArrayEncode(input_col="arr", output_col="ord", pad_value="PAD")]
        )
        .transform(df)
        .first()["ord"]
    )
    assert list(got) == [0, 1, 0, -1]
