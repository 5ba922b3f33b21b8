"""input_dtype/output_dtype casting and dtype validation (reference:
spark_operation.py:128-206,338-372; docs/achieving_type_parity.md)."""

from __future__ import annotations

import pytest

from kamae_spark.core.pipeline import PipelineModel
from kamae_spark.operators.math import AbsoluteValue, Log


def test_output_dtype_cast(spark):
    df = spark.createDataFrame([(2.0,)], "x double")
    op = Log(input_col="x", output_col="y", alpha=0.0, output_dtype="float")
    out = PipelineModel([op]).transform(df)
    assert out.schema["y"].dataType.typeName() == "float"


def test_input_dtype_cast_string_to_double(spark):
    df = spark.createDataFrame([("-3.5",)], "x string")
    op = AbsoluteValue(input_col="x", output_col="y", input_dtype="double")
    got = PipelineModel([op]).transform(df).first()
    assert got["y"] == 3.5


def test_input_cast_does_not_mutate_source(spark):
    df = spark.createDataFrame([("-3.5",)], "x string")
    op = AbsoluteValue(input_col="x", output_col="y", input_dtype="double")
    out = PipelineModel([op]).transform(df)
    assert out.schema["x"].dataType.typeName() == "string"  # untouched


def test_nested_array_dtype_cast(spark):
    df = spark.createDataFrame([([[-1.0, 2.0]],)], "x array<array<double>>")
    op = AbsoluteValue(input_col="x", output_col="y", output_dtype="float")
    out = PipelineModel([op]).transform(df)
    inner = out.schema["y"].dataType.elementType.elementType
    assert inner.typeName() == "float"
    assert [list(v) for v in out.first()["y"]] == [[1.0, 2.0]]


def test_incompatible_dtype_rejected(spark):
    df = spark.createDataFrame([("abc",)], "x string")
    op = Log(input_col="x", output_col="y")  # numeric-only op
    with pytest.raises(TypeError, match="element dtype 'string'"):
        PipelineModel([op]).transform(df)


def test_negative_zero_normalized_on_cast(spark):
    """Reference spark_operation.py:138-155: any numeric cast forces the
    sign of zero positive (TF parity rule) — scalars, nested arrays, and
    float -> string all normalize; non-zero values and non-cast paths
    are untouched."""
    import math
    import struct

    from kamae_spark.operators.math import Multiply

    def is_neg_zero(v: float) -> bool:
        return v == 0.0 and math.copysign(1.0, v) < 0

    df = spark.createDataFrame(
        [(0.0, -1.0, [[0.0, -2.0]])],
        "x double, m double, arr array<array<double>>",
    )
    # x * -1.0 = -0.0; with an output cast it must come out +0.0
    cast = PipelineModel([
        Multiply(input_cols=["x", "m"], output_col="y", output_dtype="double"),
        Multiply(input_cols=["x", "m"], output_col="y_f", output_dtype="float"),
        Multiply(input_cols=["x", "m"], output_col="y_raw"),  # no cast: stays -0.0
        Multiply(input_cols=["arr", "m"], output_col="arr_y", output_dtype="double"),
    ]).transform(df).first()
    assert not is_neg_zero(cast["y"]) and cast["y"] == 0.0
    assert not is_neg_zero(cast["y_f"]) and cast["y_f"] == 0.0
    assert is_neg_zero(cast["y_raw"])  # uncast path preserved (no silent rewrite)
    assert not is_neg_zero(cast["arr_y"][0][0]) and cast["arr_y"][0][1] == 2.0

    # float source -> string target: "-0.0" would leak the sign textually
    df2 = spark.createDataFrame([(-0.0,), (1.5,)], "x double")
    from kamae_spark.operators.conditional import Identity

    out = PipelineModel([
        Identity(input_col="x", output_col="s", input_dtype="string")
    ]).transform(df2)
    vals = sorted(r["s"] for r in out.collect())
    assert vals == ["0.0", "1.5"], vals
