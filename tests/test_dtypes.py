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
