"""Round-5 reference test-matrix port, batch 13: string-contains
(two-column + constant + empty-needle rule + nested), isin float
output dtype. Vectors from the reference's
test_string_contains.py:20-193, test_string_isin_list.py:105-147."""

from __future__ import annotations

import pytest

from kamae_spark.operators.strings import StringContains, StringIsInList


def _col(df, name):
    return [r[name] for r in df.orderBy("__ord").collect()]


CONTAINS_ROWS = [
    (0, "string]", "ing]"),
    (1, "thing", "ng"),
    (2, "bling", "bi"),
    (3, "", ""),
    (4, "nonempty", ""),
]


def test_string_contains_two_columns_empty_needle_rule(spark):
    """string_contains_expected_0: '' needle matches ONLY '' (row 4
    True, row 5 False — plain .contains would say True)."""
    df = spark.createDataFrame(CONTAINS_ROWS, "__ord int, col1 string, col2 string")
    out = StringContains(
        input_cols=["col1", "col2"], output_col="o"
    ).transform(df)
    assert _col(out, "o") == [True, True, False, True, False]


def test_string_contains_constant_golden(spark):
    """string_contains_expected_1: constant 'in'."""
    df = spark.createDataFrame(CONTAINS_ROWS, "__ord int, col1 string, col2 string")
    out = StringContains(
        input_cols=["col1"], output_col="o", constant="in"
    ).transform(df)
    assert _col(out, "o") == [True, True, True, False, False]


def test_string_contains_negation(spark):
    df = spark.createDataFrame(CONTAINS_ROWS, "__ord int, col1 string, col2 string")
    out = StringContains(
        input_cols=["col1", "col2"], output_col="o", negation=True
    ).transform(df)
    assert _col(out, "o") == [False, False, True, False, True]


def test_string_contains_nested_constant(spark):
    """string_contains_array_w_constant_expected shape: constant 'in'
    elementwise through the nested array."""
    data = [[["string]", "ing]", "str.ng"]], [["thing", "ng", "th.*"]],
            [["bling", "bi", "bl..g"]], [["", "", ".*"]],
            [["nonempty", "", ".*"]]]
    df = spark.createDataFrame([(data,)], "col1 array<array<array<string>>>")
    out = StringContains(
        input_cols=["col1"], output_col="o", constant="in"
    ).transform(df)
    got = out.first()["o"]
    assert got[0] == [[True, True, False]]     # string], ing], str.ng
    assert got[1] == [[True, False, False]]    # thing, ng, th.*
    assert got[2] == [[True, False, False]]    # bling, bi, bl..g
    assert got[3] == [[False, False, False]]
    assert got[4] == [[False, False, False]]


def test_string_isin_list_float_output_dtype(spark):
    """string_isin_list numeric variant: booleans cast to float via
    output_dtype (reference case 2)."""
    df = spark.createDataFrame(
        [(0, "string"), (1, "other"), (2, "")], "__ord int, col1 string"
    )
    out = StringIsInList(
        input_col="col1", output_col="o", constants=["string", ""],
        output_dtype="float",
    ).transform(df)
    assert _col(out, "o") == [1.0, 0.0, 1.0]
    assert dict(out.dtypes)["o"] == "float"
