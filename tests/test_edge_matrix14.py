"""Round-5 reference test-matrix port, batch 10: string affix /
case / concatenate matrices incl. nested-array broadcast. Vectors from
the reference's test_string_affix.py:20-163, test_string_case.py:20-183,
test_string_concatenate.py:20-145."""

from __future__ import annotations

import pytest

from kamae_spark.operators.strings import StringAffix, StringCase, StringConcatenate


def _col(df, name):
    return [r[name] for r in df.orderBy("__ord").collect()]


STR_ROWS = [(0, "a", "c"), (1, "b", "c"), (2, "a", "a")]
NEST1 = [["a", "b", "c"], ["d", "e", "f"], ["g", "h", "i"], ["j", "k", "l"]]
NEST2 = [["m", "n", "o"], ["p", "q", "r"], ["s", "t", "u"], ["v", "w", "x"]]


# -- StringAffix -------------------------------------------------------------


@pytest.mark.parametrize(
    "col, prefix, suffix, expected",
    [
        ("col5", ">", "<", [">c<", ">c<", ">a<"]),          # expected_2
        ("col4", "www.", "", ["www.a", "www.b", "www.a"]),  # expected_4
        ("col5", "", ".com", ["c.com", "c.com", "a.com"]),  # expected_5
    ],
)
def test_string_affix_golden(spark, col, prefix, suffix, expected):
    df = spark.createDataFrame(STR_ROWS, "__ord int, col4 string, col5 string")
    out = StringAffix(
        input_col=col, output_col="o", prefix=prefix, suffix=suffix
    ).transform(df)
    assert _col(out, "o") == expected


def test_string_affix_nested_golden(spark):
    """string_affix_col1_array_expected: pre_/_post through nesting."""
    df = spark.createDataFrame([(NEST1,)], "col1 array<array<string>>")
    out = StringAffix(
        input_col="col1", output_col="o", prefix="pre_", suffix="_post"
    ).transform(df)
    assert out.first()["o"] == [
        [f"pre_{c}_post" for c in row] for row in NEST1
    ]


# -- StringCase --------------------------------------------------------------

CASE_ROWS = [
    (0, "Hello World", "en_US", ["en_US", "en_US", "en_US"]),
    (1, "ADVENTURE Time", "en_CA", ["en_CA", "ch_CH", "es_US"]),
    (2, "Begins", "es_US", ["es_BR", "ch_CH", "es_US"]),
]
CASE_SCHEMA = "__ord int, col1 string, col2 string, col3 array<string>"


@pytest.mark.parametrize(
    "col, case, expected",
    [
        ("col1", "upper", ["HELLO WORLD", "ADVENTURE TIME", "BEGINS"]),
        ("col1", "lower", ["hello world", "adventure time", "begins"]),
        ("col2", "lower", ["en_us", "en_ca", "es_us"]),
        ("col3", "upper", [["EN_US"] * 3, ["EN_CA", "CH_CH", "ES_US"],
                           ["ES_BR", "CH_CH", "ES_US"]]),
    ],
)
def test_string_case_golden(spark, col, case, expected):
    df = spark.createDataFrame(CASE_ROWS, CASE_SCHEMA)
    out = StringCase(input_col=col, output_col="o", case=case).transform(df)
    assert _col(out, "o") == expected


# -- StringConcatenate -------------------------------------------------------


def test_string_concatenate_default_separator(spark):
    df = spark.createDataFrame(STR_ROWS, "__ord int, col4 string, col5 string")
    out = StringConcatenate(
        input_cols=["col4", "col5"], output_col="o"
    ).transform(df)
    assert _col(out, "o") == ["a_c", "b_c", "a_a"]


def test_string_concatenate_custom_separator_and_order(spark):
    df = spark.createDataFrame(STR_ROWS, "__ord int, col4 string, col5 string")
    out = StringConcatenate(
        input_cols=["col5", "col4"], output_col="o", separator="*"
    ).transform(df)
    assert _col(out, "o") == ["c*a", "c*b", "a*a"]


def test_string_concatenate_numeric_inputs_cast(spark):
    """expected_3: doubles cast via input_dtype='string' then joined
    with the empty separator."""
    rows = [(0, 1.0, 2.0, 3.0), (1, 4.0, 2.0, 6.0), (2, 7.0, 8.0, 3.0)]
    df = spark.createDataFrame(rows, "__ord int, col1 double, col2 double, col3 double")
    out = StringConcatenate(
        input_cols=["col1", "col2", "col3"], output_col="o",
        separator="", input_dtype="string",
    ).transform(df)
    assert _col(out, "o") == ["1.02.03.0", "4.02.06.0", "7.08.03.0"]


def test_string_concatenate_nested_golden(spark):
    """concat_string_concat_array: two nested columns zip elementwise."""
    df = spark.createDataFrame(
        [(NEST1, NEST2)],
        "col1 array<array<string>>, col2 array<array<string>>",
    )
    out = StringConcatenate(
        input_cols=["col1", "col2"], output_col="o", separator="-"
    ).transform(df)
    assert out.first()["o"] == [
        [f"{a}-{b}" for a, b in zip(r1, r2)] for r1, r2 in zip(NEST1, NEST2)
    ]
