"""Round-5 reference test-matrix port: one-hot encode layout matrix,
nested array concatenate with scalar broadcast, string<->string-list
matrices. Golden values pinned from the reference's parametrized
vectors (file:line cited per test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamae_spark.operators.arrays import ArrayConcatenate
from kamae_spark.operators.indexers import OneHotTransformer
from kamae_spark.operators.strings import StringListToString, StringToStringList


def _col(df, name):
    return [r[name] for r in df.orderBy("__ord").collect()]


# -- OneHotEncode (reference test_one_hot_encode.py) -------------------------


def test_one_hot_scalar_drop_unseen(spark):
    """Reference test_one_hot_encode.py:120-132,186-193: labels
    [a,b,c,d], drop_unseen=True -> vector length == len(labels), no OOV
    slots (regardless of num_oov), unseen encodes all-zero."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["a", "b", "a", "c", "d", "e"])],
        "__ord int, col1 string",
    )
    t = OneHotTransformer(
        input_col="col1", output_col="o", labels=["a", "b", "c", "d"],
        num_oov_indices=3, drop_unseen=True,
    )
    got = _col(t.transform(df), "o")
    assert got == [
        [1, 0, 0, 0], [0, 1, 0, 0], [1, 0, 0, 0],
        [0, 0, 1, 0], [0, 0, 0, 1], [0, 0, 0, 0],
    ]


def test_one_hot_scalar_keep_unseen(spark):
    """Reference test_one_hot_encode.py:134-146,195-204: num_oov=1,
    drop_unseen=False -> OOV slot FIRST, labels after."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["a", "b", "a", "c", "d", "e"])],
        "__ord int, col1 string",
    )
    t = OneHotTransformer(
        input_col="col1", output_col="o", labels=["a", "b", "c", "d"],
        num_oov_indices=1, drop_unseen=False,
    )
    got = _col(t.transform(df), "o")
    assert got == [
        [0, 1, 0, 0, 0], [0, 0, 1, 0, 0], [0, 1, 0, 0, 0],
        [0, 0, 0, 1, 0], [0, 0, 0, 0, 1], [1, 0, 0, 0, 0],
    ]


def test_one_hot_scalar_mask_token(spark):
    """Reference test_one_hot_encode.py:148-160,205-214: mask_token='e'
    -> slot 0 is the mask, OOV next, labels after (length 2+len)."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["a", "b", "a", "c", "d", "e"])],
        "__ord int, col1 string",
    )
    t = OneHotTransformer(
        input_col="col1", output_col="o", labels=["a", "b", "c", "d"],
        num_oov_indices=1, drop_unseen=False, mask_token="e",
    )
    got = _col(t.transform(df), "o")
    assert got == [
        [0, 0, 1, 0, 0, 0], [0, 0, 0, 1, 0, 0], [0, 0, 1, 0, 0, 0],
        [0, 0, 0, 0, 1, 0], [0, 0, 0, 0, 0, 1], [1, 0, 0, 0, 0, 0],
    ]


NESTED_OH_INPUT = [
    [["a", "c", "c"], ["a", "c", "c"], ["a", "a", "a"]],
    [["a", "d", "c"], ["a", "t", "s"], ["x", "o", "p"]],
    [["l", "c", "c"], ["a", "h", "c"], ["a", "w", "a"]],
]


def test_one_hot_nested_array_keep_unseen(spark):
    """Reference test_one_hot_encode.py:66-104 (col4 keep-unseen
    expected): labels [a,b,c], num_oov=1 -> innermost strings become
    4-vectors with OOV slot first, nesting preserved."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(NESTED_OH_INPUT)],
        "__ord int, col4 array<array<string>>",
    )
    t = OneHotTransformer(
        input_col="col4", output_col="o", labels=["a", "b", "c"],
        num_oov_indices=1, drop_unseen=False,
    )
    got = _col(t.transform(df), "o")
    assert got == [
        [[[0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 0, 1]],
         [[0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 0, 1]],
         [[0, 1, 0, 0], [0, 1, 0, 0], [0, 1, 0, 0]]],
        [[[0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
         [[0, 1, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]],
         [[1, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]]],
        [[[1, 0, 0, 0], [0, 0, 0, 1], [0, 0, 0, 1]],
         [[0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
         [[0, 1, 0, 0], [1, 0, 0, 0], [0, 1, 0, 0]]],
    ]


def test_one_hot_nested_array_drop_unseen(spark):
    """Reference test_one_hot_encode.py:24-63 (col4 drop-unseen
    expected): labels [a,b,c], num_oov=4 but drop_unseen=True -> length
    stays 3, every OOV string encodes all-zero."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(NESTED_OH_INPUT)],
        "__ord int, col4 array<array<string>>",
    )
    t = OneHotTransformer(
        input_col="col4", output_col="o", labels=["a", "b", "c"],
        num_oov_indices=4, drop_unseen=True,
    )
    got = _col(t.transform(df), "o")
    assert got == [
        [[[1, 0, 0], [0, 0, 1], [0, 0, 1]],
         [[1, 0, 0], [0, 0, 1], [0, 0, 1]],
         [[1, 0, 0], [1, 0, 0], [1, 0, 0]]],
        [[[1, 0, 0], [0, 0, 0], [0, 0, 1]],
         [[1, 0, 0], [0, 0, 0], [0, 0, 0]],
         [[0, 0, 0], [0, 0, 0], [0, 0, 0]]],
        [[[0, 0, 0], [0, 0, 1], [0, 0, 1]],
         [[1, 0, 0], [0, 0, 0], [0, 0, 1]],
         [[1, 0, 0], [0, 0, 0], [1, 0, 0]]],
    ]


# -- ArrayConcatenate nested + scalar broadcast ------------------------------


def test_array_concatenate_nested_broadcast(spark):
    """Reference test_array_concatenate.py:27-76: concatenating two
    3-level nested string arrays plus a SCALAR column appends the scalar
    to every innermost list."""
    df = spark.createDataFrame(
        [(
            [[["t", "a"], ["c", "s"]], [["d", "f"], ["l", "a"]],
             [["v", "i"], ["r", "j"]], [["r", "l"], ["d", "v"]]],
            [[["a", "b"], ["c", "d"]]] * 4,
            "5",
        )],
        "col1 array<array<array<string>>>, col2 array<array<array<string>>>, col3 string",
    )
    out = ArrayConcatenate(
        input_cols=["col1", "col2", "col3"], output_col="vec"
    ).transform(df)
    assert out.first()["vec"] == [
        [["t", "a", "a", "b", "5"], ["c", "s", "c", "d", "5"]],
        [["d", "f", "a", "b", "5"], ["l", "a", "c", "d", "5"]],
        [["v", "i", "a", "b", "5"], ["r", "j", "c", "d", "5"]],
        [["r", "l", "a", "b", "5"], ["d", "v", "c", "d", "5"]],
    ]


# -- StringToStringList (reference test_string_to_string_list.py) ------------


@pytest.mark.parametrize(
    "col, sep, length, expected",
    [
        # :57-80 truncate to list_length
        ("col1", "|", 3, [
            ["Hello World", "adventure time", "let's go"],
            ["ADVENTURE Time", "is upon", "us"],
            ["time", "to", "begin"],
        ]),
        # :82-106 exact length
        ("col2", ",", 4, [
            ["1.067", "-67.8", "0.0", "0.0"],
            ["0.0", "0.0", "0.0", "0.0"],
            ["-1.0", "6.789", "3.067", "456.078"],
        ]),
        # :108-131 pad with default
        ("col3", "^", 4, [
            ["split", "me", "up", "DEFAULT"],
            ["split", "me", "up", "again"],
            ["split", "me", "up", "again"],
        ]),
    ],
)
def test_string_to_string_list_matrix(spark, col, sep, length, expected):
    df = spark.createDataFrame(
        [
            (0, "Hello World|adventure time|let's go",
             "1.067,-67.8,0.0,0.0", "split^me^up"),
            (1, "ADVENTURE Time|is upon|us",
             "0.0,0.0,0.0,0.0", "split^me^up^again"),
            (2, "time|to|begin|again",
             "-1.0,6.789,3.067,456.078", "split^me^up^again^again"),
        ],
        "__ord int, col1 string, col2 string, col3 string",
    )
    t = StringToStringList(
        input_col=col, output_col="o", separator=sep,
        list_length=length, default_value="DEFAULT",
    )
    assert _col(t.transform(df), "o") == expected


def test_string_to_string_list_nested(spark):
    """Reference :133-157,188-196: splitting inside a nested string
    array adds one nesting level; '-' separator, length 2, default pad
    ('a' -> ['a','DEFAULT']), extra splits truncated ('l-m-n-o' ->
    ['l','m'])."""
    df = spark.createDataFrame(
        [(0, [["a", "b-c", "c-d"], ["d-e", "e-f", "f-g"],
              ["g-h", "h-i", "i-j"], ["j-k", "k-l", "l-m-n-o"]])],
        "__ord int, col1 array<array<string>>",
    )
    t = StringToStringList(
        input_col="col1", output_col="o", separator="-",
        list_length=2, default_value="DEFAULT",
    )
    assert _col(t.transform(df), "o") == [[
        [["a", "DEFAULT"], ["b", "c"], ["c", "d"]],
        [["d", "e"], ["e", "f"], ["f", "g"]],
        [["g", "h"], ["h", "i"], ["i", "j"]],
        [["j", "k"], ["k", "l"], ["l", "m"]],
    ]]


# -- StringListToString (reference test_string_list_to_string.py) ------------


@pytest.mark.parametrize(
    "sep, expected",
    [
        (" ", ["Hello World adventure time let's go",
               "ADVENTURE Time is upon us", "time to begin"]),   # :34-47
        ("=>", ["Hello World=>adventure time=>let's go",
                "ADVENTURE Time=>is upon=>us", "time=>to=>begin"]),  # :49-62
        ("SEPARATOR", ["Hello WorldSEPARATORadventure timeSEPARATORlet's go",
                       "ADVENTURE TimeSEPARATORis uponSEPARATORus",
                       "timeSEPARATORtoSEPARATORbegin"]),  # :64-81
    ],
)
def test_string_list_to_string_matrix(spark, sep, expected):
    df = spark.createDataFrame(
        [
            (0, ["Hello World", "adventure time", "let's go"]),
            (1, ["ADVENTURE Time", "is upon", "us"]),
            (2, ["time", "to", "begin"]),
        ],
        "__ord int, col1 array<string>",
    )
    t = StringListToString(input_col="col1", output_col="o", separator=sep)
    assert _col(t.transform(df), "o") == expected


def test_string_list_to_string_nested_consumes_one_level(spark):
    """Reference :84-110,132-139: on array<array<string>> the join
    applies at the INNERMOST axis, consuming exactly one nesting level."""
    df = spark.createDataFrame(
        [(0, [["a", "b", "c"], ["d", "e", "f"],
              ["g", "h", "i"], ["j", "k", "l"]])],
        "__ord int, col1 array<array<string>>",
    )
    t = StringListToString(input_col="col1", output_col="o", separator="-")
    assert _col(t.transform(df), "o") == [
        ["a-b-c", "d-e-f", "g-h-i", "j-k-l"]
    ]
