"""Level-2 nested-array shape/value parity for elementwise operators.

The reference's behavior contract (array_utils.py recursion applied by
every single/multi-input scalar transform) is: an elementwise op over an
array<array<T>> column equals the op applied to each innermost scalar
with the nesting preserved. Each case below runs one operator BOTH ways
— on a level-2 nested column and on the flattened scalars — and asserts
the flattened nested output equals the scalar output exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamae_spark.core.pipeline import PipelineModel

# innermost scalars, read row-major; nested fixture is 2 rows x (2x2)
X = [[[1.5, -3.0], [0.25, 64.0]], [[0.0, 2.0], [-0.5, 7.0]]]
Y = [[[2.0, 0.5], [-1.0, 4.0]], [[3.0, -2.0], [0.5, 1.0]]]
S = [[["a-b", "c-d"], ["e-f", "a-b"]], [["x-y", "a-b"], ["c-d", "q-r"]]]


@pytest.fixture(scope="module")
def nested_df(spark):
    return spark.createDataFrame(
        [(i, X[i], Y[i], S[i]) for i in range(2)],
        "id int, xn array<array<double>>, yn array<array<double>>, sn array<array<string>>",
    )


@pytest.fixture(scope="module")
def scalar_df(spark):
    rows = []
    k = 0
    for i in range(2):
        for a in range(2):
            for b in range(2):
                rows.append((k, X[i][a][b], Y[i][a][b], S[i][a][b]))
                k += 1
    return spark.createDataFrame(rows, "k int, x double, y double, s string")


def _flatten(vals):
    out = []
    for row in vals:
        for inner in row:
            out.extend(inner)
    return out


def _cases():
    from kamae_spark.operators.conditional import (
        Bin, Bucketize, Identity, IfStatement, StringMap,
    )
    from kamae_spark.operators.hashing import BloomEncode, HashIndex
    from kamae_spark.operators.indexers import OneHotTransformer, StringIndexTransformer
    from kamae_spark.operators.math import (
        AbsoluteValue, Divide, Exp, Exponent, Log, Max, Mean, Min, Modulo,
        Multiply, Round, RoundToDecimal, Subtract, Sum,
    )
    from kamae_spark.operators.scalers import (
        ImputeTransformer, MinMaxScaleTransformer, StandardScaleTransformer,
    )
    from kamae_spark.operators.strings import (
        StringAffix, StringCase, StringContains, StringReplace,
        SubStringDelimAtIndex,
    )

    # (case_id, op class, numeric-single / numeric-multi / string kwargs)
    return [
        ("identity", Identity, {"n": dict(input_col="xn"), "s": dict(input_col="x")}),
        ("abs", AbsoluteValue, {"n": dict(input_col="xn"), "s": dict(input_col="x")}),
        ("log", Log, {"n": dict(input_col="xn"), "s": dict(input_col="x"), "kw": dict(alpha=10.0)}),
        ("exp", Exp, {"n": dict(input_col="xn"), "s": dict(input_col="x")}),
        ("exponent", Exponent, {"n": dict(input_cols=["xn"]), "s": dict(input_cols=["x"]), "kw": dict(constant=2.0)}),
        ("sum", Sum, {"n": dict(input_cols=["xn", "yn"]), "s": dict(input_cols=["x", "y"])}),
        ("subtract", Subtract, {"n": dict(input_cols=["xn", "yn"]), "s": dict(input_cols=["x", "y"])}),
        ("multiply", Multiply, {"n": dict(input_cols=["xn", "yn"]), "s": dict(input_cols=["x", "y"])}),
        ("divide", Divide, {"n": dict(input_cols=["xn", "yn"]), "s": dict(input_cols=["x", "y"])}),
        ("mean", Mean, {"n": dict(input_cols=["xn", "yn"]), "s": dict(input_cols=["x", "y"])}),
        ("max", Max, {"n": dict(input_cols=["xn", "yn"]), "s": dict(input_cols=["x", "y"])}),
        ("min", Min, {"n": dict(input_cols=["xn", "yn"]), "s": dict(input_cols=["x", "y"])}),
        ("modulo", Modulo, {"n": dict(input_cols=["xn"]), "s": dict(input_cols=["x"]), "kw": dict(constant=-3.0)}),
        ("round", Round, {"n": dict(input_col="xn"), "s": dict(input_col="x"), "kw": dict(mode="ceil")}),
        ("round_dec", RoundToDecimal, {"n": dict(input_col="xn"), "s": dict(input_col="x"), "kw": dict(scale=1)}),
        ("bin", Bin, {"n": dict(input_col="xn"), "s": dict(input_col="x"),
                      "kw": dict(conditions=[("lt", 0.0, "neg"), ("lt", 1.0, "small")], default_label="big")}),
        ("bucketize", Bucketize, {"n": dict(input_col="xn"), "s": dict(input_col="x"),
                                  "kw": dict(splits=[0.0, 1.0, 5.0])}),
        ("if_const", IfStatement, {"n": dict(input_cols=["xn"]), "s": dict(input_cols=["x"]),
                                   "kw": dict(condition_operator="geq", value_to_compare_constant=0.5,
                                              result_if_true_constant=1.0, result_if_false_constant=-1.0)}),
        ("impute", ImputeTransformer, {"n": dict(input_col="xn"), "s": dict(input_col="x"),
                                       "kw": dict(statistic=9.0, mask_value=0.0)}),
        ("std_scale", StandardScaleTransformer, {"n": dict(input_col="xn"), "s": dict(input_col="x"),
                                                 "kw": dict(mean=1.0, stddev=2.0)}),
        ("mm_scale", MinMaxScaleTransformer, {"n": dict(input_col="xn"), "s": dict(input_col="x"),
                                              "kw": dict(min=-3.0, max=64.0)}),
        ("affix", StringAffix, {"n": dict(input_col="sn"), "s": dict(input_col="s"),
                                "kw": dict(prefix="<", suffix=">")}),
        ("case", StringCase, {"n": dict(input_col="sn"), "s": dict(input_col="s"),
                              "kw": dict(case="upper")}),
        ("contains", StringContains, {"n": dict(input_cols=["sn"]), "s": dict(input_cols=["s"]),
                                      "kw": dict(constant="a")}),
        ("replace", StringReplace, {"n": dict(input_cols=["sn"]), "s": dict(input_cols=["s"]),
                                    "kw": dict(pattern_constant="-", replacement_constant="_", regex=False)}),
        ("delim_at", SubStringDelimAtIndex, {"n": dict(input_col="sn"), "s": dict(input_col="s"),
                                             "kw": dict(delimiter="-", index=1, default_value="NA")}),
        ("string_map", StringMap, {"n": dict(input_col="sn"), "s": dict(input_col="s"),
                                   "kw": dict(mapping={"a-b": "AB"}, default_value="other")}),
        ("hash_index", HashIndex, {"n": dict(input_col="sn"), "s": dict(input_col="s"),
                                   "kw": dict(num_bins=16)}),
        ("bloom", BloomEncode, {"n": dict(input_col="sn"), "s": dict(input_col="s"),
                                "kw": dict(num_bins=16, num_hash_fns=2)}),
        ("string_index", StringIndexTransformer, {"n": dict(input_col="sn"), "s": dict(input_col="s"),
                                                  "kw": dict(labels=["a-b", "c-d"])}),
        ("one_hot", OneHotTransformer, {"n": dict(input_col="sn"), "s": dict(input_col="s"),
                                        "kw": dict(labels=["a-b", "c-d"])}),
    ]


@pytest.mark.parametrize(
    "case_id,cls,spec", [(c[0], c[1], c[2]) for c in _cases()],
    ids=[c[0] for c in _cases()],
)
def test_level2_nested_equals_scalar(nested_df, scalar_df, case_id, cls, spec):
    kw = spec.get("kw", {})
    n_out = (
        PipelineModel([cls(output_col="o", **spec["n"], **kw)])
        .transform(nested_df).orderBy("id").collect()
    )
    s_out = (
        PipelineModel([cls(output_col="o", **spec["s"], **kw)])
        .transform(scalar_df).orderBy("k").collect()
    )
    flat_nested = _flatten([r["o"] for r in n_out])
    scalars = [r["o"] for r in s_out]
    assert [str(v) for v in flat_nested] == [str(v) for v in scalars], case_id
    # shape parity: output nesting mirrors the input's 2x2 structure
    for r in n_out:
        assert len(r["o"]) == 2 and all(len(inner) == 2 for inner in r["o"])
