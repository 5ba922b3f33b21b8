"""Conditional / mapping transformers (reference SURVEY.md §2.2).

Identity, IfStatement, Bin, StringMap — all chained ``F.when`` Column
expressions, elementwise through nested arrays.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from kamae_spark.core.dtypes import ALL, NUMERIC
from kamae_spark.core.stage import keyword_params
from kamae_spark.operators.rowwise import ElementwiseTransform

# condition-operator map (reference src/kamae/utils/utils.py:19-39)
_OPS = {
    "eq": lambda a, b: a == b,
    "neq": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "leq": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "geq": lambda a, b: a >= b,
}


class Identity(ElementwiseTransform):
    """Pass-through; useful as a pure cast stage (reference identity.py:83)."""

    compatible_dtypes = ALL

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fn(self, x: Column) -> Column:
        return x


class IfStatement(ElementwiseTransform):
    """IF <a> <op> <b> THEN <t> ELSE <f> (reference if_statement.py:355-388).

    ``a`` is the first input column; ``b``/``t``/``f`` each come from the
    next input columns (in order) or from the ``*_constant`` params.
    Works for string and numeric operands (reference has a separate
    NumericalIfStatement with identical Spark semantics — both map here).
    """

    compatible_dtypes = ALL

    @keyword_params
    def __init__(self, input_cols: Sequence[str], output_col: str,
                 condition_operator: str = "eq",
                 value_to_compare_constant: Any = None,
                 result_if_true_constant: Any = None,
                 result_if_false_constant: Any = None,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        if condition_operator not in _OPS:
            raise ValueError(f"condition_operator must be one of {sorted(_OPS)}")

    def fn(self, *cols: Column) -> Column:
        it = iter(cols[1:])
        b = F.lit(self.value_to_compare_constant) if self.value_to_compare_constant is not None else next(it)
        t = F.lit(self.result_if_true_constant) if self.result_if_true_constant is not None else next(it)
        f = F.lit(self.result_if_false_constant) if self.result_if_false_constant is not None else next(it)
        return F.when(_OPS[self.condition_operator](cols[0], b), t).otherwise(f)


class NumericalIfStatement(IfStatement):
    """Name-parity alias: the reference ships a numeric-only variant
    (numerical_if_statement.py:330) whose Spark semantics are identical
    to IfStatement; both map to the same implementation here."""


class Bin(ElementwiseTransform):
    """Numeric -> string label via ordered (op, value, label) conditions
    with a default label; first matching condition wins (reference
    bin.py:268-311 builds the chain by folding in reverse so the
    first-listed condition is outermost)."""

    compatible_dtypes = NUMERIC

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 conditions: Sequence[Sequence] = (),  # [(op, value, label), ...]
                 default_label: str = "default",
                 input_dtype: str | None = None, output_dtype: str | None = None):
        for c in conditions:
            if len(c) != 3 or c[0] not in _OPS:
                raise ValueError("conditions must be (op, value, label) with known op")

    def fn(self, x: Column) -> Column:
        # labels keep their native type (reference bin.py:296-299 lits
        # them raw — numeric labels stay numeric, bin_transform_expected_3)
        expr: Column = F.lit(self.default_label)
        for op, value, label in reversed(list(self.conditions)):
            expr = F.when(_OPS[op](x, F.lit(value)), F.lit(label)).otherwise(expr)
        return expr


class Bucketize(ElementwiseTransform):
    """Numeric -> bucket index over sorted ``splits``; bucket =
    bisect_right(splits, x) + 1 (the +1 reserves index 0 for mask /
    padding), null stays null (reference bucketize.py:146-165).

    Unlike the reference's per-row binary-search UDF this is a chained
    ``F.when`` Catalyst expression (whole-stage codegen; split lists are
    small in practice so a linear chain beats crossing the Python
    boundary), elementwise through any array nesting.
    """

    compatible_dtypes = NUMERIC

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 splits: Sequence[float] = (),
                 input_dtype: str | None = None, output_dtype: str | None = None):
        if not splits:
            raise ValueError("splits must be a non-empty sorted sequence")
        if list(splits) != sorted(splits):
            raise ValueError("splits must be sorted ascending")

    def fn(self, x: Column) -> Column:
        # bisect_right: first split STRICTLY greater than x marks the
        # bucket; equal values fall to the right of the split
        expr: Column = F.lit(len(self.splits) + 1)
        for i, s in reversed(list(enumerate(self.splits))):
            expr = F.when(x < F.lit(float(s)), F.lit(i + 1)).otherwise(expr)
        return F.when(x.isNotNull(), expr).cast("int")


class StringMap(ElementwiseTransform):
    """CASE WHEN on string equality with default (reference string_map.py:205)."""

    compatible_dtypes = ("string",)

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 mapping: dict[str, str] | None = None,
                 default_value: str | None = None,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        if not mapping:
            raise ValueError("mapping must be a non-empty dict")

    def fn(self, x: Column) -> Column:
        expr: Column = F.lit(self.default_value) if self.default_value is not None else x
        for k, v in reversed(list(self.mapping.items())):
            expr = F.when(x == F.lit(k), F.lit(v)).otherwise(expr)
        return expr
