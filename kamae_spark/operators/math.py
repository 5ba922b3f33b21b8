"""Scalar math transformers (reference SURVEY.md §2.3).

All pure Column expressions, elementwise through nested arrays.
Multi-input ops accept N input columns or 1 column + a constant
(reference params/utils.py:79-122). Formula parity notes cite the
reference file the semantics come from; the implementations are
Spark-first re-expressions, not ports.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from kamae_spark.core.dtypes import ALL, NUMERIC
from kamae_spark.core.stage import keyword_params
from kamae_spark.operators.rowwise import ElementwiseTransform, nary


class _SingleIn(ElementwiseTransform):
    compatible_dtypes = NUMERIC

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass


class _MultiIn(ElementwiseTransform):
    """N input columns, or one column plus ``constant``."""

    compatible_dtypes = NUMERIC

    @keyword_params
    def __init__(self, input_cols: Sequence[str], output_col: str,
                 constant: float | None = None,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fn(self, *cols: Column) -> Column:
        cs = list(cols)
        if self.constant is not None:
            cs.append(F.lit(self.constant))
        if len(cs) < 2:
            raise ValueError(f"{type(self).__name__} needs >=2 operands "
                             "(N input_cols or 1 input col + constant)")
        return self.op(cs)

    def op(self, cs: list[Column]) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError


class AbsoluteValue(_SingleIn):
    """|x| (reference transformers/absolute_value.py:98)."""

    def fn(self, x: Column) -> Column:
        return F.abs(x)


class Log(ElementwiseTransform):
    """ln(alpha + x) (reference transformers/log.py:120-137)."""

    compatible_dtypes = NUMERIC

    @keyword_params
    def __init__(self, input_col: str, output_col: str, alpha: float = 0.0,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fn(self, x: Column) -> Column:
        return F.log(x + F.lit(self.alpha))


class Exp(_SingleIn):
    """e^x (reference transformers/exp.py:83)."""

    def fn(self, x: Column) -> Column:
        return F.exp(x)


class Exponent(_MultiIn):
    """x^y, exponent from 2nd column or constant (reference exponent.py:146)."""

    def op(self, cs):
        return nary(cs, F.pow)


class Sum(_MultiIn):
    """Rowwise sum of N columns / +constant (reference sum.py:112-138)."""

    def op(self, cs):
        return nary(cs, lambda a, b: a + b)


class Subtract(_MultiIn):
    """Left-fold subtraction (reference subtract.py:112)."""

    def op(self, cs):
        return nary(cs, lambda a, b: a - b)


class Multiply(_MultiIn):
    """Rowwise product (reference multiply.py:112)."""

    def op(self, cs):
        return nary(cs, lambda a, b: a * b)


class Divide(_MultiIn):
    """Left-fold division; null divisor propagates null (reference divide.py:100)."""

    def op(self, cs):
        return nary(cs, lambda a, b: a / b)


class Mean(_MultiIn):
    """Rowwise mean across N columns (reference mean.py:112-138)."""

    def op(self, cs):
        return nary(cs, lambda a, b: a + b) / F.lit(float(len(cs)))


class Max(_MultiIn):
    """Rowwise max (reference max.py:111)."""

    def op(self, cs):
        return F.greatest(*cs)


class Min(_MultiIn):
    """Rowwise min (reference min.py:111)."""

    def op(self, cs):
        return F.least(*cs)


class Modulo(_MultiIn):
    """x mod y, reference-parity semantics (modulo.py:182-190): compute
    the C-style remainder x%y (sign of the dividend) and add the divisor
    only when it is negative. For y > 0 this is exactly TF floormod;
    for y < 0 a POSITIVE remainder is kept as-is (3.0 mod -1.2 -> 0.6,
    pinned by the reference's own mod_transform_array_col1_col2 vector)
    even though true floormod would give -0.6 — the reference's Spark
    and Keras layers disagree there and we match the Spark side."""

    def op(self, cs):
        x, y = cs[0], cs[1]
        m = x % y
        return F.when(m >= 0, m).otherwise(m + y)


class Round(ElementwiseTransform):
    """round/floor/ceil to integer (reference round.py:124-146)."""

    compatible_dtypes = NUMERIC

    @keyword_params
    def __init__(self, input_col: str, output_col: str, mode: str = "round",
                 input_dtype: str | None = None, output_dtype: str | None = None):
        if mode not in ("round", "floor", "ceil"):
            raise ValueError("mode must be round|floor|ceil")

    def fn(self, x: Column) -> Column:
        out = {"round": F.round, "floor": F.floor, "ceil": F.ceil}[self.mode](x)
        # keep the input's floating dtype like the reference (float in ->
        # float out); Spark floor/ceil return long
        return out.cast("double")


class RoundToDecimal(ElementwiseTransform):
    """round(x, scale) (reference round_to_decimal.py:120)."""

    compatible_dtypes = NUMERIC

    @keyword_params
    def __init__(self, input_col: str, output_col: str, scale: int = 2,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fn(self, x: Column) -> Column:
        return F.round(x, self.scale)


class LogicalAnd(_MultiIn):
    """Boolean AND across N columns (reference logical_and.py:97)."""

    compatible_dtypes = ("boolean",)

    def op(self, cs):
        return nary(cs, lambda a, b: a & b)


class LogicalOr(_MultiIn):
    """Boolean OR (reference logical_or.py:97)."""

    compatible_dtypes = ("boolean",)

    def op(self, cs):
        return nary(cs, lambda a, b: a | b)


class LogicalNot(ElementwiseTransform):
    """Boolean NOT (reference logical_not.py:83)."""

    compatible_dtypes = ("boolean",)

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fn(self, x: Column) -> Column:
        return ~x


def _rad(x: Column) -> Column:
    return x.cast("double") * F.lit(math.pi / 180.0)


def _valid_lat(x: Column) -> Column:
    """Out-of-bounds coordinates become null (reference
    haversine_distance.py validate_lat_lon_column)."""
    return F.when(x.between(-90.0, 90.0), x)


def _valid_lon(x: Column) -> Column:
    return F.when(x.between(-180.0, 180.0), x)


class HaversineDistance(ElementwiseTransform):
    """Great-circle km between (lat1,lon1) and (lat2,lon2) columns, or
    2 columns + lat_lon_constant (reference haversine_distance.py:207).
    Out-of-range coordinates null the output."""

    compatible_dtypes = ("float", "double")
    EARTH_RADIUS_KM = 6371.0

    @keyword_params
    def __init__(self, input_cols: Sequence[str], output_col: str,
                 lat_lon_constant: Sequence[float] | None = None,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        n = len(input_cols) + (2 if lat_lon_constant is not None else 0)
        if n != 4:
            raise ValueError("need 4 coordinates: 4 input cols or 2 + lat_lon_constant")

    def fn(self, *cols: Column) -> Column:
        cs = list(cols)
        if self.lat_lon_constant is not None:
            cs += [F.lit(float(v)) for v in self.lat_lon_constant]
        lat1, lon1 = _rad(_valid_lat(cs[0])), _rad(_valid_lon(cs[1]))
        lat2, lon2 = _rad(_valid_lat(cs[2])), _rad(_valid_lon(cs[3]))
        dlat, dlon = lat2 - lat1, lon2 - lon1
        a = F.pow(F.sin(dlat / 2), 2) + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
        return F.lit(2.0 * self.EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


class BearingAngle(ElementwiseTransform):
    """Navigation bearing in degrees [0, 360) between two lat/lon pairs
    (reference bearing_angle.py:170: atan2(y, x), pmod(deg+360, 360))."""

    compatible_dtypes = ("float", "double")

    @keyword_params
    def __init__(self, input_cols: Sequence[str], output_col: str,
                 lat_lon_constant: Sequence[float] | None = None,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        n = len(input_cols) + (2 if lat_lon_constant is not None else 0)
        if n != 4:
            raise ValueError("need 4 coordinates: 4 input cols or 2 + lat_lon_constant")

    def fn(self, *cols: Column) -> Column:
        cs = list(cols)
        if self.lat_lon_constant is not None:
            cs += [F.lit(float(v)) for v in self.lat_lon_constant]
        lat1, lon1 = _rad(_valid_lat(cs[0])), _rad(_valid_lon(cs[1]))
        lat2, lon2 = _rad(_valid_lat(cs[2])), _rad(_valid_lon(cs[3]))
        dlon = lon2 - lon1
        y = F.sin(dlon) * F.cos(lat2)
        x = F.cos(lat1) * F.sin(lat2) - F.sin(lat1) * F.cos(lat2) * F.cos(dlon)
        return F.pmod(F.degrees(F.atan2(y, x)) + 360.0, F.lit(360.0))
