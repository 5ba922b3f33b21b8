"""Scalers & imputation (reference SURVEY.md §2.7).

Fits are single-pass ``df.agg`` jobs (reference estimators/standard_scale.py:
100-163, min_max_scale.py:102, impute.py:110-162). Per-dimension stats on
flat array columns use one agg over ``element_at`` projections — a map-side
partial aggregate that collapses to one row, no shuffle. NESTED (level>=2)
inputs flatten + explode first so per-innermost-index stats pool across rows
and outer dims (reference nested goldens); the explode feeds the same
partial aggregate, still no shuffle beyond the final single-row collect.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kamae_spark.core.dtypes import NUMERIC, column_info
from kamae_spark.core.stage import Estimator, keyword_params
from kamae_spark.functions.arrays import flatten_nested, nested_transform
from kamae_spark.operators.rowwise import ElementwiseTransform


def _f(x) -> float:
    """Fit-stat conversion: a degenerate fit (all-null / empty input)
    yields a null aggregate; carry it as NaN instead of crashing on
    float(None) — the scaled output is then NaN, matching what the
    reference's numpy/TF stats would propagate."""
    return float("nan") if x is None else float(x)


def _masked(col: Column, mask_value: float | None) -> Column:
    if mask_value is None:
        return col
    return F.when(col != F.lit(mask_value), col)


def _vector_rows(src: DataFrame, col: Column, level: int) -> tuple[DataFrame, Column, int]:
    """Normalize a fit input to one innermost VECTOR per row: level>=2
    columns have their outer nesting flattened and exploded, so per-index
    statistics pool across rows AND outer dims (the reference fits per
    innermost index — its min_max_scale nested golden takes min/max over
    every inner list of every row). Returns (df, vector column, dim)."""
    if level >= 2:
        for _ in range(level - 2):
            col = F.flatten(col)
        src = src.select(F.explode(col).alias("__vec"))
        col = F.col("__vec")
    row = src.select(F.size(col).alias("n")).where(col.isNotNull()).first()
    if row is None:
        raise ValueError("cannot infer array dim of empty fit column")
    return src, col, int(row["n"])


class StandardScaleTransformer(ElementwiseTransform):
    """(x - mean) / stddev, per element for array inputs; mask values
    pass through unscaled (reference transformers/standard_scale.py:99)."""

    compatible_dtypes = NUMERIC

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 mean: Sequence[float] | float = 0.0,
                 stddev: Sequence[float] | float = 1.0,
                 mask_value: float | None = None,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def build(self, df: DataFrame):
        self._validate(df)
        level, _ = column_info(df, self.input_col)
        col = self._in(df, self.input_col)
        scalar_stats = not isinstance(self.mean, (list, tuple))

        if scalar_stats:
            m, s = F.lit(float(self.mean)), F.lit(float(self.stddev))

            def scale(x: Column) -> Column:
                out = F.try_divide(x - m, s)
                if self.mask_value is not None:
                    return F.when(x == F.lit(self.mask_value), x).otherwise(out)
                return out

            expr = nested_transform(col, scale, level)
        else:
            means = F.lit([float(v) for v in self.mean])
            stds = F.lit([float(v) for v in self.stddev])
            if level < 1:
                raise TypeError("per-element stats require an array input column")

            def scale_arr(arr: Column) -> Column:
                def at(x: Column, i: Column) -> Column:
                    out = F.try_divide(x - F.element_at(means, i + 1), F.element_at(stds, i + 1))
                    if self.mask_value is not None:
                        return F.when(x == F.lit(self.mask_value), x).otherwise(out)
                    return out

                return F.transform(arr, at)

            expr = nested_transform(col, scale_arr, level - 1)
        return {self.output_col: self._out(df, expr, level)}


class StandardScaleEstimator(Estimator):
    """Fit per-element mean / population stddev, mask-aware (reference
    estimators/standard_scale.py:100-163; stddev_pop per :136-144)."""

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 mask_value: float | None = None,
                 sample_fraction: float | None = None, seed: int = 42,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fit(self, df: DataFrame) -> StandardScaleTransformer:
        src = self._fit_input(df)
        level, _ = column_info(df, self.input_col)
        c = self._fit_col(src, self.input_col)
        if level == 0:
            v = _masked(c.cast("double"), self.mask_value)
            row = src.agg(F.mean(v).alias("m"), F.stddev_pop(v).alias("s")).first()
            mean, std = _f(row["m"]), _f(row["s"])
        else:
            src, c, dim = _vector_rows(src, c, level)
            aggs = []
            for i in range(dim):
                e = _masked(F.element_at(c, i + 1).cast("double"), self.mask_value)
                aggs += [F.mean(e).alias(f"m{i}"), F.stddev_pop(e).alias(f"s{i}")]
            row = src.agg(*aggs).first()
            mean = [_f(row[f"m{i}"]) for i in range(dim)]
            std = [_f(row[f"s{i}"]) for i in range(dim)]
        return StandardScaleTransformer(
            input_col=self.input_col, output_col=self.output_col,
            mean=mean, stddev=std, mask_value=self.mask_value,
            input_dtype=self.input_dtype, output_dtype=self.output_dtype,
        )


class SingleFeatureArrayStandardScaleEstimator(Estimator):
    """ONE shared mean/stddev over ALL elements of an array column
    (reference single_feature_array_standard_scale.py:96-146) — computed
    without explode via per-row F.aggregate partial sums. Null elements
    never contribute, and ``mask_value`` elements are excluded from the
    fit and pass through unscaled at transform time (reference fit
    tests: with_nulls mean 5.625 over the non-null residue, maskValue=-1
    mean 4.3636 over the non-pad residue)."""

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 mask_value: float | None = None,
                 sample_fraction: float | None = None, seed: int = 42):
        pass

    def fit(self, df: DataFrame) -> StandardScaleTransformer:
        src = self._fit_input(df)
        level, _ = column_info(df, self.input_col)
        col = F.col(self.input_col)
        flat = col if level <= 1 else flatten_nested(col, level)
        if self.mask_value is not None:
            mask = F.lit(float(self.mask_value))
            flat = F.filter(flat, lambda x: x.isNotNull() & (x != mask))
        else:
            flat = F.filter(flat, lambda x: x.isNotNull())
        s1 = F.aggregate(flat, F.lit(0.0), lambda a, x: a + x.cast("double"))
        s2 = F.aggregate(flat, F.lit(0.0), lambda a, x: a + (x * x).cast("double"))
        row = src.agg(
            F.sum(s1).alias("s1"), F.sum(s2).alias("s2"), F.sum(F.size(flat)).alias("n")
        ).first()
        n = _f(row["n"])
        if not n > 0:  # empty / all-empty-array corpus: NaN stats
            mean, var = float("nan"), float("nan")
        else:
            mean = _f(row["s1"]) / n
            var = _f(row["s2"]) / n - mean * mean
        return StandardScaleTransformer(
            input_col=self.input_col, output_col=self.output_col,
            mean=mean, stddev=max(var, 0.0) ** 0.5,
            mask_value=self.mask_value,
        )


class MinMaxScaleTransformer(ElementwiseTransform):
    """(x - min) / (max - min), per element for arrays (reference
    transformers/min_max_scale.py:163)."""

    compatible_dtypes = NUMERIC

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 min: Sequence[float] | float = 0.0,
                 max: Sequence[float] | float = 1.0,
                 mask_value: float | None = None,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def build(self, df: DataFrame):
        self._validate(df)
        level, _ = column_info(df, self.input_col)
        col = self._in(df, self.input_col)
        scalar_stats = not isinstance(self.min, (list, tuple))
        if scalar_stats:
            lo, hi = F.lit(float(self.min)), F.lit(float(self.max))

            def scale(x: Column) -> Column:
                out = F.try_divide(x - lo, hi - lo)
                if self.mask_value is not None:
                    return F.when(x == F.lit(self.mask_value), x).otherwise(out)
                return out

            expr = nested_transform(col, scale, level)
        else:
            los = F.lit([float(v) for v in self.min])
            his = F.lit([float(v) for v in self.max])

            def scale_arr(arr: Column) -> Column:
                def at(x: Column, i: Column) -> Column:
                    lo = F.element_at(los, i + 1)
                    hi = F.element_at(his, i + 1)
                    out = F.try_divide(x - lo, hi - lo)
                    if self.mask_value is not None:
                        return F.when(x == F.lit(self.mask_value), x).otherwise(out)
                    return out

                return F.transform(arr, at)

            expr = nested_transform(col, scale_arr, level - 1)
        return {self.output_col: self._out(df, expr, level)}


class MinMaxScaleEstimator(Estimator):
    """Fit per-element min/max (reference estimators/min_max_scale.py:102)."""

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 mask_value: float | None = None,
                 sample_fraction: float | None = None, seed: int = 42,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fit(self, df: DataFrame) -> MinMaxScaleTransformer:
        src = self._fit_input(df)
        level, _ = column_info(df, self.input_col)
        c = self._fit_col(src, self.input_col)
        if level == 0:
            v = _masked(c.cast("double"), self.mask_value)
            row = src.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
            lo, hi = _f(row["lo"]), _f(row["hi"])
        else:
            src, c, dim = _vector_rows(src, c, level)
            aggs = []
            for i in range(dim):
                e = _masked(F.element_at(c, i + 1).cast("double"), self.mask_value)
                aggs += [F.min(e).alias(f"lo{i}"), F.max(e).alias(f"hi{i}")]
            row = src.agg(*aggs).first()
            lo = [_f(row[f"lo{i}"]) for i in range(dim)]
            hi = [_f(row[f"hi{i}"]) for i in range(dim)]
        return MinMaxScaleTransformer(
            input_col=self.input_col, output_col=self.output_col,
            min=lo, max=hi, mask_value=self.mask_value,
            input_dtype=self.input_dtype, output_dtype=self.output_dtype,
        )


class ConditionalStandardScaleEstimator(Estimator):
    """Standard scale fitted over a filtered subset (SQL predicate),
    optionally excluding zeros, log10-transforming first, or using the
    reference's 'binary' moments — a Spark-first re-expression of the
    mask-predicate scaler (conditional_standard_scale.py:352-481).

    scaling='binary' (reference _fit_binary :398-470) treats the input
    as a binary indicator and a relevance label: with
    n = count(x == 1) and f = count(x == 1 AND relevance > 0),
    mean = 1 - f/n and stddev = sqrt((f(1-f/n)^2 + (n-f)(f/n)^2)/(n-1));
    requires ``relevance_col``."""

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 filter_expr: str | None = None, skip_zeros: bool = False,
                 scaling: str = "standard", relevance_col: str | None = None,
                 sample_fraction: float | None = None, seed: int = 42):
        if scaling not in ("standard", "log10", "binary"):
            raise ValueError("scaling must be standard|log10|binary")
        if scaling == "binary" and relevance_col is None:
            raise ValueError("relevance_col must be set for binary scaling")

    @staticmethod
    def _binary_moments(n: float, f: float) -> tuple[float, float]:
        """mean = 1 - f/n; stddev per reference _get_binary_moments."""
        if not n > 1.0:  # no (or a single) positive indicator: NaN stats
            return float("nan"), float("nan")
        p = f / n
        mean = 1.0 - p
        var = (f * (1.0 - p) ** 2 + (n - f) * p**2) / (n - 1.0)
        return mean, max(var, 0.0) ** 0.5

    def fit(self, df: DataFrame) -> "ConditionalStandardScaleTransformer":
        src = self._fit_input(df)
        if self.filter_expr:
            src = src.where(self.filter_expr)
        level, _ = column_info(df, self.input_col)

        src_col = F.col(self.input_col)
        if level >= 2 and self.scaling != "binary":
            # nested inputs: pool per-innermost-index stats across rows
            # and outer dims (row filter already applied above). Binary
            # scaling keeps the row frame — it needs the row-aligned
            # relevance column, and the reference only exercises it on
            # level<=1 inputs.
            src, src_col, _ = _vector_rows(src, src_col, level)
            level = 1

        def elem(i: int | None) -> Column:
            c = src_col
            v = (c if i is None else F.element_at(c, i + 1)).cast("double")
            return v

        def moments(i: int | None) -> tuple[Column, Column]:
            if self.scaling == "binary":
                one = elem(i) == 1.0
                rel = F.col(self.relevance_col) > 0
                return (
                    F.sum(F.when(one, 1).otherwise(0)).cast("double"),
                    F.sum(F.when(one & rel, 1).otherwise(0)).cast("double"),
                )
            v = elem(i)
            if self.skip_zeros:
                v = F.when(v != 0.0, v)
            if self.scaling == "log10":
                v = F.log10(v)
            return F.mean(v), F.stddev_pop(v)

        if level == 0:
            a, b = moments(None)
            row = src.agg(a.alias("a"), b.alias("b")).first()
            if self.scaling == "binary":
                mean, std = self._binary_moments(_f(row["a"]), _f(row["b"]))
            else:
                mean, std = _f(row["a"]), _f(row["b"])
        else:
            # per-element moments over src_col (the input column, or the
            # exploded innermost vectors for nested non-binary inputs;
            # reference conditional_standard_scale.py:398-540
            # element_struct aggs)
            row0 = (
                src.select(F.size(src_col).alias("n"))
                .where(src_col.isNotNull()).first()
            )
            if row0 is None:
                raise ValueError("cannot infer array dim of empty fit column")
            dim = int(row0["n"])
            aggs = []
            for i in range(dim):
                a, b = moments(i)
                aggs += [a.alias(f"a{i}"), b.alias(f"b{i}")]
            row = src.agg(*aggs).first()
            if self.scaling == "binary":
                pairs = [
                    self._binary_moments(_f(row[f"a{i}"]), _f(row[f"b{i}"]))
                    for i in range(dim)
                ]
                mean = [m for m, _ in pairs]
                std = [s for _, s in pairs]
            else:
                mean = [_f(row[f"a{i}"]) for i in range(dim)]
                std = [_f(row[f"b{i}"]) for i in range(dim)]
        return ConditionalStandardScaleTransformer(
            input_col=self.input_col, output_col=self.output_col,
            mean=mean, stddev=std,
            scaling="standard" if self.scaling == "binary" else self.scaling,
            skip_zeros=self.skip_zeros,
        )


class ConditionalStandardScaleTransformer(ElementwiseTransform):
    """Scalar or per-element (list mean/stddev) conditional scaling."""

    compatible_dtypes = NUMERIC

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 mean: Sequence[float] | float = 0.0,
                 stddev: Sequence[float] | float = 1.0,
                 scaling: str = "standard", skip_zeros: bool = False):
        pass

    def _scale1(self, x: Column, m: Column, s: Column) -> Column:
        v = F.log10(x) if self.scaling == "log10" else x
        out = F.try_divide(v - m, s)
        if self.skip_zeros:
            return F.when(x == 0.0, x).otherwise(out)
        return out

    def build(self, df: DataFrame):
        self._validate(df)
        level, _ = column_info(df, self.input_col)
        col = self._in(df, self.input_col)
        if not isinstance(self.mean, (list, tuple)):
            m, s = F.lit(float(self.mean)), F.lit(float(self.stddev))
            expr = nested_transform(col, lambda x: self._scale1(x, m, s), level)
        else:
            if level < 1:
                raise TypeError("per-element stats require an array input column")
            means = F.lit([float(v) for v in self.mean])
            stds = F.lit([float(v) for v in self.stddev])

            def scale_arr(arr: Column) -> Column:
                return F.transform(
                    arr,
                    lambda x, i: self._scale1(
                        x, F.element_at(means, i + 1), F.element_at(stds, i + 1)
                    ),
                )

            expr = nested_transform(col, scale_arr, level - 1)
        return {self.output_col: self._out(df, expr, level)}


class ImputeTransformer(ElementwiseTransform):
    """Replace mask-value/null with the fitted statistic or a constant
    impute value — numeric OR string columns (reference
    transformers/impute.py:146 and its string vector, test_impute.py:
    'a' -> 'hello')."""

    compatible_dtypes = None  # numeric statistics, or string constants

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 statistic: float | str = 0.0,
                 mask_value: float | str | None = None,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fn(self, x: Column) -> Column:
        cond = x.isNull()
        if self.mask_value is not None:
            cond = cond | (x == F.lit(self.mask_value))
        return F.when(cond, F.lit(self.statistic)).otherwise(x)


class ImputeEstimator(Estimator):
    """Fit mean or (exact) median ignoring mask/null (reference
    estimators/impute.py:110-162; median via F.median)."""

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 strategy: str = "mean", mask_value: float | None = None,
                 sample_fraction: float | None = None, seed: int = 42,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        if strategy not in ("mean", "median"):
            raise ValueError("strategy must be mean|median")

    def fit(self, df: DataFrame) -> ImputeTransformer:
        src = self._fit_input(df)
        level, _ = column_info(df, self.input_col)
        c = self._fit_col(src, self.input_col)
        if level > 0:
            # one scalar statistic pooled over EVERY element of a
            # (possibly nested) array column (reference estimators/
            # test_impute.py nested vector: mean over all 36 elements)
            src = src.select(F.explode(flatten_nested(c, level)).alias("__v"))
            c = F.col("__v")
        v = _masked(c.cast("double"), self.mask_value)
        agg = F.mean(v) if self.strategy == "mean" else F.median(v)
        stat = _f(src.agg(agg.alias("st")).first()["st"])
        return ImputeTransformer(
            input_col=self.input_col, output_col=self.output_col,
            statistic=stat, mask_value=self.mask_value,
            input_dtype=self.input_dtype, output_dtype=self.output_dtype,
        )
