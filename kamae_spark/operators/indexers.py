"""Vocabulary indexers / one-hot encoders (reference SURVEY.md §2.7).

Re-engineered Spark-first versus the reference:

- vocab FIT uses ``groupBy(col).count().orderBy(...)`` (+ explode for
  array columns) instead of the reference's driver-side RDD
  map/reduceByKey (indexer_utils.py:100-129); frequency ties are broken
  by label ascending so vocab order is DETERMINISTIC (the reference's
  rdd.sortBy leaves ties ambiguous)
- TRANSFORM is a pure Column expression: a map literal
  (``F.map_from_arrays``) lookup plus an ``xxhash64`` OOV bucket —
  replacing the reference's per-row Python UDF with its O(|V|)
  ``labels.index()`` scan (user_defined_functions.py:46-102), the
  reference's single worst hot path. At 100 TB this is the difference
  between a broadcast hashmap probe in codegen and a Python process
  boundary per row.
- OOV hashing uses Spark's JVM-side xxhash64 rather than farmhash64
  (the reference chose farmhash for TensorFlow serving parity, which we
  do not target; pyfarmhash is unavailable here). Bucket layout is
  identical: mask->0, OOV buckets after mask, vocab after OOV.

Index layout (reference user_defined_functions.py:46-102):
  null -> 0 (requires num_oov > 0); mask_token -> 0;
  OOV -> pmod(hash, num_oov) + start where start = 1 if mask else 0;
  vocab[i] -> i + num_oov + start.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kamae_spark.core.dtypes import column_info
from kamae_spark.core.stage import Estimator, keyword_params
from kamae_spark.functions.arrays import flatten_nested
from kamae_spark.operators.rowwise import ElementwiseTransform

# Above this vocab size the literal map_from_arrays lookup stops being
# free: the whole vocab is embedded in the PLAN of every stage (multi-MB
# plans, analyzer cost per query) — switch scalar columns to a broadcast
# hash join against a vocab DataFrame instead (same layout, same OOV
# hashing; the join build side ships once per executor, not per plan).
VOCAB_JOIN_THRESHOLD = 65536

# Default fit-side vocab bound: `collect_labels` materializes the vocab
# on the driver, so an UNBOUNDED distinct over 100 TB of text (10^7+
# tokens) is a driver OOM waiting to happen. Estimators default to this
# explicit cap (lowest-frequency / alphabetically-last labels beyond it
# become OOV); pass max_num_labels=None to opt into unbounded collection
# for columns known to be low-cardinality.
DEFAULT_MAX_LABELS = 1_000_000


def collect_labels(
    df: DataFrame,
    cols: Sequence[str],
    order: str = "frequencyDesc",
    mask_token: str | None = None,
    max_num_labels: int | None = DEFAULT_MAX_LABELS,
) -> list[str]:
    """Distributed vocab collection over one or more (possibly nested
    array) string columns. Only the final (bounded) vocab reaches the
    driver."""
    if order not in ("frequencyAsc", "frequencyDesc", "alphabeticalAsc", "alphabeticalDesc"):
        raise ValueError(f"unknown string_order_type {order!r}")
    parts = []
    for c in cols:
        level, _ = column_info(df, c)
        col = F.col(c).cast("string") if level == 0 else flatten_nested(F.col(c), level)
        sel = df.select(col.alias("v"))
        if level > 0:
            sel = sel.select(F.explode("v").alias("v")).select(F.col("v").cast("string").alias("v"))
        parts.append(sel)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u = u.where(F.col("v").isNotNull())
    if mask_token is not None:
        u = u.where(F.col("v") != mask_token)
    if order.startswith("frequency"):
        asc = order == "frequencyAsc"
        counted = u.groupBy("v").count()
        ordered = counted.orderBy(
            F.col("count").asc() if asc else F.col("count").desc(), F.col("v").asc()
        )
    else:
        asc = order == "alphabeticalAsc"
        ordered = u.distinct().orderBy(F.col("v").asc() if asc else F.col("v").desc())
    if max_num_labels is not None:
        ordered = ordered.limit(int(max_num_labels))
    return [r["v"] for r in ordered.select("v").collect()]


def index_expr(x: Column, labels: Sequence[str], mask_token: str | None,
               num_oov_indices: int) -> Column:
    """The vocab-lookup expression (see module docstring for layout)."""
    start = 1 if mask_token is not None else 0
    offset = start + num_oov_indices
    labels = list(labels)
    lookup = F.try_element_at(
        F.map_from_arrays(
            F.lit(labels), F.lit(list(range(offset, offset + len(labels))))
        ),
        x,
    )
    if num_oov_indices > 0:
        oov = (F.pmod(F.xxhash64(x), F.lit(num_oov_indices)) + start).cast("int")
        expr = F.coalesce(lookup, oov)
        expr = F.when(x.isNull(), F.lit(0)).otherwise(expr)
    else:
        expr = lookup  # unseen/null -> null (reference raises per-row)
    if mask_token is not None:
        expr = F.when(x == F.lit(mask_token), F.lit(0)).otherwise(expr)
    return expr.cast("int")


def fallback_expr(x: Column, mask_token: str | None, num_oov_indices: int) -> Column:
    """``index_expr`` minus the vocab lookup: the value an element gets
    when it is NOT in the vocab (null -> 0, mask -> 0, else OOV hash
    bucket; null when num_oov_indices == 0). Computed JVM-side so the
    big-vocab dict path shares the literal path's exact OOV hashing."""
    start = 1 if mask_token is not None else 0
    if num_oov_indices > 0:
        oov = (F.pmod(F.xxhash64(x), F.lit(num_oov_indices)) + start).cast("int")
        expr = F.when(x.isNull(), F.lit(0)).otherwise(oov)
    else:
        expr = F.lit(None).cast("int")
    if mask_token is not None:
        expr = F.when(x == F.lit(mask_token), F.lit(0)).otherwise(expr)
    return expr.cast("int")


class StringIndexTransformer(ElementwiseTransform):
    """Fitted vocab lookup (see module docstring for index layout).

    Big-vocab path: when the vocab exceeds ``vocab_join_threshold``,
    scalar string columns switch from the literal-map expression to a
    BROADCAST HASH JOIN against a (label, index) vocab DataFrame —
    identical layout and OOV hashing (the OOV bucket is computed from
    the input column JVM-side either way), but the vocab ships once per
    executor instead of being inlined into every plan. Nested array
    columns switch to a broadcast-dict lookup inside an Arrow-batched
    pandas UDF (``sc.broadcast`` ships the vocab once per executor; the
    OOV/mask/null fallback is precomputed JVM-side by the exact same
    codegen expression the literal path uses, so the UDF is a pure dict
    probe and layout parity is structural). Rationale: a join would need
    explode + order-preserving re-assembly (an extra shuffle per
    column); the literal map would inline a multi-MB vocab into every
    plan and crush the analyzer.
    """

    compatible_dtypes = ("string",)

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 labels: Sequence[str] = (), mask_token: str | None = None,
                 num_oov_indices: int = 1,
                 vocab_join_threshold: int = VOCAB_JOIN_THRESHOLD,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def _index_expr(self, x: Column) -> Column:
        return index_expr(x, self.labels, self.mask_token, self.num_oov_indices)

    def fn(self, x: Column) -> Column:
        return self._index_expr(x)

    # -- broadcast-join lookup (big vocab, scalar columns) -----------------
    def _col_pairs(self) -> list[tuple[str, str]]:
        return [(self.input_col, self.output_col)]

    def _join_cols(self, df: DataFrame) -> dict[str, int]:
        """input columns taking a big-vocab path -> nesting level."""
        threshold = getattr(self, "vocab_join_threshold", None) or VOCAB_JOIN_THRESHOLD
        if len(self.labels) <= threshold:
            return {}
        return {c: column_info(df, c)[0] for c in self.input_columns}

    def build(self, df: DataFrame):
        if self._join_cols(df):
            return None  # pipeline falls back to transform()
        return super().build(df)

    def transform(self, df: DataFrame) -> DataFrame:
        join_cols = self._join_cols(df)
        if not join_cols:
            return super().transform(df)
        self._validate(df)
        # the small-vocab map_from_arrays path raises on duplicate keys;
        # the join path would silently DUPLICATE input rows and the dict
        # path would silently last-wins — fail identically on both sides
        # of the vocab_join_threshold boundary instead
        if len(set(self.labels)) != len(self.labels):
            raise ValueError(
                f"{type(self).__name__}: labels contain duplicate entries; "
                "vocab keys must be unique"
            )
        for in_c, out_c in self._col_pairs():
            if join_cols.get(in_c, 0) == 0:
                df = self._join_lookup(df, in_c, out_c)
            else:
                df = self._dict_lookup(df, in_c, out_c, join_cols[in_c])
        return df

    def _join_lookup(self, df: DataFrame, in_c: str, out_c: str) -> DataFrame:
        import pandas as pd

        spark = df.sparkSession
        start = 1 if self.mask_token is not None else 0
        offset = start + self.num_oov_indices
        vocab = spark.createDataFrame(
            pd.DataFrame(
                {
                    "__label": list(self.labels),
                    "__vidx": pd.array(
                        range(offset, offset + len(self.labels)), dtype="int32"
                    ),
                }
            )
        )
        x = self._in(df, in_c)
        joined = df.join(F.broadcast(vocab), x == F.col("__label"), "left")
        if self.num_oov_indices > 0:
            oov = (F.pmod(F.xxhash64(x), F.lit(self.num_oov_indices)) + start).cast("int")
            expr = F.coalesce(F.col("__vidx").cast("int"), oov)
            expr = F.when(x.isNull(), F.lit(0)).otherwise(expr)
        else:
            expr = F.col("__vidx").cast("int")  # unseen/null -> null
        if self.mask_token is not None:
            expr = F.when(x == F.lit(self.mask_token), F.lit(0)).otherwise(expr)
        return joined.select(*df.columns, self._out(df, expr.cast("int")).alias(out_c))

    def _dict_lookup(self, df: DataFrame, in_c: str, out_c: str, level: int) -> DataFrame:
        """Big-vocab lookup for (nested) array columns: broadcast the
        vocab dict once per executor, precompute the non-vocab fallback
        (OOV hash / mask / null) JVM-side with ``fallback_expr`` in the
        same shape as the input, then resolve each element with a pure
        dict probe inside an Arrow-batched pandas UDF. No explode, no
        join, no per-plan literal — row-local and shuffle-free."""
        from pyspark.sql.functions import pandas_udf

        from kamae_spark.functions.arrays import elementwise

        import pandas as pd

        start = 1 if self.mask_token is not None else 0
        offset = start + self.num_oov_indices
        bc = df.sparkSession.sparkContext.broadcast(
            {lab: i for i, lab in enumerate(self.labels, offset)}
        )
        casted = self._in(df, in_c)
        fb, _ = elementwise(
            df, [in_c],
            lambda x: fallback_expr(x, self.mask_token, self.num_oov_indices),
            columns=[casted],
        )

        def walk(xs, fs, lv):
            if xs is None:
                return None
            d = bc.value
            if lv == 1:
                # fs may arrive as a float ndarray when it holds nulls
                # (Arrow int-with-null -> NaN); normalize NaN to None
                return [
                    d.get(x, None if f is None or f != f else int(f))
                    for x, f in zip(xs, fs)
                ]
            return [walk(x, f, lv - 1) for x, f in zip(xs, fs)]

        def lookup(xs, fs):
            return pd.Series(
                [walk(x, f, level) for x, f in zip(xs, fs)], dtype=object
            )

        ret = "array<" * level + "int" + ">" * level
        udf = pandas_udf(lookup, ret, functionType=200)  # SQL_SCALAR_PANDAS_UDF
        expr = udf(casted, fb)
        return df.select("*", self._out(df, expr, level).alias(out_c))


class StringIndexEstimator(Estimator):
    """Fit an ordered vocab (reference estimators/string_index.py:104-136)."""

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 string_order_type: str = "frequencyDesc",
                 mask_token: str | None = None, num_oov_indices: int = 1,
                 max_num_labels: int | None = DEFAULT_MAX_LABELS,
                 sample_fraction: float | None = None, seed: int = 42,
                 vocab_join_threshold: int = VOCAB_JOIN_THRESHOLD,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fit(self, df: DataFrame) -> StringIndexTransformer:
        labels = collect_labels(
            self._fit_input(df), [self.input_col], self.string_order_type,
            self.mask_token, self.max_num_labels,
        )
        return StringIndexTransformer(
            input_col=self.input_col, output_col=self.output_col,
            labels=labels, mask_token=self.mask_token,
            num_oov_indices=self.num_oov_indices,
            vocab_join_threshold=self.vocab_join_threshold,
            input_dtype=self.input_dtype, output_dtype=self.output_dtype,
        )


class SharedStringIndexEstimator(Estimator):
    """One vocab across N columns (reference shared_string_index.py:105);
    yields one transformer per column sharing the fitted labels."""

    @keyword_params
    def __init__(self, input_cols: Sequence[str] = (), output_cols: Sequence[str] = (),
                 string_order_type: str = "frequencyDesc",
                 mask_token: str | None = None, num_oov_indices: int = 1,
                 max_num_labels: int | None = DEFAULT_MAX_LABELS,
                 sample_fraction: float | None = None, seed: int = 42,
                 vocab_join_threshold: int = VOCAB_JOIN_THRESHOLD):
        if len(input_cols) != len(output_cols):
            raise ValueError("input_cols and output_cols must align")

    def fit(self, df: DataFrame) -> "SharedStringIndexTransformer":
        labels = collect_labels(
            self._fit_input(df), list(self.input_cols), self.string_order_type,
            self.mask_token, self.max_num_labels,
        )
        return SharedStringIndexTransformer(
            input_cols=list(self.input_cols), output_cols=list(self.output_cols),
            labels=labels, mask_token=self.mask_token,
            num_oov_indices=self.num_oov_indices,
            vocab_join_threshold=self.vocab_join_threshold,
        )


class SharedStringIndexTransformer(StringIndexTransformer):
    """Applies the shared vocab to each input column independently
    (past the vocab threshold, scalar columns take the broadcast-join
    path and array columns the broadcast-dict path, same as
    StringIndexTransformer)."""

    @keyword_params
    def __init__(self, input_cols: Sequence[str] = (), output_cols: Sequence[str] = (),
                 labels: Sequence[str] = (), mask_token: str | None = None,
                 num_oov_indices: int = 1,
                 vocab_join_threshold: int = VOCAB_JOIN_THRESHOLD):
        pass

    def _col_pairs(self) -> list[tuple[str, str]]:
        return list(zip(self.input_cols, self.output_cols))

    def build(self, df: DataFrame):
        if self._join_cols(df):
            return None  # pipeline falls back to transform()
        from kamae_spark.functions.arrays import elementwise

        out = {}
        for in_c, out_c in zip(self.input_cols, self.output_cols):
            expr, _ = elementwise(df, [in_c], self._index_expr)
            out[out_c] = expr
        return out


class OneHotTransformer(ElementwiseTransform):
    """One-hot from the fitted vocab (reference one_hot_encode.py:129,
    user_defined_functions.py:105-139) as a pure expression."""

    compatible_dtypes = ("string",)

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 labels: Sequence[str] = (), mask_token: str | None = None,
                 num_oov_indices: int = 1, drop_unseen: bool = False,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fn(self, x: Column) -> Column:
        idx = index_expr(x, self.labels, self.mask_token, self.num_oov_indices)
        start = 1 if self.mask_token is not None else 0
        offset = start + self.num_oov_indices
        if self.drop_unseen:
            n = len(self.labels)
            target = idx - offset
        else:
            n = len(self.labels) + offset
            target = idx
        return F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda j: F.when(j == target, F.lit(1.0)).otherwise(F.lit(0.0)),
        )


class SharedOneHotTransformer(OneHotTransformer):
    """Shared-vocab one-hot across N columns (reference
    shared_one_hot_encode.py:125)."""

    @keyword_params
    def __init__(self, input_cols: Sequence[str] = (), output_cols: Sequence[str] = (),
                 labels: Sequence[str] = (), mask_token: str | None = None,
                 num_oov_indices: int = 1, drop_unseen: bool = False):
        pass

    def build(self, df: DataFrame):
        from kamae_spark.functions.arrays import elementwise

        out = {}
        for in_c, out_c in zip(self.input_cols, self.output_cols):
            expr, _ = elementwise(df, [in_c], self.fn)
            out[out_c] = expr
        return out


class SharedOneHotEncodeEstimator(Estimator):
    """One shared vocab, one-hot per column (reference
    estimators/shared_one_hot_encode.py:117)."""

    @keyword_params
    def __init__(self, input_cols: Sequence[str] = (), output_cols: Sequence[str] = (),
                 string_order_type: str = "frequencyDesc",
                 mask_token: str | None = None, num_oov_indices: int = 1,
                 drop_unseen: bool = False, max_num_labels: int | None = DEFAULT_MAX_LABELS,
                 sample_fraction: float | None = None, seed: int = 42):
        if len(input_cols) != len(output_cols):
            raise ValueError("input_cols and output_cols must align")

    def fit(self, df: DataFrame) -> SharedOneHotTransformer:
        labels = collect_labels(
            self._fit_input(df), list(self.input_cols), self.string_order_type,
            self.mask_token, self.max_num_labels,
        )
        return SharedOneHotTransformer(
            input_cols=list(self.input_cols), output_cols=list(self.output_cols),
            labels=labels, mask_token=self.mask_token,
            num_oov_indices=self.num_oov_indices, drop_unseen=self.drop_unseen,
        )


class OneHotEncodeEstimator(Estimator):
    """Fit vocab then one-hot (reference estimators/one_hot_encode.py:117)."""

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 string_order_type: str = "frequencyDesc",
                 mask_token: str | None = None, num_oov_indices: int = 1,
                 drop_unseen: bool = False, max_num_labels: int | None = DEFAULT_MAX_LABELS,
                 sample_fraction: float | None = None, seed: int = 42,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fit(self, df: DataFrame) -> OneHotTransformer:
        labels = collect_labels(
            self._fit_input(df), [self.input_col], self.string_order_type,
            self.mask_token, self.max_num_labels,
        )
        return OneHotTransformer(
            input_col=self.input_col, output_col=self.output_col,
            labels=labels, mask_token=self.mask_token,
            num_oov_indices=self.num_oov_indices, drop_unseen=self.drop_unseen,
            input_dtype=self.input_dtype, output_dtype=self.output_dtype,
        )
