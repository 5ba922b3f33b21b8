"""User-function escape hatches — Arrow-vectorized only.

The reference's LambdaFunctionTransformer wraps a user TensorFlow fn in
a per-row F.udf (reference lambda_function.py:341-430) — its slowest
extension point. Our engine-facing escape hatches are:

- PandasFunctionTransformer: a vectorized ``pd.Series -> pd.Series``
  (or N series in) pandas UDF. Arrow batch transfer, ~10-100x the
  reference's row-at-a-time path.
- MapInPandasTransformer: full-batch ``Iterator[pd.DataFrame] ->
  Iterator[pd.DataFrame]`` for shape-changing custom logic.

Serialization: user functions are pickled with cloudpickle into the
pipeline JSON (hex). Loading executes the pickled function on
transform — the standard Spark trust model (same as any UDF shipped to
executors).
"""

from __future__ import annotations

import binascii
from typing import Callable, Sequence

import cloudpickle
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kamae_spark.core.stage import Transformer, keyword_params


def _encode_fn(fn: Callable) -> str:
    """Pickle BY VALUE: module-level functions default to by-reference
    pickling, which breaks on executors that cannot import the driver's
    module (e.g. a test file or notebook). Registering the module for
    by-value capture makes the payload self-contained."""
    import sys

    mod = sys.modules.get(getattr(fn, "__module__", None))
    registered = False
    if mod is not None and mod.__name__ not in ("builtins", "__main__"):
        try:
            cloudpickle.register_pickle_by_value(mod)
            registered = True
        except Exception:
            pass
    try:
        return binascii.hexlify(cloudpickle.dumps(fn)).decode()
    finally:
        if registered:
            cloudpickle.unregister_pickle_by_value(mod)


def _decode_fn(blob: str) -> Callable:
    return cloudpickle.loads(binascii.unhexlify(blob))


def _by_value(fn: Callable) -> Callable:
    """Normalize any callable to a by-value-picklable object so Spark's
    own serializer never needs the defining module on executors."""
    return _decode_fn(_encode_fn(fn))


class PandasFunctionTransformer(Transformer):
    """Vectorized user function over one or more columns.

    ``fn(*series) -> series`` runs once per Arrow batch. ``return_type``
    is a Spark DDL type string (e.g. 'double', 'array<float>')."""

    @keyword_params
    def __init__(self, input_cols: Sequence[str] = (), output_col: str = "",
                 return_type: str = "double",
                 fn: Callable | None = None, fn_blob: str | None = None):
        if fn is None and fn_blob is None:
            raise ValueError("provide fn (callable) or fn_blob (serialized)")

    def params(self):
        p = super().params()
        fn = p.pop("fn", None)
        if fn is not None and not p.get("fn_blob"):
            p["fn_blob"] = _encode_fn(fn)
        return p

    def _fn(self) -> Callable:
        return _by_value(self.fn) if self.fn is not None else _decode_fn(self.fn_blob)

    def build(self, df: DataFrame):
        fn = self._fn()
        # explicit SCALAR eval type: a cloudpickle-reconstructed function
        # carries stringified type hints pyspark cannot re-resolve, so
        # hint inference is bypassed
        fn.__annotations__ = {}
        udf = pandas_udf(fn, self.return_type, functionType=200)  # SQL_SCALAR_PANDAS_UDF
        return {self.output_col: udf(*[F.col(c) for c in self.input_cols])}


class MapInPandasTransformer(Transformer):
    """Whole-batch user function: ``fn(Iterator[pd.DataFrame]) ->
    Iterator[pd.DataFrame]`` with an explicit output schema (DDL
    string). Unlike column stages this may change the row set."""

    @keyword_params
    def __init__(self, schema: str = "", fn: Callable | None = None,
                 fn_blob: str | None = None):
        if fn is None and fn_blob is None:
            raise ValueError("provide fn (callable) or fn_blob (serialized)")
        if not schema:
            raise ValueError("schema (DDL string) is required")

    def params(self):
        p = super().params()
        fn = p.pop("fn", None)
        if fn is not None and not p.get("fn_blob"):
            p["fn_blob"] = _encode_fn(fn)
        return p

    @property
    def input_columns(self):
        return []

    @property
    def output_columns(self):
        return []

    def transform(self, df: DataFrame) -> DataFrame:
        fn = _by_value(self.fn) if self.fn is not None else _decode_fn(self.fn_blob)
        return df.mapInPandas(fn, schema=self.schema)
