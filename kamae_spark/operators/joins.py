"""Point-in-time as-of join — the north-rule centerpiece.

The reference implements NO joins (SURVEY.md §2.9 — verified: no
``.join(`` under src/kamae/spark); this operator is new, designed
Spark-first.

Semantics: for each left row (turn), attach the payload of the latest
right row (annotation) with the same key and ``right.ts <= left.ts``
(ties: annotation wins), null if none — pandas
``merge_asof(direction="backward")`` semantics, leak-proof by
construction.

Two physical strategies, selectable per call:

- ``union`` (default, scales to any right size): tag both sides, union,
  one window pass of ``last(payload, ignorenulls=True)`` over
  (key) ordered by (ts, side) with an UNBOUNDED PRECEDING frame, filter
  back to left rows. Cost: ONE shuffle of left+right on the key — no
  join node at all, no row explosion, skew bounded by per-key group
  size. This is the 100 TB path: a sort-merge join + groupwise filter
  would shuffle the same bytes but also materialize match candidates.
- ``broadcast``: the (small) right side is packed to one row per key
  holding a ts-sorted ``array<struct>``, broadcast-equi-joined, and the
  latest ``ts <= left.ts`` match picked by a pure array expression.
  GENUINELY zero shuffle of the (huge) left side: no hash partitioning,
  no sort, no row explosion, no window (asserted by
  test_plan_quality.test_broadcast_asof_left_plan_is_exchange_free).
  Use when annotations are a small dimension.

``tolerance_seconds`` bounds the lookback (rows older than the bound do
not fill forward). Implemented in the union path by nulling payloads
whose source ts is out of range after the fill — requires carrying the
fill-source ts, one extra ``last`` over the same window (same shuffle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kamae_spark.core.stage import Transformer, keyword_params
from kamae_spark.functions.time import epoch_seconds

UNB = Window.unboundedPreceding
CUR = Window.currentRow


class AsOfJoin(Transformer):
    """As-of join a right DataFrame onto the pipeline's left DataFrame.

    The right side is supplied at construction (DataFrame) or via
    ``right_path`` (parquet path, for serializable pipelines).
    ``payload_cols`` are the right columns to attach (default: all
    non-key, non-ts).
    """

    # the pipeline schedules this stage as early as its deps allow: the
    # union-fill exchange then shuffles only pre-existing columns (not
    # later window/projection outputs) and downstream stages keyed on
    # the same columns reuse its hash partitioning (guide §2.3/§2.4)
    schedule_early = True

    @keyword_params
    def __init__(
        self,
        on: Sequence[str] = ("conv_id",),
        left_ts: str = "ts",
        right_ts: str = "ts",
        payload_cols: Sequence[str] | None = None,
        suffix: str = "_asof",
        strategy: str = "union",
        tolerance_seconds: int | None = None,
        right_path: str | None = None,
        right: DataFrame | None = None,
    ):
        if strategy not in ("union", "broadcast"):
            raise ValueError("strategy must be union|broadcast")

    def params(self):
        p = super().params()
        p.pop("right", None)  # DataFrames are not serializable; keep right_path
        return p

    @property
    def input_columns(self):
        return [*self.on, self.left_ts]

    @property
    def output_columns(self):
        if self.payload_cols is None:
            return []  # unknown until transform time
        return [f"{c}{self.suffix}" for c in self.payload_cols]

    def _right_df(self, df: DataFrame) -> DataFrame:
        if self.right is not None:
            return self.right
        if self.right_path:
            return df.sparkSession.read.parquet(self.right_path)
        raise ValueError("AsOfJoin needs `right` DataFrame or `right_path`")

    def transform(self, df: DataFrame) -> DataFrame:
        right = self._right_df(df)
        payload = list(
            self.payload_cols
            if self.payload_cols is not None
            else [c for c in right.columns if c not in (*self.on, self.right_ts)]
        )
        if self.strategy == "broadcast":
            return self._broadcast(df, right, payload)
        return self._union(df, right, payload)

    # -- broadcast packed-array path ---------------------------------------
    def _broadcast(self, left: DataFrame, right: DataFrame, payload: list[str]) -> DataFrame:
        """Zero-shuffle-of-the-left plan: the (small) right side collapses
        to one row per key holding a ts-sorted ``array<struct(ts,
        payload...)>``, which broadcast-equi-joins onto the left; the
        latest match with ``ts <= left.ts`` is then picked by a pure
        array expression. The only exchanges in the plan are the
        right-side aggregation (small by precondition) and the broadcast
        itself — the huge left side is never hash-partitioned, sorted, or
        row-exploded (a naive range join would duplicate each left row
        per candidate and need a window to pick one back).
        """
        r = right.groupBy(*self.on).agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(self.right_ts).alias("__ts"),
                        *[F.col(c) for c in payload],
                    )
                )
            ).alias("__ann")
        )
        joined = left.join(F.broadcast(r), on=list(self.on), how="left")
        lts = F.col(self.left_ts)

        def in_range(s: Column) -> Column:
            ok = s["__ts"] <= lts
            if self.tolerance_seconds is not None:
                ok = ok & (
                    epoch_seconds(lts) - epoch_seconds(s["__ts"])
                    <= int(self.tolerance_seconds)
                )
            return ok

        pick = F.try_element_at(F.filter(F.col("__ann"), in_range), F.lit(-1))
        return joined.select(
            *[F.col(c) for c in left.columns],
            *[pick[c].alias(f"{c}{self.suffix}") for c in payload],
        )

    # -- union + window fill path (scale default) --------------------------
    def _union(self, left: DataFrame, right: DataFrame, payload: list[str]) -> DataFrame:
        out_cols = [f"{c}{self.suffix}" for c in payload]
        lcols = [c for c in left.columns]
        # common shape: left columns + payload outs + side tag + source ts
        l_tagged = left.select(
            *lcols,
            *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(payload, out_cols)],
            F.lit(1).alias("__side"),
            F.lit(None).cast(right.schema[self.right_ts].dataType).alias("__src_ts"),
        )
        r_tagged = right.select(
            *[F.col(k) if k in right.columns else F.lit(None).alias(k) for k in self.on],
            F.col(self.right_ts).alias(self.left_ts),
            *[F.col(c).alias(o) for c, o in zip(payload, out_cols)],
            F.lit(0).alias("__side"),
            F.col(self.right_ts).alias("__src_ts"),
        )
        # fill missing left columns on the right side with typed nulls
        missing = [c for c in lcols if c not in r_tagged.columns]
        r_tagged = r_tagged.select(
            *[
                F.col(c) if c in r_tagged.columns else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in lcols
            ],
            *out_cols,
            "__side",
            "__src_ts",
        )
        u = l_tagged.unionByName(r_tagged)
        # annotation sorts before the turn at equal ts => tie goes to the annotation
        w = (
            Window.partitionBy(*self.on)
            .orderBy(F.col(self.left_ts).asc(), F.col("__side").asc())
            .rowsBetween(UNB, CUR)
        )
        filled = u.select(
            "*",
            *[F.last(o, ignorenulls=True).over(w).alias(f"__f_{o}") for o in out_cols],
            F.last("__src_ts", ignorenulls=True).over(w).alias("__f_src_ts"),
        )
        res = filled.where(F.col("__side") == 1)
        keep: list[Column] = [F.col(c) for c in lcols]
        for o in out_cols:
            v = F.col(f"__f_{o}")
            if self.tolerance_seconds is not None:
                in_range = (
                    epoch_seconds(F.col(self.left_ts)) - epoch_seconds(F.col("__f_src_ts"))
                    <= int(self.tolerance_seconds)
                )
                v = F.when(in_range, v)
            keep.append(v.alias(o))
        return res.select(*keep)
