"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash).

The engine's domain is feature engineering over conversation transcripts
(BASELINE.json input_hint). The testdata has no transcript table, so a
transcript view is DERIVED deterministically from ``events``
(conv_id=user_id, turn ordering by ts+event_id, role=event_type,
text=props, sparse tool from value thresholds) — the same derivation is
expressed in ANSI SQL inside every oracle, so Spark engine operators and
DuckDB compute over identical rows.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GAP_SECONDS = 4 * 3600  # sessionization gap for the events-derived transcripts


# ---------------------------------------------------------------------------
# shared derivation: events -> transcripts / annotations
# ---------------------------------------------------------------------------

def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.operators.windows import ListRank

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rank = ListRank(
        output_col="__rn", group_cols=("user_id",), sort_by=("ts", "event_id")
    )
    t = rank.transform(ev)
    return t.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.col("__rn") - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("value") >= 150.0, F.lit("search"))
        .when(F.col("value") <= 25.0, F.lit("code"))
        .alias("tool"),
        F.col("ts"),
        F.col("value"),
    )


# the same derivation in ANSI SQL (DuckDB oracle side)
_T_SQL = """
SELECT cast(user_id AS varchar) AS conv_id,
       cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS int) AS turn_idx,
       event_type AS role,
       props AS text,
       CASE WHEN value >= 150.0 THEN 'search'
            WHEN value <= 25.0 THEN 'code' END AS tool,
       ts,
       value
FROM events
"""

_ANN_SQL = """
SELECT cast(user_id AS varchar) AS conv_id, ts,
       event_type AS label, value AS score
FROM events WHERE event_type = 'purchase'
"""


def _annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").cast("string").alias("conv_id"),
        "ts",
        F.col("event_type").alias("label"),
        F.col("value").alias("score"),
    )


# ---------------------------------------------------------------------------
# queries (engine operators) + oracles (ANSI SQL)
# ---------------------------------------------------------------------------

def _q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.core.pipeline import PipelineModel
    from kamae_spark.operators.windows import Lag, Lead

    order = ("ts", "turn_idx")
    model = PipelineModel(
        [
            Lag(input_col="text", output_col="prev_text", order_by=order),
            Lead(input_col="text", output_col="next_text", order_by=order),
            Lag(input_col="role", output_col="prev_role", order_by=order, offset=2),
        ]
    )
    t = _transcripts(spark, sf_dir)
    return model.transform(t).select(
        "conv_id", "turn_idx", "prev_text", "next_text", "prev_role"
    )


_LAG_LEAD_SQL = f"""
WITH t AS ({_T_SQL})
SELECT conv_id, turn_idx,
       lag(text) OVER w AS prev_text,
       lead(text) OVER w AS next_text,
       lag(role, 2) OVER w AS prev_role
FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
"""


def _q_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.core.pipeline import PipelineModel
    from kamae_spark.operators.windows import ConditionalRollingCount, RollingAgg

    model = PipelineModel(
        [
            RollingAgg(input_col="value", output_col="turns_5", agg="count", rows=5),
            RollingAgg(input_col="value", output_col="sum_value_5", agg="sum", rows=5),
            RollingAgg(input_col="value", output_col="__cum_sum", agg="sum"),
            RollingAgg(input_col="value", output_col="__cum_n", agg="count"),
            ConditionalRollingCount(
                input_col="role", output_col="clicks_10", value="click", rows=10
            ),
        ]
    )
    t = _transcripts(spark, sf_dir)
    out = model.transform(t)
    # hash-exact cross-engine floats: round SUMS (2-decimal-grid inputs make
    # that safe) and derive the mean by identical IEEE division on both
    # sides; never round raw means (boundary flips, see tests history)
    return out.select(
        "conv_id",
        "turn_idx",
        "turns_5",
        F.round("sum_value_5", 4).alias("sum_value_5"),
        (F.round("__cum_sum", 4) / F.col("__cum_n")).alias("cum_mean_value"),
        "clicks_10",
    )


_ROLLING_SQL = f"""
WITH t AS ({_T_SQL})
SELECT conv_id, turn_idx,
       count(value) OVER w5 AS turns_5,
       round(sum(value) OVER w5, 4) AS sum_value_5,
       round(sum(value) OVER wc, 4) / count(value) OVER wc AS cum_mean_value,
       cast(sum(CASE WHEN role = 'click' THEN 1 ELSE 0 END) OVER w10 AS bigint) AS clicks_10
FROM t WINDOW
  w5 AS (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
  w10 AS (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
  wc AS (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def _q_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.operators.windows import RollingAgg

    op = RollingAgg(
        input_col="value",
        output_col="events_24h",
        agg="count",
        order_by=("ts",),
        range_seconds=86400,
    )
    t = _transcripts(spark, sf_dir)
    return op.transform(t).select("conv_id", "turn_idx", "events_24h")


_ROLLING_RANGE_SQL = f"""
WITH t AS ({_T_SQL})
SELECT conv_id, turn_idx,
       count(value) OVER (PARTITION BY conv_id ORDER BY cast(floor(epoch(ts)) AS bigint)
                          RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS events_24h
FROM t
"""


def _q_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.operators.windows import Backfill

    op = Backfill(input_col="tool", output_col="tool_ff", order_by=("ts", "turn_idx"))
    t = _transcripts(spark, sf_dir)
    return op.transform(t).select("conv_id", "turn_idx", "tool", "tool_ff")


_BACKFILL_SQL = f"""
WITH t AS ({_T_SQL})
SELECT conv_id, turn_idx, tool,
       last_value(tool IGNORE NULLS) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tool_ff
FROM t
"""


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.operators.windows import Sessionize

    op = Sessionize(
        ts_col="ts",
        output_col="session_idx",
        gap_seconds=GAP_SECONDS,
        order_by=("ts", "turn_idx"),
        session_id_col="session_id",
    )
    t = _transcripts(spark, sf_dir)
    return op.transform(t).select("conv_id", "turn_idx", "session_idx", "session_id")


_SESSIONIZE_SQL = f"""
WITH t AS ({_T_SQL}),
g AS (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx))
                   > {GAP_SECONDS} THEN 1 ELSE 0 END AS flag
  FROM t
)
SELECT conv_id, turn_idx,
       cast(sum(flag) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS int) AS session_idx,
       conv_id || '#' || cast(cast(sum(flag) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS int) AS varchar) AS session_id
FROM g
"""


def _q_list_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.core.pipeline import PipelineModel
    from kamae_spark.operators.windows import ListAgg, ListRank

    t = _transcripts(spark, sf_dir).withColumn("value_sq", F.col("value") * F.col("value"))
    model = PipelineModel(
        [
            ListAgg(input_col="value", output_col="v_max", agg="max"),
            ListAgg(input_col="value", output_col="v_median", agg="median"),
            ListAgg(input_col="value", output_col="__s", agg="sum"),
            ListAgg(input_col="value_sq", output_col="__ssq", agg="sum"),
            ListAgg(input_col="value", output_col="__n", agg="count"),
            ListRank(output_col="v_rank", sort_by=("-value", "turn_idx")),
        ]
    )
    out = model.transform(t)
    # bit-identical cross-engine stats: mean & stddev derived from rounded
    # sums (inputs are 2-decimal -> sums/ssq on a coarse grid, rounding safe);
    # max/median are copies/midpoints and stay unrounded
    s, ssq, n = F.round("__s", 4), F.round("__ssq", 4), F.col("__n")
    v_mean = s / n
    v_std = F.when(n > 1, F.sqrt((ssq - s * s / n) / (n - 1)))
    return out.select(
        "conv_id",
        "turn_idx",
        "v_max",
        v_mean.alias("v_mean"),
        "v_median",
        v_std.alias("v_std"),
        "v_rank",
    )


_LIST_STATS_SQL = f"""
WITH t AS ({_T_SQL}),
w AS (
  SELECT conv_id, turn_idx, value,
         max(value) OVER win AS v_max,
         median(value) OVER win AS v_median,
         round(sum(value) OVER win, 4) AS s,
         round(sum(value * value) OVER win, 4) AS ssq,
         count(value) OVER win AS n,
         cast(row_number() OVER (PARTITION BY conv_id ORDER BY value DESC, turn_idx) AS int) AS v_rank
  FROM t WINDOW win AS (PARTITION BY conv_id)
)
SELECT conv_id, turn_idx, v_max,
       s / n AS v_mean,
       v_median,
       CASE WHEN n > 1 THEN sqrt((ssq - s * s / n) / (n - 1)) END AS v_std,
       v_rank
FROM w
"""


def _q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.operators.joins import AsOfJoin

    t = _transcripts(spark, sf_dir)
    ann = _annotations(spark, sf_dir)
    op = AsOfJoin(on=("conv_id",), right=ann, strategy="union")
    return op.transform(t).select("conv_id", "turn_idx", "label_asof", "score_asof")


_ASOF_SQL = f"""
WITH t AS ({_T_SQL}), a AS ({_ANN_SQL})
SELECT t.conv_id, t.turn_idx, a.label AS label_asof, a.score AS score_asof
FROM t ASOF LEFT JOIN a ON t.conv_id = a.conv_id AND t.ts >= a.ts
"""


def _q_asof_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.operators.joins import AsOfJoin

    t = _transcripts(spark, sf_dir)
    ann = _annotations(spark, sf_dir)
    op = AsOfJoin(
        on=("conv_id",), right=ann, strategy="broadcast", tolerance_seconds=7 * 86400
    )
    return op.transform(t).select("conv_id", "turn_idx", "label_asof", "score_asof")


_ASOF_BROADCAST_SQL = f"""
WITH t AS ({_T_SQL}), a AS ({_ANN_SQL})
SELECT t.conv_id, t.turn_idx,
       CASE WHEN epoch(t.ts) - epoch(a.ts) <= {7 * 86400} THEN a.label END AS label_asof,
       CASE WHEN epoch(t.ts) - epoch(a.ts) <= {7 * 86400} THEN a.score END AS score_asof
FROM t ASOF LEFT JOIN a ON t.conv_id = a.conv_id AND t.ts >= a.ts
"""


# ---------------------------------------------------------------------------
# driver entry points
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full point-in-time feature pipeline over sf0.001 transcripts."""
    from kamae_spark.core.pipeline import PipelineModel
    from kamae_spark.operators.joins import AsOfJoin
    from kamae_spark.operators.windows import (
        Backfill,
        ConditionalRollingCount,
        Lag,
        ListAgg,
        RollingAgg,
        Sessionize,
    )

    sf_dir = "/root/testdata/sf0.001"
    t = _transcripts(spark, sf_dir)
    ann = _annotations(spark, sf_dir)
    order = ("ts", "turn_idx")
    model = PipelineModel(
        [
            Lag(input_col="text", output_col="prev_text", order_by=order),
            Lag(input_col="ts", output_col="prev_ts", order_by=order),
            RollingAgg(input_col="value", output_col="turns_5", agg="count", rows=5, order_by=order),
            RollingAgg(input_col="value", output_col="mean_value_10", agg="mean", rows=10, order_by=order),
            ConditionalRollingCount(input_col="role", output_col="errors_10", value="error", rows=10, order_by=order),
            Backfill(input_col="tool", output_col="tool_ff", order_by=order),
            Sessionize(ts_col="ts", output_col="session_idx", gap_seconds=GAP_SECONDS, order_by=order, session_id_col="session_id"),
            ListAgg(input_col="value", output_col="conv_mean_value", agg="mean"),
            AsOfJoin(on=("conv_id",), right=ann, strategy="union"),
        ]
    )
    return model.transform(t)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "w_lag_lead": _q_lag_lead,
        "w_rolling": _q_rolling,
        "w_rolling_range": _q_rolling_range,
        "w_backfill": _q_backfill,
        "w_sessionize": _q_sessionize,
        "w_list_stats": _q_list_stats,
        "asof_join": _q_asof_join,
        "asof_join_broadcast": _q_asof_broadcast,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "w_lag_lead": _LAG_LEAD_SQL,
        "w_rolling": _ROLLING_SQL,
        "w_rolling_range": _ROLLING_RANGE_SQL,
        "w_backfill": _BACKFILL_SQL,
        "w_sessionize": _SESSIONIZE_SQL,
        "w_list_stats": _LIST_STATS_SQL,
        "asof_join": _ASOF_SQL,
        "asof_join_broadcast": _ASOF_BROADCAST_SQL,
    }
