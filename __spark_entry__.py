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


def _q_list_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Listwise stat with the reference's top-N gate + segment grouping
    (list_utils.py:97-99 semantics): only the 3 earliest turns per
    (conv, role) contribute; every row receives the stat."""
    from kamae_spark.operators.windows import ListAgg

    op = ListAgg(
        input_col="value", output_col="top3_max", agg="max",
        group_cols=("conv_id",), segment_col="role",
        top_n=3, sort_by=("turn_idx",), nan_fill=-1.0,
    )
    t = _transcripts(spark, sf_dir)
    return op.transform(t).select("conv_id", "turn_idx", "role", "top3_max")


_LIST_TOPN_SQL = f"""
WITH t AS ({_T_SQL}),
g AS (
  SELECT conv_id, turn_idx, role, value,
         row_number() OVER (PARTITION BY conv_id, role ORDER BY turn_idx) AS rn
  FROM t
)
SELECT conv_id, turn_idx, role,
       coalesce(max(CASE WHEN rn <= 3 THEN value END)
                  OVER (PARTITION BY conv_id, role), -1.0) AS top3_max
FROM g
"""


# ---------------------------------------------------------------------------
# row-wise transformer queries (lineitem / orders)
# ---------------------------------------------------------------------------

def _q_rowwise_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.core.pipeline import PipelineModel
    from kamae_spark.operators.math import AbsoluteValue, Log, Multiply, Subtract, Sum

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    model = PipelineModel(
        [
            Log(input_col="l_extendedprice", output_col="log_price", alpha=1.0),
            Sum(input_cols=["l_discount", "l_tax"], output_col="disc_plus_tax"),
            Subtract(input_cols=["l_discount"], output_col="disc_m05", constant=0.05),
            AbsoluteValue(input_col="disc_m05", output_col="abs_disc_m05"),
            Multiply(input_cols=["l_extendedprice"], output_col="neg_price", constant=-1.0),
        ]
    )
    out = model.transform(li)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round("log_price", 6).alias("log_price"),
        F.round("disc_plus_tax", 6).alias("disc_plus_tax"),
        F.round("abs_disc_m05", 6).alias("abs_disc_m05"),
        F.round("neg_price", 6).alias("neg_price"),
    )


_ROWWISE_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       round(ln(1.0 + l_extendedprice), 6) AS log_price,
       round(l_discount + l_tax, 6) AS disc_plus_tax,
       round(abs(l_discount - 0.05), 6) AS abs_disc_m05,
       round(l_extendedprice * -1.0, 6) AS neg_price
FROM lineitem
"""


def _q_rowwise_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.core.pipeline import PipelineModel
    from kamae_spark.operators.conditional import Bin, StringMap
    from kamae_spark.operators.strings import (
        StringAffix,
        StringCase,
        StringConcatenate,
        StringContains,
        SubStringDelimAtIndex,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    model = PipelineModel(
        [
            StringCase(input_col="o_orderpriority", output_col="prio_up", case="upper"),
            StringAffix(input_col="o_orderstatus", output_col="status_tag", prefix="st_", suffix="_end"),
            StringConcatenate(input_cols=["o_orderstatus", "o_orderpriority"], output_col="cat", separator="|"),
            StringContains(input_cols=["o_orderpriority"], output_col="is_urgent", constant="URGENT"),
            SubStringDelimAtIndex(input_col="o_orderpriority", output_col="prio_word", delimiter="-", index=1, default_value="NA"),
            Bin(
                input_col="o_totalprice", output_col="price_bucket",
                conditions=[("lt", 50000.0, "low"), ("lt", 150000.0, "mid")],
                default_label="high",
            ),
            StringMap(
                input_col="o_orderstatus", output_col="status_name",
                mapping={"O": "open", "F": "finished", "P": "pending"},
                default_value="unknown",
            ),
        ]
    )
    return model.transform(o).select(
        "o_orderkey", "prio_up", "status_tag", "cat", "is_urgent",
        "prio_word", "price_bucket", "status_name",
    )


_ROWWISE_STRINGS_SQL = """
SELECT o_orderkey,
       upper(o_orderpriority) AS prio_up,
       'st_' || o_orderstatus || '_end' AS status_tag,
       o_orderstatus || '|' || o_orderpriority AS cat,
       contains(o_orderpriority, 'URGENT') AS is_urgent,
       coalesce(string_split(o_orderpriority, '-')[2], 'NA') AS prio_word,
       CASE WHEN o_totalprice < 50000.0 THEN 'low'
            WHEN o_totalprice < 150000.0 THEN 'mid'
            ELSE 'high' END AS price_bucket,
       CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
            WHEN 'P' THEN 'pending' ELSE 'unknown' END AS status_name
FROM orders
"""


def _q_rowwise_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.core.pipeline import PipelineModel
    from kamae_spark.operators.datetimes import DateAdd, DateParse, DateTimeToUnixTimestamp

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "od", F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    model = PipelineModel(
        [
            DateParse(input_col="od", output_col="o_year", date_part="Year"),
            DateParse(input_col="od", output_col="o_month", date_part="MonthOfYear"),
            DateParse(input_col="od", output_col="o_dow", date_part="DayOfWeek"),
            DateAdd(input_cols=["od"], output_col="od_plus30", num_days=30),
            DateTimeToUnixTimestamp(input_col="od", output_col="od_unix", unit="s"),
        ]
    )
    return model.transform(o).select(
        "o_orderkey", "o_year", "o_month", "o_dow", "od_plus30", "od_unix"
    )


_ROWWISE_DATES_SQL = """
SELECT o_orderkey,
       cast(year(o_orderdate) AS int) AS o_year,
       cast(month(o_orderdate) AS int) AS o_month,
       cast(isodow(o_orderdate) AS int) AS o_dow,
       strftime(cast(o_orderdate AS date) + INTERVAL 30 DAY, '%Y-%m-%d') AS od_plus30,
       cast(epoch(cast(strftime(o_orderdate, '%Y-%m-%d') AS timestamp)) AS bigint) AS od_unix
FROM orders
"""


def _q_encoders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fitted estimators: string-index (freq desc, ties label asc; 1 OOV),
    min-max scale, impute-mean — all oracle-expressible because the fit
    statistics are themselves SQL aggregates."""
    from kamae_spark.core.pipeline import Pipeline
    from kamae_spark.operators.indexers import StringIndexEstimator
    from kamae_spark.operators.scalers import MinMaxScaleEstimator

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pipe = Pipeline(
        [
            StringIndexEstimator(input_col="o_orderpriority", output_col="prio_idx"),
            MinMaxScaleEstimator(input_col="o_totalprice", output_col="price_mm"),
        ]
    )
    out = pipe.fit(o).transform(o)
    return out.select(
        "o_orderkey",
        "prio_idx",
        F.round("price_mm", 6).alias("price_mm"),
    )


_ENCODERS_SQL = """
WITH vocab AS (
  SELECT o_orderpriority AS label,
         cast(row_number() OVER (ORDER BY count(*) DESC, o_orderpriority ASC) AS int) AS idx
  FROM orders GROUP BY o_orderpriority
),
stats AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
SELECT o.o_orderkey,
       v.idx AS prio_idx,
       round((o.o_totalprice - s.lo) / (s.hi - s.lo), 6) AS price_mm
FROM orders o JOIN vocab v ON o.o_orderpriority = v.label CROSS JOIN stats s
"""


def _q_fitted_transcript_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kamae-style fit/transform flow end-to-end on transcripts:
    vocab-indexed role + min-max and z-scored value. min-max output is
    bit-exact cross-engine (min/max are copies); z is rounded to 6 (the
    fitted moments differ only at ~1e-14 between engines and z-scores
    do not sit on rounding-grid points)."""
    from kamae_spark.core.pipeline import Pipeline
    from kamae_spark.operators.indexers import StringIndexEstimator
    from kamae_spark.operators.scalers import MinMaxScaleEstimator, StandardScaleEstimator

    t = _transcripts(spark, sf_dir)
    pipe = Pipeline(
        [
            StringIndexEstimator(input_col="role", output_col="role_idx"),
            MinMaxScaleEstimator(input_col="value", output_col="value_mm"),
            StandardScaleEstimator(input_col="value", output_col="value_z"),
        ]
    )
    out = pipe.fit(t).transform(t)
    return out.select(
        "conv_id", "turn_idx", "role_idx", "value_mm",
        F.round("value_z", 6).alias("value_z"),
    )


_FITTED_SQL = f"""
WITH t AS ({_T_SQL}),
vocab AS (
  SELECT role AS label,
         cast(row_number() OVER (ORDER BY count(*) DESC, role ASC) AS int) AS idx
  FROM t GROUP BY role
),
stats AS (
  SELECT min(value) AS lo, max(value) AS hi,
         avg(value) AS m, stddev_pop(value) AS s
  FROM t
)
SELECT t.conv_id, t.turn_idx,
       v.idx AS role_idx,
       (t.value - st.lo) / (st.hi - st.lo) AS value_mm,
       round((t.value - st.m) / st.s, 6) AS value_z
FROM t JOIN vocab v ON t.role = v.label CROSS JOIN stats st
"""


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------

def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.core.pipeline import PipelineModel
    from kamae_spark.data.text import Fingerprint, TokenCount

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = PipelineModel(
        [
            TokenCount(input_col="text", output_col="n_tokens", mode="whitespace"),
            Fingerprint(input_col="text", output_col="fp"),
        ]
    )
    return model.transform(d).select("doc_id", "n_tokens", "fp")


_TEXT_STATS_SQL = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE cast(length(regexp_split_to_array(trim(text), '\s+')) AS int)
       END AS n_tokens,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[!-/:-@\[-`{-~]', '', 'g'),
                               '\s+', ' ', 'g'))) AS fp
FROM documents
"""


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.data.dedup import exact_dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(d, "text", "doc_id")


_EXACT_DEDUP_SQL = r"""
SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[!-/:-@\[-`{-~]', '', 'g'),
                               '\s+', ' ', 'g'))) AS fingerprint,
       min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents GROUP BY 1
"""


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.data.dedup import ngram_jaccard_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(
        d, "text", "doc_id", block_cols=("lang", "source"),
        n=3, threshold=0.5, length_bucket=None,
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


_NGRAM_JACCARD_SQL = """
WITH grams AS (
  SELECT doc_id, lang, source,
         list_distinct([substring(text, i, 3)
                        FOR i IN range(1, greatest(length(text) - 2, 1) + 1)]) AS g
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(cast(length(list_intersect(a.g, b.g)) AS double)
             / length(list_distinct(list_concat(a.g, b.g))), 6) AS jaccard
FROM grams a JOIN grams b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE cast(length(list_intersect(a.g, b.g)) AS double)
      / length(list_distinct(list_concat(a.g, b.g))) >= 0.5
"""


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kamae_spark.data.similarity import brute_force_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 8)
    return brute_force_topk(e, q, "embedding", "vec_id", k=10).select(
        "query_id", "neighbor_id", "score", "rank"
    )


_ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_sum([qv[i] * emb[i] FOR i IN range(1, length(qv) + 1)])
               / (sqrt(list_sum([qv[i] * qv[i] FOR i IN range(1, length(qv) + 1)]))
                  * sqrt(list_sum([emb[i] * emb[i] FOR i IN range(1, length(emb) + 1)]))), 6) AS score
  FROM q, (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) e
  WHERE q.query_id != e.vec_id
)
SELECT query_id, neighbor_id, score,
       cast(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS int) AS rank
FROM scored
QUALIFY rank <= 10
"""


def _q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs blocked on the embeddings `label`
    column (oracle-checkable); the unblocked LSH-bucketed variant is
    kamae_spark.data.dedup.embedding_neardup_pairs."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    from kamae_spark.data.similarity import cosine

    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= 0.25)


_EMB_NEARDUP_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_sum([a.v[i] * b.v[i] FOR i IN range(1, length(a.v) + 1)])
             / (sqrt(list_sum([a.v[i] * a.v[i] FOR i IN range(1, length(a.v) + 1)]))
                * sqrt(list_sum([b.v[i] * b.v[i] FOR i IN range(1, length(b.v) + 1)]))), 6) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_sum([a.v[i] * b.v[i] FOR i IN range(1, length(a.v) + 1)])
            / (sqrt(list_sum([a.v[i] * a.v[i] FOR i IN range(1, length(a.v) + 1)]))
               * sqrt(list_sum([b.v[i] * b.v[i] FOR i IN range(1, length(b.v) + 1)]))), 6) >= 0.25
"""


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-quadratic near-dup pairs; xxhash64-based so no cross-engine
    oracle exists -> rows-only check (intentional). Word-bigram shingles:
    the synthetic docs draw from a ~40-word vocabulary, so char-gram sets
    saturate and would match every pair; selective banding (8 rows/band)
    keeps candidates to genuinely similar pairs."""
    from kamae_spark.data.dedup import minhash_lsh_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(
        d, "text", "doc_id", n=2, num_perm=64, bands=8, threshold=0.6,
        tokenizer="word",
    )


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (pandas-UDF signature; rows-only check)."""
    from kamae_spark.data.dedup import simhash_neardup_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select("doc_id", F.split(F.lower("text"), r"\s+").alias("toks"))
    return simhash_neardup_pairs(toks, "toks", "doc_id", max_hamming=10)


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (approximate by design; rows-only check)."""
    from kamae_spark.data.similarity import ivf_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 8)
    return ivf_topk(e, q, "embedding", "vec_id", k=10, n_centroids=16, nprobe=4)


def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing + Arrow feature extraction (stub decoders;
    rows-only check)."""
    from kamae_spark.data.multimodal import extract_features, synthesize_assets

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_features(synthesize_assets(d, "doc_id", "text"), dim=16)


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
        "w_list_topn": _q_list_topn,
        "asof_join": _q_asof_join,
        "asof_join_broadcast": _q_asof_broadcast,
        "rowwise_math": _q_rowwise_math,
        "rowwise_strings": _q_rowwise_strings,
        "rowwise_dates": _q_rowwise_dates,
        "encoders": _q_encoders,
        "fitted_transcript_features": _q_fitted_transcript_features,
        "text_stats": _q_text_stats,
        "exact_dedup": _q_exact_dedup,
        "ngram_jaccard": _q_ngram_jaccard,
        "ann_topk": _q_ann_topk,
        "emb_neardup": _q_emb_neardup,
        "minhash_lsh": _q_minhash_lsh,
        "simhash_pairs": _q_simhash_pairs,
        "ivf_topk": _q_ivf_topk,
        "multimodal_features": _q_multimodal,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "w_lag_lead": _LAG_LEAD_SQL,
        "w_rolling": _ROLLING_SQL,
        "w_rolling_range": _ROLLING_RANGE_SQL,
        "w_backfill": _BACKFILL_SQL,
        "w_sessionize": _SESSIONIZE_SQL,
        "w_list_stats": _LIST_STATS_SQL,
        "w_list_topn": _LIST_TOPN_SQL,
        "asof_join": _ASOF_SQL,
        "asof_join_broadcast": _ASOF_BROADCAST_SQL,
        "rowwise_math": _ROWWISE_MATH_SQL,
        "rowwise_strings": _ROWWISE_STRINGS_SQL,
        "rowwise_dates": _ROWWISE_DATES_SQL,
        "encoders": _ENCODERS_SQL,
        "fitted_transcript_features": _FITTED_SQL,
        "text_stats": _TEXT_STATS_SQL,
        "exact_dedup": _EXACT_DEDUP_SQL,
        "ngram_jaccard": _NGRAM_JACCARD_SQL,
        "ann_topk": _ANN_TOPK_SQL,
        "emb_neardup": _EMB_NEARDUP_SQL,
        # minhash_lsh / simhash_pairs / ivf_topk / multimodal_features are
        # intentionally oracle-less: hash-engine-specific or approximate
        # (driver records rows-only checks)
    }
