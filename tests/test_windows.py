"""Window-operator golden tests against a pandas groupby oracle
(SURVEY.md §5: parity = allclose(1e-6) vs pandas per-conv_id oracle)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from kamae_spark.core.pipeline import Pipeline, PipelineModel
from kamae_spark.operators.windows import (
    Backfill,
    ConditionalRollingCount,
    Lag,
    Lead,
    ListAgg,
    ListRank,
    RollingAgg,
    Sessionize,
)


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_lag_lead_text(transcripts, transcripts_pdf):
    model = PipelineModel(
        [
            Lag(input_col="text", output_col="prev_text"),
            Lead(input_col="text", output_col="next_text"),
            Lag(input_col="ts", output_col="prev_ts", offset=2),
        ]
    )
    got = _sorted(model.transform(transcripts).toPandas())
    g = transcripts_pdf.groupby("conv_id", sort=False)
    exp_prev = g["text"].shift(1)
    exp_next = g["text"].shift(-1)
    exp_prev_ts = g["ts"].shift(2)
    assert got["prev_text"].fillna("∅").tolist() == exp_prev.fillna("∅").tolist()
    assert got["next_text"].fillna("∅").tolist() == exp_next.fillna("∅").tolist()
    assert got["prev_ts"].fillna(pd.Timestamp(0)).tolist() == exp_prev_ts.fillna(
        pd.Timestamp(0)
    ).tolist()


def test_rolling_count_and_mean(transcripts, transcripts_pdf):
    model = PipelineModel(
        [
            RollingAgg(input_col="turn_idx", output_col="turns_5", agg="count", rows=5),
            RollingAgg(input_col="turn_idx", output_col="cum_turns", agg="count"),
        ]
    )
    got = _sorted(model.transform(transcripts).toPandas())
    g = transcripts_pdf.groupby("conv_id", sort=False)
    exp5 = g["turn_idx"].rolling(5, min_periods=1).count().reset_index(drop=True)
    expc = g.cumcount() + 1
    np.testing.assert_array_equal(got["turns_5"].to_numpy(), exp5.to_numpy())
    np.testing.assert_array_equal(got["cum_turns"].to_numpy(), expc.to_numpy())


def test_rolling_range_seconds(transcripts, transcripts_pdf):
    model = PipelineModel(
        [RollingAgg(input_col="turn_idx", output_col="turns_10m", agg="count",
                    order_by=("ts",), range_seconds=600)]
    )
    got = _sorted(model.transform(transcripts).toPandas())
    exp = []
    for _, grp in transcripts_pdf.groupby("conv_id", sort=False):
        t = grp["ts"].astype("int64") // 10**9
        for v in t:
            exp.append(int(((t >= v - 600) & (t <= v)).sum()))
    np.testing.assert_array_equal(got["turns_10m"].to_numpy(), np.array(exp))


def test_role_frequency(transcripts, transcripts_pdf):
    model = PipelineModel(
        [ConditionalRollingCount(input_col="role", output_col="asst_5",
                                 value="assistant", rows=5)]
    )
    got = _sorted(model.transform(transcripts).toPandas())
    flag = (transcripts_pdf["role"] == "assistant").astype(float)
    exp = (
        flag.groupby(transcripts_pdf["conv_id"], sort=False)
        .rolling(5, min_periods=1)
        .sum()
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(got["asst_5"].to_numpy(), exp.to_numpy())


def test_backfill_tool(transcripts, transcripts_pdf):
    model = PipelineModel([Backfill(input_col="tool", output_col="tool_ff")])
    got = _sorted(model.transform(transcripts).toPandas())
    exp = transcripts_pdf.groupby("conv_id", sort=False)["tool"].ffill()
    assert got["tool_ff"].fillna("∅").tolist() == exp.fillna("∅").tolist()


def _session_oracle(pdf: pd.DataFrame, gap: int) -> pd.Series:
    out = []
    for _, grp in pdf.groupby("conv_id", sort=False):
        t = grp.sort_values(["ts", "turn_idx"])["ts"].astype("int64") / 1e9
        d = t.diff().fillna(0.0)
        out.append((d > gap).cumsum())
    return pd.concat(out).sort_index()


def test_sessionize(transcripts, transcripts_pdf):
    model = PipelineModel(
        [Sessionize(ts_col="ts", output_col="session_idx", gap_seconds=1800,
                    session_id_col="session_id")]
    )
    got = _sorted(model.transform(transcripts).toPandas())
    exp = _session_oracle(transcripts_pdf, 1800)
    np.testing.assert_array_equal(got["session_idx"].to_numpy(), exp.to_numpy())
    # multiple sessions must exist for the fixture to be meaningful
    assert got["session_idx"].max() >= 2
    sid = got["conv_id"] + "#" + got["session_idx"].astype(str)
    assert got["session_id"].tolist() == sid.tolist()


def test_listwise_stats_against_pandas(listwise):
    model = PipelineModel(
        [
            ListAgg(input_col="col2", output_col="q_max", agg="max", group_cols=("query_id",)),
            ListAgg(input_col="col2", output_col="q_mean", agg="mean", group_cols=("query_id",)),
            ListAgg(input_col="col2", output_col="q_median", agg="median", group_cols=("query_id",)),
            ListAgg(input_col="col2", output_col="q_std", agg="stddev", group_cols=("query_id",)),
            ListAgg(input_col="col2", output_col="seg_min", agg="min",
                    group_cols=("query_id",), segment_col="col4"),
            ListRank(output_col="q_rank", group_cols=("query_id",), sort_by=("-col2",)),
        ]
    )
    got = model.transform(listwise).toPandas().sort_values(["query_id", "col3"])
    pdf = listwise.toPandas().sort_values(["query_id", "col3"])
    for name, fn in [("q_max", "max"), ("q_mean", "mean"), ("q_median", "median"), ("q_std", "std")]:
        exp = pdf.groupby("query_id")["col2"].transform(fn)
        np.testing.assert_allclose(got[name].to_numpy(), exp.to_numpy(), atol=1e-6)
    exp_seg = pdf.groupby(["query_id", "col4"])["col2"].transform("min")
    np.testing.assert_allclose(got["seg_min"].to_numpy(), exp_seg.to_numpy())
    exp_rank = pdf.groupby("query_id")["col2"].rank(ascending=False, method="first")
    np.testing.assert_array_equal(got["q_rank"].to_numpy(), exp_rank.to_numpy().astype(int))


def test_listwise_topn_and_min_filter(listwise):
    # top-2 by col3 ascending contribute; everyone receives the stat
    model = PipelineModel(
        [ListAgg(input_col="col2", output_col="top2_mean", agg="mean",
                 group_cols=("query_id",), top_n=2, sort_by=("col3",), nan_fill=-9.0)]
    )
    got = model.transform(listwise).toPandas().sort_values(["query_id", "col3"])
    pdf = listwise.toPandas().sort_values(["query_id", "col3"])
    exp = pdf.groupby("query_id").apply(
        lambda g: pd.Series(g.nsmallest(2, "col3")["col2"].mean(), index=g.index),
        include_groups=False,
    ).reset_index(level=0, drop=True)
    np.testing.assert_allclose(got["top2_mean"].to_numpy(), exp.to_numpy(), atol=1e-6)

    model2 = PipelineModel(
        [ListAgg(input_col="col2", output_col="hi_mean", agg="mean",
                 group_cols=("query_id",), min_filter_value=5.0)]
    )
    got2 = model2.transform(listwise).toPandas().sort_values(["query_id", "col3"])
    exp2 = pdf.assign(v=pdf["col2"].where(pdf["col2"] >= 5.0)).groupby("query_id")["v"].transform("mean")
    np.testing.assert_allclose(got2["hi_mean"].to_numpy(), exp2.to_numpy(), atol=1e-6)


def test_temporal_leakage_invariance(spark, transcripts):
    """Point-in-time features at ts<=T must be invariant to deleting rows
    with ts>T (SURVEY.md §5 leakage test)."""
    from pyspark.sql import functions as F

    model = PipelineModel(
        [
            Lag(input_col="text", output_col="prev_text"),
            RollingAgg(input_col="turn_idx", output_col="turns_5", agg="count", rows=5),
            Backfill(input_col="tool", output_col="tool_ff"),
            Sessionize(ts_col="ts", output_col="session_idx"),
        ]
    )
    cutoff = transcripts.selectExpr("percentile_approx(cast(ts as long), 0.5)").first()[0]
    full = model.transform(transcripts).where(F.col("ts").cast("long") <= cutoff)
    trunc = model.transform(transcripts.where(F.col("ts").cast("long") <= cutoff))
    cols = ["conv_id", "turn_idx", "prev_text", "turns_5", "tool_ff", "session_idx"]
    a = full.select(cols).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = trunc.select(cols).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
