"""Property-based tests (hypothesis): randomized inputs vs independent
oracles for the operators whose edge cases hand-written fixtures miss —
as-of join tie/ordering behavior and sessionization gap boundaries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kamae_spark.operators.joins import AsOfJoin
from kamae_spark.operators.windows import Sessionize
from kamae_spark.core.pipeline import PipelineModel


@st.composite
def _asof_case(draw):
    n_left = draw(st.integers(2, 12))
    n_right = draw(st.integers(0, 8))
    # second-granularity ts values in a small range -> frequent exact ties
    lts = draw(st.lists(st.integers(0, 30), min_size=n_left, max_size=n_left))
    rts = draw(st.lists(st.integers(0, 30), min_size=n_right, max_size=n_right))
    return sorted(lts), sorted(set(rts))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=_asof_case())
def test_asof_union_matches_merge_asof(spark, case):
    lts, rts = case
    left = pd.DataFrame(
        {"conv_id": "c", "turn_idx": range(len(lts)),
         "ts": pd.to_datetime(lts, unit="s")}
    )
    right = pd.DataFrame(
        {"conv_id": "c", "ts": pd.to_datetime(rts, unit="s"),
         "label": [f"L{i}" for i in range(len(rts))]}
    )
    ldf = spark.createDataFrame(left)
    rdf = (
        spark.createDataFrame(right)
        if len(right)
        else spark.createDataFrame([], "conv_id string, ts timestamp, label string")
    )
    got = (
        AsOfJoin(on=("conv_id",), right=rdf, strategy="union")
        .transform(ldf)
        .toPandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts", by="conv_id", direction="backward",
    ).sort_values("turn_idx").reset_index(drop=True)
    assert got["label_asof"].fillna("∅").tolist() == exp["label"].fillna("∅").tolist()


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    gaps=st.lists(st.integers(0, 4000), min_size=1, max_size=30),
    threshold=st.sampled_from([1, 600, 1800, 3600]),
)
def test_sessionize_matches_cumsum_oracle(spark, gaps, threshold):
    ts = np.cumsum([0] + gaps)
    pdf = pd.DataFrame(
        {"conv_id": "c", "turn_idx": range(len(ts)),
         "ts": pd.to_datetime(ts, unit="s")}
    )
    df = spark.createDataFrame(pdf)
    got = (
        PipelineModel([Sessionize(ts_col="ts", output_col="s",
                                  gap_seconds=threshold,
                                  order_by=("ts", "turn_idx"))])
        .transform(df)
        .toPandas()
        .sort_values("turn_idx")["s"]
        .to_numpy()
    )
    exp = np.concatenate([[0], np.cumsum(np.array(gaps) > threshold)])
    np.testing.assert_array_equal(got, exp)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    xs=st.lists(st.integers(-1000, 1000), min_size=1, max_size=20),
    y=st.integers(-50, 50).filter(lambda v: v != 0),
)
def test_modulo_reference_rule_property(spark, xs, y):
    """Modulo must equal the reference rule (modulo.py:182-190): C-style
    remainder, plus the divisor only when that remainder is negative.
    Equals numpy floormod for y > 0; keeps positive remainders for y < 0
    (integer-valued doubles: sign semantics without float noise)."""
    from kamae_spark.operators.math import Modulo

    pdf = pd.DataFrame({"x": [float(x) for x in xs], "y": float(y)})
    df = spark.createDataFrame(pdf)
    got = (
        PipelineModel([Modulo(input_cols=["x", "y"], output_col="m")])
        .transform(df).toPandas().sort_index()
    )
    fmod = np.fmod(got["x"].to_numpy(), float(y))
    exp = np.where(fmod >= 0, fmod, fmod + float(y))
    np.testing.assert_allclose(got["m"].to_numpy(), exp, atol=1e-9)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    xs=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=1, max_size=25,
    ),
    splits=st.lists(st.floats(-50, 50, allow_nan=False), min_size=1,
                    max_size=6, unique=True),
)
def test_bucketize_matches_bisect_right(spark, xs, splits):
    """Bucketize == bisect.bisect_right(splits, x) + 1; null -> null."""
    import bisect

    from kamae_spark.operators.conditional import Bucketize

    splits = sorted(splits)
    # tuples, not pandas: None must reach Spark as NULL, not NaN
    df = spark.createDataFrame(
        [(i, None if x is None else float(x)) for i, x in enumerate(xs)],
        "i int, x double",
    )
    got = (
        Bucketize(input_col="x", output_col="b", splits=splits)
        .transform(df).toPandas().sort_values("i")["b"].tolist()
    )
    exp = [None if x is None else bisect.bisect_right(splits, x) + 1 for x in xs]
    assert [None if g is None or g != g else int(g) for g in got] == exp


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    toks=st.lists(st.sampled_from(["a", "b", "c", "d", "<p>"]),
                  min_size=1, max_size=15),
)
def test_ordinal_array_encode_matches_first_appearance(spark, toks):
    from kamae_spark.operators.arrays import OrdinalArrayEncode

    df = spark.createDataFrame([(toks,)], "xs array<string>")
    got = (
        OrdinalArrayEncode(input_col="xs", output_col="o", pad_value="<p>")
        .transform(df).collect()[0]["o"]
    )
    seen: dict[str, int] = {}
    exp = []
    for t in toks:
        if t == "<p>":
            exp.append(-1)
        else:
            seen.setdefault(t, len(seen))
            exp.append(seen[t])
    assert got == exp


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    xs=st.lists(st.floats(-1000, 1000, allow_nan=False), min_size=1, max_size=30),
    k=st.integers(1, 6),
)
def test_rolling_sum_matches_pandas_rolling(spark, xs, k):
    from kamae_spark.operators.windows import RollingAgg

    pdf = pd.DataFrame({"conv_id": "c", "turn_idx": range(len(xs)), "x": xs})
    df = spark.createDataFrame(pdf)
    got = (
        RollingAgg(input_col="x", output_col="s", agg="sum",
                   order_by=["turn_idx"], rows=k)
        .transform(df).toPandas().sort_values("turn_idx")["s"].to_numpy()
    )
    exp = pdf["x"].rolling(window=k, min_periods=1).sum().to_numpy()
    np.testing.assert_allclose(got, exp, atol=1e-6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(xs=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=21))
def test_list_agg_median_matches_numpy(spark, xs):
    from kamae_spark.operators.windows import ListAgg

    pdf = pd.DataFrame({"conv_id": "c", "x": xs})
    df = spark.createDataFrame(pdf)
    got = (
        ListAgg(input_col="x", output_col="md", agg="median",
                group_cols=["conv_id"])
        .transform(df).toPandas()["md"].iloc[0]
    )
    assert got == pytest.approx(float(np.median(xs)), abs=1e-9)
