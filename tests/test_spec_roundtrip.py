"""Save/load round-trips for EVERY stage type (reference test pattern:
tests/kamae/spark/test_pipeline.py:465-540 round-trips each transformer
through PipelineML read/write).

Three gates:
1. spec fixpoint: to_spec -> from_spec -> to_spec is identity for every
   stage in the zoo;
2. transform parity: a PipelineModel holding every serializable
   column-transformer produces identical output after JSON save/load;
3. completeness: every concrete registered Stage class appears in the
   zoo (so adding an operator without round-trip coverage fails here).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kamae_spark.core.pipeline import Pipeline, PipelineModel
from kamae_spark.core.stage import Estimator, Stage, registry


def _zoo_fixture(spark):
    return spark.createDataFrame(
        [
            (1, 1.5, 2.5, "a-b", "URGENT", ["a", "b", "a"], [1.0, 2.0], [2.0, 1.0],
             True, False, "2024-02-29", "2024-02-29 01:02:03.123", 1700000000,
             45.0, -70.0, "1.0,2.0;3.0,4.0", "c1", 0, 10.0),
            (2, -3.0, 0.5, "c-d", "LOW", ["c", "c", "d"], [3.0, 4.0], [4.0, 3.0],
             False, True, "2023-12-31", "2023-12-31 23:59:59.999", 1700000500,
             -10.0, 100.0, "5.0;6.0", "c1", 1, None),
            (3, 0.0, 1.0, "e-f", "HIGH", ["e", "f", "e"], [5.0, 6.0], [6.0, 5.0],
             True, True, "2024-01-15", "2024-01-15 12:00:00.000", 1700001000,
             0.0, 0.0, "", "c2", 0, 30.0),
        ],
        "id int, x double, x2 double, s string, s2 string, sl array<string>, "
        "v array<double>, v2 array<double>, b1 boolean, b2 boolean, "
        "dt string, dtt string, unix bigint, lat double, lon double, "
        "seq string, conv_id string, turn_idx int, val double",
    ).withColumn("ts", F.to_timestamp(F.col("dtt")))


def _pf_double(s):
    return s * 2.0


def _mip_ident(it):
    for pdf in it:
        yield pdf


def _zoo(spark, tmp_path):
    """One instance of every concrete serializable stage class."""
    from kamae_spark.data.dedup import SimHash
    from kamae_spark.data.text import Fingerprint, LanguageId, QualityScore, TokenCount
    from kamae_spark.operators.arrays import (
        ArrayConcatenate, ArrayCrop, ArrayReduceMax, ArrayReduceMin, ArraySplit,
        ArraySubtractMinimum, CosineSimilarity, OrdinalArrayEncode,
        PairwiseCosineSimilarity,
    )
    from kamae_spark.operators.conditional import (
        Bin, Bucketize, Identity, IfStatement, NumericalIfStatement, StringMap,
    )
    from kamae_spark.operators.datetimes import (
        CurrentDate, CurrentDateTime, CurrentUnixTimestamp, DateAdd, DateDiff,
        DateParse, DateTimeToUnixTimestamp, UnixTimestampToDateTime,
    )
    from kamae_spark.operators.hashing import BloomEncode, HashIndex, MinHashIndex
    from kamae_spark.operators.indexers import (
        OneHotTransformer, SharedOneHotTransformer, SharedStringIndexTransformer,
        StringIndexTransformer,
    )
    from kamae_spark.operators.joins import AsOfJoin
    from kamae_spark.operators.math import (
        AbsoluteValue, BearingAngle, Divide, Exp, Exponent, HaversineDistance,
        Log, LogicalAnd, LogicalNot, LogicalOr, Max, Mean, Min, Modulo,
        Multiply, Round, RoundToDecimal, Subtract, Sum,
    )
    from kamae_spark.operators.pandas_fn import (
        MapInPandasTransformer, PandasFunctionTransformer,
    )
    from kamae_spark.operators.scalers import (
        ConditionalStandardScaleTransformer, ImputeTransformer,
        MinMaxScaleTransformer, StandardScaleTransformer,
    )
    from kamae_spark.operators.strings import (
        StringAffix, StringArrayConstant, StringCase, StringConcatenate,
        StringContains, StringContainsList, StringIsInList, StringListToString,
        StringReplace, StringSequenceToEmbedding, StringToStringList,
        SubStringDelimAtIndex,
    )
    from kamae_spark.operators.windows import (
        Backfill, ConditionalRollingCount, Lag, Lead, ListAgg, ListRank,
        RollingAgg, Sessionize,
    )

    ann_path = str(tmp_path / "ann.parquet")
    spark.createDataFrame(
        [("c1", "2024-01-01 00:00:00", "lbl")], "conv_id string, ats string, label string"
    ).select("conv_id", F.to_timestamp("ats").alias("ts"), "label").write.mode(
        "overwrite"
    ).parquet(ann_path)

    order = ("ts", "turn_idx")
    return [
        Identity(input_col="x", output_col="z_ident"),
        IfStatement(input_cols=["x", "x2"], output_col="z_if", condition_operator="gt",
                    result_if_true_constant="y", result_if_false_constant="n"),
        NumericalIfStatement(input_cols=["x"], output_col="z_nif", condition_operator="lt",
                             value_to_compare_constant=0.0,
                             result_if_true_constant=1.0, result_if_false_constant=0.0),
        Bin(input_col="x", output_col="z_bin", conditions=[("lt", 0.0, "neg")],
            default_label="pos"),
        Bucketize(input_col="x", output_col="z_bkt", splits=[0.0, 1.0]),
        StringMap(input_col="s2", output_col="z_map", mapping={"URGENT": "u"},
                  default_value="o"),
        AbsoluteValue(input_col="x", output_col="z_abs"),
        Log(input_col="x2", output_col="z_log", alpha=1.0),
        Exp(input_col="x", output_col="z_exp"),
        Exponent(input_cols=["x2"], output_col="z_pow", constant=2.0),
        Sum(input_cols=["x", "x2"], output_col="z_sum"),
        Subtract(input_cols=["x", "x2"], output_col="z_sub"),
        Multiply(input_cols=["x", "x2"], output_col="z_mul"),
        Divide(input_cols=["x", "x2"], output_col="z_div"),
        Mean(input_cols=["x", "x2"], output_col="z_mean"),
        Max(input_cols=["x", "x2"], output_col="z_max"),
        Min(input_cols=["x", "x2"], output_col="z_min"),
        Modulo(input_cols=["id"], output_col="z_mod", constant=3.0),
        Round(input_col="x", output_col="z_rnd", mode="floor"),
        RoundToDecimal(input_col="x", output_col="z_rtd", scale=1),
        LogicalAnd(input_cols=["b1", "b2"], output_col="z_and"),
        LogicalOr(input_cols=["b1", "b2"], output_col="z_or"),
        LogicalNot(input_col="b1", output_col="z_not"),
        HaversineDistance(input_cols=["lat", "lon"], output_col="z_hav",
                          lat_lon_constant=[40.7, -74.0]),
        BearingAngle(input_cols=["lat", "lon"], output_col="z_bear",
                     lat_lon_constant=[40.7, -74.0]),
        StringAffix(input_col="s", output_col="z_aff", prefix="p_", suffix="_s"),
        StringCase(input_col="s", output_col="z_case", case="upper"),
        StringConcatenate(input_cols=["s", "s2"], output_col="z_cat", separator="|"),
        StringContains(input_cols=["s2"], output_col="z_has", constant="URG"),
        StringContainsList(input_col="s2", output_col="z_hasl", constants=["URG", "LO"]),
        StringIsInList(input_col="s2", output_col="z_inl", constants=["LOW", "HIGH"]),
        StringReplace(input_cols=["s"], output_col="z_repl", pattern_constant="-",
                      replacement_constant="_", regex=False),
        SubStringDelimAtIndex(input_col="s", output_col="z_sub1", delimiter="-",
                              index=-1, default_value="NA"),
        StringToStringList(input_col="s", output_col="z_s2l", separator="-",
                           list_length=3, default_value="_"),
        StringListToString(input_col="sl", output_col="z_l2s", separator=","),
        StringArrayConstant(output_col="z_sac", values=["k", "l"]),
        StringSequenceToEmbedding(input_col="seq", output_col="z_emb", seq_len=2,
                                  embedding_dim=2),
        CurrentDate(output_col="z_cd", now="2026-01-02 03:04:05"),
        CurrentDateTime(output_col="z_cdt", now="2026-01-02 03:04:05"),
        CurrentUnixTimestamp(output_col="z_cut", unit="ms", now="2026-01-02 03:04:05"),
        DateAdd(input_cols=["dt"], output_col="z_dadd", num_days=7),
        DateDiff(input_cols=["dt", "z_dadd"], output_col="z_ddiff"),
        DateParse(input_col="dt", output_col="z_dow", date_part="DayOfWeek"),
        DateTimeToUnixTimestamp(input_col="dtt", output_col="z_unix", unit="ms"),
        UnixTimestampToDateTime(input_col="unix", output_col="z_udt", unit="s"),
        ArrayConcatenate(input_cols=["v", "v2"], output_col="z_vcat"),
        ArraySplit(input_col="v", output_cols=["z_v1", "z_v2"]),
        ArrayCrop(input_col="v", output_col="z_crop", length=3, pad_value=-1.0),
        ArrayReduceMax(input_col="v", output_col="z_vmax"),
        ArrayReduceMin(input_col="v", output_col="z_vmin"),
        ArraySubtractMinimum(input_col="v", output_col="z_vsub"),
        CosineSimilarity(input_cols=["v", "v2"], output_col="z_cos"),
        PairwiseCosineSimilarity(input_cols=["v", "z_vcat"], output_col="z_pcos",
                                 embedding_dim=2),
        OrdinalArrayEncode(input_col="sl", output_col="z_ord"),
        HashIndex(input_col="s2", output_col="z_hash", num_bins=16),
        BloomEncode(input_col="s2", output_col="z_bloom", num_bins=16, num_hash_fns=2),
        MinHashIndex(input_col="sl", output_col="z_mh", num_permutations=4),
        StringIndexTransformer(input_col="s2", output_col="z_sidx",
                               labels=["URGENT", "LOW", "HIGH"]),
        SharedStringIndexTransformer(input_cols=["s2"], output_cols=["z_ssidx"],
                                     labels=["URGENT", "LOW", "HIGH"]),
        OneHotTransformer(input_col="s2", output_col="z_oh",
                          labels=["URGENT", "LOW", "HIGH"]),
        SharedOneHotTransformer(input_cols=["s2"], output_cols=["z_soh"],
                                labels=["URGENT", "LOW", "HIGH"]),
        StandardScaleTransformer(input_col="x", output_col="z_std", mean=1.0, stddev=2.0),
        MinMaxScaleTransformer(input_col="x", output_col="z_mm", min=-3.0, max=1.5),
        ConditionalStandardScaleTransformer(input_col="x", output_col="z_cstd",
                                            mean=0.5, stddev=1.5),
        ImputeTransformer(input_col="val", output_col="z_imp", statistic=20.0),
        Lag(input_col="x", output_col="z_lag", partition_by=("conv_id",), order_by=order),
        Lead(input_col="x", output_col="z_lead", partition_by=("conv_id",), order_by=order),
        RollingAgg(input_col="x", output_col="z_roll", agg="sum", rows=2,
                   partition_by=("conv_id",), order_by=order),
        ConditionalRollingCount(input_col="s2", output_col="z_crc", value="LOW",
                                rows=5, partition_by=("conv_id",), order_by=order),
        Backfill(input_col="val", output_col="z_bf", partition_by=("conv_id",),
                 order_by=order),
        Sessionize(ts_col="ts", output_col="z_sess", gap_seconds=3600,
                   partition_by=("conv_id",), order_by=order),
        ListAgg(input_col="x", output_col="z_lmax", agg="max", group_cols=("conv_id",)),
        ListRank(output_col="z_rank", group_cols=("conv_id",), sort_by=("ts", "turn_idx")),
        SimHash(input_col="sl", output_col="z_sim"),
        TokenCount(input_col="s2", output_col="z_tok", mode="regex"),
        QualityScore(input_col="s2", output_col="z_qual"),
        LanguageId(input_col="s2", output_col="z_lang"),
        Fingerprint(input_col="s2", output_col="z_fp"),
        PandasFunctionTransformer(input_cols=["x"], output_col="z_pf",
                                  return_type="double", fn=_pf_double),
        MapInPandasTransformer(
            schema=("id int, x double, x2 double, s string, s2 string, "
                    "sl array<string>, v array<double>, v2 array<double>, "
                    "b1 boolean, b2 boolean, dt string, dtt string, unix bigint, "
                    "lat double, lon double, seq string, conv_id string, "
                    "turn_idx int, val double, ts timestamp"),
            fn=_mip_ident),
        AsOfJoin(on=("conv_id",), right_path=ann_path, strategy="broadcast"),
    ]


# estimators are round-tripped as SPECS (unfitted) and their fitted
# transformers are covered above; each still needs a zoo entry for the
# completeness gate
def _estimator_zoo():
    from kamae_spark.operators.indexers import (
        OneHotEncodeEstimator, SharedOneHotEncodeEstimator,
        SharedStringIndexEstimator, StringIndexEstimator,
    )
    from kamae_spark.operators.scalers import (
        ConditionalStandardScaleEstimator, ImputeEstimator, MinMaxScaleEstimator,
        SingleFeatureArrayStandardScaleEstimator, StandardScaleEstimator,
    )

    return [
        StringIndexEstimator(input_col="s2", output_col="e_sidx"),
        SharedStringIndexEstimator(input_cols=["s2"], output_cols=["e_ssidx"]),
        OneHotEncodeEstimator(input_col="s2", output_col="e_oh"),
        SharedOneHotEncodeEstimator(input_cols=["s2"], output_cols=["e_soh"]),
        StandardScaleEstimator(input_col="x", output_col="e_std"),
        MinMaxScaleEstimator(input_col="x", output_col="e_mm"),
        ConditionalStandardScaleEstimator(input_col="x", output_col="e_cstd"),
        SingleFeatureArrayStandardScaleEstimator(input_col="v", output_col="e_sfa"),
        ImputeEstimator(input_col="val", output_col="e_imp"),
    ]


def test_spec_fixpoint_every_stage(spark, tmp_path):
    for st in _zoo(spark, tmp_path) + _estimator_zoo():
        spec = st.to_spec()
        again = Stage.from_spec(spec).to_spec()
        assert spec == again, f"{type(st).__name__} spec not a fixpoint"


def test_transform_parity_after_save_load(spark, tmp_path):
    df = _zoo_fixture(spark)
    model = PipelineModel(_zoo(spark, tmp_path))
    p = str(tmp_path / "zoo.json")
    model.save(p)
    reloaded = PipelineModel.load(p)
    a = model.transform(df).toPandas().sort_values("id").reset_index(drop=True)
    b = reloaded.transform(df).toPandas().sort_values("id").reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    for col in a.columns:
        pd.testing.assert_series_equal(
            a[col].map(str), b[col].map(str), check_names=False
        ), col


def test_fitted_pipeline_save_load_parity(spark, tmp_path):
    df = _zoo_fixture(spark)
    pipe = Pipeline(_estimator_zoo())
    model = pipe.fit(df)
    p = str(tmp_path / "fitted.json")
    model.save(p)
    a = model.transform(df).toPandas().sort_values("id").reset_index(drop=True)
    b = PipelineModel.load(p).transform(df).toPandas().sort_values("id").reset_index(drop=True)
    for col in a.columns:
        pd.testing.assert_series_equal(
            a[col].map(str), b[col].map(str), check_names=False
        ), col


def test_zoo_covers_every_registered_stage(spark, tmp_path):
    """Adding an operator without round-trip coverage fails here."""
    bases = {
        "Stage", "Transformer", "Estimator", "Pipeline", "PipelineModel",
        "ElementwiseTransform", "ArrayTransform", "_MultiIn", "_SingleIn",
        "_StrIn",
    }
    covered = {type(s).__name__ for s in _zoo(spark, tmp_path) + _estimator_zoo()}
    concrete = {
        name for name, cls in registry.items()
        if name not in bases and not name.startswith("_")
        # other test modules register toy stages (AddOne, ...) when the
        # whole suite runs; only the library's own stages need coverage
        and cls.__module__.startswith("kamae_spark")
    }
    missing = concrete - covered
    assert not missing, f"stages without round-trip coverage: {sorted(missing)}"
