"""Physical-plan regression guards: the scale properties we rely on must
be visible in the executed plan, not just asserted in docstrings.

These tests read `.explain` output programmatically — if a future change
adds an extra shuffle to the flagship pipeline or breaks filter pushdown,
they fail before any benchmark notices."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamae_spark.core.pipeline import PipelineModel
from kamae_spark.operators.joins import AsOfJoin
from kamae_spark.operators.windows import (
    Backfill,
    ConditionalRollingCount,
    Lag,
    Lead,
    ListAgg,
    RollingAgg,
    Sessionize,
)


def _executed(df) -> str:
    """Executed plan truncated at the cached-input boundary: the
    InMemoryRelation embeds its own (generation) plan whose exchanges
    are not part of the pipeline under test."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    cut = plan.find("InMemoryTableScan")
    return plan if cut < 0 else plan[:cut]


def test_cowindowed_stages_share_one_exchange(spark, transcripts):
    """Six window stages on the same (conv_id | order) spec -> exactly one
    hash Exchange on conv_id."""
    order = ("ts", "turn_idx")
    model = PipelineModel(
        [
            Lag(input_col="text", output_col="a", order_by=order),
            Lead(input_col="text", output_col="b", order_by=order),
            RollingAgg(input_col="turn_idx", output_col="c", agg="count", rows=5, order_by=order),
            ConditionalRollingCount(input_col="role", output_col="d", value="user", rows=5, order_by=order),
            Backfill(input_col="tool", output_col="e", order_by=order),
            ListAgg(input_col="turn_idx", output_col="f", agg="count"),
        ]
    )
    plan = _executed(model.transform(transcripts))
    # 0 when the cached input is already conv_id-partitioned (exchange
    # reuse from the cache), 1 when reading cold — never more
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_flagship_exchange_budget(spark, transcripts, annotations):
    """Full flagship (windows + sessionize + asof union) must stay within
    2 hash exchanges: one for the window family, one for the union fill."""
    order = ("ts", "turn_idx")
    model = PipelineModel(
        [
            Lag(input_col="text", output_col="prev_text", order_by=order),
            RollingAgg(input_col="turn_idx", output_col="t5", agg="count", rows=5, order_by=order),
            Backfill(input_col="tool", output_col="tool_ff", order_by=order),
            Sessionize(ts_col="ts", output_col="sess", order_by=order),
            AsOfJoin(on=("conv_id",), right=annotations, strategy="union"),
        ]
    )
    plan = _executed(model.transform(transcripts))
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_broadcast_asof_left_plan_is_exchange_free(spark, transcripts, annotations):
    """Broadcast strategy: the big (left) side must not hash-shuffle,
    sort, or window — the ONLY exchanges allowed are the small right
    side's pre-aggregation and the broadcast itself."""
    op = AsOfJoin(on=("conv_id",), right=annotations, strategy="broadcast")
    plan = _executed(op.transform(transcripts))
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    # the single hash exchange is the RIGHT side's groupBy (bounded by
    # the broadcast-small precondition); the left never exchanges —
    # the plan segment between the parquet/LocalTableScan of the left
    # and the join contains no Exchange
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_filter_pushdown_to_parquet(spark, tmp_path):
    """Predicates on feature output reach the parquet scan."""
    p = str(tmp_path / "t")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    ).write.parquet(p)
    df = spark.read.parquet(p).where(F.col("k") == 3).select("id")
    plan = _executed(df)
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan, plan


def test_rowwise_ops_stay_in_codegen(spark, scalar_features):
    """A chain of row-wise ops must be a single WholeStageCodegen span
    with no Exchange and no Python evaluation."""
    from kamae_spark.operators.math import AbsoluteValue, Log, Sum
    from kamae_spark.operators.strings import StringCase

    model = PipelineModel(
        [
            Log(input_col="col1", output_col="l", alpha=1.0),
            AbsoluteValue(input_col="col3", output_col="a"),
            Sum(input_cols=["l", "a"], output_col="s"),
            StringCase(input_col="col4", output_col="u", case="upper"),
        ]
    )
    plan = _executed(model.transform(scalar_features))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("WholeStageCodegen") <= 2, plan


def test_bucketize_and_math2_chain_stays_codegen(spark, scalar_features):
    """The round-2 rowwise additions (Bucketize + logical + floormod)
    must fuse into whole-stage codegen with no Exchange and no Python."""
    from kamae_spark.operators.conditional import Bucketize, NumericalIfStatement
    from kamae_spark.operators.math import LogicalAnd, LogicalNot, Modulo

    model = PipelineModel(
        [
            Bucketize(input_col="col1", output_col="b", splits=[2.0, 5.0]),
            Modulo(input_cols=["col1"], output_col="m", constant=-3.0),
            NumericalIfStatement(
                input_cols=["col1"], output_col="hi", condition_operator="gt",
                value_to_compare_constant=2.0,
                result_if_true_constant=True, result_if_false_constant=False,
            ),
            LogicalNot(input_col="hi", output_col="lo"),
            LogicalAnd(input_cols=["hi", "lo"], output_col="never"),
        ]
    )
    plan = _executed(model.transform(scalar_features))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    # codegen'd operators render with the `*(n)` stage marker
    assert "*(1)" in plan, plan


def test_ivf_corpus_side_is_one_arrow_pass(spark):
    """IVF corpus side must be ONE Arrow pass over the corpus scan —
    scan strategy: a single MapInPandas (assign+rescore+local top-k
    fused), no join node at all; join strategy: a single ArrowEvalPython
    assignment. Neither may fall back to row-at-a-time Python."""
    from kamae_spark.data.similarity import ivf_topk
    from kamae_spark.sources.synth import embeddings_table

    emb = embeddings_table(spark, 300, dim=16, n_clusters=8).cache()
    emb.count()
    q = emb.where(F.col("vec_id") < 2)
    kw = dict(k=5, n_centroids=4, nprobe=2)
    plan = _executed(ivf_topk(emb, q, "embedding", "vec_id",
                              strategy="scan", **kw))
    assert "MapInPandas" in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan, plan  # no row-at-a-time Python
    plan = _executed(ivf_topk(emb, q, "embedding", "vec_id",
                              strategy="join", **kw))
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    emb.unpersist()


def test_minhash_verify_join_is_candidate_pruned(spark):
    """The verify join must NOT shuffle corpus-wide gram arrays: the
    (id, text) source is pruned to candidate ids by a broadcast LEFT
    SEMI join before re-shingling, so gram construction and the verify
    join touch candidate docs only."""
    from kamae_spark.data.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(i, f"some shared text plus word{i % 3}") for i in range(60)],
        "id long, text string",
    )
    out = minhash_lsh_pairs(df, "text", "id", num_perm=16, bands=4, threshold=0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
