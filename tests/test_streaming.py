"""Structured-Streaming sessionization & stateful ops, exercised with a
file-source stream over staged parquet chunks (availableNow trigger) so
the streaming engine actually runs incrementally."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kamae_spark.streaming.sessions import stream_sessionize, stream_turn_counter


@pytest.fixture()
def staged_stream(spark, transcripts, tmp_path):
    """Write transcripts as two parquet chunks and open as a stream."""
    src = str(tmp_path / "stream_src")
    h = F.pmod(F.xxhash64("conv_id"), 2)
    transcripts.where(h == 0).write.mode("append").parquet(src)
    transcripts.where(h == 1).write.mode("append").parquet(src)
    return spark.readStream.schema(transcripts.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)


def test_stream_sessionize_matches_batch(spark, transcripts, transcripts_pdf, staged_stream, tmp_path):
    # lenient watermark: the synthetic convs start up to 240h apart, and
    # the second file trigger replays "older" event times — a strict
    # watermark would (correctly) drop them as late
    out = stream_sessionize(staged_stream, gap_seconds=1800, watermark="30 days")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions_out").toPandas()

    # batch oracle: session count per conv via the batch operator
    from kamae_spark.core.pipeline import PipelineModel
    from kamae_spark.operators.windows import Sessionize

    batch = (
        PipelineModel([Sessionize(ts_col="ts", output_col="s", gap_seconds=1800)])
        .transform(transcripts)
        .groupBy("conv_id")
        .agg(F.countDistinct("s").alias("n_sessions"), F.count("*").alias("n_turns"))
        .toPandas()
    )
    got_agg = got.groupby("conv_id").agg(
        n_sessions=("session_start", "count"), n_turns=("n_turns", "sum")
    ).reset_index()
    merged = batch.merge(got_agg, on="conv_id", suffixes=("_b", "_s"))
    assert len(merged) == len(batch)
    pd.testing.assert_series_equal(
        merged["n_sessions_b"], merged["n_sessions_s"], check_names=False,
        check_dtype=False,
    )
    pd.testing.assert_series_equal(
        merged["n_turns_b"], merged["n_turns_s"], check_names=False, check_dtype=False
    )


def test_stream_turn_counter(spark, transcripts, staged_stream):
    out = stream_turn_counter(staged_stream)
    q = (
        out.writeStream.format("memory")
        .queryName("turns_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT conv_id, max(n_turns_total) AS n FROM turns_out GROUP BY conv_id"
    ).toPandas()
    exp = transcripts.groupBy("conv_id").count().toPandas()
    merged = exp.merge(got, on="conv_id")
    assert len(merged) == len(exp)
    assert (merged["count"] == merged["n"]).all()


class _FakeState:
    """Minimal GroupState stand-in for driving _update_turns directly."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_update_turns_out_of_order_chunks():
    """last_tool must follow max turn_idx, not Arrow-chunk arrival
    order: a later-arriving chunk can hold EARLIER turns."""
    import pandas as pd

    from kamae_spark.streaming.sessions import _update_turns

    state = _FakeState()
    # chunk 1 holds the LATEST turn (idx 9, tool search); chunk 2
    # arrives after but holds earlier turns with a different tool
    chunk1 = pd.DataFrame({"turn_idx": [8, 9], "tool": [None, "search"]})
    chunk2 = pd.DataFrame({"turn_idx": [2, 3], "tool": ["calc", None]})
    out = list(_update_turns(("c1",), iter([chunk1, chunk2]), state))
    assert out[0]["last_tool"].iloc[0] == "search"
    assert out[0]["n_turns_total"].iloc[0] == 4

    # a second micro-batch with an even later turn updates the state
    chunk3 = pd.DataFrame({"turn_idx": [11], "tool": ["browse"]})
    out2 = list(_update_turns(("c1",), iter([chunk3]), state))
    assert out2[0]["last_tool"].iloc[0] == "browse"
    assert out2[0]["n_turns_total"].iloc[0] == 5

    # all-null-tool batch keeps the previous tool
    chunk4 = pd.DataFrame({"turn_idx": [12], "tool": [None]})
    out3 = list(_update_turns(("c1",), iter([chunk4]), state))
    assert out3[0]["last_tool"].iloc[0] == "browse"
    assert state.get == (6, "browse", 11)
