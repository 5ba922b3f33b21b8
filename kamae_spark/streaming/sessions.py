"""Structured-Streaming variants of the stateful operators.

The reference has NO streaming (SURVEY.md §2.13); the batch engine's
sessionization maps onto Spark's native streaming primitives:

- stream_sessionize: gap-based session aggregates via
  ``F.session_window`` + watermark (late data handled by the watermark,
  sessions merge as turns arrive).
- stream_turn_counter: custom stateful per-conversation running state
  via ``applyInPandasWithState`` (turn counts + last-seen tool =
  streaming backfill state), demonstrating the arbitrary-stateful path
  for operators session_window cannot express.

Both consume the same transcript schema as the batch path, so a batch
pipeline's features can be maintained incrementally.

STATE SCHEMA VERSION 2 (checkpoint compatibility): the
``stream_turn_counter`` state struct gained a third field
(``last_tool_turn``) — a stream restarted against a checkpoint written
by the v1 two-field schema will FAIL state deserialization. There is no
in-place migration for ``applyInPandasWithState`` state; discard old
checkpoints (or run the old pipeline to drain, then cut over) when
upgrading across this boundary. ``TURN_STATE_VERSION`` below marks the
current version for consumers to pin against.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def stream_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "conv_id",
) -> DataFrame:
    """Per-(conv, session) aggregates over gap-based session windows.

    Emits one row per closed session: conv_id, session start/end, turn
    count. Watermark bounds state: sessions older than (watermark) past
    the max event time are finalized and evicted.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
            "first_turn",
            "last_turn",
        )
    )


# Bumped whenever _TURN_STATE_SCHEMA changes shape; checkpoints written
# under a different version must be discarded (see module docstring).
TURN_STATE_VERSION = 2

_TURN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("last_tool", T.StringType()),
        # turn_idx of last_tool: chunk/batch arrival order is NOT turn
        # order, so "latest tool" must compare turn_idx across chunks
        T.StructField("last_tool_turn", T.LongType()),
    ]
)

_TURN_OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns_total", T.LongType()),
        T.StructField("last_tool", T.StringType()),
    ]
)


def _update_turns(
    key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n, last_tool, last_tool_turn = state.get
    else:
        n, last_tool, last_tool_turn = 0, None, None
    for pdf in batches:
        n += len(pdf)
        # a conversation can span multiple Arrow chunks in arbitrary
        # turn order — keep the tool of the MAX non-null-tool turn_idx
        # seen so far, not the last tool of the latest-arriving chunk
        withtool = pdf[pdf["tool"].notna()]
        if len(withtool):
            row = withtool.loc[withtool["turn_idx"].idxmax()]
            turn = int(row["turn_idx"])
            if last_tool_turn is None or turn > last_tool_turn:
                last_tool, last_tool_turn = row["tool"], turn
    state.update((n, last_tool, last_tool_turn))
    yield pd.DataFrame(
        {"conv_id": [conv_id], "n_turns_total": [n], "last_tool": [last_tool]}
    )


def stream_turn_counter(stream: DataFrame) -> DataFrame:
    """Running per-conversation turn count + latest non-null tool
    (streaming forward-fill state) via applyInPandasWithState."""
    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            _update_turns,
            outputStructType=_TURN_OUT_SCHEMA,
            stateStructType=_TURN_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
