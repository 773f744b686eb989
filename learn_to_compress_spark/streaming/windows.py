"""Streaming analytics over the transcript stream: watermarked windowed
aggregation and a custom stateful operator.

The reference implements no streaming constructs (SURVEY.md §2.4); these are
the engine's Spark-native extensions for the live side of the pipeline —
monitoring ingest (turns/conversations per time window, late-data tolerant)
and per-conversation running state (the stateful shape a drift detector or
session assembler would use). Both run on the same ``(conv_id, turn_idx,
role, text, tool, ts)`` stream the encode job ingests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def turns_per_window(
    stream_df: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation over the turn stream:
    (window, n_turns, n_convs). Late rows beyond ``watermark`` are dropped by
    Spark's state store — the canonical late-data handling shape."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(win.alias("window"))
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
        )
    )


def turns_per_window_batch(
    df: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    conv_col: str = "conv_id",
) -> DataFrame:
    """Batch twin of :func:`turns_per_window` (same ``F.window`` plan minus
    the watermark, EXACT distinct count instead of HLL): the correctness
    surface the driver oracles — ``time_bucket``-equivalent windows are
    ANSI-SQL checkable, and the streaming test asserts stream == batch.
    Output: (window_start, n_turns, n_convs)."""
    return (
        df.groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count("*").alias("n_turns"),
            F.count_distinct(conv_col).alias("n_convs"),
        )
        .select(F.col("w.start").alias("window_start"), "n_turns", "n_convs")
    )


def conversation_progress_batch(
    df: DataFrame, conv_col: str = "conv_id", ts_col: str = "ts"
) -> DataFrame:
    """Batch twin of the stateful :func:`conversation_progress`: the final
    per-conversation state (row count + latest timestamp) as a plain
    aggregate — what the state store converges to once the stream drains.
    Output: (conv_id-named col, n_turns, max_ts)."""
    return df.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"), F.max(ts_col).alias("max_ts")
    )


CONV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("last_role", T.StringType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("last_role", T.StringType()),
    ]
)


def conversation_progress(stream_df: DataFrame, idle_timeout_ms: int = 600_000) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): running
    per-conversation progress — turn count, max turn index, last role —
    emitting a final ``closed=true`` row when a conversation goes idle past
    ``idle_timeout_ms`` (processing-time timeout). The state is O(1) per
    conversation; Spark shards it by the group key, so 10^9 live
    conversations spread across the cluster's state stores."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n, mx, last = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "conv_id": conv_id,
                        "n_turns": n,
                        "max_turn_idx": mx,
                        "last_role": last,
                        "closed": True,
                    }
                ]
            )
            return
        n, mx, last = state.get if state.exists else (0, -1, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            m = int(pdf["turn_idx"].max())
            if m > mx:
                mx = m
                last = str(pdf.loc[pdf["turn_idx"].idxmax(), "role"])
        state.update((n, mx, last))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "n_turns": n,
                    "max_turn_idx": mx,
                    "last_role": last,
                    "closed": False,
                }
            ]
        )

    return (
        stream_df.select("conv_id", "turn_idx", "role")
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=CONV_STATE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
