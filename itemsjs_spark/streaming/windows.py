"""Streaming windowed aggregations over live transcript streams.

The snapshot-ingest pipeline (`streaming/__init__.py`) makes the INDEX
incremental; this module covers the other half of the Structured
Streaming surface: watermarked event-time aggregation for late data and
an `applyInPandasWithState` custom stateful operator — the primitives a
live transcript feed needs for monitoring (turns per window, live
sessions, running per-conversation state) while the same stream feeds
the index.

All three are declarative streaming plans: Spark's incremental
execution keeps per-window/per-session/per-group state in the state
store, watermarks bound that state (late rows beyond the watermark are
dropped, closed windows are evicted), and the sinks receive only
finalized (append) or changed (update) rows. At 10^12 turns/day the
state is windows × groups, never the stream itself.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_turn_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    time_col: str = "ts",
    group_col: str = "role",
) -> DataFrame:
    """Tumbling event-time window counts with a watermark: rows later
    than ``watermark`` behind the max seen event time are dropped and a
    window finalizes (appends) once the watermark passes its end. State
    = open windows × groups."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), group_col)
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_turns",
        )
    )


def session_turn_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    time_col: str = "ts",
    key_col: str = "conv_id",
) -> DataFrame:
    """Session windows (gap-based, the streaming twin of
    `ops/conversations.py::sessionize`): per conversation, turns that
    arrive within ``gap`` of each other merge into one session; the
    session closes and appends once the watermark passes its end."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("w"), key_col)
        .agg(F.count("*").alias("n_turns"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_turns",
        )
    )


_RUNNING_OUT = "conv_id string, total_turns bigint, last_role string"
_RUNNING_STATE = "total_turns bigint, last_role string"


def _running_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, last_role = state.get if state.exists else (0, "")
    for pdf in pdfs:
        if len(pdf):
            pdf = pdf.sort_values(["ts", "turn_idx"])
            total += len(pdf)
            last_role = str(pdf["role"].iloc[-1])
    state.update((total, last_role))
    yield pd.DataFrame(
        {"conv_id": [key[0]], "total_turns": [total], "last_role": [last_role]}
    )


def running_conversation_state(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    running per-conversation (turn count, last role) that updates on
    every micro-batch a conversation appears in — the Arrow-batched
    escape hatch for state machines the built-in windows can't express.
    State per group is two scalars; output mode 'update' emits only the
    touched conversations each batch."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _running_fn,
        outputStructType=_RUNNING_OUT,
        stateStructType=_RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_turn_stream(
    stream: DataFrame,
    keys: Tuple[str, ...] = ("conv_id", "turn_idx"),
    time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming ingest dedup for replayed deliveries (at-least-once
    feeds re-deliver turns; the index must see each once):
    ``dropDuplicatesWithinWatermark`` keeps the FIRST row per key and
    drops re-deliveries arriving within the watermark horizon of the
    first sighting. State = keys seen inside the horizon, evicted as
    the watermark advances — the bounded-state property a plain
    ``dropDuplicates`` lacks (it would retain every key of a 10^12-turn
    stream forever). Horizon semantics, not global: a key re-delivered
    far beyond the watermark is admitted again — pair with the
    snapshot-append path's idempotent epoch replay
    (`streaming/__init__.py`) for end-to-end exactly-once."""
    return stream.withWatermark(
        time_col, watermark
    ).dropDuplicatesWithinWatermark(list(keys))


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "conv_id",
    time_col: str = "ts",
    within: str = "5 minutes",
    watermark: str = "5 minutes",
    left_prefix: str = "req",
    right_prefix: str = "resp",
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join — the remaining Structured
    Streaming primitive (windows/sessions/state/dedup live above):
    correlate two live feeds (e.g. request turns with the tool results
    that answer them) on a shared key with a bounded time range —
    ``right.ts in [left.ts, left.ts + within]``.

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions, which is exactly what lets Spark evict
    state: a buffered left row can be dropped once the right watermark
    passes ``left.ts + within``, so state is the in-flight correlation
    window, never the streams. At 10^12 turns the state is
    (keys active within the horizon) — the same bound a hand-built
    correlator would need.

    Returns one row per correlated pair: (key, <lp>_ts, <rp>_ts,
    <lp>_text, <rp>_text, lag_seconds).
    """
    lp, rp = left_prefix, right_prefix
    lw = (
        left.withWatermark(time_col, watermark)
        .select(
            F.col(key_col).alias("__k"),
            F.col(time_col).alias(f"{lp}_ts"),
            F.col("text").alias(f"{lp}_text"),
        )
    )
    rw = (
        right.withWatermark(time_col, watermark)
        .select(
            F.col(key_col).alias("__rk"),
            F.col(time_col).alias(f"{rp}_ts"),
            F.col("text").alias(f"{rp}_text"),
        )
    )
    cond = (
        (F.col("__k") == F.col("__rk"))
        & (F.col(f"{rp}_ts") >= F.col(f"{lp}_ts"))
        & (F.col(f"{rp}_ts") <= F.col(f"{lp}_ts") + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").select(
        F.col("__k").alias(key_col),
        f"{lp}_ts", f"{rp}_ts", f"{lp}_text", f"{rp}_text",
        (
            F.unix_timestamp(f"{rp}_ts") - F.unix_timestamp(f"{lp}_ts")
        ).cast("long").alias("lag_seconds"),
    )
