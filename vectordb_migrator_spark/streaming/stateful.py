"""Stateful streaming operators (X8 beyond foreachBatch): session
windows, in-stream dedup, and a custom arbitrary-state operator.

Scale notes:

- ``session_window`` / windowed aggs keep state per (key, open window)
  only until the watermark passes — state size is bounded by key
  cardinality × open-session count, not by stream length.
- ``dropDuplicatesWithinWatermark`` keeps one state row per id seen
  inside the watermark horizon — the streaming twin of X1 exact dedup
  (the batch groupBy can't run on an unbounded stream; watermark-TTL
  state is the standard trade: exact within the horizon).
- ``running_user_stats`` shows the arbitrary-state escape hatch
  (``applyInPandasWithState``) for operators neither windows nor
  built-in dedup express: per-key running aggregates that emit a row
  per micro-batch with cumulative values. State is one tuple per key;
  Arrow-batched per group — no row-at-a-time Python.

All three accept batch OR streaming DataFrames where Spark's unified
model allows (session_window works in both; the dedup and the
arbitrary-state op are streaming-only by Spark's contract).
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def session_window_stats(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session aggregation via ``F.session_window`` — the
    streaming-native twin of ``operators.relational.sessionize``
    (same sessions; this one also runs incrementally with bounded
    state when given a stream + watermark).

    Window semantics: ``[first_ts, last_ts + gap)``; an event exactly
    ``gap`` after the previous one MERGES into the session (a new
    session starts only when the gap is strictly exceeded) — the same
    boundary rule as the batch ``sessionize`` operator.
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup_by_id(
    stream: DataFrame,
    *,
    id_col: str = "id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-id emission within the watermark horizon —
    re-deliveries and replays of an id inside the horizon are dropped;
    state for an id is freed once the watermark passes its event time."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )


_RUNNING_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
_STATE_SCHEMA = "n long, total double, mx double"


def _running_stats_fn(
    key: Any, pdfs: Iterator, state: GroupState
) -> Iterator:
    """Cumulative per-key stats, carried across micro-batches."""
    import pandas as pd

    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def running_user_stats(stream: DataFrame, *, key_col: str = "user_id") -> DataFrame:
    """Custom arbitrary-state operator: cumulative (count, sum, max)
    per key, one output row per key per micro-batch. The pattern to
    copy for any stateful operator Spark lacks."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _running_stats_fn,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _RunningStatsProcessor:
    """StatefulProcessor for :func:`running_user_stats_tws` — defined
    at module level so executor workers can unpickle it."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "running", _STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        prev = self._state.get() if self._state.exists() else None
        n, total, mx = prev if prev is not None else (0, 0.0, float("-inf"))
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        self._state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter(())

    def close(self) -> None:
        pass


def running_user_stats_tws(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    state_ttl: str | None = None,
) -> DataFrame:
    """Cumulative per-key stats via ``transformWithStateInPandas`` —
    the Spark 4 arbitrary-state API (SPARK-49121), successor to
    ``applyInPandasWithState``. Same output as
    :func:`running_user_stats`; what the new API adds is typed state
    variables (value/list/map per key rather than one tuple), state
    TTL (``state_ttl`` like ``'1 hour'`` — idle keys are evicted
    without hand-rolled timeout handling, THE knob that bounds state
    on high-cardinality key spaces), and timers for event/processing
    time callbacks.
    """
    from pyspark.sql.streaming import StatefulProcessor

    ttl_ms = None
    if state_ttl is not None:
        num, unit = state_ttl.split()
        ttl_ms = int(num) * {
            "millisecond": 1, "milliseconds": 1,
            "second": 1_000, "seconds": 1_000,
            "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000,
        }[unit]

    # subclass-at-call keeps the ABC import out of module import time
    proc = type(
        "RunningStatsProcessor",
        (_RunningStatsProcessor, StatefulProcessor),
        {},
    )(ttl_ms)
    return stream.groupBy(key_col).transformWithStateInPandas(
        proc,
        outputStructType=_RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if state_ttl else "None",
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream interval join: each left event pairs with right
    events of the same key whose timestamp falls in
    ``[left_ts - lookback, left_ts]`` — the attribution join
    (purchase ← recent clicks) as an incremental computation.

    Both sides carry watermarks so the join state is bounded: a right
    row is dropped from state once the watermark guarantees no future
    left row's lookback window can reach it. Works on batch frames
    too (Spark's unified model) — the time-range condition is the
    same; only state management differs.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = (
        right.withWatermark(right_ts, watermark)
        .select(
            F.col(key_col),
            F.col(right_ts).alias(right_prefix + right_ts),
            *[
                F.col(c).alias(right_prefix + c)
                for c in right.columns
                if c not in (key_col, right_ts)
            ],
        )
        .alias("r")
    )
    rts = right_prefix + right_ts
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(rts) <= F.col(f"l.{left_ts}"))
        & (
            F.col(rts)
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}")
        )
    )
    return lw.join(rw, cond).drop(F.col(f"r.{key_col}"))
