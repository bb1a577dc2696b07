"""Custom stateful streaming operator: event sessionization.

The reference has no stateful streaming (its state lives in PostgreSQL
between cron runs), but SURVEY.md §2.9 maps its accumulate-between-runs
behavior to Structured Streaming state. This is the
``applyInPandasWithState`` shape: per-user session windows with an
inactivity gap — a session closes when no event arrives for
``gap_minutes`` (event time), emitting (user_id, session_start,
session_end, n_events, total_value).

State = one open session per user; Arrow moves each user's batch rows
into Python; the timeout uses event-time watermarks so late events
within the watermark extend their session.

A batch-mode reference implementation (``sessionize_batch``) computes
identical sessions with a window function (lag + cumulative sum of
gap-breaks) — it is both the correctness oracle for the stateful op in
tests and the backfill path at rest.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from etl_database_spark.timeutil import normalize_event_time

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start timestamp, last timestamp, n long, total double"


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a new session starts where the gap from
    the previous event (per user) exceeds the threshold — lag + running
    sum of break flags, then one aggregate per (user, session)."""
    events = normalize_event_time(events, ["ts"])
    w = W.partitionBy("user_id").orderBy("ts")
    # microsecond-exact gap arithmetic (integer, engine-portable)
    gap_us = F.lit(gap_minutes * 60 * 1_000_000)
    flagged = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev_ts") > gap_us)
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Stateful streaming sessionization via applyInPandasWithState.

    Sessions emit on inactivity timeout (event-time, watermark-driven).
    """
    events = normalize_event_time(events, ["ts"])
    gap = dt.timedelta(minutes=gap_minutes)

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": start,
                        "session_end": last,
                        "n_events": n,
                        "total_value": total,
                    }
                ]
            )
            return
        rows = pd.concat(list(batches)).sort_values("ts")
        closed: list[dict[str, Any]] = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None  # type: ignore[assignment]
            n, total = 0, 0.0
        for _, r in rows.iterrows():
            ts, val = r["ts"], float(r["value"])
            if last is not None and (ts - last) > gap:
                closed.append(
                    {
                        "user_id": user_id,
                        "session_start": start,
                        "session_end": last,
                        "n_events": n,
                        "total_value": total,
                    }
                )
                start, n, total = ts, 0, 0.0
            if start is None:
                start = ts
            last, n, total = ts, n + 1, total + val
        state.update((start, last, n, total))
        # Arrow hands the UDF tz-naive wall times; .timestamp() on a
        # naive pandas Timestamp assumes UTC, which is only correct
        # because the engine pins spark.sql.session.timeZone to UTC
        # (session.py). Localize explicitly so the assumption is
        # visible and a future non-UTC session fails loudly here
        # rather than silently shifting timeouts.
        last_utc = last if last.tzinfo is not None else last.tz_localize("UTC")
        state.setTimeoutTimestamp(int(last_utc.timestamp() * 1000) + gap_minutes * 60_000)
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
