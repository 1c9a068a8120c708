"""Stateful streaming sessionization (SURVEY §2.11 — custom stateful
operator surface).

`sessionize_stream` groups an event stream by user and maintains one
arbitrary-state session per user via ``applyInPandasWithState``:

* events separated by more than ``gap_sec`` close the previous session
  and open a new one (same 30-minute-gap semantics as the batch
  ``user_sessions`` workload, workloads/timeseries.py:85);
* a closed session is emitted as ``(user_id, session_start, session_end,
  n_events)``;
* the still-open tail session lives in the state store and closes when
  the event-time watermark passes ``last_ts + gap_sec`` (EventTimeTimeout)
  — watermark + timeout bound state size at scale, exactly the
  Structured Streaming pattern for custom session windows.

The batch twin is the oracle: on a static corpus, closed-stream sessions
∪ state-resident open sessions must equal the gap-split sessions a batch
window/lag computes (pinned in tests/test_streaming_sessionize.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

#: (session_start_us, last_ts_us, n_events) for the one open session
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", IntegerType()),
    ]
)

_US = 1_000_000


def _sessionizer(gap_sec: int):
    gap_us = gap_sec * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session is closed
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        # normalize to int64 microseconds regardless of the pandas
        # datetime resolution Arrow hands over (ns in older stacks)
        ts_all = (
            pd.concat([pdf["ts"] for pdf in pdfs])
            .sort_values()
            .astype("datetime64[ns]")
            .astype("int64")
            // 1000
        )
        for ts_us in ts_all:
            ts_us = int(ts_us)
            if start_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = ts_us, ts_us, 1
            else:
                last_us, n = ts_us, n + 1
        state.update((start_us, last_us, n))
        # close the open session once event time passes last_ts + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_sec * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    *,
    gap_sec: int = 1800,
    watermark: str = "1 hour",
    path_glob: str | None = None,
) -> DataFrame:
    """readStream(events parquet) → watermark → groupBy(user_id) →
    ``applyInPandasWithState`` gap-sessionizer. Returns the streaming
    DataFrame of CLOSED sessions (append mode). ``path_glob`` selects a
    file subset when ``events_dir`` holds other tables (the file source
    requires a directory path)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 16)
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.parquet(events_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionizer(gap_sec),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize_once(
    spark: SparkSession,
    events_dir: str,
    *,
    gap_sec: int = 1800,
    watermark: str = "1 second",
    path_glob: str | None = None,
    query_name: str = "sessions_closed",
) -> DataFrame:
    """Drive the sessionizer over everything currently in ``events_dir``
    and return the closed sessions as a batch DataFrame (memory sink)."""
    out = sessionize_stream(
        spark, events_dir, gap_sec=gap_sec, watermark=watermark, path_glob=path_glob
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
