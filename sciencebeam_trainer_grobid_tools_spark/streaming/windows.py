"""Streaming window operators (SURVEY §2.9; north-star streaming surface).

Two canonical shapes over the ``events`` stream:

- :func:`stream_hourly_rollup` — the streaming twin of the batch
  ``event_hourly_rollup`` query: event-time tumbling window + watermark, so
  late events within the allowed lateness still land in their hour and
  older state is dropped instead of accumulating forever (the unbounded-
  state failure mode at corpus scale).
- :func:`stream_sessionize` — custom stateful sessionization via
  ``applyInPandasWithState``: per-user session counting with a gap rule,
  state carried across micro-batches.  This is the engine's template for
  operators Structured Streaming lacks natively.

Both return streaming DataFrames; callers attach the sink/trigger.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def stream_hourly_rollup(
    events: DataFrame,
    watermark: str = "2 hours",
    window_size: str = "1 hour",
) -> DataFrame:
    """Event-time tumbling rollup with late-data tolerance.

    The watermark bounds state: windows older than (max event time -
    watermark) finalize and evict.  Output schema matches the batch
    ``event_hourly_rollup`` (hour, event_type, n, total_value).
    """
    # watermarks require TIMESTAMP (with timezone); parquet written as
    # TIMESTAMP_NTZ is reinterpreted (session timezone is UTC in tests)
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_epoch", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def stream_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Per-user session counting with a gap rule, state across micro-batches.

    Semantics match the batch ``event_sessionization`` query: a new session
    starts when the gap to the previous event exceeds ``gap_seconds``.
    Emits the running (n_sessions, n_events) per user on every update
    (update output mode); the final update per user equals the batch
    result once the stream drains.
    """
    import pandas as pd

    def update(
        key: Tuple[int], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.exists:
            last_epoch, n_sessions, n_events = state.get
        else:
            last_epoch, n_sessions, n_events = None, 0, 0
        epochs = []
        for pdf in pdfs:
            epochs.extend(int(v) for v in pdf["ts"].astype("int64") // 10**9)
        epochs.sort()
        for epoch in epochs:
            if last_epoch is None or epoch - last_epoch > gap_seconds:
                n_sessions += 1
            n_events += 1
            last_epoch = epoch
        state.update((last_epoch, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
                "last_ts": [pd.Timestamp(last_epoch, unit="s")],
            }
        )

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_first_seen(
    pages: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    watermark: str = "24 hours",
    observe: bool = True,
    metrics_prefix: str = "first_seen",
) -> DataFrame:
    """Streaming first-seen filter — the crawl-ingest dedup shape: a
    stream of (url, warc_ts, ...) page rows keeps only each key's first
    arrival, so recrawls within the watermark horizon drop before any
    downstream parse/annotate compute is spent on them.

    ``dropDuplicatesWithinWatermark`` bounds the seen-set state by the
    watermark (the unbounded-dedup-state failure mode at corpus scale:
    a naive ``dropDuplicates`` on a 10^12-URL stream keeps every key
    forever; here keys age out once the event-time watermark passes
    them, which matches crawl semantics — a recrawl AFTER the horizon
    is a legitimate new snapshot that legitimately RE-ENTERS the
    stream — pinned by the expiry-readmission test; note eviction runs
    against the batch-START watermark, so a key re-enters one
    micro-batch after its horizon passes, not in the same batch — and
    the batch keep-latest recrawl dedup in ``operators/urlnorm.py``
    reconciles those downstream).  With micro-batches arriving in event-time order
    the survivor per key is the earliest-timestamp row (pinned by the
    batch-equivalence test).

    ``observe=True`` (default) attaches ``Observation`` metrics on both
    sides of the dedup — ``{prefix}_in.rows_in`` and
    ``{prefix}_out.rows_out`` land in every micro-batch's
    ``StreamingQueryProgress.observedMetrics``, so the per-batch
    dropped-duplicate count is ``rows_in - rows_out`` with zero extra
    jobs (observations are accumulator-backed).  Give each
    ``stream_first_seen`` in a multi-dedup query its own
    ``metrics_prefix`` — observation names must be unique per query."""
    src = pages.withWatermark(ts_col, watermark)
    if observe:
        src = src.observe(
            "%s_in" % metrics_prefix, F.count(F.lit(1)).alias("rows_in")
        )
    out = src.dropDuplicatesWithinWatermark([key_col])
    if observe:
        out = out.observe(
            "%s_out" % metrics_prefix, F.count(F.lit(1)).alias("rows_out")
        )
    return out
