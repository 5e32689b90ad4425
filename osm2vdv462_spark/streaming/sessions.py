"""Stateful streaming sessionization (applyInPandasWithState).

The custom-stateful-operator slot from the task brief: group events per
user, close a session when no event arrives within ``gap``; the stream
emits a session row once the WATERMARK passes session_end + gap (so the
result is append-only and deterministic under replay).

``sessionize_batch`` is the exact batch semantics (gaps-and-islands via
window functions) that (a) the driver gate checks against a DuckDB
oracle and (b) the streaming operator must converge to — the stream's
output equals the batch sessions whose close time the final watermark
passed (verified in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def sessionize_batch(events: DataFrame, gap_minutes: int = 360) -> DataFrame:
    """(user_id, session_start, session_end, n_events): consecutive
    events of a user belong to one session while the gap between
    neighbors is <= gap_minutes."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    # parquet timestamps read as TIMESTAMP_NTZ: hop via TIMESTAMP (session
    # zone is pinned UTC by deploy.ensure_shipped) to get epoch seconds
    epoch = F.col("ts").cast("timestamp").cast("long")
    brk = epoch - F.lag(epoch).over(w) > gap_s
    with_sess = events.select(
        "user_id", "ts", "event_id",
        F.sum(F.when(brk, 1).otherwise(0)).over(w).alias("sess"),
    )
    return (
        with_sess.groupBy("user_id", "sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("sess")
    )


def sessionize_oracle_sql(gap_minutes: int = 360) -> str:
    """DuckDB gaps-and-islands twin of sessionize_batch."""
    return f"""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))
                  > {gap_minutes * 60} THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS sess
          FROM o)
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sess
    ORDER BY user_id, session_start
    """


_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    gap_minutes: int = 360,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming sessionizer. State per user: (session_start, last_ts,
    n). New events extend or roll the session; the event-time timeout
    (watermark passing last_ts + gap) CLOSES a session and emits it —
    append-mode, exactly-once under checkpoint replay."""
    import datetime as _dt

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_s = gap_minutes * 60

    def _fn(key, pdfs, state):
        user_id = int(key[0])
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [
                        _dt.datetime.utcfromtimestamp(start_us / 1e6)
                    ],
                    "session_end": [
                        _dt.datetime.utcfromtimestamp(last_us / 1e6)
                    ],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
        out = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = 0, 0, 0
        gap_us = gap_s * 1_000_000
        for t in ts_us:
            t = int(t)
            if n == 0:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                out.append((user_id, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            elif start_us - t > gap_us:
                # watermark-admitted straggler older than the open
                # session by more than the gap: in batch gaps-and-islands
                # it is its own earlier island — emit it standalone (it
                # can never merge with the open session, and anything
                # older was already closed)
                out.append((user_id, t, t, 1))
            else:
                # in-gap event on either side of the open session:
                # extend the nearest boundary (start for stragglers that
                # predate session_start — the batch semantics)
                start_us = min(start_us, t)
                last_us = max(last_us, t)
                n += 1
        state.update((int(start_us), int(last_us), int(n)))
        state.setTimeoutTimestamp(last_us // 1000 + gap_s * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [
                        _dt.datetime.utcfromtimestamp(o[1] / 1e6) for o in out
                    ],
                    "session_end": [
                        _dt.datetime.utcfromtimestamp(o[2] / 1e6) for o in out
                    ],
                    "n_events": [o[3] for o in out],
                }
            )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _fn,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize_available_now(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 360,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> None:
    df = sessionize_stream(
        spark, source_dir, schema, gap_minutes, watermark, max_files_per_trigger
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        df.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
