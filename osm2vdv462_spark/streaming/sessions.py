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
    ArrayType,
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
        StructField("starts_us", ArrayType(LongType())),
        StructField("lasts_us", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
    ]
)

# State holds every not-yet-watermark-closed island, so stragglers can
# merge into (and bridge) earlier islands instead of emitting as
# singletons (ADVICE r3). Pathological floods of disjoint stragglers
# are bounded: beyond this many open islands the oldest are emitted
# early (they can then no longer merge — the pre-r4 behavior, but only
# under a flood instead of always).
MAX_OPEN_ISLANDS = 32


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    gap_minutes: int = 360,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming sessionizer. State per user: EVERY island (session
    candidate) the watermark has not yet sealed, sorted by start — not
    just the newest one. Watermark-admitted stragglers therefore merge
    into (or bridge between) earlier islands exactly as batch
    gaps-and-islands would (ADVICE r3: two stragglers within gap of
    each other must form ONE session, and an in-between event must
    fuse the islands it bridges). An island is emitted precisely when
    the watermark passes island_end + gap — at which point no
    admissible event can extend it, so the output is append-only,
    duplicate-free, and equal to the batch sessions whose close time
    the final watermark passed."""
    import datetime as _dt

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_s = gap_minutes * 60

    def _fn(key, pdfs, state):
        user_id = int(key[0])
        gap_us = gap_s * 1_000_000
        wm_us = state.getCurrentWatermarkMs() * 1000

        islands: list[list[int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            islands = sorted([s, l, n] for s, l, n in zip(starts, lasts, ns))

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
            for t in ts_us:
                t = int(t)
                host = None
                for isl in islands:
                    if isl[0] - gap_us <= t <= isl[1] + gap_us:
                        isl[0] = min(isl[0], t)
                        isl[1] = max(isl[1], t)
                        isl[2] += 1
                        host = isl
                        break
                if host is None:
                    islands.append([t, t, 1])
                    islands.sort()
                else:
                    # the grown island may now bridge its neighbors
                    islands.sort()
                    merged = [islands[0]]
                    for isl in islands[1:]:
                        if isl[0] - merged[-1][1] <= gap_us:
                            merged[-1][1] = max(merged[-1][1], isl[1])
                            merged[-1][2] += isl[2]
                        else:
                            merged.append(isl)
                    islands = merged

        ripe = [i for i in islands if i[1] + gap_us <= wm_us]
        live = [i for i in islands if i[1] + gap_us > wm_us]
        if len(live) > MAX_OPEN_ISLANDS:  # bound state under a flood
            ripe += live[: len(live) - MAX_OPEN_ISLANDS]
            live = live[len(live) - MAX_OPEN_ISLANDS :]
        if live:
            state.update(
                (
                    [i[0] for i in live],
                    [i[1] for i in live],
                    [i[2] for i in live],
                )
            )
            # fire when the OLDEST live island seals (strictly above the
            # current watermark by construction of `live`)
            state.setTimeoutTimestamp(live[0][1] // 1000 + gap_s * 1000)
        else:
            state.remove()
        if ripe:
            ripe.sort()
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(ripe),
                    "session_start": [
                        _dt.datetime.utcfromtimestamp(i[0] / 1e6) for i in ripe
                    ],
                    "session_end": [
                        _dt.datetime.utcfromtimestamp(i[1] / 1e6) for i in ripe
                    ],
                    "n_events": [i[2] for i in ripe],
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
