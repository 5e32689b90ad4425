"""Stream-stream interval join: clicks matched to the 10-minute window
after each error, per user — the STREAMING twin of the batch
range_join_windows operator (queries/temporal_queries.py).

readStream -> two watermarked filters of the same source -> inner join
with an event-time range condition -> append sink. The range condition
plus both watermarks bound the join state Spark must retain (clicks
older than error-watermark + 10 min are evicted), which is what makes a
stream-stream join runnable forever at 100 TB/day: state is a sliding
window, not the whole history. Inner-join pairs are emitted as soon as
both sides arrive (append mode needs no window close for inner joins).

Correctness bar (same as streaming/events.py): the drained stream must
equal the exact batch semantics; gated through the driver oracle
(`streaming_interval_join`) and a multi-microbatch pytest where the
click arrives a batch AFTER its error (state retention across batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def interval_join_pairs_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    gap: str = "10 minutes",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DF of (error_id, click_id) interval-join pairs."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)
    err = (
        src.filter(F.col("event_type") == "error")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("ets"),
        )
    )
    clk = (
        src.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("cts"),
        )
    )
    return err.join(
        clk,
        F.expr(
            "c_user = e_user AND cts >= ets"
            f" AND cts < ets + INTERVAL {gap}"
        ),
        "inner",
    ).select("error_id", "click_id")


def interval_join_pairs_batch(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """The exact batch semantics the stream must converge to."""
    err = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("ets"),
    )
    clk = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    return err.join(
        clk,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("cts") >= F.col("ets"))
        & (F.col("cts") < F.col("ets") + F.expr(f"INTERVAL {gap}")),
        "inner",
    ).select("error_id", "click_id")


def run_available_now(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "10 minutes",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain the source with Trigger.AvailableNow, appending finalized
    pairs per microbatch (inner stream-stream joins emit in append mode
    without waiting for watermark close)."""
    df = interval_join_pairs_stream(
        spark, source_dir, schema, gap, watermark, max_files_per_trigger
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
