"""Streaming event aggregation: watermarked tumbling-window counts.

readStream(parquet) -> withWatermark -> window agg -> writeStream.
Tested with Trigger.AvailableNow against the exact batch equivalent
(streaming results must equal the batch groupBy on the same data — the
correctness bar for any incremental operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_event_counts_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming DF: (window_start, window_end, event_type, n, total_value)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def windowed_event_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The exact batch semantics the stream must converge to."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_available_now(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drain the source with Trigger.AvailableNow into parquet (complete
    mode not supported for file sinks -> use update-less 'append' via
    watermark close; for hermetic tests we use foreachBatch overwrite)."""
    df = windowed_event_counts_stream(spark, source_dir, schema, window, watermark)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        df.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def hopping_event_counts_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) window variant: every event lands in
    window/slide overlapping windows — the F.window(slideDuration)
    fan-out under streaming state. (window_start, n_events,
    value_cents); exact integer cents so the batch twin hash-gates."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "value_cents",
        )
    )
