"""Streaming HyperLogLog: approximate distinct counting per event-time
window under a watermark.

Why this is THE streaming form of distinct-count: exact streaming
distinct (streaming/dedup.py) must hold every seen key in state, so its
state grows with the stream; the HLL register aggregation holds at most
m=1024 (window, bucket) max-values per open window — bounded state
forever, the property that lets the query run at production rates
indefinitely. The register max is an associative/idempotent streaming
aggregate, so Spark's incremental execution IS the sketch merge — late
rows within the watermark just max into their register.

Same deterministic md5 register algebra as operators/sketches.py, so
the DuckDB batch twin reproduces the streamed estimates exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import sketches as sk


def hll_window_registers_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming DF: (window_start, hll_bucket, hll_reg) — the register
    table per tumbling window, state bounded at m rows per open window."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    items = stream.select(
        "ts",
        F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("props")).alias(
            "item"
        ),
    )
    rho = sk.hll_rho(items, "item")
    return (
        rho.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "hll_bucket")
        .agg(F.max("hll_rho").alias("hll_reg"))
        .select(F.col("w.start").alias("window_start"), "hll_bucket", "hll_reg")
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
    """Drain the source hermetically (Trigger.AvailableNow) and persist
    the register table; estimation is a tiny batch step over it."""
    df = hll_window_registers_stream(spark, source_dir, schema, window, watermark)

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


def estimate_windows(registers: DataFrame) -> DataFrame:
    """(window_start, hll_bucket, hll_reg) -> per-window estimates."""
    return sk.hll_estimate(registers, ["window_start"]).select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "hll_estimate",
    )
