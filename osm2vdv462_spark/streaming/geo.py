"""Streaming geospatial rollup: watermarked tile-density counts over a
stream of geotagged rows.

The batch half of the north star (tile_pyramid) rolls geotagged images
into per-cell counts; this is its Structured Streaming twin — the shape
a live ingest of geotagged images runs at 100 TB: readStream ->
JVM-side cell id (the exact Catalyst expression the codegen flagship
uses, zero Python crossings) -> withWatermark -> tumbling window x cell
count. State per (window, cell) is two longs; the watermark bounds the
state store, so the query runs indefinitely.

Correctness bar (same as every incremental operator here): draining the
stream with Trigger.AvailableNow must equal the batch groupBy on the
same data — gated by the DuckDB oracle of `streaming_tile_counts`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_tile_counts_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    res: int = 12,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming DF: (window_start, cell, n) — geotags derived from
    event_id by the oracle LCG (datagen.SQL_POINTS), cell id by the
    shared Catalyst tile expression."""
    from ..operators.jvm_pip import cell_expr

    stream = spark.readStream.schema(schema).parquet(source_dir)
    lon = F.lit(-0.25) + ((F.col("event_id") * 37 + 11) % 2000) / 4000.0
    lat = F.lit(-0.25) + ((F.col("event_id") * 73 + 29) % 2000) / 4000.0
    pts = stream.select("ts", cell_expr(lon, lat, res).alias("cell"))
    return (
        pts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "cell")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "cell", "n")
    )


def drain_available_now(
    df: DataFrame, out_dir: str, checkpoint_dir: str, timeout_s: int = 300
) -> None:
    """Hermetic drain: Trigger.AvailableNow, foreachBatch overwrite sink
    (same harness as streaming/events.run_available_now)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        df.writeStream.outputMode("complete")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def windowed_geofence_counts_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    nation_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming GEOFENCE rollup: a stream of geotagged rows inner-
    joined STREAM-STATIC against the stop-area octagon layer (the
    membership predicate as a broadcast theta join — pure Catalyst, no
    Python), then watermarked tumbling-window counts per polygon. The
    stream-static join is the live-enrichment shape (fences/dimensions
    are slowly changing and broadcastable; Spark re-resolves the static
    side per micro-batch); state is again two longs per
    (window, fence). With a fact-sized fence layer the broadcast
    becomes the cell-index candidate join — same downstream."""
    from ..pipeline.datagen import GRID_LAT0, GRID_LON0, GRID_STEP, OCT_A, OCT_B

    static = (
        spark.read.parquet(nation_path)
        .select(
            F.col("n_nationkey").cast("int").alias("relation_id"),
            (F.lit(GRID_LON0) + GRID_STEP * (F.col("n_nationkey") % 5)).alias(
                "cx"
            ),
            (
                F.lit(GRID_LAT0)
                + GRID_STEP * F.floor(F.col("n_nationkey") / 5)
            ).alias("cy"),
        )
    )
    stream = spark.readStream.schema(schema).parquet(source_dir)
    lon = F.lit(-0.25) + ((F.col("event_id") * 37 + 11) % 2000) / 4000.0
    lat = F.lit(-0.25) + ((F.col("event_id") * 73 + 29) % 2000) / 4000.0
    pts = stream.select("ts", lon.alias("lon"), lat.alias("lat"))
    dx = F.abs(F.col("lon") - F.col("cx"))
    dy = F.abs(F.col("lat") - F.col("cy"))
    j = pts.join(
        F.broadcast(static),
        (dx < OCT_A) & (dy < OCT_A) & (dx + dy < OCT_B),
    )
    return (
        j.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "relation_id")
        .count()
        .select(
            F.col("window.start").alias("window_start"),
            "relation_id",
            F.col("count").alias("n"),
        )
    )
