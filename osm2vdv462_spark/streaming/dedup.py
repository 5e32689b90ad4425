"""Streaming exact dedup: incremental content-hash dedup over a
document stream.

The training-data-pipeline shape: documents arrive continuously; the
engine maintains per-content-hash state (canonical = min doc_id, copy
count) and emits the deduped view incrementally. State is keyed by the
16-byte md5 — bounded by the number of DISTINCT documents, not the
stream length — and the aggregation is a streaming groupBy, so Spark
keeps partial aggregates per shuffle partition (map-side combine
applies batch-side before state updates).

A row-emitting ``dropDuplicates`` variant exists in Spark, but which
physical row it keeps is batch-order-dependent; the aggregate form
(min doc_id) is deterministic, which is what lets the driver gate
value-hash it. Stream==batch convergence is tested in
tests/test_streaming.py; the DuckDB oracle checks the batch semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def dedup_stream(
    spark: SparkSession, source_dir: str, schema: str = DOC_SCHEMA
) -> DataFrame:
    """Streaming DF: (content_md5, canonical_doc_id, n_copies)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.select(F.md5("text").alias("content_md5"), "doc_id")
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def dedup_batch(docs: DataFrame) -> DataFrame:
    """The exact batch semantics the stream must converge to."""
    return (
        docs.select(F.md5("text").alias("content_md5"), "doc_id")
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def run_available_now(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = DOC_SCHEMA,
) -> None:
    """Drain the source with Trigger.AvailableNow; complete-mode
    foreachBatch overwrite (hermetic, same pattern as streaming/events)."""
    df = dedup_stream(spark, source_dir, schema)

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
