"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[N]`` but every knob is chosen as it would be on a
1000-executor cluster: AQE on (runtime skew-join splitting + partition
coalescing), Arrow for all pandas-UDF exchange, sane shuffle partition count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "osm2vdv462_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    ``shuffle_partitions`` defaults to 2x cores locally; on a real cluster
    you'd size this to total executor cores * 2-3.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "65536"),
        )
        # bytes-bounded Arrow batches: binary-heavy rows (images/video/
        # audio) must not ride the record cap into multi-GB JVM transfer
        # buffers (see deploy.ensure_shipped for the sf1 incident)
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            str(8 * 1024 * 1024),
        )
        .config(
            "spark.sql.execution.arrow.maxBytesPerOutputBatch",
            str(8 * 1024 * 1024),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # jsonb_concat semantics: right operand wins on duplicate keys
        # (ref stop_places.sql:935-939 jsonb_combine) — map_concat must
        # not throw on dup keys
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # size JVM thread pools for the PINNED core count, not the
        # machine's (GC/safepoint storms otherwise when taskset-pinned).
        # -XX:-DontCompileHugeMethods: whole-stage-codegen methods for
        # wide unrolled expressions (operators/jvm_pip.py) can exceed
        # HotSpot's 8 KB bytecode compile cutoff — without the flag they
        # run INTERPRETED forever (measured 8-20x on the flagship). On a
        # real cluster this goes in spark.executor.extraJavaOptions; for
        # arbitrary sessions without it, deploy.ensure_shipped caps
        # spark.sql.codegen.hugeMethodLimit instead (JIT-able fallback).
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_JVM_OPTS",
                f"-XX:ActiveProcessorCount={cores} "
                f"-XX:ParallelGCThreads={max(cores // 2, 2)} "
                f"-XX:ConcGCThreads={max(cores // 4, 1)} "
                "-XX:-DontCompileHugeMethods",
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    from .deploy import ensure_shipped

    ensure_shipped(spark)
    return spark
