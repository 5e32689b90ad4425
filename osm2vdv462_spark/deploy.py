"""Executor deployment: ship this package to Python workers.

Local-mode equivalent of ``spark-submit --py-files`` (the north-rule launch
mode): workers launched from any cwd must be able to unpickle our pandas
UDFs, which reference ``osm2vdv462_spark.*`` modules.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_shipped(spark: SparkSession) -> None:
    # session confs the engine's plans rely on, set at runtime so they
    # hold under ANY caller's SparkSession (e.g. the grading driver's):
    # jsonb_concat right-wins semantics for map_concat (ref
    # stop_places.sql:935-939)
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    # timestamp literals (pricing_summary's shipdate bound) must resolve in
    # the same zone the parquet fixtures were written in; DuckDB timestamps
    # are zone-naive so a non-UTC driver box would shift the boundary
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # HotSpot refuses to JIT-compile methods over 8 KB of bytecode
    # (DontCompileHugeMethods, on by default): a whole-stage-codegen
    # method past that line runs INTERPRETED — measured 8-20x on the
    # unrolled flagship (operators/jvm_pip.py). If this JVM wasn't
    # launched with the flag disabled (session.get_spark does that;
    # spark.executor.extraJavaOptions on a real cluster), cap Spark's
    # own codegen limit at the same 8000 so oversized plans fall back to
    # per-expression compiled code (JIT-able) instead of a giant
    # never-compiled method.
    try:
        jvm_opts = spark.conf.get("spark.driver.extraJavaOptions", "") or ""
        if "-XX:-DontCompileHugeMethods" not in jvm_opts:
            spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    except Exception:
        pass
    # Arrow batches must be bounded by BYTES, not records: the image /
    # video / audio tables carry KB-scale binary rows, and at sf1 the
    # default 10000-record batches reach ~20-40 MB each — with 32
    # concurrent tasks the JVM-side transfer buffers exceeded a plain
    # session's 1g direct-memory cap and killed the JVM
    # (BENCH/sf1_round5.json first pass, arrow OutOfMemoryException in
    # the image_integrity stage). 8 MB x 32 tasks x a-few-in-flight
    # stays comfortably under 1g; numeric rows (~24 B) never hit the
    # bytes cap, so the record cap still governs the fast paths.
    spark.conf.set(
        "spark.sql.execution.arrow.maxBytesPerBatch", str(8 * 1024 * 1024)
    )
    spark.conf.set(
        "spark.sql.execution.arrow.maxBytesPerOutputBatch",
        str(8 * 1024 * 1024),
    )
    # a 200-partition shuffle default is pathological for the engine's
    # many small dimension-side stages (and for a default 1g driver heap
    # in local mode); only override when the caller left the default
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", "64")
    except Exception:
        pass
    # applicationId is unique per context; id() can be reused after a stopped
    # context is garbage-collected (bench.py recreates sessions in-process)
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    spark.sparkContext.addPyFile(build_zip())
    _SHIPPED.add(key)


def binary_stage_parallelism(spark: SparkSession, mult: int = 2) -> int:
    """Partition count for binary-heavy Arrow stages (image / audio /
    video codec mapInPandas), capped by the JVM's DIRECT-memory budget.

    mult stays 2: a round-6 sequential sweep suggested mult=4 (128
    partitions) was ~15% faster on image_integrity, but a drift-
    cancelling INTERLEAVED A/B (64/128 alternating in one session)
    showed 64 consistently ahead on both the mixed and PNG-only rows —
    the earlier reading was page-fault-weather confounding, not task
    overlap (BENCH/BASELINE.md box pathology).

    Arrow's netty allocation manager services every JVM<->Python
    crossing from pooled 16 MiB arena chunks, so a running decode task
    holds ~32-64 MiB of direct memory REGARDLESS of Arrow batch size
    (two stacked crossings x up to two chunks each; measured on the
    sf1 image_integrity incident, BENCH/sf1_round5.json first pass —
    32 concurrent tasks ~= 1 GiB and the default direct cap of a plain
    1 GiB-heap session is 1 GiB, so the JVM died with
    arrow OutOfMemoryException). The unsafe exact-size allocation
    manager is not on Spark's classpath (arrow-memory-netty only), so
    the deployable control is CONCURRENCY: cap the stage's partition
    count so concurrent crossings fit the budget netty itself reports.
    LOCAL MODE ONLY: there the driver JVM *is* the executor, so its
    direct budget bounds concurrent crossings and the stage's
    partition count is the concurrency knob. On a real cluster the
    probe below would read the DRIVER's direct memory while the
    crossings run on executors, and a stage-wide partition cap would
    throttle the whole cluster to one JVM's budget — per-executor
    crossing concurrency is already bounded by spark.executor.cores
    there, and the direct budget is a deployment number
    (memoryOverhead; see README "Deploying at 100 TB").
    """
    par = spark.sparkContext.defaultParallelism * mult
    if not spark.sparkContext.master.startswith("local"):
        return par
    try:
        max_direct = int(
            spark._jvm.io.netty.util.internal.PlatformDependent.maxDirectMemory()
        )
    except Exception:
        return par
    if max_direct <= 0:
        return par
    per_task = 64 << 20  # two crossings x two 16 MiB arena chunks
    reserve = 256 << 20  # Spark RPC / shuffle netty pools share the cap
    cap = max(4, (max_direct - reserve) // per_task)
    return min(par, int(cap))


def build_zip(zpath: str | None = None) -> str:
    """Zip this package for ``--py-files`` (the artifact the north-rule
    launch line ships; also what ensure_shipped adds in local mode)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_dir)
    if zpath is None:
        fd, zpath = tempfile.mkstemp(
            prefix="osm2vdv462_spark_", suffix=".zip"
        )
        os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo_root))
    return zpath
