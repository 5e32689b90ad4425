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
