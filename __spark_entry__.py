"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine: ``osm2vdv462_spark`` — see SURVEY.md §2 for the operator map.
"""

from __future__ import annotations

import os
import sys


from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)

def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the osm2vdv462_spark package to executors (the local-mode
    equivalent of ``spark-submit --py-files``). Without this, Python
    workers launched from a different cwd cannot unpickle our UDFs."""
    from osm2vdv462_spark.deploy import ensure_shipped

    ensure_shipped(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: H3-style two-phase PIP
    assignment of geotagged points to stop-area polygons, rolled up with
    the nearest-quay kNN match (the BASELINE.json north-star pair)."""
    from pyspark.sql import functions as F

    from osm2vdv462_spark.operators.jvm_pip import pip_knn_assign_codegen
    from osm2vdv462_spark.pipeline import datagen

    _ensure_shipped(spark)
    sf_dir = "/root/testdata/sf0.001"
    pts = datagen.geo_points(spark, sf_dir)
    polys = datagen.stop_area_octagons(spark, sf_dir)
    quays = datagen.quay_sites(spark, sf_dir)

    # fused single-pass PIP + kNN on the whole-stage-codegen plan
    # (operators/jvm_pip.py): the point table is scanned exactly once,
    # map-side only, zero Python crossings — the 10^12-row plan shape
    # (the Arrow/numpy variant lives in operators/fused.py and is gated
    # by the same oracles via fused_assign_jvm/_codegen)
    out = pip_knn_assign_codegen(
        pts,
        polys,
        quays,
        point_keep=["event_id"],
        poly_id="relation_id",
        target_id="quay_id",
        poly_res=12,  # target_res auto-sized from target density
    )
    return (
        out.filter(F.col("relation_id").isNotNull())
        .select(
            "event_id",
            "relation_id",
            "quay_id",
            F.round("dist_m", 0).cast("long").alias("dist_m_round"),
        )
        .orderBy("event_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from osm2vdv462_spark import queries as q

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in q.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query."""
    from osm2vdv462_spark import queries as q

    return q.oracle_sql()
