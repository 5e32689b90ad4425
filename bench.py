#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Default: run headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: run the flagship PIP+kNN job at local[8] and local[32] on the
same input and report throughput at both + scaling efficiency (the
BASELINE.json north-rule two-cluster-size criterion, evidenced via
parallelism levels per the driver instruction). Results also appended to
BENCH/BASELINE.md by tools/update_bench_md.py.
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "pip_assign",
    "pip_density",
    "pip_assign_shuffle",
    "knn_nearest_quay",
    "knn_top3",
    "membership_join",
    "pricing_summary",
    "top1_per_group",
    "dedup_exact",
    "embedding_top1",
]


def _force(df) -> int:
    """Fully evaluate a DataFrame (noop sink evaluates every column —
    count() alone could prune work)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from osm2vdv462_spark import queries as q

    qs = q.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def flagship_throughput(spark, sf_dir: str) -> tuple[float, int]:
    """Geotagged-points/sec through the two-phase PIP join + kNN top-1
    (the BASELINE.json metric). Returns (points_per_sec, n_points)."""
    from osm2vdv462_spark.operators.knn import knn_join_broadcast
    from osm2vdv462_spark.operators.spatial_join import pip_join_broadcast
    from osm2vdv462_spark.pipeline import datagen

    pts = datagen.geo_points(spark, sf_dir)
    n_points = pts.count()
    polys = datagen.stop_area_octagons(spark, sf_dir)
    quays = datagen.quay_sites(spark, sf_dir)
    t0 = time.perf_counter()
    assigned = pip_join_broadcast(
        pts, polys, point_keep=["event_id"], poly_id="relation_id",
        poly_wkb="geom", res=12,
    )
    nearest = knn_join_broadcast(
        pts, quays, point_keep=["event_id"], target_id="quay_id",
        k=1, res=8, max_rings=3,
    )
    _force(assigned.join(nearest, "event_id"))
    dt = time.perf_counter() - t0
    return n_points / dt, n_points


def _fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from osm2vdv462_spark.session import get_spark

    return get_spark(f"bench-{cores}", cores=cores)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    if "--scaling" in sys.argv:
        result = {}
        for cores in (8, 32):
            spark = _fresh_spark(cores)
            flagship_throughput(spark, sf_dir)  # warm-up (JIT, arrow init)
            tp, n = flagship_throughput(spark, sf_dir)
            result[f"local[{cores}]"] = {"points_per_sec": round(tp, 1), "n_points": n}
            spark.stop()
        eff = result["local[32]"]["points_per_sec"] / (
            4.0 * result["local[8]"]["points_per_sec"]
        )
        result["scaling_efficiency_8_to_32"] = round(eff, 3)
        print(json.dumps(result))
        return

    spark = _fresh_spark(cpus)
    # warm-up: tiny end-to-end pass so JIT/Arrow setup isn't billed to q1
    flagship_throughput(spark, "/root/testdata/sf0.001")
    t_total0 = time.perf_counter()
    queries = run_queries(spark, sf_dir)
    total = round(time.perf_counter() - t_total0, 3)
    tp, n_points = flagship_throughput(spark, sf_dir)
    print(
        json.dumps(
            {
                "metric": "geotagged-images/sec through H3-style PIP + kNN join"
                " (headline suite total in value)",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "flagship_points_per_sec": round(tp, 1),
                "flagship_n_points": n_points,
                "cores": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
