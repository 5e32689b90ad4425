#!/usr/bin/env python
"""Round-6 isolation benchmarks (bench.py is FROZEN; extra measurements
live here per the optimization brief).

Modes (all serialized, noop sink per guide §1.4, job-description
labelled):

  python bench_extra.py queries [name ...]   # per-query reps (default:
                                             # the 17 headline queries)
  python bench_extra.py interleave A B N     # drift-cancelling A/B of
                                             # binary-stage partition
                                             # counts on image_integrity
                                             # (the round-6 method that
                                             # overturned a sequential
                                             # sweep)
  python bench_extra.py fused-phases         # collect / build /
                                             # construct / exec split of
                                             # the codegen flagship
  python bench_extra.py doc-stages           # per-stage cold timing of
                                             # the document DAG
  python bench_extra.py health               # untouched pure-JVM s2
                                             # rate — the box-state
                                             # probe (healthy ~50M
                                             # cells/s, degraded ~21M)

$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _spark(cores: int):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from osm2vdv462_spark.session import get_spark

    return get_spark("bench-extra", cores=cores)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    spark = _spark(cores)
    import bench as B

    B.flagship_throughput(spark, "/root/testdata/sf0.001")  # warm-up
    from osm2vdv462_spark import queries as q

    qs = {**q.queries(), **q.extra_queries()}
    sc = spark.sparkContext

    if mode == "queries":
        names = sys.argv[2:] or B.HEADLINE
        out = {}
        for name in names:
            sc.setJobDescription(f"bench_extra:{name}")
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _force(qs[name](spark, sf_dir))
                ts.append(round(time.perf_counter() - t0, 3))
            out[name] = {"reps": ts, "median": sorted(ts)[1]}
            print(name, ts)
        print(json.dumps(out))

    elif mode == "interleave":
        from osm2vdv462_spark import deploy

        a, b = int(sys.argv[2]), int(sys.argv[3])
        n = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        orig = deploy.binary_stage_parallelism
        res = {a: [], b: []}
        for _ in range(n):
            for par in (a, b):
                deploy.binary_stage_parallelism = (
                    lambda s, mult=2, _p=par: _p
                )
                sc.setJobDescription(f"bench_extra:interleave par={par}")
                t0 = time.perf_counter()
                _force(qs["image_integrity"](spark, sf_dir))
                res[par].append(round(time.perf_counter() - t0, 2))
        deploy.binary_stage_parallelism = orig
        print(json.dumps(res))

    elif mode == "fused-phases":
        from pyspark.sql import functions as F

        from osm2vdv462_spark.operators import jvm_pip as jp
        from osm2vdv462_spark.operators._guard import collect_dim_cols
        from osm2vdv462_spark.pipeline import datagen

        for rep in range(3):
            t0 = time.perf_counter()
            pts = datagen.geo_points(spark, sf_dir)
            polys = datagen.stop_area_octagons(spark, sf_dir)
            quays = datagen.quay_sites(spark, sf_dir)
            t1 = time.perf_counter()
            collect_dim_cols(polys, ["relation_id", "geom"], "p")
            trows = collect_dim_cols(quays, ["quay_id", "lon", "lat"], "t")
            t2 = time.perf_counter()
            jp._auto_target_build(trows)
            t3 = time.perf_counter()
            df = jp.pip_knn_assign_codegen(
                pts, polys, quays, point_keep=["event_id"],
                poly_id="relation_id", target_id="quay_id", poly_res=12,
            ).select(
                "event_id",
                F.col("relation_id").cast("int").alias("relation_id"),
                "quay_id",
                F.round(F.col("dist_m"), 0).cast("long").alias(
                    "dist_m_round"
                ),
            )
            t4 = time.perf_counter()
            _force(df)
            t5 = time.perf_counter()
            print(
                f"rep{rep}: dims {t1-t0:.2f} collect {t2-t1:.2f}"
                f" autobuild {t3-t2:.2f} construct {t4-t3:.2f}"
                f" exec {t5-t4:.2f}"
            )

    elif mode == "doc-stages":
        t0 = time.perf_counter()
        _force(qs["netex_stop_places_xml"](spark, sf_dir))
        print(f"document cold {time.perf_counter()-t0:.2f} s (see"
              " queries/pipeline_queries.py for the stage chain; run"
              " the chain manually for per-stage splits)")

    elif mode == "health":
        r = B.s2_index_rate(spark, n=32_000_000)
        print(json.dumps({"s2_cells_per_sec": round(r, 1),
                          "note": "untouched pure-JVM codegen pass:"
                          " ~50M healthy, ~21M degraded (round-6"
                          " box-phase forensics)"}))

    spark.stop()


if __name__ == "__main__":
    main()
