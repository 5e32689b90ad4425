"""spark-submit entrypoint: ``python -m osm2vdv462_spark <cmd> ...``.

The north rule launches the engine "via spark-submit --py-files on
multi-executor clusters"; this module is that entry body::

    zip -r osm2vdv462_spark.zip osm2vdv462_spark
    spark-submit --py-files osm2vdv462_spark.zip \
        -m osm2vdv462_spark imagepipe --workdir /data/run1 \
        --sf-dir s3://bucket/sf100 --submitted

With ``--submitted`` the session comes from the launcher's conf
(master/executors/memory are spark-submit's business); without it a
tuned local session is built (session.get_spark). Either way
deploy.ensure_shipped ships the package zip to Python workers, so the
same command line works from any cwd.

Subcommands map to the two checkpointed DAG runners plus the
table-maintenance verbs:

* ``pipeline``    OSM -> NeTEx document (synthetic world or a real
                  .osm.pbf extract), checkpoint/resume in --workdir
* ``imagepipe``   the image table DAG (verify / join rows / tiles),
                  checkpoint/resume in --workdir
* ``export-shards``  image table -> WebDataset tar pool
* ``refresh-tiles``  incremental materialized tile view (init or
                  advance from the source table's changelog)
* ``export-mvt``  stop-area polygons -> Mapbox Vector Tile pyramid
                  (one .mvt per tile, executor-written + manifest)

Every subcommand prints ONE JSON object on stdout (stats, paths,
row/byte metrics) so cluster schedulers can parse the outcome.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from pyspark.sql import SparkSession

    if args.submitted:
        spark = SparkSession.builder.getOrCreate()
    else:
        from .session import get_spark

        spark = get_spark("osm2vdv462_spark_cli", cores=args.local_cores)
    from .deploy import ensure_shipped

    ensure_shipped(spark)
    return spark


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="osm2vdv462_spark")
    p.add_argument("--submitted", action="store_true",
                   help="session comes from spark-submit's conf")
    p.add_argument("--local-cores", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("pipeline", help="OSM -> NeTEx, checkpointed")
    sp.add_argument("--workdir", required=True)
    sp.add_argument("--pbf", default=None, help="real .osm.pbf extract")
    sp.add_argument("--areas", type=int, default=4)
    sp.add_argument("--seed", type=int, default=42)

    ip = sub.add_parser("imagepipe", help="image DAG, checkpointed")
    ip.add_argument("--workdir", required=True)
    ip.add_argument("--sf-dir", required=True)
    ip.add_argument("--every", type=int, default=10)

    es = sub.add_parser("export-shards", help="image table -> tar pool")
    es.add_argument("--sf-dir", required=True)
    es.add_argument("--out", required=True)
    es.add_argument("--shards", type=int, default=64)
    es.add_argument("--every", type=int, default=1)

    rt = sub.add_parser("refresh-tiles", help="incremental tile view")
    rt.add_argument("--source", required=True, help="snaptable of images")
    rt.add_argument("--view", required=True)
    rt.add_argument("--init", action="store_true",
                    help="full (re)compute instead of incremental")

    mv = sub.add_parser("export-mvt", help="polygon layer -> .mvt tiles")
    mv.add_argument("--sf-dir", required=True)
    mv.add_argument("--out", required=True)
    mv.add_argument("--layer", default="stop_areas")

    args = p.parse_args(argv)
    spark = _spark(args)

    if args.cmd == "pipeline":
        from .pipeline.runner import run_full_pipeline

        r = run_full_pipeline(
            spark, args.workdir, n_areas=args.areas, seed=args.seed,
            pbf_path=args.pbf,
        )
        out = {"document": r["document"], "stages": r["stats"]}
    elif args.cmd == "imagepipe":
        from .pipeline.geopipe import run_image_pipeline

        r = run_image_pipeline(
            spark, args.workdir, args.sf_dir, every=args.every
        )
        out = {"workdir": args.workdir, "stages": r["stats"]}
    elif args.cmd == "export-shards":
        from .pipeline.images import images_df
        from .sources import wds

        manifest = wds.write_shards(
            images_df(spark, args.sf_dir, every=args.every),
            args.out, shards=args.shards,
        )
        out = {
            "pool": args.out,
            "shards": len(manifest),
            "rows": sum(m["rows"] for m in manifest),
            "bytes": sum(m["bytes"] for m in manifest),
        }
    elif args.cmd == "export-mvt":
        from pyspark.sql import functions as F

        from .pipeline import datagen
        from .sources import mvtiles

        polys = datagen.stop_area_octagons(spark, args.sf_dir).select(
            F.col("relation_id").cast("bigint").alias("feature_id"),
            "geom",
            (F.lit(-2000) + 1000 * (F.col("relation_id") % 5))
            .cast("long").alias("cx"),
            (F.lit(-2000) + 1000 * F.expr("relation_id div 5"))
            .cast("long").alias("cy"),
        )
        manifest = mvtiles.write_tiles(
            mvtiles.tile_candidates(polys), args.out, layer=args.layer
        )
        out = {
            "tiles": len(manifest),
            "features": sum(m["n_features"] for m in manifest),
            "out": args.out,
        }
    else:  # refresh-tiles
        from .pipeline import incremental as iv

        if args.init:
            v = iv.init_tile_view(spark, args.source, args.view)
            out = {"view": args.view, "initialized_version": v}
        else:
            out = iv.refresh_tile_view(spark, args.source, args.view)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
