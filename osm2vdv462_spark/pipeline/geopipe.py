"""Checkpoint-resumable IMAGE geo pipeline (the north-rule headline DAG).

The OSM/NeTEx pipeline has its checkpointed runner (pipeline/runner.py,
mirroring /root/reference/export.sh:30-87's staged shell pipeline); this
is the same treatment for the image+caption table the BASELINE.json
input_hint describes: every stage materializes through
StageCheckpoint (parquet stand-in for Iceberg snapshots + per-partition
lineage manifest + rows/bytes/content-hash metrics), so a rerun after a
crash resumes from the last validated stage and a rerun with identical
inputs is a bit-stable no-op.

Stage DAG::

    images       input_hint table synthesized from `events` geotags
      |-- verify       per-row invariant: decoded-pixel PSNR>=40dB,
      |                caption equality, phash recompute (compact
      |                verdict rows only -- bytes stay in stage 1)
      |-- join_rows    fused PIP stop-area + kNN nearest-quay codegen
      |                join (pruned scan: bytes never read)
      `-- tile_assign  per-image tile ids at 3 zoom levels
            `-- tile_counts  (res, cell) density rollup

At 100 TB each parquet stage is an Iceberg table; the geo stages read
only (image_id, caption, lon, lat) from the stage-1 files -- the
multi-KB `bytes` column never leaves its column chunk (parquet column
pruning on the materialized scan, plan-asserted in
tests/test_geopipe.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import datagen, images as im
from .checkpoint import StageCheckpoint, dir_snapshot

TILE_LEVELS = (8, 10, 12)


def run_image_pipeline(
    spark: SparkSession,
    workdir: str,
    sf_dir: str,
    every: int = 10,
    size: int = 32,
    mixed_formats: bool = False,
    levels: tuple[int, ...] = TILE_LEVELS,
) -> dict:
    """Run (or resume) the image DAG; returns {'stats', 'frames'}.

    ``stats``: per-stage {skipped, rows, bytes, content_hash, wall_sec}
    from the lineage manifests. ``frames``: the materialized DataFrames
    keyed by stage name.
    """
    os.makedirs(workdir, exist_ok=True)
    ck = StageCheckpoint(spark, workdir)
    params = f"every={every}:size={size}:mixed={int(mixed_formats)}"

    imgs = ck.materialize(
        "images",
        lambda: im.images_df(
            spark, sf_dir, size=size, every=every, mixed_formats=mixed_formats
        ),
        {
            "events": dir_snapshot(os.path.join(sf_dir, "events.parquet")),
            "params": params,
        },
    )
    idep = {"images": ck.snapshot_of("images")}

    verify = ck.materialize(
        "verify",
        lambda: im.with_decode_verify(imgs).select(
            "image_id", "pixel_ok", "caption_ok", "phash_ok"
        ),
        idep,
    )

    def _join_rows() -> DataFrame:
        from ..operators.jvm_pip import pip_knn_assign_codegen

        pts = imgs.select("image_id", "caption", "lon", "lat")
        polys = datagen.stop_area_octagons(spark, sf_dir)
        quays = datagen.quay_sites(spark, sf_dir)
        out = pip_knn_assign_codegen(
            pts, polys, quays, point_keep=["image_id", "caption"],
            poly_id="relation_id", target_id="quay_id", poly_res=12,
        )
        return out.select(
            "image_id",
            "caption",
            F.col("relation_id").cast("int").alias("relation_id"),
            "quay_id",
            F.round(F.col("dist_m"), 0).cast("long").alias("dist_m_round"),
        )

    join_rows = ck.materialize(
        "join_rows",
        _join_rows,
        # geo layers derive from the sf_dir dims (nation/supplier) --
        # fingerprint the whole dir so a regenerated world invalidates
        {**idep, "layers": dir_snapshot(sf_dir)},
    )

    def _tile_assign() -> DataFrame:
        from ..operators.jvm_pip import cell_expr

        return imgs.select(
            "image_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("res"),
                            cell_expr(F.col("lon"), F.col("lat"), r).alias("cell"),
                        )
                        for r in levels
                    ]
                )
            ).alias("rc"),
        ).select(
            "image_id", F.col("rc.res").alias("res"), F.col("rc.cell").alias("cell")
        )

    tiles = ck.materialize("tile_assign", _tile_assign, idep)
    tile_counts = ck.materialize(
        "tile_counts",
        lambda: tiles.groupBy("res", "cell").agg(F.count("*").alias("n_images")),
        {"tile_assign": ck.snapshot_of("tile_assign")},
    )

    return {
        "stats": ck.stats,
        "frames": {
            "images": imgs,
            "verify": verify,
            "join_rows": join_rows,
            "tile_assign": tiles,
            "tile_counts": tile_counts,
        },
    }
