"""MVT tile-pyramid sink + source (functions/mvt.py wire codec).

The serving half of the tiling engine: polygons fan out to the fixed
0.2-degree tile grid (integer 1e-4-degree units, bbox cover), each tile
group encodes its own .mvt file EXECUTOR-SIDE (one file per tile, the
unit map servers fetch), and a small driver-side manifest records the
tile list + feature counts (tile count is grid-sized, never
feature-sized — the snaptable/wds manifest discipline). `read_tiles`
is the inverse: a binaryFile scan + distributed wire decode, so a
round-trip is scan -> decode -> stats with no driver involvement
beyond the file listing.

Coordinate quantization is pure integer math (positivity-shifted floor
division to the 4096 extent) — the same algebra the gated mvt_features
oracle replays in SQL.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import mvt
from ..geo import wkb as _wkb

GRID_UNITS = 2000  # 0.2 degrees in 1e-4-degree integer units
EXTENT = mvt.EXTENT


def tile_candidates(polys: DataFrame, pad_units: int = 451) -> DataFrame:
    """(feature_id, geom WKB, cx, cy int units) -> one row per
    (feature, covering tile): bbox cover over the fixed grid via
    explode(sequence) — map-side, 1-4 tiles per stop-area polygon."""
    return (
        polys.withColumn(
            "tile_x",
            F.explode(
                F.sequence(
                    F.expr(f"(cx - {pad_units} + 20000) div {GRID_UNITS}") - 10,
                    F.expr(f"(cx + {pad_units} + 20000) div {GRID_UNITS}") - 10,
                )
            ),
        )
        .withColumn(
            "tile_y",
            F.explode(
                F.sequence(
                    F.expr(f"(cy - {pad_units} + 20000) div {GRID_UNITS}") - 10,
                    F.expr(f"(cy + {pad_units} + 20000) div {GRID_UNITS}") - 10,
                )
            ),
        )
    )


def quantize_ring(
    ring: np.ndarray, tile_x: int, tile_y: int
) -> np.ndarray:
    """Float lon/lat ring (closed) -> tile-local quantized int vertices
    (open), via integer units and positivity-shifted floor division —
    bit-reproducible anywhere (no float quantization)."""
    lon_i = np.round(ring[:-1, 0] * 10000).astype(np.int64)
    lat_i = np.round(ring[:-1, 1] * 10000).astype(np.int64)
    qx = ((lon_i - tile_x * GRID_UNITS + 8000) * EXTENT) // GRID_UNITS - 16384
    qy = (
        ((tile_y + 1) * GRID_UNITS - lat_i + 8000) * EXTENT
    ) // GRID_UNITS - 16384
    return np.stack([qx, qy], axis=1)


def tile_payload(pdf: pd.DataFrame, layer: str) -> tuple[int, int, bytes]:
    """One tile group (columns feature_id, geom, tile_x, tile_y) ->
    (tile_x, tile_y, tile bytes). Features sort by id so bytes are
    deterministic under any upstream partitioning."""
    tx = int(pdf["tile_x"].iloc[0])
    ty = int(pdf["tile_y"].iloc[0])
    feats = []
    for fid, blob in sorted(
        zip(pdf["feature_id"], pdf["geom"]), key=lambda t: int(t[0])
    ):
        g = _wkb.decode(bytes(blob))
        rings = [
            quantize_ring(g.ring(i), tx, ty) for i in range(g.nrings)
        ]
        feats.append((int(fid), rings, {"name": f"rel_{int(fid)}"}))
    return tx, ty, mvt.encode_tile(layer, feats)


def write_tiles(
    cand: DataFrame, out_dir: str, layer: str = "stop_areas"
) -> list[dict]:
    """Candidates -> one .mvt file per tile, written executor-side
    (shuffle on the tile key = the planet-tiler partitioning), plus a
    manifest.json of {tile_x, tile_y, path, n_features} rows. Returns
    the manifest entries."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty, buf = tile_payload(pdf, layer)
        path = os.path.join(out_dir, f"tile_{tx}_{ty}.mvt")
        tmp = path + ".inprogress"
        with open(tmp, "wb") as fh:
            fh.write(buf)
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "tile_x": [tx],
                "tile_y": [ty],
                "path": [path],
                "n_features": [len(pdf)],
            }
        )

    manifest = [
        row.asDict()
        for row in cand.groupBy("tile_x", "tile_y")
        .applyInPandas(
            _write,
            "tile_x int, tile_y int, path string, n_features int",
        )
        .collect()  # tile-count rows only (grid-sized, bounded)
    ]
    manifest.sort(key=lambda r: (r["tile_x"], r["tile_y"]))
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def read_tiles(spark: SparkSession, tile_dir: str) -> DataFrame:
    """Distributed inverse: binaryFile scan over *.mvt + wire decode ->
    one row per decoded feature with vertex/wire stats."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.mvt")
        .load(tile_dir)
        .select("path", "content")
    )

    def _dec(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(str(path))
                stem = base[5 : -len(".mvt")]  # tile_{x}_{y}.mvt
                tx, ty = (int(v) for v in stem.split("_"))
                for lay in mvt.decode_tile(bytes(content)):
                    for f in lay["features"]:
                        out.append(
                            (
                                tx,
                                ty,
                                lay["name"],
                                int(f["id"]),
                                int(sum(len(r) for r in f["rings"])),
                                int(f["geom_len"]),
                                f["props"].get("name", ""),
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "tile_x", "tile_y", "layer", "feature_id",
                    "n_vertices", "geom_len", "name",
                ],
            )

    return files.mapInPandas(
        _dec,
        "tile_x int, tile_y int, layer string, feature_id bigint,"
        " n_vertices int, geom_len int, name string",
    )
