"""Raster <-> vector operators (the north rule's fourth spatial
capability next to the cell index, PIP, and kNN).

Raster model: one tile per grid cell (geo/cells.py) holding a px*px
single-band array; pixel (i, j) of tile (res, ix, iy) has geographic
CENTER

    lon = -180 + (ix + (j + 0.5) / px) * 360 / 2^(res+1)
    lat =  -90 + (iy + (i + 0.5) / px) * 180 / 2^res

— the formula is evaluated with the identical operation order on every
engine (numpy here, plain arithmetic in the DuckDB gate oracle), so
strict inside/outside comparisons agree bit-for-bit.

* ``rasterize_polygons`` (vector -> raster): per (polygon, covering
  tile), the pixel-center occupancy mask (packed bits) — the burn step
  of any rasterization pipeline.
* ``zonal_stats`` (raster -> vector): per-polygon count/sum/mean of
  band values at pixel centers inside the polygon — the remote-sensing
  zonal-statistics join.

Scale shape: tiles are the FACT side (a planet at res 15 / 256 px is
~10^9 tiles); polygons explode to their cover cells and meet tiles on
a cell equi-join (broadcast when the vector side is a dimension), the
masked partial aggregation is vectorized per pair, and the per-polygon
rollup is a map-side-combinable groupBy on the polygon id. One scan of
the raster, shuffle only of (poly_id, count, sum) partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..geo import cells as _cells
from ..geo import kernel as _kernel
from ..geo import wkb as _wkb
from ..geo.columns import cover_cells


def pixel_centers(cell: int, px: int) -> tuple[np.ndarray, np.ndarray]:
    """(lons[px], lats[px]) of pixel centers along each axis."""
    r, ix, iy = _cells.unpack(np.array([cell], np.int64))
    r, ix, iy = int(r[0]), int(ix[0]), int(iy[0])
    ncols, nrows = (1 << (r + 1)), (1 << r)
    j = np.arange(px, dtype=np.float64)
    i = np.arange(px, dtype=np.float64)
    lons = -180.0 + (ix + (j + 0.5) / px) * 360.0 / ncols
    lats = -90.0 + (iy + (i + 0.5) / px) * 180.0 / nrows
    return lons, lats


def synth_band(cell: int, px: int) -> np.ndarray:
    """Deterministic uint8 test band per tile (closed form an
    independent SQL engine reproduces: (j*7 + i*11 + (cell%9973)*13)
    % 256)."""
    i, j = np.mgrid[0:px, 0:px]
    return ((j * 7 + i * 11 + (cell % 9973) * 13) % 256).astype(np.uint8)


def synth_tile_table(
    polys_df: DataFrame, *, poly_wkb: str = "geom", res: int = 12, px: int = 16
) -> DataFrame:
    """A materialized raster: one row per cell covering any polygon,
    band stored as px*px uint8 bytes (row-major). Stands in for a real
    imagery table keyed by tile id."""
    cellsdf = (
        polys_df.select(F.explode(cover_cells(F.col(poly_wkb), res)).alias("cell"))
        .distinct()
    )

    def _mk(batches):
        for pdf in batches:
            out = []
            for c in pdf["cell"]:
                out.append((int(c), synth_band(int(c), px).tobytes(), px))
            yield pd.DataFrame(out, columns=["cell", "band", "px"])

    return cellsdf.mapInPandas(_mk, "cell long, band binary, px int")


def _mask_for(geom, cell: int, px: int) -> np.ndarray:
    lons, lats = pixel_centers(cell, px)
    glon = np.repeat(lons, px).reshape(px, px).T.ravel()  # j varies per row
    glat = np.repeat(lats, px)
    return _kernel.points_in_polygon(glon, glat, geom).reshape(px, px)


def rasterize_polygons(
    polys_df: DataFrame,
    *,
    poly_id: str = "relation_id",
    poly_wkb: str = "geom",
    res: int = 12,
    px: int = 16,
) -> DataFrame:
    """(poly_id, cell, n_inside, mask) per polygon x covering tile with
    at least one inside pixel; mask = row-major packed bits."""
    src = polys_df.select(
        F.col(poly_id).alias("pid"),
        F.col(poly_wkb).alias("pwkb"),
        F.explode(cover_cells(F.col(poly_wkb), res)).alias("cell"),
    )

    def _burn(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                g = _wkb.decode(bytes(row.pwkb))
                m = _mask_for(g, int(row.cell), px)
                n = int(m.sum())
                if n:
                    out.append(
                        (row.pid, int(row.cell), n, np.packbits(m).tobytes())
                    )
            if out:
                yield pd.DataFrame(
                    out, columns=["pid", "cell", "n_inside", "mask"]
                )

    out = src.mapInPandas(_burn, "pid long, cell long, n_inside int, mask binary")
    return out.withColumnRenamed("pid", poly_id)


def zonal_stats(
    tiles_df: DataFrame,
    polys_df: DataFrame,
    *,
    poly_id: str = "relation_id",
    poly_wkb: str = "geom",
    res: int = 12,
    px: int = 16,
) -> DataFrame:
    """(poly_id, n_px, sum_v, mean_v) over band values at pixel centers
    inside each polygon. Tiles scan once; the vector side broadcasts
    through the cell equi-join; partials combine map-side."""
    polys = F.broadcast(
        polys_df.select(
            F.col(poly_id).alias("pid"),
            F.col(poly_wkb).alias("pwkb"),
            F.explode(cover_cells(F.col(poly_wkb), res)).alias("cell"),
        )
    )
    pairs = tiles_df.join(polys, "cell")

    def _zonal(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                g = _wkb.decode(bytes(row.pwkb))
                band = np.frombuffer(bytes(row.band), np.uint8).reshape(px, px)
                m = _mask_for(g, int(row.cell), px)
                n = int(m.sum())
                if n:
                    out.append((row.pid, n, int(band[m].sum())))
            if out:
                yield pd.DataFrame(out, columns=["pid", "n", "s"])

    partial = pairs.mapInPandas(_zonal, "pid long, n long, s long")
    return (
        partial.groupBy("pid")
        .agg(F.sum("n").alias("n_px"), F.sum("s").alias("sum_v"))
        .select(
            F.col("pid").alias(poly_id),
            "n_px",
            "sum_v",
            F.round(F.col("sum_v") / F.col("n_px"), 4).alias("mean_v"),
        )
    )
