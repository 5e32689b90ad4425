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


# ------------------------------------------------------------ focal stats


def focal_stats36(tiles: DataFrame, px: int) -> DataFrame:
    """3x3 focal (neighborhood) mean over a tiled raster with a REAL
    HALO EXCHANGE — the distributed stencil pattern every focal/
    convolution raster op needs at scale.

    Input: (cell bigint, band binary) — px*px uint8 tiles on the
    geo/cells.py grid. Each tile ships its center band to itself and
    only the adjacent EDGE STRIPS (px bytes) / CORNER PIXELS (1 byte)
    to its 8 neighbors, so the shuffle carries ~(1 + 4/px) x the
    raster, not 9x. One groupBy(cell) assembles the (px+2)^2 padded
    block and the convolution is 9 shifted adds, vectorized.

    Boundary semantics: the mean is over the neighbors PRESENT in the
    input (map-edge handling). For rectangular tile blocks every pixel
    has 4, 6, or 9 neighbors — all divide 36 — so the per-pixel focal
    mean is returned as the EXACT integer ``foc36 = 36 * sum / count``
    and every aggregate of it is order-independent (the DECIMAL-moment
    discipline, integer edition). A non-rectangular block (hole in the
    coverage) can yield counts of 5, 7, or 8; that breaks exactness
    and raises rather than silently rounding.

    Output: one row per input tile —
    (cell, n_px, sum_foc36, min_foc36, max_foc36)."""
    import pandas as pd

    def _emit(batches):
        for pdf in batches:
            out = []
            for cell, band in zip(pdf["cell"], pdf["band"]):
                cell = int(cell)
                r, ix, iy = _cells.unpack(np.array([cell], np.int64))
                r, ix, iy = int(r[0]), int(ix[0]), int(iy[0])
                arr = np.frombuffer(bytes(band), np.uint8).reshape(px, px)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        tix, tiy = ix - dx, iy - dy
                        if tix < 0 or tiy < 0:
                            continue
                        tgt = int(
                            _cells.pack(
                                r,
                                np.array([tix], np.int64),
                                np.array([tiy], np.int64),
                            )[0]
                        )
                        isel = (
                            slice(None)
                            if dy == 0
                            else (slice(px - 1, px) if dy == -1 else slice(0, 1))
                        )
                        jsel = (
                            slice(None)
                            if dx == 0
                            else (slice(px - 1, px) if dx == -1 else slice(0, 1))
                        )
                        out.append(
                            (tgt, dx, dy, bytearray(arr[isel, jsel].tobytes()))
                        )
            yield pd.DataFrame(
                out, columns=["cell", "dx", "dy", "payload"]
            )

    msgs = tiles.mapInPandas(
        _emit, "cell bigint, dx int, dy int, payload binary"
    )

    def _assemble(pdf):
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            # halo messages addressed to a tile absent from the input
            empty = np.array([], np.int64)
            return pd.DataFrame(
                {
                    "cell": empty,
                    "n_px": empty,
                    "sum_foc36": empty,
                    "min_foc36": empty,
                    "max_foc36": empty,
                }
            )
        cell = int(pdf["cell"].iloc[0])
        val = np.zeros((px + 2, px + 2), np.int64)
        pres = np.zeros((px + 2, px + 2), bool)
        for dx, dy, payload in zip(pdf["dx"], pdf["dy"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), np.uint8).astype(np.int64)
            ii = (
                slice(1, px + 1)
                if dy == 0
                else (slice(0, 1) if dy == -1 else slice(px + 1, px + 2))
            )
            jj = (
                slice(1, px + 1)
                if dx == 0
                else (slice(0, 1) if dx == -1 else slice(px + 1, px + 2))
            )
            h = px if dy == 0 else 1
            w = px if dx == 0 else 1
            val[ii, jj] = arr.reshape(h, w)
            pres[ii, jj] = True
        acc = np.zeros((px, px), np.int64)
        cnt = np.zeros((px, px), np.int64)
        for u in range(3):
            for v in range(3):
                acc += val[u : u + px, v : v + px] * pres[u : u + px, v : v + px]
                cnt += pres[u : u + px, v : v + px]
        foc36 = acc * 36
        if (foc36 % cnt).any():
            raise ValueError(
                "focal_stats36 requires rectangular tile coverage "
                "(neighbor counts must divide 36)"
            )
        foc36 //= cnt
        return pd.DataFrame(
            [
                (
                    cell,
                    px * px,
                    int(foc36.sum()),
                    int(foc36.min()),
                    int(foc36.max()),
                )
            ],
            columns=["cell", "n_px", "sum_foc36", "min_foc36", "max_foc36"],
        )

    return msgs.groupBy("cell").applyInPandas(
        _assemble,
        "cell bigint, n_px bigint, sum_foc36 bigint, "
        "min_foc36 bigint, max_foc36 bigint",
    )
