"""Binary-raster labeling operators: distributed connected-component
labeling (CCL) and 3x3 morphological opening — the two classic
segmentation primitives a raster/imagery pipeline runs after a
threshold step (north-rule raster family, next to rasterize / zonal /
focal in operators/raster.py).

Raster model here is the simple tiled-grid one: the raster is a
``tiles_w x tiles_h`` block of ``px x px`` binary tiles addressed by
(tx, ty); global pixel coordinates gx = tx*px + j, gy = ty*px + i and
gid = gy * (tiles_w*px) + gx. Tiles are rows of a DataFrame (the fact
table — a planet-scale mask at 256 px is ~10^9 tiles), masks are
px*px row-major uint8 {0,1} bytes.

* ``cc_labels``: the textbook two-level distributed CCL — each tile
  labels ITS OWN pixels locally (vectorized numpy min-propagation, no
  Python pixel loops), then only (a) per-local-root partial stats and
  (b) the one-pixel boundary strips cross the wire; a tiny
  root-adjacency graph goes through the generic iterative
  connected_components operator (operators/cluster.py) and the final
  per-component rollup is one partial-aggregable groupBy. The shuffle
  carries O(roots + perimeter) rows, never O(pixels).
* ``morph_open_counts``: erosion + opening (erode then dilate, 3x3
  structuring element) via ONE halo exchange of 2-pixel edge strips
  (opening needs radius-2 support), the same neighbor-messaging
  pattern as raster.focal_stats36 but with a configurable halo width.
  Outside-raster pixels are BACKGROUND (absent neighbor tiles simply
  contribute zeros), so map edges erode — the standard finite-image
  convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def label_tile(fg: np.ndarray, gx0: int, gy0: int, raster_w: int) -> np.ndarray:
    """4-adjacency CCL inside one tile, vectorized: every foreground
    pixel starts at its own GLOBAL gid and iteratively takes the min of
    its in-tile neighbors until fixpoint (<= 2*px rounds, each a numpy
    shift+minimum — no per-pixel Python). Background pixels get -1.

    Returns an int64 label array; each label is the min gid of the
    pixel's TILE-LOCAL component (global merge happens later)."""
    px = fg.shape[0]
    i, j = np.mgrid[0:px, 0:px]
    gid = (gy0 + i).astype(np.int64) * raster_w + (gx0 + j)
    big = np.iinfo(np.int64).max
    lbl = np.where(fg, gid, big)
    while True:
        nxt = lbl.copy()
        nxt[1:, :] = np.minimum(nxt[1:, :], lbl[:-1, :])
        nxt[:-1, :] = np.minimum(nxt[:-1, :], lbl[1:, :])
        nxt[:, 1:] = np.minimum(nxt[:, 1:], lbl[:, :-1])
        nxt[:, :-1] = np.minimum(nxt[:, :-1], lbl[:, 1:])
        nxt = np.where(fg, nxt, big)
        if (nxt == lbl).all():
            break
        lbl = nxt
    return np.where(fg, lbl, -1)


def cc_labels(
    tiles: DataFrame,
    *,
    px: int,
    tiles_w: int,
) -> DataFrame:
    """Distributed CCL over a tiled binary raster.

    Input: (tx int, ty int, mask binary) — px*px {0,1} bytes.
    Output: one row per connected component (4-adjacency):
    (component, n_px, min_gx, min_gy, max_gx, max_gy), where
    ``component`` is the min gid of the component — the same canonical
    label a single-machine labeler would assign.

    Plan shape: one scan of the tile table does the local labeling and
    emits (a) per-local-root partials (count + bbox — a handful of rows
    per tile) and (b) (gx, gy, root) rows for the 4 one-pixel boundary
    strips only. Inter-tile root edges come from equi-joins of the
    strips on shifted coordinates (right edge meets left edge of the
    next tile, bottom meets top), the root graph runs through the
    generic min-label-propagation connected_components (graph size ~
    number of local roots, << pixels), and the stats rollup is a
    partial-aggregable groupBy on the final component id. A production
    fusion would emit both outputs from a single tagged-union pass;
    two passes keep the shapes typed and the tile scan is the cheap
    part (the mask synth / decode would normally be upstream)."""
    from .cluster import connected_components

    raster_w = tiles_w * px

    def _partials(batches):
        for pdf in batches:
            out = []
            for tx, ty, mask in zip(pdf["tx"], pdf["ty"], pdf["mask"]):
                fg = (
                    np.frombuffer(bytes(mask), np.uint8)
                    .reshape(px, px)
                    .astype(bool)
                )
                lbl = label_tile(fg, int(tx) * px, int(ty) * px, raster_w)
                roots = lbl[fg]
                if roots.size == 0:
                    continue
                i, j = np.mgrid[0:px, 0:px]
                gx = (int(tx) * px + j)[fg]
                gy = (int(ty) * px + i)[fg]
                order = np.argsort(roots, kind="stable")
                r_sorted = roots[order]
                cut = np.r_[0, np.nonzero(np.diff(r_sorted))[0] + 1]
                for s, e in zip(cut, np.r_[cut[1:], r_sorted.size]):
                    sel = order[s:e]
                    out.append(
                        (
                            int(r_sorted[s]),
                            int(e - s),
                            int(gx[sel].min()),
                            int(gy[sel].min()),
                            int(gx[sel].max()),
                            int(gy[sel].max()),
                        )
                    )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "root", "n_px", "min_gx", "min_gy", "max_gx", "max_gy",
                    ],
                )

    def _boundary(batches):
        for pdf in batches:
            out = []
            for tx, ty, mask in zip(pdf["tx"], pdf["ty"], pdf["mask"]):
                fg = (
                    np.frombuffer(bytes(mask), np.uint8)
                    .reshape(px, px)
                    .astype(bool)
                )
                lbl = label_tile(fg, int(tx) * px, int(ty) * px, raster_w)
                i, j = np.mgrid[0:px, 0:px]
                edge = (i == 0) | (i == px - 1) | (j == 0) | (j == px - 1)
                sel = fg & edge
                gx = (int(tx) * px + j)[sel]
                gy = (int(ty) * px + i)[sel]
                out.extend(zip(gx.tolist(), gy.tolist(), lbl[sel].tolist()))
            if out:
                yield pd.DataFrame(out, columns=["gx", "gy", "root"])

    schema_p = (
        "root long, n_px long, min_gx long, min_gy long,"
        " max_gx long, max_gy long"
    )
    partials = tiles.mapInPandas(_partials, schema_p)
    strips = tiles.mapInPandas(_boundary, "gx long, gy long, root long")

    right = strips.select(
        (F.col("gx") + 1).alias("gx"), "gy", F.col("root").alias("root_a")
    )
    down = strips.select(
        "gx", (F.col("gy") + 1).alias("gy"), F.col("root").alias("root_a")
    )
    nbr = right.unionByName(down)
    edges = (
        strips.join(nbr, ["gx", "gy"])
        .select(F.col("root_a").alias("src"), F.col("root").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    verts = partials.select(F.col("root").alias("id")).distinct()
    cc = connected_components(verts, edges, vid="id", src="src", dst="dst")
    return (
        partials.join(cc, partials["root"] == cc["id"])
        .groupBy("component")
        .agg(
            F.sum("n_px").alias("n_px"),
            F.min("min_gx").alias("min_gx"),
            F.min("min_gy").alias("min_gy"),
            F.max("max_gx").alias("max_gx"),
            F.max("max_gy").alias("max_gy"),
        )
    )


def morph_open_counts(tiles: DataFrame, *, px: int) -> DataFrame:
    """Per-tile foreground / eroded / opened pixel counts (3x3
    structuring element, outside-raster = background).

    One halo exchange: every tile ships its 2-pixel edge strips (and
    2x2 corners) to its 8 neighbors — shuffle ~(1 + 8/px) x the mask
    bytes — and each (px+4)^2 padded block computes erosion with a
    9-shift logical AND and the opening with a 9-shift OR of the
    eroded plane, all vectorized. Erosion of the px x px center is
    exact with halo 1; dilating the eroded plane back into the center
    needs eroded values one ring out, hence halo 2. Missing neighbor
    messages mean background (zeros), which IS the finite-raster
    convention, so no presence bookkeeping is needed (contrast
    focal_stats36, where absent neighbors change the divisor)."""
    H = 2

    def _emit(batches):
        for pdf in batches:
            out = []
            for tx, ty, mask in zip(pdf["tx"], pdf["ty"], pdf["mask"]):
                tx, ty = int(tx), int(ty)
                arr = np.frombuffer(bytes(mask), np.uint8).reshape(px, px)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ntx, nty = tx + dx, ty + dy
                        if ntx < 0 or nty < 0:
                            continue
                        # receiver below/right of us (positive d) needs
                        # our far (bottom/right) strip as its near halo
                        isel = (
                            slice(None)
                            if dy == 0
                            else (slice(px - H, px) if dy == 1 else slice(0, H))
                        )
                        jsel = (
                            slice(None)
                            if dx == 0
                            else (slice(px - H, px) if dx == 1 else slice(0, H))
                        )
                        out.append(
                            (
                                nty * 1_000_000 + ntx,
                                dx,
                                dy,
                                bytearray(arr[isel, jsel].tobytes()),
                            )
                        )
            yield pd.DataFrame(out, columns=["tkey", "dx", "dy", "payload"])

    msgs = tiles.mapInPandas(_emit, "tkey long, dx int, dy int, payload binary")

    def _assemble(pdf):
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            empty = np.array([], np.int64)
            return pd.DataFrame(
                {
                    "tx": empty,
                    "ty": empty,
                    "n_fg": empty,
                    "n_eroded": empty,
                    "n_opened": empty,
                }
            )
        tkey = int(pdf["tkey"].iloc[0])
        tx, ty = tkey % 1_000_000, tkey // 1_000_000
        pad = np.zeros((px + 2 * H, px + 2 * H), np.uint8)
        for dx, dy, payload in zip(pdf["dx"], pdf["dy"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), np.uint8)
            h = px if dy == 0 else H
            w = px if dx == 0 else H
            ii = (
                slice(H, px + H)
                if dy == 0
                else (slice(0, H) if dy == 1 else slice(px + H, px + 2 * H))
            )
            jj = (
                slice(H, px + H)
                if dx == 0
                else (slice(0, H) if dx == 1 else slice(px + H, px + 2 * H))
            )
            # the halo message was cut from the NEIGHBOR'S far side, so
            # a message that travelled (dx, dy) lands on the near side
            # of this tile's pad: dy=1 means the sender is ABOVE (its
            # bottom strip -> our top rows).
            pad[ii, jj] = arr.reshape(h, w)
        fg = pad.astype(bool)
        er = np.ones_like(fg)
        for u in (-1, 0, 1):
            for v in (-1, 0, 1):
                er &= np.roll(np.roll(fg, u, axis=0), v, axis=1)
        er &= fg
        # roll wraps; kill the wrapped border (it is outside the pad's
        # known region anyway — only the inner (px+2)^2 ring is used)
        er[0, :] = er[-1, :] = False
        er[:, 0] = er[:, -1] = False
        op = np.zeros_like(fg)
        for u in (-1, 0, 1):
            for v in (-1, 0, 1):
                op |= np.roll(np.roll(er, u, axis=0), v, axis=1)
        c = slice(H, px + H)
        return pd.DataFrame(
            [
                (
                    tx,
                    ty,
                    int(fg[c, c].sum()),
                    int(er[c, c].sum()),
                    int(op[c, c].sum()),
                )
            ],
            columns=["tx", "ty", "n_fg", "n_eroded", "n_opened"],
        )

    return msgs.groupBy("tkey").applyInPandas(
        _assemble, "tx long, ty long, n_fg long, n_eroded long, n_opened long"
    )


def marching_squares_counts(tiles: DataFrame, *, px: int, iso: int) -> DataFrame:
    """Marching-squares contour statistics over a tiled uint8 raster:
    per tile, the number of ACTIVE 2x2 quads (mixed above/below the
    iso threshold) and the number of contour segments they emit (the
    saddle cases — opposite corners high — emit two, other mixed
    cases one; with bits TL=1 TR=2 BL=4 BR=8 the saddles are 6/9).

    A quad is keyed by its top-left pixel; quads in a tile's last
    row/column need the right / bottom / diagonal neighbors' first
    column / row / corner pixel, so the halo exchange ships exactly
    three thin messages per tile (px + px + 1 pixels ~ 12% of a 16px
    tile). Quads whose far corners fall outside the raster (no
    neighbor message) are skipped — they do not exist. Vectorized
    case computation on the assembled (px+1)^2 block."""
    import pandas as pd

    def _emit(batches):
        for pdf in batches:
            out = []
            for tx, ty, band in zip(pdf["tx"], pdf["ty"], pdf["band"]):
                tx, ty = int(tx), int(ty)
                arr = np.frombuffer(bytes(band), np.uint8).reshape(px, px)
                out.append(
                    (ty * 1_000_000 + tx, 0, 0, bytearray(arr.tobytes()))
                )
                if tx > 0:  # left column -> left neighbor
                    out.append(
                        (
                            ty * 1_000_000 + tx - 1,
                            1,
                            0,
                            bytearray(arr[:, 0].tobytes()),
                        )
                    )
                if ty > 0:  # top row -> upper neighbor
                    out.append(
                        (
                            (ty - 1) * 1_000_000 + tx,
                            0,
                            1,
                            bytearray(arr[0, :].tobytes()),
                        )
                    )
                if tx > 0 and ty > 0:  # TL corner -> diagonal neighbor
                    out.append(
                        (
                            (ty - 1) * 1_000_000 + tx - 1,
                            1,
                            1,
                            bytearray(arr[0:1, 0].tobytes()),
                        )
                    )
            yield pd.DataFrame(out, columns=["tkey", "dx", "dy", "payload"])

    msgs = tiles.mapInPandas(_emit, "tkey long, dx int, dy int, payload binary")

    def _assemble(pdf):
        if not ((pdf["dx"] == 0) & (pdf["dy"] == 0)).any():
            empty = np.array([], np.int64)
            return pd.DataFrame(
                {
                    "tx": empty,
                    "ty": empty,
                    "n_active": empty,
                    "n_segments": empty,
                }
            )
        tkey = int(pdf["tkey"].iloc[0])
        tx, ty = tkey % 1_000_000, tkey // 1_000_000
        val = np.zeros((px + 1, px + 1), np.int64)
        have_r = have_b = have_d = False
        for dx, dy, payload in zip(pdf["dx"], pdf["dy"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), np.uint8).astype(np.int64)
            if dx == 0 and dy == 0:
                val[:px, :px] = arr.reshape(px, px)
            elif dx == 1 and dy == 0:
                val[:px, px] = arr
                have_r = True
            elif dx == 0 and dy == 1:
                val[px, :px] = arr
                have_b = True
            else:
                val[px, px] = arr[0]
                have_d = True
        hi = val >= iso
        # quad validity: interior quads always; last col/row need halos
        nq = px if have_r else px - 1
        mq = px if have_b else px - 1
        case = (
            hi[:mq, :nq].astype(np.int64)
            + 2 * hi[:mq, 1 : nq + 1]
            + 4 * hi[1 : mq + 1, :nq]
            + 8 * hi[1 : mq + 1, 1 : nq + 1]
        )
        if have_r and have_b and not have_d:
            # corner quad lacks its far corner: drop it
            case[mq - 1, nq - 1] = 0
        mixed = (case != 0) & (case != 15)
        segs = mixed.astype(np.int64) + ((case == 6) | (case == 9))
        return pd.DataFrame(
            [(tx, ty, int(mixed.sum()), int(segs.sum()))],
            columns=["tx", "ty", "n_active", "n_segments"],
        )

    return msgs.groupBy("tkey").applyInPandas(
        _assemble, "tx long, ty long, n_active long, n_segments long"
    )
