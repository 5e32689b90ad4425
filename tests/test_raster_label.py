"""Whole-raster reference checks for operators/raster_label.py — the
parity tests pin ONE mask; these verify the distributed plumbing
(boundary-strip CCL merge, 2-px morphology halo, 3-message marching-
squares halo) against single-array numpy references on OTHER masks,
including densities near the percolation threshold where components
span many tiles.
"""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.operators import raster_label as RL

TW, PX = 4, 16
W = TW * PX


def _mask(tag: str, lt: int) -> np.ndarray:
    m = np.zeros((W, W), np.uint8)
    for gy in range(W):
        for gx in range(W):
            h = hashlib.md5(f"{tag}:{gx}:{gy}".encode()).hexdigest()
            m[gy, gx] = 1 if int(h[:4], 16) % 10 < lt else 0
    return m


def _tiles(spark, full: np.ndarray):
    rows = []
    for ty in range(TW):
        for tx in range(TW):
            blk = full[ty * PX : ty * PX + PX, tx * PX : tx * PX + PX]
            rows.append((tx, ty, bytearray(blk.tobytes())))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tx", "ty", "mask"]),
        "tx int, ty int, mask binary",
    ).repartition(5)


def _cc_reference(fg: np.ndarray):
    gid = (np.arange(W)[:, None] * W + np.arange(W)[None, :]).astype(np.int64)
    big = np.iinfo(np.int64).max
    lbl = np.where(fg.astype(bool), gid, big)
    while True:
        nxt = lbl.copy()
        nxt[1:, :] = np.minimum(nxt[1:, :], lbl[:-1, :])
        nxt[:-1, :] = np.minimum(nxt[:-1, :], lbl[1:, :])
        nxt[:, 1:] = np.minimum(nxt[:, 1:], lbl[:, :-1])
        nxt[:, :-1] = np.minimum(nxt[:, :-1], lbl[:, 1:])
        nxt = np.where(fg.astype(bool), nxt, big)
        if (nxt == lbl).all():
            break
        lbl = nxt
    comps = {}
    ys, xs = np.nonzero(fg)
    for y, x in zip(ys, xs):
        c = int(lbl[y, x])
        e = comps.setdefault(c, [0, 10**9, 10**9, -1, -1])
        e[0] += 1
        e[1] = min(e[1], int(x))
        e[2] = min(e[2], int(y))
        e[3] = max(e[3], int(x))
        e[4] = max(e[4], int(y))
    return sorted(
        (c, n, x0, y0, x1, y1) for c, (n, x0, y0, x1, y1) in comps.items()
    )


@pytest.mark.parametrize("lt", [2, 5, 7])
def test_cc_labels_matches_whole_raster_reference(spark, lt):
    """Densities 20% (scattered), 50% and 70% (ABOVE the 59.3% site
    percolation threshold — one giant component crossing every tile
    boundary, the hardest merge case)."""
    fg = _mask(f"t{lt}", lt)
    got = sorted(
        tuple(r)
        for r in RL.cc_labels(_tiles(spark, fg), px=PX, tiles_w=TW).collect()
    )
    assert got == _cc_reference(fg)


def test_morph_open_counts_matches_whole_raster(spark):
    fg = (_mask("m", 6) | _mask("m2", 3)).astype(np.uint8)
    H = 2
    pad = np.zeros((W + 2 * H, W + 2 * H), bool)
    pad[H:-H, H:-H] = fg.astype(bool)
    er = np.ones_like(pad)
    for u in (-1, 0, 1):
        for v in (-1, 0, 1):
            er &= np.roll(np.roll(pad, u, 0), v, 1)
    er &= pad
    er[0, :] = er[-1, :] = False
    er[:, 0] = er[:, -1] = False
    op = np.zeros_like(pad)
    for u in (-1, 0, 1):
        for v in (-1, 0, 1):
            op |= np.roll(np.roll(er, u, 0), v, 1)
    fgc = fg.astype(bool)
    erc = er[H:-H, H:-H]
    opc = op[H:-H, H:-H]
    ref = []
    for ty in range(TW):
        for tx in range(TW):
            s = (
                slice(ty * PX, ty * PX + PX),
                slice(tx * PX, tx * PX + PX),
            )
            ref.append(
                (
                    tx,
                    ty,
                    int(fgc[s].sum()),
                    int(erc[s].sum()),
                    int(opc[s].sum()),
                )
            )
    got = sorted(
        tuple(r)
        for r in RL.morph_open_counts(_tiles(spark, fg), px=PX).collect()
    )
    assert got == sorted(ref)


def test_marching_squares_matches_whole_raster(spark):
    i, j = np.mgrid[0:W, 0:W]
    band = ((j * 7 + i * 11) % 256).astype(np.uint8)
    iso = 128
    hi = band.astype(np.int64) >= iso
    case = (
        hi[:-1, :-1].astype(np.int64)
        + 2 * hi[:-1, 1:]
        + 4 * hi[1:, :-1]
        + 8 * hi[1:, 1:]
    )
    mixed = (case != 0) & (case != 15)
    segs = mixed.astype(np.int64) + ((case == 6) | (case == 9))
    ref = []
    for ty in range(TW):
        for tx in range(TW):
            qs = (
                slice(ty * PX, min(ty * PX + PX, W - 1)),
                slice(tx * PX, min(tx * PX + PX, W - 1)),
            )
            ref.append(
                (tx, ty, int(mixed[qs].sum()), int(segs[qs].sum()))
            )
    rows = []
    for ty in range(TW):
        for tx in range(TW):
            blk = band[ty * PX : ty * PX + PX, tx * PX : tx * PX + PX]
            rows.append((tx, ty, bytearray(blk.tobytes())))
    tiles = spark.createDataFrame(
        pd.DataFrame(rows, columns=["tx", "ty", "band"]),
        "tx int, ty int, band binary",
    ).repartition(5)
    got = sorted(
        tuple(r)
        for r in RL.marching_squares_counts(tiles, px=PX, iso=iso).collect()
    )
    assert got == sorted(ref)


def test_cc_labels_invariant_to_shuffle_partitions(spark):
    """CLAUDE.md determinism discipline: same labels at 2 parallelism
    levels."""
    fg = _mask("inv", 5)
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = sorted(
            tuple(r)
            for r in RL.cc_labels(
                _tiles(spark, fg), px=PX, tiles_w=TW
            ).collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(
            tuple(r)
            for r in RL.cc_labels(
                _tiles(spark, fg), px=PX, tiles_w=TW
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert a == b
