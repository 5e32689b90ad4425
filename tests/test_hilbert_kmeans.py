"""Unit guards for hilbert_tile_rollup / kmeans_lloyd_assign beyond the
oracle parity mirror: the curve encode is checked against the classic
per-point algorithm + bijectivity, and the exact-integer Lloyd argmin
against an independent Fraction-arithmetic reference.
"""

from fractions import Fraction

import numpy as np
import pytest

from osm2vdv462_spark.functions.hilbert import hilbert_d


def _xy2d_classic(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_bijective_order4():
    gx, gy = np.meshgrid(np.arange(16), np.arange(16))
    d = hilbert_d(4, gx.ravel(), gy.ravel())
    assert sorted(d.tolist()) == list(range(256))


def test_hilbert_unit_steps_are_spatially_adjacent():
    """The property Z-order lacks: consecutive curve indexes are
    4-neighbours on the grid."""
    gx, gy = np.meshgrid(np.arange(32), np.arange(32))
    xs, ys = gx.ravel(), gy.ravel()
    d = hilbert_d(5, xs, ys)
    order = np.argsort(d)
    dx = np.abs(np.diff(xs[order]))
    dy = np.abs(np.diff(ys[order]))
    assert ((dx + dy) == 1).all()


@pytest.mark.parametrize("seed", range(5))
def test_hilbert_matches_classic(seed):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 256, 200)
    y = rng.randint(0, 256, 200)
    got = hilbert_d(8, x, y)
    ref = np.array([_xy2d_classic(256, int(a), int(b)) for a, b in zip(x, y)])
    assert (got == ref).all()


def test_hilbert_rejects_out_of_domain():
    with pytest.raises(ValueError):
        hilbert_d(4, np.array([16]), np.array([0]))


def _kmeans_fraction_reference(pts):
    """Independent Lloyd with exact rational centroids (K=4, 3 rounds,
    quadrant seeds, (val, cid) tie-break) — no cross-multiplication."""
    cents = [
        (Fraction(500), Fraction(500)),
        (Fraction(1500), Fraction(500)),
        (Fraction(500), Fraction(1500)),
        (Fraction(1500), Fraction(1500)),
    ]
    assign = {}
    for _ in range(3):
        assign = {}
        for eid, x, y in pts:
            best = min(
                ((x - cx) ** 2 + (y - cy) ** 2, cid)
                for cid, (cx, cy) in enumerate(cents)
            )
            assign[eid] = best[1]
        sums = {c: [Fraction(0), Fraction(0), 0] for c in range(4)}
        for eid, x, y in pts:
            c = assign[eid]
            sums[c][0] += x
            sums[c][1] += y
            sums[c][2] += 1
        cents = [
            (sums[c][0] / sums[c][2], sums[c][1] / sums[c][2])
            if sums[c][2]
            else (Fraction(0), Fraction(0))
            for c in range(4)
        ]
    return assign


def test_kmeans_matches_fraction_reference(spark, sf_dir):
    from osm2vdv462_spark.queries.mining_queries import kmeans_lloyd_assign

    out = {
        r["event_id"]: r["cluster"]
        for r in kmeans_lloyd_assign(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    pts = [
        (r["event_id"], (r["event_id"] * 37 + 11) % 2000,
         (r["event_id"] * 73 + 29) % 2000)
        for r in ev
        if r["event_id"] % 4 == 0
    ]
    ref = _kmeans_fraction_reference(pts)
    assert out == ref and len(out) > 0
