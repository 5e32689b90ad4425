"""Property-based tests (hypothesis) for the geo kernel — the rigor the
reference lacks entirely (SURVEY.md §5: no unit/property tests there)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from osm2vdv462_spark.geo import cells, kernel, wkb

lon_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
lat_st = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
res_st = st.integers(min_value=2, max_value=24)


class TestCellProperties:
    @given(lon_st, lat_st, res_st)
    @settings(max_examples=60, deadline=None)
    def test_point_in_own_cell_kring(self, lon, lat, res):
        c = cells.cell_of_points(np.array([lon]), np.array([lat]), res)[0]
        assert c in set(cells.k_ring(c, 1).tolist())

    @given(lon_st, lat_st, res_st, st.integers(min_value=2, max_value=20))
    @settings(max_examples=60, deadline=None)
    def test_parent_consistency(self, lon, lat, res, coarse):
        if coarse >= res:
            return
        c = cells.cell_of_points(np.array([lon]), np.array([lat]), res)
        p = cells.parent(c, coarse)
        direct = cells.cell_of_points(np.array([lon]), np.array([lat]), coarse)
        assert p[0] == direct[0]

    @given(
        st.floats(min_value=-170, max_value=169, allow_nan=False),
        st.floats(min_value=-80, max_value=79, allow_nan=False),
        st.floats(min_value=1e-6, max_value=0.5),
        res_st,
    )
    @settings(max_examples=25, deadline=None)
    def test_bbox_cover_contains_interior_points(self, lon0, lat0, span, res):
        # bound the cover size BEFORE materializing it: a 0.5-degree
        # span at res 24 is a ~10^9-cell meshgrid — an unbounded
        # allocation whenever hypothesis draws big span x fine res
        # (stalled a full suite run for 20+ min under page-fault
        # pressure). The property is res-independent; small covers
        # exercise it completely.
        from hypothesis import assume

        x0, y0 = cells.xy_of_points(np.array([lon0]), np.array([lat0]), res)
        x1, y1 = cells.xy_of_points(
            np.array([lon0 + span]), np.array([lat0 + span]), res
        )
        assume((x1[0] - x0[0] + 1) * (y1[0] - y0[0] + 1) <= 4096)
        cover = set(
            cells.cells_of_bbox(lon0, lat0, lon0 + span, lat0 + span, res).tolist()
        )
        for fx, fy in [(0.1, 0.1), (0.5, 0.5), (0.9, 0.9), (0.99, 0.01)]:
            c = cells.cell_of_points(
                np.array([lon0 + span * fx]), np.array([lat0 + span * fy]), res
            )[0]
            assert c in cover


class TestKernelProperties:
    @given(lon_st, lat_st, lon_st, lat_st)
    @settings(max_examples=60, deadline=None)
    def test_haversine_metric(self, lon1, lat1, lon2, lat2):
        d = kernel.haversine_m(lon1, lat1, lon2, lat2)
        assert d >= 0
        assert abs(d - kernel.haversine_m(lon2, lat2, lon1, lat1)) < 1e-6
        assert kernel.haversine_m(lon1, lat1, lon1, lat1) < 1e-6
        assert d <= np.pi * kernel.EARTH_R + 1

    @given(
        st.lists(
            st.tuples(
                st.floats(min_value=-10, max_value=10, allow_nan=False),
                st.floats(min_value=-10, max_value=10, allow_nan=False),
            ),
            min_size=3,
            max_size=12,
        )
    )
    @settings(max_examples=25, deadline=None)
    def test_hull_contains_all_points(self, pts):
        arr = np.array(pts, dtype=np.float64)
        hull = kernel.convex_hull(arr)
        if len(hull) < 3:
            return
        ring = np.vstack([hull, hull[:1]])
        poly = wkb.decode(wkb.encode_polygon([ring]))
        # every input point inside or on hull: shrink slightly toward
        # centroid to dodge boundary ambiguity of the ray cast
        c = arr.mean(axis=0)
        shrunk = c + (arr - c) * 0.999
        inside = kernel.points_in_polygon(shrunk[:, 0], shrunk[:, 1], poly)
        # collinear/degenerate inputs may produce a flat hull: allow those
        area = abs(
            np.sum(
                ring[:-1, 0] * ring[1:, 1] - ring[1:, 0] * ring[:-1, 1]
            )
        )
        if area > 1e-9:
            assert inside.all()

    @given(
        st.floats(min_value=-170, max_value=169, allow_nan=False),
        st.floats(min_value=-80, max_value=79, allow_nan=False),
        st.floats(min_value=1e-4, max_value=0.2),
        st.integers(min_value=0, max_value=2**31),
    )
    @settings(max_examples=25, deadline=None)
    def test_pip_matches_winding_oracle(self, cx, cy, r, seed):
        # irregular star polygon vs an independent winding-number oracle
        rng = np.random.default_rng(seed)
        th = np.sort(rng.uniform(0, 2 * np.pi, 8))
        rad = rng.uniform(0.3 * r, r, 8)
        ring = np.c_[cx + rad * np.cos(th), cy + rad * np.sin(th)]
        ring = np.vstack([ring, ring[:1]])
        poly = wkb.decode(wkb.encode_polygon([ring]))
        px = rng.uniform(cx - r, cx + r, 50)
        py = rng.uniform(cy - r, cy + r, 50)
        got = kernel.points_in_polygon(px, py, poly)

        def winding(x, y):
            w = 0.0
            for i in range(len(ring) - 1):
                a = ring[i] - [x, y]
                b = ring[i + 1] - [x, y]
                w += np.arctan2(np.cross(a, b), np.dot(a, b))
            return abs(w) > np.pi

        for i in range(50):
            # skip points too close to an edge (both methods ambiguous)
            d = np.min(
                np.abs(
                    np.cross(
                        ring[1:] - ring[:-1],
                        np.array([px[i], py[i]]) - ring[:-1],
                    )
                )
                / np.maximum(np.linalg.norm(ring[1:] - ring[:-1], axis=1), 1e-30)
            )
            if d < r * 1e-6:
                continue
            assert got[i] == winding(px[i], py[i])

    @given(st.binary(min_size=0, max_size=64))
    @settings(max_examples=25, deadline=None)
    def test_wkb_decoder_never_crashes_unexpectedly(self, blob):
        try:
            wkb.decode(blob)
        except (wkb.WKBError, ValueError, IndexError, Exception):
            pass  # garbage must raise, not hang/segfault
