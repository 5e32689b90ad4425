"""Unit tests for the pure-numpy geo kernel (no Spark needed)."""

import numpy as np
import pytest

from osm2vdv462_spark.geo import cells, kernel, wkb


def square(cx, cy, half):
    return np.array(
        [
            [cx - half, cy - half],
            [cx + half, cy - half],
            [cx + half, cy + half],
            [cx - half, cy + half],
            [cx - half, cy - half],
        ]
    )


class TestWKB:
    def test_point_roundtrip(self):
        b = wkb.encode_point(13.5, 52.5)
        g = wkb.decode(b)
        assert g.type_name == "Point"
        assert g.coords[0, 0] == 13.5 and g.coords[0, 1] == 52.5
        assert wkb.encode_geom(g) == b

    def test_linestring_roundtrip(self):
        c = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]])
        g = wkb.decode(wkb.encode_linestring(c))
        assert g.type_name == "LineString"
        np.testing.assert_array_equal(g.coords, c)

    def test_polygon_with_hole(self):
        outer = square(0, 0, 10)
        hole = square(0, 0, 2)
        g = wkb.decode(wkb.encode_polygon([outer, hole]))
        assert g.type_name == "Polygon"
        assert g.nrings == 2
        np.testing.assert_array_equal(g.ring(1), hole)

    def test_multipolygon(self):
        g = wkb.decode(
            wkb.encode_multipolygon([[square(0, 0, 1)], [square(5, 5, 1), square(5, 5, 0.2)]])
        )
        assert g.type_name == "MultiPolygon"
        assert g.nrings == 3
        assert list(g.parts) == [0, 1, 3]

    def test_geom_type_name(self):
        assert wkb.geom_type_name(wkb.encode_point(1, 2)) == "Point"
        assert wkb.geom_type_name(wkb.encode_polygon([square(0, 0, 1)])) == "Polygon"

    def test_big_endian_decode(self):
        import struct

        b = struct.pack(">BIdd", 0, 1, 3.25, -4.5)
        g = wkb.decode(b)
        assert g.coords[0, 0] == 3.25 and g.coords[0, 1] == -4.5


class TestCells:
    def test_point_cell_stability(self):
        lon = np.array([13.4, 13.4, -179.99, 179.99])
        lat = np.array([52.5, 52.5, 0.0, 0.0])
        c = cells.cell_of_points(lon, lat, 12)
        assert c[0] == c[1]
        assert c[2] != c[3]
        assert (c > 0).all()

    def test_pack_unpack(self):
        c = cells.cell_of_points(np.array([13.4]), np.array([52.5]), 15)
        r, ix, iy = cells.unpack(c)
        assert r[0] == 15
        assert cells.pack(15, ix, iy)[0] == c[0]

    def test_parent_contains_child(self):
        c = cells.cell_of_points(np.array([13.4]), np.array([52.5]), 15)
        p = cells.parent(c, 10)
        direct = cells.cell_of_points(np.array([13.4]), np.array([52.5]), 10)
        assert p[0] == direct[0]

    def test_bbox_cover_superset(self):
        cover = cells.cells_of_bbox(13.0, 52.0, 13.1, 52.1, 12)
        # every point in the bbox must land in a cover cell
        rng = np.random.default_rng(7)
        lon = rng.uniform(13.0, 13.1, 200)
        lat = rng.uniform(52.0, 52.1, 200)
        pc = cells.cell_of_points(lon, lat, 12)
        assert np.isin(pc, cover).all()

    def test_k_ring_counts(self):
        c = cells.cell_of_points(np.array([13.4]), np.array([52.5]), 12)[0]
        assert len(cells.k_ring(c, 0)) == 1
        assert len(cells.k_ring(c, 1)) == 9
        assert len(cells.k_ring(c, 2)) == 25

    def test_k_ring_lon_wrap(self):
        c = cells.cell_of_points(np.array([179.999]), np.array([0.0]), 8)[0]
        ring = cells.k_ring(c, 1)
        assert len(ring) == 9  # wraps across the antimeridian, no clipping

    def test_neighbors_at_ring(self):
        c = cells.cell_of_points(np.array([13.4, 10.0]), np.array([52.5, 50.0]), 12)
        idx, nb = cells.neighbors_at_ring(c, 1)
        assert len(nb) == 16  # 8 ring-1 neighbors each
        assert set(idx.tolist()) == {0, 1}


class TestKernel:
    def test_haversine_known(self):
        # 0.044 deg lon at lat 52.5 ~= 3.0 km
        d = kernel.haversine_m(13.369, 52.525, 13.413, 52.522)
        assert 2900 < d < 3100
        # one degree of latitude ~= 111.2 km
        d2 = kernel.haversine_m(0.0, 0.0, 0.0, 1.0)
        assert 110_000 < d2 < 112_000

    def test_pip_square(self):
        poly = wkb.decode(wkb.encode_polygon([square(13.0, 52.0, 0.01)]))
        px = np.array([13.0, 13.005, 13.02, 12.98])
        py = np.array([52.0, 52.005, 52.0, 52.0])
        got = kernel.points_in_polygon(px, py, poly)
        assert got.tolist() == [True, True, False, False]

    def test_pip_hole(self):
        poly = wkb.decode(wkb.encode_polygon([square(0, 0, 10), square(0, 0, 2)]))
        px = np.array([0.0, 5.0, 11.0])
        py = np.array([0.0, 5.0, 0.0])
        assert kernel.points_in_polygon(px, py, poly).tolist() == [False, True, False]

    def test_pip_concave(self):
        # L-shape: brute-force semantics check
        ring = np.array(
            [[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]], dtype=float
        )
        poly = wkb.decode(wkb.encode_polygon([ring]))
        px = np.array([0.5, 3.0, 3.0, 0.5])
        py = np.array([0.5, 0.5, 3.0, 3.0])
        assert kernel.points_in_polygon(px, py, poly).tolist() == [True, True, False, True]

    def test_centroid_square(self):
        poly = wkb.decode(wkb.encode_polygon([square(13.0, 52.0, 0.01)]))
        cx, cy = kernel.centroid(poly)
        assert abs(cx - 13.0) < 1e-9 and abs(cy - 52.0) < 1e-9

    def test_centroid_line(self):
        g = wkb.decode(wkb.encode_linestring(np.array([[0.0, 0.0], [2.0, 0.0]])))
        cx, cy = kernel.centroid(g)
        assert cx == 1.0 and cy == 0.0

    def test_convex_hull(self):
        pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]], float)
        hull = kernel.convex_hull(pts)
        assert len(hull) == 4

    def test_oriented_envelope_rotated_rect(self):
        # rectangle rotated 30 deg: envelope should recover ~its area
        a = np.radians(30)
        base = np.array([[0, 0], [4, 0], [4, 1], [0, 1]], float)
        rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        pts = base @ rot.T
        rect = kernel.oriented_envelope(pts)
        v1 = rect[1] - rect[0]
        v2 = rect[2] - rect[1]
        area = abs(np.cross(v1, v2))
        assert abs(area - 4.0) < 1e-6

    def test_envelope_sides(self):
        rect = square(13.0, 52.0, 0.01)  # ~1.2km x 2.2km in meters
        short, long = kernel.envelope_sides_m(rect)
        assert short < long
        assert 1000 < short < 1600 and 2000 < long < 2400

    def test_simplify(self):
        line = np.array([[0, 0], [1, 1e-9], [2, 0], [3, 5], [4, 0]], float)
        out = kernel.simplify(line, 1e-6)
        assert len(out) == 4  # drops the near-collinear vertex only

    def test_subdivide_vertex_cap(self):
        # 12-gon -> parts with <= 5 distinct vertices? cap is approximate
        th = np.linspace(0, 2 * np.pi, 13)
        ring = np.c_[np.cos(th), np.sin(th)]
        ring[-1] = ring[0]
        parts = kernel.subdivide(ring, 5)
        assert len(parts) >= 2
        # cover preserved: sample points keep membership
        poly0 = wkb.decode(wkb.encode_polygon([ring]))
        rng = np.random.default_rng(3)
        px = rng.uniform(-1, 1, 300)
        py = rng.uniform(-1, 1, 300)
        orig = kernel.points_in_polygon(px, py, poly0)
        sub = np.zeros_like(orig)
        for part in parts:
            sub |= kernel.points_in_polygon(px, py, wkb.decode(wkb.encode_polygon([part])))
        # interior points (not near part boundaries) must agree
        agree = (orig == sub).mean()
        assert agree > 0.97

    def test_intersects_and_touches(self):
        a = wkb.decode(wkb.encode_polygon([square(0, 0, 1)]))
        b = wkb.decode(wkb.encode_polygon([square(2, 0, 1)]))  # shares edge x=1
        c = wkb.decode(wkb.encode_polygon([square(1.5, 0, 1)]))  # overlaps a
        d = wkb.decode(wkb.encode_polygon([square(5, 5, 1)]))  # disjoint
        assert kernel.geoms_intersect(a, b)
        assert kernel.touches(a, b)
        assert kernel.geoms_intersect(a, c)
        assert not kernel.touches(a, c)
        assert not kernel.geoms_intersect(a, d)

    def test_touches_line_on_boundary(self):
        poly = wkb.decode(wkb.encode_polygon([square(0, 0, 1)]))
        edge = wkb.decode(wkb.encode_linestring(np.array([[-1.0, -1.0], [1.0, -1.0]])))
        crossing = wkb.decode(wkb.encode_linestring(np.array([[-2.0, 0.0], [2.0, 0.0]])))
        assert kernel.touches(poly, edge)
        assert kernel.geoms_intersect(poly, crossing)
        assert not kernel.touches(poly, crossing)

    def test_polylines_length_flat(self):
        coords = np.array([[0, 0], [0, 1], [10, 10], [10, 11], [10, 12]], float)
        offsets = np.array([0, 2, 5])
        out = kernel.polylines_length_m(coords, offsets)
        assert abs(out[0] - kernel.haversine_m(0, 0, 0, 1)) < 1e-6
        assert abs(out[1] - 2 * kernel.haversine_m(10, 10, 10, 11)) < 1.0


class TestKnnTieBreak:
    """The normative kNN tie-break is (distance, target_id) — it must hold
    across ring boundaries AND in the brute-force fallback (VERDICT r1 #9:
    a later ring's equal-distance candidate must not displace an earlier
    smaller-id winner)."""

    def _index(self, rows, res):
        from osm2vdv462_spark.operators.knn import build_target_index

        return build_target_index(rows, res)

    def test_equal_distance_across_rings_keeps_min_id(self):
        from osm2vdv462_spark.operators.knn import _resolve_batch_k1

        res = 12
        h = cells._deg_per_cell(res)
        # point exactly on a cell boundary: the +0.99h target shares its
        # cell (ring 0), the -0.99h target sits in ring 1, distances are
        # bit-identical (same |dlat|, dlon = 0)
        d = 0.99 * h
        for north_id, south_id in ((3, 9), (9, 3)):
            idx = self._index([(north_id, 0.0, d), (south_id, 0.0, -d)], res)
            q, t, dist, rank = _resolve_batch_k1(
                idx, np.array([0.0]), np.array([0.0]), max_rings=4
            )
            assert len(q) == 1
            assert idx.ids[t[0]] == min(north_id, south_id)

    def test_bruteforce_fallback_ties_by_id_not_ordinal(self):
        from osm2vdv462_spark.operators.knn import _resolve_batch_k1

        res = 12
        h = cells._deg_per_cell(res)
        # both targets far outside ring range -> pure fallback; array order
        # puts the LARGER id first so an argmin-by-ordinal would pick it
        idx = self._index([(9, 0.0, 30 * h), (3, 0.0, -30 * h)], res)
        q, t, dist, rank = _resolve_batch_k1(
            idx, np.array([0.0]), np.array([0.0]), max_rings=1
        )
        assert len(q) == 1
        assert idx.ids[t[0]] == 3


class TestPredicatePairs:
    """Vectorized pair predicate vs the scalar oracles on fuzzed geometry
    mixes (polygons/lines/points, touching/overlapping/disjoint)."""

    def _mk_geoms(self, rng, n):
        gs = []
        for i in range(n):
            kind = rng.integers(0, 3)
            cx, cy = rng.uniform(0, 0.002, 2)
            if kind == 0:
                gs.append(wkb.decode(wkb.encode_point(cx, cy)))
            elif kind == 1:
                pts = np.column_stack(
                    [cx + rng.uniform(-5e-4, 5e-4, 3), cy + rng.uniform(-5e-4, 5e-4, 3)]
                )
                gs.append(wkb.decode(wkb.encode_linestring(pts)))
            else:
                gs.append(wkb.decode(wkb.encode_polygon([square(cx, cy, rng.uniform(1e-4, 6e-4))])))
        return gs

    @pytest.mark.parametrize("predicate", ["intersects", "touches"])
    def test_matches_scalar(self, predicate):
        rng = np.random.default_rng(7)
        geoms = self._mk_geoms(rng, 24)
        # include exact-touch pairs: shared-edge squares
        geoms.append(wkb.decode(wkb.encode_polygon([square(0.01, 0.01, 1e-4)])))
        geoms.append(wkb.decode(wkb.encode_polygon([square(0.0102, 0.01, 1e-4)])))
        n = len(geoms)
        ai, bi = np.meshgrid(np.arange(n), np.arange(n))
        ai, bi = ai.ravel().astype(np.int64), bi.ravel().astype(np.int64)
        got = kernel.predicate_pairs(geoms, ai, bi, predicate)
        fn = kernel.touches if predicate == "touches" else kernel.geoms_intersect
        want = np.array([fn(geoms[a], geoms[b]) for a, b in zip(ai, bi)])
        assert (got == want).all()


class TestSimplifyPreserve:
    """ST_SimplifyPreserveTopology parity (ref stop_places.sql:984):
    simplification must never create a self-intersecting ring."""

    def _star(self, rng, n_arms, r_out, r_in):
        angles = np.linspace(0, 2 * np.pi, 2 * n_arms, endpoint=False)
        radii = np.where(np.arange(2 * n_arms) % 2 == 0, r_out, r_in)
        radii = radii * rng.uniform(0.8, 1.2, len(radii))
        pts = np.column_stack([radii * np.cos(angles), radii * np.sin(angles)])
        return np.vstack([pts, pts[:1]])

    def test_fuzzed_stars_never_self_intersect(self):
        rng = np.random.default_rng(5)
        for trial in range(60):
            ring = self._star(rng, int(rng.integers(4, 10)),
                              rng.uniform(5e-4, 2e-3), rng.uniform(5e-5, 3e-4))
            # tolerances up to the outer radius: plain DP WILL cut necks
            tol = rng.uniform(1e-6, 1e-3)
            out = kernel.simplify_preserve(ring, tol)
            assert not kernel.ring_self_intersects(out), (trial, tol)
            # closed in == closed out
            assert (out[0] == out[-1]).all()

    def test_guard_bites_on_neck_collapse(self):
        # bottom edge dips to -2s at x=5s; a finger from the top reaches
        # into the dip (tip at -1s). Plain DP at tol >= 2s straightens
        # the bottom, cutting the finger — the classic topology break.
        s = 1e-4
        ring = np.array([
            [0, 0], [5, -2], [10, 0], [10, 5], [6, 5], [5, -1], [4, 5],
            [0, 5], [0, 0],
        ], dtype=np.float64) * s
        tol = 2.01 * s
        assert kernel.ring_self_intersects(kernel.simplify(ring, tol))
        out = kernel.simplify_preserve(ring, tol)
        assert not kernel.ring_self_intersects(out)
        assert np.allclose(out, ring)  # conservative: original returned

    def test_rectangle_unchanged(self):
        rect = square(0.01, 0.01, 1e-4)
        out = kernel.simplify_preserve(rect, 1e-6)
        assert np.allclose(out, rect)


class TestAutoTargetRes:
    def _grid(self, n_side, spacing_deg, base=10.0):
        return [
            (i * n_side + j, base + j * spacing_deg, base + i * spacing_deg)
            for i in range(n_side)
            for j in range(n_side)
        ]

    def test_denser_targets_pick_finer_res(self):
        from osm2vdv462_spark.operators.jvm_pip import _auto_target_res

        sparse = self._grid(10, 0.5)    # 100 targets, 0.5 deg apart
        dense = self._grid(10, 0.005)   # 100 targets, 0.005 deg apart
        rs, _ = _auto_target_res(sparse)
        rd, _ = _auto_target_res(dense)
        assert rd > rs

    def test_k_bound_holds_at_chosen_res(self):
        from osm2vdv462_spark.operators.jvm_pip import (
            _auto_target_res,
            _target_cell_arrays,
        )

        for spacing in (0.5, 0.05, 0.005):
            t = self._grid(8, spacing)
            res, pad = _auto_target_res(t)
            _, idm, _, _, _ = _target_cell_arrays(t, res, pad)
            assert idm.shape[1] <= 16, (spacing, res, idm.shape)

    def test_exactness_is_res_independent(self, spark):
        # the chosen resolution must never change RESULTS — only cost.
        # brute-force nearest vs the codegen operator at auto res, on a
        # deliberately clustered layout (auto picks a fine res)
        import numpy as np
        from pyspark.sql import functions as F

        from osm2vdv462_spark.operators.jvm_pip import pip_knn_assign_codegen

        t = self._grid(5, 0.004)
        targets = spark.createDataFrame(t, "quay_id long, lon double, lat double")
        polys = spark.createDataFrame(
            [], "relation_id long, geom binary"
        )
        pts = spark.range(0, 500).select(
            F.col("id").alias("event_id"),
            (F.lit(9.99) + ((F.col("id") * 37) % 100) / 2000.0).alias("lon"),
            (F.lit(9.99) + ((F.col("id") * 73) % 100) / 2000.0).alias("lat"),
        )
        out = {
            r["event_id"]: r["quay_id"]
            for r in pip_knn_assign_codegen(
                pts, polys, targets, point_keep=["event_id"],
                poly_id="relation_id", target_id="quay_id",
            ).collect()
        }
        tl = np.array([[x[1], x[2]] for x in t])
        ids = np.array([x[0] for x in t])
        from osm2vdv462_spark.geo.kernel import haversine_m

        for r in pts.collect():
            d = haversine_m(
                np.full(len(t), r["lon"]), np.full(len(t), r["lat"]),
                tl[:, 0], tl[:, 1],
            )
            best = np.lexsort((ids, d))[0]
            assert out[r["event_id"]] == ids[best], r["event_id"]


class TestSphericalArea:
    def test_octagon_matches_planar_closed_form(self):
        """At small extents the spherical shoelace must converge to the
        planar octagon area scaled to meters (box minus 4 corner cuts),
        with the cos(lat) meridian convergence of the center."""
        import math

        import numpy as np

        from osm2vdv462_spark.geo import kernel
        from osm2vdv462_spark.pipeline.datagen import OCT_A, OCT_B, _octagon_ring

        deg_m = kernel.EARTH_R * math.pi / 180.0
        for cy in (0.0, 0.2, 45.0):
            ring = _octagon_ring(0.05, cy)
            got = kernel.ring_area_m2(ring)
            c = OCT_B - OCT_A
            planar_deg2 = (2 * OCT_A) ** 2 - 2 * (OCT_A - c) ** 2
            want = planar_deg2 * deg_m * deg_m * math.cos(math.radians(cy))
            assert abs(got - want) / want < 2e-4, (cy, got, want)

    def test_holes_subtract_and_winding_invariance(self):
        import numpy as np

        from osm2vdv462_spark.geo import kernel, wkb

        outer = np.array(
            [[0, 0], [0.1, 0], [0.1, 0.1], [0, 0.1], [0, 0]], dtype="float64"
        )
        hole = np.array(
            [[0.02, 0.02], [0.05, 0.02], [0.05, 0.05], [0.02, 0.05], [0.02, 0.02]],
            dtype="float64",
        )
        g = wkb.decode(wkb.encode_polygon([outer, hole]))
        got = kernel.spherical_area_m2(g)
        want = kernel.ring_area_m2(outer) - kernel.ring_area_m2(hole)
        assert abs(got - want) < 1e-6
        # reversed winding: |.| makes ring area orientation-free
        assert abs(kernel.ring_area_m2(outer[::-1]) - kernel.ring_area_m2(outer)) < 1e-9


# ------------------------------------------------------ linear referencing


class TestSnapToSegments:
    def test_hand_checked_projection(self):
        idx, t, d2 = kernel.snap_to_segments(
            [1.0], [1.0], [0.0], [0.0], [2.0], [0.0]
        )
        assert idx[0] == 0 and t[0] == 0.5 and d2[0] == 1.0

    def test_clamps_beyond_endpoints(self):
        idx, t, d2 = kernel.snap_to_segments(
            [3.0, -1.0], [0.0, 0.0], [0.0], [0.0], [2.0], [0.0]
        )
        assert t.tolist() == [1.0, 0.0] and d2.tolist() == [1.0, 1.0]

    def test_degenerate_segment_is_a_point(self):
        idx, t, d2 = kernel.snap_to_segments(
            [1.0], [0.0], [5.0], [5.0], [5.0], [5.0]
        )
        assert t[0] == 0.0 and abs(d2[0] - 41.0) < 1e-12

    def test_tie_takes_lowest_index(self):
        idx, _, _ = kernel.snap_to_segments(
            [1.0], [1.0], [0.0, 0.0], [0.0, 0.0], [2.0, 2.0], [0.0, 0.0]
        )
        assert idx[0] == 0

    def test_random_vs_serial_bruteforce(self):
        rng = np.random.default_rng(47)
        n_pts, n_seg = 300, 12
        px = rng.uniform(-5, 5, n_pts)
        py = rng.uniform(-5, 5, n_pts)
        sa = rng.uniform(-5, 5, (n_seg, 2))
        sb = rng.uniform(-5, 5, (n_seg, 2))
        sb[3] = sa[3]  # one degenerate
        idx, t, d2 = kernel.snap_to_segments(
            px, py, sa[:, 0], sa[:, 1], sb[:, 0], sb[:, 1]
        )
        for i in range(n_pts):
            best = None
            for j in range(n_seg):
                axj, ayj = sa[j]
                bxj, byj = sb[j]
                dx, dy = bxj - axj, byj - ayj
                s2 = dx * dx + dy * dy
                tt = 0.0 if s2 == 0 else min(
                    max(((px[i] - axj) * dx + (py[i] - ayj) * dy) / s2, 0.0),
                    1.0,
                )
                cx, cy = axj + tt * dx, ayj + tt * dy
                dd = (px[i] - cx) ** 2 + (py[i] - cy) ** 2
                if best is None or dd < best[2]:
                    best = (j, tt, dd)
            assert idx[i] == best[0]
            assert abs(t[i] - best[1]) < 1e-12
            assert abs(d2[i] - best[2]) < 1e-12


class TestLineInterpolate:
    def test_points_lie_on_their_polyline(self, spark, sf_dir):
        from osm2vdv462_spark.queries.geo_queries import (
            line_interpolate_points,
        )

        rows = line_interpolate_points(spark, sf_dir).collect()
        assert len(rows) > 0
        # rebuild the vertex chains serially and verify each output
        # point sits on its selected segment (within rounding) and
        # f = 0 lands exactly on the first vertex
        for r in rows[:400]:
            k = r["line_id"]
            vx = -0.2 + 0.1 * (k % 5)
            vy = -0.2 + 0.1 * (k // 5)
            verts = [(vx, vy)]
            for i in range(3):
                vx += 0.011 * ((k * 7 + i * 3) % 5 - 2)
                vy += 0.009 * ((k * 5 + i * 7) % 7 - 3)
                verts.append((vx, vy))
            a = verts[r["seg_i"]]
            b = verts[r["seg_i"] + 1]
            _, _, d2 = kernel.snap_to_segments(
                [r["px"]], [r["py"]], [a[0]], [a[1]], [b[0]], [b[1]]
            )
            assert d2[0] < 1e-12
            if r["event_id"] % 100 == 0:
                assert abs(r["px"] - verts[0][0]) < 1e-6
                assert abs(r["py"] - verts[0][1]) < 1e-6


class TestCompactCells:
    def test_expansion_reproduces_the_leaf_set(self, spark, sf_dir):
        """Compaction must be lossless: expanding every output cell
        back to res-12 leaves reproduces the input cover exactly."""
        from osm2vdv462_spark.queries.geo_queries import compact_cell_cover

        rows = compact_cell_cover(spark, sf_dir).collect()
        assert len(rows) > 0
        by_res = {}
        leaves = set()
        for r in rows:
            by_res[r["res"]] = by_res.get(r["res"], 0) + 1
            res, ix, iy = (
                r["cell"] >> 57,
                (r["cell"] >> 28) & ((1 << 29) - 1),
                r["cell"] & ((1 << 28) - 1),
            )
            assert res == r["res"]
            f = 1 << (12 - res)
            for a in range(f):
                for b in range(f):
                    leaves.add((ix * f + a, iy * f + b))
        want = {
            (4088 + k % 12, 2040 + k // 12)
            for k in range(144)
            if ((4088 + k % 12) * 3 + (2040 + k // 12) * 7) % 11 != 0
        }
        assert leaves == want
        # compaction actually happened at both levels
        assert by_res.get(11, 0) > 0 and by_res.get(10, 0) > 0
        assert sum(by_res.values()) < len(want)


class TestSessionEightPlanShapes:
    """Plan-shape guards for the session-8 spatial-stats operators:
    the pair-candidate join must never broadcast a fact-sized side."""

    def test_ripley_pins_shuffle_hash(self, spark, sf_dir):
        from osm2vdv462_spark.queries.geo_queries import ripley_k_function

        plan = (
            ripley_k_function(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ShuffledHashJoin" in plan  # point x point stays shuffled

    def test_rect_union_broadcasts_slabs_not_rects(self, spark, sf_dir):
        from osm2vdv462_spark.queries.geo_queries import rect_union_area

        plan = (
            rect_union_area(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # right-outer BNLJ builds (broadcasts) the RIGHT side = the
        # edge-count-sized slab list; the rect side streams
        assert "BroadcastNestedLoopJoin BuildRight, RightOuter" in plan
