"""S2-style cube-face Hilbert cell index (functions/s2cells.py): the
three twins (numpy / Catalyst / DuckDB SQL) must agree bit-for-bit, and
the index must actually have the properties the partitioning design
buys it for (space-filling locality, hierarchy-by-shift, bounded
distortion across faces)."""

import duckdb
import numpy as np
import pytest

from osm2vdv462_spark.functions import s2cells as s2


def _serial_xy2d(n, x, y):
    """Canonical serial Hilbert xy2d (public Hamilton/Warren form) —
    an implementation INDEPENDENT of the vectorized one under test."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _fuzz(n=800, seed=3):
    rng = np.random.default_rng(seed)
    return (
        rng.uniform(-179.95, 179.95, n),
        rng.uniform(-89.95, 89.95, n),
    )


class TestHilbert:
    def test_matches_serial_reference_and_is_a_curve(self):
        level = 5
        n = 1 << level
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        vec = s2._hilbert_d(xs.ravel(), ys.ravel(), level)
        ser = [
            _serial_xy2d(n, int(a), int(b))
            for a, b in zip(xs.ravel(), ys.ravel())
        ]
        assert vec.tolist() == ser
        # bijection onto 0..n^2-1 and unit-step continuity: the
        # locality that makes range partitioning on the id work
        order = np.argsort(vec)
        assert sorted(vec.tolist()) == list(range(n * n))
        step = np.abs(np.diff(xs.ravel()[order])) + np.abs(
            np.diff(ys.ravel()[order])
        )
        assert (step == 1).all()


class TestCellIds:
    def test_parent_is_child_shifted(self):
        lon, lat = _fuzz()
        for lev in (2, 7, 12):
            assert (
                (s2.cell_ids(lon, lat, lev) >> 2)
                == s2.cell_ids(lon, lat, lev - 1)
            ).all()

    def test_every_face_reached_and_ids_in_range(self):
        lon, lat = _fuzz(4000)
        ids = s2.cell_ids(lon, lat, 6)
        faces = np.unique(ids >> 12)
        assert faces.tolist() == [0, 1, 2, 3, 4, 5]
        assert (ids >= 0).all() and (ids < 6 << 12).all()

    def test_cell_population_is_balanced_across_faces(self):
        """Bounded distortion: a uniform-on-sphere sample puts a
        comparable share on each cube face (the property equal-angle
        lon/lat tiles lack at the poles)."""
        rng = np.random.default_rng(5)
        # uniform on the sphere via normal deviates
        xyz = rng.normal(size=(20000, 3))
        xyz /= np.linalg.norm(xyz, axis=1, keepdims=True)
        lat = np.degrees(np.arcsin(xyz[:, 2]))
        lon = np.degrees(np.arctan2(xyz[:, 1], xyz[:, 0]))
        ids = s2.cell_ids(lon, lat, 4)
        share = np.bincount(ids >> 8, minlength=6) / len(ids)
        assert share.min() > 0.12 and share.max() < 0.22  # ideal 1/6

    def test_level_validation(self):
        with pytest.raises(ValueError):
            s2.cell_ids([0.0], [0.0], 0)
        with pytest.raises(ValueError):
            s2.cell_ids([0.0], [0.0], s2.MAX_LEVEL + 1)


class TestTwins:
    def test_catalyst_twin_bit_identical(self, spark):
        lon, lat = _fuzz(1500, seed=9)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(lon, lat)],
            "lon double, lat double",
        )
        for lev in (1, 6, 12, s2.MAX_LEVEL):
            got = {
                (r.lon, r.lat): r.s2_cell
                for r in s2.with_s2_cell(df, "lon", "lat", lev).collect()
            }
            for a, b, w in zip(lon, lat, s2.cell_ids(lon, lat, lev)):
                assert got[(a, b)] == w

    def test_catalyst_plan_is_codegen_map_only(self, spark):
        df = spark.createDataFrame([(1.0, 2.0)], "lon double, lat double")
        plan = (
            s2.with_s2_cell(df, "lon", "lat", 10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "*(1)" in plan  # whole-stage codegen stage
        assert "Exchange" not in plan and "Python" not in plan

    def test_duckdb_twin_bit_identical(self):
        lon, lat = _fuzz(600, seed=21)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pts AS SELECT * FROM (VALUES "
            + ",".join(f"({a!r},{b!r})" for a, b in zip(lon, lat))
            + ") t(lon, lat)"
        )
        for lev in (1, 8, 12):
            got = [
                r[0]
                for r in con.execute(
                    f"SELECT {s2.s2_sql('lon', 'lat', lev)} FROM pts"
                ).fetchall()
            ]
            assert got == s2.cell_ids(lon, lat, lev).tolist()
