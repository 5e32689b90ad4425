"""Geohash cell index (functions/geohash.py): the three twins
(numpy / Catalyst / DuckDB SQL) must agree bit-for-bit with an
INDEPENDENT classic bisection geohash and the canonical public
vectors, and the string-prefix hierarchy the partitioning design
relies on must hold exactly."""

import duckdb
import numpy as np

from osm2vdv462_spark.functions import geohash as gh


def _classic(lat, lon, precision):
    """Textbook per-bit interval bisection — independent of the
    closed form under test."""
    lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
    bits = [16, 8, 4, 2, 1]
    b = ch = 0
    even = True
    out = []
    while len(out) < precision:
        if even:
            mid = (lon_i[0] + lon_i[1]) / 2
            if lon > mid:
                ch |= bits[b]
                lon_i = (mid, lon_i[1])
            else:
                lon_i = (lon_i[0], mid)
        else:
            mid = (lat_i[0] + lat_i[1]) / 2
            if lat > mid:
                ch |= bits[b]
                lat_i = (mid, lat_i[1])
            else:
                lat_i = (lat_i[0], mid)
        even = not even
        if b < 4:
            b += 1
        else:
            out.append(gh.ALPHABET[ch])
            b = ch = 0
    return "".join(out)


def _fuzz(n=3000, seed=17):
    rng = np.random.default_rng(seed)
    return rng.uniform(-179.9, 179.9, n), rng.uniform(-89.9, 89.9, n)


class TestNumpyTwin:
    def test_canonical_public_vectors(self):
        assert gh.encode_np(10.40744, 57.64911, 11) == "u4pruydqqvj"
        assert gh.encode_np(-5.603, 42.605, 5) == "ezs42"

    def test_matches_classic_bisection(self):
        lon, lat = _fuzz()
        for p in (1, 4, 6, 7, 12):
            mine = gh.encode_np(lon, lat, p)
            ref = np.array([_classic(a, o, p) for o, a in zip(lon, lat)])
            assert (mine == ref).all()

    def test_prefix_hierarchy(self):
        """first p chars of precision-12 == precision-p hash: the
        property that makes lexicographic ranges spatial ranges."""
        lon, lat = _fuzz(1000, seed=23)
        g12 = gh.encode_np(lon, lat, 12)
        for p in (1, 3, 5, 6, 8, 11):
            assert (
                gh.encode_np(lon, lat, p)
                == np.array([s[:p] for s in g12])
            ).all()

    def test_locality_of_sorted_order(self):
        """Sorting by geohash clusters spatially: consecutive hashes in
        sorted order are overwhelmingly near each other (same coarse
        cell), which is what range partitioning on the key buys."""
        rng = np.random.default_rng(29)
        n = 4000
        lon = rng.uniform(13.0, 14.0, n)  # a dense city-scale box
        lat = rng.uniform(50.5, 51.5, n)
        g = gh.encode_np(lon, lat, 7)
        order = np.argsort(g)
        lo, la = lon[order], lat[order]
        step = np.abs(np.diff(lo)) + np.abs(np.diff(la))
        rand_step = np.abs(np.diff(lon)) + np.abs(np.diff(lat))
        # consecutive-in-sorted-order points are far closer together
        # than consecutive-in-arrival-order points
        assert np.median(step) < np.median(rand_step) / 10


class TestCatalystTwin:
    def test_matches_numpy_and_stays_jvm_side(self, spark):
        lon, lat = _fuzz(1500, seed=31)
        df = spark.createDataFrame(
            [(float(o), float(a)) for o, a in zip(lon, lat)],
            "lon double, lat double",
        )
        out = gh.with_geohash(df, "lon", "lat", 7)
        got = out.select("geohash").toPandas()["geohash"].to_numpy()
        # collect order == input order for a narrow local scan; compare
        # as multisets to stay robust anyway
        assert sorted(got) == sorted(gh.encode_np(lon, lat, 7).tolist())
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan  # zero Python on the hot path

    def test_poles_and_antimeridian_clamp(self, spark):
        edge = [(-180.0, -90.0), (180.0, 90.0), (0.0, 0.0), (179.999999, 89.999999)]
        df = spark.createDataFrame(edge, "lon double, lat double")
        got = (
            gh.with_geohash(df, "lon", "lat", 6)
            .select("geohash")
            .toPandas()["geohash"]
            .tolist()
        )
        assert sorted(got) == sorted(
            gh.encode_np(
                np.array([e[0] for e in edge]), np.array([e[1] for e in edge]), 6
            ).tolist()
        )
        assert all(len(s) == 6 for s in got)


class TestSqlTwin:
    def test_matches_numpy_in_duckdb(self):
        lon, lat = _fuzz(800, seed=37)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ",".join(f"({o!r},{a!r})" for o, a in zip(lon, lat))
            + ") v(lon, lat)"
        )
        for p in (4, 7):
            got = [
                r[0]
                for r in con.execute(
                    f"SELECT {gh.geohash_sql('lon', 'lat', p)} FROM t"
                ).fetchall()
            ]
            assert got == gh.encode_np(lon, lat, p).tolist()
