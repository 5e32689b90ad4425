"""Hexagonal cell index (functions/hexgrid.py): the three twins
(numpy / Catalyst / DuckDB SQL) must agree bit-for-bit, and the
binning must have the defining hexagon properties — every point lands
in the cell whose center is genuinely nearest (Voronoi), within one
circumradius."""

import duckdb
import numpy as np

from osm2vdv462_spark.functions import hexgrid as hg

SIZE = 0.37
NEI = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]


def _fuzz(n=20000, seed=5):
    rng = np.random.default_rng(seed)
    return rng.uniform(-10, 10, n), rng.uniform(-10, 10, n)


class TestNumpyTwin:
    def test_voronoi_property_and_circumradius_bound(self):
        x, y = _fuzz()
        ids = hg.hex_ids_np(x, y, SIZE)
        q, r = hg.unpack_np(ids)
        cx, cy = hg.center_np(ids, SIZE)
        d_own = np.hypot(x - cx, y - cy)
        assert (d_own <= SIZE + 1e-9).all()
        for dq, dr in NEI:
            nid = ((q + dq + hg.OFF) << 21) | ((r + dr) + hg.OFF)
            nx, ny = hg.center_np(nid, SIZE)
            assert (d_own <= np.hypot(x - nx, y - ny) + 1e-9).all()

    def test_pack_roundtrip_including_negatives(self):
        x, y = _fuzz(5000, seed=7)
        ids = hg.hex_ids_np(x, y, SIZE)
        q, r = hg.unpack_np(ids)
        assert ((((q + hg.OFF) << 21) | (r + hg.OFF)) == ids).all()
        assert q.min() < 0 < q.max() and r.min() < 0 < r.max()

    def test_cube_constraint(self):
        """Cube rounding must keep q + y + r == 0 (y = -q - r), i.e.
        the repaired axis really was reset."""
        x, y = _fuzz(8000, seed=11)
        # adversarial points near cell boundaries: offset centers
        ids0 = hg.hex_ids_np(x, y, SIZE)
        cx, cy = hg.center_np(ids0, SIZE)
        bx = (x + cx) / 2 + SIZE * 0.49
        ids = hg.hex_ids_np(bx, y, SIZE)
        q, r = hg.unpack_np(ids)
        cx2, cy2 = hg.center_np(ids, SIZE)
        assert (np.hypot(bx - cx2, y - cy2) <= SIZE + 1e-9).all()


class TestCatalystTwin:
    def test_matches_numpy_and_stays_jvm_side(self, spark):
        x, y = _fuzz(2500, seed=9)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double",
        )
        out = hg.with_hexbin(df, "x", "y", SIZE)
        got = np.array(out.select("hex_id").toPandas()["hex_id"])
        assert sorted(got.tolist()) == sorted(
            hg.hex_ids_np(x, y, SIZE).tolist()
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan

    def test_unpack_columns_roundtrip(self, spark):
        x, y = _fuzz(500, seed=13)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double",
        )
        from pyspark.sql import functions as F

        got = (
            hg.with_hexbin(df, "x", "y", SIZE)
            .select(
                hg.hex_q(F.col("hex_id")).alias("q"),
                hg.hex_r(F.col("hex_id")).alias("r"),
            )
            .toPandas()
        )
        q, r = hg.unpack_np(hg.hex_ids_np(x, y, SIZE))
        assert sorted(zip(got["q"], got["r"])) == sorted(
            zip(q.tolist(), r.tolist())
        )


class TestSqlTwin:
    def test_matches_numpy_in_duckdb(self):
        x, y = _fuzz(1500, seed=15)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ",".join(f"({a!r},{b!r})" for a, b in zip(x, y))
            + ") v(x, y)"
        )
        got = [
            r[0]
            for r in con.execute(
                f"SELECT {hg.hexbin_sql('x', 'y', SIZE)} FROM t"
            ).fetchall()
        ]
        assert got == hg.hex_ids_np(x, y, SIZE).tolist()
