"""MVT wire codec (functions/mvt.py): spec command stream, zigzag
edges, holes, negative/buffered coordinates, deterministic bytes, and
the concatenation property of protobuf repeated fields."""

import numpy as np

from osm2vdv462_spark.functions import mvt


def _sq(x0, y0, s):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], np.int64
    )


class TestGeometry:
    def test_command_stream_shape(self):
        cmds = mvt.geometry_commands([_sq(10, 20, 5)])
        # MoveTo(1), dx, dy, LineTo(3), 3 pairs, ClosePath(1)
        assert cmds[0] == (1 | (1 << 3))  # 9
        assert cmds[3] == (2 | (3 << 3))  # 26
        assert cmds[-1] == (7 | (1 << 3))  # 15
        assert len(cmds) == 1 + 2 + 1 + 6 + 1

    def test_zigzag_deltas(self):
        cmds = mvt.geometry_commands([np.array([[1, -1], [0, 0], [2, 2]])])
        # first point (1,-1): zz(1)=2, zz(-1)=1
        assert cmds[1] == 2 and cmds[2] == 1
        # delta to (0,0): zz(-1)=1, zz(1)=2
        assert cmds[4] == 1 and cmds[5] == 2

    def test_cursor_carries_across_rings(self):
        outer, hole = _sq(0, 0, 100), _sq(40, 40, 10)
        cmds = mvt.geometry_commands([outer, hole])
        buf = mvt.encode_tile("l", [(1, [outer, hole], {})])
        rings = mvt.decode_tile(buf)[0]["features"][0]["rings"]
        assert len(rings) == 2
        np.testing.assert_array_equal(rings[0], outer)
        np.testing.assert_array_equal(rings[1], hole)
        # the hole's MoveTo is a DELTA from the outer ring's last vertex
        zx = cmds[1 + 2 + 1 + 6 + 1 + 1]  # first param of second MoveTo
        assert ((zx >> 1) ^ -(zx & 1)) == 40 - 0  # from (0,100) x-cursor


class TestTileRoundTrip:
    def test_features_props_and_buffered_coords(self):
        f1 = (7, [_sq(-64, -64, 32)], {"name": "a", "kind": "stop"})
        f2 = (9, [_sq(4000, 4000, 500)], {"name": "b", "kind": "stop"})
        buf = mvt.encode_tile("stops", [f1, f2], extent=4096)
        layers = mvt.decode_tile(buf)
        assert len(layers) == 1
        lay = layers[0]
        assert lay["name"] == "stops"
        assert lay["version"] == 2 and lay["extent"] == 4096
        got = {f["id"]: f for f in lay["features"]}
        assert set(got) == {7, 9}
        np.testing.assert_array_equal(got[7]["rings"][0], f1[1][0])
        np.testing.assert_array_equal(got[9]["rings"][0], f2[1][0])
        assert got[7]["props"] == {"name": "a", "kind": "stop"}
        assert got[9]["props"] == {"name": "b", "kind": "stop"}
        # value table deduplicates: 'stop' appears once in the layer
        assert buf.count(b"stop") == 1 + buf.count(b"stops")

    def test_deterministic_bytes(self):
        feats = [(1, [_sq(0, 0, 10)], {"name": "x"})]
        assert mvt.encode_tile("l", feats) == mvt.encode_tile("l", feats)

    def test_concatenated_tiles_merge_layers(self):
        # protobuf repeated-field semantics: concatenated Tile messages
        # decode as one tile with both layers (how tile pyramids merge)
        a = mvt.encode_tile("la", [(1, [_sq(0, 0, 4)], {})])
        b = mvt.encode_tile("lb", [(2, [_sq(8, 8, 4)], {})])
        layers = mvt.decode_tile(a + b)
        assert [l["name"] for l in layers] == ["la", "lb"]

    def test_geom_len_is_wire_payload(self):
        ring = _sq(100, 100, 50)
        buf = mvt.encode_tile("l", [(1, [ring], {})])
        f = mvt.decode_tile(buf)[0]["features"][0]
        cmds = mvt.geometry_commands([ring])
        from osm2vdv462_spark.sources.pbf import encode_packed_varints

        assert f["geom_len"] == len(
            encode_packed_varints(np.asarray(cmds, np.int64))
        )


class TestTileSinkSource:
    def test_write_read_roundtrip(self, spark, sf_dir, tmp_path):
        """Octagon layer -> executor-written .mvt files + manifest ->
        distributed binaryFile decode: every (tile, feature) must
        survive with its vertex count, and the manifest must agree
        with both sides."""
        from pyspark.sql import functions as F

        from osm2vdv462_spark.pipeline import datagen
        from osm2vdv462_spark.sources import mvtiles

        polys = datagen.stop_area_octagons(spark, sf_dir).select(
            F.col("relation_id").cast("bigint").alias("feature_id"),
            "geom",
            (F.lit(-2000) + 1000 * (F.col("relation_id") % 5))
            .cast("long")
            .alias("cx"),
            (F.lit(-2000) + 1000 * F.expr("relation_id div 5"))
            .cast("long")
            .alias("cy"),
        )
        cand = mvtiles.tile_candidates(polys)
        out = str(tmp_path / "tiles")
        manifest = mvtiles.write_tiles(cand, out)
        assert manifest and all(
            r["path"].endswith(".mvt") for r in manifest
        )
        import json
        import os

        with open(os.path.join(out, "manifest.json")) as fh:
            assert json.load(fh) == manifest

        back = mvtiles.read_tiles(spark, out).collect()
        got = {(r["tile_x"], r["tile_y"], r["feature_id"]): r for r in back}
        want = {
            (r["tile_x"], r["tile_y"], r["feature_id"])
            for r in cand.select("tile_x", "tile_y", "feature_id").collect()
        }
        assert set(got) == want
        for k, r in got.items():
            assert r["n_vertices"] == 8  # open octagon ring
            assert r["layer"] == "stop_areas"
            assert r["name"] == f"rel_{k[2]}"
        # per-tile feature counts agree with the manifest
        from collections import Counter

        counts = Counter((t, y) for t, y, _ in got)
        assert {(r["tile_x"], r["tile_y"]): r["n_features"] for r in manifest} == dict(counts)
