"""Platform pipeline tests vs brute-force expectations on the synthetic
OSM world (ref views: platforms_with_width / platforms_split /
platforms_merged / final_quays, stop_places.sql:961-1107)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.geo import wkb as _wkb
from osm2vdv462_spark.pipeline import stop_places as sp
from osm2vdv462_spark.pipeline.world import world_dfs, _rect


@pytest.fixture(scope="module")
def world(spark):
    return world_dfs(spark, n_areas=4, seed=42)


@pytest.fixture(scope="module")
def pww(spark, world):
    return sp.platforms_with_width(world["platforms"]).cache()


@pytest.fixture(scope="module")
def split(spark, world, pww):
    return sp.platforms_split(pww, world["platforms_edges"]).cache()


@pytest.fixture(scope="module")
def merged(spark, split):
    return sp.platforms_merged(split).cache()


class TestWidth:
    def test_polygon_width_close_to_truth(self, pww):
        rows = pww.filter(F.element_at("tags", "ref") == "1").collect()
        assert rows
        for r in rows:
            w = float(r["tags"]["est_width"])
            assert abs(w - 5.0) < 0.35, w  # 30x5 m rotated rect

    def test_non_polygon_has_no_width(self, pww):
        rows = pww.filter(F.element_at("tags", "ref") == "9").collect()
        for r in rows:
            assert "est_width" not in r["tags"]


class TestSplit:
    def test_multi_ifopt_explodes(self, split):
        rows = split.filter(F.col("IFOPT").endswith(":3") | F.col("IFOPT").endswith(":4")).collect()
        # areas 0 and 2 have the island platform -> 2 rows each
        assert len(rows) == 4
        for r in rows:
            # each split row picked up its ref-matching platform edge:
            # geometry replaced by the edge linestring, tags merged
            assert _wkb.geom_type_name(bytes(r["geom"])) == "LineString"
            assert r["tags"]["railway"] == "platform_edge"
            assert r["tags"]["public_transport"] == "platform"
            # positional ref: IFOPT :3 -> ref 3, :4 -> ref 4
            assert r["tags"]["ref"] == r["IFOPT"][-1]

    def test_single_ifopt_kept_without_edge(self, split):
        rows = split.filter(F.col("IFOPT").endswith(":1")).collect()
        assert len(rows) == 4  # one per area, unchanged
        for r in rows:
            assert _wkb.geom_type_name(bytes(r["geom"])) == "Polygon"
            assert "railway" not in r["tags"]


class TestMerged:
    def test_touching_same_ifopt_merge(self, merged, split):
        m2 = merged.filter(F.col("IFOPT").endswith(":2")).collect()
        assert len(m2) == 4  # one merged row per area
        for r in m2:
            assert r["tags"].get("surface") == "paving_stones"
            assert r["tags"].get("bench") == "yes"  # tags combined
            g = _wkb.decode(bytes(r["geom"]))
            assert g.type_name == "MultiPolygon"

    def test_merged_keeps_min_osm_id(self, merged, split):
        s2 = split.filter(F.col("IFOPT").endswith(":2"))
        expected = {
            r["IFOPT"]: r["mn"]
            for r in s2.groupBy("IFOPT").agg(F.min("osm_id").alias("mn")).collect()
        }
        for r in merged.filter(F.col("IFOPT").endswith(":2")).collect():
            assert r["osm_id"] == expected[r["IFOPT"]]

    def test_row_count_matches_bruteforce(self, merged, split):
        # brute force: global connected components of intersects graph,
        # group by (IFOPT, component)
        from osm2vdv462_spark.geo import kernel

        rows = split.collect()
        geoms = [_wkb.decode(bytes(r["geom"])) for r in rows]
        n = len(rows)
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(n):
            for j in range(i + 1, n):
                if kernel.geoms_intersect(geoms[i], geoms[j]):
                    parent[find(i)] = find(j)
        groups = {(rows[i]["IFOPT"], find(i)) for i in range(n)}
        assert merged.count() == len(groups)

    def test_chain_merges_through_other_ifopt(self, spark):
        # A(X) touches B(Y) touches C(X); A and C do NOT touch ->
        # global DBSCAN puts all three in one cluster -> X group = {A, C}
        # merged even though they don't touch (reference semantics:
        # ST_ClusterDBSCAN ... OVER () is global, stop_places.sql:1062)
        rows = [
            (1, "W", "X", {"ref": "a"}, bytearray(_wkb.encode_polygon([_rect(0, 0, 10, 10)]))),
            (2, "W", "Y", {"ref": "b"}, bytearray(_wkb.encode_polygon([_rect(10 / 111320.0, 0, 10, 10)]))),
            (3, "W", "X", {"ref": "c"}, bytearray(_wkb.encode_polygon([_rect(20 / 111320.0, 0, 10, 10)]))),
        ]
        df = spark.createDataFrame(
            rows,
            "osm_id long, osm_type string, IFOPT string, tags map<string,string>, geom binary",
        )
        out = sp.platforms_merged(df)
        got = {(r["IFOPT"], r["osm_id"]) for r in out.collect()}
        assert got == {("X", 1), ("Y", 2)}


class TestFinalViews:
    def test_final_quays_membership(self, spark, world, merged):
        fq = sp.final_quays(merged, world["stop_areas_members_ref"])
        rows = fq.collect()
        assert all(r["relation_id"] >= 1000 for r in rows)
        # every merged platform whose representative id is a member joins
        member_ids = {
            (r["member_id"], r["osm_type"])
            for r in world["stop_areas_members_ref"].collect()
        }
        merged_ids = {(r["osm_id"], r["osm_type"]) for r in merged.collect()}
        assert len(rows) >= len(member_ids & merged_ids)
        for r in rows:
            assert r["level"] in (0.0, -1.0)

    def test_final_entrances(self, spark, world):
        fe = sp.final_entrances(world["entrances"], world["stop_areas_members_ref"])
        rows = fe.collect()
        assert len(rows) == world["entrances"].count()
        for r in rows:
            assert r["IFOPT"] == str(r["node_id"])
            assert r["level"] == 0.0

    def test_final_access_spaces_tag_fallback(self, spark, world):
        acc = spark.createDataFrame(
            [(999999, 1000, 0.0, "1000_999999:0", bytearray(_wkb.encode_point(11.5, 48.1)))],
            "node_id long, relation_id long, level double, IFOPT string, geom binary",
        )
        out = sp.final_access_spaces(acc, world["pois"]).collect()
        assert out[0]["tags"] == {}  # empty-map fallback, not NULL


class TestParsers:
    def test_parse_length(self, spark):
        from osm2vdv462_spark.functions.parsers import parse_length_cm

        df = spark.createDataFrame(
            [("3 m",), ("250 cm",), ("2.5",), ("3m",), ("junk",), ("4 km",)],
            "v string",
        )
        got = [r[0] for r in df.select(parse_length_cm(F.col("v"))).collect()]
        assert got == [300.0, 250.0, 250.0, None, None, None]

    def test_parse_weight(self, spark):
        from osm2vdv462_spark.functions.parsers import parse_weight_kg

        df = spark.createDataFrame(
            [("0.63 t",), ("500 kg",), ("2",), ("700 g",), ("x",)], "v string"
        )
        got = [r[0] for r in df.select(parse_weight_kg(F.col("v"))).collect()]
        assert got == [630.0, 500.0, 2000.0, 0.7, None]

    def test_parse_duration(self, spark):
        from osm2vdv462_spark.functions.parsers import parse_duration_s

        df = spark.createDataFrame(
            [("5",), ("01:30",), ("00:05:30",), ("2 h",), ("10 min",), ("nope",)],
            "v string",
        )
        got = [r[0] for r in df.select(parse_duration_s(F.col("v"))).collect()]
        assert got == [300.0, 5400.0, 330.0, 7200.0, 600.0, None]

    def test_parse_incline(self, spark):
        from osm2vdv462_spark.functions.parsers import parse_incline_pct

        df = spark.createDataFrame(
            [("12%",), ("45°",), ("up",), ("down",), ("5",), ("-3%",)], "v string"
        )
        got = [r[0] for r in df.select(parse_incline_pct(F.col("v"))).collect()]
        assert got[0] == 12.0
        assert abs(got[1] - 100.0) < 1e-9
        assert got[2] is None and got[3] is None and got[4] is None
        assert got[5] == -3.0

    def test_get_level_and_level_id(self, spark):
        from osm2vdv462_spark.functions.parsers import create_level_id, get_level

        df = spark.createDataFrame(
            [({"level": "1;2"},), ({"level": "0.5"},), ({},), ({"level": "x"},)],
            "tags map<string,string>",
        )
        got = [r[0] for r in df.select(get_level(F.col("tags"))).collect()]
        assert got == [1.0, 0.5, 0.0, 0.0]
        df2 = spark.createDataFrame([(7, 0.0), (7, 0.5)], "id long, lvl double")
        got2 = [
            r[0]
            for r in df2.select(create_level_id(F.col("id"), F.col("lvl"))).collect()
        ]
        assert got2 == ["7:0", "7:0.5"]
