"""Routing stage tests: stop_area_edges fan-out (J8/U1), path synthesis,
and the R1-R5 stitcher vs a hand-computed oracle (ref ppr.py:99-224)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.geo import wkb as _wkb
from osm2vdv462_spark.pipeline import routing, stop_places as sp
from osm2vdv462_spark.pipeline.world import world_dfs


@pytest.fixture(scope="module")
def world(spark):
    return world_dfs(spark, n_areas=2, seed=42)


@pytest.fixture(scope="module")
def quays_entrances(spark, world):
    pww = sp.platforms_with_width(world["platforms"])
    split = sp.platforms_split(pww, world["platforms_edges"])
    merged = sp.platforms_merged(split)
    fq = sp.final_quays(merged, world["stop_areas_members_ref"]).cache()
    fe = sp.final_entrances(world["entrances"], world["stop_areas_members_ref"]).cache()
    return fq, fe


@pytest.fixture(scope="module")
def edges(spark, quays_entrances):
    fq, fe = quays_entrances
    return routing.stop_area_edges(fq, fe).cache()


@pytest.fixture(scope="module")
def stitched(spark, edges):
    routes = routing.synthesize_routes(edges)
    return routing.stitch_path_links(routes)


class TestEdges:
    def test_pair_counts(self, edges, quays_entrances):
        fq, fe = quays_entrances
        per_rel_q = {r["relation_id"]: r["n"] for r in fq.groupBy("relation_id").agg(F.count("*").alias("n")).collect()}
        per_rel_e = {r["relation_id"]: r["n"] for r in fe.groupBy("relation_id").agg(F.count("*").alias("n")).collect()}
        expected = sum(
            q * (q - 1) + 2 * q * per_rel_e.get(rel, 0)
            for rel, q in per_rel_q.items()
        )
        assert edges.count() == expected

    def test_directional(self, edges):
        qq = edges.filter((F.col("start_type") == "QUAY") & (F.col("end_type") == "QUAY"))
        pairs = {(r["start_IFOPT"], r["end_IFOPT"]) for r in qq.collect()}
        for a, b in pairs:
            assert (b, a) in pairs  # both directions present
            assert a != b


class TestStitcher:
    def test_access_spaces_only_for_transitions(self, spark, stitched, edges):
        links, access, refs = stitched
        # variant 2 routes (single footway) produce no access space;
        # variants 0/1 produce two (entering AND leaving the
        # stairs/elevator both transition) -> bound is 2 per route
        n_routes = edges.count()
        assert 0 < access.count() <= 2 * n_routes

    def test_path_link_chain(self, spark, stitched):
        links, access, refs = stitched
        rows = links.collect()
        assert rows
        for r in rows:
            e = r["edge"]
            assert e["fromType"] in ("QUAY", "ENTRANCE", "ACCESS_SPACE")
            assert e["toType"] in ("QUAY", "ENTRANCE", "ACCESS_SPACE")
            g = _wkb.decode(bytes(r["geom"]))
            assert g.type_name == "LineString"
            assert len(g.coords) >= 2

    def test_level_delta_semantics(self, spark, stitched):
        links, access, refs = stitched
        # stairs variant: first link delta +1 == access level 1 - 0;
        # elevator variant: delta -1
        deltas = {r["level"] for r in links.collect()}
        assert 1.0 in deltas or -1.0 in deltas
        # complementary second leg returns delta 0 (same level continues)
        assert 0.0 in deltas

    def test_access_space_ifopt_format(self, spark, stitched):
        links, access, refs = stitched
        for r in access.collect():
            assert r["IFOPT"] == f"{r['relation_id']}_{r['node_id']}:{int(r['level']) if float(r['level']).is_integer() else r['level']}"

    def test_refs_unique_and_typed(self, spark, stitched):
        links, access, refs = stitched
        n = refs.count()
        assert n == refs.dropDuplicates(["path_id", "osm_type", "osm_id"]).count()
        assert {r["osm_type"] for r in refs.collect()} <= {"N", "W"}

    def test_path_ids_deterministic(self, spark, edges):
        routes = routing.synthesize_routes(edges)
        l1, _, _ = routing.stitch_path_links(routes)
        l2, _, _ = routing.stitch_path_links(routing.synthesize_routes(edges))
        assert sorted(r["path_id"] for r in l1.collect()) == sorted(
            r["path_id"] for r in l2.collect()
        )


class TestOracleStitch:
    """Hand-built 5-edge route exercising the reference's documented
    example (ppr.py:133-153 diagram): footway -> stairs -> elevator ->
    footway -> escalator."""

    def _route(self, spark):
        def e(seq, et, st, level, way, fn, tn, p0, p1):
            return (
                "rk", 100, "q:a", "q:b", "QUAY", "QUAY", seq, et, st, None,
                None, level, way, fn, tn, [p0, p1],
            )

        rows = [
            e(0, "footway", None, 0.0, 11, 1, 2, [0.0, 0.0], [0.001, 0.0]),
            e(1, "footway", "stairs", 1.0, 12, 2, 3, [0.001, 0.0], [0.002, 0.0]),
            e(2, "elevator", None, -1.0, -3, 3, 3, [0.002, 0.0], [0.002, 0.0]),
            e(3, "footway", None, -1.0, 13, 3, 4, [0.002, 0.0], [0.003, 0.0]),
            e(4, "footway", "escalator", 0.0, 14, 4, 5, [0.003, 0.0], [0.004, 0.0]),
        ]
        return spark.createDataFrame(rows, routing._EDGE_SCHEMA)

    def test_split_points(self, spark):
        links, access, refs = routing.stitch_path_links(self._route(spark))
        lr = links.collect()
        ar = sorted(access.collect(), key=lambda r: (r["node_id"], r["level"]))
        # 4 access spaces (every adjacent pair transitions) -> 5 links
        assert len(lr) == 5
        assert len(ar) == 4
        # node 2 enters stairs: level from previous edge (0)
        assert (ar[0]["node_id"], ar[0]["level"]) == (2, 0.0)
        # node 3: entering the elevator uses the previous edge's level
        # (stairs, 1); leaving it uses the current edge's level (-1);
        # sorted by (node_id, level) -> -1 first
        assert (ar[1]["node_id"], ar[1]["level"]) == (3, -1.0)
        assert (ar[2]["node_id"], ar[2]["level"]) == (3, 1.0)
        # node 4 enters escalator: level from previous edge (-1)
        assert (ar[3]["node_id"], ar[3]["level"]) == (4, -1.0)
        # IFOPTs
        assert ar[1]["IFOPT"] == "100_3:-1"
        assert ar[2]["IFOPT"] == "100_3:1"
        # chain: QUAY -> AS -> AS -> AS -> AS -> QUAY
        chain = sorted(
            [(r["edge"]["fromIFOPT"], r["edge"]["toIFOPT"], r["level"]) for r in lr]
        )
        froms = {c[0] for c in chain}
        assert "q:a" in froms and any(c[1] == "q:b" for c in chain)

    def test_refs_oracle(self, spark):
        links, access, refs = routing.stitch_path_links(self._route(spark))
        got = {(r["osm_type"], r["osm_id"]) for r in refs.collect()}
        # ways 11-14 present; elevator contributes node 3 (abs(-3));
        # intermediate to-nodes present except last-edge rule
        assert ("W", 11) in got and ("W", 12) in got and ("W", 13) in got and ("W", 14) in got
        assert ("N", 3) in got


class TestSitePathLinks:
    def test_tag_resolution_with_way_pool(self, spark, world, edges):
        hw = world["highways"]
        # way_pool: every highway way offered to every relation (small world)
        rels = [r["relation_id"] for r in world["stop_areas"].collect()]
        pool_rows = [(rel, r["osm_id"]) for rel in rels for r in hw.collect()]
        pool = spark.createDataFrame(pool_rows, "relation_id long, osm_id long")
        routes = routing.synthesize_routes(edges, way_pool=pool)
        links, access, refs = routing.stitch_path_links(routes)
        fspl = routing.final_site_path_links(links, refs, hw)
        rows = fspl.collect()
        assert len(rows) == links.count()
        tagged = [r for r in rows if r["tags"]]
        assert tagged, "way-pool ids must resolve to highway tags"
        for r in tagged:
            assert "highway" in r["tags"]

    def test_empty_tags_fallback(self, spark, stitched, world):
        links, access, refs = stitched  # synthetic way ids: no matches
        fspl = routing.final_site_path_links(links, refs, world["highways"])
        for r in fspl.collect():
            assert r["tags"] == {}
