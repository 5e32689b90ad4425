"""END-TO-END ON REAL DATA: raw .osm.pbf (the reference's own example
extract) -> scan -> dispatch -> way-geometry assembly -> full
stop-places pipeline -> per-stop-place NeTEx documents -> structural
validation. This is the reference's actual production scenario
(osm2pgsql ingest + SQL views + export, validated by xmllint in CI),
run entirely through the Spark engine."""

import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.pipeline import (
    export as ex,
    osm_world,
    routing,
    stop_places as sp,
    validate as V,
)

CHEMNITZ = "/root/reference/example_data/chemnitz-bernsdorf.osm.pbf"


@pytest.fixture(scope="module")
def chemnitz(spark):
    w = osm_world.world_from_pbf(spark, CHEMNITZ)
    pww = sp.platforms_with_width(w["platforms"]).localCheckpoint(eager=True)
    split = sp.platforms_split(pww, w["platforms_edges"]).localCheckpoint(eager=True)
    merged = sp.platforms_merged(split).localCheckpoint(eager=True)
    fq = sp.final_quays(merged, w["stop_areas_members_ref"]).localCheckpoint(
        eager=True
    )
    fe = sp.final_entrances(
        w["entrances"], w["stop_areas_members_ref"]
    ).localCheckpoint(eager=True)
    return w, fq, fe


class TestGeometryAssembly:
    def test_way_vertices_resolve_in_order(self, spark):
        from osm2vdv462_spark.geo import wkb as _wkb
        from osm2vdv462_spark.sources import pbf

        raw = pbf.read_pbf(spark, CHEMNITZ)
        geoms = osm_world.assemble_way_geometries(raw)
        full = geoms.filter(F.col("n_resolved") == F.col("n_refs"))
        # most ways in the extract resolve completely
        assert full.count() / geoms.count() > 0.9
        # decoded vertex count matches the ref count for a sample
        row = (
            full.filter((~F.col("is_closed")) & (F.col("n_refs") >= 4))
            .limit(1)
            .collect()[0]
        )
        g = _wkb.decode(bytes(row["geom"]))
        assert len(g.coords) == row["n_refs"]

    def test_closed_ways_become_rings(self, spark):
        from osm2vdv462_spark.geo import wkb as _wkb
        from osm2vdv462_spark.sources import pbf

        raw = pbf.read_pbf(spark, CHEMNITZ)
        geoms = osm_world.assemble_way_geometries(raw)
        row = (
            geoms.filter(
                F.col("is_closed")
                & (F.col("n_refs") >= 4)
                & (F.col("n_resolved") == F.col("n_refs"))
            )
            .limit(1)
            .collect()[0]
        )
        g = _wkb.decode(bytes(row["geom"]))
        c = g.coords
        assert (c[0] == c[-1]).all()


class TestRealPipeline:
    def test_real_quays_with_real_ifopts(self, chemnitz):
        w, fq, fe = chemnitz
        rows = fq.collect()
        assert len(rows) > 100
        # genuine Saxony IFOPT ids (de:14511:... = Chemnitz network)
        assert all(r["IFOPT"].startswith("de:") for r in rows)
        # polygon platforms got a width estimate
        widths = [
            r for r in rows if (r["tags"] or {}).get("est_width") is not None
        ]
        assert len(widths) > 0

    def test_documents_validate(self, spark, chemnitz):
        w, fq, fe = chemnitz
        edges = routing.stop_area_edges(fq, fe).localCheckpoint(eager=True)
        links, access, refs = routing.stitch_path_links(
            routing.synthesize_routes(edges)
        )
        links = links.localCheckpoint(eager=True)
        access = access.localCheckpoint(eager=True)
        refs = refs.localCheckpoint(eager=True)
        facc = sp.final_access_spaces(access, w["pois"]).localCheckpoint(eager=True)
        fspl = routing.final_site_path_links(
            links, refs, w["highways"]
        ).localCheckpoint(eager=True)
        orgs = spark.createDataFrame(
            [],
            "id string, label string, alternatives string,"
            " official_name string, short_name string, website string,"
            " email string, phone string, address string, type string",
        )
        spo = ex.stop_places_with_organisations(w["stop_areas"], orgs)
        spg = ex.stop_places_with_geometry(
            spo, w["stop_areas_members_ref"], w["platforms"]
        )
        fsp = ex.final_stop_places(spg, fq, fe, facc).localCheckpoint(eager=True)
        ed = ex.export_data(fsp, fq, fe, facc, fspl).localCheckpoint(eager=True)
        xml = ex.xml_stop_places(ed).localCheckpoint(eager=True)
        res = V.validate_stop_places(xml).collect()
        assert len(res) >= 40  # 45 member-bearing stop areas in the extract
        bad = [(r["relation_id"], r["errors"]) for r in res if not r["ok"]]
        assert not bad, bad[:3]


class TestRunnerOnPbf:
    def test_checkpointed_runner_real_extract(self, spark, tmp_path):
        """spark-submit entry body on a real extract: scan -> full DAG ->
        assembled PublicationDelivery (validates clean), and a rerun
        resumes from the per-stage manifests without recompute."""
        from osm2vdv462_spark.pipeline.runner import run_full_pipeline

        pbf = "/root/reference/example_data/tu-campus_technopark.osm.pbf"
        out = run_full_pipeline(spark, str(tmp_path / "run"), pbf_path=pbf)
        doc = open(out["document"]).read()
        assert V.validate_document(doc) == []
        assert "de:14511:" in doc  # genuine Chemnitz IFOPTs in the output
        out2 = run_full_pipeline(spark, str(tmp_path / "run"), pbf_path=pbf)
        stats = out2["stats"]
        assert all(v.get("skipped") for v in stats.values()), stats
