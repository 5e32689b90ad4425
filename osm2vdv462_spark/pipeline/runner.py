"""End-to-end pipeline runner with checkpoint/resume.

Drives the whole reference pipeline (ingest -> quays -> routing ->
export, mirroring /root/reference/export.sh:30-87's five stages) through
StageCheckpoint: every stage materializes to parquet + manifest, reruns
skip validated stages, and the final NeTEx document is written only from
materialized inputs. This is the engine's `spark-submit` entry body.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from . import export as ex_mod, routing, stop_places as sp
from .checkpoint import StageCheckpoint
from .world import world_dfs


def run_full_pipeline(
    spark: SparkSession,
    workdir: str,
    n_areas: int = 4,
    seed: int = 42,
    timestamp: str = "2024-01-01T00:00:00",
    pbf_path: str | None = None,
) -> dict:
    """Returns {'document': path, 'stats': per-stage stats dict}.

    ``pbf_path``: ingest from a REAL .osm.pbf extract (sources/pbf.py
    scan + dispatch + way-geometry assembly) instead of the synthetic
    world — the reference's production scenario; organisations then
    start empty (supply the CSV source separately if available)."""
    os.makedirs(workdir, exist_ok=True)
    ck = StageCheckpoint(spark, workdir)
    # overlap the ~2-3 s XML-template construction with the stage jobs
    # below (no-op when the per-app template cache is already warm)
    ex_mod.prewarm_templates(spark)
    if pbf_path is not None:
        gen = {"generator": f"pbf:{os.path.abspath(pbf_path)}"}
        # world_from_pbf runs the scan + dispatch + the ref->node
        # geometry-assembly shuffle (THE big shuffle of any OSM
        # ingest) — run it once and index into the memoized dict, not
        # once per world table.
        pbf_world: dict = {}

        def _source(name):
            from . import osm_world

            if name == "organisations":
                return spark.createDataFrame(
                    [],
                    "id string, label string, alternatives string,"
                    " official_name string, short_name string,"
                    " website string, email string, phone string,"
                    " address string, type string",
                )
            if not pbf_world:
                pbf_world.update(osm_world.world_from_pbf(spark, pbf_path))
            return pbf_world[name]
    else:
        gen = {"generator": f"world:n={n_areas}:seed={seed}"}

        def _source(name):
            return world_dfs(spark, n_areas, seed)[name]

    world = {}

    def w(name):
        # world tables materialized once (the 'osm2pgsql ingest' stage)
        if name not in world:
            world[name] = ck.materialize(
                f"world_{name}", lambda: _source(name), gen
            )
        return world[name]

    for t in [
        "stop_areas", "stop_areas_members_ref", "platforms", "platforms_edges",
        "entrances", "pois", "highways", "parking", "organisations",
    ]:
        w(t)
    if pbf_path is not None:
        spark.catalog.clearCache()  # the raw scan cache served its purpose

    dep = lambda *names: {n: ck.snapshot_of(f"world_{n}") for n in names}

    pww = ck.materialize(
        "platforms_with_width",
        lambda: sp.platforms_with_width(w("platforms")),
        dep("platforms"),
    )
    split = ck.materialize(
        "platforms_split",
        lambda: sp.platforms_split(pww, w("platforms_edges")),
        {"pww": ck.snapshot_of("platforms_with_width"), **dep("platforms_edges")},
    )
    merged = ck.materialize(
        "platforms_merged",
        lambda: sp.platforms_merged(split),
        {"split": ck.snapshot_of("platforms_split")},
    )
    fq = ck.materialize(
        "final_quays",
        lambda: sp.final_quays(merged, w("stop_areas_members_ref")),
        {"merged": ck.snapshot_of("platforms_merged"),
         **dep("stop_areas_members_ref")},
    )
    fe = ck.materialize(
        "final_entrances",
        lambda: sp.final_entrances(w("entrances"), w("stop_areas_members_ref")),
        dep("entrances", "stop_areas_members_ref"),
    )
    edges = ck.materialize(
        "stop_area_edges",
        lambda: routing.stop_area_edges(fq, fe),
        {"fq": ck.snapshot_of("final_quays"), "fe": ck.snapshot_of("final_entrances")},
    )

    def _stitched(which):
        routes = routing.synthesize_routes(edges)
        links, access, refs = routing.stitch_path_links(routes)
        return {"links": links, "access": access, "refs": refs}[which]

    edep = {"edges": ck.snapshot_of("stop_area_edges")}
    links = ck.materialize("path_links", lambda: _stitched("links"), edep)
    access = ck.materialize("access_spaces", lambda: _stitched("access"), edep)
    refs = ck.materialize("paths_elements_ref", lambda: _stitched("refs"), edep)

    facc = ck.materialize(
        "final_access_spaces",
        lambda: sp.final_access_spaces(access, w("pois")),
        {"access": ck.snapshot_of("access_spaces"), **dep("pois")},
    )
    fspl = ck.materialize(
        "final_site_path_links",
        lambda: routing.final_site_path_links(links, refs, w("highways")),
        {"links": ck.snapshot_of("path_links"),
         "refs": ck.snapshot_of("paths_elements_ref"), **dep("highways")},
    )
    ed = ck.materialize(
        "export_data",
        lambda: ex_mod.export_data(
            ex_mod.final_stop_places(
                ex_mod.stop_places_with_geometry(
                    ex_mod.stop_places_with_organisations(
                        w("stop_areas"), w("organisations")
                    ),
                    w("stop_areas_members_ref"),
                    w("platforms"),
                ),
                fq, fe, facc,
            ),
            fq, fe, facc, fspl,
        ),
        {
            "fq": ck.snapshot_of("final_quays"),
            "fe": ck.snapshot_of("final_entrances"),
            "facc": ck.snapshot_of("final_access_spaces"),
            "fspl": ck.snapshot_of("final_site_path_links"),
            **dep("stop_areas", "organisations", "stop_areas_members_ref", "platforms"),
        },
    )

    doc = ex_mod.assemble_document(
        ex_mod.xml_stop_places(ed),
        ex_mod.xml_parkings(
            ex_mod.export_parkings_data(w("parking"), w("stop_areas_members_ref"))
        ),
        ex_mod.xml_organisations(w("organisations")),
        timestamp=timestamp,
    )
    doc_path = os.path.join(workdir, "netex_export.xml")
    with open(doc_path, "w") as fh:
        fh.write(doc)
    return {"document": doc_path, "stats": ck.stats}
