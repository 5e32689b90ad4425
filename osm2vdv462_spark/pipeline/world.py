"""Deterministic synthetic OSM world for the stop-places pipeline.

Mirrors the shape of the reference's example extracts
(/root/reference/example_data/: town-sized stop areas with platforms,
entrances, footways) per FIXTURES.md §2, with the pathological cases the
reference's views exist for:

* multi-IFOPT platforms (``"a;b"`` + positional ``ref`` tags) -> split;
* duplicate-IFOPT touching polygons -> DBSCAN(eps=0) merge (reference
  issue #8);
* platform edges (railway=platform_edge linestrings on the boundary);
* footways/stairs/elevators with parseable width/incline/duration tags.

Everything is seeded numpy — no external data, byte-stable across runs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..geo import wkb as _wkb

M = 1.0 / 111_320.0  # ~1 meter in degrees (equator-ish; fixtures only)


def _rect(cx, cy, w_m, h_m, angle_deg=0.0):
    w, h = w_m * M / 2, h_m * M / 2
    base = np.array([[-w, -h], [w, -h], [w, h], [-w, h], [-w, -h]])
    a = np.radians(angle_deg)
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    return base @ rot.T + [cx, cy]


def build_world(n_areas: int = 8, seed: int = 42) -> dict[str, list]:
    """Python-side row lists per table (see FIXTURES.md §2 schemas).

    OSM ids are STRUCTURED — ``100_000 + area_index*1000 + slot`` with a
    fixed slot per role (platform A=1, B=2/3, C=4, edges=5/6, D=7, stop
    position=10, entrances=20+k, pois=30+j, highways=40+j, parking=50) —
    and platform rectangles are axis-aligned, so every pipeline output
    (ids, IFOPTs, widths, access-space nodes) has a closed form that the
    driver's DuckDB oracles reproduce with CASE arithmetic (the datagen.py
    technique applied to the pipeline world). Rotated/pathological
    geometry coverage lives in tests/test_geo_kernel.py instead.
    """
    rng = np.random.default_rng(seed)
    stop_areas, members, platforms, platform_edges = [], [], [], []
    stop_positions, entrances, pois, highways, parking = [], [], [], [], []

    orgs = [
        ("Q1001", "Stadtwerke Musterstadt", "SWM,Stadtwerke", "Stadtwerke Musterstadt GmbH",
         "SWM", "https://swm.example", "info@swm.example", "+49 89 1", "Musterstr. 1", "operator"),
        ("Q1002", "Verkehrsverbund Nord", "VVN", "Verkehrsverbund Nord GmbH",
         "VVN", "https://vvn.example", "", "", "", "authority"),
        ("Q1003", "Regiobus Sued", "RBS", "Regiobus Sued AG",
         "RBS", "https://rbs.example", "", "", "", "operator"),
    ]

    for i in range(n_areas):
        rel = 1000 + i
        base = 100_000 + i * 1000
        cx = 11.50 + (i % 4) * 0.01
        cy = 48.10 + (i // 4) * 0.01
        ifopt = f"de:09162:{i}"
        org = orgs[i % len(orgs)]
        area_tags = {
            "name": f"Stop {i}",
            "public_transport": "stop_area",
            "operator": org[1],
            "operator:wikidata": org[0],
        }
        stop_areas.append((rel, ifopt, area_tags))

        def member(osm_id, osm_type):
            members.append((rel, osm_id, osm_type))

        # platform A: plain axis-aligned polygon, 30x5 m
        pa = base + 1
        ga = _wkb.encode_polygon([_rect(cx - 40 * M, cy, 30, 5)])
        platforms.append(
            (pa, "W", f"{ifopt}:1",
             {"public_transport": "platform", "ref": "1", "level": "0",
              "name": f"Bstg 1", "shelter": "yes", "tactile_paving": "yes"}, ga)
        )
        member(pa, "W")

        # platform B: TWO touching polygons, SAME IFOPT -> must merge
        pb1, pb2 = base + 2, base + 3
        r1 = _rect(cx + 30 * M, cy, 16, 6)
        r2 = _rect(cx + 30 * M + 16 * M, cy, 16, 6)  # shares the x edge
        platforms.append(
            (pb1, "W", f"{ifopt}:2",
             {"public_transport": "platform", "ref": "2", "level": "0",
              "surface": "paving_stones"}, _wkb.encode_polygon([r1]))
        )
        platforms.append(
            (pb2, "W", f"{ifopt}:2",
             {"public_transport": "platform", "ref": "2", "level": "0",
              "bench": "yes"}, _wkb.encode_polygon([r2]))
        )
        member(pb1, "W")

        # platform C (every other area): multi-IFOPT island platform with
        # two platform_edge linestrings on its long sides
        if i % 2 == 0:
            pc = base + 4
            rc = _rect(cx, cy + 30 * M, 40, 8)
            platforms.append(
                (pc, "W", f"{ifopt}:3;{ifopt}:4",
                 {"public_transport": "platform", "ref": "3;4", "level": "0",
                  "departures_board": "realtime"}, _wkb.encode_polygon([rc]))
            )
            member(pc, "W")
            # edges along south (ref 3) and north (ref 4) boundary sides
            e3, e4 = base + 5, base + 6
            platform_edges.append(
                (e3, "W", {"railway": "platform_edge", "ref": "3"},
                 _wkb.encode_linestring(rc[0:2]))
            )
            platform_edges.append(
                (e4, "W", {"railway": "platform_edge", "ref": "4"},
                 _wkb.encode_linestring(rc[2:4]))
            )

        # platform D (every third area): node platform
        if i % 3 == 0:
            pd_ = base + 7
            platforms.append(
                (pd_, "N", f"{ifopt}:9",
                 {"public_transport": "platform", "ref": "9", "level": "-1",
                  "bus": "yes"},
                 _wkb.encode_point(cx - 10 * M, cy - 20 * M))
            )
            member(pd_, "N")

        # stop positions
        sp = base + 10
        stop_positions.append(
            (sp, f"{ifopt}:1",
             {"public_transport": "stop_position", "bus": "yes"},
             _wkb.encode_point(cx - 40 * M, cy + 6 * M))
        )
        member(sp, "N")

        # entrances
        for k in range(1 + i % 2):
            en = base + 20 + k
            entrances.append(
                (en,
                 {"entrance": "main" if k == 0 else "yes", "door": "yes",
                  "level": "0", "wheelchair": "yes"},
                 _wkb.encode_point(cx + (55 + 6 * k) * M, cy + 10 * k * M))
            )
            member(en, "N")

        # pois near the area (bench / shelter / ticket machine)
        for j, kind in enumerate((("amenity", "bench"), ("amenity", "shelter"),
                                  ("amenity", "vending_machine"))):
            po = base + 30 + j
            pois.append(
                (po, "N", {kind[0]: kind[1], "level": "0"},
                 _wkb.encode_point(
                     cx + float(rng.uniform(-50, 50)) * M,
                     cy + float(rng.uniform(-50, 50)) * M,
                 ))
            )

        # footways: platform A -> entrance zone, with parseable tags
        hw1, hw2, hw3 = base + 40, base + 41, base + 42
        highways.append(
            (hw1, "W",
             {"highway": "footway", "surface": "asphalt", "width": "2 m",
              "incline": "3%", "level": "0", "lit": "yes"},
             _wkb.encode_linestring(np.array(
                 [[cx - 40 * M, cy], [cx, cy], [cx + 55 * M, cy]])))
        )
        highways.append(
            (hw2, "W",
             {"highway": "steps", "incline": "up", "step_count": "12",
              "handrail": "yes", "level": "0;1"},
             _wkb.encode_linestring(np.array(
                 [[cx, cy], [cx, cy + 15 * M]])))
        )
        highways.append(
            (hw3, "W",
             {"highway": "elevator", "level": "-1;0;1", "wheelchair": "yes",
              "maxweight": "0.63 t"},
             _wkb.encode_linestring(np.array(
                 [[cx + 5 * M, cy], [cx + 5 * M, cy + 2 * M]])))
        )

        # parking
        pk = base + 50
        parking.append(
            (pk, "W",
             {"amenity": "parking", "parking": "surface", "capacity": "20",
              "fee": "yes"},
             _wkb.encode_polygon([_rect(cx - 80 * M, cy - 40 * M, 30, 20)]))
        )
        member(pk, "W")

    return {
        "stop_areas": stop_areas,
        "stop_areas_members_ref": members,
        "platforms": platforms,
        "platforms_edges": platform_edges,
        "stop_positions": stop_positions,
        "entrances": entrances,
        "pois": pois,
        "highways": highways,
        "parking": parking,
        "organisations": orgs,
    }


_SCHEMAS = {
    "stop_areas": "relation_id long, IFOPT string, tags map<string,string>",
    "stop_areas_members_ref": "relation_id long, member_id long, osm_type string",
    "platforms": "osm_id long, osm_type string, IFOPT string, tags map<string,string>, geom binary",
    "platforms_edges": "osm_id long, osm_type string, tags map<string,string>, geom binary",
    "stop_positions": "node_id long, IFOPT string, tags map<string,string>, geom binary",
    "entrances": "node_id long, tags map<string,string>, geom binary",
    "pois": "osm_id long, osm_type string, tags map<string,string>, geom binary",
    "highways": "osm_id long, osm_type string, tags map<string,string>, geom binary",
    "parking": "osm_id long, osm_type string, tags map<string,string>, geom binary",
    "organisations": (
        "id string, label string, alternatives string, official_name string,"
        " short_name string, website string, email string, phone string,"
        " address string, type string"
    ),
}


def world_dfs(
    spark: SparkSession, n_areas: int = 8, seed: int = 42
) -> dict[str, DataFrame]:
    """The synthetic world as Spark DataFrames with FIXTURES.md schemas."""
    rows = build_world(n_areas, seed)
    out = {}
    for name, data in rows.items():
        data = [
            tuple(bytearray(v) if isinstance(v, bytes) else v for v in r)
            for r in data
        ]
        out[name] = spark.createDataFrame(data, _SCHEMAS[name])
    return out
