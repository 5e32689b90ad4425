"""Ingestion tag dispatch: first-match extractor precedence + geometry
kind heuristic, as pure Catalyst expressions.

Mirrors the reference's osm2pgsql Lua layer:

* first-match dispatch per OSM type — an object matching several
  extractors lands in exactly ONE table
  (/root/reference/pipeline/stop_places/lua/main.lua:12-35);
* per-extractor tag conditions (lua/{platforms,stop_positions,entrances,
  parking,highways,pois,platforms_edges,stop_areas}.lua), with the
  "wants IFOPT" short-circuit: tables with an IFOPT column skip objects
  lacking ``ref:IFOPT`` entirely (lua/utils.lua:68-76);
* geometry kind: node -> point; closed way + area-ish tags -> area else
  line; relation -> area unless type=boundary (lua/utils.lua:3-64).

At 10^12 elements this is the hot ingest map: everything below is a
single whole-stage-codegen projection — no UDF, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tag(key: str) -> Column:
    return F.element_at(F.col("tags"), key)


def _in(key: str, values: list[str]) -> Column:
    """Tag present AND value in list (Lua condition entry with a value
    list, utils.lua:101-114)."""
    return _tag(key).isin(*values)


def _opt_in(key: str, values: list[str]) -> Column:
    """Lua condition entry whose list contains ``false``: tag may be
    absent; if present the value must be in the list."""
    return _tag(key).isNull() | _tag(key).isin(*values)


# -- per-extractor predicates (lazy: Column construction needs an active
#    SparkContext, so these are functions, composed at plan-build time) --


def _has_ifopt() -> Column:
    return _tag("ref:IFOPT").isNotNull()


def platforms_pred() -> Column:
    return _has_ifopt() & (
        _in("public_transport", ["platform"])
        | _in("highway", ["platform"])
        | _in("railway", ["platform"])
    )


def stop_positions_pred() -> Column:
    return _has_ifopt() & _in("public_transport", ["stop_position"])


def stop_areas_pred() -> Column:
    return _has_ifopt() & _in("public_transport", ["stop_area"])


def entrances_pred() -> Column:
    return _in(
        "entrance", ["yes", "main", "secondary", "emergency", "exit", "entrance"]
    ) | _in("railway", ["train_station_entrance", "subway_entrance"])


_PARKING_LANE = ["yes", "parallel", "diagonal", "perpendicular"]


def parking_pred() -> Column:
    return (
        _in("amenity", ["parking", "motorcycle_parking", "bicycle_parking", "taxi"])
        | _in("parking:lane:both", _PARKING_LANE)
        | _in("parking:lane:left", _PARKING_LANE)
        | _in("parking:lane:right", _PARKING_LANE)
    )


def highways_pred() -> Column:
    return (
        (
            _in(
                "highway",
                ["pedestrian", "footway", "steps", "corridor", "path",
                 "crossing", "elevator"],
            )
            & _opt_in("access", ["customers", "yes"])
        )
        | (_tag("highway").isNotNull()
           & _in("sidewalk", ["yes", "left", "right", "both"]))
        | (_tag("highway").isNotNull() & _in("sidewalk:left", ["yes"]))
        | (_tag("highway").isNotNull() & _in("sidewalk:right", ["yes"]))
        | (_tag("highway").isNotNull() & _in("sidewalk:both", ["yes"]))
    )


def pois_pred() -> Column:
    return (
        _in(
            "amenity",
            ["car_sharing", "bench", "shelter", "toilets", "telephone",
             "parking_entrance"],
        )
        | (_in("amenity", ["vending_machine"])
           & _in("vending", ["public_transport_tickets"]))
        | _in("shop", ["ticket"])
        | (_in("tourism", ["information"]) & _in("information", ["office"]))
        | _in("barrier", ["cycle_barrier"])
        | _in("indoor", ["door"])
    )


def platform_edges_pred() -> Column:
    return _in("railway", ["platform_edge"])


# first-match order per OSM type (main.lua:12-35)
_DISPATCH = {
    "N": [
        ("stop_positions", stop_positions_pred),
        ("platforms", platforms_pred),
        ("entrances", entrances_pred),
        ("parking", parking_pred),
        ("highways", highways_pred),
        ("pois", pois_pred),
    ],
    "W": [
        ("platforms", platforms_pred),
        ("platforms_edges", platform_edges_pred),
        ("parking", parking_pred),
        ("highways", highways_pred),
        ("pois", pois_pred),
    ],
    "R": [
        ("platforms", platforms_pred),
        ("stop_areas", stop_areas_pred),
        ("parking", parking_pred),
        ("highways", highways_pred),
        ("pois", pois_pred),
    ],
}

# has_area_tags key list (utils.lua:28-64): any of these present (beyond
# an explicit area=yes/no) marks a closed way as an area
_AREA_KEYS = [
    "aeroway", "amenity", "building", "harbour", "historic", "landuse",
    "leisure", "man_made", "military", "natural", "office", "place",
    "power", "public_transport", "shop", "sport", "tourism", "water",
    "waterway", "wetland", "abandoned:aeroway", "abandoned:amenity",
    "abandoned:building", "abandoned:landuse", "abandoned:power",
    "area:highway",
]


def has_area_tags() -> Column:
    """utils.lua:28-64: explicit area=yes/no wins; else any area-ish key."""
    any_key = None
    for k in _AREA_KEYS:
        c = _tag(k).isNotNull()
        any_key = c if any_key is None else (any_key | c)
    return (
        F.when(_tag("area") == "yes", F.lit(True))
        .when(_tag("area") == "no", F.lit(False))
        .otherwise(any_key)
    )


def geom_kind() -> Column:
    """utils.lua:3-24 set_row_geom_by_type: point / line / area from
    (osm_type, is_closed, tags)."""
    t = F.col("osm_type")
    return (
        F.when(t == "N", F.lit("point"))
        .when(t == "W", F.when(F.col("is_closed") & has_area_tags(), "area")
              .otherwise("line"))
        .otherwise(  # relation: fallback area; boundary -> line
            F.when(_tag("type") == "boundary", "line").otherwise("area")
        )
    )


def dispatch(elements: DataFrame) -> DataFrame:
    """First-match extraction over (osm_id, osm_type, is_closed, tags).

    Returns one row per INPUT element with ``target_table`` (NULL when no
    extractor matches — the object is dropped, as osm2pgsql does),
    ``geom_kind`` (NULL for stop_areas, which has no geometry column, and
    for dropped rows) and ``ifopt`` (only for IFOPT-bearing tables, where
    the Lua grab_tag pulls it out of the tag map)."""
    table = F.lit(None).cast("string")
    for otype in ("N", "W", "R"):
        chain = F.lit(None).cast("string")
        for name, pred in reversed(_DISPATCH[otype]):
            chain = F.when(pred(), name).otherwise(chain)
        table = F.when(F.col("osm_type") == otype, chain).otherwise(table)

    wants_ifopt = F.col("target_table").isin("platforms", "stop_positions",
                                             "stop_areas")
    return (
        elements.withColumn("target_table", table)
        .withColumn(
            "geom_kind",
            F.when(
                F.col("target_table").isNotNull()
                & (F.col("target_table") != "stop_areas"),
                geom_kind(),
            ),
        )
        .withColumn("ifopt", F.when(wants_ifopt, _tag("ref:IFOPT")))
    )
