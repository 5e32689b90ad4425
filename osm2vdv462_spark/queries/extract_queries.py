"""S1/S3 ingestion-dispatch query: first-match extractor precedence and
the closed-way/area-tag geometry heuristic (ref lua/main.lua:12-35,
lua/utils.lua:3-64), driven by a 24-case tag matrix synthesized from the
``part`` table. The oracle computes the expected (table, kind, ifopt)
per case directly — the Spark side must get there by actually evaluating
the tag conditions in pipeline/extract.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline.extract import dispatch
from . import register

# case -> (osm_type, is_closed, tags, expected_table, expected_kind,
#          wants_ifopt). "IF" marks the ref:IFOPT slot (filled with a
# per-row value).
_CASES = [
    ("N", False, {"public_transport": "stop_position", "ref:IFOPT": "IF",
                  "bus": "yes"}, "stop_positions", "point", True),
    ("N", False, {"public_transport": "platform", "ref:IFOPT": "IF"},
     "platforms", "point", True),
    # platform-tagged node WITHOUT ref:IFOPT falls through to pois
    ("N", False, {"public_transport": "platform", "amenity": "bench"},
     "pois", "point", False),
    # stop_position beats entrance (node dispatch order)
    ("N", False, {"public_transport": "stop_position", "entrance": "yes",
                  "ref:IFOPT": "IF"}, "stop_positions", "point", True),
    ("N", False, {"entrance": "main"}, "entrances", "point", False),
    ("N", False, {"railway": "subway_entrance"}, "entrances", "point", False),
    ("N", False, {"amenity": "parking"}, "parking", "point", False),
    ("N", False, {"parking:lane:left": "parallel"}, "parking", "point", False),
    # access absent is allowed (condition list contains false)
    ("N", False, {"highway": "footway"}, "highways", "point", False),
    ("N", False, {"highway": "footway", "access": "private"},
     None, None, False),
    ("N", False, {"amenity": "vending_machine",
                  "vending": "public_transport_tickets"},
     "pois", "point", False),
    ("N", False, {"amenity": "vending_machine", "vending": "parking_tickets"},
     None, None, False),
    ("W", True, {"public_transport": "platform", "ref:IFOPT": "IF"},
     "platforms", "area", True),
    ("W", False, {"public_transport": "platform", "ref:IFOPT": "IF"},
     "platforms", "line", True),
    # explicit area=no beats the area-ish key heuristic
    ("W", True, {"railway": "platform_edge", "area": "no"},
     "platforms_edges", "line", False),
    ("W", True, {"railway": "platform_edge", "building": "yes"},
     "platforms_edges", "area", False),
    ("W", True, {"highway": "pedestrian", "area": "yes",
                 "access": "customers"}, "highways", "area", False),
    ("W", False, {"highway": "residential", "sidewalk": "both"},
     "highways", "line", False),
    # platforms beat parking in the way dispatch order
    ("W", True, {"amenity": "parking", "public_transport": "platform",
                 "ref:IFOPT": "IF"}, "platforms", "area", True),
    ("W", True, {"amenity": "taxi"}, "parking", "area", False),
    ("R", False, {"public_transport": "platform", "ref:IFOPT": "IF"},
     "platforms", "area", True),
    # stop_areas has no geometry column -> kind NULL
    ("R", False, {"public_transport": "stop_area", "ref:IFOPT": "IF",
                  "operator": "xy"}, "stop_areas", None, True),
    ("R", False, {"type": "multipolygon", "amenity": "parking"},
     "parking", "area", False),
    ("R", False, {"type": "boundary", "highway": "pedestrian",
                  "access": "yes"}, "highways", "line", False),
]


def _sql_lit(v):
    return "NULL" if v is None else f"'{v}'"


def _oracle() -> str:
    tbl = " ".join(
        f"WHEN {k} THEN {_sql_lit(c[3])}" for k, c in enumerate(_CASES)
    )
    kind = " ".join(
        f"WHEN {k} THEN {_sql_lit(c[4])}" for k, c in enumerate(_CASES)
    )
    ifo = " ".join(
        f"WHEN {k} THEN 'if:' || CAST(p_partkey AS VARCHAR)"
        for k, c in enumerate(_CASES)
        if c[5]
    )
    typ = " ".join(
        f"WHEN {k} THEN '{c[0]}'" for k, c in enumerate(_CASES)
    )
    return f"""
    SELECT p_partkey AS osm_id,
           CASE p_partkey % 24 {typ} END AS osm_type,
           CASE p_partkey % 24 {tbl} ELSE NULL END AS target_table,
           CASE p_partkey % 24 {kind} ELSE NULL END AS geom_kind,
           CASE p_partkey % 24 {ifo} ELSE NULL END AS ifopt
    FROM part
    """


@register("extraction_dispatch", _oracle())
def extraction_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 first-match dispatch + S3 area heuristic over synthesized OSM
    elements (ref main.lua:12-35, utils.lua:3-64). The tags map is built
    from the case matrix; pipeline.extract.dispatch must re-derive the
    oracle's expected routing from the tags alone."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    k = F.col("p_partkey") % 24
    ifopt_val = F.concat(F.lit("if:"), F.col("p_partkey").cast("string"))

    tags = None
    otype = None
    closed = None
    for idx, (ot, cl, tg, *_rest) in enumerate(_CASES):
        entries = []
        for key, val in tg.items():
            entries.append(F.lit(key))
            entries.append(ifopt_val if val == "IF" else F.lit(val))
        m = F.create_map(*entries)
        tags = m if tags is None else F.when(k == idx, m).otherwise(tags)
        o = F.lit(ot)
        otype = o if otype is None else F.when(k == idx, o).otherwise(otype)
        c = F.lit(cl)
        closed = c if closed is None else F.when(k == idx, c).otherwise(closed)

    elements = p.select(
        F.col("p_partkey").alias("osm_id"),
        otype.alias("osm_type"),
        closed.alias("is_closed"),
        tags.alias("tags"),
    )
    return dispatch(elements).select(
        "osm_id", "osm_type", "target_table", "geom_kind", "ifopt"
    )
