"""Spark column-level geo helpers: Arrow-vectorized pandas UDFs over the
numpy kernel. These are the ONLY places geometry crosses the JVM/Python
boundary; everything else stays in Catalyst expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import cells as _cells
from . import kernel as _kernel
from . import wkb as _wkb


def cell_of(lon_col, lat_col, res: int):
    """Column: grid cell id of a (lon, lat) point at resolution ``res``."""

    @F.pandas_udf(LongType())
    def _cell(lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = _cells.cell_of_points(lon.to_numpy(np.float64), lat.to_numpy(np.float64), res)
        return pd.Series(out)

    return _cell(lon_col, lat_col)


def cover_cells(wkb_col, res: int, pad_cells: int = 0):
    """Column: array<long> of grid cells covering the geometry's bbox at
    ``res`` (superset cover — exact predicate filters later). ``pad_cells``
    dilates the bbox by that many cells (for dwithin-style joins).
    """

    @F.pandas_udf(ArrayType(LongType()))
    def _cover(wkbs: pd.Series) -> pd.Series:
        out = []
        pad = pad_cells * _cells._deg_per_cell(res)
        for b in wkbs:
            if b is None:
                out.append([])
                continue
            g = _wkb.decode(bytes(b))
            minx, miny, maxx, maxy = g.bbox()
            ids = _cells.cells_of_bbox(minx - pad, miny - pad, maxx + pad, maxy + pad, res)
            out.append(ids.tolist())
        return pd.Series(out)

    return _cover(wkb_col)


def geom_type(wkb_col):
    """Column: geometry type name (replaces stored-type reads of
    ST_GeometryType, ref stop_places.sql:596)."""

    @F.pandas_udf(StringType())
    def _t(wkbs: pd.Series) -> pd.Series:
        return wkbs.map(lambda b: None if b is None else _wkb.geom_type_name(bytes(b)))

    return _t(wkb_col)


_CENTROID_TYPE = StructType(
    [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
)


def centroid(wkb_col):
    """Column: struct<lon,lat> planar centroid (ST_Centroid, ref SP:167-177)."""

    @F.pandas_udf(_CENTROID_TYPE)
    def _c(wkbs: pd.Series) -> pd.DataFrame:
        lons, lats = [], []
        for b in wkbs:
            if b is None:
                lons.append(None)
                lats.append(None)
                continue
            x, y = _kernel.centroid(_wkb.decode(bytes(b)))
            lons.append(x)
            lats.append(y)
        return pd.DataFrame({"lon": lons, "lat": lats})

    return _c(wkb_col)


def geodesic_length_m(wkb_col):
    """Column: geodesic length in meters (calculate_Distance, ref SP:8-14)."""

    @F.pandas_udf(DoubleType())
    def _len(wkbs: pd.Series) -> pd.Series:
        out = []
        for b in wkbs:
            if b is None:
                out.append(None)
                continue
            g = _wkb.decode(bytes(b))
            total = 0.0
            for i in range(g.nrings):
                total += _kernel.polyline_length_m(g.ring(i))
            out.append(total)
        return pd.Series(out, dtype="float64")

    return _len(wkb_col)


def spherical_area_m2(wkb_col):
    """Column: spherical polygon area in m^2 (outer rings minus holes;
    kernel.ring_area_m2's cylindrical-equal-area shoelace)."""

    @F.pandas_udf(DoubleType())
    def _area(wkbs: pd.Series) -> pd.Series:
        out = []
        for b in wkbs:
            if b is None:
                out.append(None)
                continue
            out.append(_kernel.spherical_area_m2(_wkb.decode(bytes(b))))
        return pd.Series(out, dtype="float64")

    return _area(wkb_col)


def haversine_col(lon1, lat1, lon2, lat2):
    """Pure-Catalyst haversine (meters) — no Python at all, whole-stage
    codegen friendly. Used in kNN exact phase on billions of pairs.
    """
    rlon1, rlat1 = F.radians(lon1), F.radians(lat1)
    rlon2, rlat2 = F.radians(lon2), F.radians(lat2)
    h = (
        F.pow(F.sin((rlat2 - rlat1) / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin((rlon2 - rlon1) / 2), 2)
    )
    return 2.0 * _kernel.EARTH_R * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """SQL-string twin of haversine_col: parses to the node-identical
    Catalyst tree (same function calls, same literal types — the
    leading constant is the SAME pre-folded double the Column form
    produces, suffixed D so it parses as DOUBLE not DECIMAL), so
    results are bit-identical. Exists because Column-API construction
    pays a py4j round trip per node — building this tree K times per
    operator call cost more than executing it (round-6 measurement)."""
    return (
        f"{2.0 * _kernel.EARTH_R!r}D * ASIN(SQRT(LEAST("
        f"POW(SIN((RADIANS({lat2}) - RADIANS({lat1})) / 2), 2) + "
        f"COS(RADIANS({lat1})) * COS(RADIANS({lat2})) * "
        f"POW(SIN((RADIANS({lon2}) - RADIANS({lon1})) / 2), 2), 1.0D)))"
    )


def est_width_m(wkb_col):
    """Column: estimated platform width in meters for (Multi)Polygons,
    NULL otherwise.

    Algorithm (ref stop_places.sql:961-1000 platforms_with_width):
    simplify(1e-6) -> subdivide(max 5 vertices) -> oriented envelope per
    part -> (short, long) side lengths -> pick the part with the LONGEST
    long side (assumed road/track-parallel) -> its SHORT side is the
    width. Rounded to 2 dp by the caller.
    """

    @F.pandas_udf(DoubleType())
    def _w(wkbs: pd.Series) -> pd.Series:
        out = []
        for b in wkbs:
            if b is None:
                out.append(None)
                continue
            g = _wkb.decode(bytes(b))
            if g.gtype not in (_wkb.POLYGON, _wkb.MULTIPOLYGON):
                out.append(None)
                continue
            best = None  # (long_side, short_side)
            for i in range(g.nrings):
                ring = _kernel.simplify_preserve(g.ring(i), 1e-6)
                for part in _kernel.subdivide(ring, 5):
                    rect = _kernel.oriented_envelope(part)
                    short, long_ = _kernel.envelope_sides_m(rect)
                    if best is None or long_ > best[0]:
                        best = (long_, short)
            out.append(best[1] if best else None)
        return pd.Series(out, dtype="float64")

    return _w(wkb_col)


def merge_geoms(wkb_list_col):
    """Column: merge an array<binary> of WKB geometries into one WKB.

    Replaces ST_Union aggregation (ref stop_places.sql:1055). OSM merge
    targets are *touching* (boundary-adjacent) platforms (issue #8 in the
    reference), so a MultiPolygon/GeometryCollection container preserves
    the union's area, length and centroid; interior-overlapping inputs
    would double-count (documented divergence — no dissolve without GEOS).
    Single input passes through unchanged. Inputs must be pre-sorted by
    the caller for determinism.
    """
    import struct as _struct

    @F.pandas_udf(BinaryType())
    def _merge(lists: pd.Series) -> pd.Series:
        out = []
        for blobs in lists:
            if blobs is None or len(blobs) == 0:
                out.append(None)
                continue
            if len(blobs) == 1:
                out.append(bytes(blobs[0]))
                continue
            geoms = [_wkb.decode(bytes(b)) for b in blobs]
            types = {g.gtype for g in geoms}
            if types == {_wkb.POLYGON}:
                header = _struct.pack("<BII", 1, _wkb.MULTIPOLYGON, len(geoms))
            elif types == {_wkb.LINESTRING}:
                header = _struct.pack("<BII", 1, _wkb.MULTILINESTRING, len(geoms))
            elif types == {_wkb.POINT}:
                header = _struct.pack("<BII", 1, _wkb.MULTIPOINT, len(geoms))
            else:
                header = _struct.pack("<BII", 1, _wkb.COLLECTION, len(geoms))
            out.append(header + b"".join(bytes(b) for b in blobs))
        return pd.Series(out, dtype=object)

    return _merge(wkb_list_col)


def poslist(wkb_col, precision: int = 8):
    """Column: gml posList content — 'lat lon lat lon ...' at <=precision
    decimals, trailing zeros trimmed (ST_AsGML(3, geom, 8, 22, '') +
    xpath('//posList'), ref stop_places.sql:184-200)."""

    @F.pandas_udf(StringType())
    def _pl(wkbs: pd.Series) -> pd.Series:
        out = []
        for b in wkbs:
            if b is None:
                out.append(None)
                continue
            g = _wkb.decode(bytes(b))
            # lat-lon order (GML option 16); shared canonical formatter
            out.append(_kernel.poslist_str(g.coords, precision))
        return pd.Series(out, dtype=object)

    return _pl(wkb_col)


def point_wkb(lon_col, lat_col):
    """Column: WKB point from lon/lat (ST_GeomFromText POINT, ref ppr.py:119)."""

    @F.pandas_udf(BinaryType())
    def _pt(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            [_wkb.encode_point(x, y) for x, y in zip(lon, lat)], dtype=object
        )

    return _pt(lon_col, lat_col)
