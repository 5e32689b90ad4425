"""DuckDB oracle for the FULL NeTEx stop-places document.

Rebuilds, in plain SQL over the driver's parquet views, the exact
per-relation ``<StopPlace>`` XML string the engine's export DAG emits
(pipeline/export.py::xml_stop_places, ref stop_places.sql:1325-1449 +
export.sql:5-44) — quay/entrance/access-space/path-link fragments,
DELFI key lists, levels, the org ref and the area centroid — from the
closed-form synthetic world (pipeline/world.py structured ids + the
md5-derived route synthesizer).

Float discipline (CLAUDE.md): every float that reaches the document
goes through a fixed-precision trimmed renderer on BOTH engines
(xmlbuild.fixed_trim / geo.kernel.poslist_str on the Spark side; the
``_ft`` printf+rtrim twin here), and every cross-engine arithmetic
difference (numpy/JVM vs DuckDB libm ulps) is collapsed by that
rounding, by a float32 cast (Distance), or by integer rounding
(durations, centimetre key values).

Path-link ids are content hashes: md5 over "from|to|fromType|toType|
posList" truncated to 60 bits — the same on both sides by construction
(pipeline/routing.py::emit_link).
"""

from __future__ import annotations

# one meter in degrees in the synthetic world (world.py M)
_M = "(1.0 / 111320.0)"


def _ft(expr: str, precision: int) -> str:
    """fixed_trim twin: printf('%.Nf') with trailing zeros trimmed."""
    s = f"rtrim(rtrim(printf('%.{precision}f', {expr}), '0'), '.')"
    return f"(CASE WHEN {s} IN ('-0', '') THEN '0' ELSE {s} END)"


def _numstr(expr: str) -> str:
    """xmlbuild._num_str twin: integral doubles render without decimals."""
    return (
        f"(CASE WHEN ({expr}) = floor({expr}) "
        f"THEN CAST(CAST(({expr}) AS BIGINT) AS VARCHAR) "
        f"ELSE {_ft(expr, 6)} END)"
    )


def _hav(x1: str, y1: str, x2: str, y2: str) -> str:
    """geo.kernel.haversine_m twin (radians first, then deltas)."""
    return (
        "(2.0 * 6371008.8 * asin(sqrt(least(greatest("
        f"sin((radians({y2}) - radians({y1})) / 2.0)"
        f" * sin((radians({y2}) - radians({y1})) / 2.0)"
        f" + cos(radians({y1})) * cos(radians({y2}))"
        f" * sin((radians({x2}) - radians({x1})) / 2.0)"
        f" * sin((radians({x2}) - radians({x1})) / 2.0)"
        ", 0.0), 1.0))))"
    )


def _h15(expr: str) -> str:
    """int(md5(s)[:15], 16) twin — 60-bit positive BIGINT."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def _pt(x: str, y: str) -> str:
    """posList 'lat lon' pair for one point."""
    return f"{_ft(y, 8)} || ' ' || {_ft(x, 8)}"


def _centroid(x: str, y: str) -> str:
    return (
        f"'<Centroid><Location><Longitude>' || {_ft(x, 8)}"
        f" || '</Longitude><Latitude>' || {_ft(y, 8)}"
        " || '</Latitude></Location></Centroid>'"
    )


def _kv(key: str, value_sql: str) -> str:
    return (
        f"'<KeyValue><Key>{key}</Key><Value>' || {value_sql}"
        " || '</Value></KeyValue>'"
    )


def _level_ref(rel: str, lvl_str: str) -> str:
    return (
        f"'<LevelRef ref=\"' || CAST({rel} AS VARCHAR) || ':' || {lvl_str}"
        " || '\" version=\"any\"/>'"
    )


# width of an axis-aligned rect h meters tall: N-S haversine, rounded to
# 2 dp and %.2f-formatted (mirrors pipeline_queries._W / the engine's
# oriented-envelope width estimate)
def _estw(h: int) -> str:
    return (
        "printf('%.2f', round(2 * 6371008.8 * "
        f"asin(sin(radians({h} / 111320.0) / 2)), 2))"
    )


def build_netex_oracle_sql() -> str:
    # distance of one link as double (dist), rendered three ways:
    # key 2020 = floor(dist*100), Distance = float32 then %.6f trimmed,
    # TransferDuration = PT round(dist/1.4) S
    dist_f32 = "CAST(CAST(dist AS REAL) AS DOUBLE)"
    link_keylist = (
        "'<keyList>' || " + _kv("2020", _numstr("floor(dist * 100.0)")) + " || '</keyList>'"
    )
    from_side = (
        "(CASE WHEN f_ty = 'ENTRANCE' THEN"
        " '<PlaceRef ref=\"' || area_ifopt || '\" version=\"any\"/>"
        "<EntranceRef ref=\"' || f_if || '\" version=\"any\"/>'"
        " ELSE '<PlaceRef ref=\"' || f_if || '\" version=\"any\"/>' END)"
    )
    to_side = (
        "(CASE WHEN t_ty = 'ENTRANCE' THEN"
        " '<PlaceRef ref=\"' || area_ifopt || '\" version=\"any\"/>"
        "<EntranceRef ref=\"' || t_if || '\" version=\"any\"/>'"
        " ELSE '<PlaceRef ref=\"' || t_if || '\" version=\"any\"/>' END)"
    )

    def qxml(ifopt_suffix, keylist, name, cxe, cye, lvl, qtype):
        """One quay's XML from closed-form pieces."""
        return (
            f"'<Quay id=\"' || ifopt || ':{ifopt_suffix}' || '\" version=\"any\">'"
            f" || {keylist}"
            f" || '<Name>{name}</Name>'"
            f" || {_centroid(cxe, cye)}"
            f" || {_level_ref('rel', repr(lvl))}"
            f" || '<QuayType>{qtype}</QuayType></Quay>'"
        )

    kl_1180 = lambda w: (  # noqa: E731
        "'<keyList>' || "
        + _kv("1180", _numstr(f"CAST({_estw(w)} AS DOUBLE) * 100.0"))
        + " || '</keyList>'"
    )
    kl_q1 = (
        "'<keyList>' || "
        + _kv("1180", _numstr(f"CAST({_estw(5)} AS DOUBLE) * 100.0"))
        + " || '<KeyValue><Key>2071</Key><Value></Value></KeyValue></keyList>'"
    )
    kl_q2 = (
        "'<keyList><KeyValue><Key>1120</Key><Value></Value></KeyValue>' || "
        + _kv("1180", _numstr(f"CAST({_estw(6)} AS DOUBLE) * 100.0"))
        + " || '</keyList>'"
    )

    ent_xml = (
        "'<Entrance id=\"' || CAST(eid AS VARCHAR) || '\" version=\"any\">'"
        " || '<keyList><KeyValue><Key>2030</Key><Value></Value></KeyValue>"
        "<KeyValue><Key>2032</Key><Value>Tür</Value></KeyValue></keyList>'"
        " || '<Name>Eingang</Name>'"
        f" || {_centroid('ex', 'ey')}"
        f" || {_level_ref('rel', quote_0())}"
        " || '<EntranceType>door</EntranceType></Entrance>'"
    )

    return f"""
WITH p AS (
  SELECT CAST(t.i AS BIGINT) AS i,
         CAST(1000 + t.i AS BIGINT) AS rel,
         CAST(100000 + t.i * 1000 AS BIGINT) AS base,
         'de:09162:' || CAST(t.i AS VARCHAR) AS ifopt,
         11.50 + (t.i % 4) * 0.01 AS cx,
         48.10 + (t.i // 4) * 0.01 AS cy
  FROM range(0, 16) t(i)
  WHERE t.i < (SELECT CASE WHEN count(*) >= 15000 THEN 16
                           WHEN count(*) >= 1500 THEN 8
                           ELSE 4 END
               FROM customer)
),
-- element coordinate catalog: quays (closed-form merged/split/node
-- centroids) + entrances
els AS (
  SELECT rel, ifopt AS area_ifopt, ifopt || ':1' AS el, 'QUAY' AS typ,
         cx - 40.0 * {_M} AS x, cy AS y FROM p
  UNION ALL
  SELECT rel, ifopt, ifopt || ':2', 'QUAY', cx + 38.0 * {_M}, cy FROM p
  UNION ALL
  SELECT rel, ifopt, ifopt || ':3', 'QUAY', cx, cy + 26.0 * {_M}
  FROM p WHERE i % 2 = 0
  UNION ALL
  SELECT rel, ifopt, ifopt || ':4', 'QUAY', cx, cy + 34.0 * {_M}
  FROM p WHERE i % 2 = 0
  UNION ALL
  SELECT rel, ifopt, ifopt || ':9', 'QUAY', cx - 10.0 * {_M},
         cy - 20.0 * {_M} FROM p WHERE i % 3 = 0
  UNION ALL
  SELECT rel, ifopt, CAST(base + 20 AS VARCHAR), 'ENTRANCE',
         cx + 55.0 * {_M}, cy FROM p
  UNION ALL
  SELECT rel, ifopt, CAST(base + 21 AS VARCHAR), 'ENTRANCE',
         cx + 61.0 * {_M}, cy + 10.0 * {_M} FROM p WHERE i % 2 = 1
),
-- directional stop-area edges: quay pairs + quay<->entrance both ways
edges AS (
  SELECT a.rel AS rel, a.area_ifopt AS area_ifopt,
         a.el AS s, b.el AS t, a.typ AS st, b.typ AS tt,
         a.x AS sx, a.y AS sy, b.x AS tx, b.y AS ty
  FROM els a JOIN els b
    ON a.rel = b.rel AND a.el <> b.el
   AND NOT (a.typ = 'ENTRANCE' AND b.typ = 'ENTRANCE')
),
-- route synthesizer: md5 hash -> variant + node base; thirds points
r2 AS (
  SELECT *, h % 3 AS v,
         CAST(9000000 + (h % 900000000) * 10 AS BIGINT) AS nb,
         sx + (tx - sx) / 3.0 AS m1x, sy + (ty - sy) / 3.0 AS m1y,
         sx + 2.0 * (tx - sx) / 3.0 AS m2x,
         sy + 2.0 * (ty - sy) / 3.0 AS m2y
  FROM (SELECT *, {_h15("s || '|' || t")} AS h FROM edges)
),
-- the stitcher's links: (from, to, types, posList, geodesic length)
links0 AS (
  SELECT rel, area_ifopt, s AS f_if, t AS t_if, st AS f_ty, tt AS t_ty,
         {_pt('sx', 'sy')} || ' ' || {_pt('m1x', 'm1y')} || ' '
           || {_pt('m2x', 'm2y')} || ' ' || {_pt('tx', 'ty')} AS pl,
         {_hav('sx', 'sy', 'm1x', 'm1y')} + {_hav('m1x', 'm1y', 'm2x', 'm2y')}
           + {_hav('m2x', 'm2y', 'tx', 'ty')} AS dist
  FROM r2 WHERE v = 2
  UNION ALL
  SELECT rel, area_ifopt, s,
         CAST(rel AS VARCHAR) || '_' || CAST(nb + 2 AS VARCHAR) || ':0',
         st, 'ACCESS_SPACE',
         {_pt('sx', 'sy')} || ' ' || {_pt('m1x', 'm1y')},
         {_hav('sx', 'sy', 'm1x', 'm1y')}
  FROM r2 WHERE v <> 2
  UNION ALL
  SELECT rel, area_ifopt,
         CAST(rel AS VARCHAR) || '_' || CAST(nb + 2 AS VARCHAR) || ':0',
         CAST(rel AS VARCHAR) || '_' || CAST(nb + 3 AS VARCHAR) || ':1',
         'ACCESS_SPACE', 'ACCESS_SPACE',
         {_pt('m1x', 'm1y')} || ' ' || {_pt('m2x', 'm2y')},
         {_hav('m1x', 'm1y', 'm2x', 'm2y')}
  FROM r2 WHERE v = 0
  UNION ALL
  SELECT rel, area_ifopt,
         CAST(rel AS VARCHAR) || '_' || CAST(nb + 2 AS VARCHAR) || ':0',
         CAST(rel AS VARCHAR) || '_' || CAST(nb + 2 AS VARCHAR) || ':-1',
         'ACCESS_SPACE', 'ACCESS_SPACE',
         {_pt('m1x', 'm1y')} || ' ' || {_pt('m1x', 'm1y')},
         {_hav('m1x', 'm1y', 'm1x', 'm1y')}
  FROM r2 WHERE v = 1
  UNION ALL
  SELECT rel, area_ifopt,
         CAST(rel AS VARCHAR) || '_' || CAST(nb + 3 AS VARCHAR) || ':1',
         t, 'ACCESS_SPACE', tt,
         {_pt('m2x', 'm2y')} || ' ' || {_pt('tx', 'ty')},
         {_hav('m2x', 'm2y', 'tx', 'ty')}
  FROM r2 WHERE v = 0
  UNION ALL
  SELECT rel, area_ifopt,
         CAST(rel AS VARCHAR) || '_' || CAST(nb + 2 AS VARCHAR) || ':-1',
         t, 'ACCESS_SPACE', tt,
         {_pt('m1x', 'm1y')} || ' ' || {_pt('m2x', 'm2y')} || ' '
           || {_pt('tx', 'ty')},
         {_hav('m1x', 'm1y', 'm2x', 'm2y')} + {_hav('m2x', 'm2y', 'tx', 'ty')}
  FROM r2 WHERE v = 1
),
linkxml AS (
  SELECT rel,
         CAST(pid AS VARCHAR) AS oid,
         '<SitePathLink id="' || CAST(pid AS VARCHAR)
         || '" version="any">'
         || {link_keylist}
         || '<Distance>' || {_ft(dist_f32, 6)} || '</Distance>'
         || '<LineString xmlns="http://www.opengis.net/gml/3.2"'
         || ' xmlns:n0="http://www.opengis.net/gml/3.2"'
         || ' n0:id="LineString_' || CAST(pid AS VARCHAR)
         || '"><posList srsDimension="2">' || pl
         || '</posList></LineString>'
         || '<From>' || {from_side} || '</From>'
         || '<To>' || {to_side} || '</To>'
         || '<TransferDuration><DefaultDuration>PT'
         || CAST(CAST(round(dist / 1.4, 0) AS BIGINT) AS VARCHAR)
         || 'S</DefaultDuration></TransferDuration></SitePathLink>' AS x
  FROM (SELECT *, {_h15(
      "f_if || '|' || t_if || '|' || f_ty || '|' || t_ty || '|' || pl"
  )} AS pid FROM links0)
),
-- derived access spaces, dedup on (node, level)
acc AS (
  SELECT DISTINCT rel, nb + 2 AS node, 0.0 AS lvl, '0' AS lvls,
         m1x AS x, m1y AS y
  FROM r2 WHERE v <> 2
  UNION
  SELECT DISTINCT rel, nb + 3, 1.0, '1', m2x, m2y FROM r2 WHERE v = 0
  UNION
  SELECT DISTINCT rel, nb + 2, -1.0, '-1', m1x, m1y FROM r2 WHERE v = 1
),
accxml AS (
  SELECT rel,
         CAST(rel AS VARCHAR) || '_' || CAST(node AS VARCHAR) || ':' || lvls
           AS oid,
         '<AccessSpace id="' || CAST(rel AS VARCHAR) || '_'
         || CAST(node AS VARCHAR) || ':' || lvls || '" version="any">'
         || '<Name>Zwischenpunkt</Name>'
         || {_centroid('x', 'y')}
         || '<LevelRef ref="' || CAST(rel AS VARCHAR) || ':' || lvls
         || '" version="any"/></AccessSpace>' AS x
  FROM acc
),
entxml AS (
  SELECT rel, CAST(eid AS VARCHAR) AS oid, {ent_xml} AS x
  FROM (
    SELECT rel, base + 20 AS eid, cx + 55.0 * {_M} AS ex, cy AS ey FROM p
    UNION ALL
    SELECT rel, base + 21, cx + 61.0 * {_M}, cy + 10.0 * {_M}
    FROM p WHERE i % 2 = 1
  )
),
quayxml AS (
  SELECT rel, ifopt || ':1' AS oid,
         {qxml('1', kl_q1, 'Bstg 1', f"cx - 40.0 * {_M}", 'cy', '0', 'other')} AS x
  FROM p
  UNION ALL
  SELECT rel, ifopt || ':2',
         {qxml('2', kl_q2, '2', f"cx + 38.0 * {_M}", 'cy', '0', 'other')}
  FROM p
  UNION ALL
  SELECT rel, ifopt || ':3',
         {qxml('3', kl_1180(8), '3', 'cx', f"cy + 26.0 * {_M}", '0', 'other')}
  FROM p WHERE i % 2 = 0
  UNION ALL
  SELECT rel, ifopt || ':4',
         {qxml('4', kl_1180(8), '4', 'cx', f"cy + 34.0 * {_M}", '0', 'other')}
  FROM p WHERE i % 2 = 0
  UNION ALL
  SELECT rel, ifopt || ':9',
         '<Quay id="' || ifopt || ':9' || '" version="any">'
         || '<Name>9</Name>'
         || {_centroid(f"cx - 10.0 * {_M}", f"cy - 20.0 * {_M}")}
         || {_level_ref('rel', "'-1'")}
         || '<QuayType>busStop</QuayType></Quay>'
  FROM p WHERE i % 3 = 0
),
-- section aggregations (element order: by id string)
sec_q AS (SELECT rel, string_agg(x, '' ORDER BY oid) AS s FROM quayxml GROUP BY rel),
sec_e AS (SELECT rel, string_agg(x, '' ORDER BY oid) AS s FROM entxml GROUP BY rel),
sec_a AS (SELECT rel, string_agg(x, '' ORDER BY oid) AS s FROM accxml GROUP BY rel),
sec_l AS (SELECT rel, string_agg(x, '' ORDER BY oid) AS s FROM linkxml GROUP BY rel),
-- levels: distinct levels of quays/entrances/access spaces
lvls AS (
  SELECT rel, lvl FROM (
    SELECT rel, 0.0 AS lvl FROM p
    UNION SELECT rel, -1.0 FROM p WHERE i % 3 = 0
    UNION SELECT rel, lvl FROM acc
  )
),
lvlxml AS (
  SELECT rel,
         '<levels>' || string_agg(
           '<Level id="' || CAST(rel AS VARCHAR) || ':'
           || CAST(CAST(lvl AS BIGINT) AS VARCHAR)
           || '" version="any"><ShortName>'
           || CAST(CAST(lvl AS BIGINT) AS VARCHAR)
           || '</ShortName></Level>', '' ORDER BY lvl) || '</levels>' AS s
  FROM lvls GROUP BY rel
),
-- StopPlace centroid: avg of member platform centroids (pa, pb1, pc?, pd?)
ctr AS (
  SELECT rel,
         ((cx - 40.0 * {_M}) + (cx + 30.0 * {_M})
           + CASE WHEN i % 2 = 0 THEN cx ELSE 0 END
           + CASE WHEN i % 3 = 0 THEN cx - 10.0 * {_M} ELSE 0 END)
           / (2 + CAST(i % 2 = 0 AS INT) + CAST(i % 3 = 0 AS INT)) AS ax,
         (cy + cy
           + CASE WHEN i % 2 = 0 THEN cy + 30.0 * {_M} ELSE 0 END
           + CASE WHEN i % 3 = 0 THEN cy - 20.0 * {_M} ELSE 0 END)
           / (2 + CAST(i % 2 = 0 AS INT) + CAST(i % 3 = 0 AS INT)) AS ay
  FROM p
)
SELECT p.rel AS relation_id,
       '<StopPlace id="' || p.ifopt || '" version="any">'
       || '<Name>Stop ' || CAST(p.i AS VARCHAR) || '</Name>'
       || {_centroid('ctr.ax', 'ctr.ay')}
       || '<OperatorRef ref="Q' || CAST(1001 + p.i % 3 AS VARCHAR)
       || '" version="any"/>'
       || lvlxml.s
       || coalesce('<entrances>' || sec_e.s || '</entrances>', '')
       || coalesce('<quays>' || sec_q.s || '</quays>', '')
       || coalesce('<accessSpaces>' || sec_a.s || '</accessSpaces>', '')
       || coalesce('<pathLinks>' || sec_l.s || '</pathLinks>', '')
       || '</StopPlace>' AS xml
FROM p
JOIN ctr ON ctr.rel = p.rel
JOIN lvlxml ON lvlxml.rel = p.rel
LEFT JOIN sec_q ON sec_q.rel = p.rel
LEFT JOIN sec_e ON sec_e.rel = p.rel
LEFT JOIN sec_a ON sec_a.rel = p.rel
LEFT JOIN sec_l ON sec_l.rel = p.rel
ORDER BY relation_id
"""


def quote_0() -> str:
    return "'0'"
