"""OSM tag-value parsers as pure Catalyst column expressions (no UDFs).

Each mirrors a PL/pgSQL function in the reference
(/root/reference/pipeline/stop_places/sql/stop_places.sql, "SP") with the
same NULL-on-failure semantics (EXCEPTION -> NULL). Semantics verified
against the reference source, including its quirks:

* parse_length/parse_weight split on a SINGLE SPACE — ``"3m"`` (no space)
  fails the numeric cast and returns NULL; units are exact lowercase;
* parse_incline has NO unitless fallback — plain ``"5"`` is NULL;
* numbers accept sign/decimals (Postgres NUMERIC cast), surrounding
  whitespace tolerated on the number only.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _numcast(col: Column) -> Column:
    """Postgres ``::NUMERIC`` equivalent: tolerant of surrounding spaces,
    NULL on junk (try_cast)."""
    return F.trim(col).try_cast("double")


def _split2(col: Column) -> tuple[Column, Column]:
    parts = F.split(col, " ")
    return parts[0], F.when(F.size(parts) >= 2, parts[1])


def parse_length_cm(col: Column) -> Column:
    """parse_length (SP:21-46): 'N m' / 'N cm' / unitless meters -> cm."""
    v1, v2 = _split2(col)
    n = _numcast(v1)
    return (
        F.when(v2.isNull(), n * 100.0)
        .when(v2 == "m", n * 100.0)
        .when(v2 == "cm", n)
    )


def parse_weight_kg(col: Column) -> Column:
    """parse_weight (SP:78-105): 'N t' / 'N kg' / 'N g' / unitless tonnes
    -> kg."""
    v1, v2 = _split2(col)
    n = _numcast(v1)
    return (
        F.when(v2.isNull(), n * 1000.0)
        .when(v2 == "t", n * 1000.0)
        .when(v2 == "kg", n)
        .when(v2 == "g", n / 1000.0)
    )


def parse_duration_s(col: Column) -> Column:
    """parse_duration (SP:54-71): pure digits => minutes; else interval
    cast (supported subset: 'HH:MM[:SS]', 'N h|hour|hours',
    'N min|mins|minute|minutes', 'N s|sec|secs|second|seconds'); NULL on
    fail. Output: seconds (double)."""
    s = F.trim(col)
    hms_re = r"^(\d{1,3}):(\d{2})(?::(\d{2}))?$"
    hms = (
        F.regexp_extract(s, hms_re, 1).try_cast("long") * 3600.0
        + F.regexp_extract(s, hms_re, 2).try_cast("long") * 60.0
        + F.coalesce(F.regexp_extract(s, hms_re, 3).try_cast("long"), F.lit(0)) * 1.0
    )
    unit_re = r"(?i)^([0-9]+(?:\.[0-9]+)?)\s*(h|hours?|min(?:ute)?s?|s|secs?|seconds?)$"
    unit_n = F.regexp_extract(s, unit_re, 1).try_cast("double")
    unit_u = F.lower(F.regexp_extract(s, unit_re, 2))
    unit_secs = (
        F.when(unit_u.startswith("h"), unit_n * 3600.0)
        .when(unit_u.startswith("m"), unit_n * 60.0)
        .otherwise(unit_n)
    )
    return (
        F.when(s.rlike(r"^[0-9]+$"), s.try_cast("long") * 60.0)
        .when(s.rlike(hms_re), hms)
        .when(s.rlike(unit_re), unit_secs)
    )


def parse_incline_pct(col: Column) -> Column:
    """parse_incline (SP:112-139): '<n>%' passthrough; '<n>°' =>
    tan(radians(n))*100; 'up'/'down' and unitless => NULL."""
    s = col
    last = F.substring(s, -1, 1)
    head = s.substr(F.lit(1), F.length(s) - F.lit(1))
    n = _numcast(head)
    return (
        F.when(s.isin("up", "down"), F.lit(None).cast("double"))
        .when(last == "%", n)
        .when(last == "°", F.tan(F.radians(n)) * 100.0)
    )


def get_level(tags: Column) -> Column:
    """get_Level (SP:764-778): first ';'-part of tags['level'] as numeric,
    0 fallback (also on junk/missing)."""
    first = F.split(F.element_at(tags, "level"), ";")[0]
    return F.coalesce(first.try_cast("double"), F.lit(0.0))


def create_level_id(id_col: Column, level: Column) -> Column:
    """create_LevelId (SP:785-789): '<id>:<level>' with trim_scale-style
    formatting (integral levels print without decimals: '7:0', '7:0.5')."""
    lvl_str = F.when(
        level == F.floor(level), F.floor(level).cast("long").cast("string")
    ).otherwise(level.cast("string"))
    return F.concat_ws(":", id_col.cast("string"), lvl_str)


def estimate_duration_s(
    tags: Column, length_m: Column, level: Column, speed_m_s: float = 1.4
) -> Column:
    """estimate_duration (SP:147-160): elevator => 60 s at level 0 else
    30 + 10*|level| s; otherwise geodesic length / walking speed."""
    is_elevator = F.element_at(tags, "highway") == "elevator"
    lvl = F.coalesce(level, F.lit(0.0))
    elev = F.when(lvl == 0.0, F.lit(60.0)).otherwise(30.0 + 10.0 * F.abs(lvl))
    return F.when(is_elevator, elev).otherwise(length_m / F.lit(speed_m_s))


def iso_duration(seconds: Column) -> Column:
    """Format seconds as xsd:duration 'PT<n>S' (reference emits iso_8601
    intervals via SET intervalstyle, 01_config.sql:12; NeTEx consumes
    xsd:duration)."""
    return F.concat(
        F.lit("PT"), F.round(seconds, 0).cast("long").cast("string"), F.lit("S")
    )
