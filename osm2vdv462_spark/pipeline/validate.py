"""Structural NeTEx validation — the hermetic analogue of the
reference's CI oracle (xmllint --schema NeTEx_publication.xsd,
/root/reference/.github/workflows/validation.yml:32-58).

No XSD libraries in this container, so this checks the structural
subset the export actually exercises: XML well-formedness (stdlib
ElementTree), required elements/attributes per NeTEx site element, and
referential integrity (LevelRef -> declared levels, EntranceRef ->
declared entrances, path-link PlaceRef -> a quay / access space / the
stop place itself).

``validate_stop_places`` is a distributed operator (mapInPandas over
the (relation_id, xml) frame — validation is per-document and
embarrassingly parallel at 10^12 scale); ``validate_document`` checks
one assembled PublicationDelivery on the driver (it is a single bounded
string by construction, export.py::assemble_document).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame

# Name is OPTIONAL on StopPlace/Quay in the NeTEx XSD (real extracts
# contain unnamed stop areas); the engine guarantees a fallback Name
# for Entrance ("Eingang") and AccessSpace ("Zwischenpunkt"), so it IS
# required there.
_REQ_QUAY = ("Centroid", "LevelRef", "QuayType")
_REQ_ENTRANCE = ("Name", "Centroid", "LevelRef", "EntranceType")
_REQ_ACCESS = ("Name", "Centroid", "LevelRef")
_REQ_LINK = ("Distance", "From", "To", "TransferDuration")

# NeTEx xsd:sequence orders (r4: ordering is schema-fatal, so an A6
# ordering regression must fail validation, not only the byte hash).
# These mirror the reference's emission order (stop_places.sql
# xmlelement nesting), which the XSD prescribes.
_ORDER_STOP_PLACE = (
    "keyList", "Name", "ShortName", "Description", "Centroid",
    "alternativeNames", "OperatorRef", "AuthorityRef", "levels",
    "entrances", "quays", "accessSpaces", "pathLinks",
)
_ORDER_QUAY = ("keyList", "Name", "ShortName", "Centroid", "LevelRef", "QuayType")
_ORDER_ENTRANCE = ("keyList", "Name", "Centroid", "LevelRef", "EntranceType")
_ORDER_ACCESS = ("keyList", "Name", "Centroid", "LevelRef", "AccessSpaceType")
_ORDER_LINK = (
    "keyList", "Distance", "LineString", "From", "To",
    "NumberOfSteps", "AccessFeatureType", "TransferDuration",
)


def _check_order(e, order, what, ident, errs) -> None:
    """xsd:sequence check: known child tags must appear in `order`."""
    rank = {t: i for i, t in enumerate(order)}
    seen = [(rank[c.tag], c.tag) for c in e if c.tag in rank]
    for (ra, ta), (rb, tb) in zip(seen, seen[1:]):
        if rb < ra:
            errs.append(
                f"{what} {ident}: <{tb}> out of sequence (must precede <{ta}>)"
            )
            return


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _strip_tree(e) -> None:
    """Drop namespaces in-place so structural checks use bare tags."""
    e.tag = _strip_ns(e.tag)
    for c in e:
        _strip_tree(c)


def validate_stop_place_xml(xml: str) -> list[str]:
    """Errors for one <StopPlace> fragment; empty list == valid."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        return [f"not well-formed: {e}"]
    _strip_tree(root)
    return validate_stop_place_element(root)


def validate_stop_place_element(root) -> list[str]:
    """Structural checks on a namespace-stripped StopPlace element."""
    errs: list[str] = []
    if root.tag != "StopPlace":
        return [f"root is {root.tag}, not StopPlace"]
    sp_id = root.get("id")
    if not sp_id:
        errs.append("StopPlace missing id attribute")
    if root.get("version") is None:
        errs.append("StopPlace missing version attribute")
    cen = root.find("Centroid/Location")
    if cen is None or cen.find("Longitude") is None or cen.find("Latitude") is None:
        errs.append("StopPlace missing Centroid/Location lon+lat")

    levels = {
        lv.get("id")
        for lv in root.findall("levels/Level")
        if lv.get("id")
    }
    if not levels:
        errs.append("no levels declared")

    _check_order(root, _ORDER_STOP_PLACE, "StopPlace", sp_id, errs)

    def check_elem(e, required, order, what, ident):
        for tag in required:
            if e.find(tag) is None:
                errs.append(f"{what} {ident}: missing {tag}")
        if e.get("id") is None or e.get("version") is None:
            errs.append(f"{what} {ident}: missing id/version attr")
        ref = e.find("LevelRef")
        if ref is not None and ref.get("ref") not in levels:
            errs.append(f"{what} {ident}: LevelRef {ref.get('ref')} undeclared")
        _check_order(e, order, what, ident, errs)

    place_ids = {sp_id} if sp_id else set()
    entrance_ids = set()
    for e in root.findall("entrances/Entrance"):
        check_elem(e, _REQ_ENTRANCE, _ORDER_ENTRANCE, "Entrance", e.get("id"))
        entrance_ids.add(e.get("id"))
    for q in root.findall("quays/Quay"):
        check_elem(q, _REQ_QUAY, _ORDER_QUAY, "Quay", q.get("id"))
        place_ids.add(q.get("id"))
    for a in root.findall("accessSpaces/AccessSpace"):
        check_elem(a, _REQ_ACCESS, _ORDER_ACCESS, "AccessSpace", a.get("id"))
        place_ids.add(a.get("id"))

    for l in root.findall("pathLinks/SitePathLink"):
        lid = l.get("id")
        _check_order(l, _ORDER_LINK, "SitePathLink", lid, errs)
        for tag in _REQ_LINK:
            if l.find(tag) is None:
                errs.append(f"SitePathLink {lid}: missing {tag}")
        if l.get("id") is None or l.get("version") is None:
            errs.append(f"SitePathLink {lid}: missing id/version attr")
        for side in ("From", "To"):
            s = l.find(side)
            if s is None:
                continue
            pr = s.find("PlaceRef")
            er = s.find("EntranceRef")
            if pr is None:
                errs.append(f"SitePathLink {lid}: {side} missing PlaceRef")
                continue
            if er is not None:
                # entrance endpoint: PlaceRef must be the stop place,
                # EntranceRef a declared entrance
                if pr.get("ref") != sp_id:
                    errs.append(
                        f"SitePathLink {lid}: {side} entrance PlaceRef"
                        f" {pr.get('ref')} != StopPlace id"
                    )
                if er.get("ref") not in entrance_ids:
                    errs.append(
                        f"SitePathLink {lid}: {side} EntranceRef"
                        f" {er.get('ref')} undeclared"
                    )
            elif pr.get("ref") not in place_ids:
                errs.append(
                    f"SitePathLink {lid}: {side} PlaceRef"
                    f" {pr.get('ref')} unresolvable"
                )
        # TransferDuration content shape
        d = l.find("TransferDuration/DefaultDuration")
        if d is None or not (d.text or "").startswith("PT"):
            errs.append(f"SitePathLink {lid}: bad DefaultDuration")
    return errs


def validate_stop_places(xml_df: DataFrame) -> DataFrame:
    """(relation_id, ok, n_errors, errors) per stop-place fragment."""

    def _v(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                errs = validate_stop_place_xml(row.xml)
                out.append((row.relation_id, not errs, len(errs), errs[:20]))
            yield pd.DataFrame(
                out, columns=["relation_id", "ok", "n_errors", "errors"]
            )

    return xml_df.mapInPandas(
        _v,
        "relation_id long, ok boolean, n_errors int, errors array<string>",
    )


def validate_document(doc: str) -> list[str]:
    """Errors for one assembled PublicationDelivery; empty == valid."""
    errs: list[str] = []
    try:
        root = ET.fromstring(doc)
    except ET.ParseError as e:
        return [f"not well-formed: {e}"]
    _strip_tree(root)
    if root.tag != "PublicationDelivery":
        errs.append(f"root is {root.tag}")
    for path in (
        "PublicationTimestamp",
        "ParticipantRef",
        "dataObjects/CompositeFrame/frames/SiteFrame",
        "dataObjects/CompositeFrame/frames/ResourceFrame",
    ):
        if root.find(path) is None:
            errs.append(f"missing {path}")
    for sp in root.findall(
        "dataObjects/CompositeFrame/frames/SiteFrame/stopPlaces/StopPlace"
    ):
        errs.extend(validate_stop_place_element(sp))
    for org_wrap in root.findall(
        "dataObjects/CompositeFrame/frames/ResourceFrame/organisations"
    ):
        for org in org_wrap:
            if org.tag not in ("Operator", "Authority"):
                errs.append(f"unexpected organisation element {org.tag}")
            elif org.find("OrganisationType") is None:
                errs.append(f"{org.get('id')}: missing OrganisationType")
    return errs
