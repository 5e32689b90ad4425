"""Structural NeTEx validator (pipeline/validate.py) — the hermetic
analogue of the reference's xmllint-XSD CI gate: the engine's own
output must validate clean, and injected structural damage must be
caught."""

import pytest

from osm2vdv462_spark.pipeline import export as ex
from osm2vdv462_spark.pipeline import validate as V
from tests.test_export import build_document


@pytest.fixture(scope="module")
def pipeline_xml(spark):
    from osm2vdv462_spark.queries import pipeline_queries as pq

    return pq.netex_stop_places_xml(spark, "/root/testdata/sf0.001")


class TestValidator:
    def test_pipeline_fragments_validate_clean(self, spark, pipeline_xml):
        out = V.validate_stop_places(pipeline_xml).collect()
        assert len(out) >= 4
        bad = [(r["relation_id"], r["errors"]) for r in out if not r["ok"]]
        assert not bad, bad

    def test_damage_is_caught(self, spark, pipeline_xml):
        frag = pipeline_xml.limit(1).collect()[0]["xml"]
        assert V.validate_stop_place_xml(frag) == []
        # undeclared level ref
        assert any(
            "undeclared" in e
            for e in V.validate_stop_place_xml(
                frag.replace('<LevelRef ref="', '<LevelRef ref="bogus_', 1)
            )
        )
        # broken well-formedness
        assert any(
            "not well-formed" in e
            for e in V.validate_stop_place_xml(frag[:-10])
        )
        # missing required child
        assert any(
            "missing QuayType" in e
            for e in V.validate_stop_place_xml(
                frag.replace("<QuayType>", "<QT>").replace("</QuayType>", "</QT>")
            )
        )
        # dangling path-link endpoint
        damaged = frag.replace('<PlaceRef ref="de:', '<PlaceRef ref="xx:', 1)
        assert any(
            "unresolvable" in e or "!= StopPlace id" in e
            for e in V.validate_stop_place_xml(damaged)
        )

    def test_reordered_sequence_is_caught(self, spark, pipeline_xml):
        """NeTEx sequences are ordered (r3 verdict #8): a deliberately
        reordered fragment must fail validation, not just the byte
        hash."""
        import re

        frag = pipeline_xml.limit(1).collect()[0]["xml"]
        assert V.validate_stop_place_xml(frag) == []

        # swap an element's Centroid after its LevelRef (the negative
        # lookahead pins the match inside ONE element — a lazy .*? would
        # backtrack across element boundaries)
        m = re.search(
            r"(<Centroid>(?:(?!</Centroid>).)*</Centroid>)(<LevelRef [^>]*/>)",
            frag,
        )
        assert m is not None
        swapped = frag[: m.start()] + m.group(2) + m.group(1) + frag[m.end():]
        errs = V.validate_stop_place_xml(swapped)
        assert any("out of sequence" in e for e in errs), errs

        # move the StopPlace <levels> block after <quays>
        lv = re.search(r"<levels>.*?</levels>", frag)
        assert lv is not None
        no_levels = frag[: lv.start()] + frag[lv.end():]
        qend = no_levels.index("</quays>") + len("</quays>")
        moved = no_levels[:qend] + lv.group(0) + no_levels[qend:]
        errs2 = V.validate_stop_place_xml(moved)
        assert any(
            "out of sequence" in e and "levels" in e for e in errs2
        ), errs2

    def test_assembled_document_validates(self, spark):
        doc, _ = build_document(spark)
        errs = V.validate_document(doc)
        assert errs == [], errs[:5]
        assert V.validate_document(doc.replace("<Name>", "<N>", 1))
