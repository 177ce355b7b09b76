"""TEI input loading with preserved tags (reference S3/P9 semantics), plus an
affiliation-flavor golden case (style of
tests/auto_annotate_affiliation_address_test.py:81-158)."""

import xml.etree.ElementTree as ET

from sciencebeam_trainer_grobid_tools_spark.operators.annotate import (
    MatcherConfig,
    SubTagOnlyMatcher,
    TargetAnnotation,
)
from sciencebeam_trainer_grobid_tools_spark.operators.tei_render import render_tagged_lines
from sciencebeam_trainer_grobid_tools_spark.sources.tei import load_tei_doc

HEADER_MAPPING = {
    "title": "docTitle/titlePart",
    "author": "byline/docAuthor",
}

AFFILIATION_MAPPING = {
    "author_aff": "affiliation",
    "author_aff-label": "affiliation/marker",
    "author_aff-institution": 'affiliation/orgName[@type="institution"]',
    "author_aff-country": "affiliation/address/country",
}


class TestLoadTeiDoc:
    def test_loads_lines_and_extracted_text(self):
        tei = "<tei><text><front><note>line one<lb/>line two</note></front></text></tei>"
        doc = load_tei_doc(tei, HEADER_MAPPING)
        assert doc.extracted_text == "line one\nline two"
        assert len(doc.lines) == 2

    def test_preserves_mapped_tags_with_prefixes(self):
        tei = (
            "<tei><text><front>"
            "<docTitle><titlePart>The Title</titlePart></docTitle>"
            "<byline><docAuthor>Mary Maison</docAuthor></byline>"
            "</front></text></tei>"
        )
        doc = load_tei_doc(tei, HEADER_MAPPING)
        tokens = list(doc.iter_tokens())
        assert [t.preserved_tag for t in tokens] == [
            "b-title",
            "i-title",
            "b-author",
            "i-author",
        ]
        assert all(t.tag is None for t in tokens)

    def test_unmapped_tagged_element_keeps_path_tag(self):
        tei = "<tei><text><front><note>some note</note></front></text></tei>"
        doc = load_tei_doc(tei, HEADER_MAPPING)
        tokens = list(doc.iter_tokens())
        assert tokens[0].preserved_tag == "b-note"

    def test_no_preserve_clears_everything(self):
        tei = "<tei><text><front><docTitle><titlePart>T x</titlePart></docTitle></front></text></tei>"
        doc = load_tei_doc(tei, HEADER_MAPPING, preserve_tags=False)
        assert all(t.preserved_tag is None and t.tag is None for t in doc.iter_tokens())


class TestAffiliationFlavorGolden:
    def test_sub_annotates_label_and_fields_within_preserved_affiliation(self):
        # input TEI already carries the affiliation annotation; the flavor
        # only adds level-2 sub fields (SubTagOnly + render)
        aff_text = "1 University of Science, France"
        tei = (
            "<tei><text><front><affiliation>%s</affiliation></front></text></tei>"
            % aff_text
        )
        doc = load_tei_doc(tei, AFFILIATION_MAPPING)
        # restore the preserved main tags the way annotate flows do for the
        # affiliation flavor (SubTagOnly stashes tag-or-preserved)
        targets = [
            TargetAnnotation(
                aff_text,
                "author_aff",
                sub_annotations=[
                    TargetAnnotation("1", "author_aff-label"),
                    TargetAnnotation("University of Science", "author_aff-institution"),
                    TargetAnnotation("France", "author_aff-country"),
                ],
            )
        ]
        SubTagOnlyMatcher(
            targets,
            MatcherConfig(use_sub_annotations=True, extend_to_line_enabled=False),
        ).annotate(doc)
        container = ET.Element("front")
        render_tagged_lines(container, doc, AFFILIATION_MAPPING)
        aff = container.find("affiliation")
        assert aff is not None
        assert "".join(aff.find("marker").itertext()) == "1"
        assert (
            "".join(aff.find('orgName[@type="institution"]').itertext())
            == "University of Science"
        )
        assert "".join(aff.find("address/country").itertext()) == "France"
