"""Reference-flavor golden e2e: segment references from a listBibl container,
annotate sub-fields, post-process, render to bibl structure (style of
tests/auto_annotate_reference_test.py; mapping of auto_annotate_reference.py:51-73
without the tei: namespace, which stdlib ET test docs do not carry)."""

import textwrap
import xml.etree.ElementTree as ET

from sciencebeam_trainer_grobid_tools_spark.kernel.doc import tokenize_lines
from sciencebeam_trainer_grobid_tools_spark.operators.extract import html_to_lines
from sciencebeam_trainer_grobid_tools_spark.operators.targets import (
    get_tag_config_map,
    parse_xml_mapping_string,
    xml_string_to_target_annotations,
)
from sciencebeam_trainer_grobid_tools_spark.operators.tei_render import render_tagged_lines
from sciencebeam_trainer_grobid_tools_spark.plans.flavors import reference_flavor
from sciencebeam_trainer_grobid_tools_spark.operators.annotate import MatcherConfig

REFERENCE_XML_MAPPING = textwrap.dedent(
    """
    [article]
    reference = back/ref-list/ref
    reference.children = .//*
    reference.sub.reference-label = ./label
    reference.sub.reference-author = .//string-name
    reference.sub.reference-article-title = .//article-title
    reference.sub.reference-year = .//year
    reference.sub.reference-source = .//source
    """
)

REFERENCE_TEI_MAPPING = {
    "DEFAULT": 'note[@type="other"]',
    "reference": "bibl",
    "reference-label": "bibl/label",
    "reference-author": "bibl/author",
    "reference-article-title": 'bibl/title[@level="a"]',
    "reference-year": "bibl/date",
    "reference-source": 'bibl/title[@level="j"]',
}


def texts(root: ET.Element, path: str):
    return ["".join(n.itertext()) for n in root.findall(path)]


class TestReferenceGolden:
    def test_segments_and_sub_annotates_references(self):
        ref1 = "1. Maison M. Chocolate bars for mice. Mouse Journal. 2021."
        ref2 = "2. Smith J. Cheese wheels for rats. Rat Review. 2019."
        tei_raw = (
            "<tei><text><back><listBibl>%s<lb/>%s<lb/></listBibl></back></text></tei>"
            % (ref1, ref2)
        )
        target = (
            "<article><front/><body/><back><ref-list>"
            "<ref><label>1</label><element-citation>"
            "<string-name>Maison M</string-name>"
            "<article-title>Chocolate bars for mice</article-title>"
            "<source>Mouse Journal</source><year>2021</year>"
            "</element-citation></ref>"
            "<ref><label>2</label><element-citation>"
            "<string-name>Smith J</string-name>"
            "<article-title>Cheese wheels for rats</article-title>"
            "<source>Rat Review</source><year>2019</year>"
            "</element-citation></ref>"
            "</ref-list></back></article>"
        )
        mapping = parse_xml_mapping_string(REFERENCE_XML_MAPPING)
        doc = tokenize_lines(html_to_lines(tei_raw))
        targets = xml_string_to_target_annotations(target, mapping)
        chain = reference_flavor(
            matcher_config=MatcherConfig(
                use_sub_annotations=True,
                extend_to_line_enabled=False,
                tag_config_map=get_tag_config_map(mapping),
            ),
            segment_references=True,
        )
        chain(doc, targets)
        container = ET.Element("listBibl")
        render_tagged_lines(container, doc, REFERENCE_TEI_MAPPING)
        bibls = container.findall("bibl")
        assert len(bibls) == 2
        assert texts(container, "bibl/date") == ["2021", "2019"]
        assert texts(container, 'bibl/title[@level="a"]') == [
            "Chocolate bars for mice",
            "Cheese wheels for rats",
        ]
        # the post-processor absorbs the '.' after author initials into the
        # author span (W6 name-suffix rule, reference_annotator.py:209-262)
        assert texts(container, "bibl/author") == ["Maison M.", "Smith J."]
        assert texts(container, 'bibl/title[@level="j"]') == [
            "Mouse Journal",
            "Rat Review",
        ]
