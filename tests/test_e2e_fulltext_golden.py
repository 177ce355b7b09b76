"""Fulltext-flavor golden e2e case (style of tests/auto_annotate_fulltext_test.py):
section titles with label+title children.concat, paragraphs via the
parenthesized-union xpath of the reference's config, rendered to head/p."""

import textwrap
import xml.etree.ElementTree as ET

from sciencebeam_trainer_grobid_tools_spark.kernel.doc import tokenize_lines
from sciencebeam_trainer_grobid_tools_spark.operators.annotate import (
    MatcherConfig,
    SimpleMatcher,
)
from sciencebeam_trainer_grobid_tools_spark.operators.extract import html_to_lines
from sciencebeam_trainer_grobid_tools_spark.operators.targets import (
    get_tag_config_map,
    parse_xml_mapping_string,
    xml_string_to_target_annotations,
)
from sciencebeam_trainer_grobid_tools_spark.operators.tei_render import render_tagged_lines

# section entries of the reference's config/xml-mapping.conf:44-56
FULLTEXT_XML_MAPPING = textwrap.dedent(
    """
    [article]
    section_title =
      ./body//sec
      ./back//sec
    section_title.children = ./title
    section_title.children.concat = [[{"xpath": "./label"}, {"value": " "}, {"xpath": "./title"}]]
    section_paragraph =
      (//sec | //ack)/p
      ./body/p
    section_paragraph.max_chunks = 2
    """
)

FULLTEXT_TEI_MAPPING = {
    "DEFAULT": "other",
    "section_title": "head",
    "section_paragraph": "p",
}


def run_fulltext(tei_raw: str, target: str) -> ET.Element:
    mapping = parse_xml_mapping_string(FULLTEXT_XML_MAPPING)
    doc = tokenize_lines(html_to_lines(tei_raw))
    targets = xml_string_to_target_annotations(target, mapping)
    SimpleMatcher(
        targets, MatcherConfig(tag_config_map=get_tag_config_map(mapping))
    ).annotate(doc)
    container = ET.Element("text")
    render_tagged_lines(container, doc, FULLTEXT_TEI_MAPPING)
    return container


def texts(root: ET.Element, path: str):
    return ["".join(n.itertext()) for n in root.findall(path)]


class TestFulltextGolden:
    def test_section_title_with_label_concat_and_paragraph(self):
        tei_raw = (
            "<tei><text>1 Introduction<lb/>"
            "The quick brown fox jumps over the lazy dog today.<lb/></text></tei>"
        )
        target = (
            "<article><front/><body>"
            "<sec><label>1</label><title>Introduction</title>"
            "<p>The quick brown fox jumps over the lazy dog today.</p></sec>"
            "</body><back/></article>"
        )
        out = run_fulltext(tei_raw, target)
        assert texts(out, ".//head") == ["1 Introduction"]
        assert texts(out, ".//p") == [
            "The quick brown fox jumps over the lazy dog today."
        ]

    def test_ack_paragraph_via_union_xpath(self):
        tei_raw = (
            "<tei><text>We thank the mice for their contribution to science.<lb/>"
            "</text></tei>"
        )
        target = (
            "<article><front/><body/><back>"
            "<ack><p>We thank the mice for their contribution to science.</p></ack>"
            "</back></article>"
        )
        out = run_fulltext(tei_raw, target)
        assert texts(out, ".//p") == [
            "We thank the mice for their contribution to science."
        ]
