"""Layer-3 golden end-to-end cases ported from the reference's
tests/auto_annotate_header_test.py: raw TEI input + target JATS ->
extract -> align -> render TEI -> XPath text assertions."""

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
from sciencebeam_trainer_grobid_tools_spark.operators.tei_render import (
    HEADER_TAG_TO_TEI_PATH_MAPPING,
    render_tei_xml,
)
from sciencebeam_trainer_grobid_tools_spark.sources.corpus import DEFAULT_XML_MAPPING

TITLE_1 = "Chocolate bars for mice"
ABSTRACT_PREFIX_1 = "Abstract"
ABSTRACT_1 = "This study explores the nutritious value of chocolate bars for mice."


def run_header_pipeline(tei_raw: str, target_xml: str) -> str:
    """TEI raw -> lines -> tokenize -> targets -> simple matcher -> TEI out
    (the auto_annotate_header flow: auto_annotate_header.py:52-96)."""
    mapping = parse_xml_mapping_string(DEFAULT_XML_MAPPING)
    doc = tokenize_lines(html_to_lines(tei_raw))
    targets = xml_string_to_target_annotations(target_xml, mapping)
    # the header flavor does not apply level-2 sub annotations (those belong
    # to the affiliation/reference flavors — auto_annotate_header.py:52-96)
    SimpleMatcher(
        targets,
        MatcherConfig(
            use_sub_annotations=False, tag_config_map=get_tag_config_map(mapping)
        ),
    ).annotate(doc)
    return render_tei_xml(doc, HEADER_TAG_TO_TEI_PATH_MAPPING)


def xpath_text(xml_str: str, path: str) -> str:
    """Join matched nodes' text with a space (the reference's get_xpath_text
    joins the text content list with ' ')."""
    root = ET.fromstring(xml_str)
    return " ".join("".join(node.itertext()) for node in root.findall(path))


def target_xml(
    title: str = "",
    contribs: str = "",
    affs: str = "",
    abstract: str = "",
) -> str:
    title_xml = (
        "<title-group><article-title>%s</article-title></title-group>" % title
        if title
        else ""
    )
    abstract_xml = "<abstract><p>%s</p></abstract>" % abstract if abstract else ""
    return (
        "<article><front><article-meta>"
        "<contrib-group>%s%s</contrib-group>%s%s"
        "</article-meta></front><body/><back/></article>"
        % (contribs, affs, title_xml, abstract_xml)
    )


def contrib(surname: str, given: str) -> str:
    return (
        "<contrib><name><surname>%s</surname><given-names>%s</given-names>"
        "</name></contrib>" % (surname, given)
    )


class TestHeaderGoldenEndToEnd:
    # auto_annotate_header_test.py:62-92
    def test_auto_annotate_title(self):
        tei_raw = "<tei><text><front><note>text 1</note></front></text></tei>"
        out = run_header_pipeline(tei_raw, target_xml(title="text 1"))
        assert xpath_text(out, ".//docTitle/titlePart") == "text 1"

    # auto_annotate_header_test.py:94-109 (title.extend-to-line=false keeps
    # the 'Title:' prefix out of the annotation)
    def test_title_prefix_not_included(self):
        tei_raw = (
            "<tei><text><front><note>Title: %s</note></front></text></tei>" % TITLE_1
        )
        out = run_header_pipeline(tei_raw, target_xml(title=TITLE_1))
        assert xpath_text(out, ".//docTitle/titlePart") == TITLE_1

    # auto_annotate_header_test.py:111-154
    def test_multiple_fields(self):
        author_text = "Mary Maison 1, John Smith 1"
        affiliation_text = "1 University of Science, Smithonia"
        tei_raw = (
            "<tei><text><front>"
            "<note>%s</note><lb/>"
            "<note>%s</note><lb/>"
            "<note>%s</note><lb/>"
            "<note>%s<lb/>%s</note>"
            "</front></text></tei>"
            % (TITLE_1, author_text, affiliation_text, ABSTRACT_PREFIX_1, ABSTRACT_1)
        )
        target = target_xml(
            title=TITLE_1,
            contribs=contrib("Maison", "Mary") + contrib("Smith", "John"),
            affs=(
                "<aff><institution>University of Science</institution>"
                "<country>Smithonia</country></aff>"
            ),
            abstract=ABSTRACT_1,
        )
        out = run_header_pipeline(tei_raw, target)
        assert xpath_text(out, ".//docTitle/titlePart") == TITLE_1
        assert xpath_text(out, ".//byline/docAuthor") == author_text
        assert xpath_text(out, ".//byline/affiliation") == affiliation_text
        assert xpath_text(out, './/div[@type="abstract"]') == (
            ABSTRACT_PREFIX_1 + ABSTRACT_1
        )
