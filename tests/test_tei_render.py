"""TEI rendering tests (semantics of grobid_training_tei.py:443-531, assertion
style of tests/auto_annotate_header_test.py:75-140)."""

import xml.etree.ElementTree as ET

from sciencebeam_trainer_grobid_tools_spark.operators.annotate import (
    MatcherConfig,
    SimpleMatcher,
    TargetAnnotation,
)
from sciencebeam_trainer_grobid_tools_spark.operators.tei_render import (
    HEADER_TAG_TO_TEI_PATH_MAPPING,
    render_tei_xml,
)

from tests.conftest import doc_for_texts


def render(doc):
    return render_tei_xml(doc, HEADER_TAG_TO_TEI_PATH_MAPPING)


def xpath_text(xml_str, path):
    root = ET.fromstring(xml_str)
    node = root.find(path)
    return "".join(node.itertext()) if node is not None else None


class TestTeiRender:
    def test_title_goes_to_doc_title_title_part(self):
        doc = doc_for_texts(["This is the title"])
        SimpleMatcher([TargetAnnotation("This is the title", "title")]).annotate(doc)
        xml = render(doc)
        assert xpath_text(xml, "text/front/docTitle/titlePart") == "This is the title"

    def test_untagged_goes_to_default_note(self):
        doc = doc_for_texts(["just some text"])
        xml = render(doc)
        assert xpath_text(xml, 'text/front/note[@type="other"]') == "just some text"

    def test_lb_between_lines(self):
        doc = doc_for_texts(["line one", "line two"])
        xml = render(doc)
        root = ET.fromstring(xml)
        assert len(root.findall("text/front/note/lb")) == 1

    def test_begin_prefix_starts_new_element(self):
        doc = doc_for_texts(["University of Science University of Madness"])
        SimpleMatcher(
            [
                TargetAnnotation(["1", "University of Science"], "author_aff"),
                TargetAnnotation(["2", "University of Madness"], "author_aff"),
            ],
            MatcherConfig(extend_to_line_enabled=False),
        ).annotate(doc)
        xml = render(doc)
        root = ET.fromstring(xml)
        affiliations = root.findall("text/front/byline/affiliation")
        assert ["".join(a.itertext()) for a in affiliations] == [
            "University of Science",
            "University of Madness",
        ]

    def test_title_and_author_sequence(self):
        doc = doc_for_texts(["The Title", "Mary Maison"])
        SimpleMatcher(
            [
                TargetAnnotation("The Title", "title"),
                TargetAnnotation(["Mary", "Maison"], "author"),
            ]
        ).annotate(doc)
        xml = render(doc)
        assert xpath_text(xml, "text/front/docTitle/titlePart") == "The Title"
        assert xpath_text(xml, "text/front/byline/docAuthor") == "Mary Maison"

    def test_unknown_field_note_fallback_mapping(self):
        mapping = dict(HEADER_TAG_TO_TEI_PATH_MAPPING)
        mapping["keywords"] = 'note[@type="keywords"]'
        doc = doc_for_texts(["alpha beta"])
        SimpleMatcher([TargetAnnotation("alpha beta", "keywords")]).annotate(doc)
        xml = render_tei_xml(doc, mapping)
        assert xpath_text(xml, 'text/front/note[@type="keywords"]') == "alpha beta"

    def test_whitespace_preserved_inside_element(self):
        doc = doc_for_texts(["a  b"])  # double space collapses in tokenizer join
        xml = render(doc)
        assert xpath_text(xml, 'text/front/note[@type="other"]') == "a b"


class TestTeiRoundTrip:
    def test_rendered_tei_reextracts_to_same_text(self):
        """S3 parity: rendered training TEI (with <lb/> line breaks) fed back
        through the extractor reproduces the same extracted text."""
        from sciencebeam_trainer_grobid_tools_spark.kernel.doc import tokenize_lines
        from sciencebeam_trainer_grobid_tools_spark.operators.extract import html_to_lines

        doc = doc_for_texts(["The Title here", "by Mary Maison", "Abstract text."])
        SimpleMatcher(
            [
                TargetAnnotation("The Title here", "title"),
                TargetAnnotation(["Mary", "Maison"], "author"),
            ]
        ).annotate(doc)
        xml = render(doc)
        reextracted = tokenize_lines(html_to_lines(xml)).extracted_text
        assert reextracted == doc.extracted_text
