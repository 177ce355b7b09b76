"""Broken-XML recovery tests (semantics of utils/xml.py:163-234 and the
reference's xml_test expectations)."""

import xml.etree.ElementTree as ET

from sciencebeam_trainer_grobid_tools_spark.operators.xmlfix import (
    fix_xml,
    fix_xml_string,
    strip_xml_junk,
)


def parses(s: str) -> bool:
    try:
        ET.fromstring(s)
        return True
    except ET.ParseError:
        return False


class TestFixXml:
    def test_valid_xml_unchanged(self):
        xml = "<article><front>text</front></article>"
        assert fix_xml_string(xml) == xml

    def test_closes_unclosed_elements_at_eof(self):
        fixed = fix_xml_string("<article><front>text")
        assert parses(fixed)
        assert fixed == "<article><front>text</front></article>"

    def test_stray_close_tag_closes_current_element(self):
        # reference behavior (utils/xml.py:197-203): an end tag matching no
        # open element closes the current element
        fixed = fix_xml_string("<article></bogus>text</article>")
        assert fixed == "<article></article>text"

    def test_unbalanced_close_closes_current(self):
        # </b> with <i> open (b not on stack): the current element closes
        fixed = fix_xml_string("<p><i>one</b>two</p>")
        assert parses(fixed)

    def test_mismatched_nesting_recovers(self):
        fixed = fix_xml_string("<a><b>inner</a>tail")
        assert parses(fixed)
        root = ET.fromstring(fixed)
        assert root.tag == "a"
        assert root.find("b") is not None

    def test_attributes_requoted(self):
        fixed = fix_xml_string('<fig id=f1><label>Figure "1"</label>')
        assert parses(fixed)
        assert ET.fromstring(fixed).get("id") == "f1"

    def test_junk_strip_dagger_and_leading_whitespace(self):
        assert strip_xml_junk("  \n<x>&dagger;</x>") == "<x>&#8224;</x>"
        assert parses(fix_xml(b"  <x>&dagger;</x>"))


class TestGetFixedXmlStrParity:
    """Reference tests/utils/xml_test.py TestGetFixedXmlStr ported verbatim —
    exact output-string parity for the recovery reserializer (F13)."""

    CASES = [
        ("<tei><text>abc</text></tei>", "<tei><text>abc</text></tei>"),
        (
            '<tei xmlns="http://www.tei-c.org/ns/1.0"><text>abc</text></tei>',
            '<tei xmlns="http://www.tei-c.org/ns/1.0"><text>abc</text></tei>',
        ),
        (
            "<tei><text><figure>abc</p></text></tei>",
            "<tei><text><figure>abc</figure></text></tei>",
        ),
        (
            "<tei><text><figure>abc</p><figure>abc</p></text></tei>",
            "<tei><text><figure>abc</figure><figure>abc</figure></text></tei>",
        ),
        (
            "<tei><text><figure>abc</text></tei>",
            "<tei><text><figure>abc</figure></text></tei>",
        ),
        (
            '<tei xmlns="http://www.tei-c.org/ns/1.0"><text><figure>abc</p></text></tei>',
            '<tei xmlns="http://www.tei-c.org/ns/1.0"><text><figure>abc</figure></text></tei>',
        ),
        (
            '<tei><text><figure a="1" b="2">abc</p></text></tei>',
            '<tei><text><figure a="1" b="2">abc</figure></text></tei>',
        ),
        (
            '<tei><text><figure a="1" b="2">a &gt; b</p></text></tei>',
            '<tei><text><figure a="1" b="2">a &gt; b</figure></text></tei>',
        ),
        (
            '<tei><text><figure a="1" b="2">a &apos; b</p></text></tei>',
            "<tei><text><figure a=\"1\" b=\"2\">a ' b</figure></text></tei>",
        ),
        (
            '<tei><text><figure a="1 &amp; 2">abc</p></text></tei>',
            '<tei><text><figure a="1 &amp; 2">abc</figure></text></tei>',
        ),
    ]

    def test_reference_expectations_byte_exact(self):
        from sciencebeam_trainer_grobid_tools_spark.operators.xmlfix import fix_xml

        for src, want in self.CASES:
            assert fix_xml(src) == want, src
