"""Broken-XML recovery reserialization (reference F13/S5).

Port of ``utils/xml.py:163-234`` (``FixingHtmlParser`` / ``get_fixed_xml_str``):
valid XML passes through untouched; malformed XML is re-parsed with python's
tolerant HTML parser and reserialized well-formed — unmatched close tags are
dropped or close up to the matching open tag, and open tags left at EOF are
closed.  Used by the figure/table/fulltext flavors to repair target XML
before extraction (auto_annotate_figure.py:92-110,
auto_annotate_fulltext.py:240-243).

Also ports ``auto_download_and_fix_input_file``'s junk strips
(utils/xml.py:84-104): a bare ``&dagger;`` entity and leading whitespace
before the XML declaration both break strict parsers.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
import xml.sax.saxutils
from html.parser import HTMLParser
from io import StringIO
from typing import List, Union


class _FixingParser(HTMLParser):
    """Reserialize a tag soup as balanced XML (utils/xml.py:163-218)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.buffer = StringIO()
        self.tag_stack: List[str] = []

    def handle_starttag(self, tag, attrs) -> None:
        self.buffer.write("<%s" % tag)
        for key, value in attrs:
            self.buffer.write(" %s=%s" % (key, xml.sax.saxutils.quoteattr(value or "")))
        self.buffer.write(">")
        self.tag_stack.append(tag)

    def handle_startendtag(self, tag, attrs) -> None:
        self.buffer.write("<%s" % tag)
        for key, value in attrs:
            self.buffer.write(" %s=%s" % (key, xml.sax.saxutils.quoteattr(value or "")))
        self.buffer.write("/>")

    def _close_current(self) -> None:
        tag = self.tag_stack.pop()
        self.buffer.write("</%s>" % tag)

    def handle_endtag(self, tag) -> None:
        if not self.tag_stack:
            return  # stray close tag with nothing open: drop
        if tag == self.tag_stack[-1]:
            self._close_current()
            return
        if tag not in self.tag_stack:
            # close tag not matching any open element: close the current one
            self._close_current()
            return
        # reference quirk (utils/xml.py:204-209): closes intermediates until
        # the matching tag is current, but leaves the tag itself open
        while tag != self.tag_stack[-1]:
            self._close_current()

    def handle_data(self, data) -> None:
        self.buffer.write(xml.sax.saxutils.escape(data))

    def close(self) -> None:
        super().close()
        while self.tag_stack:
            self._close_current()


def fix_xml_string(xml_str: str) -> str:
    """Return the input unchanged when it parses; otherwise the recovered
    well-formed reserialization (utils/xml.py:221-234)."""
    try:
        ET.fromstring(xml_str)
        return xml_str
    except ET.ParseError:
        pass
    parser = _FixingParser()
    parser.feed(xml_str)
    parser.close()
    return parser.buffer.getvalue()


def strip_xml_junk(xml_str: str) -> str:
    """Input repairs applied before parsing (utils/xml.py:84-104):
    bare ``&dagger;`` -> numeric entity; strip leading whitespace."""
    return xml_str.replace("&dagger;", "&#8224;").lstrip()


def fix_xml(xml_data: Union[str, bytes], encoding: str = "utf-8") -> str:
    if isinstance(xml_data, (bytes, bytearray)):
        xml_data = xml_data.decode(encoding, errors="replace")
    return fix_xml_string(strip_xml_junk(xml_data))
