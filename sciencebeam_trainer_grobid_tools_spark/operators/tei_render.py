"""TEI training-XML rendering (SURVEY.md §2.11).

Port of the reference's ``_lines_to_tei`` tree-building FSM
(structured_document/grobid_training_tei.py:361-549): walk tagged tokens in
order, map tag values to TEI paths (e.g. ``title -> docTitle/titlePart``),
open/close nested elements on B- prefixes with common-path reuse, keep
whitespace pending until the next token decides its container, emit ``<lb/>``
between lines, and place sub-tagged tokens at their sub-path when it extends
the main path.

Stdlib ``xml.etree.ElementTree`` (no lxml in this environment); a parent
stack replaces lxml's ``getparent``.  Unknown fields fall back to
``note[@type="<field>"]`` like the reference entry points
(auto_annotate_header.py:68-71).

The span table stays the engine's primary output; this serialization exists
for reference-parity checks and GROBID-training interchange.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from itertools import zip_longest
from typing import Dict, List, Optional, Tuple

from ..kernel.doc import TokenizedDoc
from .annotate import B_PREFIX, split_tag_prefix

DEFAULT_TAG_KEY = "DEFAULT"

# header flavor mapping (auto_annotate_header.py:32-39)
HEADER_TAG_TO_TEI_PATH_MAPPING = {
    DEFAULT_TAG_KEY: 'note[@type="other"]',
    "title": "docTitle/titlePart",
    "abstract": 'div[@type="abstract"]',
    "author": "byline/docAuthor",
    "author_aff": "byline/affiliation",
    "line_no": 'note[@type="line_no"]',
}

_TAG_EXPRESSION = re.compile(r'^([^\[]+)(\[@?([^=]+)="(.+)"\])?$')


def _create_node(tag_expression: str) -> ET.Element:
    """``tag[@attr="value"]`` -> element (grobid_training_tei.py:249-259)."""
    match = _TAG_EXPRESSION.match(tag_expression)
    if not match:
        raise ValueError("invalid tag expression: %s" % tag_expression)
    element = ET.Element(match.group(1))
    if match.group(2):
        element.set(match.group(3), match.group(4))
    return element


def _split_path(path_str: str) -> List[str]:
    return path_str.split("/")


def _common_path(path1: List[str], path2: List[str]) -> List[str]:
    if path1 == path2:
        return list(path1)
    common: List[str] = []
    for p1, p2 in zip_longest(path1, path2):
        if p1 != p2:
            break
        common.append(p1)
    return common


def _path_starts_with(path1: List[str], path2: List[str]) -> bool:
    return _common_path(path1, path2 or []) == path1


def _required_path(tag: Optional[str], mapping: Dict[str, str]) -> List[str]:
    if tag:
        return _split_path(mapping.get(tag, tag))
    default = mapping.get(DEFAULT_TAG_KEY)
    return _split_path(default) if default else []


class _TreeWriter:
    """XmlTreeWriter with an explicit parent stack (ET has no getparent)."""

    def __init__(self, root: ET.Element):
        self.stack: List[ET.Element] = [root]
        self.path: List[str] = []

    @property
    def current(self) -> ET.Element:
        return self.stack[-1]

    def append(self, element: ET.Element) -> None:
        self.current.append(element)

    def append_text(self, text: str) -> None:
        element = self.current
        if len(element):
            last = element[-1]
            last.tail = (last.tail or "") + text
        else:
            element.text = (element.text or "") + text

    def require_path(self, required: List[str]) -> None:
        if required == self.path:
            return
        common = _common_path(self.path, required)
        for _ in range(len(self.path) - len(common)):
            self.stack.pop()
        self.path = list(common)
        for fragment in required[len(common):]:
            child = _create_node(fragment)
            self.current.append(child)
            self.stack.append(child)
            self.path.append(fragment)

    def require_path_or_below(self, required: List[str]) -> None:
        self.require_path(_common_path(self.path, required))


def render_tagged_lines(
    container: ET.Element,
    doc: TokenizedDoc,
    tag_to_tei_path_mapping: Optional[Dict[str, str]] = None,
) -> ET.Element:
    """Write the document's tagged tokens into ``container``
    (grobid_training_tei.py:443-531)."""
    mapping = tag_to_tei_path_mapping or {}
    writer = _TreeWriter(container)
    pending_whitespace: Optional[str] = None
    for line_index, line in enumerate(doc.lines):
        if line_index:
            if pending_whitespace:
                # whitespace before a line break belongs where we are
                writer.require_path_or_below(writer.path)
                writer.append_text(pending_whitespace)
                pending_whitespace = None
            writer.append(ET.Element("lb"))
        last_index = len(line) - 1
        for token_index, token in enumerate(line):
            main_full = token.tag or token.preserved_tag
            sub_full = token.sub_tag
            main_prefix, main_tag = split_tag_prefix(main_full)
            sub_prefix, sub_tag = split_tag_prefix(sub_full)
            main_path = _required_path(main_tag, mapping)
            sub_path = _required_path(sub_tag, mapping) if sub_full else []
            if sub_full and not _path_starts_with(main_path, sub_path):
                sub_full = None
                sub_path = []
            if main_prefix == B_PREFIX:
                writer.require_path(main_path[:-1])
            elif sub_prefix == B_PREFIX:
                writer.require_path_or_below(sub_path[:-1])
            required = sub_path if sub_full else main_path
            if pending_whitespace:
                writer.require_path_or_below(required)
                writer.append_text(pending_whitespace)
                pending_whitespace = None
            writer.require_path(required)
            writer.append_text(token.text)
            # recorded whitespace is emitted as-is; an unset value means a
            # single space mid-line (the joined-text default) and nothing at
            # end of line (the reference has no space token there)
            if token.whitespace is not None:
                pending_whitespace = token.whitespace or None
            else:
                pending_whitespace = " " if token_index < last_index else None
    return container


def render_tei_xml(
    doc: TokenizedDoc,
    tag_to_tei_path_mapping: Optional[Dict[str, str]] = None,
    container_path: Tuple[str, ...] = ("text", "front"),
) -> str:
    """Serialize a full GROBID-training-TEI document string with the tagged
    tokens inside ``tei/<container_path>``."""
    root = ET.Element("tei")
    container = root
    for name in container_path:
        child = ET.Element(name)
        container.append(child)
        container = child
    render_tagged_lines(container, doc, tag_to_tei_path_mapping)
    return ET.tostring(root, encoding="unicode")
