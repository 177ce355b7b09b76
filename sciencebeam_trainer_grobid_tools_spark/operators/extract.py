"""HTML -> text-lines extraction (vectorized DOM parse + boilerplate strip).

The reference consumes GROBID-training TEI XML where ``<lb/>`` delimits lines
(structured_document/grobid_training_tei.py:280-317) and repairs broken
markup with an HTML-parser-based recovery pass (utils/xml.py:163-250).  The
web-corpus engine generalizes that stage: Common-Crawl-style ``html`` bytes
are parsed with python's tolerant ``html.parser`` (the same recovery strategy
the reference uses), boilerplate containers are dropped, block-level elements
and ``<br/>``/``<lb/>`` become line breaks, and in-line whitespace runs
collapse to single spaces.

The output lines feed ``kernel.doc.tokenize_lines``; the canonical
*extracted text* (the byte-identity invariant per url) is the token-level
reconstruction of these lines.

Pure function of the input bytes — safe to run inside ``mapInPandas``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Union

# containers whose entire subtree is boilerplate / non-content
SKIPPED_ELEMENTS = frozenset(
    {
        "head",
        "script",
        "style",
        "noscript",
        "template",
        "svg",
        "iframe",
        "form",
        "button",
        "nav",
        "header",
        "footer",
        "aside",
        "select",
        "option",
    }
)

# elements that terminate the current line
BLOCK_ELEMENTS = frozenset(
    {
        "p",
        "div",
        "section",
        "article",
        "main",
        "body",
        "li",
        "ul",
        "ol",
        "table",
        "tr",
        "td",
        "th",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "blockquote",
        "pre",
        "figure",
        "figcaption",
        "dl",
        "dt",
        "dd",
        "address",
    }
)

LINE_BREAK_ELEMENTS = frozenset({"br", "lb", "hr"})

_WHITESPACE_RUN = re.compile(r"\s+")


class _LineExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.lines: List[str] = []
        self._parts: List[str] = []
        self._skip_depth = 0

    def _flush_line(self) -> None:
        text = _WHITESPACE_RUN.sub(" ", "".join(self._parts)).strip()
        self._parts = []
        if text:
            self.lines.append(text)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIPPED_ELEMENTS:
            self._skip_depth += 1
            self._flush_line()
            return
        if self._skip_depth:
            return
        if tag in LINE_BREAK_ELEMENTS or tag in BLOCK_ELEMENTS:
            self._flush_line()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._skip_depth:
            return
        if tag in LINE_BREAK_ELEMENTS or tag in BLOCK_ELEMENTS:
            self._flush_line()

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIPPED_ELEMENTS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag in BLOCK_ELEMENTS:
            self._flush_line()

    def handle_data(self, data: str) -> None:
        if not self._skip_depth and data:
            self._parts.append(data)

    def close(self) -> None:
        super().close()
        self._flush_line()


def html_to_lines(html: Union[bytes, str]) -> List[str]:
    """Extract content text lines from (possibly malformed) HTML."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    parser = _LineExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:  # malformed beyond recovery: fall back to tag stripping
        text = re.sub(r"<[^>]*>", "\n", html)
        return [ln.strip() for ln in text.splitlines() if ln.strip()]
    return parser.lines


def text_to_lines(text: Optional[str]) -> List[str]:
    """Line split for the pre-extracted ``text`` column path."""
    if not text:
        return []
    return [ln for ln in text.split("\n")]
