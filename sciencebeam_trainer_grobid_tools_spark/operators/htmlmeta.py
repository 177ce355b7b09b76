"""HTML metadata extraction — the page-declared signals a web corpus
carries alongside the extracted text: ``<link rel="canonical">`` (the
page's OWN dedup hint — recrawl pipelines fold variants onto the
declared canonical before content hashing), ``<title>``, and the
OpenGraph/description meta tags used for training-data enrichment.

All pure-Catalyst regexp projections — zero shuffles, zero Python;
attribute order is handled by matching the tag whole and extracting the
attribute from the match (the same pattern as the nofollow filter in
``linkgraph``).  Values are returned raw (entity decoding is the TEI
layer's job); absent tags yield '' so downstream ``nullif`` stays a
caller choice rather than a silent NULL surprise.

Composition note: :func:`canonical_hint` feeds
``urlnorm.canonical_url`` — when a page declares a canonical, dedup on
``coalesce(nullif(canonical_hint, ''), canonical_url(url))`` folds
mobile/AMP/session variants the URL normalizer alone cannot see.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_LINK_TAG_RE = r"<link\s[^>]*>"
_META_TAG_RE = r"<meta\s[^>]*>"
_TITLE_RE = r"(?is)<title[^>]*>([^<]*)</title>"
_HREF_RE = r'href\s*=\s*"([^"]*)'
_CONTENT_RE = r'content\s*=\s*"([^"]*)'


def _tag_attr(html: Column, tag_re: str, marker: str, attr_re: str) -> Column:
    """First tag matching ``tag_re`` whose body contains ``marker``
    (case-insensitive) -> its ``attr_re`` capture ('' when absent)."""
    tags = F.regexp_extract_all(html.cast("string"), F.lit(tag_re), 0)
    hits = F.filter(tags, lambda t: F.lower(t).contains(marker))
    first = F.get(hits, 0)
    return F.coalesce(
        F.regexp_extract(first, attr_re, 1), F.lit("")
    )


def canonical_hint(html: Column) -> Column:
    """href of the first ``<link rel="canonical" ...>`` ('' if none)."""
    return _tag_attr(html, _LINK_TAG_RE, 'rel="canonical"', _HREF_RE)


def page_title(html: Column) -> Column:
    """Text of the first ``<title>`` element ('' if none)."""
    return F.regexp_extract(html.cast("string"), _TITLE_RE, 1)


def og_property(html: Column, prop: str) -> Column:
    """content of the first ``<meta property="og:<prop>">`` ('' if none)."""
    return _tag_attr(
        html, _META_TAG_RE, 'property="og:%s"' % prop.lower(), _CONTENT_RE
    )


def meta_description(html: Column) -> Column:
    """content of the first ``<meta name="description">`` ('' if none)."""
    return _tag_attr(html, _META_TAG_RE, 'name="description"', _CONTENT_RE)
