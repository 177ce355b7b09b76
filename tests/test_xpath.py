"""Unit tests for the XPath-1.0-subset evaluator (operators/xpath.py).

Covers every construct used by the reference's shipped
config/xml-mapping.conf (the forms that made round-1's ET-subset rewriter
raise ``SyntaxError: invalid predicate``), checked against semantics of
lxml's ``.xpath()`` as used in
reference annotation/target_annotation.py:59-62.
"""

import xml.etree.ElementTree as ET

import pytest

from sciencebeam_trainer_grobid_tools_spark.operators.xpath import (
    XPathContext,
    XPathSyntaxError,
    parse_xpath,
)


def _ctx(xml: str):
    root = ET.fromstring(xml)
    return root, XPathContext(root)


def _tags(nodes):
    return [n.tag for n in nodes]


def _texts(nodes):
    return [(n.text or "").strip() for n in nodes]


class TestBasicPaths:
    def test_child_path(self):
        root, ctx = _ctx("<r><a><b>1</b></a><b>2</b></r>")
        assert _texts(ctx.findall(root, "a/b")) == ["1"]
        assert _texts(ctx.findall(root, "b")) == ["2"]

    def test_descendant_anywhere(self):
        root, ctx = _ctx("<r><a><b>1</b></a><b>2</b></r>")
        assert _texts(ctx.findall(root, "//b")) == ["1", "2"]

    def test_absolute_anywhere_can_match_root(self):
        root, ctx = _ctx("<r><a/></r>")
        assert ctx.findall(root, "//r") == [root]

    def test_dot_relative_descendant(self):
        root, ctx = _ctx("<r><a><b>1</b><c><b>2</b></c></a><b>3</b></r>")
        a = root.find("a")
        assert _texts(ctx.findall(a, ".//b")) == ["1", "2"]

    def test_wildcard_children(self):
        root, ctx = _ctx("<r><a>1</a><b>2</b></r>")
        assert _tags(ctx.findall(root, "./*")) == ["a", "b"]

    def test_document_order_and_dedup(self):
        root, ctx = _ctx("<r><a><b>1</b></a><b>2</b></r>")
        # union selecting overlapping sets stays unique + doc-ordered
        assert _texts(ctx.findall(root, ".//b | a/b")) == ["1", "2"]

    def test_parent_step(self):
        root, ctx = _ctx("<r><a><b/></a></r>")
        b = root.find("a/b")
        assert _tags(ctx.findall(b, "..")) == ["a"]


class TestUnions:
    def test_top_level_union(self):
        root, ctx = _ctx("<r><label>L</label><x/><caption>C</caption></r>")
        assert _tags(ctx.findall(root, "./label | ./caption")) == ["label", "caption"]

    def test_parenthesized_group_with_suffix(self):
        # config: (//sec | //ack)/p
        root, ctx = _ctx(
            "<r><sec><p>s1</p></sec><ack><p>a1</p></ack><other><p>x</p></other></r>"
        )
        assert _texts(ctx.findall(root, "(//sec | //ack)/p")) == ["s1", "a1"]

    def test_bare_name_union(self):
        # config: fpage|lpage
        root, ctx = _ctx("<r><fpage>1</fpage><mid/><lpage>9</lpage></r>")
        assert _texts(ctx.findall(root, "fpage|lpage")) == ["1", "9"]


class TestPredicates:
    def test_attribute_equals(self):
        root, ctx = _ctx(
            '<r><issn pub-id-type="epub">e</issn><issn pub-id-type="ppub">p</issn></r>'
        )
        assert _texts(ctx.findall(root, 'issn[@pub-id-type="epub"]')) == ["e"]
        assert _texts(ctx.findall(root, "issn[@pub-id-type='ppub']")) == ["p"]

    def test_not_attribute_or_equals(self):
        # config: contrib[not(@contrib-type) or @contrib-type="author"]
        root, ctx = _ctx(
            '<r><contrib contrib-type="author">a</contrib>'
            "<contrib>b</contrib>"
            '<contrib contrib-type="editor">c</contrib></r>'
        )
        matched = ctx.findall(
            root, 'contrib[not(@contrib-type) or @contrib-type="author"]'
        )
        assert _texts(matched) == ["a", "b"]

    def test_kwd_group_type(self):
        root, ctx = _ctx(
            "<g><kwd>plain</kwd>"
            '<kwd kwd-group-type="author-keywords">ak</kwd>'
            '<kwd kwd-group-type="other">o</kwd></g>'
        )
        matched = ctx.findall(
            root, "kwd[@kwd-group-type='author-keywords' or not(@kwd-group-type)]"
        )
        assert _texts(matched) == ["plain", "ak"]

    def test_not_ancestor(self):
        # config: back//sec[not(ancestor::ack)]/p[not(ancestor::ack)]
        root, ctx = _ctx(
            "<back><ack><sec><p>in-ack</p></sec></ack><sec><p>plain</p></sec></back>"
        )
        matched = ctx.findall(root, "//sec[not(ancestor::ack)]/p[not(ancestor::ack)]")
        assert _texts(matched) == ["plain"]

    def test_and_of_nots(self):
        # config: back//p[not(ancestor::sec) and not(ancestor::ack)]
        root, ctx = _ctx(
            "<back><sec><p>s</p></sec><ack><p>a</p></ack><p>free</p></back>"
        )
        matched = ctx.findall(
            root, "//p[not(ancestor::sec) and not(ancestor::ack)]"
        )
        assert _texts(matched) == ["free"]

    def test_not_self(self):
        # config: ./*[not(self::list-item)]
        root, ctx = _ctx(
            "<list><title>T</title><list-item>i1</list-item><label>L</label></list>"
        )
        assert _tags(ctx.findall(root, "./*[not(self::list-item)]")) == [
            "title",
            "label",
        ]

    def test_not_ancestor_person_group(self):
        # config: .//string-name[not(ancestor::person-group)]
        root, ctx = _ctx(
            "<ref><person-group person-group-type='editor'>"
            "<string-name>Ed</string-name></person-group>"
            "<string-name>Au</string-name></ref>"
        )
        matched = ctx.findall(root, ".//string-name[not(ancestor::person-group)]")
        assert _texts(matched) == ["Au"]

    def test_person_group_editor_path(self):
        root, ctx = _ctx(
            "<ref><person-group person-group-type='editor'>"
            "<string-name>Ed</string-name></person-group>"
            "<person-group person-group-type='author'>"
            "<string-name>Au</string-name></person-group></ref>"
        )
        matched = ctx.findall(
            root, './/person-group[@person-group-type="editor"]/string-name'
        )
        assert _texts(matched) == ["Ed"]

    def test_path_existence_predicate(self):
        root, ctx = _ctx("<r><sec><title>T</title></sec><sec/></r>")
        assert len(ctx.findall(root, "sec[title]")) == 1

    def test_positional_predicate(self):
        root, ctx = _ctx("<r><p>1</p><p>2</p><p>3</p></r>")
        assert _texts(ctx.findall(root, "p[2]")) == ["2"]

    def test_path_value_comparison(self):
        root, ctx = _ctx("<r><sec><title>Keep</title></sec><sec><title>No</title></sec></r>")
        assert len(ctx.findall(root, 'sec[title="Keep"]')) == 1

    def test_attr_not_equals(self):
        root, ctx = _ctx('<r><a t="x"/><a t="y"/><a/></r>')
        # XPath: @t != "x" requires the attribute to exist
        assert len(ctx.findall(root, 'a[@t!="x"]')) == 1


class TestIgnoreStyleUnions:
    def test_ignore_union_mixed_relative(self):
        # config: section_paragraph.ignore = .//list|fig|table-wrap
        root, ctx = _ctx(
            "<p>t<list><x/></list><fig/><inner><fig>nested</fig></inner></p>"
        )
        matched = ctx.findall(root, ".//list|fig|table-wrap")
        # .//list is descendant; bare fig is child-only
        assert _tags(matched) == ["list", "fig"]


class TestErrors:
    def test_unbalanced_bracket(self):
        with pytest.raises(XPathSyntaxError):
            parse_xpath("a[@b")

    def test_garbage(self):
        with pytest.raises(XPathSyntaxError):
            parse_xpath("a[$x]")

    def test_trailing_tokens(self):
        with pytest.raises(XPathSyntaxError):
            parse_xpath("a b")


class TestReferenceConfigParses:
    def test_every_xpath_in_shipped_config_parses(self):
        """Every xpath line in the reference's config/xml-mapping.conf must
        parse (the round-1 gap: SyntaxError on or/not predicates)."""
        import os

        conf = "/root/reference/config/xml-mapping.conf"
        if not os.path.exists(conf):
            pytest.skip("reference config not available")
        from sciencebeam_trainer_grobid_tools_spark.operators.targets import (
            parse_xml_mapping_string,
            parse_xpaths,
        )

        with open(conf) as f:
            mapping = parse_xml_mapping_string(f.read())
        skip_suffixes = (
            ".children.concat", ".children.range", ".match-prefix-regex",
            ".alternative-spellings", ".regex", ".extract-regex",
            ".priority", ".max_chunks", ".merge", ".bonding",
            ".match-multiple", ".extend-to-line", ".block",
            ".unmatched-parent-text", ".require-next", ".use-raw-text",
        )
        checked = 0
        for section in mapping.values():
            for key, value in section.items():
                if any(key.endswith(s) for s in skip_suffixes):
                    continue
                for xpath in parse_xpaths(value) or []:
                    parse_xpath(xpath)
                    checked += 1
        assert checked > 40


class TestEtFastPathParity:
    """The ET fast path must return exactly what the generic evaluator
    returns — same nodes, same order — for every xpath it claims."""

    DOC = (
        "<article><front><journal-meta>"
        '<issn pub-id-type="ppub">P1</issn><issn pub-id-type="epub">E1</issn>'
        "</journal-meta><article-meta><title-group><article-title>T"
        "</article-title></title-group><contrib-group>"
        '<contrib contrib-type="author"><name><surname>S1</surname></name></contrib>'
        "<contrib><name><surname>S2</surname></name></contrib>"
        "<aff><label>1</label><institution>I1</institution></aff>"
        "</contrib-group><kwd-group><kwd>k1</kwd><kwd>k2</kwd></kwd-group>"
        "</article-meta></front><body><sec><p>p1</p><p>p2</p></sec></body>"
        "<back><ref-list><ref><label>L</label><mixed-citation>"
        "<article-title>RT</article-title><year>2001</year></mixed-citation>"
        "</ref></ref-list></back></article>"
    )

    XPATHS = [
        "front/article-meta/title-group/article-title",
        ".//article-title",
        "./label",
        ".//*",
        "kwd",
        ".//year",
        'front/journal-meta/issn[@pub-id-type="epub"]',
        "front/article-meta/kwd-group/kwd[2]",
        "back/ref-list/ref",
        ".//contrib[@contrib-type]",
        "front//surname",
        "*",
    ]

    def test_fast_path_matches_evaluator(self):
        import xml.etree.ElementTree as ET

        from sciencebeam_trainer_grobid_tools_spark.operators.xpath import (
            XPathContext,
            _is_et_fast_path,
        )

        root = ET.fromstring(self.DOC)
        ctx = XPathContext(root)
        claimed = 0
        for xpath in self.XPATHS:
            for node in [root] + root.findall(".//*"):
                expected = [
                    n
                    for n in ctx._eval_union(
                        __import__(
                            "sciencebeam_trainer_grobid_tools_spark.operators.xpath",
                            fromlist=["parse_xpath"],
                        ).parse_xpath(xpath),
                        (node,),
                    )
                ]
                actual = ctx.findall(node, xpath)
                assert actual == expected, (xpath, node.tag)
            if _is_et_fast_path(xpath):
                claimed += 1
        # the point of the fast path: it must cover the common forms
        assert claimed >= 10


class TestEtFastUnionParity:
    def test_union_fast_path_matches_evaluator(self):
        import xml.etree.ElementTree as ET

        from sciencebeam_trainer_grobid_tools_spark.operators.xpath import (
            XPathContext,
            _et_fast_union_fragments,
            parse_xpath,
        )

        doc = (
            "<article><front><kwd-group><kwd>k1</kwd><label>L</label>"
            "<kwd>k2</kwd></kwd-group></front><back><ref><label>L2</label>"
            "<caption>C</caption></ref></back></article>"
        )
        root = ET.fromstring(doc)
        ctx = XPathContext(root)
        cases = [
            ".//label | .//caption",
            ".//kwd | .//label",
            './/kwd[@a="x|y"] | .//label',  # '|' inside quotes is NOT a split
            "front/kwd-group/kwd | .//caption",
        ]
        for xpath in cases:
            assert _et_fast_union_fragments(xpath) is not None
            for node in [root] + root.findall(".//*"):
                expected = list(ctx._eval_union(parse_xpath(xpath), (node,)))
                assert ctx.findall(node, xpath) == expected, (xpath, node.tag)

    def test_union_with_complex_branch_uses_evaluator(self):
        from sciencebeam_trainer_grobid_tools_spark.operators.xpath import (
            _et_fast_union_fragments,
        )

        assert _et_fast_union_fragments(".//label | .//p[not(ancestor::ack)]") is None
