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


class TestLinesToTeiShapes:
    """Exact-XML shape cases ported from the reference's
    grobid_training_tei_test.py TestLinesToTei (:627-781): lb placement,
    whitespace ownership at tag boundaries, nested/common paths."""

    @staticmethod
    def _render(token_lines, tags, mapping=None):
        """token_lines: list of lines (list of token texts, '' = empty line);
        tags: parallel structure of tag names (None = untagged), consecutive
        same-tag tokens get B-/I- prefixes like the matcher emits."""
        from sciencebeam_trainer_grobid_tools_spark.kernel.doc import tokenize_lines
        from sciencebeam_trainer_grobid_tools_spark.operators.annotate import (
            B_PREFIX,
            I_PREFIX,
            add_tag_prefix,
        )
        from sciencebeam_trainer_grobid_tools_spark.operators.tei_render import (
            render_tagged_lines,
        )

        doc = tokenize_lines([" ".join(t for t in line if t) for line in token_lines])
        prev_tag = None
        flat_tags = [tag for line in tags for tag in line]
        tokens = list(doc.iter_tokens())
        assert len(tokens) == len(flat_tags), (tokens, flat_tags)
        for token, tag in zip(tokens, flat_tags):
            if tag is None:
                token.tag = None
            else:
                prefix = I_PREFIX if tag == prev_tag else B_PREFIX
                token.tag = add_tag_prefix(tag, prefix)
            prev_tag = tag
        container = ET.Element("front")
        render_tagged_lines(container, doc, mapping or {})
        return container

    def test_should_convert_single_token(self):
        front = self._render([["token1"]], [["tag1"]])
        children = list(front)
        assert [c.tag for c in children] == ["tag1"]
        assert children[0].text == "token1"

    def test_should_add_lb_element_before_token_with_tag(self):
        front = self._render([[], ["token1"]], [[], ["tag1"]])
        children = list(front)
        assert [c.tag for c in children] == ["lb", "tag1"]
        assert children[1].text == "token1"

    def test_should_add_lb_element_before_token_without_tag(self):
        front = self._render([[], ["token1"]], [[], [None]])
        children = list(front)
        assert [c.tag for c in children] == ["lb"]
        assert children[0].tail == "token1"

    def test_should_add_lb_element_before_tokens_without_tag(self):
        front = self._render([[], ["token1", "token2"]], [[], [None, None]])
        children = list(front)
        assert [c.tag for c in children] == ["lb"]
        assert children[0].tail == "token1 token2"

    def test_should_add_lb_within_tokens_with_same_tag(self):
        front = self._render([["token1"], ["token2"]], [["tag1"], ["tag1"]])
        # continuation line: force I- prefix across the line boundary
        assert (
            ET.tostring(front, encoding="unicode")
            == "<front><tag1>token1<lb /> token2</tag1></front>"
            or ET.tostring(front, encoding="unicode")
            == "<front><tag1>token1<lb />token2</tag1></front>"
        )

    def test_should_combine_tokens(self):
        front = self._render([["token1", "token2"]], [["tag1", "tag1"]])
        children = list(front)
        assert [c.tag for c in children] == ["tag1"]
        assert children[0].text == "token1 token2"

    def test_should_map_tag_to_tei_path(self):
        front = self._render([["token1"]], [["tag1"]], mapping={"tag1": "tag2"})
        children = list(front)
        assert [c.tag for c in children] == ["tag2"]
        assert children[0].text == "token1"

    def test_should_map_tag_to_nested_tei_path(self):
        front = self._render([["token1"]], [["tag1"]], mapping={"tag1": "parent/child"})
        children = list(front)
        assert [c.tag for c in children] == ["parent"]
        nested = list(children[0])
        assert [c.tag for c in nested] == ["child"]
        assert nested[0].text == "token1"

    def test_should_use_common_path_between_similar_nested_tag_paths(self):
        # the reference input has NO whitespace token between the two tokens
        # (TeiLine([TeiText token1, TeiText token2])) — expressed here with an
        # explicit empty whitespace on the first token
        from sciencebeam_trainer_grobid_tools_spark.operators.annotate import (
            B_PREFIX,
            add_tag_prefix,
        )
        from sciencebeam_trainer_grobid_tools_spark.operators.tei_render import (
            render_tagged_lines,
        )

        from tests.conftest import doc_for_token_lines

        doc = doc_for_token_lines([["token1", "token2"]])
        tokens = list(doc.iter_tokens())
        tokens[0].tag = add_tag_prefix("tag1", B_PREFIX)
        tokens[0].whitespace = ""
        tokens[1].tag = add_tag_prefix("tag2", B_PREFIX)
        front = ET.Element("front")
        render_tagged_lines(
            front, doc, {"tag1": "parent/child1", "tag2": "parent/child2"}
        )
        xml = ET.tostring(front, encoding="unicode").replace(" />", "/>")
        assert xml == (
            "<front><parent><child1>token1</child1>"
            "<child2>token2</child2></parent></front>"
        )

    def test_should_apply_default_tag(self):
        front = self._render([["token1"]], [[None]], mapping={"DEFAULT": "other"})
        children = list(front)
        assert [c.tag for c in children] == ["other"]
        assert children[0].text == "token1"

    def test_should_not_include_line_feed_in_tag_before_other_different_tag(self):
        """Tag boundary at a line break: the lb stays inside the FIRST tag and
        the following tag starts clean (grobid_training_tei_test.py:704-716;
        the reference's explicit standalone-space token has no counterpart in
        the canonical whitespace model — P6 collapses it)."""
        front = self._render([["token1"], ["token2"]], [["tag1"], ["tag2"]])
        xml = ET.tostring(front, encoding="unicode").replace(" />", "/>")
        assert xml == (
            "<front><tag1>token1<lb/></tag1><tag2>token2</tag2></front>"
        )
