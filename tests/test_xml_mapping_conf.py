"""Ported reference test cases running the SHIPPED mapping config.

Sources:
- reference tests/config/xml_mapping_conf_test.py (all 5 cases)
- reference tests/annotation/target_annotation_test.py (contains_raw_text,
  get_raw_text_content, ignore + core extraction cases)

These exercise exactly the path that failed in round 1: evaluating
``config/xml-mapping.conf``'s or/not/ancestor predicates over real JATS
shapes.
"""

import os
import xml.etree.ElementTree as ET

import pytest

from sciencebeam_trainer_grobid_tools_spark.operators.targets import (
    contains_raw_text,
    get_raw_text_content,
    parse_xml_mapping_string,
    xml_root_to_target_annotations,
)

REFERENCE_CONF = "/root/reference/config/xml-mapping.conf"


def E(tag, *children, **attrib):
    """lxml.builder.E-style element construction over stdlib ET."""
    node = ET.Element(tag, {k.replace("_", "-"): v for k, v in attrib.items()})
    last_child = None
    for child in children:
        if isinstance(child, dict):
            node.attrib.update(child)
        elif isinstance(child, str):
            if last_child is None:
                node.text = (node.text or "") + child
            else:
                last_child.tail = (last_child.tail or "") + child
        else:
            node.append(child)
            last_child = child
    return node


def get_target_xml_node(
    title=None,
    author_nodes=None,
    article_meta_nodes=None,
    body_nodes=None,
    back_nodes=None,
    reference_nodes=None,
):
    """Mirror of reference tests/auto_annotate_test_utils.py:100-125."""
    contrib_group = E("contrib-group")
    article_meta = E("article-meta", contrib_group)
    front = E("front", article_meta)
    body = E("body")
    back = E("back")
    if title:
        article_meta.append(E("title-group", E("article-title", title)))
    for node in author_nodes or []:
        contrib_group.append(node)
    for node in article_meta_nodes or []:
        article_meta.append(node)
    for node in body_nodes or []:
        body.append(node)
    for node in back_nodes or []:
        back.append(node)
    if reference_nodes:
        back.append(E("ref-list", *reference_nodes))
    return E("article", front, body, back)


@pytest.fixture(name="xml_mapping", scope="module")
def _xml_mapping():
    if not os.path.exists(REFERENCE_CONF):
        pytest.skip("reference config not available")
    with open(REFERENCE_CONF) as f:
        return parse_xml_mapping_string(f.read())


def names_and_values(target_annotations):
    return [(t.name, t.value) for t in target_annotations]


class TestAnnotXmlFrontConf:
    """reference tests/config/xml_mapping_conf_test.py:28-152."""

    def test_should_extract_author_names(self, xml_mapping):
        xml_root = get_target_xml_node(
            author_nodes=[
                E("contrib", E("name", E("surname", "Maison"), E("given-names", "Mary"))),
                E("contrib", E("name", E("surname", "Smith"), E("given-names", "John"))),
            ]
        )
        assert names_and_values(
            xml_root_to_target_annotations(xml_root, xml_mapping)
        ) == [
            ("author", ["Maison", "Mary"]),
            ("author", ["Smith", "John"]),
        ]

    def test_should_extract_author_aff_within_author_aff(self, xml_mapping):
        xml_root = get_target_xml_node(
            author_nodes=[
                E(
                    "contrib",
                    E("name", E("surname", "Smith"), E("given-names", "John")),
                    E(
                        "aff",
                        E("institution", "University of Science"),
                        E("country", "Smithonia"),
                    ),
                )
            ]
        )
        assert names_and_values(
            xml_root_to_target_annotations(xml_root, xml_mapping)
        ) == [
            ("author", ["Smith", "John"]),
            ("author_aff", ["University of Science", "Smithonia"]),
        ]

    def test_should_extract_raw_author_aff_if_containing_raw_text(self, xml_mapping):
        xml_root = get_target_xml_node(
            author_nodes=[
                E(
                    "contrib",
                    E("name", E("surname", "Smith"), E("given-names", "John")),
                    E(
                        "aff",
                        E("label", "1"),
                        E("institution", "University of Science"),
                        ", Smithonia",
                    ),
                )
            ]
        )
        assert names_and_values(
            xml_root_to_target_annotations(xml_root, xml_mapping)
        ) == [
            ("author", ["Smith", "John"]),
            ("author_aff", "1 University of Science, Smithonia"),
        ]

    def test_should_extract_author_aff_address_line(self, xml_mapping):
        xml_root = get_target_xml_node(
            author_nodes=[
                E(
                    "contrib",
                    E("name", E("surname", "Smith"), E("given-names", "John")),
                    E(
                        "aff",
                        E("institution", "University of Science"),
                        E("country", "Smithonia"),
                        E("addr-line", E("named-content", "East St")),
                    ),
                )
            ]
        )
        assert names_and_values(
            xml_root_to_target_annotations(xml_root, xml_mapping)
        ) == [
            ("author", ["Smith", "John"]),
            ("author_aff", ["University of Science", "Smithonia", "East St"]),
        ]

    def test_should_extract_author_aff_email(self, xml_mapping):
        xml_root = get_target_xml_node(
            author_nodes=[
                E(
                    "contrib",
                    E("name", E("surname", "Smith"), E("given-names", "John")),
                    E(
                        "aff",
                        E("institution", "University of Science"),
                        E("email", "john@smiths.test"),
                    ),
                )
            ]
        )
        assert names_and_values(
            xml_root_to_target_annotations(xml_root, xml_mapping)
        ) == [
            ("author", ["Smith", "John"]),
            ("author_aff", ["University of Science", "john@smiths.test"]),
            ("email", "john@smiths.test"),
        ]


class TestShippedConfPredicates:
    """Additional shipped-config predicate coverage (the round-1 failures)."""

    def test_contrib_type_filter(self, xml_mapping):
        xml_root = get_target_xml_node(
            author_nodes=[
                E(
                    "contrib",
                    {"contrib-type": "editor"},
                    E("name", E("surname", "Nope"), E("given-names", "Ed")),
                ),
                E(
                    "contrib",
                    {"contrib-type": "author"},
                    E("name", E("surname", "Yes"), E("given-names", "Au")),
                ),
            ]
        )
        annotations = xml_root_to_target_annotations(xml_root, xml_mapping)
        authors = [t.value for t in annotations if t.name == "author"]
        assert authors == [["Nope", "Ed"][0:0] or ["Yes", "Au"]]

    def test_keyword_group_type_filter(self, xml_mapping):
        xml_root = get_target_xml_node(
            article_meta_nodes=[
                E(
                    "kwd-group",
                    E("kwd", "plain"),
                    E("kwd", {"kwd-group-type": "author-keywords"}, "authored"),
                    E("kwd", {"kwd-group-type": "other"}, "excluded"),
                )
            ]
        )
        annotations = xml_root_to_target_annotations(xml_root, xml_mapping)
        keywords = [t.value for t in annotations if t.name == "keywords"]
        assert keywords == ["plain authored"]

    def test_back_sections_exclude_ack(self, xml_mapping):
        xml_root = get_target_xml_node(
            back_nodes=[
                E("ack", E("title", "Thanks"), E("p", "ack para")),
                E("sec", E("title", "Data"), E("p", "data para")),
            ]
        )
        annotations = xml_root_to_target_annotations(xml_root, xml_mapping)
        by_name = {}
        for t in annotations:
            by_name.setdefault(t.name, []).append(t.value)
        assert by_name["back_section_title"] == ["Data"]
        assert by_name["back_section_paragraph"] == ["data para"]
        assert by_name["acknowledgment_section_title"] == ["Thanks"]
        assert by_name["acknowledgment_section_paragraph"] == ["ack para"]

    def test_page_range_standalone_values(self, xml_mapping):
        xml_root = get_target_xml_node(
            article_meta_nodes=[E("fpage", "10"), E("lpage", "12")]
        )
        annotations = xml_root_to_target_annotations(xml_root, xml_mapping)
        pages = [t.value for t in annotations if t.name == "page_no"]
        assert pages == ["10", "11", "12"]

    def test_reference_editor_vs_author_string_names(self, xml_mapping):
        xml_root = get_target_xml_node(
            reference_nodes=[
                E(
                    "ref",
                    E(
                        "mixed-citation",
                        E("string-name", "Author A"),
                        E(
                            "person-group",
                            {"person-group-type": "editor"},
                            E("string-name", "Editor E"),
                        ),
                        E("article-title", "The Ref Title"),
                    ),
                )
            ]
        )
        annotations = xml_root_to_target_annotations(xml_root, xml_mapping)
        refs = [t for t in annotations if t.name == "reference"]
        assert len(refs) == 1
        subs = {}
        for sub in refs[0].sub_annotations:
            subs.setdefault(sub.name, []).append(sub.value)
        assert subs["reference-author"] == ["Author A"]
        assert subs["reference-editor"] == ["Editor E"]


class TestContainsRawTextContent:
    """reference tests/annotation/target_annotation_test.py:11-22."""

    def test_should_return_true_if_element_contains_text(self):
        assert contains_raw_text(E("node", "raw text 1"))

    def test_should_return_false_if_element_contains_child_element_with_text(self):
        assert not contains_raw_text(E("node", E("child", "raw text 1")))

    def test_should_return_true_if_child_element_is_followed_by_text(self):
        assert contains_raw_text(E("node", E("child", "child"), "tail text"))

    def test_should_return_true_if_nested_child_followed_by_text(self):
        assert contains_raw_text(
            E("node", E("child", E("innerChild", "child"), "tail text"))
        )


class TestGetRawTextContent:
    """reference tests/annotation/target_annotation_test.py:25-39."""

    def test_should_return_raw_text(self):
        assert get_raw_text_content(E("node", "raw text 1")) == "raw text 1"

    def test_should_add_space_after_element_if_followed_by_word(self):
        assert (
            get_raw_text_content(E("node", E("label", "1"), "raw text 1"))
            == "1 raw text 1"
        )

    def test_should_not_add_space_after_element_if_followed_by_comma(self):
        assert (
            get_raw_text_content(E("node", E("label", "1"), ", raw text 1"))
            == "1, raw text 1"
        )


class TestXmlRootToTargetAnnotationsCore:
    """reference tests/annotation/target_annotation_test.py:42-92."""

    def test_should_select_mapping_based_on_root(self):
        annotations = xml_root_to_target_annotations(
            E("root2", E("item1", "text 1"), E("item2", "text 2")),
            {"root1": {"item": "//item1"}, "root2": {"item": "//item2"}},
        )
        assert [t.value for t in annotations] == ["text 2"]

    def test_should_extract_simple_text(self):
        annotations = xml_root_to_target_annotations(
            E("root", E("item", "text 1")), {"root": {"item": "//item"}}
        )
        assert [t.value for t in annotations] == ["text 1"]

    def test_should_extract_text_including_children(self):
        annotations = xml_root_to_target_annotations(
            E("root", E("item", "text 1 ", E("child", "child text"))),
            {"root": {"item": "//item"}},
        )
        assert [t.value for t in annotations] == ["text 1 child text"]

    def test_should_ignore_selected_children(self):
        annotations = xml_root_to_target_annotations(
            E("root", E("item", "text 1 ", E("other", "other text "), E("child", "child text"))),
            {"root": {"item": "//item", "item.ignore": ".//other"}},
        )
        assert [t.value for t in annotations] == ["text 1 child text"]

    def test_should_ignore_selected_nested_children(self):
        annotations = xml_root_to_target_annotations(
            E(
                "root",
                E("item", E("p", "text 1 ", E("other", "other text "), E("child", "child text"))),
            ),
            {"root": {"item": "//item", "item.ignore": ".//other"}},
        )
        assert [t.value for t in annotations] == ["text 1 child text"]
