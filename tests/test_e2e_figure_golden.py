"""Figure-flavor golden end-to-end cases (style of
tests/auto_annotate_figure_test.py:69-188): figure fields with
label/caption sub-annotations, including the broken-XML tolerance case."""

import textwrap
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
from sciencebeam_trainer_grobid_tools_spark.operators.tei_render import render_tagged_lines

# figure entries of the reference's config/xml-mapping.conf:133-139
FIGURE_XML_MAPPING = textwrap.dedent(
    """
    [article]
    figure = //fig
    figure.priority = 1
    figure.block = figures
    figure.children = ./label | ./caption
    figure.children.concat = [[{"xpath": "./label"}, {"value": " "}, {"xpath": "./caption"}]]
    figure.sub.figure-label = ./label
    figure.sub.figure-caption = ./caption
    """
)

# auto_annotate_figure.py:52-57
FIGURE_TAG_TO_TEI_PATH_MAPPING = {
    "DEFAULT": 'note[@type="other"]',
    "figure": "figure",
    "figure-label": "figure/head/label",
    "figure-caption": "figure/figDesc",
}


def run_figure_pipeline(tei_raw: str, target_xml: str) -> ET.Element:
    mapping = parse_xml_mapping_string(FIGURE_XML_MAPPING)
    doc = tokenize_lines(html_to_lines(tei_raw))
    targets = xml_string_to_target_annotations(target_xml, mapping)
    SimpleMatcher(
        targets,
        MatcherConfig(
            use_sub_annotations=True, tag_config_map=get_tag_config_map(mapping)
        ),
    ).annotate(doc)
    container = ET.Element("text")
    render_tagged_lines(container, doc, FIGURE_TAG_TO_TEI_PATH_MAPPING)
    return container


def fig_target(*figs: str) -> str:
    return "<article><front/><body>%s</body><back/></article>" % "".join(figs)


def fig(label: str, caption: str) -> str:
    return "<fig><label>%s</label> <caption><p>%s</p></caption></fig>" % (label, caption)


def texts(root: ET.Element, path: str):
    return ["".join(n.itertext()) for n in root.findall(path)]


class TestFigureGoldenEndToEnd:
    # auto_annotate_figure_test.py:69-101
    def test_single_figure_label_and_caption(self):
        tei_raw = "<tei><text><figure>1 text 1</figure></text></tei>"
        out = run_figure_pipeline(tei_raw, fig_target(fig("1", "text 1")))
        assert texts(out, ".//figure//label") == ["1"]
        assert texts(out, ".//figure/figDesc") == ["text 1"]

    # auto_annotate_figure_test.py:103-141
    def test_multiple_figures(self):
        tei_raw = (
            "<tei><text><figure>1 text 1</figure>"
            "<figure>2 text 2</figure></text></tei>"
        )
        out = run_figure_pipeline(
            tei_raw, fig_target(fig("1", "text 1"), fig("2", "text 2"))
        )
        assert texts(out, ".//figure//label") == ["1", "2"]
        assert texts(out, ".//figure/figDesc") == ["text 1", "text 2"]

    # auto_annotate_figure_test.py:143-188 — stray </content> close tags in
    # the raw input are tolerated (the recovery parse drops them)
    def test_tolerates_invalid_closing_content_element(self):
        tei_raw = (
            "<tei><text>"
            "<figure>1 text 1</content></figure>"
            "<figure>2 text 2</content></figure>"
            "</text></tei>"
        )
        out = run_figure_pipeline(
            tei_raw, fig_target(fig("1", "text 1"), fig("2", "text 2"))
        )
        assert texts(out, ".//figure//label") == ["1", "2"]
        assert texts(out, ".//figure/figDesc") == ["text 1", "text 2"]
