"""jusText-shaped DOM block classification (operators/domblocks.py):
pure-python parser/classifier units with hand-computed densities, the
context-sensitive pass, and the Spark operators' plan shape."""

import pytest
from pyspark.sql import functions as F

from sciencebeam_trainer_grobid_tools_spark.operators import domblocks
from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session


@pytest.fixture(scope="module")
def spark():
    session = build_session("domblock-tests", cpus=4, shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


PROSE = (
    "This is a long paragraph of ordinary running prose that talks about "
    "the subject of the page at a comfortable length, and it keeps going "
    "until it is clearly over the two hundred character threshold that the "
    "classifier uses for confident good blocks in a page."
)

PAGE = (
    "<html><head><title>T</title></head><body>"
    "<nav><a href='/'>Home</a> <a href='/x'>More</a></nav>"
    "<div><a href='/1'>Link one</a> <a href='/2'>Link two</a> "
    "<a href='/3'>Link three</a></div>"
    "<p>%s</p>"
    "<p>Short caption here</p>"
    "<p>%s</p>"
    "<p><a href='/share'>Share this article with all of your friends</a></p>"
    "</body></html>" % (PROSE, PROSE)
)


class TestHtmlToBlocks:
    def test_blocks_and_link_attribution(self):
        blocks = domblocks.html_to_blocks(PAGE)
        texts = [b[0] for b in blocks]
        # nav subtree is tag-skipped entirely
        assert not any("Home" in t for t in texts)
        link_div = next(b for b in blocks if "Link one" in b[0])
        # every character of the link farm came from <a> spans
        assert link_div[1] >= link_div[0].count("Link") * 8
        prose = next(b for b in blocks if b[0] == PROSE)
        assert prose[1] == 0

    def test_malformed_html_falls_back(self):
        blocks = domblocks.html_to_blocks(b"no tags at all, just text")
        assert blocks and blocks[0][0].startswith("no tags")

    def test_bytes_input_decoded(self):
        blocks = domblocks.html_to_blocks(PAGE.encode())
        assert any(b[0] == PROSE for b in blocks)


class TestClassifyBlocks:
    def test_context_free_classes(self):
        rows = domblocks.classify_blocks(
            [
                (PROSE, 0, "p"),                       # long + stopwordy
                ("All of the links here", 22, "div"),  # link_density 1.0
                ("Short caption here", 0, "p"),        # short, no links
                ("zx qv wq jk pl mn xy zz ab cd ef gh ij kl mn op qr st"
                 " uv wx yz aa bb cc dd ee ff gg hh", 0, "p"),  # no stopwords
            ]
        )
        assert rows[0]["cls_free"] == "good"
        assert rows[1]["cls_free"] == "bad"
        assert rows[2]["cls_free"] == "short"
        assert rows[3]["cls_free"] == "bad"

    def test_hand_computed_densities(self):
        text = "the cat sat on the mat"
        rows = domblocks.classify_blocks([(text, 11, "p")])
        assert rows[0]["link_density"] == round(11 / len(text), 6)
        # stopwords among [the, cat, sat, on, the, mat]: the, on, the -> 3/6
        assert rows[0]["stopword_density"] == 0.5

    def test_context_pass_good_neighbors_promote(self):
        rows = domblocks.classify_blocks(
            [(PROSE, 0, "p"), ("Short caption here", 0, "p"), (PROSE, 0, "p")]
        )
        assert [r["cls"] for r in rows] == ["good", "good", "good"]

    def test_context_pass_bad_neighbors_demote(self):
        rows = domblocks.classify_blocks(
            [
                ("x " * 40, 70, "div"),
                ("Short caption here", 0, "p"),
                ("y " * 40, 70, "div"),
            ]
        )
        assert [r["cls"] for r in rows] == ["bad", "bad", "bad"]

    def test_context_pass_mixed_neighborhood(self):
        # short between good and bad -> bad; near_good between them -> good
        near_good = (
            "the cat and the dog sat by the door of the house with a friend "
            "and the bird was up on the roof"
        )  # stopwordy, over length_low but under length_high
        rows = domblocks.classify_blocks(
            [
                (PROSE, 0, "p"),
                ("Short caption here", 0, "p"),
                (near_good, 0, "p"),
                ("z " * 40, 60, "div"),
            ]
        )
        assert rows[1]["cls"] == "bad"   # short, mixed
        assert rows[2]["cls"] == "good"  # near_good, mixed
        # page edges count as bad: a leading short block next to good stays bad
        rows2 = domblocks.classify_blocks(
            [("Short caption here", 0, "p"), (PROSE, 0, "p")]
        )
        assert rows2[0]["cls"] == "bad"


class TestSparkOperators:
    @pytest.fixture(scope="class")
    def pages(self, spark):
        return spark.createDataFrame(
            [(1, PAGE.encode()), (2, b"<html><body></body></html>"), (3, None)],
            "doc_id long, html binary",
        )

    def test_block_features_match_python_reference(self, spark, pages):
        got = (
            domblocks.dom_block_features(pages)
            .filter(F.col("doc_id") == 1)
            .orderBy("block_idx")
            .collect()
        )
        want = domblocks.classify_blocks(domblocks.html_to_blocks(PAGE))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g["text"] == w["text"]
            assert g["cls"] == w["cls"]
            assert g["link_density"] == w["link_density"]

    def test_extract_main_text(self, spark, pages):
        got = {r["doc_id"]: r for r in domblocks.extract_main_text(pages).collect()}
        assert got[1]["main_text"].count(PROSE) == 2
        assert "Share this" not in got[1]["main_text"]
        assert "Link one" not in got[1]["main_text"]
        # short caption between the two good paragraphs is promoted
        assert "Short caption here" in got[1]["main_text"]
        # empty page: empty string, never a lost row
        assert got[2]["main_text"] == "" and got[2]["n_blocks"] == 0
        # null html row is skipped (no parse to report)
        assert 3 not in got

    def test_no_shuffle_single_arrow_stage(self, spark, pages):
        plan = (
            domblocks.extract_main_text(pages)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert plan.count("MapInPandas") == 1

    def test_id_type_derived_from_schema(self, spark):
        df = spark.createDataFrame(
            [("u1", PAGE.encode())], "page_id string, html binary"
        )
        got = domblocks.dom_block_features(df, id_col="page_id")
        assert dict(got.dtypes)["page_id"] == "string"
        assert got.count() > 0
