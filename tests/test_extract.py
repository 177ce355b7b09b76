"""HTML extractor robustness tests (operators/extract.py)."""

from sciencebeam_trainer_grobid_tools_spark.operators.extract import (
    html_to_lines,
    text_to_lines,
)


class TestHtmlToLines:
    def test_entities_decoded(self):
        assert html_to_lines("<p>a &amp; b &lt;c&gt; &#8224;</p>") == ["a & b <c> †"]

    def test_comments_dropped(self):
        assert html_to_lines("<p>keep<!-- drop this -->me</p>") == ["keepme"]

    def test_nested_boilerplate_subtrees_dropped(self):
        html = (
            "<body><nav>menu<div>sub nav</div></nav>"
            "<p>content</p>"
            "<footer><p>legal</p><script>x</script></footer></body>"
        )
        assert html_to_lines(html) == ["content"]

    def test_inline_elements_do_not_break_lines(self):
        assert html_to_lines("<p>a <b>bold</b> and <i>italic</i> word</p>") == [
            "a bold and italic word"
        ]

    def test_br_and_lb_break_lines(self):
        assert html_to_lines("<p>one<br/>two<lb/>three</p>") == ["one", "two", "three"]

    def test_whitespace_runs_collapse(self):
        assert html_to_lines("<p>a\n\t  b</p>") == ["a b"]

    def test_empty_and_whitespace_only_lines_dropped(self):
        assert html_to_lines("<p>  </p><p>x</p><p></p>") == ["x"]

    def test_bytes_input_decoded(self):
        assert html_to_lines("<p>héllo</p>".encode("utf-8")) == ["héllo"]

    def test_invalid_utf8_replaced_not_fatal(self):
        assert html_to_lines(b"<p>ok\xff</p>")  # must not raise

    def test_empty_document(self):
        assert html_to_lines("") == []
        assert html_to_lines("<html><head></head><body></body></html>") == []


class TestTextToLines:
    def test_preserves_empty_interior_lines(self):
        assert text_to_lines("a\n\nb") == ["a", "", "b"]

    def test_none_and_empty(self):
        assert text_to_lines(None) == []
        assert text_to_lines("") == []
