"""Line-number annotator tests (semantics of
tests/annotation/line_number_annotator_test.py)."""

from sciencebeam_trainer_grobid_tools_spark.operators.line_numbers import (
    annotate_line_numbers,
)

from tests.conftest import doc_for_token_lines


def numbered_lines(n, start=1, suffix=None):
    return [
        [str(start + i) + (suffix or ""), "some", "text", "line%d" % i]
        for i in range(n)
    ]


def line_no_flags(doc):
    return [[t.tag == "line_no" for t in line] for line in doc.lines]


class TestLineNumbers:
    def test_empty_document(self):
        annotate_line_numbers(doc_for_token_lines([]))

    def test_sequential_numbers_tagged(self):
        doc = doc_for_token_lines(numbered_lines(12))
        annotate_line_numbers(doc)
        flags = line_no_flags(doc)
        assert all(line[0] for line in flags)
        assert not any(any(line[1:]) for line in flags)

    def test_does_not_tag_general_tokens(self):
        doc = doc_for_token_lines([["word", "more", "text"]] * 12)
        annotate_line_numbers(doc)
        assert not any(any(line) for line in line_no_flags(doc))

    def test_does_not_tag_numbers_with_suffix(self):
        doc = doc_for_token_lines(
            [["%d)" % (i + 1), "some", "text"] for i in range(12)]
        )
        annotate_line_numbers(doc)
        assert not any(any(line) for line in line_no_flags(doc))

    def test_does_not_tag_individual_numbers(self):
        lines = [["word", "text"]] * 12 + [["5", "lonely", "number"]]
        doc = doc_for_token_lines(lines)
        annotate_line_numbers(doc)
        assert not any(any(line) for line in line_no_flags(doc))

    def test_does_not_tag_sparse_numbers_below_ratio(self):
        # 12 numbered lines among 150 total -> ratio < 0.1
        lines = numbered_lines(12) + [["word", "text"]] * 140
        doc = doc_for_token_lines(lines)
        annotate_line_numbers(doc)
        assert not any(any(line) for line in line_no_flags(doc))

    def test_out_of_sequence_number_not_tagged(self):
        lines = numbered_lines(12) + [["3", "back", "reference"]]
        doc = doc_for_token_lines(lines)
        annotate_line_numbers(doc)
        flags = line_no_flags(doc)
        assert all(line[0] for line in flags[:12])
        assert not flags[12][0]

    def test_longest_sequence_wins(self):
        # a short broken run followed by a long clean run
        lines = [["100", "intro", "text"], ["5", "other", "text"]] + numbered_lines(12)
        doc = doc_for_token_lines(lines)
        annotate_line_numbers(doc)
        flags = line_no_flags(doc)
        assert not flags[0][0]
        assert not flags[1][0]
        assert all(line[0] for line in flags[2:])
