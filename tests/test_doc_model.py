"""Doc-model tests ported from tests/annotation/matching_utils_test.py plus
tokenizer round-trip invariants."""

from sciencebeam_trainer_grobid_tools_spark.kernel.doc import (
    RunsText,
    TokenRun,
    join_with_index_ranges,
    tokenize_lines,
    tokenize_text,
)

from tests.conftest import doc_for_token_lines


class TestJoinWithIndexRanges:
    # matching_utils_test.py:18-36
    def test_joins_two_tokens_with_space(self):
        text, ranges = join_with_index_ranges(["token1", "token2"], None, sep=" ")
        assert text == "token1 token2"
        assert ranges == [(0, 6), (7, 13)]

    def test_joins_two_tokens_without_space(self):
        text, ranges = join_with_index_ranges(["token1", "token2"], ["", " "], sep=" ")
        assert text == "token1token2"
        assert ranges == [(0, 6), (6, 12)]


class TestTokenRun:
    # matching_utils_test.py:40-60
    def test_joined_with_space(self):
        doc = doc_for_token_lines([["token1", "token2"]])
        run = TokenRun(doc.lines[0])
        assert str(run) == "token1 token2"

    def test_joined_respects_recorded_whitespace(self):
        doc = doc_for_token_lines([["token1", "token2"]])
        doc.lines[0][0].whitespace = ""
        run = TokenRun(doc.lines[0])
        assert str(run) == "token1token2"

    def test_tokens_between(self):
        doc = doc_for_token_lines([["token1", "token2"]])
        run = TokenRun(doc.lines[0])
        assert [t.text for t in run.tokens_between((0, 3))] == ["token1"]
        assert [t.text for t in run.tokens_between((8, 10))] == ["token2"]
        assert [t.text for t in run.tokens_between((0, 10))] == ["token1", "token2"]

    def test_whitespace_only_range_selects_nothing(self):
        doc = doc_for_token_lines([["token1", "token2"]])
        run = TokenRun(doc.lines[0])
        assert list(run.tokens_between((6, 7))) == []


class TestTokenizer:
    def test_keeps_separators_and_splits_camel_case(self):
        assert tokenize_text("fooBar baz-1") == ["foo", "Bar", " ", "baz", "-", "1"]

    def test_reference_tokenize_text_cases(self):
        """Ported verbatim from the reference's TestTokenizeText
        (tests/structured_document/grobid_training_tei_test.py:71-98)."""
        assert tokenize_text("A") == ["A"]
        assert tokenize_text("A B") == ["A", " ", "B"]
        assert tokenize_text(" A") == [" ", "A"]
        assert tokenize_text("A ") == ["A", " "]
        assert tokenize_text(" ,A, ") == [" ", ",", "A", ",", " "]
        assert tokenize_text(" .A. ") == [" ", ".", "A", ".", " "]
        assert tokenize_text(" <{[(A)]}> ") == list(" <{[(A)]}> ")
        assert tokenize_text("Abc") == ["Abc"]
        assert tokenize_text("abcDEF") == ["abc", "DEF"]

    def test_extracted_text_is_fixpoint(self):
        """Tokenizing the extracted text again reproduces it byte-identically
        (the canonical-form property behind the per-url invariant)."""
        doc = tokenize_lines(["Some  title", "a-b  (c)", "tail  "])
        again = tokenize_lines(doc.extracted_text.split("\n"))
        assert again.extracted_text == doc.extracted_text

    def test_offsets_slice_extracted_text(self):
        doc = tokenize_lines(["Hello there", "second line"])
        for token in doc.iter_tokens():
            assert doc.extracted_text[token.start : token.end] == token.text


class TestRunsText:
    def test_runs_joined_with_newline_and_token_mapping(self):
        doc = doc_for_token_lines([["a", "b"], ["c"]])
        runs = [TokenRun(line) for line in doc.lines]
        text = RunsText(runs)
        assert str(text) == "a b\nc"
        assert [t.text for t in text.iter_tokens_between((0, 5))] == ["a", "b", "c"]
        assert [t.text for t in text.iter_tokens_between((4, 5))] == ["c"]
