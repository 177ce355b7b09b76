"""Ported cases for the source-file ingest job (reference
tests/download_source_files_test.py): output-filename patterns, pair
existence filtering, and the distributed copy end-to-end."""

import pytest

from sciencebeam_trainer_grobid_tools_spark.plans.ingest import (
    download_source_file_pairs,
    get_relative_output_file_list,
    load_file_list,
)


class TestGetRelativeOutputFileList:
    def test_should_return_empty_list_if_source_file_list_is_empty(self):
        assert get_relative_output_file_list([], output_filename_pattern="") == []

    def test_should_use_source_filename(self):
        assert get_relative_output_file_list(
            ["file1.pdf"], output_filename_pattern="{filename}"
        ) == ["file1.pdf"]

    def test_should_use_name(self):
        assert get_relative_output_file_list(
            ["file1.pdf"], output_filename_pattern="{name}-suffix{ext}"
        ) == ["file1-suffix.pdf"]

    def test_should_strip_gz_from_name_and_ext(self):
        assert get_relative_output_file_list(
            ["file1.pdf.gz"], output_filename_pattern="{name}-suffix{ext}"
        ) == ["file1-suffix.pdf"]

    def test_should_preserve_sub_directory(self):
        assert get_relative_output_file_list(
            ["sub/file1.pdf"], output_filename_pattern="{dir}{name}{ext}"
        ) == ["sub/file1.pdf"]

    def test_should_use_index(self):
        assert get_relative_output_file_list(
            ["file1.pdf", "file2.pdf"], output_filename_pattern="{index}{ext}"
        ) == ["0.pdf", "1.pdf"]

    def test_should_use_other_file_list_name(self):
        # cross-list pattern: name the target xml after the document
        assert get_relative_output_file_list(
            ["file1.xml"],
            output_filename_pattern="{document.name}{ext}",
            file_lists={"document": ["doc1.pdf"]},
        ) == ["doc1.xml"]


class TestLoadFileList:
    def test_should_load_lst_lines(self, tmp_path):
        path = tmp_path / "files.lst"
        path.write_text("a.pdf\nb.pdf\n")
        assert load_file_list(str(path), column="ignored") == ["a.pdf", "b.pdf"]

    def test_should_load_tsv_column(self, tmp_path):
        path = tmp_path / "files.tsv"
        path.write_text("source_url\textra\na.pdf\tx\nb.pdf\ty\n")
        assert load_file_list(str(path), column="source_url") == ["a.pdf", "b.pdf"]

    def test_should_apply_limit(self, tmp_path):
        path = tmp_path / "files.lst"
        path.write_text("a.pdf\nb.pdf\nc.pdf\n")
        assert load_file_list(str(path), column="x", limit=2) == ["a.pdf", "b.pdf"]

    def test_should_reject_missing_column(self, tmp_path):
        path = tmp_path / "files.tsv"
        path.write_text("other\na.pdf\n")
        with pytest.raises(ValueError):
            load_file_list(str(path), column="source_url")


@pytest.fixture(scope="module")
def spark():
    from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session

    session = build_session("ingest-tests", cpus=4, shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


def setup_source(tmp_path, pairs, missing_docs=()):
    src = tmp_path / "source"
    (src / "docs").mkdir(parents=True)
    (src / "xmls").mkdir(parents=True)
    doc_list, tgt_list = [], []
    for stem in pairs:
        doc = src / "docs" / ("%s.pdf" % stem)
        tgt = src / "xmls" / ("%s.xml" % stem)
        if stem not in missing_docs:
            doc.write_bytes(b"%PDF " + stem.encode())
        tgt.write_text("<article>%s</article>" % stem)
        doc_list.append(str(doc))
        tgt_list.append(str(tgt))
    (src / "document-file-list.lst").write_text("\n".join(doc_list))
    (src / "target-file-list.lst").write_text("\n".join(tgt_list))
    return src


class TestDownloadSourceFilePairs:
    def test_should_copy_existing_pairs(self, spark, tmp_path):
        src = setup_source(tmp_path, ["doc1", "doc2"])
        counters = download_source_file_pairs(
            spark,
            document_file_list=str(src / "document-file-list.lst"),
            target_file_list=str(src / "target-file-list.lst"),
            document_output_path=str(tmp_path / "out" / "document"),
            target_output_path=str(tmp_path / "out" / "target"),
            document_output_filename_pattern="{filename}",
            target_output_filename_pattern="{filename}",
        )
        assert counters == {"copied": 2, "skipped": 0}
        assert (tmp_path / "out" / "document" / "doc1.pdf").read_bytes() == b"%PDF doc1"
        assert (tmp_path / "out" / "target" / "doc2.xml").exists()

    def test_should_skip_pairs_with_missing_document(self, spark, tmp_path):
        src = setup_source(tmp_path, ["doc1", "doc2"], missing_docs=["doc2"])
        counters = download_source_file_pairs(
            spark,
            document_file_list=str(src / "document-file-list.lst"),
            target_file_list=str(src / "target-file-list.lst"),
            document_output_path=str(tmp_path / "out" / "document"),
            target_output_path=str(tmp_path / "out" / "target"),
            document_output_filename_pattern="{filename}",
            target_output_filename_pattern="{filename}",
        )
        assert counters == {"copied": 1, "skipped": 1}
        assert not (tmp_path / "out" / "document" / "doc2.pdf").exists()
        # the target of a skipped pair is not copied either (reference
        # filter_file_pair_exists drops BOTH sides)
        assert not (tmp_path / "out" / "target" / "doc2.xml").exists()

    def test_should_fail_if_no_pair_exists(self, spark, tmp_path):
        src = setup_source(tmp_path, ["doc1"], missing_docs=["doc1"])
        with pytest.raises(ValueError, match="none of the file pairs exists"):
            download_source_file_pairs(
                spark,
                document_file_list=str(src / "document-file-list.lst"),
                target_file_list=str(src / "target-file-list.lst"),
                document_output_path=str(tmp_path / "out" / "document"),
                target_output_path=str(tmp_path / "out" / "target"),
            )

    def test_should_rename_target_after_document_name(self, spark, tmp_path):
        src = setup_source(tmp_path, ["doc1"])
        download_source_file_pairs(
            spark,
            document_file_list=str(src / "document-file-list.lst"),
            target_file_list=str(src / "target-file-list.lst"),
            document_output_path=str(tmp_path / "out" / "document"),
            target_output_path=str(tmp_path / "out" / "target"),
            document_output_filename_pattern="{filename}",
            target_output_filename_pattern="{document.name}{ext}",
        )
        assert (tmp_path / "out" / "target" / "doc1.xml").exists()

    def test_should_apply_limit(self, spark, tmp_path):
        src = setup_source(tmp_path, ["doc1", "doc2", "doc3"])
        counters = download_source_file_pairs(
            spark,
            document_file_list=str(src / "document-file-list.lst"),
            target_file_list=str(src / "target-file-list.lst"),
            document_output_path=str(tmp_path / "out" / "document"),
            target_output_path=str(tmp_path / "out" / "target"),
            document_output_filename_pattern="{filename}",
            target_output_filename_pattern="{filename}",
            limit=2,
        )
        assert counters == {"copied": 2, "skipped": 0}
        assert not (tmp_path / "out" / "document" / "doc3.pdf").exists()
