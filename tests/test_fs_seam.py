"""FS seam (sources/fs.py): scheme dispatch, fake-backend injection, and the
per-task debug-match part files.

The reference routes file I/O through Beam FileSystems (utils/io.py:16-39);
the engine's per-file sinks go through ``get_filesystem`` so an object-store
backend can be registered per URL scheme without touching kernels.
"""

import csv
import os
from contextlib import contextmanager

import pytest

from sciencebeam_trainer_grobid_tools_spark.sources import fs as fs_mod
from sciencebeam_trainer_grobid_tools_spark.sources.fs import (
    LocalFileSystem,
    get_filesystem,
    register_filesystem,
    write_text_file,
)


class FakeFileSystem:
    """Records every call; stores writes in an in-memory dict (no local I/O)."""

    store = {}
    copies = []

    def exists(self, path):
        return path in self.store

    def makedirs(self, path):
        pass

    @contextmanager
    def open_write(self, path, binary=False):
        import io

        buf = io.BytesIO() if binary else io.StringIO()
        yield buf
        self.store[path] = buf.getvalue()

    def copyfile(self, src, dst):
        self.copies.append((src, dst))
        self.store[dst] = "<copied:%s>" % src


@pytest.fixture(scope="module")
def spark():
    from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session

    session = build_session("fs-seam-tests", cpus=4, shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


@pytest.fixture()
def fake_fs():
    FakeFileSystem.store = {}
    FakeFileSystem.copies = []
    register_filesystem("fake", FakeFileSystem)
    yield FakeFileSystem
    fs_mod._REGISTRY.pop("fake", None)


class TestSchemeDispatch:
    def test_local_default(self, tmp_path):
        assert isinstance(get_filesystem(str(tmp_path / "x.txt")), LocalFileSystem)
        assert isinstance(get_filesystem("file://" + str(tmp_path)), LocalFileSystem)

    def test_unknown_scheme_names_registration_hook(self):
        with pytest.raises(ValueError, match="register_filesystem"):
            get_filesystem("gs://bucket/key")

    def test_local_roundtrip(self, tmp_path):
        path = str(tmp_path / "nested" / "dir" / "out.txt")
        write_text_file(path, "hello")
        with open(path, encoding="utf-8") as handle:
            assert handle.read() == "hello"

    def test_file_scheme_strips_to_local(self, tmp_path):
        path = "file://" + str(tmp_path / "a.txt")
        write_text_file(path, "x")
        assert (tmp_path / "a.txt").read_text() == "x"


class TestFakeBackendInjection:
    """No direct open()/shutil in the sink kernels: a registered fake backend
    receives every write/copy when the path carries its scheme."""

    def test_write_text_file_through_fake(self, fake_fs):
        write_text_file("fake://out/doc.tei.xml", "<TEI/>")
        assert fake_fs.store == {"fake://out/doc.tei.xml": "<TEI/>"}

    def test_copyfile_through_fake(self, fake_fs):
        get_filesystem("fake://dst/a.pdf").copyfile("/src/a.pdf", "fake://dst/a.pdf")
        assert fake_fs.copies == [("/src/a.pdf", "fake://dst/a.pdf")]

    def test_debug_match_sink_through_fake(self, fake_fs):
        from sciencebeam_trainer_grobid_tools_spark.operators.matching import (
            MATCH_DEBUG_COLUMNS,
            CsvMatchDetailReporter,
        )

        with CsvMatchDetailReporter("fake://debug/match.tsv") as reporter:
            reporter({c: "v" for c in MATCH_DEBUG_COLUMNS})
        content = fake_fs.store["fake://debug/match.tsv"]
        lines = content.strip().split("\r\n")
        assert lines[0] == "\t".join(MATCH_DEBUG_COLUMNS)
        assert len(lines) == 2


class TestDebugSinkPartFiles:
    def test_driver_side_path_unchanged(self, tmp_path):
        from sciencebeam_trainer_grobid_tools_spark.operators.matching import (
            CsvMatchDetailReporter,
        )

        path = str(tmp_path / "debug.csv")
        with CsvMatchDetailReporter(path) as reporter:
            assert reporter.path == path

    def test_concurrent_tasks_get_distinct_part_files(self, spark, tmp_path):
        """Two executor tasks given the SAME sink path must not interleave:
        each writes its own ``.partNNNNN`` file."""
        from pyspark.sql import functions as F

        out_dir = str(tmp_path)
        target = os.path.join(out_dir, "debug.tsv")

        def write_partition(batches):
            from sciencebeam_trainer_grobid_tools_spark.operators.matching import (
                MATCH_DEBUG_COLUMNS,
                CsvMatchDetailReporter,
            )

            with CsvMatchDetailReporter(target) as reporter:
                for pdf in batches:
                    for tag in pdf["tag"]:
                        reporter({c: tag for c in MATCH_DEBUG_COLUMNS})
                    yield pdf.assign(part_file=reporter.path)

        df = (
            spark.range(4)
            .select(F.concat(F.lit("tag"), F.col("id")).alias("tag"))
            .repartition(2)
        )
        result = df.mapInPandas(
            write_partition, schema="tag string, part_file string"
        ).collect()

        part_files = {row["part_file"] for row in result}
        assert len(part_files) >= 2, part_files
        assert not os.path.exists(target), "tasks must not share the bare path"
        total_rows = 0
        for part in part_files:
            assert ".part" in os.path.basename(part)
            with open(part, encoding="utf-8") as handle:
                rows = list(csv.DictReader(handle, delimiter="\t"))
            total_rows += len(rows)
        assert total_rows == 4


class TestDebugSinkAttemptDedup:
    def _write(self, path, rows):
        with open(path, "w", encoding="utf-8") as handle:
            handle.write("tag,value\n")
            for tag, value in rows:
                handle.write("%s,%s\n" % (tag, value))

    def test_reader_keeps_highest_attempt_per_partition(self, tmp_path):
        """A failed/speculative attempt's partial part file sits alongside
        the winning attempt's — a raw glob would double-count that
        partition.  The reader keeps only the highest attempt each."""
        from sciencebeam_trainer_grobid_tools_spark.operators.matching import (
            list_debug_match_files,
            read_debug_matches,
        )

        base = str(tmp_path / "debug.csv")
        self._write(str(tmp_path / "debug.part00000_a0.csv"), [("t0", 1)])
        self._write(
            str(tmp_path / "debug.part00000_a1.csv"), [("t0", 1), ("t1", 2)]
        )
        self._write(str(tmp_path / "debug.part00001_a0.csv"), [("t2", 3)])

        files = [os.path.basename(f) for f in list_debug_match_files(base)]
        assert files == ["debug.part00000_a1.csv", "debug.part00001_a0.csv"]

        rows = read_debug_matches(base)
        assert len(rows) == 3  # a0 partial of partition 0 excluded

    def test_reader_handles_wide_partition_ids_and_glob_metachars(self, tmp_path):
        """part%05d WIDENS past partition 99999, and the base path may
        contain glob metacharacters — neither may silently drop files
        (round-6 ADVICE: the fixed [0-9]x5 glob excluded 6-digit parts)."""
        from sciencebeam_trainer_grobid_tools_spark.operators.matching import (
            list_debug_match_files,
            read_debug_matches,
        )

        sink_dir = tmp_path / "run[2026]"  # glob metachars in the base path
        sink_dir.mkdir()
        base = str(sink_dir / "debug.csv")
        self._write(str(sink_dir / "debug.part00003_a0.csv"), [("t0", 1)])
        self._write(str(sink_dir / "debug.part123456_a0.csv"), [("t1", 2)])
        self._write(
            str(sink_dir / "debug.part123456_a2.csv"), [("t1", 2), ("t2", 3)]
        )

        files = [os.path.basename(f) for f in list_debug_match_files(base)]
        assert files == ["debug.part00003_a0.csv", "debug.part123456_a2.csv"]
        assert len(read_debug_matches(base)) == 3

    def test_reader_includes_driver_side_bare_file(self, tmp_path):
        from sciencebeam_trainer_grobid_tools_spark.operators.matching import (
            list_debug_match_files,
        )

        base = str(tmp_path / "debug.csv")
        self._write(base, [("drv", 0)])
        self._write(str(tmp_path / "debug.part00002_a0.csv"), [("t", 1)])
        files = [os.path.basename(f) for f in list_debug_match_files(base)]
        assert files == ["debug.csv", "debug.part00002_a0.csv"]

    def test_reader_empty_sink(self, tmp_path):
        from sciencebeam_trainer_grobid_tools_spark.operators.matching import (
            MATCH_DEBUG_COLUMNS,
            read_debug_matches,
        )

        rows = read_debug_matches(str(tmp_path / "missing.csv"))
        assert len(rows) == 0
        assert list(rows.columns) == MATCH_DEBUG_COLUMNS

    def test_atexit_backstop_registered_once_per_process(self, tmp_path):
        from sciencebeam_trainer_grobid_tools_spark.operators import matching

        with matching.CsvMatchDetailReporter(str(tmp_path / "a.csv")):
            pass
        assert matching._ATEXIT_REGISTERED is True
