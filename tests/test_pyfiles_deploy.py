"""Deployment-path check: the --py-files archive must be self-contained.

The north-star deployment is ``spark-submit --py-files <zip>``; executors
import the package from the zip alone.  Build the archive, then in a fresh
python process whose sys.path contains ONLY the zip (plus stdlib), import
the package and run a kernel call — catching any dependency on repo-relative
files that would not ship.
"""

import os
import subprocess
import sys


def test_zip_is_self_contained(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.build_pyfiles_zip import build

    archive = build(str(tmp_path))
    assert os.path.exists(archive)

    probe = r"""
import sys
zip_path = sys.argv[1]
# strip repo entries so only the zip provides the package
sys.path = [p for p in sys.path if "repo" not in p]
sys.path.insert(0, zip_path)
import sciencebeam_trainer_grobid_tools_spark
assert zip_path in sciencebeam_trainer_grobid_tools_spark.__file__, (
    sciencebeam_trainer_grobid_tools_spark.__file__)
from sciencebeam_trainer_grobid_tools_spark.kernel.fuzzy import (
    fuzzy_search_index_range,
)
from sciencebeam_trainer_grobid_tools_spark.kernel.doc import tokenize_lines
from sciencebeam_trainer_grobid_tools_spark.plans.pipeline import (
    annotate_document_row,
)
from sciencebeam_trainer_grobid_tools_spark.sources.corpus import (
    DEFAULT_XML_MAPPING,
)
assert fuzzy_search_index_range("abc abc", "abc", 0.8) == (0, 3)
doc = tokenize_lines(["Hello World"])
assert doc.extracted_text == "Hello World"
result = annotate_document_row(
    "doc://1", None, "Some Title\nbody text",
    "<article><front><article-meta><title-group><article-title>Some Title"
    "</article-title></title-group></article-meta></front></article>",
    DEFAULT_XML_MAPPING)
assert result["extracted_text"].startswith("Some Title")
assert result["alignment_hits"] >= 1
print("PYFILES_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", probe, archive],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # not the repo root: relative imports must not leak
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PYFILES_OK" in proc.stdout


def test_native_kernel_compiles_from_zip(tmp_path):
    """From a zip deployment the __file__-derived cache dir is inside the
    archive; the tempdir fallback must still deliver the C kernel (not the
    silent numpy degradation)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.build_pyfiles_zip import build

    archive = build(str(tmp_path))
    probe = r"""
import os, sys
zip_path = sys.argv[1]
sys.path = [p for p in sys.path if "repo" not in p]
sys.path.insert(0, zip_path)
# force a fresh cache decision: point the primary cache INSIDE the zip
# (impossible) so only the tempdir fallback can serve
os.environ["SPARK_GRAFT_NATIVE_CACHE"] = os.path.join(zip_path, "nope")
from sciencebeam_trainer_grobid_tools_spark.kernel import native
lib = native.get_native_lib()
print("NATIVE_LIB:", "OK" if lib is not None else "MISSING")
"""
    proc = subprocess.run(
        [sys.executable, "-c", probe, archive],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "NATIVE_LIB: OK" in proc.stdout, proc.stdout
