"""Build the --py-files archive for spark-submit deployment.

The reference ships code to Dataflow workers via Beam's
``save_main_session`` global pickling (auto_annotate_utils.py:730-733); the
engine's equivalent is a plain package zip shipped with
``spark-submit --py-files`` (north_star deployment requirement):

    python scripts/build_pyfiles_zip.py
    spark-submit --py-files dist/sciencebeam_trainer_grobid_tools_spark.zip \
        your_job.py

The archive contains only the package sources — no tests, no caches.
"""

import os
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "sciencebeam_trainer_grobid_tools_spark"


def build(output_dir: str = "dist") -> str:
    out_dir = os.path.join(REPO_ROOT, output_dir)
    os.makedirs(out_dir, exist_ok=True)
    archive_path = os.path.join(out_dir, PACKAGE + ".zip")
    package_root = os.path.join(REPO_ROOT, PACKAGE)
    with zipfile.ZipFile(archive_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(package_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for filename in sorted(filenames):
                if not filename.endswith(".py"):
                    continue
                full = os.path.join(dirpath, filename)
                rel = os.path.relpath(full, REPO_ROOT)
                zf.write(full, rel)
    return archive_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else "dist")
    print(path)
