"""Filesystem seam for executor-side per-file sinks.

The reference routes all file I/O through Beam's ``FileSystems`` facade
(reference ``sciencebeam_trainer_grobid_tools/utils/io.py:16-39``), which is
what lets the same pipeline write to ``gs://`` buckets and local trees.  The
Spark engine keeps bulk data in DataFrame writers (parquet/Iceberg-seam), but
three sinks are genuinely per-file (one TEI XML per input document, paired
source-file ingest copies, debug-match CSVs) and run inside executor tasks.
Those go through this seam instead of calling ``open()`` directly, so an
object-store backend can be swapped in per URL scheme without touching the
kernels.

Local paths (no scheme, or ``file://``) are served by :class:`LocalFileSystem`.
Any other scheme (``gs://``, ``s3a://``, ``hdfs://`` ...) raises with the
registration hook named — in a real deployment register a backend once on the
executor (e.g. an fsspec/cloud-SDK adapter) via :func:`register_filesystem`;
the kernels themselves need no change.  Registration is process-local, so do
it in a module imported by the job (shipped with ``--py-files``).
"""

from typing import Callable, Dict, Iterator, Tuple
from contextlib import contextmanager
import os
import shutil


class LocalFileSystem:
    """Default backend: the executor's local / shared-mount filesystem."""

    def exists(self, path: str) -> bool:
        return os.path.exists(_strip_scheme(path))

    def makedirs(self, path: str) -> None:
        path = _strip_scheme(path)
        if path:
            os.makedirs(path, exist_ok=True)

    @contextmanager
    def open_write(self, path: str, binary: bool = False) -> Iterator:
        path = _strip_scheme(path)
        self.makedirs(os.path.dirname(path))
        mode = "wb" if binary else "w"
        kwargs = {} if binary else {"encoding": "utf-8", "newline": ""}
        with open(path, mode, **kwargs) as handle:
            yield handle

    def copyfile(self, src: str, dst: str) -> None:
        dst = _strip_scheme(dst)
        self.makedirs(os.path.dirname(dst))
        shutil.copyfile(_strip_scheme(src), dst)


_REGISTRY: Dict[str, Callable[[], object]] = {
    "": LocalFileSystem,
    "file": LocalFileSystem,
}


def register_filesystem(scheme: str, factory: Callable[[], object]) -> None:
    """Register a backend for ``scheme`` (e.g. ``"gs"``, ``"s3a"``).

    ``factory()`` must return an object with the :class:`LocalFileSystem`
    method surface (``exists`` / ``makedirs`` / ``open_write`` / ``copyfile``).
    """
    _REGISTRY[scheme.lower()] = factory


def _split_scheme(path: str) -> Tuple[str, str]:
    head, sep, rest = path.partition("://")
    if sep and len(head) > 1:  # len>1 keeps windows drive letters local
        return head.lower(), rest
    return "", path


def _strip_scheme(path: str) -> str:
    scheme, rest = _split_scheme(path)
    return rest if scheme == "file" else path if not scheme else rest


def get_filesystem(path: str):
    """Resolve the backend for ``path`` by URL scheme."""
    scheme, _ = _split_scheme(path)
    factory = _REGISTRY.get(scheme)
    if factory is None:
        raise ValueError(
            "no filesystem registered for scheme %r (path %r); register an "
            "object-store backend via sources.fs.register_filesystem(%r, factory) "
            "in a module shipped to the executors" % (scheme, path, scheme)
        )
    return factory()


def write_text_file(path: str, text: str) -> None:
    """Write ``text`` to ``path`` through the scheme-resolved backend."""
    with get_filesystem(path).open_write(path) as handle:
        handle.write(text)
