"""Source-file ingest job (reference ``download_source_files.py`` — S9).

The reference pairs a document file list with a target file list
positionally, drops pairs where either side is missing (failing if none
remain), derives output names from a ``{dir}{name}{ext}``-style pattern
(download_source_files.py:166-236), and copies both sides with a thread
pool (:249-266).  Here the *file lists* are driver-side metadata (paths
only) while the existence checks and byte copies — the actual I/O — run
distributed: the pair table is repartitioned and each executor copies its
slice, so ingest bandwidth scales with the cluster instead of one node's
thread pool.
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import Dict, List, Optional

from pyspark.sql import SparkSession


DEFAULT_DOCUMENT_COLUMN = "source_url"
DEFAULT_TARGET_COLUMN = "xml_url"
DEFAULT_OUTPUT_FILENAME_PATTERN = "{dir}{name}{ext}"


def load_file_list(
    file_list_path: str, column: str, limit: Optional[int] = None
) -> List[str]:
    """``.lst`` files are plain per-line paths; ``.csv``/``.tsv`` have a
    header row naming ``column`` (sciencebeam file-list conventions)."""
    with open(file_list_path, "r", encoding="utf-8") as handle:
        if file_list_path.endswith(".lst"):
            names = [line.strip() for line in handle if line.strip()]
        else:
            delimiter = "\t" if file_list_path.endswith(".tsv") else ","
            reader = csv.DictReader(handle, delimiter=delimiter)
            if reader.fieldnames is None or column not in reader.fieldnames:
                raise ValueError(
                    "column %r not in file list %s (columns: %s)"
                    % (column, file_list_path, reader.fieldnames)
                )
            names = [row[column] for row in reader if row.get(column)]
    return names[:limit] if limit else names


def get_filename_pattern_props(relative_source_filename: str) -> Dict[str, str]:
    """download_source_files.py:166-177 (``.gz`` stripped from name/ext)."""
    relative_dirname = os.path.dirname(relative_source_filename)
    filename = os.path.basename(relative_source_filename)
    name, ext = os.path.splitext(filename)
    if ext.lower() == ".gz":
        name, ext = os.path.splitext(name)
    return dict(
        dir=relative_dirname + "/" if relative_dirname else "",
        filename=filename,
        name=name,
        ext=ext,
    )


def get_relative_output_filename(
    relative_source_filename: str,
    output_filename_pattern: str,
    index: int,
    file_lists: Optional[Dict[str, List[str]]] = None,
) -> str:
    """download_source_files.py:180-190: pattern props of the source file
    plus, for cross-list patterns like ``{document.name}{ext}``, the props of
    every named file list at the same index."""
    pattern_props: Dict[str, object] = dict(
        get_filename_pattern_props(relative_source_filename)
    )
    for file_list_name, file_list in (file_lists or {}).items():
        pattern_props[file_list_name] = argparse.Namespace(
            **get_filename_pattern_props(file_list[index])
        )
    return output_filename_pattern.format(index=index, **pattern_props)


def get_relative_output_file_list(
    relative_source_file_list: List[str],
    output_filename_pattern: str,
    file_lists: Optional[Dict[str, List[str]]] = None,
) -> List[str]:
    return [
        get_relative_output_filename(
            relative_source_filename=filename,
            output_filename_pattern=output_filename_pattern,
            index=index,
            file_lists=file_lists,
        )
        for index, filename in enumerate(relative_source_file_list)
    ]


def _resolve(base_path: Optional[str], name: str) -> str:
    if base_path and not os.path.isabs(name):
        return os.path.join(base_path, name)
    return name


def download_source_file_pairs(
    spark: SparkSession,
    document_file_list: str,
    target_file_list: str,
    document_output_path: str,
    target_output_path: str,
    document_column: str = DEFAULT_DOCUMENT_COLUMN,
    target_column: str = DEFAULT_TARGET_COLUMN,
    document_base_path: Optional[str] = None,
    target_base_path: Optional[str] = None,
    document_output_filename_pattern: str = DEFAULT_OUTPUT_FILENAME_PATTERN,
    target_output_filename_pattern: str = DEFAULT_OUTPUT_FILENAME_PATTERN,
    limit: Optional[int] = None,
) -> Dict[str, int]:
    """Pair the two file lists, drop pairs with a missing side, copy both
    sides of each surviving pair into the output directories (distributed).

    Raises ``ValueError`` when no pair exists (download_source_files.py:305).
    Returns ``{"copied": pairs_copied, "skipped": pairs_missing}``.
    """
    documents = load_file_list(document_file_list, document_column, limit=limit)
    targets = load_file_list(target_file_list, target_column, limit=limit)
    if len(documents) != len(targets):
        raise ValueError(
            "document/target file lists must pair positionally: %d vs %d entries"
            % (len(documents), len(targets))
        )
    file_lists = {"document": documents, "target": targets}
    document_outputs = get_relative_output_file_list(
        documents, document_output_filename_pattern, file_lists=file_lists
    )
    target_outputs = get_relative_output_file_list(
        targets, target_output_filename_pattern, file_lists=file_lists
    )
    rows = [
        (
            index,
            _resolve(document_base_path, documents[index]),
            os.path.join(document_output_path, document_outputs[index]),
            _resolve(target_base_path, targets[index]),
            os.path.join(target_output_path, target_outputs[index]),
        )
        for index in range(len(documents))
    ]
    pairs = spark.createDataFrame(
        rows, "idx long, doc_src string, doc_dst string, tgt_src string, tgt_dst string"
    ).repartition(spark.sparkContext.defaultParallelism)

    def copy_batches(batches):
        import pandas as pd

        # absolute import: this closure is cloudpickled to executors, where
        # relative imports may lack the package context
        from sciencebeam_trainer_grobid_tools_spark.sources.fs import get_filesystem

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                exists = get_filesystem(row.doc_src).exists(
                    row.doc_src
                ) and get_filesystem(row.tgt_src).exists(row.tgt_src)
                if exists:
                    for src, dst in ((row.doc_src, row.doc_dst), (row.tgt_src, row.tgt_dst)):
                        get_filesystem(dst).copyfile(src, dst)
                out.append({"idx": row.idx, "copied": exists})
            yield pd.DataFrame(out, columns=["idx", "copied"])

    # aggregate executor-side; only the (copied -> count) rows (<=2) reach the
    # driver, never one status row per file pair
    outcome = (
        pairs.mapInPandas(copy_batches, schema="idx long, copied boolean")
        .groupBy("copied")
        .count()
        .collect()
    )
    copied = sum(row["count"] for row in outcome if row["copied"])
    if rows and not copied:
        raise ValueError("none of the file pairs exists")
    return {"copied": copied, "skipped": len(rows) - copied}
