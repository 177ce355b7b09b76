"""``python -m ...cli.download_source_files`` — paired source-file ingest main
(reference ``download_source_files.py:20-101,287-349``)."""

from __future__ import annotations

import argparse
import logging
from typing import Optional

from ..plans.ingest import (
    DEFAULT_DOCUMENT_COLUMN,
    DEFAULT_OUTPUT_FILENAME_PATTERN,
    DEFAULT_TARGET_COLUMN,
    download_source_file_pairs,
)
from . import shared


def _add_file_list_args(parser, name: str, label: str, default_file_column: str):
    parser.add_argument("--%s-file-list" % name, type=str, required=True,
                        help="path to %s file list (csv/tsv/lst)" % label)
    parser.add_argument("--%s-base-path" % name, type=str, required=False,
                        help="base path of %s file list" % label)
    parser.add_argument("--%s-file-column" % name, type=str, required=False,
                        default=default_file_column,
                        help="csv/tsv column name (ignored for plain lists)")


def _add_output_args(parser, name: str, label: str):
    parser.add_argument("--%s-output-path" % name, type=str, required=True,
                        help="output path for %s" % label)
    parser.add_argument("--%s-output-filename-pattern" % name, type=str,
                        required=False, default=DEFAULT_OUTPUT_FILENAME_PATTERN,
                        help="output filename pattern for %s" % label)


def add_main_args(parser: argparse.ArgumentParser) -> None:
    _add_file_list_args(parser, "document", "PDF document", DEFAULT_DOCUMENT_COLUMN)
    _add_file_list_args(parser, "target", "target XML", DEFAULT_TARGET_COLUMN)
    _add_output_args(parser, "document", "PDF document")
    _add_output_args(parser, "target", "target XML")
    parser.add_argument("--limit", type=int, required=False,
                        help="limit the number of files to process")
    parser.add_argument("--threads", type=int, default=1,
                        help="accepted for compatibility; copies run "
                             "distributed on Spark executors")
    spark_group = parser.add_argument_group("spark")
    spark_group.add_argument("--spark-cpus", type=int, default=None)
    spark_group.add_argument("--spark-shuffle-partitions", type=int, default=None)
    shared.add_debug_argument(parser)


def parse_args(argv: Optional[list] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    add_main_args(parser)
    return parser.parse_args(argv)


def run(args: argparse.Namespace) -> dict:
    spark = shared.get_or_create_session(args, "download-source-files")
    counters = download_source_file_pairs(
        spark,
        document_file_list=args.document_file_list,
        target_file_list=args.target_file_list,
        document_output_path=args.document_output_path,
        target_output_path=args.target_output_path,
        document_column=args.document_file_column,
        target_column=args.target_file_column,
        document_base_path=args.document_base_path,
        target_base_path=args.target_base_path,
        document_output_filename_pattern=args.document_output_filename_pattern,
        target_output_filename_pattern=args.target_output_filename_pattern,
        limit=args.limit,
    )
    print("counters: %s" % counters)
    return counters


def main(argv: Optional[list] = None) -> dict:
    args = parse_args(argv)
    shared.process_debug_argument(args)
    return run(args)


if __name__ == "__main__":
    logging.basicConfig(level="INFO")
    main()
