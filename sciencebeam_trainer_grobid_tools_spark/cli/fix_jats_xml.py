"""``python -m ...cli.fix_jats_xml`` — JATS XML repair main
(reference ``fix_jats_xml.py:929-1010``)."""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

from ..operators.jats_fix import run_fix_jats_pipeline
from . import shared


def add_main_args(parser: argparse.ArgumentParser) -> None:
    source_group = parser.add_argument_group("source")
    source_group.add_argument("--source-base-path", type=str,
                              help="source base data path for files to fix")
    source_group.add_argument("--source-path", type=str,
                              help="source path to a specific file to fix")
    source_group.add_argument("--source-filename-pattern", type=str,
                              default="*.xml*",
                              help="file pattern within source base path")
    source_group.add_argument("--source-file-list", type=str,
                              help="path to source file list (one relative "
                                   "path per line, or csv/tsv)")
    source_group.add_argument("--source-file-list-column", type=str,
                              default="xml_url",
                              help="column to use when the file list is csv/tsv")
    parser.add_argument("--output-path", type=str, required=True,
                        help="output base path")
    parser.add_argument("--limit", type=int, required=False,
                        help="limit the number of files to process")
    parser.add_argument("--multi-processing", action="store_true", default=False,
                        help="accepted for compatibility; Spark owns parallelism")
    parser.add_argument("--no-log-file", action="store_true", default=False,
                        help="accepted for compatibility")
    spark_group = parser.add_argument_group("spark")
    spark_group.add_argument("--spark-cpus", type=int, default=None)
    spark_group.add_argument("--spark-shuffle-partitions", type=int, default=None)
    shared.add_debug_argument(parser)


def parse_args(argv: Optional[list] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    add_main_args(parser)
    args = parser.parse_args(argv)
    if not (args.source_base_path or args.source_path):
        parser.error("one of --source-base-path or --source-path required")
    return args


def _load_file_list(args: argparse.Namespace) -> Optional[list]:
    if not args.source_file_list:
        return None
    from ..plans.ingest import load_file_list

    return load_file_list(
        args.source_file_list, args.source_file_list_column, limit=args.limit
    )


def run(args: argparse.Namespace) -> dict:
    spark = shared.get_or_create_session(args, "fix-jats-xml")
    source_base_path = args.source_base_path
    pattern = args.source_filename_pattern
    limit = args.limit
    if not source_base_path:
        source_base_path = os.path.dirname(os.path.abspath(args.source_path))
        pattern = os.path.basename(args.source_path)
        limit = 1
    counters = run_fix_jats_pipeline(
        spark,
        source_base_path=source_base_path,
        output_path=args.output_path,
        file_list=_load_file_list(args),
        source_filename_pattern=pattern,
        limit=limit,
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
