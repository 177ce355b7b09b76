"""Straggler/skew behavior of the flagship plan (SURVEY §7.3.5).

The oversized-doc guard bounds the worst case; this pins the sub-threshold
regime: a Pareto-distributed corpus of giants (~200x the median document,
all under the guard) must not cost materially more wall-clock than a
uniform corpus at EQUAL total bytes — the salted
``repartition(xxhash64(url))`` spread plus small Arrow batches delivers
this (the reference's one-doc-per-future model instead stalls a worker for
a giant's full duration: auto_annotate_utils.py:740-757).

The full-size committed numbers live in ``BENCH/skew_r5.json``
(6000 docs: ratio 0.979 at equal +-0.1% bytes); this test is the smaller
always-on version with a noise-tolerant bound.
"""

import time

import pytest
from pyspark.sql import SparkSession, functions as F

from sciencebeam_trainer_grobid_tools_spark.plans.pipeline import annotate_documents
from sciencebeam_trainer_grobid_tools_spark.sources.corpus import (
    pareto_paragraph_counts,
    sized_corpus_dataframe,
    uniform_paragraph_counts,
)

N_DOCS = 2500


@pytest.fixture(scope="module")
def spark():
    session = (
        SparkSession.builder.master("local[32]")
        .appName("skew-test")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield session
    session.stop()


class TestSkewStraggler:
    def test_corpora_have_equal_bytes_and_heavy_tail(self, spark):
        pareto_counts = pareto_paragraph_counts(N_DOCS, seed=42)
        uniform_counts = uniform_paragraph_counts(N_DOCS, sum(pareto_counts))
        assert sum(pareto_counts) == sum(uniform_counts)
        median = sorted(pareto_counts)[N_DOCS // 2]
        assert max(pareto_counts) >= 100 * median  # genuine giants in-corpus

        def total_bytes(counts):
            return (
                sized_corpus_dataframe(spark, counts, seed=42, partitions=16)
                .agg(
                    F.sum(
                        F.coalesce(F.octet_length("html"), F.lit(0))
                        + F.coalesce(F.octet_length("text"), F.lit(0))
                    ).alias("b")
                )
                .collect()[0]["b"]
            )

        pareto_bytes = total_bytes(pareto_counts)
        uniform_bytes = total_bytes(uniform_counts)
        assert abs(pareto_bytes - uniform_bytes) / uniform_bytes < 0.02

    def test_pareto_wall_clock_within_budget_of_uniform(self, spark, tmp_path):
        """wall(pareto) <= 1.5 x wall(uniform) at equal total bytes: the
        salted repartition spreads the giants instead of clustering them."""
        pareto_counts = pareto_paragraph_counts(N_DOCS, seed=42)
        uniform_counts = uniform_paragraph_counts(N_DOCS, sum(pareto_counts))
        paths = {}
        for name, counts in (
            ("pareto", pareto_counts),
            ("uniform", uniform_counts),
        ):
            path = str(tmp_path / name)
            sized_corpus_dataframe(spark, counts, seed=42, partitions=32).write.parquet(
                path
            )
            paths[name] = path

        def timed_wall(path):
            docs = spark.read.parquet(path)
            # warm-up: codegen, python workers, C kernel, page cache
            annotate_documents(docs, repartition=128).count()
            walls = []
            for _ in range(2):
                t0 = time.time()
                annotate_documents(docs, repartition=128).agg(
                    F.count(F.lit(1))
                ).collect()
                walls.append(time.time() - t0)
            return min(walls)

        wall_uniform = timed_wall(paths["uniform"])
        wall_pareto = timed_wall(paths["pareto"])
        ratio = wall_pareto / wall_uniform
        assert ratio <= 1.5, (
            "pareto corpus straggled: %.2fs vs uniform %.2fs (ratio %.2f)"
            % (wall_pareto, wall_uniform, ratio)
        )
