"""Spark end-to-end tests: corpus generation -> annotate -> spans + resume.

Uses a small local session (module-scoped) to keep test wall-clock bounded.
"""

import pytest
from pyspark.sql import functions as F

from sciencebeam_trainer_grobid_tools_spark.plans.pipeline import (
    annotate_documents,
    resume_filter,
    spans_table,
)
from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session
from sciencebeam_trainer_grobid_tools_spark.sources.corpus import corpus_dataframe

N_DOCS = 40


@pytest.fixture(scope="module")
def spark():
    session = build_session("pipeline-tests", cpus=4, shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="module")
def annotated(spark):
    docs = corpus_dataframe(spark, N_DOCS, seed=42, partitions=4)
    result = annotate_documents(docs, repartition=8).cache()
    yield result
    result.unpersist()


class TestSparkPipeline:
    def test_row_count_and_no_errors(self, annotated):
        rows = annotated.collect()
        assert len(rows) == N_DOCS
        assert all(r["error"] is None for r in rows)

    def test_extracted_text_byte_identity_vs_text_column_path(self, spark, annotated):
        """The same corpus annotated via the pre-extracted ``text`` column must
        produce byte-identical extracted_text per url (the per-url invariant)."""
        docs = corpus_dataframe(spark, N_DOCS, seed=42, partitions=4)
        via_text = annotate_documents(docs, repartition=8, use_html=False)
        mismatches = (
            annotated.select("url", "extracted_text")
            .join(
                via_text.select(
                    "url", F.col("extracted_text").alias("extracted_text_2")
                ),
                "url",
            )
            .filter(F.col("extracted_text") != F.col("extracted_text_2"))
            .count()
        )
        assert mismatches == 0

    def test_spans_flatten_and_title_alignment_rate(self, annotated):
        flat = spans_table(annotated)
        titles = flat.filter(F.col("field") == "title").count()
        assert titles >= int(N_DOCS * 0.9)

    def test_resume_anti_join(self, spark, annotated):
        docs = corpus_dataframe(spark, N_DOCS, seed=42, partitions=4)
        completed = annotated.select("url").limit(25)
        remaining = resume_filter(docs, completed)
        assert remaining.count() == N_DOCS - 25

    def test_determinism_across_runs(self, spark, annotated):
        docs = corpus_dataframe(spark, N_DOCS, seed=42, partitions=2)
        again = annotate_documents(docs, repartition=4)
        joined = (
            annotated.select("url", "extracted_text", F.size("spans").alias("n1"))
            .join(
                again.select("url", F.size("spans").alias("n2")),
                "url",
            )
            .filter(F.col("n1") != F.col("n2"))
        )
        assert joined.count() == 0
