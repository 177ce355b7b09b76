"""Composed curation pipeline (plans/curation.py): stage wiring, planted
per-stage drops, toggles, and plan shape."""

import pytest
from pyspark.sql import functions as F

from sciencebeam_trainer_grobid_tools_spark.plans.curation import curate_corpus
from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session


@pytest.fixture(scope="module")
def spark():
    session = build_session("curation-tests", cpus=4, shuffle_partitions=4)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


GOOD = (
    "This is a perfectly ordinary paragraph of running prose that keeps "
    "going for long enough to clear the length floor and reads like text."
)


@pytest.fixture(scope="module")
def corpus(spark):
    """Six docs, one planted casualty per stage:

    - 0/1: recrawl pair of one page (utm/case/slash variants); 1 is newer
    - 2: fails the quality length floor (short)
    - 3: repetitive (one bigram dominates -> dup_ngram_frac high)
    - 4: clean survivor with planted PII
    - 5: clean survivor
    """
    rows = [
        (0, "http://WWW.Site.COM/a/?utm_source=x", 10, GOOD + " older crawl"),
        (1, "http://www.site.com/a", 20, GOOD + " newer crawl"),
        (2, "http://site.com/b", 10, "too short"),
        (3, "http://site.com/c", 10, "spam ham " * 40),
        (4, "http://site.com/d", 10, GOOD + " mail me at bob@example.com now"),
        (5, "http://site.com/e", 10, GOOD + " another clean page"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts long, text string"
    ).withColumn("lang", F.lit("en"))


class TestCurateCorpus:
    def test_each_stage_drops_its_casualty(self, corpus):
        out = curate_corpus(
            corpus, url_col="url", max_dup_ngram_frac=0.2
        ).collect()
        ids = {r["doc_id"] for r in out}
        assert ids == {1, 4, 5}  # 0 deduped away, 2 quality, 3 repetition

    def test_dedup_keeps_newest_recrawl(self, corpus):
        out = curate_corpus(corpus, url_col="url", max_dup_ngram_frac=0.2).collect()
        texts = {r["doc_id"]: r["text"] for r in out}
        assert "newer crawl" in texts[1]

    def test_canonical_hint_dedup_folds_amp_variant(self, spark):
        """An AMP page on a DIFFERENT URL declaring the main page's
        canonical folds under dedup_key='canonical_hint' (the URL
        normalizer alone cannot fold it — the negative control keeps
        both rows)."""
        rows = [
            (
                0,
                "http://amp.site.com/a/amp",
                10,
                "<html><LINK REL=canonical "
                "HREF='http://WWW.site.com/a/?utm_campaign=amp'></html>",
                GOOD + " amp variant",
            ),
            (1, "http://www.site.com/a", 20, "", GOOD + " main page"),
            (2, "http://www.site.com/b", 10, "", GOOD + " other page"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, url string, warc_ts long, html string, text string"
        ).withColumn("lang", F.lit("en"))
        hinted = curate_corpus(
            df, url_col="url", dedup_key="canonical_hint", html_col="html"
        ).collect()
        assert {r["doc_id"] for r in hinted} == {1, 2}
        plain = curate_corpus(df, url_col="url").collect()
        assert {r["doc_id"] for r in plain} == {0, 1, 2}

    def test_robots_stage_drops_disallowed_urls(self, spark):
        """parse_robots output composes as a curation stage: prefix rule
        with a longer Allow exception plus a wildcard rule, evaluated on
        the raw URL before dedup."""
        from sciencebeam_trainer_grobid_tools_spark.operators.robots import (
            parse_robots,
        )

        rules = parse_robots(
            spark.createDataFrame(
                [
                    (
                        "site.com",
                        "User-agent: *\nDisallow: /private\n"
                        "Allow: /private/ok\nDisallow: /*?*session=\n",
                    )
                ],
                "host string, robots_txt string",
            )
        )
        rows = [
            (0, "http://site.com/private/page", 1, GOOD + " private page"),
            (1, "http://site.com/private/ok/page", 1, GOOD + " allowed page"),
            (2, "http://site.com/a?x=1&session=abc", 1, GOOD + " wildcard hit"),
            (3, "http://site.com/a?x=1", 1, GOOD + " public page"),
            (4, "http://other.com/private/page", 1, GOOD + " no rules host"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, url string, warc_ts long, text string"
        ).withColumn("lang", F.lit("en"))
        out = curate_corpus(df, url_col="url", robots_rules=rules).collect()
        assert {r["doc_id"] for r in out} == {1, 3, 4}

    def test_robots_rules_require_url_col(self, corpus, spark):
        rules = spark.createDataFrame(
            [("h", 0, False, "/")], "host string, seq int, allow boolean, prefix string"
        )
        with pytest.raises(ValueError, match="requires url_col"):
            curate_corpus(corpus, url_col=None, robots_rules=rules)

    def test_canonical_hint_requires_html_col(self, corpus):
        with pytest.raises(ValueError, match="requires html_col"):
            curate_corpus(corpus, url_col="url", dedup_key="canonical_hint")
        with pytest.raises(ValueError, match="dedup_key"):
            curate_corpus(corpus, url_col="url", dedup_key="bogus")

    def test_pii_is_scrubbed_in_output(self, corpus):
        out = curate_corpus(corpus, url_col="url", max_dup_ngram_frac=0.2).collect()
        texts = {r["doc_id"]: r["text"] for r in out}
        assert "bob@example.com" not in texts[4]
        assert "<EMAIL>" in texts[4]

    def test_budget_sampling_composes(self, corpus):
        all_kept = curate_corpus(
            corpus, url_col="url", max_dup_ngram_frac=0.2, budget_tokens=10_000
        ).collect()
        assert {r["doc_id"] for r in all_kept} == {1, 4, 5}  # rate clamps to 1
        some = curate_corpus(
            corpus, url_col="url", max_dup_ngram_frac=0.2, budget_tokens=30
        ).collect()
        assert len(some) < 3

    def test_line_dedup_stage_composes(self, spark):
        """min_line_docs plugs boilerplate line removal into the chain,
        keeping all columns and running BEFORE quality (a chrome-heavy doc
        must be judged on its remaining content)."""
        boiler = "Subscribe to our newsletter"
        rows = [
            (1, "http://s.com/a", 1, GOOD + "\n" + boiler, "en"),
            (2, "http://s.com/b", 1, GOOD + " again\n" + boiler, "en"),
            (3, "http://s.com/c", 1, GOOD + " third page", "en"),
        ]
        corpus = spark.createDataFrame(
            rows, "doc_id long, url string, warc_ts long, text string, lang string"
        )
        out = curate_corpus(corpus, url_col="url", min_line_docs=2).collect()
        assert {r["doc_id"] for r in out} == {1, 2, 3}
        texts = {r["doc_id"]: r["text"] for r in out}
        assert boiler not in texts[1] and boiler not in texts[2]
        assert sorted(out[0].asDict()) == ["doc_id", "lang", "text", "url", "warc_ts"]

    def test_stage_toggles(self, corpus):
        # no dedup: both recrawls survive the quality floor
        no_dedup = curate_corpus(corpus, max_dup_ngram_frac=0.2).collect()
        assert {r["doc_id"] for r in no_dedup} == {0, 1, 4, 5}
        # no repetition filter: the repetitive doc survives
        no_rep = curate_corpus(corpus, url_col="url").collect()
        assert {r["doc_id"] for r in no_rep} == {1, 3, 4, 5}

    def test_single_lazy_plan_no_python(self, corpus):
        df = curate_corpus(
            corpus, url_col="url", max_dup_ngram_frac=0.2, budget_tokens=100
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # every stage stays JVM-side
        assert "rn" not in df.columns and "_n_tok" not in df.columns

    def test_persist_intermediate_collapses_recompute(self, corpus, spark):
        df = curate_corpus(
            corpus,
            url_col="url",
            max_dup_ngram_frac=0.2,
            budget_tokens=100,
            persist_intermediate=True,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # every statistics consumer (repetition agg, semi-join stream,
        # sampling totals, final stream) reads the ONE cached intermediate
        # instead of re-deriving dedup -> scrub -> quality
        assert plan.count("InMemoryTableScan") >= 2
        assert df.count() > 0  # materializes through the cache
        spark.catalog.clearCache()

    def test_web_filter_stages_drop_their_casualties(self, spark):
        """c4 / gopher / classifier stages each remove exactly their
        planted casualty and nothing else."""
        base = (
            "the quick brown fox and the lazy dog run to the river near "
            "the farm house every day with great joy under a tall tree."
        )
        rows = [
            (1, base * 3),                       # survives all stages
            (2, base * 3 + " stray { brace"),    # c4 page rule
            (3, "the and to of short words."),   # gopher word-count band
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
            "lang", F.lit("en")
        )
        out = curate_corpus(
            df, c4={}, gopher={"min_words": 30}, clf_threshold=0.0
        ).collect()
        assert {r["doc_id"] for r in out} == {1}
        # clf_threshold=1.0 is unreachable (sigmoid < 1): kills everything
        assert (
            curate_corpus(
                df, c4={}, gopher={"min_words": 30}, clf_threshold=1.0
            ).count()
            == 0
        )

    def test_c4_stage_rewrites_text_to_kept_lines(self, spark):
        text = (
            "A proper first sentence that is long enough to stay here.\n"
            "noise menu line\n"
            "Another proper closing sentence finishes the page cleanly. "
            "It even has three sentences total. Truly it does."
        )
        df = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        ).withColumn("lang", F.lit("en"))
        out = curate_corpus(df, c4={}).collect()
        assert len(out) == 1
        assert "noise menu line" not in out[0]["text"]
        assert out[0]["text"].startswith("A proper first sentence")

    def test_web_filter_stages_stay_jvm_side(self, spark):
        df = spark.createDataFrame(
            [(1, GOOD)], "doc_id long, text string"
        ).withColumn("lang", F.lit("en"))
        plan = (
            curate_corpus(df, c4={}, gopher={}, clf_threshold=0.5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan

    def test_c4_and_gopher_add_zero_exchanges(self, spark):
        """The two rule families are pure codegen predicates: enabling
        them must not change the plan's shuffle count."""
        df = spark.createDataFrame(
            [(1, GOOD)], "doc_id long, text string"
        ).withColumn("lang", F.lit("en"))
        base_plan = (
            curate_corpus(df)._jdf.queryExecution().executedPlan().toString()
        )
        with_rules = (
            curate_corpus(df, c4={}, gopher={})
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert with_rules.count("Exchange") == base_plan.count("Exchange")

    def test_blocked_domains_stage(self, corpus):
        out = curate_corpus(
            corpus,
            url_col="url",
            max_dup_ngram_frac=0.2,
            blocked_domains=["site.com"],
        )
        assert out.count() == 0  # every fixture url lives under site.com
        kept = curate_corpus(
            corpus,
            url_col="url",
            max_dup_ngram_frac=0.2,
            blocked_domains=["othersite.com"],
        ).collect()
        assert {r["doc_id"] for r in kept} == {1, 4, 5}

    def test_blocked_domains_requires_url_col(self, corpus):
        with pytest.raises(ValueError):
            curate_corpus(corpus, url_col=None, blocked_domains=["x.com"])
