"""robots.txt parsing + RFC 9309 policy evaluation (operators/robots.py):
group selection, rule extraction, longest-match/allow-tie semantics via
a python-reference differential, and plan shape."""

import pytest
from pyspark.sql import functions as F

from sciencebeam_trainer_grobid_tools_spark.operators import robots
from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session


@pytest.fixture(scope="module")
def spark():
    session = build_session("robots-tests", cpus=4, shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


ROBOTS = """
# corpus crawler policy
User-agent: megabot
Disallow: /private/

User-agent: *
Disallow: /tmp/
Disallow: /account
Allow: /tmp/public/
Disallow: /wild*card
Disallow: /anchored$
Disallow:
"""


def _rules(spark, host="a.com", text=ROBOTS, ua="*"):
    df = spark.createDataFrame([(host, text)], "host string, robots_txt string")
    return robots.parse_robots(df, user_agent=ua)


class TestParse:
    def test_star_group_rules_in_order(self, spark):
        got = [
            (r.seq, r.allow, r.prefix)
            for r in _rules(spark).orderBy("seq").collect()
        ]
        # pattern rules and the empty Disallow are skipped (documented)
        assert got == [
            (0, False, "/tmp/"),
            (1, False, "/account"),
            (2, True, "/tmp/public/"),
        ]

    def test_specific_agent_beats_star(self, spark):
        got = [
            (r.allow, r.prefix)
            for r in _rules(spark, ua="megabot").orderBy("seq").collect()
        ]
        assert got == [(False, "/private/")]

    def test_no_matching_group_means_no_rules(self, spark):
        text = "User-agent: otherbot\nDisallow: /"
        assert _rules(spark, text=text).count() == 0

    def test_parse_is_single_arrow_stage(self, spark):
        plan = _rules(spark)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and plan.count("MapInPandas") == 1


def ref_blocked(path, rules):
    best = (-1, True)
    for allow, prefix in rules:
        if path.startswith(prefix):
            plen = len(prefix)
            if plen > best[0] or (plen == best[0] and allow and not best[1]):
                best = (plen, allow)
    return not best[1]


class TestBlocked:
    RULES = [(False, "/tmp/"), (True, "/tmp/public/"), (False, "/account")]
    URLS = [
        "https://a.com/tmp/x",            # blocked (Disallow /tmp/)
        "https://a.com/tmp/public/x",     # allowed (longer Allow wins)
        "https://a.com/account/settings", # blocked
        "https://a.com/open/page",        # allowed (no match)
        "https://a.com/",                 # allowed
        "https://other.com/tmp/x",        # allowed (no rules for host)
        "https://a.com/tmp/?q=1",         # blocked (query rides the path)
    ]

    def _decide(self, spark, urls, rules, host="a.com"):
        rules_df = spark.createDataFrame(
            [(host, i, a, p) for i, (a, p) in enumerate(rules)],
            robots.RULE_SCHEMA,
        )
        urls_df = spark.createDataFrame([(u,) for u in urls], "url string")
        return {
            r.url: r.robots_blocked
            for r in robots.robots_blocked(urls_df, rules_df).collect()
        }

    def test_rfc_semantics_vs_reference(self, spark):
        got = self._decide(spark, self.URLS, self.RULES)
        for url in self.URLS:
            if "other.com" in url:
                assert got[url] is False
                continue
            path = url.split("a.com", 1)[1] or "/"
            assert got[url] == ref_blocked(path, self.RULES), url

    def test_allow_wins_equal_length_tie(self, spark):
        got = self._decide(
            spark, ["https://a.com/p/x"], [(False, "/p/"), (True, "/p/")]
        )
        assert got["https://a.com/p/x"] is False

    def test_root_disallow_blocks_everything(self, spark):
        got = self._decide(
            spark,
            ["https://a.com/", "https://a.com/any/where?x=1"],
            [(False, "/")],
        )
        assert all(got.values())

    def test_corpus_never_shuffles_or_explodes(self, spark):
        rules_df = spark.createDataFrame(
            [("a.com", 0, False, "/tmp/")], robots.RULE_SCHEMA
        )
        urls_df = spark.createDataFrame([("https://a.com/x",)], "url string")
        plan = (
            robots.robots_blocked(urls_df, rules_df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "Generate" not in plan  # no explode of the URL side
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


class TestCallerColumns:
    def test_caller_host_column_survives(self, spark):
        # the rule table's join column rides a private alias — a caller's
        # own 'host' column must come through the policy join untouched
        rules_df = spark.createDataFrame(
            [("a.com", 0, False, "/tmp/")], robots.RULE_SCHEMA
        )
        urls_df = spark.createDataFrame(
            [("https://a.com/tmp/x", "keep-me")], "url string, host string"
        )
        out = robots.robots_blocked(urls_df, rules_df).collect()
        assert out[0].host == "keep-me"
        assert out[0].robots_blocked is True
