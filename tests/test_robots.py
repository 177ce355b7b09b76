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
        # pattern rules emit as written (matching compiles them later);
        # only the empty Disallow (allow-all) drops
        assert got == [
            (0, False, "/tmp/"),
            (1, False, "/account"),
            (2, True, "/tmp/public/"),
            (3, False, "/wild*card"),
            (4, False, "/anchored$"),
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
    """Python reference: RFC 9309 matching incl. *$ pattern rules;
    specificity = pattern length as written (google/robotstxt
    convention), allow wins ties."""
    import re

    best = (-1, True)
    for allow, pat in rules:
        body = pat[:-1] if pat.endswith("$") else pat
        rx = ".*".join(re.escape(part) for part in body.split("*"))
        if pat.endswith("$"):
            rx += "$"
        if re.match(rx, path):
            plen = len(pat)
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


class TestPatternRules:
    WILD_RULES = [
        (False, "/*?"),            # block any path with a query string
        (False, "/*.pdf$"),        # block pdfs, anchored
        (False, "/wild*card"),
        (True, "/downloads/*.pdf$"),  # longer allow beats the pdf block
        (False, "/a"),
        (True, "/a$"),             # exactly /a is allowed ($ outranks /a)
    ]
    PATHS = [
        "/plain",
        "/plain?q=1",              # blocked: /*?
        "/doc/file.pdf",           # blocked: /*.pdf$
        "/doc/file.pdfx",          # allowed: $ anchor must not match
        "/wildANYTHINGcard",       # blocked: /wild*card
        "/wildcard",               # blocked: * matches empty too
        "/downloads/file.pdf",     # allowed: longer allow pattern wins
        "/a",                      # allowed: /a$ (len 3) beats /a (len 2)
        "/ab",                     # blocked: /a matches, /a$ does not
    ]

    def _decide(self, spark, paths, rules, host="a.com"):
        rules_df = spark.createDataFrame(
            [(host, i, a, p) for i, (a, p) in enumerate(rules)],
            robots.RULE_SCHEMA,
        )
        urls = ["https://%s%s" % (host, p) for p in paths]
        urls_df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {
            r.url: r.robots_blocked
            for r in robots.robots_blocked(urls_df, rules_df).collect()
        }
        return {p: got["https://%s%s" % (host, p)] for p in paths}

    def test_wildcards_match_python_reference(self, spark):
        got = self._decide(spark, self.PATHS, self.WILD_RULES)
        for p in self.PATHS:
            assert got[p] == ref_blocked(p, self.WILD_RULES), p

    def test_expected_decisions(self, spark):
        got = self._decide(spark, self.PATHS, self.WILD_RULES)
        assert got == {
            "/plain": False,
            "/plain?q=1": True,
            "/doc/file.pdf": True,
            "/doc/file.pdfx": False,
            "/wildANYTHINGcard": True,
            "/wildcard": True,
            "/downloads/file.pdf": False,
            "/a": False,
            "/ab": True,
        }

    def test_regex_metachars_in_rules_are_literal(self, spark):
        # a rule containing regex metachars must match literally
        rules = [(False, "/x(1)+.y$"), (False, "/q[2]")]
        got = self._decide(
            spark, ["/x(1)+.y", "/x11y", "/q[2]/z", "/q2"], rules
        )
        assert got == {
            "/x(1)+.y": True,
            "/x11y": False,
            "/q[2]/z": True,
            "/q2": False,
        }

    def test_full_file_end_to_end_with_patterns(self, spark):
        rules = robots.parse_robots(
            spark.createDataFrame(
                [("a.com", "User-agent: *\nDisallow: /*?\nAllow: /ok*?")],
                "host string, robots_txt string",
            )
        )
        urls_df = spark.createDataFrame(
            [("https://a.com/x?b=1",), ("https://a.com/okpage?b=1",)],
            "url string",
        )
        got = {
            r.url: r.robots_blocked
            for r in robots.robots_blocked(urls_df, rules).collect()
        }
        assert got["https://a.com/x?b=1"] is True
        assert got["https://a.com/okpage?b=1"] is False
