"""Host link graph + PageRank (operators/linkgraph.py): edge
extraction from anchor tags, and a pure-python PageRank differential
across graph shapes (chain with a dangling tail, star, cycle,
disconnected component)."""

import pytest
from pyspark.sql import functions as F

from sciencebeam_trainer_grobid_tools_spark.operators import linkgraph
from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session


@pytest.fixture(scope="module")
def spark():
    session = build_session("linkgraph-tests", cpus=4, shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def ref_pagerank(edges, iters, d=0.85, dangling="drop"):
    edges = sorted({(s, t) for s, t in edges if s != t})
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        nr = {v: (1 - d) / n for v in nodes}
        dsum = sum(r[v] for v in nodes if v not in out)
        for s, t in edges:
            nr[t] += d * r[s] / out[s]
        if dangling == "redistribute":
            for v in nodes:
                nr[v] += d * dsum / n
        r = nr
    return r


def _spark_pr(spark, edges, iters, **kw):
    df = spark.createDataFrame(list(edges), "src string, dst string")
    got = linkgraph.pagerank(df, iters=iters, **kw).collect()
    return {r.host: r.rank for r in got}


def _close(a, b):
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, (k, a[k], b[k])


class TestHostEdges:
    def test_extraction_relative_fragment_self(self, spark):
        pages = _pages(
            spark,
            [
                (
                    "https://a.com/page",
                    '<a href="https://b.com/x">B</a>'
                    '<a href="/relative/only">rel</a>'  # -> own host, drops
                    '<a href="https://a.com/other">self</a>'  # self-loop drops
                    '<a href="https://c.com/y#frag">C</a>',  # fragment stripped
                ),
                ("not a url", '<a href="https://b.com/z">B</a>'),  # '' src drops
                ("https://d.com/", "no links here"),
            ],
        )
        got = sorted(
            (r.src, r.dst) for r in linkgraph.host_edges(pages).collect()
        )
        assert got == [("a.com", "b.com"), ("a.com", "c.com")]

    def test_distinct_edges(self, spark):
        pages = _pages(
            spark,
            [
                ("https://a.com/1", '<a href="https://b.com/x">'),
                ("https://a.com/2", '<a href="https://b.com/y">'),
            ],
        )
        assert linkgraph.host_edges(pages).count() == 1

    def test_no_python_no_cartesian(self, spark):
        pages = _pages(spark, [("https://a.com/", '<a href="https://b.com/">')])
        plan = (
            linkgraph.host_edges(pages)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
        assert "CartesianProduct" not in plan


GRAPHS = {
    "chain_dangling": [("a", "b"), ("b", "c")],  # c dangles
    "star": [("hub", "s1"), ("hub", "s2"), ("hub", "s3"), ("s1", "hub")],
    "cycle": [("a", "b"), ("b", "c"), ("c", "a")],
    "disconnected": [("a", "b"), ("x", "y"), ("y", "x")],
}


class TestPagerank:
    @pytest.mark.parametrize("name", sorted(GRAPHS))
    def test_matches_python_reference(self, spark, name):
        edges = GRAPHS[name]
        _close(
            _spark_pr(spark, edges, iters=4, persist_each=False),
            ref_pagerank(edges, iters=4),
        )

    def test_persist_each_mode_agrees(self, spark):
        edges = GRAPHS["star"]
        _close(
            _spark_pr(spark, edges, iters=3, persist_each=True),
            _spark_pr(spark, edges, iters=3, persist_each=False),
        )

    def test_no_inlink_node_gets_teleport_only(self, spark):
        got = _spark_pr(spark, [("a", "b")], iters=5, persist_each=False)
        assert abs(got["a"] - 0.15 / 2) < 1e-12

    def test_dangling_mass_leaves_the_system(self, spark):
        got = _spark_pr(spark, GRAPHS["chain_dangling"], iters=3, persist_each=False)
        assert sum(got.values()) < 1.0  # documented convention

    def test_duplicate_and_self_edges_ignored(self, spark):
        noisy = [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")]
        _close(
            _spark_pr(spark, noisy, iters=3, persist_each=False),
            ref_pagerank([("a", "b"), ("b", "c")], iters=3),
        )

    def test_invalid_iters(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            linkgraph.pagerank(df, iters=0)

    def test_lazy_mode_plan_has_no_python(self, spark):
        df = spark.createDataFrame(GRAPHS["cycle"], "src string, dst string")
        plan = (
            linkgraph.pagerank(df, iters=2, persist_each=False)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


class TestCrawlPolicy:
    def test_nofollow_links_excluded(self, spark):
        html = (
            '<a href="https://ok.com/x">ok</a>'
            '<a rel="nofollow" href="https://paid.com/y">ad</a>'
            '<a href="https://also.com/z" rel="ugc nofollow">ugc</a>'
        )
        df = spark.createDataFrame([(html,)], "html string")
        all_links = df.select(
            F.explode(linkgraph.extract_outlinks(F.col("html"))).alias("l")
        ).collect()
        followed = df.select(
            F.explode(
                linkgraph.extract_outlinks(F.col("html"), skip_nofollow=True)
            ).alias("l")
        ).collect()
        assert len(all_links) == 3
        assert [r.l for r in followed] == ["https://ok.com/x"]

    def test_meta_robots_noindex_flag(self, spark):
        cases = [
            ('<meta name="robots" content="noindex, nofollow">', True),
            ('<META NAME="robots" CONTENT="NOINDEX">', True),
            ('<meta name="robots" content="index, follow">', False),
            ('<meta name="viewport" content="noindex">', False),
            ("no meta at all", False),
        ]
        df = spark.createDataFrame(
            [(i, h) for i, (h, _) in enumerate(cases)], "i long, html string"
        )
        got = {
            r.i: r.f
            for r in df.select(
                "i", linkgraph.meta_robots_noindex(F.col("html")).alias("f")
            ).collect()
        }
        assert got == {i: exp for i, (_, exp) in enumerate(cases)}

    def test_nofollow_path_stays_codegen(self, spark):
        df = spark.createDataFrame([("<a href=\"https://a.com/\">",)], "html string")
        plan = (
            df.select(
                linkgraph.extract_outlinks(F.col("html"), skip_nofollow=True)
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


class TestSitemaps:
    def test_loc_extraction_and_index_routing(self, spark):
        urlset = (
            '<?xml version="1.0"?><urlset>'
            "<url><loc> https://a.com/1 </loc></url>"
            "<url><loc>https://a.com/2</loc></url></urlset>"
        )
        index = (
            "<sitemapindex><sitemap><loc>https://a.com/sitemap1.xml</loc>"
            "</sitemap></sitemapindex>"
        )
        df = spark.createDataFrame(
            [(0, urlset), (1, index)], "i long, xml string"
        )
        got = {
            r.i: (r.locs, r.idx)
            for r in df.select(
                "i",
                linkgraph.sitemap_locs(F.col("xml")).alias("locs"),
                linkgraph.is_sitemap_index(F.col("xml")).alias("idx"),
            ).collect()
        }
        assert got[0] == (["https://a.com/1", "https://a.com/2"], False)
        assert got[1] == (["https://a.com/sitemap1.xml"], True)

    def test_sitemap_ops_pure_codegen(self, spark):
        df = spark.createDataFrame([("<urlset/>",)], "xml string")
        plan = (
            df.select(linkgraph.sitemap_locs(F.col("xml")))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


class TestPersistLifecycle:
    def test_persist_each_releases_support_caches(self, spark):
        jsc = spark.sparkContext._jsc
        base = jsc.getPersistentRDDs().size()
        ranks = linkgraph.pagerank(
            spark.createDataFrame(GRAPHS["star"], "src string, dst string"),
            iters=2,
            persist_each=True,
        )
        # only the returned (caller-owned) ranks table remains cached;
        # the degree-weighted edge list and node spine released in-op
        assert jsc.getPersistentRDDs().size() == base + 1
        ranks.unpersist()
        assert jsc.getPersistentRDDs().size() == base


class TestAdversarialMarkup:
    CASES = [
        '<A HREF="https://up.com/x">caps</A>',
        "<a href='https://single.com/x'>single-quoted</a>",
        "<a href=https://bare.com/x>unquoted</a>",
        '<a HREF = "https://spaced.com/x" >spaced</a>',
    ]

    def test_case_and_quote_variants_extract(self, spark):
        df = spark.createDataFrame([( "".join(self.CASES),)], "html string")
        got = df.select(
            linkgraph.extract_outlinks(F.col("html")).alias("l")
        ).collect()[0].l
        assert got == [
            "https://up.com/x",
            "https://single.com/x",
            "https://bare.com/x",
            "https://spaced.com/x",
        ]

    def test_unquoted_fragment_strips(self, spark):
        df = spark.createDataFrame(
            [("<a href=https://a.com/p#frag>x</a>",)], "html string"
        )
        got = df.select(
            linkgraph.extract_outlinks(F.col("html")).alias("l")
        ).collect()[0].l
        assert got == ["https://a.com/p"]

    def test_nofollow_any_case_and_quoting(self, spark):
        html = (
            '<a href="https://ok.com/x">ok</a>'
            "<A HREF='https://paid.com/y' REL='NOFOLLOW'>ad</A>"
            "<a href=https://ugc.com/z rel=nofollow>ugc</a>"
            '<a href="https://mixed.com/w" Rel="UGC NoFollow">m</a>'
        )
        df = spark.createDataFrame([(html,)], "html string")
        followed = df.select(
            linkgraph.extract_outlinks(F.col("html"), skip_nofollow=True).alias("l")
        ).collect()[0].l
        assert followed == ["https://ok.com/x"]

    def test_meta_robots_order_case_quoting(self, spark):
        cases = [
            ('<meta content="noindex" name="robots">', True),   # reversed order
            ("<META NAME='robots' CONTENT='NOINDEX,nofollow'>", True),
            ("<meta name=robots content=noindex>", True),
            ("<meta name=robotsy content=noindex>", False),     # name must be robots
            ('<meta name="robots" content="all">', False),
        ]
        df = spark.createDataFrame(
            [(i, h) for i, (h, _) in enumerate(cases)], "i long, html string"
        )
        got = {
            r.i: r.f
            for r in df.select(
                "i", linkgraph.meta_robots_noindex(F.col("html")).alias("f")
            ).collect()
        }
        assert got == {i: exp for i, (_, exp) in enumerate(cases)}

    def test_adversarial_paths_stay_codegen(self, spark):
        df = spark.createDataFrame([("<a href=https://a.com/>",)], "html string")
        for col in (
            linkgraph.extract_outlinks(F.col("html")),
            linkgraph.extract_outlinks(F.col("html"), skip_nofollow=True),
            linkgraph.meta_robots_noindex(F.col("html")),
        ):
            plan = (
                df.select(col.alias("c"))
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


class TestDanglingRedistribution:
    @pytest.mark.parametrize("name", sorted(GRAPHS))
    def test_matches_python_reference(self, spark, name):
        edges = GRAPHS[name]
        _close(
            _spark_pr(
                spark, edges, iters=4, persist_each=False,
                dangling="redistribute",
            ),
            ref_pagerank(edges, iters=4, dangling="redistribute"),
        )

    def test_total_rank_is_conserved(self, spark):
        got = _spark_pr(
            spark, GRAPHS["chain_dangling"], iters=5, persist_each=False,
            dangling="redistribute",
        )
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_persist_mode_agrees_and_releases_caches(self, spark):
        jsc = spark.sparkContext._jsc
        base = jsc.getPersistentRDDs().size()
        edges = GRAPHS["chain_dangling"]
        lazy = _spark_pr(
            spark, edges, iters=3, persist_each=False, dangling="redistribute"
        )
        df = spark.createDataFrame(list(edges), "src string, dst string")
        ranks = linkgraph.pagerank(
            df, iters=3, persist_each=True, dangling="redistribute"
        )
        _close({r.host: r.rank for r in ranks.collect()}, lazy)
        assert jsc.getPersistentRDDs().size() == base + 1
        ranks.unpersist()
        assert jsc.getPersistentRDDs().size() == base

    def test_no_dangling_nodes_means_no_change(self, spark):
        edges = GRAPHS["cycle"]
        _close(
            _spark_pr(spark, edges, iters=3, persist_each=False,
                      dangling="redistribute"),
            _spark_pr(spark, edges, iters=3, persist_each=False),
        )

    def test_invalid_dangling_mode(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            linkgraph.pagerank(df, dangling="teleport")


class TestAnchorText:
    def test_extract_anchors_href_and_visible_text(self, spark):
        from sciencebeam_trainer_grobid_tools_spark.operators.linkgraph import (
            extract_anchors,
        )

        html = (
            '<a href="https://a.com/x#frag"><b>Bold</b>  link</a> '
            "<A HREF='https://b.com/y'>B&nbsp;</A> "
            "<a href=https://c.com/z>plain</a> "
            "<a name=noref>no href</a>"
        )
        df = _pages(spark, [("https://s.com/p", html)])
        rows = (
            df.select(F.explode(extract_anchors(F.col("html"))).alias("a"))
            .select("a.href", "a.text")
            .collect()
        )
        got = [(r["href"], r["text"]) for r in rows]
        assert got == [
            ("https://a.com/x", "Bold link"),
            ("https://b.com/y", "B&nbsp;"),
            ("https://c.com/z", "plain"),
        ]

    def test_skip_nofollow_tests_opening_tag_only(self, spark):
        from sciencebeam_trainer_grobid_tools_spark.operators.linkgraph import (
            extract_anchors,
        )

        html = (
            "<a href='https://a.com/' rel='nofollow'>drop me</a>"
            '<a href="https://b.com/">mentions nofollow in text</a>'
        )
        df = _pages(spark, [("https://s.com/p", html)])
        rows = (
            df.select(
                F.explode(
                    extract_anchors(F.col("html"), skip_nofollow=True)
                ).alias("a")
            )
            .select("a.href")
            .collect()
        )
        assert [r["href"] for r in rows] == ["https://b.com/"]

    def test_anchor_text_table_aggregates_and_attributes_relative(
        self, spark
    ):
        from sciencebeam_trainer_grobid_tools_spark.operators.linkgraph import (
            anchor_text_table,
        )

        rows = [
            (
                "https://s.com/1",
                '<a href="https://T.com/a">News</a>'
                '<a href="/local">About Us</a>',
            ),
            ("https://s.com/2", '<a href="https://t.com/b">news  </a>'),
        ]
        got = {
            (r["dst_host"], r["anchor_text"]): r["n"]
            for r in anchor_text_table(_pages(spark, rows)).collect()
        }
        # cross-page aggregation case-folds text AND host; the relative
        # link attributes to the page's own host
        assert got == {
            ("t.com", "news"): 2,
            ("s.com", "about us"): 1,
        }

    def test_anchor_text_table_pure_codegen(self, spark):
        from sciencebeam_trainer_grobid_tools_spark.operators.linkgraph import (
            anchor_text_table,
        )

        plan = (
            anchor_text_table(_pages(spark, [("https://s.com/p", "<a href=x>t</a>")]))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


class _RefAnchorParser:
    """DOM-honest reference extractor (html.parser): browsers' anchor
    semantics — a new ``<a>`` implicitly closes an open one (anchors
    cannot nest), an anchor left open at EOF still yields its text, and
    markup inside comments or ``<script>`` CDATA is NOT markup.  Used
    only to BOUND the divergence of the codegen regex fast path
    (operators/linkgraph.py extract_anchors) on malformed real-web
    markup — the honest DOM-block parser for content extraction lives
    in operators/domblocks.py."""

    def __init__(self):
        from html.parser import HTMLParser

        outer = self

        class _P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                if tag == "a":
                    outer._flush()
                    href = dict(attrs).get("href")
                    if href:
                        outer._href = href.split("#")[0]
                        outer._buf = []

            def handle_endtag(self, tag):
                if tag == "a":
                    outer._flush()

            def handle_data(self, data):
                if outer._href is not None:
                    outer._buf.append(data)

        self._p = _P(convert_charrefs=True)
        self._href = None
        self._buf = []
        self.out = []

    def _flush(self):
        if self._href is not None and self._href:
            self.out.append((self._href, " ".join("".join(self._buf).split())))
        self._href = None
        self._buf = []

    def parse(self, html):
        self._p.feed(html)
        self._p.close()
        self._flush()
        return self.out


def _regex_anchors(spark, html):
    row = spark.createDataFrame([(html,)], "html string").select(
        linkgraph.extract_anchors(F.col("html")).alias("a")
    ).first()
    return [(s["href"], s["text"]) for s in row["a"]]


class TestAnchorRegexVsDomDivergence:
    """Bounds the documented regex-vs-DOM approximation with exact
    per-page expectations: where the codegen fast path agrees with the
    DOM reference, where it diverges, and HOW.  The committed
    divergence inventory on adversarial markup:

    - nested anchors: regex merges inner text into the outer link and
      LOSES the inner href (1 link instead of 2);
    - unclosed anchors: regex loses the link entirely (needs ``</a>``);
    - anchors inside comments / script text: regex reports them
      (false positives the DOM never sees);
    - ``>`` inside an attribute value: href survives, anchor text is
      corrupted with the attribute tail;
    - inline markup INSIDE an anchor: the regex path strips tags to a
      space, so ``Re<span>la</span>tive`` reads "Re la tive" where the
      DOM reads "Relative" (word-boundary noise, not content loss).

    Well-formed pages without inline anchor markup (the overwhelming
    mass of a real crawl) agree exactly — pinned first.  Aggregate over
    the 8-page adversarial corpus: the regex path finds 8 (href, text)
    pairs, the DOM 8, with 4 agreeing exactly — asserted exactly so any
    drift in either path surfaces here."""

    WELL_FORMED = (
        '<p><a href="http://x.com/1">One</a> and '
        "<A HREF='http://y.com/2#frag'>Two</A> and "
        '<a href="/rel">Relative</a></p>'
    )

    def _both(self, spark, html):
        return _regex_anchors(spark, html), _RefAnchorParser().parse(html)

    def test_well_formed_agrees_exactly(self, spark):
        got, ref = self._both(spark, self.WELL_FORMED)
        assert got == ref == [
            ("http://x.com/1", "One"),
            ("http://y.com/2", "Two"),
            ("/rel", "Relative"),
        ]

    def test_nested_anchor_divergence(self, spark):
        html = '<a href="/a">outer <a href="/b">inner</a> tail</a>'
        got, ref = self._both(spark, html)
        assert ref == [("/a", "outer"), ("/b", "inner")]
        assert got == [("/a", "outer inner")]  # inner href lost, texts merged

    def test_unclosed_anchor_divergence(self, spark):
        html = '<div><a href="/c">text without close <p>more</div>'
        got, ref = self._both(spark, html)
        assert ref == [("/c", "text without close more")]
        assert got == []  # regex requires the closing tag

    def test_anchor_in_comment_divergence(self, spark):
        html = '<!-- <a href="/dead">gone</a> --><a href="/live">ok</a>'
        got, ref = self._both(spark, html)
        assert ref == [("/live", "ok")]
        assert got == [("/dead", "gone"), ("/live", "ok")]  # false positive

    def test_anchor_in_script_divergence(self, spark):
        html = "<script>var s = '<a href=\"/js\">x</a>';</script>"
        got, ref = self._both(spark, html)
        assert ref == []
        assert got == [("/js", "x")]  # false positive: script text is CDATA

    def test_gt_inside_attribute_divergence(self, spark):
        html = '<a href="/d" title="a > b">D</a>'
        got, ref = self._both(spark, html)
        assert ref == [("/d", "D")]
        assert [h for h, _ in got] == ["/d"]  # href survives
        assert got[0][1] != "D"  # text corrupted by the attribute tail

    def test_inline_markup_whitespace_divergence(self, spark):
        html = '<a href="/rel">Re<span>la</span>tive</a>'
        got, ref = self._both(spark, html)
        assert ref == [("/rel", "Relative")]
        assert got == [("/rel", "Re la tive")]  # tags strip to spaces

    def test_aggregate_divergence_bound(self, spark):
        pages = [
            self.WELL_FORMED,
            '<a href="/a">outer <a href="/b">inner</a> tail</a>',
            '<div><a href="/c">text without close <p>more</div>',
            '<!-- <a href="/dead">gone</a> -->',
            "<script>var s = '<a href=\"/js\">x</a>';</script>",
            '<a href="/d" title="a > b">D</a>',
            "<p>no links at all</p>",
            '<a href="/ok">fine</a>',
        ]
        got = [p for h in pages for p in _regex_anchors(spark, h)]
        ref = [p for h in pages for p in _RefAnchorParser().parse(h)]
        agree = set(got) & set(ref)
        assert len(got) == 8 and len(ref) == 8 and len(agree) == 4
