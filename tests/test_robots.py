"""robots.txt relational parser + RFC 9309 decision semantics."""

from pyspark.sql import functions as F

ROBOTS_A = """# comment line
User-agent: lexoidbot
Disallow: /private/
Allow: /private/ok/

User-agent: *
Disallow: /
"""

ROBOTS_B = """User-agent: *
User-agent: otherbot
Disallow: /tmp/
Disallow:
Allow: /tmp/keep
"""

ROBOTS_EMPTY_GROUP = """User-agent: *
"""


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


class TestParseRobots:
    def test_groups_and_rules(self, spark):
        from lexoid_spark.operators.robots import parse_robots

        out = parse_robots(_robots(spark, [("a.test", ROBOTS_A)])).collect()
        by_gid = {}
        for r in out:
            by_gid.setdefault(r["gid"], []).append(r)
        assert set(by_gid) == {1, 2}
        g1 = by_gid[1]
        assert g1[0]["agents"] == ["lexoidbot"]
        assert sorted((r["rule_type"], r["path"]) for r in g1) == [
            ("allow", "/private/ok/"), ("disallow", "/private/")]
        g2 = by_gid[2]
        assert g2[0]["agents"] == ["*"]
        assert [(r["rule_type"], r["path"]) for r in g2] == [
            ("disallow", "/")]

    def test_consecutive_ua_lines_one_group(self, spark):
        from lexoid_spark.operators.robots import parse_robots

        out = parse_robots(_robots(spark, [("b.test", ROBOTS_B)])).collect()
        assert {r["gid"] for r in out} == {1}
        assert out[0]["agents"] == ["*", "otherbot"]
        # empty Disallow: dropped; two real rules remain
        assert sorted((r["rule_type"], r["path"]) for r in out) == [
            ("allow", "/tmp/keep"), ("disallow", "/tmp/")]

    def test_ruleless_group_survives(self, spark):
        from lexoid_spark.operators.robots import parse_robots

        out = parse_robots(
            _robots(spark, [("c.test", ROBOTS_EMPTY_GROUP)])).collect()
        assert len(out) == 1
        assert out[0]["agents"] == ["*"] and out[0]["rule_type"] is None


class TestCrawlAllowed:
    def test_longest_match_and_allow_tiebreak(self, spark):
        from lexoid_spark.operators.robots import crawl_allowed

        robots = _robots(spark, [("a.test", ROBOTS_A)])
        urls = _urls(spark, [
            "https://a.test/public/x",        # no match -> allowed
            "https://a.test/private/secret",  # disallow /private/
            "https://a.test/private/ok/y",    # allow (longer prefix)
            "https://b.test/anything",        # no robots row -> allowed
        ])
        got = {r["url"]: r for r in
               crawl_allowed(urls, robots, agent="lexoidbot").collect()}
        assert got["https://a.test/public/x"]["allowed"]
        assert got["https://a.test/public/x"]["matched_rule"] is None
        assert not got["https://a.test/private/secret"]["allowed"]
        assert got["https://a.test/private/secret"]["matched_rule"] == \
            "/private/"
        assert got["https://a.test/private/ok/y"]["allowed"]
        assert got["https://a.test/private/ok/y"]["matched_type"] == "allow"
        assert got["https://b.test/anything"]["allowed"]

    def test_specific_agent_beats_wildcard(self, spark):
        from lexoid_spark.operators.robots import crawl_allowed

        robots = _robots(spark, [("a.test", ROBOTS_A)])
        urls = _urls(spark, ["https://a.test/public/x"])
        # lexoidbot: no matching rule in ITS group -> allowed (the
        # wildcard group's Disallow: / does NOT apply to it)
        assert crawl_allowed(urls, robots,
                             agent="lexoidbot").collect()[0]["allowed"]
        # an unnamed bot falls to the * group -> blocked by Disallow: /
        assert not crawl_allowed(urls, robots,
                                 agent="strangerbot").collect()[0]["allowed"]

    def test_root_path_default(self, spark):
        from lexoid_spark.operators.robots import crawl_allowed

        robots = _robots(spark, [("b.test", ROBOTS_B)])
        got = crawl_allowed(
            _urls(spark, ["https://b.test"]), robots).collect()[0]
        assert got["path"] == "/" and got["allowed"]

    def test_decision_is_aggregation_not_window(self, spark):
        from lexoid_spark.operators.robots import crawl_allowed

        robots = _robots(spark, [("a.test", ROBOTS_A)])
        plan = crawl_allowed(
            _urls(spark, ["https://a.test/x"]), robots
        )._sc._jvm.PythonSQLUtils.explainString(
            crawl_allowed(_urls(spark, ["https://a.test/x"]),
                          robots)._jdf.queryExecution(), "formatted")
        # the per-URL top-1 must be HashAggregate (map-side combinable),
        # never a Window sort over url partitions
        url_windows = [ln for ln in plan.split("\n")
                       if "Window" in ln and "url" in ln]
        assert not url_windows
        assert "CartesianProduct" not in plan


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.test/page1</loc>
    <lastmod>2024-03-01</lastmod>
  </url>
  <url><loc> https://a.test/page2?x=1&amp;y=2 </loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>
"""


class TestSitemap:
    def test_parse_blocks(self, spark):
        from lexoid_spark.operators.robots import parse_sitemap

        df = spark.createDataFrame([("a.test", SITEMAP)],
                                   "host string, sitemap_xml string")
        rows = sorted(parse_sitemap(df).collect(), key=lambda r: r["url"])
        assert len(rows) == 2  # loc-less block dropped
        assert rows[0]["url"] == "https://a.test/page1"
        assert rows[0]["lastmod"] == "2024-03-01"
        # whitespace trimmed, &amp; unescaped, lastmod absent -> NULL
        assert rows[1]["url"] == "https://a.test/page2?x=1&y=2"
        assert rows[1]["lastmod"] is None

    def test_frontier_respects_robots(self, spark):
        from lexoid_spark.operators.robots import sitemap_frontier

        xml = ("<urlset>"
               "<url><loc>https://a.test/private/x</loc></url>"
               "<url><loc>https://a.test/private/ok/y</loc></url>"
               "<url><loc>https://a.test/public/z</loc></url>"
               "</urlset>")
        sitemaps = spark.createDataFrame(
            [("a.test", xml)], "host string, sitemap_xml string")
        robots = _robots(spark, [("a.test", ROBOTS_A)])
        got = {r["url"] for r in
               sitemap_frontier(sitemaps, robots,
                                agent="lexoidbot").collect()}
        assert got == {"https://a.test/private/ok/y",
                       "https://a.test/public/z"}


ROBOTS_DELAY = """User-agent: lexoidbot
Crawl-delay: 2
Disallow: /x

User-agent: *
Crawl-delay: 9
"""


class TestCrawlSchedule:
    def test_specific_delay_wins_and_offsets(self, spark):
        from lexoid_spark.operators.robots import crawl_schedule

        robots = _robots(spark, [("a.test", ROBOTS_DELAY)])
        urls = _urls(spark, [f"https://a.test/p{i}" for i in range(4)]
                     + ["https://nodelaly.test/q"])
        rows = crawl_schedule(urls, robots, agent="lexoidbot",
                              default_delay_s=1).collect()
        a = sorted((r for r in rows if r["host"] == "a.test"),
                   key=lambda r: r["fetch_rank"])
        # specific group's 2s wins over wildcard 9s
        assert all(r["delay_s"] == 2 for r in a)
        assert [r["offset_s"] for r in a] == [0, 2, 4, 6]
        # ranks deterministic: re-run produces identical order
        again = crawl_schedule(urls, robots, agent="lexoidbot",
                               default_delay_s=1).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
        # host without robots -> default delay
        other = [r for r in rows if r["host"] == "nodelaly.test"][0]
        assert other["delay_s"] == 1 and other["offset_s"] == 0

    def test_wildcard_fallback(self, spark):
        from lexoid_spark.operators.robots import crawl_schedule

        robots = _robots(spark, [("a.test", ROBOTS_DELAY)])
        r = crawl_schedule(_urls(spark, ["https://a.test/z"]),
                           robots, agent="otherbot").collect()[0]
        assert r["delay_s"] == 9

    def test_foreign_agent_group_never_applies(self, spark):
        from lexoid_spark.operators.robots import crawl_schedule

        # a group naming only ANOTHER bot must not set our delay
        robots = _robots(spark, [
            ("x.test", "User-agent: slowbot\nCrawl-delay: 60\n"),
            ("y.test", "User-agent: *\nCrawl-delay: 3\n\n"
                       "User-agent: slowbot\nCrawl-delay: 60\n"),
        ])
        rows = {r["host"]: r for r in crawl_schedule(
            _urls(spark, ["https://x.test/a", "https://y.test/b"]),
            robots, agent="lexoidbot", default_delay_s=1).collect()}
        assert rows["x.test"]["delay_s"] == 1   # default, not 60
        assert rows["y.test"]["delay_s"] == 3   # wildcard, not 60


class TestGroupClosingDirectives:
    """RFC 9309: ANY rule line closes a user-agent run — including
    directives the extraction isn't asking for. Regression pins for
    the filter-before-window bug (lines outside ``keys`` dropped
    before grouping, merging two UA runs into one group)."""

    def test_unrequested_directive_still_closes_delay_group(self, spark):
        from lexoid_spark.operators.robots import crawl_schedule

        # Disallow (not a schedule key) separates the two UA lines:
        # lexoidbot and slowbot are DIFFERENT groups, so slowbot's
        # delay must not leak onto lexoidbot
        robots = _robots(spark, [
            ("a.test", "User-agent: lexoidbot\nDisallow: /a\n"
                       "User-agent: slowbot\nCrawl-delay: 60\n"),
        ])
        r = crawl_schedule(_urls(spark, ["https://a.test/x"]),
                           robots, agent="lexoidbot",
                           default_delay_s=1).collect()[0]
        assert r["delay_s"] == 1

    def test_unrequested_directive_still_closes_rule_group(self, spark):
        from lexoid_spark.operators.robots import crawl_allowed

        # Crawl-delay (not a parse_robots key) separates alpha's and
        # beta's groups: alpha must NOT inherit beta's Disallow
        robots = _robots(spark, [
            ("a.test", "User-agent: alphabot\nCrawl-delay: 5\n"
                       "User-agent: betabot\nDisallow: /b\n"),
        ])
        got = crawl_allowed(_urls(spark, ["https://a.test/b/x"]),
                            robots, agent="alphabot").collect()[0]
        assert got["allowed"] and got["matched_rule"] is None
        beta = crawl_allowed(_urls(spark, ["https://a.test/b/x"]),
                             robots, agent="betabot").collect()[0]
        assert not beta["allowed"]

    def test_specific_group_without_delay_blocks_wildcard(self, spark):
        from lexoid_spark.operators.robots import crawl_schedule

        # host HAS a lexoidbot group (no Crawl-delay) -> wildcard
        # group's delay must be ignored for lexoidbot (mirrors
        # crawl_allowed's has_spec selection): default applies
        robots = _robots(spark, [
            ("a.test", "User-agent: lexoidbot\nDisallow: /x\n\n"
                       "User-agent: *\nCrawl-delay: 9\n"),
        ])
        r = crawl_schedule(_urls(spark, ["https://a.test/z"]),
                           robots, agent="lexoidbot",
                           default_delay_s=1).collect()[0]
        assert r["delay_s"] == 1

    def test_duplicate_sitemap_listing_one_frontier_row(self, spark):
        from lexoid_spark.operators.robots import sitemap_frontier

        xml = ("<urlset>"
               "<url><loc>https://a.test/p</loc></url>"
               "<url><loc>https://a.test/p</loc></url>"
               "</urlset>")
        sitemaps = spark.createDataFrame(
            [("a.test", xml), ("a.test", xml)],
            "host string, sitemap_xml string")
        robots = _robots(spark, [("a.test", ROBOTS_A)])
        rows = sitemap_frontier(sitemaps, robots,
                                agent="lexoidbot").collect()
        assert len(rows) == 1 and rows[0]["url"] == "https://a.test/p"


class TestParseSitemapBytes:
    """Byte-level sitemap ingestion: .xml.gz members gunzip, plain
    XML passes through, malformed gzip yields an empty (not failed)
    parse."""

    def test_gz_plain_and_malformed(self, spark):
        import zlib

        from lexoid_spark.operators.robots import parse_sitemap_bytes

        xml = ("<urlset><url><loc>https://a.example/p1</loc>"
               "<lastmod>2024-02-03</lastmod></url>"
               "<url><loc>https://a.example/p2</loc></url></urlset>")
        c = zlib.compressobj(9, zlib.DEFLATED, 31)
        gz = c.compress(xml.encode()) + c.flush()
        rows = [("h-gz", bytearray(gz)),
                ("h-plain", bytearray(xml.encode())),
                ("h-bad", bytearray(b"\x1f\x8b" + b"\x00" * 10))]
        df = spark.createDataFrame(
            rows, "host string, sitemap_blob binary")
        got = parse_sitemap_bytes(df).collect()
        by_host = {}
        for r in got:
            by_host.setdefault(r["host"], []).append(
                (r["url"], r["lastmod"]))
        want = [("https://a.example/p1", "2024-02-03"),
                ("https://a.example/p2", None)]
        assert sorted(by_host["h-gz"]) == want
        assert sorted(by_host["h-plain"]) == want
        assert "h-bad" not in by_host


class TestDiscoveryParsers:
    def test_parse_feed_rss_and_atom(self, spark):
        from lexoid_spark.operators.robots import parse_feed

        # channel title + channel link must NEVER win the per-item
        # extracts (blocks split on the closer, so the first block
        # carries the preamble)
        rss = ("<rss><channel><title>Chan</title>"
               "<link>https://h/</link>"
               "<item><title>A</title><link>https://h/a</link></item>"
               "<item><link>https://h/b</link></item>"
               "</channel></rss>")
        atom = ('<feed><title>F</title>'
                '<link rel="self" href="https://h/feed.xml"/>'
                '<entry><title>C</title>'
                '<link rel="alternate" href="https://h/c"/></entry>'
                "</feed>")
        df = spark.createDataFrame(
            [("h1", rss), ("h2", atom)], "host string, feed_xml string")
        got = {(r["host"], r["url"]): r["title"]
               for r in parse_feed(df).collect()}
        assert got == {("h1", "https://h/a"): "A",
                       ("h1", "https://h/b"): None,
                       ("h2", "https://h/c"): "C"}

    def test_parse_sitemap_index(self, spark):
        from lexoid_spark.operators.robots import parse_sitemap_index

        xml = ("<sitemapindex><sitemap>"
               "<loc>https://h/s1.xml.gz</loc>"
               "<lastmod>2024-01-02</lastmod></sitemap>"
               "<sitemap><loc>https://h/s2.xml.gz?a=1&amp;b=2</loc>"
               "</sitemap></sitemapindex>")
        df = spark.createDataFrame(
            [("h", xml)], "host string, index_xml string")
        got = sorted((r["sitemap_url"], r["lastmod"])
                     for r in parse_sitemap_index(df).collect())
        assert got == [("https://h/s1.xml.gz", "2024-01-02"),
                       ("https://h/s2.xml.gz?a=1&b=2", None)]

    def test_html_head_meta_fields_and_absence(self, spark):
        from lexoid_spark.functions.columns import html_head_meta
        from pyspark.sql import functions as F

        rows = [
            (1, '<html lang="fr"><head>'
                '<link href="https://h/c1" rel="canonical">'
                '<meta name="robots" content="NOINDEX, nofollow">'
                "</head><body/></html>"),
            (2, "<html><head><p>no meta at all</p></head></html>"),
        ]
        df = spark.createDataFrame(rows, "id long, html string")
        m = html_head_meta(F.col("html"))
        got = {r["id"]: r for r in df.select(
            "id", m["canonical"].alias("c"), m["noindex"].alias("n"),
            m["lang"].alias("l"), m["og_title"].alias("t")).collect()}
        assert got[1]["c"] == "https://h/c1"
        assert got[1]["n"] is True and got[1]["l"] == "fr"
        assert got[2]["c"] is None and got[2]["n"] is False
        assert got[2]["t"] is None

    def test_html_jsonld_extract_and_absence(self, spark):
        from pyspark.sql import functions as F

        from lexoid_spark.functions.columns import html_jsonld

        rows = [
            (1, '<html><head><script type="application/ld+json">'
                '{"@type":"Article","headline":"A — B"}'
                "</script></head></html>"),
            (2, "<html><head><script>var x = 1;</script></head></html>"),
        ]
        df = spark.createDataFrame(rows, "id long, html string")
        got = {r["id"]: r["h"] for r in df.select(
            "id", F.get_json_object(html_jsonld(F.col("html")),
                                    "$.headline").alias("h")).collect()}
        assert got[1] == "A — B"
        assert got[2] is None
