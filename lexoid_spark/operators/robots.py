"""robots.txt (RFC 9309 Robots Exclusion Protocol) — parsed and
enforced relationally, with ZERO Python in the plan.

A crawl pipeline needs per-URL permission checks before fetching; the
reference has no crawler-politeness layer (Lexoid's recursive URL
walk, ``utils.py:425-461``, fetches unconditionally), so this is scale
infrastructure the web tier adds, not behavior parity.

The parse is deliberately *relational*: robots.txt is a line format
whose grouping rule ("consecutive User-agent lines open a group; the
group's rules run until the next User-agent line that follows a
rule") is exactly a lag + running-sum window over (host, line_no) —
no stateful kernel needed, and the whole thing mirrors into the
DuckDB oracle line for line.

Semantics implemented (the RFC core):
  * groups = consecutive ``User-agent`` lines + following
    ``Allow``/``Disallow`` rules;
  * the crawler uses the groups naming it specifically if any exist,
    else the ``*`` groups;
  * decision per URL path = longest-prefix-matching rule wins;
    ``Allow`` wins length ties; no matching rule → allowed;
  * empty ``Disallow:`` is a no-op (allow-all), comments (#) and
    unknown fields ignored. Wildcards/$ anchors are out of scope
    (documented subset — literal path prefixes only).

Scale shape: parsing windows partition by host over robots LINES
(bounded by file length, never by corpus size); the URL check is one
equi-join on host (robots tables are tiny per host — broadcastable
when the host set is) followed by a per-URL max(struct) AGGREGATION
over the handful of matching rules (map-side combinable — no per-URL
window sort). Nothing is all-pairs, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grouped_lines(robots: DataFrame, host_col: str, txt_col: str,
                   keys: tuple) -> DataFrame:
    """Shared robots.txt line machinery: split → comment strip →
    key/value extract → the lag/running-sum window that assigns group
    ids (consecutive User-agent lines open a group) → keep ``keys``.
    ONE implementation for both the rule parser and the Crawl-delay
    scheduler, so grouping fixes land everywhere.

    Group boundaries are computed over ALL directive lines (any
    ``key: value`` line), not just the requested ``keys``: per RFC
    9309 ANY rule line closes a user-agent run, so a directive the
    caller doesn't care about (e.g. ``Disallow`` when extracting
    Crawl-delay) must still split two UA lines into two groups —
    filtering first would merge ``User-agent: a / Disallow: /x /
    User-agent: b`` into one group and leak b's delay onto a."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "line"),
    ).withColumn(
        "clean", F.trim(F.regexp_replace("line", "#.*", ""))
    ).withColumn(
        "key",
        F.lower(F.regexp_extract("clean", r"^([A-Za-z-]+)\s*:", 1)),
    ).withColumn(
        "value", F.trim(F.regexp_extract("clean", r"^[A-Za-z-]+\s*:(.*)$", 1))
    ).filter(F.length("key") > 0)  # every directive line closes groups

    w = Window.partitionBy("host").orderBy("pos")
    return (
        lines.withColumn("is_ua", F.col("key") == "user-agent")
        .withColumn(
            "prev_ua", F.coalesce(F.lag("is_ua").over(w), F.lit(False))
        )
        .withColumn("gstart", F.col("is_ua") & ~F.col("prev_ua"))
        .withColumn(
            "gid",
            F.sum(F.col("gstart").cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("gid") > 0)  # rules before any UA line: ignored
        .filter(F.col("key").isin(*keys))
    )


def parse_robots(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """robots.txt text per host → one row per (host, group, agent-set,
    rule): ``(host, gid, agents, rule_type, path)``. Groups with no
    rules emit a single ``(rule_type=NULL)`` row so allow-all groups
    still exist for agent selection."""
    grouped = _grouped_lines(robots, host_col, txt_col,
                             ("user-agent", "allow", "disallow"))
    agents = (
        grouped.filter("is_ua")
        .groupBy("host", "gid")
        .agg(F.array_sort(F.collect_set(F.lower("value"))).alias("agents"))
    )
    rules = grouped.filter(
        ~F.col("is_ua") & (F.length("value") > 0)
    ).select("host", "gid", F.col("key").alias("rule_type"),
             F.col("value").alias("path"))
    return (
        agents.join(rules, ["host", "gid"], "left")
        .select("host", "gid", "agents", "rule_type", "path")
    )


def crawl_allowed(urls: DataFrame, robots: DataFrame,
                  agent: str = "lexoidbot",
                  url_col: str = "url",
                  broadcast_rules: bool | None = None) -> DataFrame:
    """Per-URL RFC 9309 decision for ``agent``: returns
    ``(url, host, path, allowed, matched_rule, matched_type)``.

    Group selection: specific-agent groups if the host has any, else
    ``*`` groups; decision: longest matching path prefix, Allow wins
    ties, no match → allowed. A host with no robots row allows all.

    ``broadcast_rules``: the rules table is one row per (host, rule)
    — corpus-UNBOUNDED in the host count, so a forced broadcast of a
    web-scale host set would blow the broadcast limit. ``None``
    (default) broadcasts only when the robots INPUT row count (an
    upper bound on hosts, known before the wide parse) is under 100k
    rows — one cheap control-plane count against the narrow source;
    past that the join falls back to a plain shuffle on host (AQE may
    still re-plan it). Pass True/False to force either way.
    """
    agent = agent.lower()
    u = urls.select(
        F.col(url_col).alias("url"),
        F.lower(F.regexp_extract(url_col, r"^[a-zA-Z]+://([^/]+)", 1))
        .alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(url_col, r"^[a-zA-Z]+://[^/]+(/.*)$", 1),
                     F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    parsed = parse_robots(robots)
    gsel = parsed.withColumn(
        "specific", F.array_contains("agents", agent)
    ).withColumn("wild", F.array_contains("agents", "*"))
    host_has_specific = gsel.groupBy("host").agg(
        F.max(F.col("specific").cast("int")).alias("has_spec")
    )
    applicable = (
        gsel.join(host_has_specific, "host")
        .filter(
            (F.col("has_spec") == 1) & F.col("specific")
            | (F.col("has_spec") == 0) & F.col("wild")
        )
        .filter(F.col("rule_type").isNotNull())
        .select("host", "rule_type", "path")
    )
    if broadcast_rules is None:
        # gate on the PARSED rule-row count, not the robots input row
        # count: the broadcast side is one row per (host, rule), which
        # is unbounded per host — 100k robots files with huge rule
        # sets would blow the broadcast limit if gated on hosts alone
        broadcast_rules = applicable.limit(1_000_001).count() <= 1_000_000
    rules_side = applicable.withColumnRenamed("path", "rule_path")
    if broadcast_rules:
        rules_side = F.broadcast(rules_side)
    cand = u.join(rules_side, "host").filter(
        F.col("path").startswith(F.col("rule_path"))
    )
    # top-1 as an AGGREGATION, not a window: max(struct) compares
    # (length, allow-beats-disallow, path) lexicographically, partially
    # aggregates map-side, and never sorts a per-URL partition — the
    # RFC's longest-match decision as a combinable reduce.
    best = cand.groupBy("url").agg(
        F.max(
            F.struct(
                F.length("rule_path").alias("l"),
                (F.col("rule_type") == "allow").alias("a"),
                F.col("rule_path").alias("p"),
                F.col("rule_type").alias("t"),
            )
        ).alias("b")
    )
    return u.join(best, "url", "left").select(
        "url", "host", "path",
        F.coalesce(F.col("b.a"), F.lit(True)).alias("allowed"),
        F.col("b.p").alias("matched_rule"),
        F.col("b.t").alias("matched_type"),
    )


def parse_sitemap(sitemaps: DataFrame, host_col: str = "host",
                  xml_col: str = "sitemap_xml") -> DataFrame:
    """sitemap.xml → one row per ``<url>`` entry: ``(host, url,
    lastmod)`` (lastmod NULL when absent). The crawl-discovery
    companion to :func:`crawl_allowed`.

    Native parse, no XML library in the plan: the document splits on
    ``</url>`` block closers (a higher-order transform over the split
    array), and each block yields its ``<loc>`` / ``<lastmod>`` by
    anchored regexp — the regexes are Java/RE2-portable so a SQL
    oracle mirrors the parse exactly. Zero shuffle: split + transform
    + filter + posexplode of per-row blocks only.

    Subset by design: ``<sitemapindex>`` nesting is the caller's loop
    (fetch the child sitemaps, re-apply); CDATA and entity escapes
    beyond ``&amp;`` are out of scope.
    """
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(xml_col), "</url>")).alias("block"),
    )
    loc = F.regexp_extract("block", r"<loc>\s*([^<]+?)\s*</loc>", 1)
    lastmod = F.regexp_extract(
        "block", r"<lastmod>\s*([^<]+?)\s*</lastmod>", 1
    )
    return (
        blocks.select(
            "host",
            F.regexp_replace(loc, "&amp;", "&").alias("url"),
            F.nullif(lastmod, F.lit("")).alias("lastmod"),
        )
        .filter(F.length("url") > 0)
    )


def parse_sitemap_bytes(sitemaps: DataFrame, host_col: str = "host",
                        bytes_col: str = "sitemap_blob") -> DataFrame:
    """Byte-level twin of :func:`parse_sitemap` for fetched sitemap
    payloads AS STORED: ``sitemap.xml.gz`` members (the layout the
    sitemaps protocol prescribes for large sites, and what Common
    Crawl actually serves) gunzip first — concatenated members
    allowed, zip-bomb capped via the WARC kernel's bounded inflater —
    then decode UTF-8 (BOM tolerated) and parse with the same
    zero-shuffle block splitter. Malformed gzip yields an empty
    parse for that row (discovery is best-effort; the frontier must
    not die on one bad blob)."""
    import pandas as pd

    def to_xml(batches):
        from lexoid_spark.kernels.warc import WarcError, _gunzip_members

        for b in batches:
            xs = []
            for blob in b[bytes_col]:
                raw = bytes(blob) if blob is not None else b""
                if raw[:2] == b"\x1f\x8b":
                    try:
                        raw = _gunzip_members(raw)
                    except WarcError:
                        raw = b""
                xs.append(raw.decode("utf-8-sig", errors="replace"))
            yield pd.DataFrame({host_col: b[host_col],
                                "sitemap_xml": xs})

    decoded = sitemaps.select(host_col, bytes_col).mapInPandas(
        to_xml, schema=f"{host_col} string, sitemap_xml string")
    return parse_sitemap(decoded, host_col=host_col)


def sitemap_frontier(sitemaps: DataFrame, robots: DataFrame,
                     agent: str = "lexoidbot") -> DataFrame:
    """Compose discovery with politeness: sitemap URLs that the
    host's robots.txt permits for ``agent`` — the seed frontier a
    crawler may actually fetch. Returns ``(url, host, lastmod)``."""
    found = parse_sitemap(sitemaps)
    # distinct BEFORE the permission join: crawl_allowed returns one
    # row per input row, so a URL listed in multiple sitemaps (or
    # twice in one) would otherwise multiply frontier rows by the join
    decisions = crawl_allowed(
        found.select("url").distinct(), robots, agent=agent)
    return (
        found.join(decisions.filter("allowed").select("url"), "url")
        .select("url", "host", "lastmod")
        .distinct()  # a URL listed twice is still ONE frontier entry
    )


def crawl_schedule(urls: DataFrame, robots: DataFrame,
                   agent: str = "lexoidbot",
                   default_delay_s: int = 1,
                   url_col: str = "url") -> DataFrame:
    """Politeness scheduling: robots.txt ``Crawl-delay`` per host
    (the de-facto extension many crawlers honor; integer seconds,
    specific-agent group wins over ``*``, missing → ``default_delay_s``)
    turned into a deterministic fetch plan — URLs rank within their
    host by ``(md5(url), url)`` and fetch at ``(rank-1) * delay``
    seconds. Exact integer arithmetic; returns
    ``(url, host, delay_s, fetch_rank, offset_s)``.

    Scale note: the rank is one window per host — the biggest host is
    the biggest partition (same caveat as ``unimax_sample``'s exact
    variant); a production frontier shards giant hosts into per-day
    buckets first. The delay table is K-hosts-row and broadcasts.
    """
    agent = agent.lower()
    grouped = _grouped_lines(robots, "host", "robots_txt",
                             ("user-agent", "crawl-delay"))
    agents = grouped.filter("is_ua").groupBy("host", "gid").agg(
        F.collect_set(F.lower("value")).alias("agents"))
    delays = (
        grouped.filter(
            (F.col("key") == "crawl-delay")
            & F.col("value").rlike(r"^\d+$")
        )
        .groupBy("host", "gid")
        .agg(F.min(F.col("value").cast("long")).alias("delay_s"))
    )
    # applicability mirrors crawl_allowed's group selection: if ANY
    # group on the host names this agent, only those groups may set
    # its delay (a specific group WITHOUT a Crawl-delay means the
    # default, not the wildcard group's value); wildcard groups apply
    # only on hosts with no specific group. And a 'User-agent:
    # slowbot' group must never slow other bots.
    gsel = agents.select(
        "host", "gid",
        F.array_contains("agents", agent).alias("specific"),
        F.array_contains("agents", "*").alias("wild"),
    )
    host_has_specific = gsel.groupBy("host").agg(
        F.max(F.col("specific").cast("int")).alias("has_spec"))
    cand = (
        gsel.join(host_has_specific, "host")
        .filter(
            (F.col("has_spec") == 1) & F.col("specific")
            | (F.col("has_spec") == 0) & F.col("wild")
        )
        .join(delays, ["host", "gid"])
        .select("host", "delay_s")
    )
    # several applicable groups with delays: smallest gid's min wins
    # is overkill — take the min delay (deterministic, conservative)
    per_host = cand.groupBy("host").agg(
        F.min("delay_s").alias("delay_s"))
    u = urls.select(
        F.col(url_col).alias("url"),
        F.lower(F.regexp_extract(url_col, r"^[a-zA-Z]+://([^/]+)", 1))
        .alias("host"),
    )
    from lexoid_spark.functions.dedup import _md5_hash64

    ranked = u.withColumn(
        "fetch_rank",
        F.row_number().over(
            Window.partitionBy("host").orderBy(
                F.asc(_md5_hash64(F.col("url"))), F.asc("url"))
        ),
    )
    return (
        ranked.join(F.broadcast(per_host), "host", "left")
        .withColumn(
            "delay_s",
            F.coalesce("delay_s", F.lit(int(default_delay_s))),
        )
        .select(
            "url", "host", "delay_s", "fetch_rank",
            ((F.col("fetch_rank") - 1) * F.col("delay_s"))
            .alias("offset_s"),
        )
    )


def parse_sitemap_index(indexes: DataFrame, host_col: str = "host",
                        xml_col: str = "index_xml") -> DataFrame:
    """``<sitemapindex>`` → one row per child ``<sitemap>``: ``(host,
    sitemap_url, lastmod)`` — the discovery loop's outer level
    (:func:`parse_sitemap` handles the leaves). Same zero-shuffle
    split-on-block-closer + anchored-regexp shape, Java/RE2-portable
    so a SQL oracle mirrors the parse exactly."""
    blocks = indexes.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(xml_col), "</sitemap>")).alias("block"),
    )
    loc = F.regexp_extract("block", r"<loc>\s*([^<]+?)\s*</loc>", 1)
    lastmod = F.regexp_extract(
        "block", r"<lastmod>\s*([^<]+?)\s*</lastmod>", 1
    )
    return (
        blocks.select(
            "host",
            F.regexp_replace(loc, "&amp;", "&").alias("sitemap_url"),
            F.nullif(lastmod, F.lit("")).alias("lastmod"),
        )
        .filter(F.length("sitemap_url") > 0)
    )


def parse_feed(feeds: DataFrame, host_col: str = "host",
               xml_col: str = "feed_xml") -> DataFrame:
    """RSS 2.0 / Atom feed → one row per entry: ``(host, url, title)``
    — the third discovery channel next to sitemaps and in-page links
    (real crawlers poll feeds for freshness). RSS ``<item>`` blocks
    yield ``<link>text</link>``; Atom ``<entry>`` blocks yield
    ``<link ... href="..."/>``. Both run as one split + anchored
    regexp per convention — zero shuffle, Java/RE2-portable."""
    # every field anchors to the entry opener: blocks split on the
    # closer, so the FIRST block still carries the channel/feed
    # preamble (channel <title>, channel <link>, the feed self-link)
    # which must never win the extract
    rss = feeds.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(xml_col), "</item>")).alias("block"),
    ).select(
        "host",
        F.regexp_extract(
            "block", r"(?s)<item[ >].*?<link>\s*([^<]+?)\s*</link>", 1)
        .alias("url"),
        F.regexp_extract(
            "block", r"(?s)<item[ >].*?<title>\s*([^<]*?)\s*</title>", 1)
        .alias("title"),
    )
    atom = feeds.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(xml_col), "</entry>")).alias("block"),
    ).select(
        "host",
        F.regexp_extract(
            "block", r"(?s)<entry[ >].*?<link[^>]*href=\"([^\"]+)\"", 1)
        .alias("url"),
        F.regexp_extract(
            "block", r"(?s)<entry[ >].*?<title>\s*([^<]*?)\s*</title>", 1)
        .alias("title"),
    )
    out = rss.unionByName(atom).filter(F.length("url") > 0)
    return out.select(
        "host",
        F.regexp_replace("url", "&amp;", "&").alias("url"),
        F.nullif("title", F.lit("")).alias("title"),
    )
