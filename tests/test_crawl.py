"""Unit coverage of the crawl-stack kernels (crawl.py): robots.txt
group/matching semantics and sitemap parsing — the pure-Python edges
the contract query's planted grid doesn't reach."""

from __future__ import annotations

import gzip

from doclayout_yolo_spark.crawl import (
    MAX_SITEMAP_ENTRIES,
    parse_robots,
    parse_sitemap,
    robots_allowed,
)


def test_robots_group_selection_and_concatenation():
    body = (
        "User-agent: googlebot\nDisallow: /\n\n"
        "User-agent: bingbot\nUser-agent: *\nDisallow: /a/\n\n"
        "User-agent: *\nAllow: /a/b/\n"
    )
    # '*' groups concatenate for the generic agent; the
    # googlebot-only group is ignored for '*'
    assert parse_robots(body) == [("disallow", "/a/"), ("allow", "/a/b/")]
    # RFC 9309 §2.2.1: a specific-agent match means the '*' groups
    # are IGNORED, not concatenated
    assert parse_robots(body, agent="googlebot") == [("disallow", "/")]
    assert parse_robots(body, agent="BingBot") == [("disallow", "/a/")]


def test_robots_lexical_edges():
    # comments, directive case, empty disallow, rules before any
    # group (no applicable agent -> dropped), unknown directives
    body = (
        "Disallow: /orphan/   # no group yet\n"
        "USER-AGENT: *  # everyone\n"
        "DISALLOW: /x/  # comment\n"
        "Crawl-delay: 10\n"
        "Disallow:\n"
        "allow: /x/y/\n"
    )
    assert parse_robots(body) == [("disallow", "/x/"), ("allow", "/x/y/")]
    # unparseable garbage is a total no-rule body
    assert parse_robots("\x00\xff not robots at all") == []


def test_robots_longest_prefix_and_tie():
    rules = [("disallow", "/a/"), ("allow", "/a/b/"), ("allow", "/c/")]
    assert robots_allowed(rules, "/a/x") == (False, "disallow:/a/")
    assert robots_allowed(rules, "/a/b/x") == (True, "allow:/a/b/")
    assert robots_allowed(rules, "/z") == (True, None)
    # equal-length allow vs disallow: allow wins regardless of order
    tie = [("disallow", "/p/"), ("allow", "/q/")]
    assert robots_allowed(tie, "/p/1")[0] is False
    eq = [("disallow", "/ab/"), ("allow", "/ab/")]
    assert robots_allowed(eq, "/ab/x") == (True, "allow:/ab/")
    eq_rev = [("allow", "/ab/"), ("disallow", "/ab/")]
    assert robots_allowed(eq_rev, "/ab/x") == (True, "allow:/ab/")


def test_sitemap_parsing_urlset_index_gzip_and_cap():
    sm = (
        b"<?xml version='1.0'?><urlset>"
        b"<url><loc> https://h/p/1 </loc><lastmod>2026-01-15</lastmod></url>"
        b"<url><loc>https://h/p/2</loc></url>"
        b"<url><lastmod>2026-01-01</lastmod></url>"  # no loc: skipped
        b"</urlset>"
    )
    want = [
        ("url", "https://h/p/1", "2026-01-15"),
        ("url", "https://h/p/2", None),
    ]
    assert parse_sitemap(sm) == want
    assert parse_sitemap(gzip.compress(sm, mtime=0)) == want
    idx = b"<SitemapIndex><Sitemap><Loc>https://h/s1.xml</Loc></Sitemap></SitemapIndex>"
    assert parse_sitemap(idx) == [("sitemap", "https://h/s1.xml", None)]
    assert parse_sitemap(b"\x00\xff garbage") == []
    # corrupt gzip degrades to garbage -> no entries, no raise
    assert parse_sitemap(gzip.compress(sm)[:-4] + b"\x00\x00") == []
    # the sitemaps.org 50k cap is enforced
    big = b"<urlset>" + b"<url><loc>u</loc></url>" * (
        MAX_SITEMAP_ENTRIES + 5
    ) + b"</urlset>"
    assert len(parse_sitemap(big)) == MAX_SITEMAP_ENTRIES
