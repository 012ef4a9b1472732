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


def test_crawl_job_end_to_end(spark, tmp_path_factory, monkeypatch):
    # the spark-submit frontier job: outlinks -> robots filter ->
    # pagerank join, with an audit ledger (no silent drops)
    import os
    import sys

    _REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.join(_REPO, "jobs") not in sys.path:
        sys.path.insert(0, os.path.join(_REPO, "jobs"))
    import crawl_job

    base = tmp_path_factory.mktemp("crawljob")
    # 3-host ring: a -> b, b -> c, c -> a; page on a also links to
    # a robots-blocked path on b
    rows = []
    ring = {"a": "b", "b": "c", "c": "a"}
    for h, nxt in ring.items():
        html = (
            f'<p><a href="https://{nxt}.example.com/page">n</a> '
            + (
                f'<a href="https://b.example.com/private/1">x</a>'
                if h == "a"
                else ""
            )
            + "</p>"
        )
        rows.append((f"https://{h}.example.com/", html.encode()))
    pages = spark.createDataFrame(rows, "url string, html binary")
    pages.write.parquet(f"{base}/pages")
    robots = spark.createDataFrame(
        [("b.example.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, body string",
    )
    robots.write.parquet(f"{base}/robots")
    out = f"{base}/frontier"
    import io
    import json as _json
    from contextlib import redirect_stdout

    monkeypatch.setattr(
        sys, "argv",
        ["crawl_job.py", "--input", f"{base}/pages", "--output", out,
         "--robots", f"{base}/robots", "--iters", "4"],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        crawl_job.main(stop_session=False)
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])
    got = spark.read.parquet(out).collect()
    targets = {r["target"] for r in got}
    # the ring survives; the disallowed target is dropped but audited
    assert targets == {
        "https://b.example.com/page",
        "https://c.example.com/page",
        "https://a.example.com/page",
    }
    assert stats["n_disallowed"] == 1
    assert stats["n_links"] == 4
    assert stats["n_frontier_rows"] == 3
    # symmetric ring => equal ranks summing to 1
    prs = {r["host"]: r["host_pr"] for r in got}
    assert all(abs(v - 1 / 3) < 1e-9 for v in prs.values()), prs
    # --keep-disallowed carries the blocked row with allowed=false
    monkeypatch.setattr(
        sys, "argv",
        ["crawl_job.py", "--input", f"{base}/pages", "--output",
         f"{base}/f2", "--robots", f"{base}/robots", "--keep-disallowed"],
    )
    with redirect_stdout(io.StringIO()):
        crawl_job.main(stop_session=False)
    kept = spark.read.parquet(f"{base}/f2").collect()
    blocked = [r for r in kept if not r["allowed"]]
    assert len(kept) == 4 and len(blocked) == 1
    assert blocked[0]["target"] == "https://b.example.com/private/1"
    assert blocked[0]["matched"] == "disallow:/private/"


def test_robots_utf8_bom_first_group_survives():
    from doclayout_yolo_spark.crawl import parse_robots

    body = "﻿User-agent: *\nDisallow: /x/\n"
    assert parse_robots(body) == [("disallow", "/x/")]


def test_sitemap_loc_entities_unescaped():
    from doclayout_yolo_spark.crawl import parse_sitemap

    sm = b"<urlset><url><loc>https://h/p?a=1&amp;b=2</loc></url></urlset>"
    assert parse_sitemap(sm) == [("url", "https://h/p?a=1&b=2", None)]


def test_robots_filter_normalizes_host_and_empty_path(spark):
    from doclayout_yolo_spark.crawl import robots_filter_df, robots_rules_df

    robots = spark.createDataFrame(
        [("b.example.com", "User-agent: *\nDisallow: /\n")],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [
            ("https://B.Example.com/private/1",),  # mixed case
            ("https://b.example.com:443/x",),      # explicit port
            ("https://b.example.com",),            # authority-only -> path /
            ("https://other.example.com/x",),
        ],
        "url string",
    )
    got = {
        r["url"]: (r["allowed"], r["matched"])
        for r in robots_filter_df(urls, robots_rules_df(robots)).collect()
    }
    assert got["https://B.Example.com/private/1"] == (False, "disallow:/")
    assert got["https://b.example.com:443/x"] == (False, "disallow:/")
    assert got["https://b.example.com"] == (False, "disallow:/")
    assert got["https://other.example.com/x"] == (True, None)


# --- property fuzz: the crawl parsers are total functions ----------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(st.text(max_size=400), st.text(max_size=12))
@settings(max_examples=200, deadline=None)
def test_parse_robots_total_and_well_formed(body, agent):
    from doclayout_yolo_spark.crawl import parse_robots

    rules = parse_robots(body, agent or "*")
    for d, p in rules:
        assert d in ("allow", "disallow")
        assert isinstance(p, str) and p != ""


@given(st.binary(max_size=600))
@settings(max_examples=200, deadline=None)
def test_parse_sitemap_total_on_arbitrary_bytes(data):
    from doclayout_yolo_spark.crawl import parse_sitemap

    for kind, loc, lastmod in parse_sitemap(data):
        assert kind in ("url", "sitemap")
        assert isinstance(loc, str) and loc
        assert lastmod is None or isinstance(lastmod, str)


@given(st.binary(max_size=600), st.text(min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_extract_page_metadata_total_on_arbitrary_bytes(data, url):
    from doclayout_yolo_spark.extract import extract_page_metadata

    md = extract_page_metadata(url, data)
    assert set(md) == {"title", "description", "og_title", "canonical", "lang"}
    for v in md.values():
        assert v is None or isinstance(v, str)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["allow", "disallow"]),
            st.text(min_size=1, max_size=8),
        ),
        max_size=8,
    ),
    st.text(max_size=16),
)
@settings(max_examples=200, deadline=None)
def test_robots_allowed_matches_bruteforce(rules, path):
    # independent brute-force: best (len, allow-wins) among matching
    from doclayout_yolo_spark.crawl import robots_allowed

    matching = [(d, p) for d, p in rules if path.startswith(p)]
    if not matching:
        assert robots_allowed(rules, path) == (True, None)
    else:
        best = max(
            matching, key=lambda dp: (len(dp[1]), dp[0] == "allow")
        )
        allowed, matched = robots_allowed(rules, path)
        assert allowed == (best[0] == "allow")
        # matched rule has the winning length and directive
        d, p = matched.split(":", 1)
        assert len(p) == len(best[1]) and d == best[0]


def test_parse_crawl_delay_group_selection_and_clamps():
    from doclayout_yolo_spark.crawl import parse_crawl_delay

    b = (
        "﻿User-agent: googlebot\nCrawl-delay: 9\n\n"
        "User-agent: *\nDisallow: /x/\nCrawl-delay: 2.5\nCrawl-delay: 7\n"
    )
    assert parse_crawl_delay(b) == 2.5          # first value in '*' group
    assert parse_crawl_delay(b, agent="googlebot") == 9.0  # specific wins
    assert parse_crawl_delay("no robots here") == 1.0      # default
    assert parse_crawl_delay("", default=3.0) == 3.0
    assert (
        parse_crawl_delay("User-agent: *\nCrawl-delay: bogus\nCrawl-delay: 4")
        == 4.0
    )
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 99999") == 3600.0
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: -5") == 0.0


def test_fetch_schedule_per_host_slots(spark):
    from doclayout_yolo_spark.crawl import crawl_delays_df, fetch_schedule_df

    robots = spark.createDataFrame(
        [("a.example.com", "User-agent: *\nCrawl-delay: 2\n")],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [("https://a.example.com/1",), ("https://A.Example.com/2",),
         ("https://b.example.com/1",)],
        "url string",
    )
    rows = {
        r["url"]: (r["host"], r["slot"], r["fetch_offset_s"])
        for r in fetch_schedule_df(urls, crawl_delays_df(robots)).collect()
    }
    # mixed-case host normalizes into the same per-host queue
    # (slot order is by raw url string: 'A' < 'a' in ASCII)
    assert rows["https://A.Example.com/2"] == ("a.example.com", 0, 0.0)
    assert rows["https://a.example.com/1"] == ("a.example.com", 1, 2.0)
    # host with no robots row: default 1.0s spacing
    assert rows["https://b.example.com/1"] == ("b.example.com", 0, 0.0)


def test_crawl_job_sitemaps_and_schedule(spark, tmp_path_factory, monkeypatch):
    # --sitemaps unions advertised urls (via='sitemap'); --schedule
    # appends per-host politeness slots honoring Crawl-delay, and a
    # kept-disallowed row gets NO slot
    import io
    import json as _json
    import os
    import sys
    from contextlib import redirect_stdout

    _REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.join(_REPO, "jobs") not in sys.path:
        sys.path.insert(0, os.path.join(_REPO, "jobs"))
    import crawl_job

    base = tmp_path_factory.mktemp("crawljob2")
    pages = spark.createDataFrame(
        [("https://a.example.com/",
          b'<p><a href="https://b.example.com/page">n</a></p>')],
        "url string, html binary",
    )
    pages.write.parquet(f"{base}/pages")
    spark.createDataFrame(
        [("b.example.com",
          "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n")],
        "host string, body string",
    ).write.parquet(f"{base}/robots")
    sm_xml = (
        b"<urlset><url><loc>https://b.example.com/adv1</loc></url>"
        b"<url><loc>https://b.example.com/adv2</loc></url>"
        b"<url><loc>https://b.example.com/private/adv3</loc></url></urlset>"
    )
    spark.createDataFrame(
        [("https://b.example.com/sitemap.xml", sm_xml)],
        "sm_url string, body binary",
    ).write.parquet(f"{base}/sitemaps")
    out = f"{base}/frontier"
    monkeypatch.setattr(
        sys, "argv",
        ["crawl_job.py", "--input", f"{base}/pages", "--output", out,
         "--robots", f"{base}/robots", "--sitemaps", f"{base}/sitemaps",
         "--schedule", "--keep-disallowed"],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        crawl_job.main(stop_session=False)
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["n_sitemap_urls"] == 3
    assert stats["n_disallowed"] == 1
    rows = {r["target"]: r for r in spark.read.parquet(out).collect()}
    assert rows["https://b.example.com/adv1"]["via"] == "sitemap"
    assert rows["https://b.example.com/page"]["via"] == "link"
    # blocked sitemap url kept for audit, but NOT scheduled
    blocked = rows["https://b.example.com/private/adv3"]
    assert blocked["allowed"] is False and blocked["slot"] is None
    # allowed b-host targets share one politeness queue at 2s spacing,
    # slots ordered by url: adv1 < adv2 < page
    sched = sorted(
        (r["slot"], t, r["fetch_offset_s"])
        for t, r in rows.items()
        if r["allowed"]
    )
    assert sched == [
        (0, "https://b.example.com/adv1", 0.0),
        (1, "https://b.example.com/adv2", 2.0),
        (2, "https://b.example.com/page", 4.0),
    ]


def test_crawl_delays_binary_body_and_dup_hosts(spark):
    # binary robots bodies (the repo's fetched-body convention) must
    # fail open to a parsed delay, and duplicate host rows collapse
    # to the most conservative delay instead of multiplying slots
    from doclayout_yolo_spark.crawl import crawl_delays_df, fetch_schedule_df

    robots = spark.createDataFrame(
        [
            ("a.example.com", b"User-agent: *\nCrawl-delay: 2\n"),
            ("a.example.com", b"User-agent: *\nCrawl-delay: 5\n"),  # refetch
            ("c.example.com", b"\xff\xfe garbage"),
        ],
        "host string, body binary",
    )
    urls = spark.createDataFrame(
        [("https://a.example.com/1",), ("https://a.example.com/2",),
         ("https://c.example.com/1",)],
        "url string",
    )
    rows = {
        r["url"]: (r["slot"], r["fetch_offset_s"])
        for r in fetch_schedule_df(urls, crawl_delays_df(robots)).collect()
    }
    assert len(rows) == 3  # no row multiplication from the dup host
    assert rows["https://a.example.com/1"] == (0, 0.0)
    assert rows["https://a.example.com/2"] == (1, 5.0)  # max(2, 5)
    assert rows["https://c.example.com/1"] == (0, 0.0)  # garbage -> default


def test_parse_crawl_delay_rejects_nan():
    from doclayout_yolo_spark.crawl import parse_crawl_delay

    assert parse_crawl_delay("User-agent: *\nCrawl-delay: nan") == 1.0
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: inf") == 3600.0


def test_attrs_regex_no_redos_on_unterminated_quoted_tag():
    # r5 advisor finding: the greedy _ATTRS form backtracked
    # exponentially on an unterminated tag containing quotes and no
    # '>' (measured 10.5 s at 34 quotes, ~2.5x per +2 quotes) —
    # one corrupt crawl page pinned an executor core forever.  The
    # possessive form must stay linear; 60 quotes would take ~years
    # under the old regex.
    import time

    from doclayout_yolo_spark.extract import (
        extract_outlinks,
        extract_page_metadata,
    )

    evil = "<html><body><a href=\"x\" " + '"y=z' * 60  # never closed
    t0 = time.time()
    links = extract_outlinks("https://h.example/", evil)
    assert time.time() - t0 < 1.0
    assert links == []
    evil_meta = "<html><base " + '"a' * 60 + "<meta " + "'b" * 60
    t0 = time.time()
    md = extract_page_metadata("https://h.example/", evil_meta)
    assert time.time() - t0 < 1.0
    assert md["canonical"] is None
    # tolerance for a stray unpaired quote is retained: the quoted '>'
    # and the bare-quote rescue both still parse
    page = (
        '<html><body><a data-x="v>w" href="/rel">t</a>'
        "<a x=' href='/decoy' href=\"/real\">t</a></body></html>"
    )
    out = extract_outlinks("https://h.example/p/", page)
    # second tag: the ' after x= opens a quoted span covering the first
    # href; the surviving href is /decoy — identical to the pre-fix
    # greedy behavior (parity pinned here)
    assert out == ["https://h.example/rel", "https://h.example/decoy"]
