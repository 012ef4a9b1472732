"""Crawl-stack kernels beyond the page itself: robots.txt policy
parsing/matching and sitemap XML extraction.

Together with the outlink frontier (extract.extract_outlinks) and the
host-graph PageRank (pipeline.pagerank_df) these complete the
crawl-side data model a Common-Crawl-style pipeline carries next to
the content extraction: which urls MAY be fetched (robots), which
urls the host ADVERTISES (sitemaps), which urls pages LINK to
(outlinks), and which hosts to fetch FIRST (pagerank).

Pure Python — shared verbatim by the Spark Arrow kernels and any
single-process oracle use, same discipline as extract.py.

Reference scope note: the reference repo operates on already-fetched
documents (doclayout_yolo/data/loaders.py accepts local files); the
crawl-policy surface is the engine's extension for the 10^12-page
acquisition tier, not a reference port.
"""

from __future__ import annotations

import re
from html import unescape

# ---------------------------------------------------------------------------
# robots.txt (RFC 9309 subset)
# ---------------------------------------------------------------------------

_DIRECTIVE_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")


def _select_groups(
    body: str, agent: str
) -> list[list[tuple[str, str]]]:
    """§2.2.1 group scan + selection shared by :func:`parse_robots`
    and :func:`parse_crawl_delay`: returns the selected groups'
    (directive, value) lists — specific-agent groups win and suppress
    the ``*`` groups; comments stripped; leading UTF-8 BOM (common in
    wild robots.txt) removed so the first group header survives."""
    agent = agent.lower()
    body = body.lstrip("\ufeff")
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    cur_directives: list[tuple[str, str]] = []
    in_agent_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0]
        m = _DIRECTIVE_RE.match(line)
        if m is None:
            continue
        key, val = m.group(1).lower(), m.group(2)
        if key == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_directives))
                cur_agents, cur_directives = [], []
                in_agent_run = True
            cur_agents.append(val.strip().lower())
        else:
            in_agent_run = False
            if cur_agents:
                cur_directives.append((key, val))
    if cur_agents:
        groups.append((cur_agents, cur_directives))
    specific = [g for g in groups if agent != "*" and agent in g[0]]
    selected = specific or [g for g in groups if "*" in g[0]]
    return [d for _, d in selected]


def parse_robots(body: str, agent: str = "*") -> list[tuple[str, str]]:
    """Rules applying to ``agent`` from a robots.txt body, in file
    order: ``[(directive, path_prefix)]`` with directive in
    {"allow", "disallow"}.

    RFC 9309 group semantics: consecutive ``User-agent`` lines open a
    group.  §2.2.1 group SELECTION: groups naming the crawler's exact
    agent token (case-insensitive) win, and if any exist the ``*``
    groups are IGNORED; only when no specific group matches do the
    ``*`` groups apply.  All selected groups' rules concatenate in
    file order.  Comments (#) strip to end of line; directives are
    case-insensitive; an EMPTY Disallow value is the classic "allow
    everything" idiom and contributes no rule.  Path matching
    downstream is longest-prefix (no ``*``/``$`` wildcard extension —
    documented simplification of §2.2.3).  Unknown directives
    (crawl-delay, sitemap, host) are skipped but still terminate a
    user-agent run.  Total function: any text yields a (possibly
    empty) rule list.
    """
    rules: list[tuple[str, str]] = []
    for directives in _select_groups(body, agent):
        for key, val in directives:
            if key in ("allow", "disallow") and val:
                rules.append((key, val))
    return rules


def parse_crawl_delay(
    body: str, agent: str = "*", default: float = 1.0
) -> float:
    """Effective ``Crawl-delay`` (seconds) for ``agent`` — the same
    §2.2.1 group selection as :func:`parse_robots` (specific-agent
    groups suppress ``*`` groups), first value in the selected groups
    wins, clamped to [0, 3600]; absent/unparseable values fall back
    to ``default``.  Crawl-delay is a de-facto extension (not RFC
    9309) but the politeness scheduler needs ONE number per host."""
    for directives in _select_groups(body, agent):
        for key, val in directives:
            if key == "crawl-delay":
                try:
                    v = float(val)
                except ValueError:
                    continue
                if v != v:  # float('nan') parses but won't clamp
                    continue
                return min(max(v, 0.0), 3600.0)
    return default


def robots_allowed(
    rules: list[tuple[str, str]], path: str
) -> tuple[bool, str | None]:
    """Longest-prefix-match verdict for ``path`` against parsed rules:
    returns (allowed, winning_rule or None).  Ties on prefix length go
    to ``allow`` (RFC 9309 §2.2.2); no matching rule means allowed.
    The winning rule is rendered ``"directive:prefix"`` for lineage.
    """
    best_len = -1
    best_dir: str | None = None
    best_prefix = None
    for directive, prefix in rules:
        if not path.startswith(prefix):
            continue
        plen = len(prefix)
        if plen > best_len or (
            plen == best_len and directive == "allow" and best_dir != "allow"
        ):
            best_len, best_dir, best_prefix = plen, directive, prefix
    if best_dir is None:
        return True, None
    return best_dir == "allow", f"{best_dir}:{best_prefix}"


# ---------------------------------------------------------------------------
# sitemap XML (sitemaps.org schema, regex subset)
# ---------------------------------------------------------------------------

_SM_ENTRY_RE = re.compile(
    r"<\s*(url|sitemap)\s*>(.*?)</\s*\1\s*>", re.I | re.S
)
_SM_LOC_RE = re.compile(r"<\s*loc\s*>\s*(.*?)\s*</\s*loc\s*>", re.I | re.S)
_SM_LASTMOD_RE = re.compile(
    r"<\s*lastmod\s*>\s*(.*?)\s*</\s*lastmod\s*>", re.I | re.S
)

MAX_SITEMAP_ENTRIES = 50_000  # sitemaps.org hard cap per file


def parse_sitemap(body: bytes | str) -> list[tuple[str, str, str | None]]:
    """Entries of a sitemap or sitemap-index document, in file order:
    ``[(kind, loc, lastmod)]`` with kind in {"url", "sitemap"} (the
    latter from ``<sitemapindex>`` children — the caller recurses by
    fetching those locs).  gzip bodies (sitemap.xml.gz) inflate
    first; undecodable/garbage bytes yield [] (total function, P9
    parity).  Entries beyond the sitemaps.org 50k cap are dropped.
    lastmod is carried verbatim (W3C datetime string) — parsing
    timestamps is the consumer's concern.
    """
    if isinstance(body, (bytes, bytearray)):
        from .extract import decode_html, inflate_if_gzip  # noqa: PLC0415

        try:
            body = inflate_if_gzip(bytes(body))
        except Exception:  # noqa: BLE001
            body = bytes(body)
        body = decode_html(body)
    out: list[tuple[str, str, str | None]] = []
    for m in _SM_ENTRY_RE.finditer(body):
        if len(out) >= MAX_SITEMAP_ENTRIES:
            break
        kind = m.group(1).lower()
        inner = m.group(2)
        lm = _SM_LOC_RE.search(inner)
        if lm is None:
            continue
        # sitemaps.org REQUIRES entity-escaped data values, so
        # '&amp;' in a <loc> is the normal encoding of a query-string
        # url — unescape, matching the outlink extractor's treatment
        # of hrefs (a frontier url must be fetchable as carried)
        loc = unescape(lm.group(1))
        if not loc:
            continue
        mm = _SM_LASTMOD_RE.search(inner)
        out.append((kind, loc, unescape(mm.group(1)) if mm else None))
    return out


# ---------------------------------------------------------------------------
# Spark wrappers
# ---------------------------------------------------------------------------

ROBOTS_RULES_DDL = "host string, directive string, prefix string"
SITEMAP_DDL = (
    "sm_url string, pos int, kind string, loc string, lastmod string"
)


def _body_str(b) -> str:
    """Robots/sitemap bodies arrive as string OR binary (the repo's
    fetched-body convention is binary) — coerce fail-open so a typed
    column never crashes an executor task."""
    if b is None:
        return ""
    if isinstance(b, (bytes, bytearray)):
        return bytes(b).decode("utf-8", errors="replace")
    return str(b)


def robots_rules_df(robots, agent: str = "*"):
    """(host, body) robots.txt table -> one row per applicable rule
    (host, directive, prefix) via the shared parser.  Map-only, zero
    shuffle; an unparseable body yields no rules (crawl = allowed),
    never a task failure."""

    def kern(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            hosts, dirs, prefs = [], [], []
            for h, b in zip(pdf["host"], pdf["body"]):
                try:
                    rules = parse_robots(_body_str(b), agent)
                except Exception:  # noqa: BLE001
                    rules = []
                for d, p in rules:
                    hosts.append(h)
                    dirs.append(d)
                    prefs.append(p)
            yield pd.DataFrame(
                {"host": hosts, "directive": dirs, "prefix": prefs}
            )

    return robots.select("host", "body").mapInPandas(
        kern, schema=ROBOTS_RULES_DDL
    )


def robots_filter_df(urls, rules):
    """Longest-prefix robots verdict per url, entirely JVM-side:
    (url) x (host, directive, prefix) -> (url, allowed, matched).

    One left equi-join on host with the prefix match in the join
    condition (unmatched urls survive with nulls), then one
    groupBy(url) picking the winner as max(struct(prefix_len,
    is_allow)) — lexicographic struct max = longest prefix, allow
    wins ties (RFC 9309 §2.2.2); no rule -> allowed.  The rules side
    is hosts-sized (tiny next to the url corpus): AQE broadcasts it
    at small scale and falls back to a skew-aware shuffle join when a
    real crawl's rule table outgrows the broadcast threshold.  Work
    per url is bounded by its host's rule count."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    # host normalization: hosts are case-insensitive and the rules
    # table is keyed by lowercase port-less host (the repo-wide host
    # key, cf. queries_extra's F.lower + [^/:?#] extraction) — without
    # it a mixed-case or :port link would silently bypass disallow
    # rules (fail-open).  An authority-only url ("https://h", no
    # slash) has path '/', per RFC 9309 / every production parser.
    parts = urls.select(
        "url",
        F.lower(
            F.regexp_extract("url", r"^https?://([^/:?#]+)", 1)
        ).alias("host"),
        F.when(
            F.regexp_extract("url", r"^https?://[^/]+(/.*)?$", 1) == "",
            F.lit("/"),
        )
        .otherwise(F.regexp_extract("url", r"^https?://[^/]+(/.*)?$", 1))
        .alias("path"),
    )
    r = rules.select(
        F.lower(F.col("host")).alias("r_host"), "directive", "prefix"
    )
    joined = parts.join(
        r,
        (parts.host == r.r_host)
        & F.col("path").startswith(F.col("prefix")),
        "left",
    )
    win = F.max(
        F.when(
            F.col("prefix").isNotNull(),
            F.struct(
                F.length("prefix").alias("plen"),
                (F.col("directive") == "allow").alias("is_allow"),
                F.col("directive").alias("directive"),
                F.col("prefix").alias("prefix"),
            ),
        )
    ).alias("win")
    agg = joined.groupBy("url").agg(win)
    return agg.select(
        "url",
        F.coalesce(F.col("win.is_allow"), F.lit(True)).alias("allowed"),
        F.when(
            F.col("win").isNotNull(),
            F.concat_ws(":", F.col("win.directive"), F.col("win.prefix")),
        ).alias("matched"),
    )


def sitemap_entries_df(sitemaps):
    """(sm_url, body:binary) sitemap documents -> one row per entry
    (sm_url, pos, kind, loc, lastmod) via the shared parser (gzip
    .xml.gz bodies inflate inside).  Map-only, zero shuffle; garbage
    bodies yield no entries (P9 parity)."""

    def kern(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for u, b in zip(pdf["sm_url"], pdf["body"]):
                try:
                    entries = parse_sitemap(
                        bytes(b) if b is not None else b""
                    )
                except Exception:  # noqa: BLE001
                    entries = []
                for i, (kind, loc, lastmod) in enumerate(entries):
                    rows.append(
                        {
                            "sm_url": u,
                            "pos": i,
                            "kind": kind,
                            "loc": loc,
                            "lastmod": lastmod,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["sm_url", "pos", "kind", "loc", "lastmod"]
            )

    return sitemaps.select("sm_url", "body").mapInPandas(
        kern, schema=SITEMAP_DDL
    )


def crawl_delays_df(robots, agent: str = "*", default: float = 1.0):
    """(host, body) robots table -> one (host, delay_s) row per host
    via :func:`parse_crawl_delay`.  Map-only, zero shuffle."""

    def kern(batches):
        import pandas as pd  # noqa: PLC0415

        def one(b):
            # fail-open parity with robots_rules_df: any poisoned
            # body degrades to the default delay, never a task death
            try:
                return parse_crawl_delay(_body_str(b), agent, default)
            except Exception:  # noqa: BLE001
                return default

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "delay_s": [one(b) for b in pdf["body"]],
                }
            )

    return robots.select("host", "body").mapInPandas(
        kern, schema="host string, delay_s double"
    )


def fetch_schedule_df(urls, delays, default: float = 1.0):
    """Politeness schedule: one fetch slot per url, sequential per
    host — slot k of a host fires at ``k * delay_s`` seconds relative
    to the host's first fetch.  (url) x (host, delay_s) ->
    (url, host, slot, fetch_offset_s).

    Per-host ROW_NUMBER ordered by url (deterministic), delay joined
    on the lowercase port-less host key with hosts absent from the
    robots table falling back to ``default``.  The window partitions
    by host — exactly the per-host sequential constraint a polite
    fetcher must serialize anyway; partition width is bounded by the
    hottest host's url count (same skew envelope as the per-source
    token-budget window)."""
    from pyspark.sql import Window  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    parts = urls.select(
        "url",
        F.lower(
            F.regexp_extract("url", r"^https?://([^/:?#]+)", 1)
        ).alias("host"),
    )
    # duplicate host rows (a refetched robots.txt appended to the
    # table) must not multiply url rows through the join: collapse to
    # the most conservative (largest) delay per host
    d = delays.groupBy(
        F.lower(F.col("host")).alias("d_host")
    ).agg(F.max("delay_s").alias("delay_s"))
    j = parts.join(d, parts.host == d.d_host, "left")
    w = Window.partitionBy("host").orderBy("url")
    slotted = j.select(
        "url",
        "host",
        (F.row_number().over(w) - F.lit(1)).alias("slot"),
        F.coalesce("delay_s", F.lit(float(default))).alias("delay_s"),
    )
    return slotted.select(
        "url",
        "host",
        "slot",
        (F.col("slot") * F.col("delay_s")).alias("fetch_offset_s"),
    )
