"""robots.txt gating — a north_rule addition with NO reference implementation
(SURVEY.md §2.5: the reference never fetches or checks robots.txt; the only
robots.txt in its tree is the webapp's own static file,
``/root/reference/webapp/app/robots.txt``). Reference-equivalence fixtures run
with the gate disabled, which is behaviorally identical to the reference.

Semantics — RFC 9309 (Robots Exclusion Protocol):

* ``User-agent`` groups; a group matches if its UA token is ``*`` or a
  case-insensitive substring of the crawler's UA. Specific-UA groups win
  over ``*`` groups when both exist (RFC 9309 §2.2.1: obey the most
  specific matching group).
* Both ``Allow`` and ``Disallow`` rules, with ``*`` (any octet sequence)
  and a trailing ``$`` (end anchor) as the two special characters
  (§2.2.2-2.2.3).
* Longest-match precedence: the matching rule with the MOST OCTETS in its
  pattern wins; at equal length, Allow wins (§2.2.2: "least restrictive
  rule" on tie). No matching rule ⇒ allowed.
* Empty ``Disallow:``/``Allow:`` lines carry no pattern and match nothing
  (an empty-Disallow-only group therefore allows everything).
* ``Crawl-delay`` (non-standard but ubiquitous; seconds) maps onto the
  per-host politeness budget — the reference's fixed 5 s tick
  (``fetcher.go:97-99``) is the unit: a host demanding a 10 s delay gets
  half the per-generation budget (see ``crawler._host_budgets``).

The reference's user agent is ``OwlCrawler - https://…``
(``/root/reference/fetcher.go:49``).
"""

from __future__ import annotations

import re

from owlfrontier.urlutil import path_of

USER_AGENT = "OwlCrawler - https://github.com/fmpwizard/owlcrawler"

# a rule is (is_allow: bool, pattern: str); legacy call sites may still pass
# bare disallow-prefix strings — ``_as_rules`` normalizes.
Rule = tuple[bool, str]


def _parse_groups(robots_txt: str):
    """→ [(ua tokens, [(is_allow, pattern)], crawl_delay | None)]."""
    groups: list[tuple[list[str], list[Rule], float | None]] = []
    cur_uas: list[str] = []
    cur_rules: list[Rule] = []
    cur_delay: float | None = None
    in_group_body = False
    for raw in (robots_txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                groups.append((cur_uas, cur_rules, cur_delay))
                cur_uas, cur_rules, cur_delay = [], [], None
                in_group_body = False
            cur_uas.append(value.lower())
        elif field in ("disallow", "allow"):
            in_group_body = True
            if value:
                cur_rules.append((field == "allow", value))
            # empty pattern: matches nothing (empty Disallow ⇒ allow all)
        elif field == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = float(value)
            except ValueError:
                pass  # malformed delay: ignored, like unknown fields
    if cur_uas:
        groups.append((cur_uas, cur_rules, cur_delay))
    return groups


def _select_group(groups, user_agent: str):
    """Specific-UA groups win over ``*`` groups when both exist."""
    ua_lower = user_agent.lower()
    specific: tuple[list[Rule], float | None] | None = None
    wildcard: tuple[list[Rule], float | None] | None = None
    for uas, rules, delay in groups:
        for ua in uas:
            if ua == "*":
                wildcard = (
                    (rules, delay) if wildcard is None
                    else (wildcard[0] + rules, wildcard[1] if wildcard[1] is not None else delay)
                )
            elif ua and ua in ua_lower:
                specific = (
                    (rules, delay) if specific is None
                    else (specific[0] + rules, specific[1] if specific[1] is not None else delay)
                )
    if specific is not None:
        return specific
    if wildcard is not None:
        return wildcard
    return ([], None)


def parse_rules(robots_txt: str, user_agent: str = USER_AGENT) -> list[Rule]:
    """All (is_allow, pattern) rules applying to ``user_agent``."""
    return _select_group(_parse_groups(robots_txt), user_agent)[0]


def parse_disallows(robots_txt: str, user_agent: str = USER_AGENT) -> list[str]:
    """The Disallow patterns applying to ``user_agent`` (legacy surface)."""
    return [p for a, p in parse_rules(robots_txt, user_agent) if not a]


def parse_crawl_delay(
    robots_txt: str, user_agent: str = USER_AGENT
) -> float | None:
    """Crawl-delay seconds for ``user_agent`` (None if unspecified)."""
    return _select_group(_parse_groups(robots_txt), user_agent)[1]


_SITEMAP_RE = re.compile(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)")


def parse_sitemaps(robots_txt: str) -> list[str]:
    """``Sitemap:`` directive URLs, in file order. Per RFC 9309 §2.3 /
    sitemaps.org these are GLOBAL (not scoped to any User-agent group),
    so they are collected independently of group parsing. Inline
    comments are stripped like any other line."""
    out = []
    for line in (robots_txt or "").splitlines():
        line = line.split("#", 1)[0]
        m = _SITEMAP_RE.match(line)
        if m:
            out.append(m.group(1))
    return out


def pattern_regex(pattern: str) -> str:
    """RFC 9309 §2.2.3 pattern → anchored regex (Python- and Java-safe):
    ``*`` matches any octet sequence, a TRAILING ``$`` anchors the end
    (``$`` elsewhere is literal); matching starts at the path start."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return "^" + rx + ("$" if anchored else "")


def _match(pattern: str, path: str) -> bool:
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)  # plain prefix — the common case
    return re.match(pattern_regex(pattern), path) is not None


def _as_rules(rules) -> list[Rule]:
    return [
        (False, r) if isinstance(r, str) else (bool(r[0]), r[1])
        for r in rules or []
    ]


def is_allowed(url: str, rules) -> bool:
    """RFC 9309 §2.2.2 evaluation: among matching rules, the longest
    pattern wins; at equal length Allow beats Disallow; no match ⇒
    allowed. ``rules`` may be (is_allow, pattern) tuples or legacy bare
    disallow-prefix strings."""
    path = path_of(url)
    best_len = -1
    best_allow = True
    for is_allow, pattern in _as_rules(rules):
        if not _match(pattern, path):
            continue
        n = len(pattern)
        if n > best_len or (n == best_len and is_allow):
            best_len = n
            best_allow = is_allow
    return best_allow


def rules_map(robots_rows) -> dict[str, list[Rule]]:
    """(host, robots_txt) pairs → {host: rules} (simulator/oracle side)."""
    return {host: parse_rules(txt) for host, txt in robots_rows}


def disallow_map(robots_rows) -> dict[str, list[Rule]]:
    """Back-compat alias of :func:`rules_map` (the simulator's
    ``is_allowed`` accepts full rules, so callers get RFC semantics)."""
    return rules_map(robots_rows)


def _rule_structs(rules: list[Rule]):
    """Engine-side precomputation: one struct per rule with everything the
    JVM gate needs — ``a`` allow flag, ``l`` pattern octet length (the
    longest-match key), ``w`` wildcard flag, ``pfx`` the plain prefix
    (when w=0), ``rx`` the anchored regex (when w=1)."""
    out = []
    for is_allow, pattern in rules:
        wild = "*" in pattern or pattern.endswith("$")
        out.append(
            {
                "a": 1 if is_allow else 0,
                "l": len(pattern),
                "w": 1 if wild else 0,
                "pfx": pattern,
                "rx": pattern_regex(pattern) if wild else "",
            }
        )
    return out


RULES_SCHEMA = (
    "rules array<struct<a:int,l:int,w:int,pfx:string,rx:string>>, "
    "crawl_delay double"
)


def robots_udf():
    """Vectorized pandas UDF: robots_txt STRING → rule structs
    ARRAY<STRUCT<a,l,w,pfx,rx>>. Runs once per host row, never per URL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse(txt: "pd.Series") -> "pd.Series":
        return pd.Series(
            [_rule_structs(parse_rules(t or "")) for t in txt.tolist()]
        )

    _parse.__annotations__ = {"txt": pd.Series, "return": pd.Series}
    return pandas_udf("array<struct<a:int,l:int,w:int,pfx:string,rx:string>>")(
        _parse
    )


def robots_rules_udf():
    """Vectorized pandas UDF: robots_txt STRING →
    STRUCT<rules, crawl_delay>. One parse per host row covers both the
    gate and the politeness budget."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse(txt: "pd.Series") -> "pd.DataFrame":
        rows = [
            _select_group(_parse_groups(t or ""), USER_AGENT)
            for t in txt.tolist()
        ]
        return pd.DataFrame(
            {"rules": [_rule_structs(r[0]) for r in rows],
             "crawl_delay": [r[1] for r in rows]}
        )

    _parse.__annotations__ = {"txt": pd.Series, "return": pd.DataFrame}
    return pandas_udf(RULES_SCHEMA)(_parse)


def robots_from_pages(pages):
    """Extract (host, robots_txt) rules rows from the PAGES STORE itself —
    the Common-Crawl bootstrap path (SURVEY.md §2.5: robots.txt rows live
    in the corpus at ``scheme://host/robots.txt``; CC archives fetch and
    store them like any page). Pure column ops: one filtered pass over the
    scan (predicate prunes on the url suffix), first-wins per host by
    (warc_ts, url) when an archive holds several snapshots.

    Feed the result straight to ``CrawlEngine(robots_df=...)``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from owlfrontier.urlutil import HOST_REGEX

    cand = pages.where(
        F.col("url").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+/robots\.txt$")
    ).select(
        F.regexp_extract("url", HOST_REGEX, 1).alias("host"),
        F.decode(F.col("html"), "UTF-8").alias("robots_txt"),
        "warc_ts",
        "url",
    )
    w = Window.partitionBy("host").orderBy("warc_ts", "url")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("host", "robots_txt")
    )


def sitemap_seeds_from_pages(pages):
    """Sitemap-driven seed bootstrap, fully declarative: pull each host's
    ``Sitemap:`` URLs out of the robots.txt rows already in the pages
    store, join those URLs back against the store to fetch the sitemap
    XML payloads, and extract every ``<loc>`` entry JVM-side
    (``regexp_extract_all`` — no Python in the path). Returns a
    ``(url, seq)`` seeds DataFrame ready for ``CrawlEngine.run(seeds=…)``
    / ``add_seeds`` (seq = xxhash64-derived: any unique-ish BIGINT works,
    first-wins dedup arbitrates ties by path order).

    Scale shape: the robots scan prunes on the url-suffix predicate; the
    sitemap join broadcasts the (tiny, host-count-sized) sitemap-URL
    side against the store; extraction and explode are column ops."""
    from pyspark.sql import functions as F

    robots = robots_from_pages(pages)
    sitemap_urls = robots.select(
        F.explode(
            F.regexp_extract_all(
                "robots_txt", F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"),
                1,
            )
        ).alias("url")
    ).distinct()
    sitemap_pages = F.broadcast(sitemap_urls).join(
        pages.select("url", "html"), "url", "inner"
    )
    locs = sitemap_pages.select(
        F.explode(
            F.regexp_extract_all(
                F.decode(F.col("html"), "UTF-8"),
                F.lit(r"<loc>\s*([^<\s][^<]*?)\s*</loc>"),
                1,
            )
        ).alias("url")
    ).distinct()
    return locs.select(
        "url", F.abs(F.xxhash64("url")).alias("seq")
    )
