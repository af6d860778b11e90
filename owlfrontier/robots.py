"""robots.txt gating — a north_rule addition with NO reference implementation
(SURVEY.md §2.5: the reference never fetches or checks robots.txt; the only
robots.txt in its tree is the webapp's own static file,
``/root/reference/webapp/app/robots.txt``). Reference-equivalence fixtures run
with the gate disabled, which is behaviorally identical to the reference.

Semantics (deliberately minimal, per FIXTURES.md §1.3): ``User-agent`` groups
with prefix ``Disallow`` rules, plus ``Crawl-delay`` (seconds) which maps
onto the per-host politeness budget — the reference's fixed 5 s tick
(``fetcher.go:97-99``) is the unit: a host demanding a 10 s delay gets half
the per-generation budget (see ``crawler._host_budgets``). The reference's
user agent is
``OwlCrawler - https://…`` (``/root/reference/fetcher.go:49``); a group
matches if its UA token is ``*`` or a case-insensitive substring of that UA.
A URL is blocked if any Disallow prefix of the best-matching group is a
prefix of its path. Empty Disallow lines allow everything.
"""

from __future__ import annotations

from owlfrontier.urlutil import path_of

USER_AGENT = "OwlCrawler - https://github.com/fmpwizard/owlcrawler"


def _parse_groups(robots_txt: str):
    """→ [(ua tokens, disallow prefixes, crawl_delay | None)]."""
    groups: list[tuple[list[str], list[str], float | None]] = []
    cur_uas: list[str] = []
    cur_dis: list[str] = []
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
                groups.append((cur_uas, cur_dis, cur_delay))
                cur_uas, cur_dis, cur_delay = [], [], None
                in_group_body = False
            cur_uas.append(value.lower())
        elif field == "disallow":
            in_group_body = True
            if value:
                cur_dis.append(value)
            # empty Disallow: allows all — group exists but adds no prefix
        elif field == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = float(value)
            except ValueError:
                pass  # malformed delay: ignored, like unknown fields
    if cur_uas:
        groups.append((cur_uas, cur_dis, cur_delay))
    return groups


def _select_group(groups, user_agent: str):
    """Specific-UA groups win over ``*`` groups when both exist."""
    ua_lower = user_agent.lower()
    specific: tuple[list[str], float | None] | None = None
    wildcard: tuple[list[str], float | None] | None = None
    for uas, dis, delay in groups:
        for ua in uas:
            if ua == "*":
                wildcard = (
                    (dis, delay) if wildcard is None
                    else (wildcard[0] + dis, wildcard[1] if wildcard[1] is not None else delay)
                )
            elif ua and ua in ua_lower:
                specific = (
                    (dis, delay) if specific is None
                    else (specific[0] + dis, specific[1] if specific[1] is not None else delay)
                )
    if specific is not None:
        return specific
    if wildcard is not None:
        return wildcard
    return ([], None)


def parse_disallows(robots_txt: str, user_agent: str = USER_AGENT) -> list[str]:
    """Return the Disallow prefixes applying to ``user_agent``."""
    return _select_group(_parse_groups(robots_txt), user_agent)[0]


def parse_crawl_delay(
    robots_txt: str, user_agent: str = USER_AGENT
) -> float | None:
    """Crawl-delay seconds for ``user_agent`` (None if unspecified)."""
    return _select_group(_parse_groups(robots_txt), user_agent)[1]


def is_allowed(url: str, disallows: list[str]) -> bool:
    path = path_of(url)
    return not any(path.startswith(d) for d in disallows)


def disallow_map(robots_rows) -> dict[str, list[str]]:
    """(host, robots_txt) pairs → {host: [disallow prefixes]} (oracle side)."""
    return {host: parse_disallows(txt) for host, txt in robots_rows}


def robots_udf():
    """Vectorized pandas UDF: robots_txt STRING → disallow prefixes
    ARRAY<STRING>. Runs once per host row, never per URL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse(txt: "pd.Series") -> "pd.Series":
        return pd.Series([parse_disallows(t or "") for t in txt.tolist()])

    _parse.__annotations__ = {"txt": pd.Series, "return": pd.Series}
    return pandas_udf("array<string>")(_parse)


def robots_rules_udf():
    """Vectorized pandas UDF: robots_txt STRING →
    STRUCT<disallows: ARRAY<STRING>, crawl_delay: DOUBLE>. One parse per
    host row covers both the gate and the politeness budget."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse(txt: "pd.Series") -> "pd.DataFrame":
        rows = [
            _select_group(_parse_groups(t or ""), USER_AGENT)
            for t in txt.tolist()
        ]
        return pd.DataFrame(
            {"disallows": [r[0] for r in rows],
             "crawl_delay": [r[1] for r in rows]}
        )

    _parse.__annotations__ = {"txt": pd.Series, "return": pd.DataFrame}
    return pandas_udf("disallows array<string>, crawl_delay double")(_parse)


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
