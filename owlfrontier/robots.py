"""robots.txt gating — a north_rule addition with NO reference implementation
(SURVEY.md §2.5: the reference never fetches or checks robots.txt; the only
robots.txt in its tree is the webapp's own static file,
``/root/reference/webapp/app/robots.txt``). Reference-equivalence fixtures run
with the gate disabled, which is behaviorally identical to the reference.

Semantics (deliberately minimal, per FIXTURES.md §1.3): ``User-agent`` groups
with prefix ``Disallow`` rules only. The reference's user agent is
``OwlCrawler - https://…`` (``/root/reference/fetcher.go:49``); a group
matches if its UA token is ``*`` or a case-insensitive substring of that UA.
A URL is blocked if any Disallow prefix of the best-matching group is a
prefix of its path. Empty Disallow lines allow everything.
"""

from __future__ import annotations

from owlfrontier.urlutil import path_of

USER_AGENT = "OwlCrawler - https://github.com/fmpwizard/owlcrawler"


def parse_disallows(robots_txt: str, user_agent: str = USER_AGENT) -> list[str]:
    """Return the Disallow prefixes applying to ``user_agent``.

    Specific-UA groups win over ``*`` groups when both exist."""
    ua_lower = user_agent.lower()
    groups: list[tuple[list[str], list[str]]] = []  # (ua tokens, disallows)
    cur_uas: list[str] = []
    cur_dis: list[str] = []
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
                groups.append((cur_uas, cur_dis))
                cur_uas, cur_dis = [], []
                in_group_body = False
            cur_uas.append(value.lower())
        elif field == "disallow":
            in_group_body = True
            if value:
                cur_dis.append(value)
            # empty Disallow: allows all — group exists but adds no prefix
    if cur_uas:
        groups.append((cur_uas, cur_dis))

    specific: list[str] | None = None
    wildcard: list[str] | None = None
    for uas, dis in groups:
        for ua in uas:
            if ua == "*":
                wildcard = dis if wildcard is None else wildcard + dis
            elif ua and ua in ua_lower:
                specific = dis if specific is None else specific + dis
    if specific is not None:
        return specific
    if wildcard is not None:
        return wildcard
    return []


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
