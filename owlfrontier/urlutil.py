"""URL helpers shared — with IDENTICAL semantics — by the pure-Python oracle
simulator and the Spark engine.

The politeness/partitioning host key is extracted with one regex used
verbatim on both sides (Python ``re`` and Spark ``regexp_extract`` compile it
identically for this pattern), so per-host budgets can never diverge between
oracle and engine. URLs themselves stay un-canonicalized — the reference
never normalizes (``/root/reference/parse/parse.go:88-131``; SURVEY.md §2.3).
"""

from __future__ import annotations

import re

# scheme '://' [userinfo '@'] host[:port] — host excludes port for grouping
HOST_REGEX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]*)"
# everything after the authority: the path+query+fragment for robots matching
PATH_REGEX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$"

_HOST_RE = re.compile(HOST_REGEX)
_PATH_RE = re.compile(PATH_REGEX)


def host_of(url: str) -> str:
    m = _HOST_RE.match(url or "")
    return m.group(1) if m else ""


def path_of(url: str) -> str:
    m = _PATH_RE.match(url or "")
    if not m:
        return ""
    p = m.group(1)
    return p if p else "/"


def canonical_url_sql(u: str, dialect: str = "spark") -> str:
    """The URL canonicalization chain as one nested SQL expression over
    the input expression ``u``, valid in BOTH dialects this repo pairs
    (Spark SQL and DuckDB — regexp_replace(str, pat, rep) without group
    references, since Spark writes ``$1`` where DuckDB writes ``\\1``;
    DuckDB needs the explicit ``'g'`` flag Spark always applies).

    Steps, in order: strip fragment → lowercase scheme+authority (path
    case preserved) → strip the default :80 port → strip ``www.`` →
    drop ``utm_*``/``ref`` tracking params → strip the trailing slash.

    This is the frontier-normalization pass the reference deliberately
    lacks (parse.go:88-131 stores hrefs verbatim); the engine applies it
    only behind ``CrawlConfig.canonical_keys`` (north_rule: "URL-seen
    set keyed on canonicalized+hashed URLs"), and the
    ``url_canonical_dedup`` query pair oracle-checks both dialects
    produce identical canonical forms."""
    g = ", 'g'" if dialect == "duck" else ""
    x = f"regexp_replace({u}, '#.*$', ''{g})"
    x = (
        f"concat(lower(regexp_extract({x}, '^([^/]*//[^/]*)', 1)), "
        f"regexp_extract({x}, '^[^/]*//[^/]*(.*)$', 1))"
        if dialect == "spark"
        else f"lower(regexp_extract({x}, '^([^/]*//[^/]*)', 1)) || "
        f"regexp_extract({x}, '^[^/]*//[^/]*(.*)$', 1)"
    )
    x = f"replace({x}, ':80/', '/')"
    x = f"regexp_replace({x}, ':80$', ''{g})"
    x = f"replace({x}, '://www.', '://')"
    x = f"regexp_replace({x}, '&(utm_[^&]*|ref=[^&]*)', ''{g})"
    x = f"regexp_replace({x}, '[?](utm_[^&]*|ref=[^&]*)$', ''{g})"
    x = (
        f"CASE WHEN {x} LIKE '%/' AND {x} NOT LIKE '%://' "
        f"THEN substring({x}, 1, length({x}) - 1) ELSE {x} END"
    )
    return x
