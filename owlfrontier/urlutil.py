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

    This is the frontier-normalization pass the reference deliberately
    lacks (parse.go:88-131 stores hrefs verbatim); the engine applies it
    only behind ``CrawlConfig.canonical_keys`` (north_rule: "URL-seen
    set keyed on canonicalized+hashed URLs"), and the
    ``url_canonical_dedup`` query pair oracle-checks both dialects
    produce identical canonical forms.

    The chain DECOMPOSES the URL into authority / path / query and
    transforms each part in its own scope (round-5 review fixes): the
    default-port strip is anchored to the END of the authority and
    scheme-conditional (:80 only for http, :443 only for https — never
    a ':80' inside a path or query, never a real https :80), tracking
    params are removed by SPLITTING the query on '&' and filtering
    exact 'utm_'/'ref=' prefixes (a '&utm_' inside the path no longer
    matches; a leading utm param followed by a real one is removed),
    and URLs with no '<scheme>://' authority pass through UNCHANGED
    instead of collapsing to the empty string. Steps: strip fragment →
    lowercase scheme+authority (path case preserved) → strip the
    scheme's default port → strip ``www.`` → drop ``utm_*``/``ref``
    params from the query → strip trailing slashes from the path."""
    spark = dialect == "spark"
    g = "" if spark else ", 'g'"

    def cat(*parts: str) -> str:
        if spark:
            return "concat(" + ", ".join(parts) + ")"
        return "(" + " || ".join(parts) + ")"

    nofrag = f"regexp_replace({u}, '#.*$', ''{g})"
    auth = f"lower(regexp_extract({nofrag}, '^([^/?#]*//[^/?#]*)', 1))"
    rest = f"substring({nofrag}, length({auth}) + 1)"
    path = f"regexp_extract({rest}, '^([^?]*)', 1)"
    query = f"regexp_extract({rest}, '^[^?]*[?](.*)$', 1)"
    # default port: anchored to the authority's end, per-scheme
    auth = (
        f"CASE WHEN {auth} LIKE 'http://%' "
        f"THEN regexp_replace({auth}, ':80$', ''{g}) "
        f"WHEN {auth} LIKE 'https://%' "
        f"THEN regexp_replace({auth}, ':443$', ''{g}) "
        f"ELSE {auth} END"
    )
    auth = f"replace({auth}, '://www.', '://')"
    # tracking params: split the QUERY (only) on '&', drop exact
    # utm_/ref= prefixes, rejoin — order-preserving, position-blind
    if spark:
        query = (
            f"array_join(filter(split({query}, '&'), "
            f"p -> NOT (substring(p, 1, 4) IN ('utm_', 'ref='))), '&')"
        )
    else:
        query = (
            f"array_to_string(list_filter(string_split({query}, '&'), "
            f"p -> NOT (p[1:4] IN ('utm_', 'ref='))), '&')"
        )
    path = f"regexp_replace({path}, '/+$', ''{g})"  # idempotent strip
    canon = cat(
        auth,
        path,
        f"CASE WHEN {query} <> '' THEN {cat(chr(39) + '?' + chr(39), query)} "
        f"ELSE '' END",
    )
    scheme_re = "'^[a-zA-Z][a-zA-Z0-9+.-]*://'"
    guard = (
        f"{u} rlike {scheme_re}"
        if spark
        else f"regexp_matches({u}, {scheme_re})"
    )
    return f"CASE WHEN {guard} THEN {canon} ELSE {u} END"
