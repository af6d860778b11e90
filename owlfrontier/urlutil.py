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
