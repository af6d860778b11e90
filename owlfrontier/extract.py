"""Text + link extraction with the reference's exact semantics.

Replicates ``parse.ExtractText`` (``/root/reference/parse/parse.go:33-85``)
and ``parse.ExtractLinks`` (``/root/reference/parse/parse.go:88-131``) over
the x/net/html-faithful tokenizer in :mod:`owlfrontier.gotok`, and serializes
``PageStructure`` with Go ``encoding/json`` rules (field order
title,h1,h2,h3,h4,text; ``omitempty``; HTML-escape of ``<`` ``>`` ``&`` —
``parse.go:14-21``) so that ``text_json`` is byte-identical to what the Go
extractor would store.

Spark surface: a single Arrow-vectorized pandas UDF (no per-row Python rows
cross the JVM↔Python boundary one at a time — BASELINE.json ``input_hint``)
computing both extractions in one tokenizer pass (the reference runs two
passes over identical token streams — ``extractor.go:48-49`` — which is
observationally equivalent).
"""

from __future__ import annotations

import base64
from urllib.parse import urlsplit

from owlfrontier import gotok
from owlfrontier.gotok import (
    END_TAG,
    SELF_CLOSING_TAG,
    START_TAG,
    TEXT,
    go_json_string,
    go_trim_space,
    sanitize_utf8,
    tokenize,
)

_HEADING_ATOMS = frozenset({"title", "h1", "h2", "h3", "h4", "script"})


def extract_page(payload: str, original_url: str) -> dict:
    """One tokenizer pass computing both ExtractText and ExtractLinks.

    Returns dict with keys title (str), h1..h4, text (list[str]),
    links_all (toStore, parse.go:109/116/122), links_candidate (the
    resolvable ``//``/``/``-prefixed links that the reference would offer to
    its ``shouldFetch`` gate, parse.go:107-120 — the seen-check itself is
    hoisted to the set-level anti-join, SURVEY.md O11).
    """
    title = ""
    h1: list[str] = []
    h2: list[str] = []
    h3: list[str] = []
    h4: list[str] = []
    text: list[str] = []
    links_all: list[str] = []
    links_candidate: list[str] = []

    # Go url.Parse(originalURL) → link.Scheme / link.Host (parse.go:89)
    try:
        sp = urlsplit(original_url)
        scheme = sp.scheme
        # Go's URL.Host excludes userinfo; urlsplit netloc includes it.
        host = sp.netloc.rpartition("@")[2]
    except ValueError:
        scheme, host = "", ""

    tok = None  # the single-atom state of parse.go:37
    for t in tokenize(payload):
        tt = t.type
        if tt == START_TAG:
            name = t.data
            # parse.go:46-61 — known atoms set state, everything else resets
            tok = name if name in _HEADING_ATOMS else None
            if name == "a":
                # parse.go:103-126 — every href attr, duplicates included
                for key, val in t.attrs:
                    if key != "href":
                        continue
                    if val.startswith("//"):
                        url = f"{scheme}:{val}"
                        links_all.append(url)
                        links_candidate.append(url)
                    elif val.startswith("/"):
                        url = f"{scheme}://{host}{val}"
                        links_all.append(url)
                        links_candidate.append(url)
                    else:
                        links_all.append(val)
        elif tt == END_TAG:
            tok = None  # parse.go:62-63
        elif tt == TEXT:
            txt = go_trim_space(t.data)
            if not txt:
                continue
            if tok == "title":
                title = txt  # assignment — last non-empty chunk wins
            elif tok == "h1":
                h1.append(txt)
            elif tok == "h2":
                h2.append(txt)
            elif tok == "h3":
                h3.append(txt)
            elif tok == "h4":
                h4.append(txt)
            elif tok == "script":
                continue  # parse.go:77-78
            else:
                text.append(txt)
        # SELF_CLOSING_TAG: not in the reference's switch (parse.go:45) —
        # state survives <br/>; and self-closing <a/> contributes no links.
        elif tt == SELF_CLOSING_TAG:
            pass

    return {
        "title": title,
        "h1": h1,
        "h2": h2,
        "h3": h3,
        "h4": h4,
        "text": text,
        "links_all": links_all,
        "links_candidate": links_candidate,
    }


def page_structure_json(page: dict) -> str:
    """Go ``json.Marshal(parse.PageStructure)`` — exact bytes.

    Field order and omitempty per the struct tags at parse.go:14-21."""
    parts = []
    if page["title"]:
        parts.append('"title":' + go_json_string(page["title"]))
    for field in ("h1", "h2", "h3", "h4", "text"):
        vals = page[field]
        if vals:
            parts.append(
                f'"{field}":[' + ",".join(go_json_string(v) for v in vals) + "]"
            )
    return "{" + ",".join(parts) + "}"


def doc_id_for_url(url: str) -> str:
    """CouchDB doc id: RFC 4648 URL-safe base64 WITH padding of the URL
    bytes (Go base64.URLEncoding — couchdb.go:148-151, fetcher.go:64)."""
    return base64.urlsafe_b64encode(
        url.encode("utf-8", "surrogateescape")
    ).decode("ascii")


def decode_html(html_bytes: bytes | bytearray | memoryview | None) -> str:
    """Bytes → str the way Go treats bytes-as-string: preserve invalid
    sequences (surrogateescape) until serialization (SURVEY.md §7.2)."""
    if html_bytes is None:
        return ""
    return bytes(html_bytes).decode("utf-8", "surrogateescape")


def extract_full(html_bytes, url: str) -> dict:
    """Full extraction record for one page: arrays sanitized for Arrow,
    ``text_json`` carrying the byte-identity contract."""
    payload = decode_html(html_bytes)
    page = extract_page(payload, url if url is not None else "")
    text_json = page_structure_json(page)
    return {
        "title": sanitize_utf8(page["title"]),
        "h1": [sanitize_utf8(v) for v in page["h1"]],
        "h2": [sanitize_utf8(v) for v in page["h2"]],
        "h3": [sanitize_utf8(v) for v in page["h3"]],
        "h4": [sanitize_utf8(v) for v in page["h4"]],
        "text": [sanitize_utf8(v) for v in page["text"]],
        "text_json": sanitize_utf8(text_json),
        "links_all": [sanitize_utf8(v) for v in page["links_all"]],
        "links_candidate": [sanitize_utf8(v) for v in page["links_candidate"]],
        "doc_id": doc_id_for_url(url if url is not None else ""),
    }


# --- Spark surface ------------------------------------------------------------

EXTRACT_SCHEMA_DDL = (
    "title string, h1 array<string>, h2 array<string>, h3 array<string>, "
    "h4 array<string>, text array<string>, text_json string, "
    "links_all array<string>, links_candidate array<string>, doc_id string"
)


def extraction_udf():
    """Arrow-vectorized scalar pandas UDF: (html binary, url string) →
    extraction struct. Spark-import deferred so the pure functions above
    stay usable without a JVM (they feed the oracle simulator too)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _extract(html: "pd.Series", url: "pd.Series") -> "pd.DataFrame":
        recs = [
            extract_full(h, u)
            for h, u in zip(html.tolist(), url.tolist())
        ]
        return pd.DataFrame.from_records(recs)

    _extract.__annotations__ = {
        "html": pd.Series,
        "url": pd.Series,
        "return": pd.DataFrame,
    }
    return pandas_udf(EXTRACT_SCHEMA_DDL)(_extract)
