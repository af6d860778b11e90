"""Pure-Python replica of the HTML tokenization semantics owlcrawler depends on.

The reference (``/root/reference/parse/parse.go:33-131``) drives
``golang.org/x/net/html``'s *Tokenizer* (not the DOM parser) over raw page
bytes.  Byte-identical extraction output (BASELINE.json ``input_hint``)
therefore requires replicating the tokenizer's observable behavior exactly:

* token boundaries: StartTag / EndTag / SelfClosingTag / Text (comments,
  doctypes and bogus comments are consumed and dropped — the reference's
  switch ignores them, ``parse.go:45-82``),
* raw-text elements (``script`` with the full script-data escape states,
  ``style``/``iframe``/``xmp``/``noembed``/``noframes``/``noscript``/
  ``plaintext``) and RCDATA elements (``title``/``textarea``) whose text IS
  entity-unescaped,
* WHATWG character-reference decoding with Go's exact quirks (legacy
  no-semicolon longest-prefix fallback in text mode only, int32 wraparound
  on numeric overflow, windows-1252 C1 remapping),
* ``\r\n``/``\r`` → ``\n`` newline conversion before unescaping,
* ASCII-only case folding of tag/attribute names, duplicate attributes kept
  (the tokenizer does not dedup — only the DOM parser does),
* Go ``strings.TrimSpace`` (Unicode White_Space — narrower than Python's
  ``str.strip()``: U+001C..001F are NOT trimmed by Go),
* Go ``encoding/json`` string escaping for the golden ``text_json`` bytes
  (``<`` ``>`` ``&`` → ``\\u003c`` ``\\u003e`` ``\\u0026``, U+2028/29 escaped,
  each invalid byte → one U+FFFD).

Invalid UTF-8 round-trips as ``surrogateescape`` lone surrogates through
tokenization (Go tokenizes bytes; all tokenizer decisions are ASCII-driven)
and is replaced by U+FFFD only at JSON-serialization time, matching Go's
``json.Marshal`` (SURVEY.md §7 hard-part 2).
"""

from __future__ import annotations

import html.entities
import re

# --- token types -------------------------------------------------------------
TEXT = 0
START_TAG = 1
END_TAG = 2
SELF_CLOSING_TAG = 3

# x/net/html token.go readStartTag: tags that flag the next token as raw.
RAW_TAGS = frozenset(
    {"iframe", "noembed", "noframes", "noscript", "plaintext",
     "script", "style", "textarea", "title", "xmp"}
)
# RCDATA: x/net/html readRawOrRCDATA — textIsRaw = rawTag not in (textarea, title)
RCDATA_TAGS = frozenset({"textarea", "title"})

_TAG_WS = "\t\n\f\r "  # the tokenizer's in-tag whitespace set (readTagName etc.)

_ASCII_LOWER = str.maketrans(
    {c: chr(ord(c) + 32) for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"}
)

# Go unicode.IsSpace == Unicode White_Space property (strings.TrimSpace).
GO_WHITESPACE = frozenset(
    "\t\n\v\f\r \x85\xa0"
    "\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
    "\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000"
)


_GO_WS_CHARS = "".join(sorted(GO_WHITESPACE))


def go_trim_space(s: str) -> str:
    """Go strings.TrimSpace — trim Unicode White_Space only.

    ``str.strip(chars)`` strips exactly the characters in ``chars`` from
    both ends (C-speed), which is the same operation as Go's rune-set trim."""
    return s.strip(_GO_WS_CHARS)


# --- character references (x/net/html entity.go unescapeEntity) --------------

_ENTITIES = html.entities.html5  # same WHATWG table Go's entity.go is generated from
# Go constant longestEntityWithoutSemicolon (entity.go)
_LONGEST_NO_SEMI = 6

# WHATWG numeric-reference C1 remap table (entity.go replacementTable)
_C1_REPLACEMENTS = {
    0x80: "€", 0x81: "", 0x82: "‚", 0x83: "ƒ",
    0x84: "„", 0x85: "…", 0x86: "†", 0x87: "‡",
    0x88: "ˆ", 0x89: "‰", 0x8a: "Š", 0x8b: "‹",
    0x8c: "Œ", 0x8d: "", 0x8e: "Ž", 0x8f: "",
    0x90: "", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9d: "", 0x9e: "ž", 0x9f: "Ÿ",
}

_HEXDIGITS = "0123456789abcdefABCDEF"
_DIGITS = "0123456789"
_ALNUM = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def _int32_wrap(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def _encode_rune(x: int) -> str:
    """Go utf8.EncodeRune: invalid rune → U+FFFD."""
    if x < 0 or 0xD800 <= x <= 0xDFFF or x > 0x10FFFF:
        return "�"
    return chr(x)


def unescape(s: str, in_attribute: bool = False) -> str:
    """WHATWG character-reference decoding, bug-compatible with Go's
    ``html.unescape`` (entity.go)."""
    amp = s.find("&")
    if amp == -1:
        return s
    out = []
    i = 0
    n = len(s)
    while True:
        out.append(s[i:amp])
        i = amp  # s[i] == '&'
        j = i + 1
        if j < n and s[j] == "#":
            j += 1
            is_hex = False
            if j < n and s[j] in "xX":
                is_hex = True
                j += 1
            x = 0
            digits = _HEXDIGITS if is_hex else _DIGITS
            base = 16 if is_hex else 10
            ndig = 0
            while j < n:
                c = s[j]
                j += 1
                if c in digits:
                    x = _int32_wrap(x * base + int(c, 16))
                    ndig += 1
                    continue
                if c != ";":
                    j -= 1
                break
            if ndig == 0:
                # "&#" / "&#x" (/"&#;") with no digits — copied literally
                out.append(s[i:j])
            else:
                if 0x80 <= x <= 0x9F:
                    out.append(_C1_REPLACEMENTS[x])
                elif x == 0:
                    out.append("�")
                else:
                    out.append(_encode_rune(x))
            i = j
        else:
            # named reference: consume the max alnum run (+';' if present)
            while j < n:
                c = s[j]
                j += 1
                if c in _ALNUM:
                    continue
                if c != ";":
                    j -= 1
                break
            name = s[i + 1 : j]
            if not name:
                out.append("&")
                i += 1
            elif (
                in_attribute
                and not name.endswith(";")
                and j < n
                and s[j] == "="
            ):
                out.append(s[i:j])
                i = j
            elif name in _ENTITIES:
                out.append(_ENTITIES[name])
                i = j
            else:
                matched = False
                if not in_attribute:
                    max_len = min(len(name) - 1, _LONGEST_NO_SEMI)
                    for k in range(max_len, 1, -1):
                        prefix = name[:k]
                        if prefix in _ENTITIES:
                            out.append(_ENTITIES[prefix])
                            i = i + 1 + k
                            matched = True
                            break
                if not matched:
                    out.append(s[i:j])
                    i = j
        amp = s.find("&", i)
        if amp == -1:
            out.append(s[i:])
            break
    return "".join(out)


def _convert_newlines(s: str) -> str:
    """x/net/html convertNewlines: \\r\\n → \\n, \\r → \\n."""
    if "\r" not in s:
        return s
    return s.replace("\r\n", "\n").replace("\r", "\n")


# --- the tokenizer ------------------------------------------------------------


def _find_raw_end(sl: str, tag: str, i: int) -> tuple[int, bool]:
    """Scan raw text from ``i`` for ``</tag`` followed by a terminator
    (x/net/html readRawEndTag). Returns (end-of-text index, found)."""
    needle = "</" + tag
    ln = len(needle)
    n = len(sl)
    pos = i
    while True:
        j = sl.find(needle, pos)
        if j == -1:
            return n, False
        k = j + ln
        if k >= n:
            # EOF right after "</tag": Go readRawEndTag reads one more byte,
            # hits EOF → err; raw text runs to EOF.
            return n, False
        if sl[k] in "\t\n\f\r />":
            return j, True
        pos = j + 1


def _scan_script(s: str, sl: str, i: int) -> int:
    """x/net/html readScript — the HTML5 script-data state machine.

    Returns the index where script raw text ends (start of ``</script``
    or EOF)."""
    n = len(s)
    # states
    DATA, ESCAPED, DOUBLE = 0, 1, 2
    state = DATA
    while i < n:
        if state == DATA:
            lt = s.find("<", i)
            if lt == -1:
                return n
            i = lt + 1
            if i >= n:
                return n
            c = s[i]
            if c == "/":
                end, found = _match_raw_end_at(sl, "script", lt)
                if found:
                    return lt
                i = lt + 2 if lt + 2 <= n else n
            elif c == "!":
                # scriptDataEscapeStart
                if sl.startswith("--", i + 1):
                    state = ESCAPED
                    i += 3
                    # Go goes to scriptDataEscapedDashDash after "<!--"
                    i, state = _script_escaped_dash_dash(s, sl, i, ESCAPED, DOUBLE)
                    if i >= n:
                        return n
                else:
                    i += 1
            else:
                pass  # stay in DATA, continue after '<'
        elif state == ESCAPED:
            c = s[i]
            if c == "-":
                i += 1
                if i < n and s[i] == "-":
                    i += 1
                    i, state = _script_escaped_dash_dash(s, sl, i, ESCAPED, DOUBLE)
                elif i < n and s[i] == "<":
                    i, state = _script_escaped_lt(s, sl, i, ESCAPED, DOUBLE)
                    if state == -1:
                        return i
            elif c == "<":
                i, state = _script_escaped_lt(s, sl, i, ESCAPED, DOUBLE)
                if state == -1:
                    return i
            else:
                i += 1
        else:  # DOUBLE escaped
            c = s[i]
            if c == "-":
                i += 1
                if i < n and s[i] == "-":
                    i += 1
                    i, state = _script_double_dash_dash(s, sl, i)
            elif c == "<":
                i += 1
                if i < n and s[i] == "/":
                    # scriptDataDoubleEscapeEnd
                    end, found = _match_raw_end_at(sl, "script", i - 1)
                    if found:
                        # consume "</script>"-shaped end and go to ESCAPED
                        i = end
                        state = ESCAPED
                    else:
                        i += 1
            else:
                i += 1
    return n


def _match_raw_end_at(sl: str, tag: str, lt: int) -> tuple[int, bool]:
    """Check whether position ``lt`` (pointing at '<') begins ``</tag`` plus
    terminator. Returns (index just past the tag name, matched)."""
    needle = "</" + tag
    if not sl.startswith(needle, lt):
        return lt, False
    k = lt + len(needle)
    if k >= len(sl):
        return lt, False
    if sl[k] in "\t\n\f\r />":
        return k, True
    return lt, False


def _script_escaped_dash_dash(s, sl, i, ESCAPED, DOUBLE):
    """scriptDataEscapedDashDash: consume '-'*, then '>' → DATA, '<' →
    lessThanSign, else → ESCAPED."""
    n = len(s)
    while i < n and s[i] == "-":
        i += 1
    if i >= n:
        return i, ESCAPED
    if s[i] == ">":
        return i + 1, 0  # DATA
    if s[i] == "<":
        i, st = _script_escaped_lt(s, sl, i, ESCAPED, DOUBLE)
        return i, st
    return i + 1, ESCAPED


def _script_double_dash_dash(s, sl, i):
    """scriptDataDoubleEscapedDashDash: consume '-'*, then '>' → script
    DATA, else (including '<') → back to DOUBLE with the char left for the
    caller's loop to handle (matching x/net/html's goto targets: '<' goes
    to doubleEscapedLessThanSign — the DOUBLE loop's '<' branch — and any
    other char is consumed by doubleEscaped — the DOUBLE loop's else)."""
    n = len(s)
    while i < n and s[i] == "-":
        i += 1
    if i >= n:
        return i, 2  # DOUBLE; the caller's loop exits on i >= n
    if s[i] == ">":
        return i + 1, 0  # DATA
    return i, 2


def _script_escaped_lt(s, sl, i, ESCAPED, DOUBLE):
    """scriptDataEscapedLessThanSign at s[i]=='<'.

    Returns (new index, new state); state -1 means raw end found at index."""
    n = len(s)
    lt = i
    i += 1
    if i >= n:
        return i, ESCAPED
    c = s[i]
    if c == "/":
        end, found = _match_raw_end_at(sl, "script", lt)
        if found:
            return lt, -1
        return i + 1, ESCAPED
    if ("a" <= c <= "z") or ("A" <= c <= "Z"):
        # scriptDataDoubleEscapeStart
        if sl.startswith("script", i):
            k = i + 6
            if k < n and sl[k] in "\t\n\f\r />":
                return k + 1, DOUBLE
        return i, ESCAPED
    # Go: z.raw.end--; goto scriptData
    return i, 0


class Token:
    __slots__ = ("type", "data", "attrs")

    def __init__(self, type_: int, data: str, attrs=None):
        self.type = type_
        self.data = data
        self.attrs = attrs or []

    def __repr__(self):  # pragma: no cover
        return f"Token({self.type}, {self.data!r}, {self.attrs!r})"


def tokenize(s: str):
    """Yield Tokens over ``s`` exactly as x/net/html's Tokenizer + Token()
    would (comments/doctypes consumed silently)."""
    sl = s.translate(_ASCII_LOWER)
    n = len(s)
    i = 0
    raw_tag: str | None = None
    while i < n:
        if raw_tag is not None:
            tag = raw_tag
            if tag == "plaintext":
                # rawTag is never cleared for plaintext — text to EOF
                txt = _convert_newlines(s[i:])
                i = n
                if txt:
                    yield Token(TEXT, txt)
                break
            raw_tag = None
            if tag == "script":
                end = _scan_script(s, sl, i)
            else:
                end, _found = _find_raw_end(sl, tag, i)
            txt = s[i:end]
            i = end
            if txt:
                txt = _convert_newlines(txt)
                if tag in RCDATA_TAGS:
                    txt = unescape(txt, False)
                yield Token(TEXT, txt)
            continue

        # data state: accumulate text until a real tag / EOF
        text_start = i
        scan = i
        tag_kind = None
        tag_pos = n
        while True:
            lt = s.find("<", scan)
            if lt == -1 or lt + 1 >= n:
                # EOF (possibly right after '<'): trailing text includes '<'
                tag_pos = n
                break
            c = s[lt + 1]
            if ("a" <= c <= "z") or ("A" <= c <= "Z"):
                tag_kind = "start"
            elif c == "/":
                tag_kind = "end"
            elif c in "!?":
                tag_kind = "comment"
            else:
                scan = lt + 1  # '<' is literal text
                continue
            tag_pos = lt
            break
        if tag_pos > text_start:
            txt = unescape(_convert_newlines(s[text_start:tag_pos]), False)
            if txt:
                yield Token(TEXT, txt)
        i = tag_pos
        if i >= n:
            break

        # parse the construct at s[i] == '<'
        if tag_kind == "start":
            tok, i, rt = _read_start_tag(s, sl, i, n)
            if tok is None:
                break  # EOF mid-tag: dropped (ErrorToken)
            raw_tag = rt
            yield tok
        elif tag_kind == "end":
            j = i + 2
            if j >= n:
                # EOF right after "</": x/net/html breaks its loop with the
                # raw "</" still pending, and the post-loop raw.start < raw.end
                # check emits it as a final TextToken before ErrorToken.
                yield Token(TEXT, "</")
                break
            c = s[j]
            if c == ">":
                i = j + 1  # "</>" → empty comment, dropped
                continue
            # letter guaranteed? no — "</" + non-letter, non-'>' → bogus comment
            if ("a" <= c <= "z") or ("A" <= c <= "Z"):
                tok, i = _read_end_tag(s, sl, j, n)
                if tok is None:
                    break
                yield tok
            else:
                i = _read_until_close_angle(s, j)
        else:  # comment / markup declaration
            c = s[i + 1]
            if c == "?":
                i = _read_until_close_angle(s, i + 2)
            else:  # '!'
                i = _read_markup_declaration(s, sl, i + 2, n)
    return


def _read_until_close_angle(s: str, i: int) -> int:
    j = s.find(">", i)
    return len(s) if j == -1 else j + 1


def _read_markup_declaration(s: str, sl: str, i: int, n: int) -> int:
    """After "<!". Handles comments, doctype, bogus comments (CDATA is bogus:
    tokenizer AllowCDATA defaults false)."""
    if i + 2 > n:
        return n
    if s.startswith("--", i):
        return _read_comment(s, i + 2, n)
    if sl.startswith("doctype", i):
        return _read_until_close_angle(s, i + 7)
    return _read_until_close_angle(s, i)


def _read_comment(s: str, i: int, n: int) -> int:
    """After "<!--"; x/net/html readComment (dashCount starts at 2 so
    "<!-->" and "<!--->" terminate immediately)."""
    dash_count = 2
    while i < n:
        c = s[i]
        i += 1
        if c == "-":
            dash_count += 1
        elif c == ">":
            if dash_count >= 2:
                return i
            dash_count = 0
        elif c == "!":
            if dash_count >= 2 and i < n and s[i] == ">":
                return i + 1
            dash_count = 0
        else:
            dash_count = 0
    return n


def _read_tag_guts(s: str, sl: str, i: int, n: int, save_attr: bool):
    """readTag: parse tag name + attributes starting at the first char of
    the tag name. Returns (name, attrs, self_closing, new_i) or EOF → None."""
    # readTagName
    start = i
    while i < n:
        c = s[i]
        if c in _TAG_WS:
            name = sl[start:i]
            i += 1
            break
        if c in "/>":
            name = sl[start:i]
            break
        i += 1
    else:
        return None  # EOF inside tag name
    attrs = []
    # skipWhiteSpace
    while i < n and s[i] in _TAG_WS:
        i += 1
    if i >= n:
        return None
    last_slash = -1
    while True:
        if i >= n:
            return None
        c = s[i]
        if c == ">":
            self_closing = last_slash == i - 1
            i += 1
            return name, attrs, self_closing, i
        # readTagAttrKey
        kstart = i
        kend = -1
        while i < n:
            c = s[i]
            i += 1
            if c in _TAG_WS or c == "/":
                kend = i - 1
                if c == "/":
                    last_slash = i - 1
                break
            if c == "=":
                if kstart + 1 == i:
                    continue  # '=' as first char joins the name
                i -= 1
                kend = i
                break
            if c == ">":
                i -= 1
                kend = i
                break
        if kend == -1:
            return None  # EOF in key
        key = sl[kstart:kend]
        # readTagAttrVal
        val = ""
        while i < n and s[i] in _TAG_WS:
            i += 1
        if i >= n:
            return None
        if s[i] == "=":
            i += 1
            while i < n and s[i] in _TAG_WS:
                i += 1
            if i >= n:
                return None
            quote = s[i]
            if quote == ">":
                pass  # empty value, '>' handled next loop
            elif quote in "'\"":
                i += 1
                vend = s.find(quote, i)
                if vend == -1:
                    return None  # EOF in quoted value
                val = s[i:vend]
                i = vend + 1
            else:
                vstart = i
                while i < n:
                    c = s[i]
                    i += 1
                    if c in _TAG_WS:
                        val = s[vstart : i - 1]
                        break
                    if c == ">":
                        i -= 1
                        val = s[vstart:i]
                        break
                else:
                    return None  # EOF in unquoted value
                last_slash = -1
        if save_attr and key:
            attrs.append((key, unescape(_convert_newlines(val), True)))
        while i < n and s[i] in _TAG_WS:
            i += 1
        if i >= n:
            return None


def _read_start_tag(s: str, sl: str, i: int, n: int):
    """At s[i]=='<', s[i+1] is a letter. Returns (Token|None, new_i, raw_tag)."""
    res = _read_tag_guts(s, sl, i + 1, n, True)
    if res is None:
        return None, n, None
    name, attrs, self_closing, j = res
    raw_tag = name if name in RAW_TAGS else None
    # NOTE x/net/html quirk: rawTag is set BEFORE the self-closing check,
    # so even "<title/>" enters RCDATA mode.
    tt = SELF_CLOSING_TAG if self_closing else START_TAG
    return Token(tt, name, attrs), j, raw_tag


def _read_end_tag(s: str, sl: str, i: int, n: int):
    """At the first letter after "</". Attrs parsed but dropped (Token()
    keeps only the name for end tags)."""
    res = _read_tag_guts(s, sl, i, n, False)
    if res is None:
        return None, n
    name, _attrs, _sc, j = res
    return Token(END_TAG, name), j


# --- Go encoding/json string escaping ----------------------------------------

_JSON_ESCAPE = {
    '"': '\\"',
    "\\": "\\\\",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "<": "\\u003c",
    ">": "\\u003e",
    "&": "\\u0026",
    "\u2028": "\\u2028",
    "\u2029": "\\u2029",
}


# every code point Go's encoder does not copy verbatim: the two JSON
# metachars, all C0 controls (\n \r \t have short escapes, the rest \u00xx),
# the escapeHTML set, U+2028/29, and lone surrogates (invalid UTF-8 markers)
_JSON_SPECIAL = re.compile(
    '["\\\\<>&\x00-\x1f\u2028\u2029\ud800-\udfff]'
)


def _json_escape_char(m: "re.Match[str]") -> str:
    ch = m.group()
    esc = _JSON_ESCAPE.get(ch)
    if esc is not None:
        return esc
    o = ord(ch)
    if o < 0x20:
        return f"\\u{o:04x}"
    return "�"  # lone surrogate


def go_json_string(s: str) -> str:
    """Go json.Marshal string escaping (escapeHTML=true default).

    Lone surrogates (from surrogateescape decoding of invalid UTF-8) become
    one U+FFFD each — Go replaces each invalid byte with U+FFFD at marshal
    time (encoding/json encodeState.string). Fast path: clean strings (the
    overwhelming majority of extracted lines) are copied whole; the regex
    visits only the characters that need escaping."""
    if _JSON_SPECIAL.search(s) is None:
        return f'"{s}"'
    return f'"{_JSON_SPECIAL.sub(_json_escape_char, s)}"'


def sanitize_utf8(s: str) -> str:
    """Replace surrogateescape lone surrogates with U+FFFD (for columns that
    must be valid UTF-8 for Arrow transfer)."""
    try:
        s.encode("utf-8")
        return s
    except UnicodeEncodeError:
        return "".join(
            "�" if 0xD800 <= ord(c) <= 0xDFFF else c for c in s
        )
