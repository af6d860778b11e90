"""Extraction invariant tests.

Ports the reference's own unit tests verbatim
(``/root/reference/parse/parse_test.go:121-146``) and adds the
tokenizer-semantics edge fixtures of FIXTURES.md §3.2 (one per rule in
SURVEY.md §2.3).
"""

import re

import pytest

from owlfrontier.extract import (
    doc_id_for_url,
    extract_full,
    extract_page,
    page_structure_json,
)
from owlfrontier.gotok import go_trim_space, unescape


def _reference_docs():
    src = open("/root/reference/parse/parse_test.go").read()
    return re.findall(r"var doc\d = `(.*?)`", src, re.S)


DOC1, DOC2 = _reference_docs()


# --- reference test ports (parse_test.go) -------------------------------------


def test_extract_text_doc1():
    page = extract_page(DOC1, "http://drhayleybauman.com")
    assert page["title"] == (
        "Psychologist - Asheville - Hendersonville - North Carolina - "
        "Hayley J. Bauman, Psy.D - Therapy - Etowah - Brevard"
    )
    assert len(page["h1"]) == 1
    assert len(page["h2"]) == 1


def test_extract_text_noscript_doc2():
    page = extract_page(DOC2, "http://x.com")
    assert page["text"] == []


def test_extract_links_doc1():
    page = extract_page(DOC1, "http://drhayleybauman.com")
    assert len(page["links_candidate"]) == 6
    assert page["links_candidate"] == [
        "http://drhayleybauman.com/educationandtraining.html",
        "http://drhayleybauman.com/frequentlyaskedquestions.html",
        "http://drhayleybauman.com/psychologyresources.html",
        "http://drhayleybauman.com/gettingstarted.html",
        "http://drhayleybauman.com/serendipity_and_the_search_for_true_self.html",
        "http://drhayleybauman.com/contact.html",
    ]
    # store-only links: '#' and the 3 absolute links; <link href> tags excluded
    assert page["links_all"][0] == "#"
    assert len(page["links_all"]) == 10
    assert (
        "http://www.amazon.com/Serendipity-Search-Psy-D-Hayley-Bauman/dp/"
        "1607027674" in page["links_all"]
    )
    assert not any("bootstrap" in u for u in page["links_all"])


def test_doc1_golden_json_shape():
    page = extract_page(DOC1, "http://drhayleybauman.com")
    j = page_structure_json(page)
    assert j.startswith('{"title":"Psychologist - Asheville')
    assert '"h1":["Hayley J. Bauman, Psy.D"]' in j
    assert '"h2":["Licensed Psychologist"]' in j
    # doc1 has no h3/h4 → omitempty
    assert '"h3"' not in j and '"h4"' not in j
    # Go escapes & → & inside JSON strings; doc1 text has none, but
    # quotes inside the blockquote must be escaped
    assert '\\"Our deepest fear' in j


def test_doc2_golden_json_is_empty_object():
    page = extract_page(DOC2, "http://x.com")
    assert page_structure_json(page) == "{}"


# --- FIXTURES.md §3.2 edge fixtures --------------------------------------------


def test_nested_heading_ejection():
    page = extract_page("<h1>a <em>b</em> c</h1>", "http://h/")
    assert page["h1"] == ["a"]
    assert page["text"] == ["b", "c"]


def test_br_selfclosing_vs_start():
    p1 = extract_page("<h1>a<br/>b</h1>", "http://h/")
    assert p1["h1"] == ["a", "b"] and p1["text"] == []
    p2 = extract_page("<h1>a<br>b</h1>", "http://h/")
    assert p2["h1"] == ["a"] and p2["text"] == ["b"]


def test_title_last_nonempty_wins():
    page = extract_page(
        "<title>first</title><p>x</p><title>second</title>", "http://h/"
    )
    assert page["title"] == "second"
    page = extract_page("<title>first</title><title>  </title>", "http://h/")
    assert page["title"] == "first"


def test_entities_unescaped_then_json_reescaped():
    page = extract_page("<p>a &amp; b</p>", "http://h/")
    assert page["text"] == ["a & b"]
    assert page_structure_json(page) == '{"text":["a \\u0026 b"]}'


def test_style_text_included_script_excluded():
    page = extract_page("<style>.x{}</style><script>var x=1;</script>", "http://h/")
    assert page["text"] == [".x{}"]


def test_trim_rune_set_is_go_not_python():
    # U+001C is trimmed by Python str.strip() but NOT by Go TrimSpace
    page = extract_page("<p>\x1cpayload\x1c</p>", "http://h/")
    assert page["text"] == ["\x1cpayload\x1c"]
    # U+00A0 and U+0085 ARE trimmed by Go
    page = extract_page("<p>\xa0\x85 padded \xa0</p>", "http://h/")
    assert page["text"] == ["padded"]


def test_duplicate_href_both_recorded():
    page = extract_page('<a href="/x" href="/x">t</a>', "http://h.example")
    assert page["links_all"] == ["http://h.example/x", "http://h.example/x"]
    assert page["links_candidate"] == [
        "http://h.example/x",
        "http://h.example/x",
    ]


def test_href_resolution_rules():
    html = (
        '<a href="//other.example/p">a</a>'
        '<a href="/p">b</a>'
        '<a href="http://abs.example/p">c</a>'
        '<a href="#frag">d</a>'
        '<a href="mailto:x@y">e</a>'
        '<a href="">f</a>'
        '<a href="rel.html">g</a>'
    )
    page = extract_page(html, "https://me.example:8080/page")
    assert page["links_candidate"] == [
        "https://other.example/p",
        "https://me.example:8080/p",
    ]
    assert page["links_all"] == [
        "https://other.example/p",
        "https://me.example:8080/p",
        "http://abs.example/p",
        "#frag",
        "mailto:x@y",
        "",
        "rel.html",
    ]


def test_self_closing_anchor_ignored():
    page = extract_page('<a href="/x"/>', "http://h/")
    assert page["links_all"] == []


def test_non_anchor_hrefs_ignored():
    page = extract_page(
        '<link href="/css"><area href="/a"><base href="/b">', "http://h/"
    )
    assert page["links_all"] == []


def test_uppercase_tags_normalized():
    page = extract_page("<TITLE>t</TITLE><H1>h</H1>", "http://h/")
    assert page["title"] == "t"
    assert page["h1"] == ["h"]


def test_comments_doctype_cdata_dropped():
    page = extract_page(
        "<!DOCTYPE html><!-- comment --><p>a</p><![CDATA[ignored]]><p>b</p>",
        "http://h/",
    )
    assert page["text"] == ["a", "b"]


def test_rcdata_title_entities():
    page = extract_page("<title>a &lt; b</title>", "http://h/")
    assert page["title"] == "a < b"
    assert page_structure_json(page) == '{"title":"a \\u003c b"}'


def test_textarea_rcdata_content_is_text():
    # <textarea> is raw-until-close: inner markup is NOT tags
    page = extract_page("<textarea><p>x</p></textarea>", "http://h/")
    assert page["text"] == ["<p>x</p>"]


def test_script_escape_states():
    # "<!--" inside script enters escaped state: "</script>" inside a
    # double-escaped block does not terminate the element
    html = (
        "<script><!-- document.write('<script>inner</script>') --></script>"
        "<p>after</p>"
    )
    page = extract_page(html, "http://h/")
    assert page["text"] == ["after"]


def test_script_plain_close():
    page = extract_page("<script>var a = '<p>';</script><p>t</p>", "http://h/")
    assert page["text"] == ["t"]


def test_invalid_utf8_fffd_only_in_json():
    rec = extract_full(b"<p>a\xffb</p>", "http://h/")
    # tokenization kept the byte; JSON replaced it with one U+FFFD
    assert rec["text_json"] == '{"text":["a�b"]}'
    assert rec["text"] == ["a�b"]


def test_multibyte_invalid_sequence_one_fffd_per_byte():
    rec = extract_full(b"<p>a\xe2\x28b</p>", "http://h/")
    # \xe2 is an invalid start of sequence here -> 1 FFFD, \x28 is '('
    assert rec["text_json"] == '{"text":["a�(b"]}'


def test_literal_lt_in_text():
    page = extract_page("<p>a < b</p>", "http://h/")
    assert page["text"] == ["a < b"]


def test_attr_value_entity_modes():
    # "&amp=" in attribute mode stays literal (legacy + '=' rule)
    page = extract_page('<a href="/x?a&amp=1">t</a>', "http://h.example")
    assert page["links_all"] == ["http://h.example/x?a&amp=1"]
    # with semicolon it decodes
    page = extract_page('<a href="/x?a&amp;b=1">t</a>', "http://h.example")
    assert page["links_all"] == ["http://h.example/x?a&b=1"]


def test_plaintext_swallows_rest():
    page = extract_page("<p>a</p><plaintext><p>b</p><h1>c", "http://h/")
    assert page["text"] == ["a", "<p>b</p><h1>c"]


def test_eof_mid_tag_dropped():
    page = extract_page("<p>text</p><div class=", "http://h/")
    assert page["text"] == ["text"]


def test_doc_id_base64url_with_padding():
    # Go base64.URLEncoding keeps '=' padding (couchdb.go:148-151)
    assert doc_id_for_url("http://a.b/c") == "aHR0cDovL2EuYi9j"
    assert doc_id_for_url("http://a.b/cd") == "aHR0cDovL2EuYi9jZA=="
    assert "+" not in doc_id_for_url("http://x/?q=\xff\xfe~~~")


def test_go_trim_space_exact_set():
    assert go_trim_space(" x　") == "x"
    assert go_trim_space("\x1fx") == "\x1fx"


def test_unescape_legacy_prefix_fallback_text_only():
    assert unescape("&notit;", False) == "\xacit;"
    assert unescape("&notit;", True) == "&notit;"


def test_eof_right_after_end_tag_open():
    """Payload ending exactly with '</': x/net/html breaks its Next() loop
    with the raw '</' pending and emits it as a trailing TextToken (the
    post-loop ``raw.start < raw.end`` path) — it must not crash."""
    assert extract_page("abc</", "http://x/")["text"] == ["abc", "</"]
    assert extract_page("</", "http://x/")["text"] == ["</"]
    page = extract_page("<h1>x</h1>tail</", "http://x/")
    assert page["h1"] == ["x"] and page["text"] == ["tail", "</"]
    # binary payload ending with '</' through the full-record path
    rec = extract_full(b"\xff\xfe</", "http://x/")
    rec["text_json"].encode("utf-8")
    # EOF *inside* an end-tag name stays a dropped ErrorToken (readTag errs)
    assert extract_page("abc</a", "http://x/")["text"] == ["abc"]


def test_script_double_escaped_states():
    """HTML5 script-data DOUBLE-escaped states (x/net/html readScript):
    found by fuzzing — the doubleEscapedDashDash state was unimplemented
    and crashed on '<script><!--<script>…--' payloads."""
    # '-->' inside double-escape returns to script DATA → first </script>
    # terminates; following text is ordinary
    assert extract_page("<script><!--<script>--></script>x",
                        "http://h/")["text"] == ["x"]
    # '</script>' inside double-escape only drops back to ESCAPED; '-->'
    # then exits to DATA and the next </script> ends the element
    assert extract_page("<script><!--<script></script>-->z</script>w",
                        "http://h/")["text"] == ["w"]
    # without '-->', the outer element continues past the inner </script>
    assert extract_page("<script><!--<script>a</script>b--></script>tail",
                        "http://h/")["text"] == ["tail"]
    # original crash shapes must not raise
    for payload in (
        "<script>=B<!--<script>T<title>--!></script>#c",
        "<script><!--<script>d--",
        "<script><!--<script>-",
    ):
        page_structure_json(extract_page(payload, "http://h/")).encode()


def test_numeric_entity_quirks():
    assert unescape("&#x80;", False) == "€"  # C1 → windows-1252
    assert unescape("&#0;", False) == "�"
    assert unescape("&#xD800;", False) == "�"
    assert unescape("&#1114112;", False) == "�"  # > 0x10FFFF
    assert unescape("&#", False) == "&#"
    assert unescape("&#x;", False) == "&#x;"


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
