"""WARC source tests: round-trip through write_warc/parse_warc, plain and
per-record-gzip (the Common Crawl layout), the Spark reader's schema and
filtering, and WARC → pages table → the REAL extraction pipeline."""

import datetime as dt

from owlfrontier.warc import (
    pages_from_warc,
    parse_warc,
    read_warc,
    write_warc,
)


def _http(body: bytes, status: int = 200,
          ctype: bytes = b"text/html") -> bytes:
    return (
        b"HTTP/1.1 " + str(status).encode() + b" X\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        b"\r\n" + body
    )


def _fixture_records():
    return [
        {"url": "http://a.example/p1", "date": "2026-01-02T03:04:05Z",
         "payload": _http(b"<title>T1</title><p>hello world</p>")},
        {"url": "http://a.example/req", "date": "2026-01-02T03:04:06Z",
         "warc_type": "request",  # must be skipped
         "payload": b"GET /p1 HTTP/1.1\r\n\r\n"},
        {"url": "http://b.example/img", "date": "2026-01-02T03:04:07Z",
         "payload": _http(b"\x89PNG...", ctype=b"image/png")},
        {"url": "http://b.example/gone", "date": "2026-01-02T03:04:08Z",
         "payload": _http(b"nope", status=404)},
    ]


def test_parse_roundtrip_plain_and_gzip():
    for gz in (False, True):
        data = write_warc(_fixture_records(), gzip_per_record=gz)
        recs = list(parse_warc(data))
        assert [r["url"] for r in recs] == [
            "http://a.example/p1", "http://b.example/img",
            "http://b.example/gone",
        ]  # the request record is skipped
        assert recs[0]["html"] == b"<title>T1</title><p>hello world</p>"
        assert recs[0]["http_status"] == 200
        assert recs[0]["content_type"] == "text/html"
        assert recs[2]["http_status"] == 404


def test_truncated_tail_record_dropped():
    data = write_warc(_fixture_records()[:1])
    assert len(list(parse_warc(data[:-10]))) == 0  # body cut short
    assert len(list(parse_warc(data + b"WARC/1.0\r\nCon"))) == 1


def test_spark_reader_and_pages_schema(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(write_warc(_fixture_records()))
    (tmp_path / "b.warc.gz").write_bytes(
        write_warc([
            {"url": "http://c.example/p9", "date": "2026-01-03T00:00:00Z",
             "payload": _http(b"<p>gz page</p>")},
        ], gzip_per_record=True)
    )
    df = read_warc(spark, str(tmp_path))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {
        "http://a.example/p1", "http://b.example/img",
        "http://b.example/gone", "http://c.example/p9",
    }
    assert rows["http://a.example/p1"]["warc_ts"] == dt.datetime(
        2026, 1, 2, 3, 4, 5
    )
    assert rows["http://c.example/p9"]["warc_file"].endswith("b.warc.gz")

    pages = pages_from_warc(spark, str(tmp_path), lang="en")
    prows = {r["url"]: r for r in pages.collect()}
    # only successful text/html responses become pages
    assert set(prows) == {"http://a.example/p1", "http://c.example/p9"}
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]


def test_warc_pages_flow_through_extraction(spark, tmp_path):
    """The WARC-sourced pages table drives the real extraction UDF — the
    byte-contract path is source-agnostic."""
    import json

    from pyspark.sql import functions as F

    from owlfrontier.extract import extraction_udf

    (tmp_path / "c.warc").write_bytes(write_warc([
        {"url": "http://a.example/p1", "date": "2026-01-02T03:04:05Z",
         "payload": _http(
             b'<title>T1</title><p>hello world</p><a href="/n">n</a>'
         )},
    ]))
    pages = pages_from_warc(spark, str(tmp_path), lang="en")
    out = pages.withColumn(
        "ex", extraction_udf()(F.col("html"), F.col("url"))
    ).select("url", "ex.title", "ex.text_json", "ex.links_all").collect()
    assert out[0]["title"] == "T1"
    assert json.loads(out[0]["text_json"])["title"] == "T1"
    assert out[0]["links_all"] == ["http://a.example/n"]


def test_export_warc_roundtrip(spark, tmp_path):
    """WARC sink → WARC source round-trip: exporting a pages frame and
    re-reading it preserves every (url, warc_ts, html) triple."""
    from owlfrontier.synthweb import synth_pages
    from owlfrontier.warc import export_warc

    pages = synth_pages(spark, 300, n_hosts=6, partitions=3).select(
        "url", "warc_ts", "html"
    )
    out = str(tmp_path / "warc_out")
    export_warc(pages, out)
    back = read_warc(spark, out)
    import os

    files = sorted(os.listdir(out))
    assert files and all(f.endswith(".warc.gz") for f in files)
    orig = {(r["url"], r["warc_ts"], bytes(r["html"]))
            for r in pages.collect()}
    got = {(r["url"], r["warc_ts"], bytes(r["html"]))
           for r in back.collect()}
    assert got == orig
    assert back.count() == 300


def test_warc_roundtrip_property():
    """Property: write_warc∘parse_warc is the identity on response
    records for arbitrary body bytes (including CRLF runs, WARC/ header
    look-alikes, and gzip magic inside bodies), in both layouts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    record = st.fixed_dictionaries({
        "url": st.from_regex(r"http://[a-z]{1,8}\.example/[a-zA-Z0-9/_-]{0,20}",
                             fullmatch=True),
        "body": st.binary(max_size=300),
    })

    @settings(max_examples=150, deadline=None)
    @given(st.lists(record, max_size=6), st.booleans())
    def check(recs, gz):
        payloads = [
            {"url": r["url"], "date": f"2026-01-01T00:00:{i % 60:02d}Z",
             "payload": _http(r["body"])}
            for i, r in enumerate(recs)
        ]
        out = list(parse_warc(write_warc(payloads, gzip_per_record=gz)))
        assert [(o["url"], o["html"]) for o in out] == [
            (r["url"], r["body"]) for r in recs
        ]
        assert all(o["http_status"] == 200 for o in out)

    check()
