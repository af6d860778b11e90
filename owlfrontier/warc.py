"""WARC ingestion — the Common-Crawl container format → the engine's pages
table (BASELINE.json input_hint schema: url, warc_ts, html, …).

The reference crawls the live web (``/root/reference/fetcher.go:35-84``);
the 10^10-URL regime instead bootstraps from Common Crawl's WARC archives.
This module reads WARC/1.0-1.1 files — plain or gzipped (Common Crawl
ships per-record gzip MEMBERS concatenated into one .warc.gz; stdlib
``gzip.decompress`` handles multi-member streams) — and yields one row per
``WARC-Type: response`` record with the HTTP payload split off.

Scale shape: WARC is not block-splittable (records are variable-length,
gzip members aren't indexed), so the unit of parallelism is the FILE —
exactly how Common Crawl is distributed (segments of ~1 GB files; a 100 TB
crawl is ~100k files ⇒ ample parallelism for any cluster). The reader uses
Spark's ``binaryFile`` source (one file per row) + ``mapInPandas``
(Arrow-batched; one file's records stream out per input row, so executor
memory holds one decompressed file at a time per task).

Parsing is stdlib-only and byte-faithful: WARC headers are ASCII blocks
terminated by CRLFCRLF; ``Content-Length`` frames the payload; each record
is followed by exactly two CRLFs (ISO 28500 §4).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_PAGE_DDL = (
    "url string, warc_ts timestamp, html binary, "
    "http_status int, content_type string, warc_file string"
)


def _parse_http_payload(payload: bytes) -> tuple[int | None, str, bytes]:
    """HTTP response bytes → (status, content-type, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, "", payload
    head, body = payload[:sep], payload[sep + 4:]
    lines = head.split(b"\r\n")
    status = None
    ctype = ""
    if lines and lines[0].startswith(b"HTTP/"):
        parts = lines[0].split(b" ")
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def parse_warc(data: bytes, warc_file: str = "") -> Iterator[dict]:
    """Raw (already-decompressed) WARC bytes → dicts for each *response*
    record. Non-response records (warcinfo, request, metadata, …) are
    skipped; malformed trailing bytes end the stream (a truncated tail
    record is dropped, matching how CC readers behave). Gzipped input
    (single- or multi-member, the Common Crawl layout) is decompressed
    transparently."""
    buf = io.BytesIO(_maybe_gunzip(data))
    while True:
        # skip inter-record CRLFs
        line = buf.readline()
        while line in (b"\r\n", b"\n"):
            line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            return  # lost framing — stop rather than misparse
        headers: dict[str, str] = {}
        while True:
            ln = buf.readline()
            if ln in (b"\r\n", b"\n", b""):
                break
            k, _, v = ln.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload = buf.read(length)
        if len(payload) < length:
            return  # truncated tail
        if headers.get("warc-type", "").lower() == "response":
            status, ctype, body = _parse_http_payload(payload)
            yield {
                "url": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "html": body,
                "http_status": status,
                "content_type": ctype,
                "warc_file": warc_file,
            }


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)  # multi-member safe
    return data


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → DataFrame(url, warc_ts, html, http_status,
    content_type, warc_file); one input task per file (see module doc)."""
    import pandas as pd  # noqa: F401 (worker-side)

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def _records(batches):
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                rows = list(
                    parse_warc(bytes(row["content"]), warc_file=row["path"])
                )
                if not rows:
                    continue
                out = pd.DataFrame(rows)
                out["warc_ts"] = pd.to_datetime(
                    out.pop("warc_date"), errors="coerce", utc=True
                ).dt.tz_localize(None)
                yield out[["url", "warc_ts", "html", "http_status",
                           "content_type", "warc_file"]]

    return files.mapInPandas(_records, WARC_PAGE_DDL)


def pages_from_warc(spark: SparkSession, path: str,
                    lang: str | None = None) -> DataFrame:
    """WARC → the CrawlEngine pages-table shape (input_hint: url, warc_ts,
    html, text, lang): successful HTML responses only; ``text`` is null —
    the engine's extraction UDF owns text derivation (byte contract)."""
    from pyspark.sql import functions as F

    df = read_warc(spark, path)
    return (
        df.where(
            (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
        )
        .select(
            "url",
            "warc_ts",
            "html",
            F.lit(None).cast("string").alias("text"),
            F.lit(lang).cast("string").alias("lang"),
        )
    )


def export_warc(df: DataFrame, out_dir: str,
                gzip_per_record: bool = True) -> None:
    """The WARC SINK: (url, warc_ts, html) rows → one ``part-NNNNN.warc[.gz]``
    file per partition under ``out_dir`` — re-sharding crawl output into
    the Common Crawl layout. Each task writes its own file (the WARC
    parallelism unit, mirroring the reader), records sorted by url within
    a partition so output is deterministic for a given partitioning.
    ``out_dir`` must be storage every executor can reach (local FS here;
    a shared mount/object store on a cluster)."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_per_record else ".warc"

    def _write(rows):
        from pyspark import TaskContext

        recs = []
        for r in rows:
            ts = r["warc_ts"]
            recs.append({
                "url": r["url"],
                "date": ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts else
                        "1970-01-01T00:00:00Z",
                "payload": (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + bytes(r["html"])
                ),
            })
        if not recs:
            return
        recs.sort(key=lambda r: r["url"])
        pid = TaskContext.get().partitionId()
        path = _os.path.join(out_dir, f"part-{pid:05d}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(write_warc(recs, gzip_per_record=gzip_per_record))
        _os.replace(tmp, path)  # atomic per-file commit

    df.select("url", "warc_ts", "html").foreachPartition(_write)


def write_warc(records: list[dict], gzip_per_record: bool = False) -> bytes:
    """Build WARC bytes from dicts (url, date, http bytes) — the test/
    fixture sibling of :func:`parse_warc` (also handy to emit WARC from
    the crawled store). ``gzip_per_record=True`` writes one gzip member
    per record — the Common Crawl layout."""
    out = b""
    for r in records:
        payload = r["payload"]
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + r.get("warc_type", "response").encode() + b"\r\n"
            b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            b"WARC-Date: " + r["date"].encode() + b"\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
            b"\r\n"
        )
        rec = head + payload + b"\r\n\r\n"
        out += gzip.compress(rec) if gzip_per_record else rec
    return out
