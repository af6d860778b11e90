"""Deterministic synthetic web fixtures (FIXTURES.md §1) — seeded generator
of Common-Crawl-shaped ``pages`` tables with the driver-mandated schema
``(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``
(BASELINE.json ``input_hint``). No external data, no network.

Hosts are Zipf-skewed; an optional hot host owns ~30% of pages (skew tests,
SURVEY.md §5.2.6). Pages mix every href shape the reference distinguishes
(``/root/reference/parse/parse.go:107-124``): root-relative (fetchable),
protocol-relative (fetchable), absolute / fragment / mailto / empty /
relative (store-only), plus duplicates; ~1% of pages get invalid UTF-8
injected to pin the byte-identity path (SURVEY.md §7.2).
"""

from __future__ import annotations

import datetime as dt
import random

from owlfrontier.extract import decode_html, extract_page, page_structure_json

EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)


def _zipf_host_sizes(n_pages: int, n_hosts: int, alpha: float, rng: random.Random,
                     hot_host_frac: float | None) -> list[int]:
    weights = [1.0 / (i + 1) ** alpha for i in range(n_hosts)]
    if hot_host_frac:
        total = sum(weights)
        weights[0] = hot_host_frac / (1 - hot_host_frac) * (total - weights[0])
    total = sum(weights)
    sizes = [max(1, round(n_pages * w / total)) for w in weights]
    # adjust to exactly n_pages
    diff = n_pages - sum(sizes)
    sizes[0] += diff
    return sizes


def gen_site(
    n_pages: int = 200,
    n_hosts: int = 8,
    seed: int = 42,
    zipf_alpha: float = 1.2,
    hot_host_frac: float | None = None,
    invalid_utf8_rate: float = 0.01,
    robots_hosts: int = 0,
) -> tuple[list[dict], list[str]]:
    """Returns (page rows, suggested seed urls).

    Row keys: url, warc_ts, html (bytes), text (golden text_json), lang.
    """
    rng = random.Random(seed)
    sizes = _zipf_host_sizes(n_pages, n_hosts, zipf_alpha, rng, hot_host_frac)
    hosts = [f"host{i}.example" for i in range(n_hosts)]
    urls: list[str] = []
    host_pages: dict[str, list[str]] = {}
    for h, sz in zip(hosts, sizes):
        host_pages[h] = [f"http://{h}/p{j}" for j in range(sz)]
        urls.extend(host_pages[h])

    rows = []
    for h in hosts[:robots_hosts]:
        body = "User-agent: *\nDisallow: /p1\n"
        rows.append(_page_row(f"http://{h}/robots.txt", body.encode(),
                              len(rows), is_html=False))

    for url in urls:
        host = url.split("//")[1].split("/")[0]
        mine = host_pages[host]
        n_local = rng.randint(1, min(6, len(mine)))
        local = rng.sample(mine, n_local)
        other_host = hosts[rng.randrange(n_hosts)]
        n_proto = rng.randint(0, 2)
        proto = rng.sample(host_pages[other_host], min(n_proto, len(host_pages[other_host])))
        links = [f"/{u.split('/', 3)[3]}" for u in local]
        links += ["//" + u.split("//")[1] for u in proto]
        if rng.random() < 0.3:
            links.append(links[0])  # duplicate href — no within-page dedup
        extra = ['http://external.example/abs', '#frag', 'mailto:x@y', '',
                 'relative.html']
        links += rng.sample(extra, rng.randint(0, 3))
        rng.shuffle(links)
        html = _render_page(url, links, rng)
        if rng.random() < invalid_utf8_rate:
            html = html + b"<p>bad\xff\xfebytes</p>"
        rows.append(_page_row(url, html, len(rows)))

    seeds = [host_pages[h][0] for h in hosts[: max(1, n_hosts // 3)]]
    return rows, seeds


def _render_page(url: str, links: list[str], rng: random.Random) -> bytes:
    name = url.rsplit("/", 1)[-1]
    words = ["crawl", "frontier", "spark", "parquet", "queue", "token",
             "index", "page", "link", "host", "fetch", "extract", "seed"]
    para = " ".join(rng.choices(words, k=rng.randint(5, 30)))
    heads = []
    for tag in ("h1", "h2", "h3", "h4"):
        if rng.random() < 0.6:
            heads.append(f"<{tag}>{tag} of {name}</{tag}>")
    anchors = "\n".join(f'<li><a href="{l}">link {i}</a></li>'
                        for i, l in enumerate(links))
    html = f"""<!DOCTYPE html>
<html><head>
<title>Page {name} &amp; friends</title>
<link rel="stylesheet" href="/style.css">
<style>.x {{ color: red; }}</style>
</head>
<body>
{''.join(heads)}
<p>{para}</p>
<ul>
{anchors}
</ul>
<script>var tracker = "{rng.random()}"; if (1 < 2) {{ track(); }}</script>
</body></html>"""
    return html.encode("utf-8")


def _page_row(url: str, html: bytes, i: int, is_html: bool = True) -> dict:
    page = extract_page(decode_html(html), url)
    return {
        "url": url,
        "warc_ts": EPOCH + dt.timedelta(seconds=i),
        "html": html,
        "text": page_structure_json(page),
        "lang": "en",
    }


PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark, rows):
    return spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        PAGES_SCHEMA_DDL,
    )


def pages_map(rows) -> dict:
    """url → html bytes mapping for the oracle simulators."""
    return {r["url"]: r["html"] for r in rows}


def write_pages_parquet(spark, rows, path: str, partitions: int = 8):
    pages_df(spark, rows).repartition(partitions).write.mode("overwrite").parquet(path)
