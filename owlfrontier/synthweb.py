"""Distributed synthetic-web generator — pages materialized entirely
JVM-side from ``spark.range(n)`` (no driver-side row building, no Python in
the loop), so the same generator scales from sandbox benchmarks to
cluster-sized corpora. Schema = the BASELINE.json ``input_hint`` shape.

Graph design: page ``i`` carries ``fanout`` protocol-relative links to pages
``(a_j * i + b_j) mod n`` (affine maps with odd multipliers ⇒ full-range
reach), which gives a BFS from a few seeds coverage of nearly all pages in
``O(log_fanout n)`` generations. Host assignment is skewed: ``hot_pct`` % of
pages land on host 0 (the hot-domain skew case of SURVEY.md §4.3.2), the
rest uniform over ``n_hosts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AFFINE = [(2, 1), (3, 7), (5, 13), (7, 19), (11, 29), (13, 37), (17, 43), (19, 53)]

_WORDS = [
    "crawl", "frontier", "spark", "parquet", "queue", "token", "index",
    "page", "link", "host", "fetch", "extract", "seed", "shard", "merge",
]


def host_expr(page_id: str, n_hosts: int, hot_pct: int) -> str:
    """Deterministic skewed host id for a page id column (SQL text)."""
    return (
        f"CASE WHEN pmod({page_id}, 100) < {hot_pct} THEN 0 "
        f"ELSE pmod({page_id}, {n_hosts}) END"
    )


def synth_pages(
    spark,
    n_pages: int,
    n_hosts: int = 500,
    hot_pct: int = 30,
    fanout: int = 8,
    paragraphs: int = 30,
    partitions: int = 32,
) -> DataFrame:
    """Pages DataFrame (url, warc_ts, html BINARY, text, lang) built with
    whole-stage-codegen expressions only."""
    df = spark.range(0, n_pages, 1, partitions).withColumnRenamed("id", "i")

    def _host(col: str) -> str:
        return host_expr(col, n_hosts, hot_pct)

    anchors = []
    for j, (a, b) in enumerate(_AFFINE[:fanout]):
        tgt = f"pmod({a} * i + {b}, {n_pages})"
        anchors.append(
            f"'<a href=\"//h', {_host(tgt)}, '.example/p', {tgt}, '\">l{j}</a>'"
        )
    anchors_sql = "concat(" + ", ".join(anchors) + ")"

    # deterministic pseudo-text: `paragraphs` lines of word soup keyed on i
    para = (
        "concat_ws(' ', transform(sequence(1, {p}), k -> "
        "concat('{w0} ', element_at(array({words}), "
        "cast(pmod(xxhash64(i * 1000 + k), {nw}) as int) + 1), "
        "' of page ', i, ' line ', k)))"
    ).format(
        p=paragraphs,
        w0="the",
        words=", ".join(f"'{w}'" for w in _WORDS),
        nw=len(_WORDS),
    )

    html = f"""concat(
        '<!DOCTYPE html><html><head><title>Page ', i, ' on host ', {_host('i')},
        '</title><style>.x {{ color: red; }}</style></head><body>',
        '<h1>Page ', i, '</h1><h2>section</h2>',
        '<p>', {para}, '</p>',
        {anchors_sql},
        '<a href="http://external.example/abs">ext</a>',
        '<script>var t = ', i, ';</script>',
        '</body></html>')"""

    return df.select(
        F.expr(f"concat('http://h', {_host('i')}, '.example/p', i)").alias("url"),
        F.expr(
            "timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,i)"
        ).alias("warc_ts"),
        F.expr(f"encode({html}, 'utf-8')").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )


def synth_seeds(n_seeds: int, n_pages: int, n_hosts: int = 500,
                hot_pct: int = 30) -> list[str]:
    seeds = []
    for i in range(n_seeds):
        host = 0 if (i % 100) < hot_pct else i % n_hosts
        seeds.append(f"http://h{host}.example/p{i}")
    return seeds


def synth_seeds_df(spark, n_seeds: int, n_hosts: int = 500,
                   hot_pct: int = 30, partitions: int = 32) -> DataFrame:
    """(url, seq) seed table, built distributed — identical URL set to
    :func:`synth_seeds` but a Common-Crawl-scale generation 0 never passes
    through driver memory (the north_rule regime is a 10^8–10^10-row
    generation-0 frontier)."""
    return (
        spark.range(0, n_seeds, 1, partitions)
        .withColumnRenamed("id", "i")
        .select(
            F.expr(
                f"concat('http://h', {host_expr('i', n_hosts, hot_pct)}, "
                f"'.example/p', i)"
            ).alias("url"),
            F.col("i").alias("seq"),
        )
    )
