"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke: derives a deterministic synthetic web
(pages table with the BASELINE.json input_hint schema) from the driver's
``documents`` table and runs the REAL crawl engine
(:class:`owlfrontier.crawler.CrawlEngine`) end-to-end for a few
generations: anti-join dedup, per-host politeness, Arrow-vectorized
extraction, posexplode frontier expansion, snapshot commits.

``queries()`` / ``oracle_sql()`` — one entry per SQL-expressible operator
from SURVEY.md §2 plus the training-data pipeline ops (dedup, similarity
search, text analysis); implementations in :mod:`owlfrontier.queries`.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _synthetic_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → Common-Crawl-shaped pages table (url, warc_ts, html
    binary, text, lang). Deterministic link graph: doc i links to docs
    (2i+1) mod N and (3i+7) mod N (protocol-relative, the reference's
    fetchable shape — parse.go:107-113), plus one store-only absolute."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    return docs.selectExpr(
        "concat('http://src', doc_id % 20, '.example/d', doc_id) AS url",
        "timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id) AS warc_ts",
        f"""encode(format_string(
            '<title>Doc %s</title><h1>src%s</h1><p>%s</p>
<a href="//src%s.example/d%s">n1</a>
<a href="//src%s.example/d%s">n2</a>
<a href="http://external.example/abs">ext</a>
<script>var x = 1;</script>',
            doc_id, doc_id % 20, text,
            (2*doc_id+1) % {n} % 20, (2*doc_id+1) % {n},
            (3*doc_id+7) % {n} % 20, (3*doc_id+7) % {n}
        ), 'utf-8') AS html""",
        "text",
        "lang",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: run the crawl engine on sf0.001-derived pages; returns the
    exact FIFO crawl order with the byte-identity text_json column."""
    from pyspark.sql import functions as F

    from owlfrontier.crawler import CrawlConfig, CrawlEngine

    sf_dir = "/root/testdata/sf0.001"
    pages = _synthetic_pages(spark, sf_dir)
    seeds = [f"http://src{i % 20}.example/d{i}" for i in range(3)]
    engine = CrawlEngine(
        spark,
        pages,
        tempfile.mkdtemp(prefix="owlfrontier-entry-"),
        config=CrawlConfig(
            politeness_k=4,
            max_generations=4,
            salt_buckets=4,
            frontier_partitions=8,
            use_bloom=False,
        ),
    )
    engine.run(seeds=seeds)
    order = engine.crawl_order()
    crawled = engine.crawled().select("url", "text_json", "doc_id")
    return order.join(crawled, "url").select(
        "seq", "generation", "url", "doc_id", "text_json"
    ).orderBy(F.asc("seq"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + training-data
    pipeline ops. Each callable takes (spark, sf_dir) → DataFrame, with
    every computed column aliased to match ``oracle_sql()``."""
    from owlfrontier.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for every ``queries()`` entry."""
    from owlfrontier.queries import ORACLE

    return dict(ORACLE)
