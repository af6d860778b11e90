"""Search + index views over the crawled-pages table — the reference's
CouchDB word-index view (``/root/reference/couchdb/couchdb.go:87-96``) and
Elasticsearch phrase search (``/root/reference/elasticsearch/
elastic_search.go:74-157``) re-expressed over the engine's output.

The reference's view semantics are preserved exactly: it iterates
``doc.text.text`` (the extracted TEXT lines only — not title/headings),
splits each line on a single space, and indexes words longer than 2 chars
with no lowercasing or stemming (the live view; an older draft lowercased —
``couchdb/views.json:22-25`` — and is NOT what runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_index(crawled: DataFrame) -> DataFrame:
    """O14: (word, doc_count, urls) — the inverted index."""
    words = (
        crawled.select("url", F.explode("text").alias("line"))
        .select("url", F.explode(F.split("line", " ")).alias("word"))
        .where(F.length("word") > 2)
    )
    return words.groupBy("word").agg(
        F.countDistinct("url").alias("doc_count"),
        F.collect_set("url").alias("urls"),
    )


def index_stats(crawled: DataFrame) -> DataFrame:
    """O15: the stats view — fetched/parsed counts (couchdb.go:97-109)."""
    return crawled.agg(
        F.count(F.when(F.col("fetched_on").isNotNull(), 1)).alias("fetched"),
        F.count(F.when(F.col("parsed_on").isNotNull(), 1)).alias("parsed"),
    )


def search_phrase(crawled: DataFrame, phrase: str, slop: int = 1,
                  limit: int = 10) -> DataFrame:
    """O16: phrase search over extracted text with ES-style slop.

    Scores documents by phrase-occurrence count (adjacent-within-``slop``
    positional matches across the word sequence of each text line), ranked
    desc with url tiebreak — the DataFrame analogue of the reference's
    match_phrase(boost=10, slop=1) query; highlight rendering is
    presentation-only and out of scope."""
    terms = phrase.split(" ")
    if len(terms) == 1:
        hits = (
            crawled.select("url", F.explode("text").alias("line"))
            .select("url", F.explode(F.split("line", " ")).alias("word"))
            .where(F.col("word") == terms[0])
            .groupBy("url")
            .agg(F.count(F.lit(1)).alias("score"))
        )
        return hits.orderBy(F.desc("score"), F.asc("url")).limit(limit)

    words = (
        crawled.select("url", F.posexplode("text").alias("line_no", "line"))
        .select(
            "url", "line_no",
            F.posexplode(F.split("line", " ")).alias("pos", "word"),
        )
    )
    first = words.where(F.col("word") == terms[0]).select(
        "url", "line_no", F.col("pos").alias("p0")
    )
    matched = first
    for i, term in enumerate(terms[1:], start=1):
        nxt = words.where(F.col("word") == term).select(
            "url", "line_no", F.col("pos").alias(f"p{i}")
        )
        matched = matched.join(nxt, ["url", "line_no"]).where(
            (F.col(f"p{i}") > F.col(f"p{i-1}"))
            & (F.col(f"p{i}") <= F.col(f"p{i-1}") + 1 + slop)
        )
    hits = matched.groupBy("url").agg(F.count(F.lit(1)).alias("score"))
    return hits.orderBy(F.desc("score"), F.asc("url")).limit(limit)
