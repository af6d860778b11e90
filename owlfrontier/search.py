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

# the exact highlight tags the reference configures
# (elastic_search.go:124-125) and the webapp's render replacement
# (webapp/main.go:137-141)
ES_PRE_TAG = "_-_strong_-_"
ES_POST_TAG = "_!-_strong_-_"

# the ES ``_all`` field: every indexed field of the page doc — title,
# headings, text (elastic_search.go:84-92 matches ``_all``; the river
# indexes the whole CouchDB doc). Fields are position-gapped in ES, so a
# phrase never spans two fields — per-line treatment preserves that.
_ALL_FIELDS = ("title", "h1", "h2", "h3", "h4", "text")


def _all_lines_col(df: DataFrame):
    """One array<string> of every searchable line of the doc (the `_all`
    analogue); skips fields absent from the frame."""
    parts = []
    for c in _ALL_FIELDS:
        if c not in df.columns:
            continue
        if c == "title":
            parts.append(
                F.when(
                    F.col("title").isNotNull() & (F.col("title") != ""),
                    F.array("title"),
                ).otherwise(F.array().cast("array<string>"))
            )
        else:
            parts.append(F.coalesce(F.col(c), F.array().cast("array<string>")))
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def postings_from_crawled(crawled: DataFrame) -> DataFrame:
    """(word, url) postings — the INCREMENTAL unit of the word index.

    The reference's CouchDB view is maintained per document write
    (couchdb.go:87-109: emit() runs on each new doc, the B-tree merges);
    the Spark-idiomatic analog runs this projection once per newly
    crawled GENERATION and appends the result as that generation's
    postings partition (``CrawlConfig.maintain_index``). Documents are
    crawled exactly once (first-wins dedup), so per-generation postings
    are disjoint by url and the union over generations equals a full
    recompute — no merge conflicts by construction."""
    return (
        crawled.select("url", F.explode("text").alias("line"))
        .select("url", F.explode(F.split("line", " ")).alias("word"))
        .where(F.length("word") > 2)
        .dropDuplicates(["word", "url"])
    )


def word_index_from_postings(postings: DataFrame, posting_cap: int = 1000,
                             salt_buckets: int = 16) -> DataFrame:
    """(word, doc_count, urls) from a (word, url) postings table — the
    aggregation half of O14, shared by the full recompute and the
    incremental (per-generation-appended) index."""
    from pyspark.sql import Window

    words = postings
    counts = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    salted = words.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
    )
    w_local = Window.partitionBy("word", "salt").orderBy("url")
    local = (
        salted.withColumn("_rn", F.row_number().over(w_local))
        .where(F.col("_rn") <= posting_cap)  # superset of the global top-k
        .drop("_rn", "salt")
    )
    w_global = Window.partitionBy("word").orderBy("url")
    top = (
        local.withColumn("_rn", F.row_number().over(w_global))
        .where(F.col("_rn") <= posting_cap)
    )
    capped = top.groupBy("word").agg(
        F.sort_array(F.collect_list("url")).alias("urls")
    )
    return counts.join(capped, "word")


def word_index(crawled: DataFrame, posting_cap: int = 1000,
               salt_buckets: int = 16) -> DataFrame:
    """O14: (word, doc_count, urls) — the inverted index (full recompute).

    ``doc_count`` is exact; ``urls`` is the first ``posting_cap`` URLs
    (sorted) — an UNBOUNDED posting list per word is a 100 TB hazard (a
    stopword's array would hold every document). The cap is computed with
    a salted two-phase top-k (local top-k per (word, salt), then global),
    so a hot word's rows never land in one window partition — the same
    skew-defusing shape as the politeness budget."""
    return word_index_from_postings(
        postings_from_crawled(crawled), posting_cap, salt_buckets
    )


def index_stats(crawled: DataFrame) -> DataFrame:
    """O15: the stats view — fetched/parsed counts (couchdb.go:97-109)."""
    return crawled.agg(
        F.count(F.when(F.col("fetched_on").isNotNull(), 1)).alias("fetched"),
        F.count(F.when(F.col("parsed_on").isNotNull(), 1)).alias("parsed"),
    )


def search_phrase(crawled: DataFrame, phrase: str, slop: int = 1,
                  limit: int = 10) -> DataFrame:
    """O16: phrase search over the ``_all`` field with ES-style slop.

    The reference queries ``match {_all: {query, type: phrase}}``
    (elastic_search.go:84-92) — title, headings AND text are searched, not
    just text lines. Scores documents by phrase-occurrence count
    (adjacent-within-``slop`` positional matches across the word sequence
    of each line), ranked desc with url tiebreak. Tokenization is the
    engine's split-on-single-space (the CouchDB view tokenizer), applied
    consistently across index, search and highlights."""
    terms = phrase.split(" ")
    if len(terms) == 1:
        hits = (
            crawled.select("url", F.explode(_all_lines_col(crawled)).alias("line"))
            .select("url", F.explode(F.split("line", " ")).alias("word"))
            .where(F.col("word") == terms[0])
            .groupBy("url")
            .agg(F.count(F.lit(1)).alias("score"))
        )
        return hits.orderBy(F.desc("score"), F.asc("url")).limit(limit)

    words = (
        crawled.select(
            "url",
            F.posexplode(_all_lines_col(crawled)).alias("line_no", "line"),
        )
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


# --- highlight fragments (elastic_search.go:111-157) -------------------------


def _phrase_starts(tokens: list[str], terms: list[str], slop: int) -> list[int]:
    """Token indices where a full phrase occurrence begins (each next term
    within ``slop`` extra positions — the match_phrase slop semantics used
    by search_phrase)."""
    if not terms:
        return []
    starts = []
    for i, tok in enumerate(tokens):
        if tok != terms[0]:
            continue
        prev = i
        ok = True
        for term in terms[1:]:
            nxt = None
            for j in range(prev + 1, min(prev + 2 + slop, len(tokens))):
                if tokens[j] == term:
                    nxt = j
                    break
            if nxt is None:
                ok = False
                break
            prev = nxt
        if ok:
            starts.append(i)
    return starts


def highlight_fragments(
    text_lines: list[str],
    phrase: str,
    slop: int = 1,
    fragment_size: int = 150,
    number_of_fragments: int = 3,
    pre_tag: str = ES_PRE_TAG,
    post_tag: str = ES_POST_TAG,
) -> list[str]:
    """The highlight config the reference sends (elastic_search.go:111-157):
    ``text`` field only, fragment_size 150, number_of_fragments 3,
    order: score, with the highlight query scoring any-term matches (must)
    plus phrase matches boosted 10× (should, phrase_slop 1).

    Deterministic fragmenter: each text line is chunked into token-aligned
    fragments of ≤ ``fragment_size`` chars (Lucene SimpleFragmenter-style);
    a fragment scores 10 per phrase occurrence starting inside it plus 1
    per matched term; fragments with score 0 are dropped, the rest are
    ordered by score (ties: document order) and the top N returned with
    every matched term wrapped in the pre/post tags."""
    terms = phrase.split(" ")
    term_set = set(terms)
    frags: list[tuple[int, int, int, str]] = []  # (-score, line_no, start, txt)
    for line_no, line in enumerate(text_lines or []):
        tokens = line.split(" ")
        if not term_set.intersection(tokens):
            continue
        starts = set(_phrase_starts(tokens, terms, slop))
        # char offset of each token in the original line
        offs, pos = [], 0
        for t in tokens:
            offs.append(pos)
            pos += len(t) + 1
        # token-aligned chunks of <= fragment_size chars
        i = 0
        while i < len(tokens):
            j = i
            end = offs[i] + len(tokens[i])
            while (
                j + 1 < len(tokens)
                and offs[j + 1] + len(tokens[j + 1]) - offs[i] <= fragment_size
            ):
                j += 1
                end = offs[j] + len(tokens[j])
            score = 10 * sum(1 for s in starts if i <= s <= j) + sum(
                1 for t in tokens[i:j + 1] if t in term_set
            )
            if score > 0:
                rendered = " ".join(
                    pre_tag + t + post_tag if t in term_set else t
                    for t in tokens[i:j + 1]
                )
                frags.append((-score, line_no, offs[i], rendered))
            i = j + 1
    frags.sort()
    return [f[3] for f in frags[:number_of_fragments]]


def highlights_udf(phrase: str, slop: int = 1, fragment_size: int = 150,
                   number_of_fragments: int = 3):
    """Arrow-vectorized wrapper: text array<string> → array<string> of
    tagged fragments."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _hl(text: "pd.Series") -> "pd.Series":
        return pd.Series(
            [
                highlight_fragments(
                    list(lines) if lines is not None else [],
                    phrase, slop, fragment_size, number_of_fragments,
                )
                for lines in text
            ]
        )

    _hl.__annotations__ = {"text": pd.Series, "return": pd.Series}
    return pandas_udf("array<string>")(_hl)


def search_with_highlights(crawled: DataFrame, phrase: str, slop: int = 1,
                           limit: int = 10) -> DataFrame:
    """The full reference search surface: phrase hits over ``_all`` plus
    highlight fragments from ``text`` (the ES result the webapp renders —
    webapp/main.go:105-141)."""
    hits = search_phrase(crawled, phrase, slop=slop, limit=limit)
    # hits is ≤ limit rows — broadcast IT against the (100 TB) pages side
    joined = crawled.select("url", "title", "text").join(
        F.broadcast(hits), "url", "inner"
    )
    return joined.select(
        "url", "title", "score",
        highlights_udf(phrase, slop)(F.col("text")).alias("highlights"),
    ).orderBy(F.desc("score"), F.asc("url"))


def render_search_text(fragments: list[str]) -> str:
    """webapp/main.go:115-121,137-141: fragments join with a leading
    " ... " each, then sanitizeHTML replaces the tags with <strong>."""
    txt = "".join(" ... " + f for f in fragments)
    return txt.replace(ES_PRE_TAG, "<strong>").replace(
        ES_POST_TAG, "</strong>"
    )
