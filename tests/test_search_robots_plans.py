"""Search views over crawl output, robots parsing units, and plan-quality
regression tests (the .explain contract: pruning, join strategy, shuffles)."""

from pyspark.sql import functions as F

from owlfrontier.robots import is_allowed, parse_disallows
from owlfrontier.search import index_stats, search_phrase, word_index


# --- robots units -----------------------------------------------------------


def test_parse_disallows_groups_and_precedence():
    txt = """
# comment
User-agent: *
Disallow: /tmp

User-agent: OwlCrawler
Disallow: /private
Disallow: /drafts
"""
    assert parse_disallows(txt) == ["/private", "/drafts"]  # specific wins
    assert parse_disallows(txt, "SomeOtherBot/1.0") == ["/tmp"]


def test_parse_disallows_empty_and_malformed():
    assert parse_disallows("") == []
    assert parse_disallows("Disallow: /x") == []  # no UA group → no rules
    assert parse_disallows("User-agent: *\nDisallow:") == []  # allow-all
    assert parse_disallows("garbage line\nUser-agent: *\nDisallow: /a") == ["/a"]


def test_parse_crawl_delay():
    from owlfrontier.robots import parse_crawl_delay

    txt = "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n"
    assert parse_crawl_delay(txt) == 10.0
    # specific group wins; its (absent) delay is None, not the wildcard's
    txt2 = ("User-agent: owlcrawler\nDisallow: /a\n\n"
            "User-agent: *\nCrawl-delay: 7\n")
    assert parse_crawl_delay(txt2) is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: nope\n") is None
    assert parse_crawl_delay("") is None
    # fractional delays parse
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 2.5\n") == 2.5


def test_is_allowed_prefix_semantics():
    dis = ["/private", "/a/b"]
    assert not is_allowed("http://h/private/x", dis)
    assert not is_allowed("http://h/a/b", dis)
    assert is_allowed("http://h/a", dis)
    assert is_allowed("http://h/pub", dis)
    assert is_allowed("http://h/", [])


def test_rfc9309_longest_match_examples():
    """RFC 9309 §2.2.2 / §5.2 worked examples: most-octets match wins;
    Allow wins ties; no match ⇒ allowed."""
    # Allow: /p vs Disallow: / — /page matches /p (2) over / (1) → allowed
    r = [(True, "/p"), (False, "/")]
    assert is_allowed("http://h/page", r)
    assert not is_allowed("http://h/", r)
    # equal-length tie → Allow (least restrictive) wins
    r = [(True, "/folder"), (False, "/folder")]
    assert is_allowed("http://h/folder/page", r)
    # RFC §5.2: Allow: /example/page/ vs the longer specific Disallow
    r = [(True, "/example/page/"), (False, "/example/page/disallowed.gif")]
    assert not is_allowed("http://h/example/page/disallowed.gif", r)
    assert is_allowed("http://h/example/page/index.html", r)


def test_rfc9309_wildcards_and_anchor():
    # * matches any octet sequence
    r = [(False, "/fish*")]
    assert not is_allowed("http://h/fish", r)
    assert not is_allowed("http://h/fishheads/yummy.html", r)
    assert is_allowed("http://h/Fish.asp", r)  # case-sensitive
    # trailing $ anchors the end
    r = [(False, "/*.php$")]
    assert not is_allowed("http://h/filename.php", r)
    assert not is_allowed("http://h/folder/filename.php", r)
    assert is_allowed("http://h/filename.php5", r)
    assert is_allowed("http://h/filename.php?parameters", r)
    # wildcard Disallow outranks a shorter Allow by octet count
    r = [(True, "/page"), (False, "/*.htm")]
    assert not is_allowed("http://h/page.htm", r)
    # Allow: /$ permits exactly the root while / blocks the rest
    r = [(True, "/$"), (False, "/")]
    assert is_allowed("http://h/", r)
    assert not is_allowed("http://h/page.htm", r)
    # inner $ is literal
    r = [(False, "/a$b")]
    assert not is_allowed("http://h/a$b/c", r)
    assert is_allowed("http://h/ab", r)


def test_parse_sitemaps():
    from owlfrontier.robots import parse_sitemaps

    txt = ("User-agent: *\nDisallow: /private\n"
           "Sitemap: http://a.example/sitemap.xml\n"
           "sitemap:http://a.example/sm2.xml  # comment\n"
           "User-agent: other\nSITEMAP: http://a.example/sm3.xml\n")
    # global (group-independent), file order, case-insensitive field name
    assert parse_sitemaps(txt) == [
        "http://a.example/sitemap.xml",
        "http://a.example/sm2.xml",
        "http://a.example/sm3.xml",
    ]
    assert parse_sitemaps("") == []
    assert parse_sitemaps("Sitemap:\n") == []  # empty value: no URL


def test_rfc9309_allow_rules_parse():
    from owlfrontier.robots import parse_rules

    txt = ("User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
           "Allow:\nDisallow:\n")
    assert parse_rules(txt) == [(False, "/private"), (True, "/private/ok")]
    assert parse_disallows(txt) == ["/private"]  # legacy surface unchanged
    assert is_allowed("http://h/private/ok/page", parse_rules(txt))
    assert not is_allowed("http://h/private/other", parse_rules(txt))


# --- search over crawl output ------------------------------------------------


def _crawled_fixture(spark):
    rows = [
        ("http://a/1", ["the quick fox", "slow fox trap"], "t1", "t1"),
        ("http://a/2", ["quick fox quick fox"], "t2", "t2"),
        ("http://a/3", ["nothing here"], "t3", None),
    ]
    df = spark.createDataFrame(
        rows, "url string, text array<string>, t string, p string"
    )
    return df.select(
        "url", "text",
        F.to_timestamp(F.lit("2026-01-01")).alias("fetched_on"),
        F.when(F.col("p").isNotNull(), F.to_timestamp(F.lit("2026-01-01")))
        .alias("parsed_on"),
    )


def test_word_index_semantics(spark):
    crawled = _crawled_fixture(spark)
    idx = {r["word"]: r["doc_count"] for r in word_index(crawled).collect()}
    # words of len <= 2 excluded ("the" kept: len 3)
    assert idx["fox"] == 2 and idx["quick"] == 2 and idx["the"] == 1
    assert "a" not in idx


def test_word_index_posting_cap(spark):
    """posting_cap bounds the urls array (the 100 TB hot-word guard) while
    doc_count stays exact; capped list = first N urls sorted."""
    crawled = _crawled_fixture(spark)
    idx = {r["word"]: r for r in
           word_index(crawled, posting_cap=1, salt_buckets=2).collect()}
    assert idx["fox"]["doc_count"] == 2
    assert idx["fox"]["urls"] == ["http://a/1"]  # smallest url, len == cap
    full = {r["word"]: sorted(r["urls"]) for r in word_index(crawled).collect()}
    assert full["fox"] == ["http://a/1", "http://a/2"]


def test_index_stats_view(spark):
    row = index_stats(_crawled_fixture(spark)).first()
    assert row["fetched"] == 3 and row["parsed"] == 2


def test_search_phrase_scoring(spark):
    crawled = _crawled_fixture(spark)
    hits = [(r["url"], r["score"])
            for r in search_phrase(crawled, "quick fox", slop=0).collect()]
    # a/2 has two adjacent occurrences; a/1 has one
    assert hits == [("http://a/2", 2), ("http://a/1", 1)]
    # slop=1 lets "slow ... trap"? no — terms must both appear: "fox trap"
    hits = [(r["url"], r["score"])
            for r in search_phrase(crawled, "fox trap", slop=0).collect()]
    assert hits == [("http://a/1", 1)]
    # single-term search
    hits = [(r["url"], r["score"])
            for r in search_phrase(crawled, "fox").collect()]
    # equal scores → url-ascending tiebreak
    assert hits == [("http://a/1", 2), ("http://a/2", 2)]


def test_search_all_field_matches_title_and_headings(spark):
    """elastic_search.go:84-92: the query matches ``_all`` — a phrase that
    only appears in the title or an h2 must still hit."""
    rows = [
        ("http://b/1", "quick fox", ["nothing relevant"], ["head"], "p"),
        ("http://b/2", "t", ["body text"], ["quick fox here"], "p"),
        ("http://b/3", "t", ["no match"], ["head"], "p"),
    ]
    df = spark.createDataFrame(
        rows, "url string, title string, text array<string>, h2 array<string>, p string"
    )
    hits = [(r["url"], r["score"])
            for r in search_phrase(df, "quick fox", slop=0).collect()]
    assert hits == [("http://b/1", 1), ("http://b/2", 1)]


def test_highlight_fragment_goldens():
    """Golden fixtures for the ES highlight config the reference sends:
    pre/post tags (elastic_search.go:124-125), 150×3 fragments
    (elastic_search.go:129-130), order: score, phrase boost 10."""
    from owlfrontier.search import (
        ES_POST_TAG,
        ES_PRE_TAG,
        highlight_fragments,
        render_search_text,
    )

    lines = ["the quick fox jumps", "a quick dog", "no match here"]
    frags = highlight_fragments(lines, "quick fox", slop=0)
    # phrase line scores 10+2, term-only line scores 1 → score order
    assert frags == [
        f"the {ES_PRE_TAG}quick{ES_POST_TAG} {ES_PRE_TAG}fox{ES_POST_TAG} jumps",
        f"a {ES_PRE_TAG}quick{ES_POST_TAG} dog",
    ]
    # webapp render: " ... " joiner + <strong> replacement (main.go:115-141)
    assert render_search_text(frags) == (
        " ... the <strong>quick</strong> <strong>fox</strong> jumps"
        " ... a <strong>quick</strong> dog"
    )

    # fragment_size chunks long lines at token boundaries; number_of_fragments
    # caps the result at 3 even with more scoring fragments
    long_line = " ".join(["pad"] * 30 + ["quick"] + ["pad"] * 30)
    many = [long_line, "quick a", "quick b", "quick c"]
    frags = highlight_fragments(many, "quick", fragment_size=40)
    assert len(frags) == 3
    assert all(ES_PRE_TAG + "quick" + ES_POST_TAG in f for f in frags)
    # chunking respects fragment_size on the untagged text
    untagged = frags[0].replace(ES_PRE_TAG, "").replace(ES_POST_TAG, "")
    assert len(untagged) <= 40

    # slop=1 phrase highlighting: one intervening token allowed
    frags = highlight_fragments(["quick brown fox"], "quick fox", slop=1)
    assert frags and frags[0].count(ES_PRE_TAG) == 2
    assert highlight_fragments(["quick brown fox"], "quick fox", slop=0) == [
        f"{ES_PRE_TAG}quick{ES_POST_TAG} brown {ES_PRE_TAG}fox{ES_POST_TAG}"
    ]


def test_search_with_highlights_end_to_end(spark):
    from owlfrontier.search import ES_PRE_TAG, search_with_highlights

    crawled = _crawled_fixture(spark).withColumn("title", F.lit("t"))
    rows = search_with_highlights(crawled, "quick fox", slop=0).collect()
    assert [r["url"] for r in rows] == ["http://a/2", "http://a/1"]
    assert all(ES_PRE_TAG in r["highlights"][0] for r in rows)
    assert rows[0]["score"] == 2


# --- plan-quality regression ---------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_word_index_query_prunes_to_text_column(spark):
    from owlfrontier.queries import QUERIES

    plan = _plan(QUERIES["word_index"](spark, "/root/testdata/sf0.001"))
    assert "ReadSchema: struct<text:string>" in plan  # column pruning
    # two exchanges by design: a round-robin spread of the raw rows (the
    # sf tables are single-row-group parquet — unsplittable, so the heavy
    # explode would otherwise run on ONE task; at 100 TB the scan has
    # thousands of splits and the spread is a no-op) + the agg shuffle
    assert plan.count("Exchange") == 2
    assert plan.count("RoundRobinPartitioning") == 1
    assert plan.count("hashpartitioning") == 1  # partial agg → one shuffle


def test_expansion_first_wins_partial_aggregates_before_exchange(spark):
    """The frontier-expansion first-wins must stay a declarative min_by
    aggregation with MAP-SIDE partial combine: the shuffle then carries
    at most one row per (url, map partition) of the dup-heavy pool
    instead of the whole pool. A window-function rewrite (or anything
    that loses the partial phase) would shuffle the full pool — the
    100 TB regression this test pins."""
    from owlfrontier.crawler import first_wins_pool

    pool = spark.createDataFrame(
        [("u1", "h1", [0, 1], "p1"), ("u1", "h1", [0], "p0"),
         ("u2", "h2", [2], "p0")],
        "url string, host string, path array<bigint>, "
        "discovered_from string",
    )
    plan = _plan(first_wins_pool(pool))
    assert "partial_min_by" in plan
    # exactly one exchange, and the partial aggregate runs UPSTREAM of it
    # (plan text prints top-down, so upstream == later in the string)
    assert plan.count("Exchange") == 1
    assert plan.index("partial_min_by") > plan.index("Exchange")
    assert "Window" not in plan  # the non-partial formulation


def test_dedup_antijoin_broadcasts_seen_side(spark):
    from owlfrontier.queries import QUERIES

    plan = _plan(QUERIES["dedup_antijoin"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_ann_ivf_topk_broadcasts_probes_and_prunes_rank(spark):
    """The IVF search must broadcast the tiny probe side (queries × nprobe
    rows) so the corpus is scanned exactly once with no shuffle, and the
    top-k window must be pruned map-side (WindowGroupLimit) before the
    single rank exchange."""
    from owlfrontier.queries import QUERIES

    plan = _plan(QUERIES["ann_ivf_topk"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan  # partial top-k before the exchange
    # exchanges: 2 round-robin input spreads + 1 rank hashpartitioning
    assert plan.count("hashpartitioning") == 1


def test_dedup_clusters_labels_lsh_components(spark):
    """Connected components over the LSH pair graph: every doc in a
    candidate pair shares a cluster_id with its partner, the cluster_id is
    the component minimum, and docs with no pairs label themselves."""
    from owlfrontier.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["dedup_clusters"](spark, sf).collect()
    }
    pairs = [
        (r["a_id"], r["b_id"])
        for r in QUERIES["minhash_lsh_pairs"](spark, sf).collect()
    ]
    paired = {d for p in pairs for d in p}
    for a, b in pairs:
        assert labels[a] == labels[b]
    # component min: a label is always the smallest id it covers
    for d, c in labels.items():
        assert c <= d
        assert labels[c] == c
    for d in set(labels) - paired:
        assert labels[d] == d


def test_bucketed_fetch_join_shuffles_only_frontier(spark, tmp_path):
    from owlfrontier.synthweb import synth_pages

    (synth_pages(spark, 2000, n_hosts=20, partitions=4)
     .write.mode("overwrite").format("parquet")
     .bucketBy(8, "url").sortBy("url")
     .option("path", str(tmp_path / "pages_b")).saveAsTable("pages_plan_test"))
    pages = spark.table("pages_plan_test")
    frontier = pages.select("url").limit(500).withColumn(
        "path", F.array(F.lit(0).cast("bigint"))
    )
    frontier.write.mode("overwrite").parquet(str(tmp_path / "fr"))
    fr = spark.read.parquet(str(tmp_path / "fr"))
    plan = _plan(fr.hint("shuffle_hash").join(pages, "url", "inner"))
    # exactly one Exchange (frontier side); pages buckets stream with NO
    # sort; the hash map builds from the frontier (BuildLeft) — the fetch
    # join the engine emits for fetch_join="bucketed" (crawler.py: an SMJ
    # here per-bucket sorts the HTML-heavy pages side and spills at high
    # thread counts)
    assert plan.count("Exchange") == 1
    assert "ShuffledHashJoin" in plan and "BuildLeft" in plan
    assert "Sort" not in plan.replace("SortAggregate", "")
    spark.sql("DROP TABLE pages_plan_test")


def test_extraction_udf_evaluated_once(spark):
    from owlfrontier.extract import extraction_udf

    df = spark.createDataFrame([(b"<p>x</p>", "http://h/")], "html binary, url string")
    ex = extraction_udf()
    out = df.withColumn("e", ex(F.col("html"), F.col("url"))).select(
        "e.title", "e.text_json", "e.links_all"
    )
    plan = _plan(out)
    assert plan.count("ArrowEvalPython") == 1  # struct fanout ≠ repeated eval
