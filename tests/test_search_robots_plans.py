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


def test_is_allowed_prefix_semantics():
    dis = ["/private", "/a/b"]
    assert not is_allowed("http://h/private/x", dis)
    assert not is_allowed("http://h/a/b", dis)
    assert is_allowed("http://h/a", dis)
    assert is_allowed("http://h/pub", dis)
    assert is_allowed("http://h/", [])


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


# --- plan-quality regression ---------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_word_index_query_prunes_to_text_column(spark):
    from owlfrontier.queries import QUERIES

    plan = _plan(QUERIES["word_index"](spark, "/root/testdata/sf0.001"))
    assert "ReadSchema: struct<text:string>" in plan  # column pruning
    assert plan.count("Exchange") == 1  # partial agg → one shuffle → final


def test_dedup_antijoin_broadcasts_seen_side(spark):
    from owlfrontier.queries import QUERIES

    plan = _plan(QUERIES["dedup_antijoin"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


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
    plan = _plan(fr.join(pages.hint("merge"), "url", "inner"))
    # exactly one Exchange (frontier side); pages side pre-bucketed+sorted
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" in plan
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
