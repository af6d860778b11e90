"""Crawl-equivalence tests: the Spark engine vs the pure-Python oracle
simulator (FIXTURES.md §3.3), including politeness deferral, robots gating,
fetch failure, the textless-page quirk, and resume-from-checkpoint identity.
"""

import pytest

from owlfrontier.crawler import CrawlConfig, CrawlEngine
from owlfrontier.fixtures import gen_site, pages_df, pages_map
from owlfrontier.robots import disallow_map
from owlfrontier.simulate import simulate_fifo, simulate_generations


def _mini_pages(spark, pages: dict):
    """url → html-str mapping → pages DataFrame with the mandated schema."""
    import datetime as dt

    rows = [
        (u, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i),
         h.encode() if isinstance(h, str) else h, None, "en")
        for i, (u, h) in enumerate(sorted(pages.items()))
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def _run(spark, tmp_path, pages, seeds, robots_rows=None, **cfg_kwargs):
    kwargs = dict(salt_buckets=2, frontier_partitions=4, use_bloom=False,
                  partition_hist=True)
    kwargs.update(cfg_kwargs)
    cfg = CrawlConfig(**kwargs)
    robots = None
    if robots_rows is not None:
        robots = spark.createDataFrame(
            robots_rows, "host string, robots_txt string"
        )
    engine = CrawlEngine(
        spark,
        _mini_pages(spark, pages) if isinstance(pages, dict) else pages,
        str(tmp_path / "store"),
        robots_df=robots,
        config=cfg,
    )
    summary = engine.run(seeds=seeds)
    return engine, summary


def _order_rows(engine):
    return [(r["seq"], r["generation"], r["url"])
            for r in engine.crawl_order().collect()]


def _check_equivalence(engine, golden):
    assert _order_rows(engine) == golden.crawl_order
    crawled = {r["url"]: r for r in engine.crawled().collect()}
    assert set(crawled) == golden.url_seen
    for url, text_json in golden.extracted.items():
        assert crawled[url]["text_json"] == text_json, url
    for url, parent in golden.parents.items():
        assert crawled[url]["discovered_from"] == parent, (url, parent)
    em = engine.metrics()
    assert len(em) == len(golden.metrics)
    for e, s in zip(em, golden.metrics):
        for key in ("generation", "frontier_size", "eligible", "robots_blocked",
                    "selected", "deferred", "fetched", "failed", "parsed",
                    "next_frontier"):
            assert e[key] == s[key], (key, e, s)
        if e["next_frontier"]:
            hist = e["frontier_partition_hist"]
            assert hist is not None
            assert sum(n for _, n in hist) == e["next_frontier"]


# --- scenarios ------------------------------------------------------------


def test_bfs_order_synthetic_site(spark, tmp_path):
    rows, seeds = gen_site(n_pages=50, n_hosts=4, seed=7)
    pages = pages_map(rows)
    golden = simulate_generations(pages, seeds)
    assert [u for _, _, u in golden.crawl_order] == simulate_fifo(pages, seeds)

    engine, summary = _run(spark, tmp_path, pages_df(spark, rows), seeds)
    _check_equivalence(engine, golden)
    assert summary["crawled"] == len(golden.url_seen)


def test_light_metrics_identical_crawl(spark, tmp_path):
    """Bench mode (light_metrics=True) must change ONLY which informational
    counts are collected — crawl order, seen-set, and extracted bytes stay
    identical; metrics keep exact fetched/next_frontier counts with the
    informational ones recorded as None."""
    rows, seeds = gen_site(n_pages=50, n_hosts=4, seed=7)
    golden = simulate_generations(pages_map(rows), seeds)
    engine, summary = _run(
        spark, tmp_path, pages_df(spark, rows), seeds, light_metrics=True
    )
    assert _order_rows(engine) == golden.crawl_order
    crawled = {r["url"]: r for r in engine.crawled().collect()}
    assert set(crawled) == golden.url_seen
    for url, text_json in golden.extracted.items():
        assert crawled[url]["text_json"] == text_json, url
    assert summary["crawled"] == len(golden.url_seen)
    # the exact counts light mode keeps still match the simulator; the
    # informational ones (each a separate count job) are skipped as None.
    # fetched/parsed/next_frontier ride the write jobs as observed metrics
    # so they are exact in every mode at zero extra jobs
    for m, s in zip(engine.metrics(), golden.metrics):
        assert m["fetched"] == s["fetched"]
        assert m["next_frontier"] == s["next_frontier"]
        assert m["parsed"] == s["parsed"]
        assert m["eligible"] is None and m["selected"] is None
        assert m["frontier_partition_hist"] is None


def test_politeness_budget_k2(spark, tmp_path):
    rows, seeds = gen_site(n_pages=24, n_hosts=3, seed=11)
    pages = pages_map(rows)
    golden = simulate_generations(pages, seeds, politeness_k=2,
                                  max_generations=200)
    engine, _ = _run(spark, tmp_path, pages_df(spark, rows), seeds,
                     politeness_k=2, max_generations=200)
    _check_equivalence(engine, golden)
    # no generation fetches more than k per host
    from owlfrontier.urlutil import host_of
    per_gen_host = {}
    for _, gen, url in golden.crawl_order:
        key = (gen, host_of(url))
        per_gen_host[key] = per_gen_host.get(key, 0) + 1
    assert max(per_gen_host.values()) <= 2


def test_diamond_dedup_first_wins(spark, tmp_path):
    pages = {
        "http://a.example/root": '<a href="/left">l</a><a href="/right">r</a>',
        "http://a.example/left": '<a href="/child">c</a>',
        "http://a.example/right": '<a href="/child">c</a>',
        "http://a.example/child": "<p>leaf</p>",
    }
    seeds = ["http://a.example/root"]
    golden = simulate_generations(pages, seeds)
    engine, _ = _run(spark, tmp_path, pages, seeds)
    _check_equivalence(engine, golden)
    # child fetched exactly once, in generation 2, after left/right
    urls = [u for _, _, u in _order_rows(engine)]
    assert urls.count("http://a.example/child") == 1
    assert urls == [
        "http://a.example/root",
        "http://a.example/left",
        "http://a.example/right",
        "http://a.example/child",
    ]


def test_missing_page_dropped_no_expansion(spark, tmp_path):
    pages = {
        "http://a.example/root": '<a href="/gone">g</a><a href="/ok">o</a>',
        "http://a.example/ok": "<p>fine</p>",
        # /gone is linked but not in the store → fetch failure
    }
    seeds = ["http://a.example/root", "http://missing.example/seed"]
    golden = simulate_generations(pages, seeds)
    engine, summary = _run(spark, tmp_path, pages, seeds)
    _check_equivalence(engine, golden)
    assert summary["failed"] == 2  # missing seed + /gone
    assert "http://a.example/gone" not in golden.url_seen


def test_textless_page_never_parsed(spark, tmp_path):
    pages = {
        "http://a.example/root": '<a href="/empty">e</a><p>text</p>',
        "http://a.example/empty": "<script>var x;</script>",
    }
    seeds = ["http://a.example/root"]
    golden = simulate_generations(pages, seeds)
    engine, _ = _run(spark, tmp_path, pages, seeds)
    _check_equivalence(engine, golden)
    rows = {r["url"]: r for r in engine.crawled().collect()}
    # crawled but never "parsed" (IsItParsed quirk, couchdb.go:283-288)
    assert rows["http://a.example/empty"]["parsed_on"] is None
    assert rows["http://a.example/empty"]["fetched_on"] is not None
    assert golden.metrics[1]["fetched"] == 1 and golden.metrics[1]["parsed"] == 0


def test_robots_gate(spark, tmp_path):
    pages = {
        "http://a.example/root": '<a href="/private/x">p</a><a href="/pub">q</a>',
        "http://a.example/private/x": "<p>secret</p>",
        "http://a.example/pub": "<p>open</p>",
    }
    seeds = ["http://a.example/root"]
    robots_rows = [("a.example", "User-agent: *\nDisallow: /private")]
    golden = simulate_generations(
        pages, seeds, robots=disallow_map(robots_rows)
    )
    engine, _ = _run(spark, tmp_path, pages, seeds,
                     robots_rows=robots_rows, robots_enabled=True)
    _check_equivalence(engine, golden)
    assert "http://a.example/private/x" not in golden.url_seen
    assert "http://a.example/pub" in golden.url_seen
    assert golden.metrics[1]["robots_blocked"] == 1

    # disabled ⇒ identical to no-robots run (reference equivalence, §2.5)
    golden_off = simulate_generations(pages, seeds)
    assert "http://a.example/private/x" in golden_off.url_seen


def test_robots_gate_rfc9309_allow_overrides(spark, tmp_path):
    """RFC 9309 in the ENGINE gate: a longer Allow overrides a Disallow
    prefix, a wildcard+anchor Disallow blocks by extension, and the
    Spark higher-order-function evaluation matches the pure-Python
    simulator exactly."""
    pages = {
        "http://a.example/root":
            '<a href="/private/x">a</a><a href="/private/ok/y">b</a>'
            '<a href="/cache.tmp">c</a><a href="/cache.tmpl">d</a>',
        "http://a.example/private/x": "<p>secret</p>",
        "http://a.example/private/ok/y": "<p>whitelisted</p>",
        "http://a.example/cache.tmp": "<p>scratch</p>",
        "http://a.example/cache.tmpl": "<p>template</p>",
    }
    seeds = ["http://a.example/root"]
    robots_rows = [(
        "a.example",
        "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
        "Disallow: /*.tmp$\n",
    )]
    golden = simulate_generations(
        pages, seeds, robots=disallow_map(robots_rows)
    )
    engine, _ = _run(spark, tmp_path, pages, seeds,
                     robots_rows=robots_rows, robots_enabled=True)
    _check_equivalence(engine, golden)
    assert "http://a.example/private/ok/y" in golden.url_seen  # Allow wins
    assert "http://a.example/cache.tmpl" in golden.url_seen  # $ anchors
    assert "http://a.example/private/x" not in golden.url_seen
    assert "http://a.example/cache.tmp" not in golden.url_seen
    assert golden.metrics[1]["robots_blocked"] == 2


def test_duplicate_seeds_first_wins(spark, tmp_path):
    pages = {"http://a.example/p": "<p>x</p>"}
    seeds = ["http://a.example/p", "http://a.example/p"]
    golden = simulate_generations(pages, seeds)
    engine, _ = _run(spark, tmp_path, pages, seeds)
    _check_equivalence(engine, golden)
    assert len(golden.crawl_order) == 1


def test_resume_identical_to_uninterrupted(spark, tmp_path):
    rows, seeds = gen_site(n_pages=30, n_hosts=3, seed=23)
    pdf = pages_df(spark, rows)
    pages = pages_map(rows)

    # uninterrupted run
    full_engine, _ = _run(spark, tmp_path / "full", pdf, seeds, politeness_k=3,
                          max_generations=100)
    full_order = _order_rows(full_engine)

    # interrupted after 2 generations, then resumed with a FRESH engine
    cfg = dict(politeness_k=3, salt_buckets=2, frontier_partitions=4,
               use_bloom=False, partition_hist=True)
    part_engine = CrawlEngine(
        spark, pdf, str(tmp_path / "part" / "store"),
        config=CrawlConfig(max_generations=2, **cfg),
    )
    part_engine.run(seeds=seeds)
    assert len(part_engine.metrics()) == 2

    resumed = CrawlEngine(
        spark, pdf, str(tmp_path / "part" / "store"),
        config=CrawlConfig(max_generations=100, **cfg),
    )
    resumed.run(resume=True)

    assert _order_rows(resumed) == full_order
    golden = simulate_generations(pages, seeds, politeness_k=3,
                                  max_generations=100)
    _check_equivalence(resumed, golden)


def test_bloom_prefilter_does_not_change_answers(spark, tmp_path):
    rows, seeds = gen_site(n_pages=50, n_hosts=4, seed=7)
    pages = pages_map(rows)
    golden = simulate_generations(pages, seeds)
    engine, _ = _run(spark, tmp_path, pages_df(spark, rows), seeds,
                     use_bloom=True, bloom_auto_threshold=0)
    _check_equivalence(engine, golden)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))


def test_politeness_k1_reference_tick_equivalence(spark, tmp_path):
    """k=1 per host per generation ≈ the reference's 5 s tick with one
    fetcher (FIXTURES.md §1.4) — the stated reference-equivalence budget."""
    pages = {
        "http://a.example/r": '<a href="/x">x</a><a href="/y">y</a><a href="/z">z</a>',
        "http://a.example/x": "<p>x</p>",
        "http://a.example/y": "<p>y</p>",
        "http://a.example/z": "<p>z</p>",
        "http://b.example/r": '<a href="/only">o</a>',
        "http://b.example/only": "<p>o</p>",
    }
    seeds = ["http://a.example/r", "http://b.example/r"]
    golden = simulate_generations(pages, seeds, politeness_k=1,
                                  max_generations=50)
    engine, _ = _run(spark, tmp_path, pages, seeds, politeness_k=1,
                     max_generations=50)
    _check_equivalence(engine, golden)
    # one URL per host per generation, strictly
    from owlfrontier.urlutil import host_of
    per = {}
    for _, gen, url in golden.crawl_order:
        key = (gen, host_of(url))
        assert key not in per, key
        per[key] = url
    assert len(golden.url_seen) == 6


def test_resume_with_bloom_rebuild(spark, tmp_path):
    """Resume must rebuild the Bloom filter from the committed crawled set
    (CrawlEngine._rebuild_bloom) and still match the oracle exactly."""
    rows, seeds = gen_site(n_pages=30, n_hosts=3, seed=31)
    pdf = pages_df(spark, rows)
    golden = simulate_generations(pages_map(rows), seeds)

    cfg = dict(salt_buckets=2, frontier_partitions=4, partition_hist=True,
               use_bloom=True, bloom_auto_threshold=0, bloom_capacity=10_000)
    part = CrawlEngine(spark, pdf, str(tmp_path / "store"),
                       config=CrawlConfig(max_generations=2, **cfg))
    part.run(seeds=seeds)

    resumed = CrawlEngine(spark, pdf, str(tmp_path / "store"),
                          config=CrawlConfig(max_generations=100, **cfg))
    assert resumed._bloom is None
    resumed.run(resume=True)
    assert resumed._bloom is not None  # rebuilt from committed generations
    _check_equivalence(resumed, golden)


def test_add_seeds_mid_crawl_and_after_completion(spark, tmp_path):
    """The reference's live /add-site surface (webapp/main.go:157-196):
    seeds injected at the generation barrier join the pending frontier
    (dedup against crawled, first-wins), and a FINISHED crawl wakes back
    up when new seeds arrive."""
    pages = {
        "http://a.example/r": '<a href="/x">x</a>',
        "http://a.example/x": "<p>x</p>",
        "http://b.example/r": '<a href="/y">y</a>',
        "http://b.example/y": "<p>y</p>",
    }
    engine, _ = _run(spark, tmp_path, pages, ["http://a.example/r"])
    assert {r["url"] for r in engine.crawled().collect()} == {
        "http://a.example/r", "http://a.example/x"
    }
    # crawl finished (frontier empty) — inject a new site, resume
    n = engine.add_seeds(["http://b.example/r", "http://a.example/r"])
    assert n == 1  # a.example/r already crawled: deduped out
    summary = engine.run(resume=True)
    got = {r["url"] for r in engine.crawled().collect()}
    assert got == set(pages)
    assert summary["crawled"] == 4  # summary spans the whole crawl's metrics

    # mid-crawl injection: stop after gen 0, inject, resume
    eng2, _ = _run(spark, tmp_path / "mid", pages,
                   ["http://a.example/r"], max_generations=1)
    assert eng2.add_seeds(["http://b.example/r"]) == 2  # pending /x + new
    eng2.config.max_generations = 100
    eng2.run(resume=True)
    assert {r["url"] for r in eng2.crawled().collect()} == set(pages)
    # injected paths are namespaced: crawl_order stays fully deterministic
    seqs = [r["seq"] for r in eng2.crawl_order().collect()]
    assert sorted(seqs) == list(range(len(pages)))


def test_crawl_delay_shrinks_host_budget(spark, tmp_path):
    """robots Crawl-delay maps onto the politeness budget: with k=2 and a
    10 s delay (unit 5 s) host a gets 1 fetch/generation while host b
    keeps 2; the seen-set is unaffected (deferral, not exclusion)."""
    pages = {
        "http://a.example/r": ('<a href="/1">1</a><a href="/2">2</a>'
                               '<a href="/3">3</a>'),
        "http://a.example/1": "<p>1</p>",
        "http://a.example/2": "<p>2</p>",
        "http://a.example/3": "<p>3</p>",
        "http://b.example/r": '<a href="/1">1</a><a href="/2">2</a>',
        "http://b.example/1": "<p>1</p>",
        "http://b.example/2": "<p>2</p>",
    }
    seeds = ["http://a.example/r", "http://b.example/r"]
    robots_rows = [("a.example", "User-agent: *\nCrawl-delay: 10\n")]
    engine, summary = _run(
        spark, tmp_path, pages, seeds, robots_rows=robots_rows,
        robots_enabled=True, politeness_k=2, max_generations=50,
    )
    assert summary["crawled"] == 7  # nothing excluded, only deferred
    per_gen_host: dict = {}
    for r in engine.crawled().collect():
        key = (r["gen_fetched"], r["host"])
        per_gen_host[key] = per_gen_host.get(key, 0) + 1
    for (gen, host), n in per_gen_host.items():
        cap = 1 if host == "a.example" else 2
        assert n <= cap, (gen, host, n)
    # the delayed host actually needed more generations than the free one
    a_gens = max(g for (g, h) in per_gen_host if h == "a.example")
    b_gens = max(g for (g, h) in per_gen_host if h == "b.example")
    assert a_gens > b_gens


def test_priority_policy_changes_schedule_not_seen_set(spark, tmp_path):
    """north_rule priority queue: a custom priority reorders WHICH
    generation each URL is fetched in under a budget, but the final
    seen-set is priority-invariant (deferral preserves membership)."""
    pages = {
        "http://a.example/seed": (
            '<a href="/zzzz-long-path">z</a><a href="/b">b</a>'
        ),
        "http://a.example/zzzz-long-path": "<p>z</p>",
        "http://a.example/b": "<p>b</p>",
    }
    seeds = ["http://a.example/seed"]
    # FIFO: gen-1 fetches the first-discovered link (/zzzz-long-path)
    fifo_eng, _ = _run(spark, tmp_path / "fifo", pages, seeds,
                       politeness_k=1, max_generations=50)
    fifo_order_rows = [u for _, _, u in _order_rows(fifo_eng)]
    assert fifo_order_rows[1] == "http://a.example/zzzz-long-path"
    # priority = shortest url first: gen-1 fetches /b instead
    pri_eng, _ = _run(spark, tmp_path / "pri", pages, seeds,
                      politeness_k=1, max_generations=50,
                      priority="length(url)")
    pri_rows = {r["url"]: r["gen_fetched"]
                for r in pri_eng.crawled().collect()}
    assert pri_rows["http://a.example/b"] == 1
    assert pri_rows["http://a.example/zzzz-long-path"] == 2
    # seen-set identical under either policy
    assert set(pri_rows) == set(fifo_order_rows)


def test_score_priority_drains_high_scores_first(spark, tmp_path):
    """priority="score": the per-host budget drains by an external
    (url, score) table — the pagerank-feeds-the-frontier loop. Highest
    score first, unscored URLs last, FIFO tiebreak; the seen-set stays
    priority-invariant."""
    from owlfrontier.crawler import CrawlConfig, CrawlEngine

    pages = {
        "http://a.example/seed": (
            '<a href="/low">l</a><a href="/high">h</a><a href="/none">n</a>'
        ),
        "http://a.example/low": "<p>l</p>",
        "http://a.example/high": "<p>h</p>",
        "http://a.example/none": "<p>n</p>",
    }
    scores = spark.createDataFrame(
        [("http://a.example/high", 9.0), ("http://a.example/low", 1.0)],
        "url string, score double",
    )
    engine = CrawlEngine(
        spark,
        _mini_pages(spark, pages),
        str(tmp_path / "store"),
        priority_scores=scores,
        config=CrawlConfig(
            politeness_k=1, salt_buckets=2, frontier_partitions=4,
            use_bloom=False, priority="score", max_generations=50,
        ),
    )
    engine.run(seeds=["http://a.example/seed"])
    gens = {r["url"]: r["gen_fetched"] for r in engine.crawled().collect()}
    # FIFO would fetch /low (first-discovered) in gen 1; score mode must
    # fetch /high first, then /low, then the unscored /none
    assert gens["http://a.example/high"] == 1
    assert gens["http://a.example/low"] == 2
    assert gens["http://a.example/none"] == 3
    # seen-set invariant vs the FIFO run of the same site
    fifo_eng, _ = _run(spark, tmp_path / "fifo", pages,
                       ["http://a.example/seed"],
                       politeness_k=1, max_generations=50)
    assert set(gens) == {r["url"] for r in fifo_eng.crawled().collect()}


def test_score_priority_without_scores_table_raises(spark, tmp_path):
    import pytest as _pytest

    from owlfrontier.crawler import CrawlConfig, CrawlEngine

    with _pytest.raises(ValueError, match="priority_scores"):
        CrawlEngine(
            spark,
            _mini_pages(spark, {"http://a.example/x": "<p>x</p>"}),
            str(tmp_path / "store"),
            config=CrawlConfig(priority="score"),
        )


def test_sharded_bloom_matches_single_filter(spark):
    """bloom.py ShardedBloomFilter (the 10^10-key shape): B=4 shards built
    from the same keys must agree with the monolithic filter on every
    inserted key (zero false negatives — the correctness property; false
    positives are allowed and arbitrated by the exact anti-join)."""
    import numpy as np

    from owlfrontier import bloom as bloommod
    from owlfrontier.synthweb import synth_pages
    from pyspark.sql import functions as F

    pages = synth_pages(spark, 2000, n_hosts=20, partitions=4).select(
        "url", F.regexp_extract(
            "url", r"^[a-z]+://([^/:?#]*)", 1).alias("host")
    )
    single = bloommod.build_from_df(pages, "url", expected_n=2000)
    sharded = bloommod.build_sharded_from_df(
        pages, "url", "host", n_shards=4, expected_n=2000
    )
    rows = pages.select(
        F.pmod(F.xxhash64("host"), F.lit(4)).cast("int").alias("sid"),
        F.xxhash64("url").alias("h"),
    ).collect()
    sids = np.array([r["sid"] for r in rows], dtype=np.int32)
    hs = np.array([r["h"] for r in rows], dtype=np.int64).view(np.uint64)
    assert single.might_contain(hs).all()  # no false negatives, single
    assert sharded.might_contain(sids, hs).all()  # no false negatives, sharded
    # union = per-shard bitwise OR (incremental maintenance contract)
    u = sharded.union(sharded)
    assert all((a == b).all() for a, b in zip(u.shards, sharded.shards))
    # absent keys are mostly rejected (the filter actually filters)
    miss = (hs + np.uint64(0x9E3779B9)) * np.uint64(2654435761)
    assert sharded.might_contain(sids, miss).mean() < 0.2


def test_sharded_bloom_engine_equivalence(spark, tmp_path):
    """use_bloom='sharded' end-to-end: identical crawl order, seen set, and
    metrics to the oracle (survivors identical to the exact path)."""
    rows, seeds = gen_site(n_pages=50, n_hosts=4, seed=7)
    golden = simulate_generations(pages_map(rows), seeds)
    engine, _ = _run(spark, tmp_path, pages_df(spark, rows), seeds,
                     use_bloom="sharded", bloom_shards=4,
                     bloom_capacity=10_000)
    assert engine._bloom is not None
    from owlfrontier.bloom import ShardedBloomFilter
    assert isinstance(engine._bloom, ShardedBloomFilter)
    _check_equivalence(engine, golden)


def test_seed_table_input_equivalence(spark, tmp_path):
    """Seeds as a (url, seq) DataFrame — the at-scale generation-0 path —
    must produce the identical crawl to the driver-list path."""
    rows, seeds = gen_site(n_pages=40, n_hosts=4, seed=19)
    golden = simulate_generations(pages_map(rows), seeds)
    seeds_df = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seeds)], "url string, seq bigint"
    ).repartition(4)
    engine, summary = _run(spark, tmp_path, pages_df(spark, rows), seeds_df)
    _check_equivalence(engine, golden)
    assert summary["crawled"] == len(golden.url_seen)


def test_salted_partitioning_defuses_hot_host(spark):
    """SURVEY.md §5.2.6: a Zipf frontier where one host owns ~30% of URLs
    must spread across salt buckets — no partition holds the whole host."""
    from pyspark.sql import functions as F

    from owlfrontier.synthweb import synth_pages

    n = 4000
    pages = synth_pages(spark, n, n_hosts=40, hot_pct=30, partitions=8)
    frontier = pages.select(
        "url",
        F.regexp_extract("url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]*)", 1).alias("host"),
        F.array(F.xxhash64("url")).alias("path"),
    )
    eng_cfg = CrawlConfig(salt_buckets=8, frontier_partitions=16)
    engine = CrawlEngine.__new__(CrawlEngine)
    engine.config = eng_cfg
    parts = (
        engine._partition_frontier(frontier)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    sizes = [r["count"] for r in parts]
    hot = frontier.where(F.col("host") == "h0.example").count()
    assert hot >= 0.25 * n  # the skew actually exists
    # salting spread: no single partition carries the hot host whole
    assert max(sizes) < hot * 0.6
    assert len(sizes) >= 12  # rows actually spread across partitions


def test_light_mode_driver_action_contract(spark, tmp_path, monkeypatch):
    """Overhead contract (round 3): a streamlined crawl (light metrics,
    unbounded budget, no robots, no bloom, no partition hist) issues NO
    per-generation count()/collect() driver actions — fetched/parsed/
    next-frontier all ride the two write jobs as observed metrics. The
    only count allowed is run()'s single initial frontier-size read.
    Regression-pins the removal of the entry-dedup scan, the separate
    count jobs, and the frontier read-back count."""
    from pyspark.sql import DataFrame as _DF

    rows, seeds = gen_site(n_pages=40, n_hosts=4, seed=23)
    golden = simulate_generations(pages_map(rows), seeds)

    calls = {"count": 0, "collect": 0}
    orig_count, orig_collect = _DF.count, _DF.collect

    def counting_count(self):
        calls["count"] += 1
        return orig_count(self)

    def counting_collect(self):
        calls["collect"] += 1
        return orig_collect(self)

    monkeypatch.setattr(_DF, "count", counting_count)
    monkeypatch.setattr(_DF, "collect", counting_collect)
    engine = CrawlEngine(
        spark, pages_df(spark, rows), str(tmp_path / "store"),
        config=CrawlConfig(salt_buckets=2, frontier_partitions=4,
                           use_bloom=False, light_metrics=True),
    )
    engine.run(seeds=seeds)
    monkeypatch.undo()

    assert calls["count"] <= 1, calls  # only the initial frontier size
    assert calls["collect"] == 0, calls
    assert {r["url"] for r in engine.crawled().collect()} == golden.url_seen


def test_light_mode_policied_driver_action_contract(spark, tmp_path,
                                                    monkeypatch):
    """Round-4 extension of the overhead contract: a POLICIED light-mode
    crawl (per-host budget + robots) must also skip the informational
    eligible/selected/robots-blocked count jobs — measured ~1 s fixed
    floor per generation at 32 threads, which dominated small
    generations of the policied bench loop. Crawl results must still
    match the simulator."""
    from pyspark.sql import DataFrame as _DF

    rows, seeds = gen_site(n_pages=40, n_hosts=4, seed=23)
    golden = simulate_generations(pages_map(rows), seeds, politeness_k=2)

    calls = {"count": 0, "collect": 0}
    orig_count, orig_collect = _DF.count, _DF.collect

    def counting_count(self):
        calls["count"] += 1
        return orig_count(self)

    def counting_collect(self):
        calls["collect"] += 1
        return orig_collect(self)

    monkeypatch.setattr(_DF, "count", counting_count)
    monkeypatch.setattr(_DF, "collect", counting_collect)
    engine = CrawlEngine(
        spark, pages_df(spark, rows), str(tmp_path / "store"),
        config=CrawlConfig(salt_buckets=2, frontier_partitions=4,
                           use_bloom=False, light_metrics=True,
                           politeness_k=2),
    )
    engine.run(seeds=seeds)
    monkeypatch.undo()

    assert calls["count"] <= 1, calls  # only the initial frontier size
    assert calls["collect"] == 0, calls
    assert _order_rows(engine) == golden.crawl_order
    assert {r["url"] for r in engine.crawled().collect()} == golden.url_seen
    # exact counts still ride the writes; informational ones are None
    for m, s in zip(engine.metrics(), golden.metrics):
        assert m["fetched"] == s["fetched"]
        assert m["next_frontier"] == s["next_frontier"]
        assert m["eligible"] is None and m["selected"] is None


def test_sitemap_seed_bootstrap(spark, tmp_path):
    """Sitemap-driven seeding (robots.sitemap_seeds_from_pages): Sitemap:
    URLs in stored robots.txt rows resolve to sitemap XML pages in the
    store; their <loc> entries become the (url, seq) seed table and the
    crawl proceeds from them."""
    from owlfrontier.robots import sitemap_seeds_from_pages

    sitemap_xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> http://a.example/p0 </loc></url>"
        "<url><loc>http://b.example/p0</loc></url>"
        "</urlset>"
    )
    pages = _mini_pages(spark, {
        "http://a.example/robots.txt":
            "User-agent: *\nDisallow: /private\n"
            "Sitemap: http://a.example/sitemap.xml\n",
        "http://a.example/sitemap.xml": sitemap_xml,
        "http://a.example/p0": '<a href="/p1">n</a>',
        "http://a.example/p1": "<p>leaf</p>",
        "http://b.example/p0": "<p>other host</p>",
    })
    seeds = sitemap_seeds_from_pages(pages)
    got = {r["url"] for r in seeds.collect()}
    assert got == {"http://a.example/p0", "http://b.example/p0"}

    engine = CrawlEngine(
        spark, pages, str(tmp_path / "store"),
        config=CrawlConfig(salt_buckets=2, frontier_partitions=4,
                           use_bloom=False),
    )
    summary = engine.run(seeds=seeds)
    crawled = {r["url"] for r in engine.crawled().collect()}
    # both sitemap seeds crawled, link-following still works from them
    assert {"http://a.example/p0", "http://a.example/p1",
            "http://b.example/p0"} <= crawled
    assert summary["crawled"] == len(crawled)


def test_incremental_word_index_equals_recompute(spark, tmp_path):
    """O14 incremental maintenance (couchdb.go:87-109 analog): the
    per-generation-appended postings index after a multi-generation crawl
    + live add_seeds resume + mid-crawl compaction equals the full
    recompute from the crawled pages, row for row."""
    from owlfrontier.search import word_index as full_recompute

    rows, seeds = gen_site(n_pages=40, n_hosts=3, seed=13)
    pdf = pages_df(spark, rows)
    engine, _ = _run(spark, tmp_path, pdf, seeds, politeness_k=2,
                     maintain_index=True, compact_every_n=2,
                     max_generations=3)  # stop mid-crawl
    crawled_so_far = {r["url"] for r in engine.crawled().collect()}
    unseen = sorted(r["url"] for r in rows
                    if r["url"] not in crawled_so_far)[:2]
    assert unseen  # the partial crawl left pages to inject
    assert engine.add_seeds(unseen) >= 1
    cfg = dict(salt_buckets=2, frontier_partitions=4, use_bloom=False,
               partition_hist=True, politeness_k=2, maintain_index=True,
               compact_every_n=2, max_generations=100)
    engine = CrawlEngine(spark, pdf, str(tmp_path / "store"),
                         config=CrawlConfig(**cfg))
    engine.run(resume=True)

    def rowset(df):
        return sorted(
            (r["word"], r["doc_count"], tuple(r["urls"]))
            for r in df.collect()
        )

    incremental = rowset(engine.word_index())
    recomputed = rowset(full_recompute(engine.crawled()))
    assert incremental == recomputed
    assert len(incremental) > 0
    # the incremental path actually used the postings table
    manifest = engine.store.read_manifest()
    assert engine.store.read_gens(
        "postings", manifest["crawled_generations"]
    ) is not None


def test_word_index_after_enabling_maintain_index_on_resume(spark, tmp_path):
    """The natural adoption path: a crawl run WITHOUT maintain_index,
    then resumed WITH it. Earlier generations have no postings
    partitions; resume must backfill them (and word_index must never
    aggregate a partial postings table), so the incremental index equals
    the full recompute rather than silently dropping the earlier
    documents."""
    from owlfrontier.search import word_index as full_recompute

    rows, seeds = gen_site(n_pages=40, n_hosts=3, seed=13)
    pdf = pages_df(spark, rows)
    # phase 1: two generations, index maintenance OFF
    engine, _ = _run(spark, tmp_path, pdf, seeds, politeness_k=2,
                     max_generations=2)
    manifest = engine.store.read_manifest()
    gens_before = list(manifest["crawled_generations"])
    assert engine.store.missing_gens("postings", gens_before) == gens_before
    # phase 2: resume with the flag ON — backfill + incremental thereafter
    cfg = dict(salt_buckets=2, frontier_partitions=4, use_bloom=False,
               partition_hist=True, politeness_k=2, maintain_index=True,
               max_generations=100)
    engine = CrawlEngine(spark, pdf, str(tmp_path / "store"),
                         config=CrawlConfig(**cfg))
    engine.run(resume=True)

    def rowset(df):
        return sorted(
            (r["word"], r["doc_count"], tuple(r["urls"]))
            for r in df.collect()
        )

    manifest = engine.store.read_manifest()
    gens = manifest["crawled_generations"]
    # every committed generation (incl. the pre-flag ones) has postings
    assert engine.store.missing_gens("postings", gens) == []
    incremental = rowset(engine.word_index())
    recomputed = rowset(full_recompute(engine.crawled()))
    assert incremental == recomputed
    assert len(incremental) > 0


def test_word_index_guard_on_partial_postings(spark, tmp_path):
    """A hand-built store with a PARTIAL postings table (e.g. one written
    outside the engine) must fall back to the full recompute — the
    ADVICE-reported wrong-answer shape."""
    import shutil

    from owlfrontier.search import word_index as full_recompute

    rows, seeds = gen_site(n_pages=40, n_hosts=3, seed=13)
    pdf = pages_df(spark, rows)
    engine, _ = _run(spark, tmp_path, pdf, seeds, politeness_k=2,
                     maintain_index=True, max_generations=3)
    gens = engine.store.read_manifest()["crawled_generations"]
    assert len(gens) >= 2
    # simulate the partial table: delete the first generation's postings
    shutil.rmtree(engine.store._gen_dir("postings", gens[0]))
    assert engine.store.missing_gens("postings", gens) == [gens[0]]
    full = sorted(
        (r["word"], r["doc_count"]) for r in
        full_recompute(engine.crawled()).select("word", "doc_count").collect()
    )
    got = sorted(
        (r["word"], r["doc_count"]) for r in
        engine.word_index().select("word", "doc_count").collect()
    )
    assert got == full  # NOT the partial-postings answer


def test_orphan_postings_dropped_on_resume_with_flag_off(spark, tmp_path):
    """A crash after a postings write, resumed with maintain_index OFF,
    must still clean the orphan postings dir (ADVICE: the cleanup was
    gated on the flag, leaving stale data a later re-enable could read
    as committed)."""
    rows, seeds = gen_site(n_pages=30, n_hosts=3, seed=13)
    pdf = pages_df(spark, rows)
    engine, _ = _run(spark, tmp_path, pdf, seeds, politeness_k=2,
                     maintain_index=True, max_generations=2)
    store = engine.store
    gens = store.read_manifest()["crawled_generations"]
    # fabricate the crash artifact: an uncommitted postings dir for a
    # generation the manifest does not list as crawled
    orphan_gen = max(gens) + 7
    store.write_gen(store.read_gens("postings", gens), "postings", orphan_gen)
    import os
    assert os.path.isdir(store._gen_dir("postings", orphan_gen))
    engine2 = CrawlEngine(
        spark, pdf, str(tmp_path / "store"),
        config=CrawlConfig(salt_buckets=2, frontier_partitions=4,
                           use_bloom=False),  # flag OFF
    )
    engine2.run(resume=True)
    assert not os.path.isdir(store._gen_dir("postings", orphan_gen))


def test_robots_from_pages_gates_crawl(spark, tmp_path):
    """SURVEY §2.5 bootstrap path: robots rules parsed OUT OF the pages
    store (the corpus holds host/robots.txt like any page) gate the crawl
    exactly like an external rules table; first-wins picks the earliest
    snapshot when an archive holds several."""
    from owlfrontier.robots import robots_from_pages

    pages = _mini_pages(spark, {
        "http://a.example/seed": '<a href="/ok">o</a><a href="/priv/x">p</a>',
        "http://a.example/ok": "<p>ok</p>",
        "http://a.example/priv/x": "<p>secret</p>",
        "http://a.example/robots.txt":
            "User-agent: *\nDisallow: /priv/\n",
        "http://b.example/robots.txt":  # unrelated host, allows all
            "User-agent: *\nDisallow:\n",
    })
    rules = robots_from_pages(pages)
    rows = {r["host"]: r["robots_txt"] for r in rules.collect()}
    assert set(rows) == {"a.example", "b.example"}
    assert "Disallow: /priv/" in rows["a.example"]

    from owlfrontier.crawler import CrawlConfig, CrawlEngine

    engine = CrawlEngine(
        spark, pages, str(tmp_path / "store"), robots_df=rules,
        config=CrawlConfig(robots_enabled=True, salt_buckets=2,
                           frontier_partitions=4, use_bloom=False,
                           max_generations=10),
    )
    engine.run(seeds=["http://a.example/seed"])
    seen = {r["url"] for r in engine.crawled().collect()}
    assert "http://a.example/ok" in seen
    assert "http://a.example/priv/x" not in seen


def test_canonical_keys_collapses_variant_urls(spark, tmp_path):
    """CrawlConfig.canonical_keys (north_rule: seen set keyed on
    CANONICALIZED urls): variant spellings of a page — www./case, :80,
    fragment, trailing slash, utm_*/ref params — collapse to ONE
    frontier identity at ingress (seeds and discovered links), so they
    fetch, dedup and crawl exactly once. With the knob off (the
    reference-faithful default, parse.go:88-131 stores hrefs verbatim)
    none of the variant spellings match the store keys and only the
    seed page crawls."""
    pages = {
        "http://a.example/p0": (
            '<a href="//WWW.A.Example:80/p1?utm_source=x">v1</a>'
            '<a href="/p1#frag">v2</a>'
            '<a href="/p1/">v3</a>'
            '<a href="/p2?utm_source=f&amp;ref=rss">v4</a>'
        ),
        "http://a.example/p1": '<a href="/p2">w</a>',
        "http://a.example/p2": "<p>done</p>",
    }
    messy_seed = ["http://WWW.A.Example:80/p0#top"]

    _, off_summary = _run(spark, tmp_path / "off", pages, messy_seed)
    assert off_summary["crawled"] == 0  # even the seed spelling misses

    engine, summary = _run(
        spark, tmp_path / "on", pages, messy_seed, canonical_keys=True
    )
    assert summary["crawled"] == 3
    order = _order_rows(engine)
    assert [u for _, _, u in order] == [
        "http://a.example/p0",
        "http://a.example/p1",
        "http://a.example/p2",
    ]
    # p1's three variants first-wins-merged on the FIRST href's position;
    # p2 discovered from p0 (earlier than via p1)
    parents = {
        r["url"]: r["discovered_from"]
        for r in engine.crawled().collect()
    }
    assert parents["http://a.example/p1"] == "http://a.example/p0"
    assert parents["http://a.example/p2"] == "http://a.example/p0"
    # every crawled row keyed canonically, exactly once
    urls = [r["url"] for r in engine.crawled().collect()]
    assert len(urls) == len(set(urls)) == 3


def test_canonical_ingress_is_identity_when_off(spark, tmp_path):
    """Knob off ⇒ _canonical_ingress returns the SAME DataFrame object —
    the reference-equivalence (and scaling-pin) plan is untouched."""
    from owlfrontier.crawler import CrawlConfig, CrawlEngine

    engine = CrawlEngine(
        spark,
        _mini_pages(spark, {"http://a.example/p0": "x"}),
        str(tmp_path / "store"),
        config=CrawlConfig(use_bloom=False),
    )
    df = _mini_pages(spark, {"http://a.example/p0": "x"})
    assert engine._canonical_ingress(df) is df


def test_canonicalize_pages_dedupes_store_first_wins(spark):
    """The ingestion helper keeps ONE row per canonical url — earliest
    warc_ts wins, raw-url tiebreak — so a canonical-keys fetch join can
    never fan out on duplicate captures."""
    import datetime as dt

    from owlfrontier.crawler import CrawlEngine

    rows = [
        ("http://WWW.A.Example:80/p1?utm_source=x",
         dt.datetime(2026, 1, 2), b"late", None, "en"),
        ("http://a.example/p1#frag",
         dt.datetime(2026, 1, 1), b"early", None, "en"),
        ("http://a.example/p2/",
         dt.datetime(2026, 1, 3), b"only", None, "en"),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = {
        r["url"]: (bytes(r["html"]), r["warc_ts"])
        for r in CrawlEngine.canonicalize_pages(pages).collect()
    }
    assert set(got) == {"http://a.example/p1", "http://a.example/p2"}
    assert got["http://a.example/p1"][0] == b"early"
    assert got["http://a.example/p2"][0] == b"only"


def test_general_pagerank_matches_fixed_graph_twin(spark):
    """graph.pagerank (arbitrary outdegrees) must be BIT-IDENTICAL to
    the oracle-paired fixed-outdegree q_pagerank on its own graph —
    the general implementation inherits the specialized one's
    hash-matched correctness where they overlap."""
    from pyspark.sql import functions as F

    from owlfrontier import queries as Q
    from owlfrontier.graph import pagerank

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id")
    n = docs.count()
    nodes = docs.select(F.col("doc_id").alias("id"))
    edges = docs.selectExpr(
        "doc_id AS src", f"pmod(2 * doc_id + 1, {n}) AS dst"
    ).unionAll(
        docs.selectExpr(
            "doc_id AS src", f"pmod(3 * doc_id + 7, {n}) AS dst"
        )
    )
    want = {
        r["doc_id"]: r["pr"] for r in Q.q_pagerank(spark, sf).collect()
    }
    got = {
        r["id"]: r["pr"]
        for r in pagerank(nodes, edges, iters=Q._PR_ITERS).collect()
    }
    assert got == want


def test_pagerank_feeds_priority_crawl_end_to_end(spark, tmp_path):
    """The full feedback loop: crawl a site FIFO → build the real link
    graph from the crawled store → rank it with graph.pagerank →
    re-crawl with the ranks as priority_scores. The most-linked page
    must be fetched FIRST under the k=1 budget even though FIFO
    discovery order puts it last."""
    from pyspark.sql import functions as F

    from owlfrontier.crawler import CrawlConfig, CrawlEngine
    from owlfrontier.graph import pagerank

    # seed discovers /a, /b, /hub in that order; every leaf links back
    # to /hub, so /hub out-ranks its discovery peers
    pages = {
        "http://s.example/seed": (
            '<a href="/a">a</a><a href="/b">b</a><a href="/hub">h</a>'
        ),
        "http://s.example/a": '<a href="/hub">h</a>',
        "http://s.example/b": '<a href="/hub">h</a>',
        "http://s.example/hub": "<p>hub</p>",
    }

    def crawl(store, scores=None):
        eng = CrawlEngine(
            spark,
            _mini_pages(spark, pages),
            str(tmp_path / store),
            priority_scores=scores,
            config=CrawlConfig(
                politeness_k=1, salt_buckets=2, frontier_partitions=4,
                use_bloom=False, max_generations=50,
                priority="score" if scores is not None else "fifo",
            ),
        )
        eng.run(seeds=["http://s.example/seed"])
        return eng

    fifo = crawl("fifo")
    crawled = fifo.crawled()
    # real link graph from the store (links_all holds the RESOLVED
    # absolute urls, extract.py)
    edges = crawled.select(
        F.col("url").alias("src"), F.explode("links_all").alias("dst")
    )
    nodes = crawled.select(F.col("url").alias("id"))
    ranks = pagerank(nodes, edges.join(nodes, edges["dst"] == nodes["id"],
                                       "left_semi"))
    scores = ranks.select(
        F.col("id").alias("url"), F.col("pr").cast("double").alias("score")
    )
    rank_map = {r["id"]: r["pr"] for r in ranks.collect()}
    assert rank_map["http://s.example/hub"] == max(rank_map.values())

    ranked = crawl("ranked", scores=scores)
    gens = {
        r["url"]: r["gen_fetched"] for r in ranked.crawled().collect()
    }
    fifo_gens = {
        r["url"]: r["gen_fetched"] for r in fifo.crawled().collect()
    }
    # FIFO fetches /hub last of the three peers; rank-fed crawl first
    assert fifo_gens["http://s.example/hub"] == 3
    assert gens["http://s.example/hub"] == 1
    # the seen set is priority-invariant
    assert set(gens) == set(fifo_gens)


@pytest.mark.parametrize(
    "seed,n_pages,n_hosts,k,robots_hosts",
    [
        (101, 35, 5, None, 0),
        (202, 40, 3, 1, 1),
        (303, 45, 6, 2, 2),
        (404, 30, 2, 3, 0),
        (505, 55, 7, None, 3),
    ],
)
def test_fuzz_engine_equals_simulator(
    spark, tmp_path, seed, n_pages, n_hosts, k, robots_hosts
):
    """Seed-sweep fuzz: full engine↔simulator equivalence (crawl order,
    seen set, extracted bytes, lineage, per-generation metrics) over
    RANDOM site graphs spanning host skew, politeness budgets and
    robots gating — widening the fixed-seed scenarios above."""
    from owlfrontier.urlutil import host_of

    rows, seeds = gen_site(
        n_pages=n_pages, n_hosts=n_hosts, seed=seed,
        robots_hosts=robots_hosts,
    )
    pages = pages_map(rows)
    rb_rows = [
        (host_of(r["url"]), r["html"].decode())
        for r in rows
        if r["url"].endswith("/robots.txt")
    ] or None
    golden = simulate_generations(
        pages, seeds, politeness_k=k,
        robots=disallow_map(rb_rows) if rb_rows else None,
        max_generations=200,
    )
    engine, summary = _run(
        spark, tmp_path, pages_df(spark, rows), seeds,
        politeness_k=k, robots_rows=rb_rows, max_generations=200,
        robots_enabled=rb_rows is not None,
    )
    _check_equivalence(engine, golden)
    assert summary["crawled"] == len(golden.url_seen)
