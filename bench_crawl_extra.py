#!/usr/bin/env python
"""Round-6 crawl-loop measurement sidecar: runs bench.py's own
``bench_crawl`` (unchanged, imported — bench.py stays frozen) in
isolation so the crawl loops can be profiled without the 60-query
suite around them. Prints per-run timings and the engine's
per-generation metric dicts (timings per phase)."""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--policied", action="store_true")
    ap.add_argument("--both", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import bench

    spark = bench._mk_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py main()
    spark.range(0, 1000, 1, 8).selectExpr("sum(id)").write.format(
        "noop").mode("overwrite").save()

    modes = [False, True] if args.both else [args.policied]
    for policied in modes:
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(
                f"crawl policied={policied} run={i}")
            r = _bench_crawl_with_metrics(spark, args.sf, policied=policied)
            print(json.dumps({"policied": policied, "run": i, **r}),
                  flush=True)
    spark.stop()


def _bench_crawl_with_metrics(spark, sf, policied):
    """bench.bench_crawl's exact setup (same spec/config), but keeps the
    engine handle so per-generation metric dicts (phase timings) can be
    printed before the store is dropped."""
    import shutil
    import tempfile
    import time

    import bench
    from pyspark.sql import functions as F

    from owlfrontier.crawler import CrawlConfig, CrawlEngine

    path = bench.ensure_bench_pages(spark, sf)
    seeds = spark.read.parquet(path + ".seeds")
    pages = spark.read.parquet(path)
    store = tempfile.mkdtemp(prefix="owlfrontier-bench-store-")
    scores = None
    kwargs = dict(politeness_k=None, priority="fifo")
    if policied:
        scores = pages.select(
            "url",
            (F.pmod(F.xxhash64("url"), F.lit(1000)).cast("double")
             ).alias("score"),
        )
        kwargs = dict(politeness_k=64, priority="score")
    engine = CrawlEngine(
        spark, pages, store, priority_scores=scores,
        config=CrawlConfig(
            max_generations=6, salt_buckets=8, frontier_partitions=32,
            use_bloom="auto", light_metrics=True,
            broadcast_frontier_rows=100_000, **kwargs,
        ),
    )
    t0 = time.time()
    summary = engine.run(seeds=seeds)
    secs = time.time() - t0
    gens = [
        {k: m.get(k) for k in
         ("generation", "wall_sec", "timings", "fetched", "next_frontier")}
        for m in engine.metrics()
    ]
    shutil.rmtree(store, ignore_errors=True)
    return {
        "crawl_sec": round(secs, 3),
        "crawled": summary["crawled"],
        "generations": summary["generations"],
        "gen_metrics": gens,
    }


if __name__ == "__main__":
    main()
