#!/usr/bin/env python
"""spark-submit entrypoint for the crawl engine (north_rule deployment
surface: ``spark-submit --py-files owlfrontier.zip jobs/run_crawl.py ...``).

Builds no SparkSession config of its own beyond the app name — master,
executor counts and memory come from spark-submit, so the same job runs on
local[N] (sandbox) or a multi-executor cluster unchanged.

Usage:
  spark-submit --py-files owlfrontier.zip jobs/run_crawl.py \
      --pages /path/to/pages_parquet_or_table --store /path/to/store \
      --seeds /path/to/seeds.json [--resume] [--politeness-k 16]
      [--robots /path/to/robots_parquet] [--max-generations 100]
      [--bucketed] [--order-out /path/to/order]

Package with:  (cd <repo> && zip -qr owlfrontier.zip owlfrontier)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="pages parquet path, or table:NAME for a catalog table")
    ap.add_argument("--store", required=True,
                    help="snapshot-store root path, or iceberg:<namespace> "
                         "for the Iceberg backend (needs the runtime jar)")
    ap.add_argument("--seeds",
                    help="seed input: a parquet path/dir of (url, seq) — the "
                         "at-scale path, never driver memory — or a .json "
                         "file holding a list of URLs (small runs only)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--politeness-k", type=int, default=None)
    ap.add_argument("--priority", default="fifo",
                    help="budget order: fifo | dfs | score (needs "
                         "--scores) | a SQL expression over the frontier "
                         "columns (ascending)")
    ap.add_argument("--scores",
                    help="parquet of (url, score) for --priority score — "
                         "e.g. a pagerank output; highest drains first")
    ap.add_argument("--robots", help="parquet of (host, robots_txt)")
    ap.add_argument("--max-generations", type=int, default=100)
    ap.add_argument("--salt-buckets", type=int, default=8)
    ap.add_argument("--frontier-partitions", type=int, default=256)
    ap.add_argument("--use-bloom", default="auto",
                    help="auto | true | false | sharded (host-sharded "
                         "filter, the 10^10-key shape)")
    ap.add_argument("--bloom-shards", type=int, default=16)
    ap.add_argument("--bucketed", action="store_true",
                    help="pages store is hash-bucketed by url (Iceberg "
                         "bucket(N,url) / CLUSTERED BY): SMJ, frontier-only shuffle")
    ap.add_argument("--light-metrics", action="store_true")
    ap.add_argument("--partition-hist", action="store_true",
                    help="record the per-partition write-spread histogram "
                         "of each committed frontier (one extra job/gen)")
    ap.add_argument("--maintain-index", action="store_true",
                    help="append each generation's (word, url) postings "
                         "partition — the incrementally maintained word "
                         "index (query via CrawlEngine.word_index)")
    ap.add_argument("--compact-every-n", type=int, default=None,
                    help="auto-compact the crawled store whenever this many "
                         "committed generation dirs/partitions accumulate")
    ap.add_argument("--compact", action="store_true",
                    help="after the crawl, merge committed crawled "
                         "generations into one dir (snapshot store; "
                         "Iceberg uses rewrite_data_files)")
    ap.add_argument("--canonical-keys", action="store_true",
                    help="key the frontier/seen set on CANONICAL urls "
                         "(fragment/:80/www./utm_* normalization at the "
                         "frontier ingress); default off = reference "
                         "parity (parse.go:88-131 stores hrefs verbatim)")
    ap.add_argument("--order-out", help="write the exact crawl order here")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from owlfrontier.crawler import CrawlConfig, CrawlEngine

    spark = SparkSession.builder.appName("owlfrontier-crawl").getOrCreate()
    pages = (
        spark.table(args.pages[len("table:"):])
        if args.pages.startswith("table:")
        else spark.read.parquet(args.pages)
    )
    robots = spark.read.parquet(args.robots) if args.robots else None
    use_bloom = {"auto": "auto", "true": True, "false": False,
                 "sharded": "sharded"}[str(args.use_bloom).lower()]
    scores = spark.read.parquet(args.scores) if args.scores else None
    engine = CrawlEngine(
        spark, pages, args.store, robots_df=robots,
        priority_scores=scores,
        config=CrawlConfig(
            politeness_k=args.politeness_k,
            priority=args.priority,
            robots_enabled=robots is not None,
            max_generations=args.max_generations,
            salt_buckets=args.salt_buckets,
            frontier_partitions=args.frontier_partitions,
            use_bloom=use_bloom,
            bloom_shards=args.bloom_shards,
            light_metrics=args.light_metrics,
            partition_hist=args.partition_hist,
            maintain_index=args.maintain_index,
            compact_every_n=args.compact_every_n,
            fetch_join="bucketed" if args.bucketed else "auto",
            canonical_keys=args.canonical_keys,
        ),
    )
    if args.resume:
        if args.seeds:
            # live seeding (webapp /add-site analogue): inject into the
            # pending frontier, then continue the crawl
            if args.seeds.endswith(".json"):
                with open(args.seeds) as f:
                    engine.add_seeds(json.load(f))
            else:
                engine.add_seeds(spark.read.parquet(args.seeds))
        summary = engine.run(resume=True)
    else:
        if not args.seeds:
            ap.error("--seeds required unless --resume")
        if args.seeds.endswith(".json"):
            with open(args.seeds) as f:
                seeds = json.load(f)
        else:
            # parquet (url, seq): gen-0 is built distributed, no driver list
            seeds = spark.read.parquet(args.seeds)
        summary = engine.run(seeds=seeds)
    if args.order_out:
        engine.crawl_order().write.mode("overwrite").parquet(args.order_out)
    if args.compact and hasattr(engine.store, "compact"):
        summary["compact"] = engine.store.compact()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
