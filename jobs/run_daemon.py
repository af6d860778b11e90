#!/usr/bin/env python
"""spark-submit entrypoint for the continuous crawl daemon: drain the
streaming seed inbox → inject → crawl, repeatedly (owlfrontier.daemon).

Usage:
  spark-submit --py-files owlfrontier.zip jobs/run_daemon.py \
      --pages /path/to/pages_parquet --store /path/to/store \
      --ingest-root /path/to/ingest [--max-ticks 100] [--idle-stop 2]
      [--politeness-k 16] [--bucketed]

Drop seed-submission files (one ``{"url":…,"submitted_at":…}`` JSON per
line) into ``<ingest-root>/inbox`` while it runs; a parked daemon
re-invoked later continues from the streaming checkpoint + store
manifest.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--ingest-root", required=True)
    ap.add_argument("--max-ticks", type=int, default=100)
    ap.add_argument("--idle-stop", type=int, default=2)
    ap.add_argument("--politeness-k", type=int, default=None)
    ap.add_argument("--max-generations", type=int, default=100)
    ap.add_argument("--bucketed", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from owlfrontier.crawler import CrawlConfig, CrawlEngine
    from owlfrontier.daemon import crawl_follow
    from owlfrontier.streaming import SeedIngest

    spark = SparkSession.builder.appName("owlfrontier-daemon").getOrCreate()
    pages = (
        spark.table(args.pages[len("table:"):])
        if args.pages.startswith("table:")
        else spark.read.parquet(args.pages)
    )
    engine = CrawlEngine(
        spark, pages, args.store,
        config=CrawlConfig(
            politeness_k=args.politeness_k,
            max_generations=args.max_generations,
            fetch_join="bucketed" if args.bucketed else "auto",
        ),
    )
    ingest = SeedIngest(spark, args.ingest_root)
    ticks = crawl_follow(
        engine, ingest, max_ticks=args.max_ticks, idle_stop=args.idle_stop
    )
    print(json.dumps({"ticks": len(ticks), "last": ticks[-1] if ticks else None}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
