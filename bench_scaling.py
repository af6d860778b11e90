#!/usr/bin/env python
"""Scaling-efficiency evidence for the north_rule criterion (≥0.8 throughput
scaling efficiency N → 4N executors), per the sandbox protocol in
BASELINE.md: the identical crawl job on the identical synthetic input at
``local[8]`` and ``local[32]``; efficiency = (URLs/s @32) / (URLs/s @8) / 4.

Each parallelism level runs in its own OS process (one JVM per master
setting). Results are appended to BENCH/BASELINE.md.

Usage: python bench_scaling.py [n_pages] — default sized so the run is
compute-bound (extraction + shuffles dominate fixed job overhead).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys
import tempfile

CHILD = """
import json, sys, tempfile, time
cpus = int(sys.argv[1]); pages_path = sys.argv[2]; seeds_path = sys.argv[3]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"owlfrontier-scaling-{cpus}")
    .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", f"{max(12, int(cpus * 1.5))}g")  # constant per-core memory: a 4N cluster has 4x the RAM
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# mount the hash-bucketed pages store (the Iceberg bucket(N,url) analog):
# per-generation fetch joins then shuffle ONLY the frontier side
spark.sql(f\"\"\"
CREATE TABLE pages_bucketed (url string, warc_ts timestamp, html binary,
                             text string, lang string)
USING PARQUET CLUSTERED BY (url) SORTED BY (url) INTO 64 BUCKETS
LOCATION '{pages_path}'
\"\"\")
from owlfrontier.crawler import CrawlConfig, CrawlEngine
pages = spark.table("pages_bucketed")
seeds = spark.read.parquet(seeds_path)  # (url, seq): gen-0 built distributed
store = tempfile.mkdtemp(prefix=f"owlfrontier-scale-{cpus}-")
engine = CrawlEngine(spark, pages, store,
    config=CrawlConfig(politeness_k=None, max_generations=6,
                       salt_buckets=8, frontier_partitions=max(cpus * 2, 16),
                       use_bloom="auto", light_metrics=True,
                       broadcast_frontier_rows=100_000, fetch_join="bucketed"))
t0 = time.time()
summary = engine.run(seeds=seeds)
secs = time.time() - t0
print(json.dumps({"cpus": cpus, "sec": secs, "crawled": summary["crawled"],
                  "generations": summary["generations"],
                  "urls_per_sec": summary["crawled"] / secs}))
spark.stop()
"""


def prepare_input(n_pages: int) -> tuple[str, str]:
    from pyspark.sql import SparkSession

    from owlfrontier.synthweb import synth_pages, synth_seeds_df

    path = f"/tmp/owlfrontier-scaling-bucketed-{n_pages}"
    seeds_path = path + ".seeds"
    if not os.path.exists(os.path.join(seeds_path, "_SUCCESS")):
        spark = (
            SparkSession.builder.master("local[16]")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        (synth_pages(
            spark, n_pages, n_hosts=500, hot_pct=30, fanout=8, paragraphs=120,
            partitions=64,
        ).write.mode("overwrite").format("parquet")
         .bucketBy(64, "url").sortBy("url")
         .option("path", path).saveAsTable("pages_gen"))
        # Common-Crawl regime: the frontier is LARGE from generation 0
        # (north_rule: 10^10-URL frontier) — seed with a large slice of the
        # corpus so the measured work is steady-state crawling, not BFS
        # ramp-up; the seed table is parquet, never a driver-side list
        synth_seeds_df(spark, 200_000).write.mode("overwrite").parquet(
            seeds_path
        )
        spark.stop()
    return path, seeds_path


def run_level(cpus: int, pages_path: str, seeds_path: str) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), pages_path, seeds_path],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(__file__),
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    pages_path, seeds_path = prepare_input(n_pages)
    r_n = run_level(n, pages_path, seeds_path)
    r_4n = run_level(4 * n, pages_path, seeds_path)
    eff = (r_4n["urls_per_sec"] / r_n["urls_per_sec"]) / 4.0
    result = {
        "protocol": f"identical crawl job + input at local[{n}] vs local[{4*n}]",
        "n_pages": n_pages,
        f"local{n}": r_n,
        f"local{4*n}": r_4n,
        "scaling_efficiency": round(eff, 3),
        "criterion": ">= 0.8",
        "pass": eff >= 0.8,
        "timestamp": dt.datetime.utcnow().isoformat() + "Z",
    }
    print(json.dumps(result, indent=2))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_results.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
