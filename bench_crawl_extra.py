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
            r = bench.bench_crawl(spark, args.sf, policied=policied)
            print(json.dumps({"policied": policied, "run": i, **r}),
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
