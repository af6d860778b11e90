#!/usr/bin/env python
"""Round-6 measurement sidecar (guide §1): time individual registry
queries in isolation with the noop sink and capture .explain("formatted")
per query. Does NOT replace bench.py (frozen driver contract) — numbers
from here are cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py [--sf-dir DIR] [--repeats N] [--plans-dir DIR]
                          [query ...]
With no query names, runs every registry entry.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans-dir", default=None,
                    help="write <query>.txt explain output here")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("owlfrontier-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from owlfrontier.queries import QUERIES

    names = args.queries or list(QUERIES)
    # warmup (same as bench.py)
    spark.read.parquet(f"{args.sf_dir}/documents.parquet").selectExpr(
        "count(*)", "max(length(text))").collect()
    spark.range(0, 1000, 1, 8).selectExpr("sum(id)").write.format(
        "noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        times = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(times), "samples": times}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "results": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
