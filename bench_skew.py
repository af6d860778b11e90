#!/usr/bin/env python
"""Skew-tail evidence for the politeness budget at scale (round-4 verdict
item 7): on a Zipf-skewed 1.2M-URL frontier (one hot host owning ~30% of
URLs — the synthweb fixture), measure how the budget window's work
distributes across shuffle partitions WITH and WITHOUT the salted
two-phase top-k.

Two measurements per variant:

* rows-per-shuffle-partition of the window's full-data exchange,
  computed EXACTLY by replicating Spark's hash partitioning
  (pmod(hash(keys), P) — the same Murmur3 `hash` the exchange uses), so
  the distribution is deterministic and independent of timing noise.
  Unsalted partitions by host alone: the hot host's ~360k rows land in
  ONE partition. Salted partitions the pre-phase by (host, salt).
* wall time of the actual budget_split at that setting (selected rows
  forced end to end with a noop write).

Also reports the largest single ORDER BY group a window task must sort:
unsalted = the whole hot host; salted = hot_rows / salt_buckets in the
pre-phase and <= salt_buckets * k in the exact phase.

Writes one JSON line to BENCH/skew_politeness.json.
"""

from __future__ import annotations

import json
import os
import time

N_PAGES = 1_200_000
K = 64
SALT_BUCKETS = 8
SHUFFLE_PARTITIONS = 64


def pct(sorted_vals, q):
    i = min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))
    return sorted_vals[i]


def partition_spread(df, keys, n_parts):
    """Exact rows-per-partition of an Exchange hashpartitioning(keys):
    Spark assigns partition = pmod(hash(cols), n). One groupBy — no
    timing, no sampling."""
    from pyspark.sql import functions as F

    rows = (
        df.groupBy(F.pmod(F.hash(*keys), F.lit(n_parts)).alias("pid"))
        .count().collect()
    )
    counts = sorted(int(r["count"]) for r in rows)
    # partitions that receive no rows still exist; count them as 0
    counts = [0] * (n_parts - len(counts)) + counts
    nonzero = [c for c in counts if c > 0]
    med = pct(nonzero, 0.5)
    return {
        "partitions": n_parts,
        "nonempty": len(nonzero),
        "median_rows": med,
        "p99_rows": pct(counts, 0.99),
        "max_rows": counts[-1],
        "p99_over_median": round(pct(counts, 0.99) / med, 2) if med else None,
        "max_over_median": round(counts[-1] / med, 2) if med else None,
    }


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from owlfrontier.politeness import budget_split

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("owlfrontier-skew")
        .config("spark.sql.shuffle.partitions", str(SHUFFLE_PARTITIONS))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # the scaling bench's 1.2M Zipf input (reused if present)
    import bench_scaling

    pages_path, _seeds = bench_scaling.prepare_input(N_PAGES)
    frontier = (
        spark.read.parquet(pages_path)
        .select(
            "url",
            F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host"),
            F.array(F.xxhash64("url")).alias("path"),
            F.lit(None).cast("string").alias("discovered_from"),
        )
        .localCheckpoint(eager=True)  # measure the window, not the scan
    )
    n = frontier.count()
    hot = (
        frontier.groupBy("host").count()
        .orderBy(F.desc("count")).first()
    )

    spreads = {
        "unsalted_window_exchange": partition_spread(
            frontier, [F.col("host")], SHUFFLE_PARTITIONS
        ),
    }
    for buckets in (8, 32):
        salt = F.pmod(F.xxhash64("url"), F.lit(buckets))
        spreads[f"salted{buckets}_prephase_exchange"] = partition_spread(
            frontier, [F.col("host"), salt], SHUFFLE_PARTITIONS
        )

    walls = {}
    for label, buckets in (("salted8", 8), ("salted32", 32),
                           ("unsalted", 0)):
        for _ in range(2):  # min-of-2
            t0 = time.time()
            sel, _def = budget_split(frontier, K, buckets)
            sel.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            walls[label] = min(walls.get(label, dt), dt)

    result = {
        "n_rows": n,
        "k": K,
        "shuffle_partitions": SHUFFLE_PARTITIONS,
        "hot_host": {"host": hot["host"], "rows": hot["count"],
                     "frac": round(hot["count"] / n, 3)},
        "largest_window_group": {
            "unsalted": hot["count"],
            "salted8_prephase": -(-hot["count"] // 8),
            "salted32_prephase": -(-hot["count"] // 32),
            "salted8_exact_phase_bound": 8 * K,
            "salted32_exact_phase_bound": 32 * K,
        },
        "partition_rows": spreads,
        "wall_sec_min_of_2": {k: round(v, 2) for k, v in walls.items()},
    }
    print(json.dumps(result, indent=2))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/skew_politeness.json", "w") as f:
        f.write(json.dumps(result) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
