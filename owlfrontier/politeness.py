"""Per-host politeness budget as a window operator (SURVEY.md O4).

The reference throttles with a hard 5-second tick per fetcher process —
global, not per-host (``/root/reference/fetcher.go:97-99``, with a TODO
admitting the want of a distributed tick). The rebuild generalizes to a
per-host budget of ``k`` URLs per generation: ``row_number() OVER
(PARTITION BY host ORDER BY size(path), path) <= k``; rows over budget are
deferred to the next generation carrying their FIFO key, which preserves
reference crawl order (SURVEY.md §3.4).

Skew defense (north_rule): web frontiers are Zipf-skewed by host — one hot
host would serialize into a single window partition. ``budget_split`` uses
the standard two-phase top-k: a salted partial ``row_number`` per
``(host, salt)`` first discards all but ``salt_buckets * k`` rows per host
(correct because the global top-k is a subset of the union of per-salt
top-k), then the exact window runs on the survivors. With k small this
bounds the exact window's partition size to ``salt_buckets * k`` regardless
of how hot the host is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def fifo_order():
    """ORDER BY size(path), path — FIFO/BFS order (SURVEY.md §3.4).
    Built lazily: Column construction needs an active SparkContext."""
    return [F.size("path"), F.col("path")]


def budget_split(
    frontier: DataFrame,
    k: int | None,
    salt_buckets: int = 0,
    order: list | None = None,
    host_budgets: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """→ (selected, deferred). ``k=None`` selects everything. ``order``
    is the priority-queue policy (default FIFO): the budget picks each
    host's top-k BY THIS ORDER; everything else defers — which is exactly
    a per-host priority queue drained k-at-a-time per generation.

    ``host_budgets`` ((host, _k_host) with _k_host ≤ k, e.g. from robots
    Crawl-delay) shrinks individual hosts' budgets; it broadcast-joins
    onto the ranked rows, and because every per-host budget is ≤ k the
    salted pre-phase (which discards beyond k per (host, salt)) remains a
    correct superset."""
    if k is None:
        return frontier, frontier.limit(0)
    order = order if order is not None else fifo_order()

    df = frontier
    if salt_buckets and salt_buckets > 1:
        pre = Window.partitionBy(
            "host", F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
        ).orderBy(*order)
        df = (
            df.withColumn("_prn", F.row_number().over(pre))
            .where(F.col("_prn") <= k)
            .drop("_prn")
        )

    w = Window.partitionBy("host").orderBy(*order)
    ranked = frontier.withColumn("_rn", F.row_number().over(w)) if not (
        salt_buckets and salt_buckets > 1
    ) else df.withColumn("_rn", F.row_number().over(w))
    if host_budgets is not None:
        ranked = ranked.join(F.broadcast(host_budgets), "host", "left")
        k_eff = F.coalesce(F.col("_k_host"), F.lit(k))
    else:
        k_eff = F.lit(k)
    selected = ranked.where(F.col("_rn") <= k_eff).drop("_rn", "_k_host")

    if salt_buckets and salt_buckets > 1:
        # deferred = frontier minus selected (pre-filtered rows are deferred
        # too — they were over budget by construction)
        deferred = frontier.join(
            selected.select("url"), on="url", how="left_anti"
        )
    else:
        deferred = ranked.where(F.col("_rn") > k_eff).drop("_rn", "_k_host")
    return selected, deferred
