"""Continuous crawl: the reference's submit-while-crawling loop as a
batch daemon.

The reference accepts new sites over HTTP while fetchers run
(``/root/reference/webapp/main.go:157-196`` publishes to the live NATS
subject). The rebuild keeps the crawl loop batch-generational (SURVEY.md
§7 — the barrier and replayable ordering are batch-shaped) and closes the
live-submission loop here instead: each tick drains the Structured
Streaming seed inbox, injects the seeds table into the pending frontier
(``CrawlEngine.add_seeds`` — idempotent: already-crawled and
already-pending submissions drop out), and resumes the crawl to frontier
exhaustion. A finished crawl wakes back up when new seeds arrive; the
daemon parks after ``idle_stop`` consecutive no-work ticks.
"""

from __future__ import annotations

import os


def crawl_follow(engine, ingest, max_ticks: int = 100,
                 idle_stop: int = 2) -> list[dict]:
    """Run drain→inject→crawl ticks until ``idle_stop`` consecutive ticks
    find no pending work (or ``max_ticks``). Returns per-tick summaries.

    Restartable: state lives entirely in the streaming checkpoint (what
    the inbox already delivered) and the store manifest (what the crawl
    already did) — killing and re-invoking the daemon continues where it
    stopped, the same two-process resume contract as the engine."""
    ticks: list[dict] = []
    idle = 0
    for t in range(max_ticks):
        ingest.drain()
        summary = None
        if engine.store.read_manifest() is None:
            # bootstrap: first committed crawl comes straight from the
            # ingested seeds table (distributed (url, seq) — no driver list)
            if os.path.isdir(ingest.table):
                summary = engine.run(seeds=ingest.seed_frontier())
            pending = 0
        else:
            pending = (
                engine.add_seeds(ingest.seed_frontier())
                if os.path.isdir(ingest.table)
                else 0
            )
            if pending:
                summary = engine.run(resume=True)
        worked = bool(summary and summary.get("crawled"))
        idle = 0 if (worked or pending) else idle + 1
        ticks.append({"tick": t, "pending": pending, "run": summary})
        if idle >= idle_stop:
            break
    return ticks
