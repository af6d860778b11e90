"""Pure-Python reference simulators — the golden oracle for crawl equivalence.

Two independent models (SURVEY.md §5.2.3):

* :func:`simulate_fifo` — a direct transliteration of the reference's
  deployed regime: one FIFO queue, single worker, dequeue-time seen gate
  (``/root/reference/fetcher.go:94-104``), enqueue-time seen gate
  (``/root/reference/extractor.go:22-24,57-59`` via ``parse.go:110,117``),
  store-conflict gate subsumed. With one fetcher + one extractor (the
  production inventory, ``/root/reference/ansible/hosts/production:1-6``)
  and FIFO NATS subjects this is EXACT BFS — the only well-defined
  ordering-equivalence target (SURVEY.md §3.4).

* :func:`simulate_generations` — the generational model the Spark engine
  implements (SURVEY.md §2.4): per-generation snapshot dedup, optional
  per-host politeness budget ``k``, optional robots gating, deferral
  carry-over. With ``k=None`` (unbounded) it must reproduce
  ``simulate_fifo``'s order exactly — tested property.

Both consume the same ``pages`` mapping (url → html bytes/str) and use the
real extractor, so goldens embed the byte-identity contract.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from owlfrontier.extract import decode_html, extract_page, page_structure_json
from owlfrontier.robots import is_allowed
from owlfrontier.urlutil import host_of


def _extract(pages: dict, url: str) -> dict:
    html = pages[url]
    payload = decode_html(html) if isinstance(html, (bytes, bytearray)) else html
    return extract_page(payload, url)


@dataclass
class CrawlGolden:
    """Golden outputs per FIXTURES.md §2."""

    crawl_order: list[tuple[int, int, str]] = field(default_factory=list)
    # (seq, generation_fetched, url)
    url_seen: set[str] = field(default_factory=set)
    extracted: dict[str, str] = field(default_factory=dict)  # url -> text_json
    parents: dict[str, str | None] = field(default_factory=dict)  # lineage
    links: dict[str, tuple[list[str], list[str]]] = field(default_factory=dict)
    metrics: list[dict] = field(default_factory=list)


def simulate_fifo(pages: dict, seeds: list[str]) -> list[str]:
    """The reference's exact FIFO/BFS crawl order (successful fetches only;
    fetch failures log-and-drop, ``fetcher.go:51-54``)."""
    queue = deque(seeds)
    crawled: set[str] = set()
    order: list[str] = []
    while queue:
        url = queue.popleft()
        if url in crawled:  # dequeue gate, fetcher.go:96
            continue
        if url not in pages:  # fetch failure → drop, no store
            continue
        crawled.add(url)
        order.append(url)
        page = _extract(pages, url)
        for link in page["links_candidate"]:
            if link not in crawled:  # enqueue gate, extractor.go:22-24
                queue.append(link)
    return order


def simulate_generations(
    pages: dict,
    seeds: list[str],
    politeness_k: int | None = None,
    robots: dict[str, list[str]] | None = None,
    max_generations: int = 100,
) -> CrawlGolden:
    """The generational model (SURVEY.md §2.4) the Spark engine implements.

    Frontier rows carry a composite order key ``path`` (tuple of ints):
    seeds get ``(i,)``; link ``j`` of a page with path ``P`` gets ``P+(j,)``.
    FIFO order == sort by ``(len(path), path)`` (SURVEY.md §3.4, §4.3.3).
    """
    g = CrawlGolden()
    key = lambda item: (len(item[0]), item[0])  # noqa: E731
    # first-wins dedup of duplicate seed submissions (the reference's
    # dequeue gate would drop the second occurrence, fetcher.go:96)
    seen_seed: dict[str, tuple] = {}
    for i, u in enumerate(seeds):
        seen_seed.setdefault(u, (i,))
    # frontier rows: (path, url, discovered_from) — seeds have no parent
    frontier: list[tuple[tuple, str, str | None]] = sorted(
        ((p, u, None) for u, p in seen_seed.items()), key=key
    )
    crawled: dict[str, tuple] = {}
    seq = 0
    gen = 0
    while frontier and gen < max_generations:
        frontier_size = len(frontier)
        # 1. dedup vs crawled (snapshot at generation start)
        eligible = [(p, u, par) for p, u, par in frontier if u not in crawled]
        # 2. robots gate (north_rule addition; no-op when robots is None)
        robots_blocked = 0
        if robots is not None:
            kept = []
            for p, u, par in eligible:
                if is_allowed(u, robots.get(host_of(u), [])):
                    kept.append((p, u, par))
                else:
                    robots_blocked += 1
            eligible = kept
        # 3. politeness: first k per host in FIFO order
        selected: list[tuple] = []
        deferred: list[tuple] = []
        per_host: dict[str, int] = {}
        for p, u, par in sorted(eligible, key=key):
            h = host_of(u)
            c = per_host.get(h, 0)
            if politeness_k is None or c < politeness_k:
                selected.append((p, u, par))
                per_host[h] = c + 1
            else:
                deferred.append((p, u, par))
        # 4-6. fetch + extract + commit
        fetched = failed = parsed = 0
        candidates: list[tuple] = []
        for p, u, par in selected:
            if u not in pages:
                failed += 1  # fetcher.go:51-54 — dropped, NOT seen
                continue
            page = _extract(pages, u)
            fetched += 1
            if page["text"]:  # IsItParsed semantics, couchdb.go:283-288
                parsed += 1
            crawled[u] = p
            g.url_seen.add(u)
            g.crawl_order.append((seq, gen, u))
            g.parents[u] = par
            seq += 1
            g.extracted[u] = page_structure_json(page)
            g.links[u] = (page["links_all"], page["links_candidate"])
            # 7. expansion in document order
            for j, link in enumerate(page["links_candidate"]):
                candidates.append((p + (j,), link, u))
        # next frontier: deferred ∪ new, minus crawled, first-wins per url
        nxt: dict[str, tuple] = {}
        for p, u, par in sorted(deferred + candidates, key=key):
            if u in crawled or u in nxt:
                continue
            nxt[u] = (p, par)
        frontier = sorted(
            ((p, u, par) for u, (p, par) in nxt.items()), key=key
        )
        g.metrics.append(
            {
                "generation": gen,
                "frontier_size": frontier_size,
                "eligible": len(eligible) + robots_blocked,
                "robots_blocked": robots_blocked,
                "selected": len(selected),
                "deferred": len(deferred),
                "fetched": fetched,
                "failed": failed,
                "parsed": parsed,
                "next_frontier": len(frontier),
            }
        )
        gen += 1
    return g
