"""Sequential crawl reference model — the EXECUTABLE SPEC.

The reference repo never implemented crawling (sitemap/depth are TODO
stubs: ``contxt/config.py:20-21``, ``TODO.md:1,7``), so this ~150-line
pure-Python simulator is the authoritative definition of "the same
crawl ordering and URL-seen set" that the north rule requires. The Ray
frontier engine (``frontier.py``) must reproduce its output EXACTLY at
any parallelism level (SURVEY.md §4.2, §5.3); tests enforce this.

## Crawl semantics (the contract)

State: ``seen`` (set of canonical URLs), per-host fetch counters.

A *candidate* is ``(depth, canon, host, priority, pvt, pli)``:
``priority`` is inherited from the seed row (default 0), ``pvt`` is the
parent's virtual fetch time (seeds: ``-1.0``), ``pli`` the link index
within the parent (seeds: ``seed_index``).

Round 0 — seeds in ``seed_index`` order: drop invalid URLs
(``utils.py:7-13`` predicate), canonicalize, drop ignore-pattern
matches (``config.py:21``), drop robots-disallowed, drop already-seen
(duplicates); survivors enter ``seen`` and the round-0 frontier.

Each round:
1. **Politeness / virtual time.** Per host, order that host's
   candidates by ``(priority, pvt, pli, canon)``; the k-th gets
   ``vt = (fetched_before[host] + k) * delay_ms(host)``. Virtual time
   is a pure function of crawl history — never wall-clock — which is
   what makes the ordering independent of physical parallelism
   (SURVEY.md §7 "hard parts" #2).
2. **Crawl order.** Sort the round globally by
   ``(vt, priority, pvt, pli, canon)``. This sequence, concatenated
   over rounds, is THE crawl ordering. ``max_pages`` truncates it
   globally (candidates past the cap are not fetched and not expanded,
   but remain in ``seen``).
3. **Fetch.** A candidate whose canonical URL exists in the corpus
   yields its html (status ``fetched``); otherwise status ``miss``
   (off-corpus link) with no expansion.
4. **Expansion** (only when ``depth < max_depth``): for each fetched
   page in crawl order, for each out-link in document order
   (``extract_links`` — the kernel's ``<a href>`` pass): canonicalize;
   drop invalid / ignore-pattern / robots-disallowed / seen. First
   discovery wins: the new URL enters ``seen`` immediately and becomes
   a next-round candidate with ``pvt = parent vt``, ``pli = link
   index``. (In the distributed engine the same winner is selected by
   ``min (pvt, pli)`` per canon — identical by construction.)

The model returns the crawl order (with per-row metadata) and the seen
set; both are the parity oracles.
"""

from __future__ import annotations

from typing import Optional

import pyarrow.parquet as pq

from ..functions.urls import (
    canonicalize_url,
    extract_host,
    is_valid_url,
    matches_ignore_patterns,
)
from ..kernel.extract import extract_links
from ..dom import parse as dom_parse
from .config import CrawlConfig
from .robots import RobotsRules


def load_corpus_map(pages_path: str) -> dict[str, bytes]:
    """url → html for the sequential model (small-scale spec only; the
    Ray engine never materializes this map)."""
    tbl = pq.read_table(pages_path, columns=["url", "html"])
    return dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))


def load_seeds(seeds_path: str) -> list[tuple[int, str, int]]:
    tbl = pq.read_table(seeds_path)
    pri = (
        tbl["priority"].to_pylist()
        if "priority" in tbl.schema.names
        else [0] * tbl.num_rows
    )
    return list(zip(tbl["seed_index"].to_pylist(), tbl["url"].to_pylist(), pri))


def sequential_crawl(
    pages_path: str,
    seeds_path: str,
    robots: Optional[RobotsRules] = None,
    config: CrawlConfig = CrawlConfig(),
) -> tuple[list[dict], set[str]]:
    """Run the spec. Returns ``(crawl_order_rows, seen_set)`` where each
    row is ``{rank, round, depth, url, host, vt, priority, status}``."""
    corpus = load_corpus_map(pages_path)
    robots = robots if robots is not None else RobotsRules.empty(config.default_crawl_delay_ms)

    seen: set[str] = set()
    fetched_count: dict[str, int] = {}
    order_rows: list[dict] = []
    rank = 0
    pages_budget = config.max_pages

    def admissible(canon: str) -> bool:
        if matches_ignore_patterns(canon, config.ignore_patterns):
            return False
        if config.respect_robots and not robots.is_allowed(canon):
            return False
        return True

    # Round 0: seeds
    frontier: list[tuple[str, str, int, float, int]] = []  # (canon, host, priority, pvt, pli)
    for seed_index, url, priority in sorted(load_seeds(seeds_path)):
        if not is_valid_url(url):
            continue
        canon = canonicalize_url(url)
        if not admissible(canon) or canon in seen:
            continue
        seen.add(canon)
        frontier.append((canon, extract_host(canon), int(priority), -1.0, seed_index))

    for depth in range(config.max_depth + 1):
        if not frontier or (pages_budget is not None and pages_budget <= 0):
            break

        # 1. virtual-time assignment per host
        by_host: dict[str, list[tuple[str, str, int, float, int]]] = {}
        for cand in frontier:
            by_host.setdefault(cand[1], []).append(cand)
        admitted: list[tuple[float, int, float, int, str, str]] = []
        for host, cands in by_host.items():
            cands.sort(key=lambda c: (c[2], c[3], c[4], c[0]))  # (priority, pvt, pli, canon)
            base = fetched_count.get(host, 0)
            delay = robots.delay_ms(host)
            for k, (canon, h, priority, pvt, pli) in enumerate(cands):
                vt = float((base + k) * delay)
                admitted.append((vt, priority, pvt, pli, canon, h))

        # 2. global round order
        admitted.sort()
        if pages_budget is not None:
            admitted = admitted[:pages_budget]
            pages_budget -= len(admitted)

        # 3+4. fetch in order; expand
        next_frontier: list[tuple[str, str, int, float, int]] = []
        for vt, priority, pvt, pli, canon, host in admitted:
            html = corpus.get(canon)
            status = "fetched" if html is not None else "miss"
            order_rows.append(
                {
                    "rank": rank,
                    "round": depth,
                    "depth": depth,
                    "url": canon,
                    "host": host,
                    "vt": vt,
                    "priority": priority,
                    "status": status,
                }
            )
            rank += 1
            fetched_count[host] = fetched_count.get(host, 0) + 1
            if html is None or depth >= config.max_depth:
                continue
            try:
                links = extract_links(dom_parse(bytes(html).decode("utf-8", "replace")), canon)
            except Exception:
                # mirror the engine's per-row containment
                # (stages/extract_stage.py:extract_batch): a page whose
                # kernel raises contributes zero out-links, so
                # engine == model holds on adversarial corpora too
                links = []
            for li, link in enumerate(links):
                if not is_valid_url(link):
                    continue
                lc = canonicalize_url(link)
                if not admissible(lc) or lc in seen:
                    continue
                seen.add(lc)
                next_frontier.append((lc, extract_host(lc), priority, vt, li))

        frontier = next_frontier

    return order_rows, seen
