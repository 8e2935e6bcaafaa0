"""Crawl configuration.

The reference's crawl capability exists only as config stubs
(``contxt/config.py:20-21`` ``max_depth``/``ignore_patterns``,
``TODO.md:7`` sitemap+depth). This dataclass is the real version:
the shared parameter set consumed by both the sequential model
(``model.py`` — the executable spec) and the Ray frontier engine
(``frontier.py``)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CrawlConfig:
    max_depth: int = 2  # config.py:20 default ("max_depth: 1  # For future website crawling")
    ignore_patterns: tuple[str, ...] = ("/tags/", "/categories/")  # config.py:21
    default_crawl_delay_ms: int = 100
    max_pages: int | None = None  # global cap on fetched pages (by crawl order)
    seen_shards: int = 8
    respect_robots: bool = True
    # fetch strategy: "broadcast" (admitted set into the object store
    # once, vectorized lookup per corpus batch), "bucketed"
    # (partitioned hash join, the 10^10-frontier path; frontier.py
    # docstring), or "live" (NO corpus join — the admitted frontier
    # feeds an actor-pool fetcher directly; run_crawl's fetcher_cls /
    # rate_limiter choose the fetcher and bind per-host politeness)
    # "indexed" (sparse point-lookup: hash-sorted corpus layout +
    # row-group range index, sources/hashindex.py — reads only the
    # row groups containing admitted urls; right for rounds that are
    # small relative to the corpus)
    fetch_join: str = "broadcast"
    # indexed mode: where the hash-sorted layout lives (default: a
    # pages_hidx sibling of the pages dir; built once, stamp-cached)
    index_dir: str | None = None
    # live mode: actor pool width and rows per fetch call
    fetch_concurrency: int = 4
    fetch_batch_size: int = 64
    # live mode + rate_limiter: use the NON-BLOCKING defer/requeue loop
    # (stages/fetch.py:fetch_with_requeue) — throttled rows come back
    # as status='deferred' and re-enter the next admission round, so
    # one slow host never idles a pool actor or stalls co-resident
    # hosts (the blocking wave loop it replaces slept the whole actor).
    # Ignored without a rate_limiter (nothing to defer on).
    live_requeue: bool = False
    # politeness ranking: "fused" (vt inside the admission bucket task —
    # one host's candidates fit one task) or "ranked" (range-partitioned
    # two-pass rank; hosts may span blocks — the giant-host path)
    politeness_mode: str = "fused"
    # URL pre-fetch quality gate (ops/urlgate.py — RefinedWeb §3.1):
    # kwargs for url_gate_frame (blocked_hosts / banned_tokens /
    # max_len / max_depth / max_digit_pct), applied to every CANDIDATE
    # url before admission — i.e. before the seen set, the politeness
    # scan, and the fetch, where a dropped url is cheapest. None = off
    # (the default keeps the sequential-model parity contract).
    url_gate: dict | None = None
