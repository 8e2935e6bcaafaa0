"""Robots rules — the north rule's robots surface (no reference analog;
the reference never fetches robots.txt — crawling is future work,
``contxt/config.py:20``, ``TODO.md:7``).

Rules come from the corpus ``robots`` table (FIXTURES.md §3):
``host → (disallow_prefixes, crawl_delay_ms)``. A URL is disallowed if
its path starts with any prefix for its host; the crawl delay is the
per-host politeness budget.

Two deployment shapes:

* ``RobotsRules`` — a plain broadcastable object (``ray.put`` once,
  read inside every task). Right for the sandbox and for clusters where
  the rules table fits comfortably in memory.
* ``RobotsCacheActor`` — the scale path: rules sharded across named
  actors keyed by ``hash(host) % n``, queried in batches. At 10^7+
  hosts the broadcast object stops being cheap to ship; the actors
  hold the authoritative cache and answer membership/delay lookups.
"""

from __future__ import annotations

from urllib.parse import urlparse

import pyarrow.parquet as pq

from ..functions.urls import url_hash64


def parse_robots_txt(text: str, user_agent: str = "*") -> tuple[tuple[str, ...], Optional[int]]:
    """Parse a robots.txt body → (disallow_prefixes, crawl_delay_ms).

    Subset a polite crawler needs: ``User-agent`` group matching (the
    given agent or ``*``; most-specific group wins), ``Disallow`` path
    prefixes (empty Disallow = allow all), ``Crawl-delay`` seconds →
    ms. Comments (#) and unknown directives are ignored; a malformed
    file yields no restrictions (crawlers must not die on bad robots)."""
    groups: dict[str, dict] = {}
    current: list[str] = []
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            agent = value.lower()
            groups.setdefault(agent, {"disallow": [], "delay": None})
            current = [agent]
        elif key == "disallow" and current:
            if value:
                for a in current:
                    groups[a]["disallow"].append(value)
        elif key == "crawl-delay" and current:
            try:
                delay_ms = int(float(value) * 1000)
                for a in current:
                    groups[a]["delay"] = delay_ms
            except ValueError:
                pass
    ua = user_agent.lower()
    chosen = groups.get(ua) or groups.get("*")
    if not chosen:
        return (), None
    return tuple(chosen["disallow"]), chosen["delay"]


class RobotsRules:
    """In-memory robots rule set; pure lookups, safely broadcastable."""

    def __init__(self, disallow: dict[str, tuple[str, ...]], delays_ms: dict[str, int],
                 default_delay_ms: int = 100):
        self.disallow = disallow
        self.delays_ms = delays_ms
        self.default_delay_ms = default_delay_ms

    @classmethod
    def from_parquet(cls, path: str, default_delay_ms: int = 100) -> "RobotsRules":
        tbl = pq.read_table(path)
        disallow: dict[str, tuple[str, ...]] = {}
        delays: dict[str, int] = {}
        for host, prefixes, delay in zip(
            tbl["host"].to_pylist(),
            tbl["disallow_prefixes"].to_pylist(),
            tbl["crawl_delay_ms"].to_pylist(),
        ):
            if prefixes:
                disallow[host] = tuple(prefixes)
            delays[host] = int(delay)
        return cls(disallow, delays, default_delay_ms)

    @classmethod
    def empty(cls, default_delay_ms: int = 100) -> "RobotsRules":
        return cls({}, {}, default_delay_ms)

    @classmethod
    def from_robots_txt(cls, bodies: dict[str, str], default_delay_ms: int = 100,
                        user_agent: str = "*") -> "RobotsRules":
        """Build rules from fetched robots.txt bodies (host → text) —
        the live-crawl path feeding the same rule object the engine and
        the cache actors consume."""
        disallow: dict[str, tuple[str, ...]] = {}
        delays: dict[str, int] = {}
        for host, text in bodies.items():
            prefixes, delay = parse_robots_txt(text, user_agent)
            if prefixes:
                disallow[host] = prefixes
            if delay is not None:
                delays[host] = delay
        return cls(disallow, delays, default_delay_ms)

    def is_allowed(self, canonical_url: str) -> bool:
        host = urlparse(canonical_url).netloc
        prefixes = self.disallow.get(host)
        if not prefixes:
            return True
        path = urlparse(canonical_url).path or "/"
        return not any(path.startswith(p) for p in prefixes)

    def delay_ms(self, host: str) -> int:
        return self.delays_ms.get(host, self.default_delay_ms)


class RobotsCacheActor:
    """Scale path: one shard of the robots cache as a Ray actor.

    Instantiate ``n`` of these with ``ray.remote(RobotsCacheActor)``;
    route host lookups by ``url_hash64(host) % n``. Batched API so a
    map_batches task makes one call per batch, not per row."""

    def __init__(self, rules: RobotsRules, shard_id: int, n_shards: int):
        self.shard_id = shard_id
        self.n_shards = n_shards
        self.disallow = {
            h: p for h, p in rules.disallow.items()
            if url_hash64(h) % n_shards == shard_id
        }
        self.delays = {
            h: d for h, d in rules.delays_ms.items()
            if url_hash64(h) % n_shards == shard_id
        }
        self.default_delay_ms = rules.default_delay_ms

    def allowed_batch(self, urls: list[str]) -> list[bool]:
        out = []
        for u in urls:
            p = urlparse(u)
            prefixes = self.disallow.get(p.netloc)
            out.append(not prefixes or not any((p.path or "/").startswith(x) for x in prefixes))
        return out

    def delays_batch(self, hosts: list[str]) -> list[int]:
        return [self.delays.get(h, self.default_delay_ms) for h in hosts]
