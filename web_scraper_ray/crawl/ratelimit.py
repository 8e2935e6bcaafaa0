"""Live-mode per-host politeness: sharded token-bucket actors.

The frontier engine's *offline* politeness is virtual time — a pure
function of crawl history that makes ordering deterministic
(frontier.py). A LIVE fetcher additionally needs real-time rate
limiting: this module is that complement — the north star's "per-host
politeness priority queue held in stateful actor pools" in its runtime
form.

Design:
* hosts shard to ``url_hash64(host) % n_shards`` actors; each actor
  holds one token bucket per host (capacity = burst, refill =
  1000/crawl_delay_ms tokens/sec from the robots rules).
* ``acquire_batch(hosts) -> list[wait_s]``: for each row, 0.0 when a
  token was available, else the time until its token accrues (the
  caller re-queues those rows — admission stays non-blocking, the
  priority queue shape: ready rows proceed, throttled rows carry their
  earliest-ready time).
* the clock is injectable (deterministic tests; production uses
  ``time.monotonic``).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

from ..functions.urls import url_hash64
from .robots import RobotsRules


class HostTokenBuckets:
    """One shard of per-host token buckets (run via ``ray.remote``)."""

    def __init__(self, rules: RobotsRules, shard_id: int, n_shards: int,
                 burst: int = 1, clock: Optional[Callable[[], float]] = None):
        self.rules = rules
        self.shard_id = shard_id
        self.n_shards = n_shards
        self.burst = max(1, burst)
        self.clock = clock or time.monotonic
        # host -> (tokens, last_refill_ts)
        self.state: dict[str, tuple[float, float]] = {}

    def _rate(self, host: str) -> float:
        delay_ms = self.rules.delay_ms(host)
        return 1000.0 / delay_ms if delay_ms > 0 else float("inf")

    #: grant tolerance: refilling for exactly (1-tokens)/rate seconds
    #: can land at 0.999… < 1.0 in float64; without the epsilon a
    #: caller that sleeps exactly the returned wait livelocks on
    #: epsilon-sized waits whose clock advance rounds away entirely
    _EPS = 1e-9

    def acquire_batch(self, hosts: list[str]) -> list[float]:
        """0.0 = token granted; >0 = seconds until this host's next
        token (row should be re-queued, not blocked on)."""
        now = self.clock()
        out = []
        for host in hosts:
            rate = self._rate(host)
            if rate == float("inf"):
                out.append(0.0)
                continue
            tokens, last = self.state.get(host, (float(self.burst), now))
            tokens = min(self.burst, tokens + (now - last) * rate)
            if tokens >= 1.0 - self._EPS:
                self.state[host] = (max(tokens - 1.0, 0.0), now)
                out.append(0.0)
            else:
                self.state[host] = (tokens, now)
                out.append((1.0 - tokens) / rate)
        return out

    def snapshot(self) -> dict:
        return dict(self.state)


class VirtualClock:
    """Deterministic shared clock (run via ``ray.remote``): the bucket
    shards read it through :func:`clock_fns`' ``now``, a throttled
    fetcher's ``sleep`` advances it — so politeness tests replay
    real-time behavior exactly, with zero wall-clock waiting."""

    def __init__(self):
        self.t = 0.0

    def now(self) -> float:
        return self.t

    def advance(self, dt: float) -> float:
        self.t += dt
        return self.t


def clock_fns(handle) -> tuple[Callable[[], float], Callable[[float], None]]:
    """(now, sleep) callables bound to a ``VirtualClock`` actor handle
    — passable as ``RateLimiter(clock=now)`` / ``ThrottledFetcher``'s
    ``sleep`` from any process (the handle serializes)."""
    import ray

    def now() -> float:
        return ray.get(handle.now.remote())

    def sleep(dt: float) -> None:
        ray.get(handle.advance.remote(dt))

    return now, sleep


class RateLimiter:
    """Driver/stage-side handle over the bucket shards. Batched and
    order-preserving, same call shape as SeenSet."""

    def __init__(self, rules: RobotsRules, n_shards: int = 4, burst: int = 1,
                 clock=None):
        import ray

        self.n_shards = n_shards
        cls = ray.remote(HostTokenBuckets)
        self.shards = [
            cls.options(num_cpus=0).remote(rules, i, n_shards, burst, clock)
            for i in range(n_shards)
        ]

    def acquire(self, hosts: list[str]) -> list[float]:
        import ray

        routed: dict[int, list[str]] = {}
        for h in hosts:
            routed.setdefault(url_hash64(h) % self.n_shards, []).append(h)
        futures = {sid: self.shards[sid].acquire_batch.remote(hs)
                   for sid, hs in routed.items()}
        results = {sid: ray.get(f) for sid, f in futures.items()}
        cursors = {sid: 0 for sid in routed}
        out = []
        for h in hosts:
            sid = url_hash64(h) % self.n_shards
            out.append(results[sid][cursors[sid]])
            cursors[sid] += 1
        return out


def throttled_fetch_plan(urls: list[str], limiter: RateLimiter) -> tuple[list[str], list[tuple[str, float]]]:
    """Split a candidate url batch into (ready_now, [(url, wait_s), ...])
    — the admission step a live fetch loop runs per wave: ready rows go
    to the fetch actor pool, throttled rows re-enter the queue with
    their earliest-ready time as the priority key."""
    from ..functions.urls import extract_host

    hosts = [extract_host(u) for u in urls]
    waits = limiter.acquire(hosts)
    ready = [u for u, w in zip(urls, waits) if w == 0.0]
    deferred = [(u, w) for u, w in zip(urls, waits) if w > 0.0]
    return ready, deferred
