"""Fetch stages — the live analogs of the reference's fetch modes
(SURVEY.md §2.1 S2-S4).

The reference's shared fetch core is missing from the snapshot
(``_scrape`` — SURVEY.md §0 fact 1); its mode wrappers survive
(``contxt/scraper.py:96-124``: basic=requests, advanced/super=selenium
with 5s/15s waits). Here each mode is an actor-pool ``map_batches``
class: the session/browser is constructed ONCE per actor (the reference
creates and destroys a WebDriver per URL and documents the cost,
``scraper.py:126-132`` — the actor pool is precisely the fix), work
happens per batch, failures become an ``error`` column instead of
exceptions (a thrown exception would poison the whole batch,
SURVEY.md §4.1 retries row).

No network exists in this environment: ``requests`` / ``selenium`` are
imported lazily; without them the actor falls back to the deterministic
``CorpusFetcher`` behavior or raises at construction in strict mode.
``CorpusFetcher`` — fetch-join against a Parquet pages corpus — is the
offline stand-in used by the frontier engine and tests.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

FETCH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.string()),  # fetched | miss | error
        ("html", pa.large_binary()),
        ("error", pa.string()),
    ]
)


class CorpusFetcher:
    """Offline fetcher: one actor holds a url→html map for its corpus
    shard (loaded once in ``__init__``). Used directly in tests; the
    frontier engine uses the scan-side join instead (frontier.py) so the
    full corpus is never resident."""

    def __init__(self, pages_path: str):
        import pyarrow.parquet as pq

        tbl = pq.read_table(pages_path, columns=["url", "html"])
        self.corpus = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        status, htmls, errors = [], [], []
        for u in urls:
            html = self.corpus.get(u)
            if html is None:
                status.append("miss")
                htmls.append(b"")
                errors.append("")
            else:
                status.append("fetched")
                htmls.append(bytes(html))
                errors.append("")
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "status": pa.array(status, pa.string()),
                "html": pa.array(htmls, pa.large_binary()),
                "error": pa.array(errors, pa.string()),
            },
            schema=FETCH_SCHEMA,
        )


class HttpFetcher:
    """Live basic-mode fetcher (S2 — requests). One ``requests.Session``
    per actor with the politeness headers; per-URL errors land in the
    ``error`` column. Construction fails fast when requests is absent
    unless a fallback corpus is given."""

    def __init__(self, timeout_s: float = 10.0, user_agent: str = "web-scraper-ray/0.1",
                 fallback_corpus: Optional[str] = None):
        self.timeout_s = timeout_s
        self.session = None
        self.fallback = None
        try:
            import requests  # type: ignore

            self.session = requests.Session()
            self.session.headers["User-Agent"] = user_agent
        except ImportError:
            if fallback_corpus is None:
                raise NotImplementedError(
                    "requests not available and no fallback_corpus given "
                    "(offline environment — use CorpusFetcher)"
                )
            self.fallback = CorpusFetcher(fallback_corpus)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fallback is not None:
            return self.fallback(batch)
        urls = batch["url"].to_pylist()
        status, htmls, errors = [], [], []
        for u in urls:  # pragma: no cover - requires network
            try:
                resp = self.session.get(u, timeout=self.timeout_s)
                resp.raise_for_status()
                status.append("fetched")
                htmls.append(resp.content)
                errors.append("")
            except Exception as e:
                status.append("error")
                htmls.append(b"")
                errors.append(str(e)[:200])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "status": pa.array(status, pa.string()),
                "html": pa.array(htmls, pa.large_binary()),
                "error": pa.array(errors, pa.string()),
            },
            schema=FETCH_SCHEMA,
        )


class BrowserFetcher:
    """Rendered-fetch modes (S3 — selenium advanced/super,
    ``scraper.py:106-124``): wait_time 5s headless (advanced) or 15s
    headed (super). The browser would be created once per actor — the
    distributed fix for the reference's per-URL driver lifecycle
    (``scraper.py:126-132``). STUB here: selenium/Chrome are not in this
    container, so construction raises unless given a fallback corpus
    (then it behaves as CorpusFetcher — plumbing testable end to end)."""

    WAITS = {"advanced": (5, True), "super": (15, False)}

    def __init__(self, mode: str = "advanced", fallback_corpus: Optional[str] = None):
        if mode not in self.WAITS:
            raise ValueError(f"unknown browser mode: {mode}")
        self.wait_time, self.headless = self.WAITS[mode]
        self.fallback = None
        try:
            import selenium  # type: ignore # noqa: F401

            raise NotImplementedError(
                "live browser fetch requires a Chrome/driver install; "
                "wire _create_driver analog here (scraper.py:135-235)"
            )
        except ImportError:
            if fallback_corpus is None:
                raise NotImplementedError(
                    "selenium not available and no fallback_corpus given"
                )
            self.fallback = CorpusFetcher(fallback_corpus)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.fallback(batch)


def fetch_stage(ds, fetcher_cls=CorpusFetcher, concurrency: int = 4,
                batch_size: int = 64, **fetcher_kwargs):
    """Attach a fetch actor pool to a Dataset of url rows. Mirrors the
    mode-dispatch strategy surface (``scraper.py:73-84``) with the
    advanced→basic fallback expressed as per-row error statuses rather
    than exception control flow."""
    return ds.map_batches(
        fetcher_cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=fetcher_kwargs,
    )
