"""web_scraper_ray — a Ray-Data-native crawl/extract data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of ``danhilse/web-scraper`` (reference snapshot at
``/root/reference``, package ``contxt``), re-expressed Ray-Data-first:

* ``dom`` / ``kernel`` — pure-Python HTML extraction kernel (stdlib
  ``html.parser``), reproducing the reference's cleaning + formatting
  semantics (``contxt/scraper.py``, ``contxt/formatters/*``).
* ``functions`` — URL predicates/canonicalization, filename rules,
  YouTube URL classification analogs.
* ``corpus`` — deterministic synthetic Common-Crawl-style ``pages``
  table generator (schema per BASELINE.json input_hint).
* ``crawl`` — the URL-frontier + fetch scheduler: sharded seen-set
  actors, per-host virtual-time politeness, robots rules, per-round
  checkpoint/resume; plus the sequential reference crawl model that
  serves as the executable spec.
* ``stages`` — Ray Data ``map_batches`` stages (extraction, tokens,
  fetch-join).
* ``ops`` — large-scale training-data operators: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
  search, text analysis, multimodal plumbing.
* ``pipelines`` — end-to-end flagship pipelines.

No module in this package calls ``ray.init()``; sessions are owned by
the caller (tests' conftest fixture, ``bench.py``, or the driver).
"""

__version__ = "0.1.0"
