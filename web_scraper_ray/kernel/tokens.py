"""Token counting — reproduces ``contxt.scraper.Scraper._count_tokens``
(`/root/reference/contxt/scraper.py:407-426`).

The reference strips HTML tags then encodes with tiktoken's
``cl100k_base``; on *any* failure it falls back to ``len(text) // 4``
(``scraper.py:426`` — note the fallback measures the original text,
tags included). tiktoken is not installed in this environment, so the
fallback is the active path; the tiktoken path is kept behind an
import-try for environments that have it.
"""

from __future__ import annotations

import re

_TAG_RE = re.compile(r"<[^>]+>")  # scraper.py:421

try:  # pragma: no cover - tiktoken absent in this environment
    import tiktoken  # type: ignore

    _ENCODER_CACHE: dict = {}

    def _encode_len(text: str, model: str) -> int:
        enc = _ENCODER_CACHE.get(model)
        if enc is None:
            enc = tiktoken.get_encoding(model)
            _ENCODER_CACHE[model] = enc
        return len(enc.encode(text))

    HAVE_TIKTOKEN = True
except ImportError:
    HAVE_TIKTOKEN = False


def count_tokens(text: str, model: str = "cl100k_base") -> int:
    """Exact tiktoken count when available (tags stripped first,
    ``scraper.py:421``), else the reference's own estimator
    ``len(text) // 4`` (``scraper.py:426``)."""
    if HAVE_TIKTOKEN:  # pragma: no cover - tiktoken absent here
        try:
            return _encode_len(_TAG_RE.sub("", text), model)
        except Exception:
            return len(text) // 4
    return len(text) // 4


def whitespace_token_count(text: str) -> int:
    """The reference's YouTube-path token estimate
    (``scraper.py:534,625,717``): whitespace-split word count."""
    return len(text.split())
