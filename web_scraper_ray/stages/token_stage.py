"""Token-counting stage (M19/A2).

The reference calls ``tiktoken.get_encoding`` per invocation
(``contxt/scraper.py:419``); the actor-pool form loads the encoder ONCE
per actor in ``__init__`` and counts per batch. Without tiktoken (this
environment) the counting falls back to the reference's own estimator
``len(text)//4`` (``scraper.py:426``) — still exercised through the
same actor plumbing so swapping in the real encoder is a one-line
change."""

from __future__ import annotations

import pyarrow as pa

from ..kernel.tokens import _TAG_RE


class TokenCounter:
    """map_batches actor class: ``text_col`` → ``token_count`` column."""

    def __init__(self, text_col: str = "content_html", model: str = "cl100k_base"):
        self.text_col = text_col
        self.model = model
        try:  # encoder resident per actor (A2)
            import tiktoken  # type: ignore

            self.encoder = tiktoken.get_encoding(model)
        except ImportError:
            self.encoder = None

    def _count(self, text: str) -> int:
        if self.encoder is not None:  # pragma: no cover - tiktoken absent here
            try:
                return len(self.encoder.encode(_TAG_RE.sub("", text)))
            except Exception:
                return len(text) // 4
        return len(text) // 4

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [self._count(t or "") for t in batch[self.text_col].to_pylist()]
        if "token_count" in batch.schema.names:
            batch = batch.drop_columns(["token_count"])
        return batch.append_column("token_count", pa.array(counts, pa.int64()))


def token_stage(ds, text_col: str = "content_html", concurrency: int = 4,
                batch_size: int = 256):
    return ds.map_batches(
        TokenCounter,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"text_col": text_col},
    )
