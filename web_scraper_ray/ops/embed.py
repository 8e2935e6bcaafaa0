"""Text embedding generation as a distributed inference stage.

A real pipeline embeds documents with a transformer (GTE/E5) on an
actor pool — weights loaded once per actor, batched forward passes.
No model runs in this sandbox, so the "model" here is deterministic
FEATURE HASHING (Weinberger et al. 2009): dimension and sign of every
token come from its md5, the doc vector is the signed token-count sum
— an unbiased random projection of the bag-of-words that preserves
inner products in expectation. The Ray plumbing is the real part: a
callable CLASS on ``map_batches(concurrency=...)`` whose ``__init__``
builds the projection tables once per actor (the A2 pattern —
tiktoken-per-actor, ``/root/reference/contxt/scraper.py:419`` is the
reference's miss of it), vectorized per-batch encode, fixed output
schema. Swapping in a real encoder changes ``__init__`` and one line
of ``__call__``.

Exactness: values are signed INTEGER counts (no normalization — a
downstream cosine divides by norms anyway, and integer sums are the
repo's oracle discipline). The long format ``(id, dim, value)`` emits
ALL dims per doc including zeros, so cancellation-to-zero cannot
desync the row set from the SQL twin, which replays dim/sign as
md5-hex-substring arithmetic (``oracle_sql()['hash_embed']``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

from web_scraper_ray.ops.decontam import _TOKEN_RE

__all__ = ["HashEmbedder", "hash_embed"]

EMBED_DIM = 16


class HashEmbedder:
    """Actor-pool embedding stage: per-actor state is the token →
    (dim, sign) cache (the stand-in for model weights); per-batch work
    is one tokenize + one vectorized bincount fold per doc."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 dim: int = EMBED_DIM):
        self.id_col = id_col
        self.text_col = text_col
        self.dim = dim
        self._cache: dict[str, tuple[int, int]] = {}

    def _dim_sign(self, tok: str) -> tuple[int, int]:
        hit = self._cache.get(tok)
        if hit is None:
            d = hashlib.md5(tok.encode("utf-8")).digest()
            # byte 1 → dimension, byte 2 lsb → sign (byte 0 is the
            # repo-wide coarse-bucket byte; staying off it keeps the
            # embedding independent of shuffle bucketing)
            hit = (d[1] % self.dim, 1 if d[2] & 1 else -1)
            self._cache[tok] = hit
        return hit

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n, dim = len(df), self.dim
        token_lists = [_TOKEN_RE.findall(t)
                       for t in df[self.text_col].fillna("")]
        lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                           count=n)
        flat = [tok for lst in token_lists for tok in lst]
        vec = np.zeros(n * dim, dtype=np.int64)
        if flat:
            ds_pairs = [self._dim_sign(t) for t in flat]
            dims = np.fromiter((p[0] for p in ds_pairs), dtype=np.int64,
                               count=len(flat))
            signs = np.fromiter((p[1] for p in ds_pairs), dtype=np.int64,
                                count=len(flat))
            rows = np.repeat(np.arange(n), lens)
            np.add.at(vec, rows * dim + dims, signs)
        return pd.DataFrame({
            self.id_col: np.repeat(df[self.id_col].to_numpy(), dim),
            "dim": np.tile(np.arange(dim, dtype=np.int64), n),
            "value": vec,
        })


def hash_embed(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 2,
) -> ray.data.Dataset:
    """Embed every document: long-format rows ``(id, dim, value)``
    with exactly :data:`EMBED_DIM` rows per doc (zeros included — see
    module doc). Actor pool sized by ``concurrency``; swap
    :class:`HashEmbedder` for a real encoder actor to run model
    inference with identical plumbing."""
    return ds.select_columns([id_col, text_col]).map_batches(
        HashEmbedder, fn_constructor_kwargs={"id_col": id_col,
                                             "text_col": text_col},
        batch_format="pandas", concurrency=concurrency)
