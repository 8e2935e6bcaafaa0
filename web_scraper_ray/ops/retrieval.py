"""BM25 full-text retrieval over the document corpus — the lexical
complement of the embedding similarity family (``ops/similarity.py``).

Ray-Data shape (ONE statistics pass + ONE scoring scan; no inverted
index is materialized — at 100 TB a posting-list build is a full
all-to-all over (token, doc) pairs, while query-time scoring only
needs the df of the HANDFUL of query terms):

  1. statistics pass: per-batch combiner partials — corpus doc/token
     counts plus, per query term, the number of batch docs containing
     it — one tiny ``groupby(key)`` over (key, partial) rows, folded
     into an object-store dict by a Ray task (the driver never holds
     it; every scoring task reads the same copy).
  2. scoring scan: pure ``map_batches`` — tokenize, per-term vectorized
     tf counts, Okapi BM25 with the per-term score QUANTIZED to int64
     (``floor(score * 2^32)``) before the cross-term sum, making the
     total integer-exact and order-independent; local top-k per batch,
     then a global sort+limit that only ever moves k rows per block
     (the ``brute_force_topk`` pattern).

Float discipline (the repo's oracle rule): every arithmetic step is a
single correctly-rounded IEEE double op replayed in the same order by
the SQL twin; ``idf`` uses ``math.log`` (glibc libm — bit-identical to
DuckDB's ``ln``, verified over the df domain; numpy's SIMD ``np.log``
is NOT and must not be used here), computed once per query term.
Oracle: ``__ray_entry__.oracle_sql()['bm25_topk']``.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

import ray
import ray.data

_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")

_DOCS_KEY = "\x00docs"
_TOKS_KEY = "\x00toks"
_QSCALE = 4294967296.0  # 2^32


@ray.remote(num_cpus=0)
def _fold_stats(*tables) -> dict:
    """Fold the (key, n) stat blocks into one dict in the object store."""
    out: dict = {}
    for t in tables:
        if not t.num_rows:  # empty blocks carry no schema
            continue
        for key, n in zip(t.column("key").to_pylist(),
                          t.column("n").to_pylist()):
            out[key] = out.get(key, 0) + int(n)
    return out


def _query_terms(query: str) -> tuple[str, ...]:
    terms = tuple(dict.fromkeys(_TOKEN_RE.findall(query)))
    if not terms:
        raise ValueError(f"query has no tokens: {query!r}")
    return terms


def _stats_ref(ds: ray.data.Dataset, terms: tuple[str, ...],
               text_col: str):
    """One combiner pass: corpus N / total tokens + per-term df."""
    from ray.data.aggregate import Sum

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        token_lists = [_TOKEN_RE.findall(t) for t in df[text_col].fillna("")]
        keys = [_DOCS_KEY, _TOKS_KEY]
        ns = [len(token_lists), sum(len(t) for t in token_lists)]
        for term in terms:
            keys.append(term)
            ns.append(sum(term in set(toks) for toks in token_lists))
        return pd.DataFrame({"key": keys,
                             "n": np.asarray(ns, dtype=np.int64)})

    folded = (ds.select_columns([text_col])
              .map_batches(partials, batch_format="pandas")
              .groupby("key").aggregate(Sum("n", alias_name="n")))
    return _fold_stats.remote(*folded.to_arrow_refs())


def bm25_scores(
    ds: ray.data.Dataset,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Score EVERY document against ``query``: rows
    ``(id, score_q)`` with ``score_q`` the int64 fixed-point
    (``floor(per-term BM25 * 2^32)`` summed over query terms). Docs
    containing no query term score 0 (each absent term contributes a
    0 numerator — kept uniform so the SQL twin's cross join replays
    it)."""
    terms = _query_terms(query)
    ref = _stats_ref(ds, terms, text_col)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        n_corpus = st[_DOCS_KEY]
        avgdl = st[_TOKS_KEY] / n_corpus
        # math.log, NOT np.log: libm matches DuckDB ln bit-for-bit
        idf = {t: math.log((n_corpus - st.get(t, 0) + 0.5)
                           / (st.get(t, 0) + 0.5)) for t in terms}
        token_lists = [_TOKEN_RE.findall(t) for t in df[text_col].fillna("")]
        lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                           count=len(token_lists))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for toks in token_lists:
            flat[pos:pos + len(toks)] = toks
            pos += len(toks)
        didx = np.repeat(np.arange(len(token_lists)), lens)
        dl = lens.astype(np.float64)
        ratio = dl / avgdl
        total = np.zeros(len(df), dtype=np.int64)
        for t in terms:
            tf = np.bincount(didx[flat == t],
                             minlength=len(df)).astype(np.float64)
            num = tf * (k1 + 1.0)
            denom = tf + k1 * (1.0 - b + b * ratio)
            total += np.floor((idf[t] * num) / denom
                              * _QSCALE).astype(np.int64)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "score_q": total})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas")


def bm25_topk(
    ds: ray.data.Dataset,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Global BM25 top-k: local head per batch, then a sort+limit that
    moves only ``k × num_blocks`` (id, score) rows. Ties break by
    ascending id (deterministic)."""
    scored = bm25_scores(ds, query, k1=k1, b=b,
                         id_col=id_col, text_col=text_col)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["score_q", id_col],
                              ascending=[False, True],
                              kind="mergesort").head(k)

    return (scored.map_batches(local_topk, batch_format="pandas")
            .sort(["score_q", id_col], descending=[True, False]).limit(k))
