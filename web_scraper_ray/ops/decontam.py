"""Benchmark decontamination — the training-data op that removes (or
flags) corpus documents sharing any token n-gram with a benchmark /
evaluation set (the GPT-3 / PaLM 13-gram protocol, here parameterized).

Ray-Data shape:

  1. the benchmark side (eval sets are FIXED-SIZE — KBs to a few MBs,
     never O(corpus)) is reduced to its distinct n-gram set and
     broadcast once via ``ray.put``; every corpus task reads the same
     object-store copy — no shuffle, no per-batch reshipping;
  2. the corpus side is a pure ``map_batches`` scan: tokenize, build
     n-grams vectorized (shifted-array string concat — no per-gram
     Python loop), membership-test the whole batch's grams with one
     vectorized ``Series.isin`` against the broadcast set.

Determinism / oracle parity: tokens are ASCII-whitespace runs
(``[^ \\t\\n\\r\\f\\v]+`` — identical under Python re and DuckDB RE2),
grams are single-space joins, and the emitted count is the number of
DISTINCT matched grams per document — all exact integers, so the whole
op is SQL-hash-checkable (``__ray_entry__.oracle_sql()['decontaminate']``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray

_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")


def _doc_ngrams(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All token n-grams of a batch: returns (doc_index, gram) arrays.
    Gram construction is vectorized over the flattened token array —
    n shifted views joined by ``Series.str.cat`` — with a validity mask
    dropping windows that cross document boundaries."""
    token_lists = [_TOKEN_RE.findall(t) for t in texts.fillna("")]
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                       count=len(token_lists))
    total = int(lens.sum())
    if total < n:
        return np.array([], dtype=np.int64), np.array([], dtype=object)
    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in token_lists:
        flat[pos:pos + len(toks)] = toks
        pos += len(toks)
    didx = np.repeat(np.arange(len(token_lists)), lens)
    m = total - n + 1
    head = pd.Series(flat[:m], dtype="object")
    grams = head.str.cat([flat[k:m + k] for k in range(1, n)], sep=" ")
    valid = didx[:m] == didx[n - 1:]
    return didx[:m][valid], grams.to_numpy()[valid]


def benchmark_ngram_ref(bench_ds: "ray.data.Dataset", n: int = 8,
                        text_col: str = "text"):
    """Distinct n-gram set of the benchmark table as an object-store
    ref (``ray.put`` once; read zero-copy by every corpus task). The
    driver-side Arrow-block fold here is bounded by the benchmark
    size — a fixed eval set, not corpus-scaled — which is the
    documented small-side-broadcast regime (vs the bucketed joins used
    for corpus-sized sets elsewhere in this package)."""

    import pyarrow as pa

    def to_grams(df: pd.DataFrame) -> pd.DataFrame:
        _, grams = _doc_ngrams(df[text_col], n)
        return pd.DataFrame({"g": pd.unique(grams)})

    # fold the gram blocks as Arrow tables rather than take_all():
    # per-row dict conversion is ~3x slower than a column to_pylist
    tabs = ray.get(
        bench_ds.map_batches(to_grams, batch_format="pandas").to_arrow_refs()
    )
    tabs = [t for t in tabs if t.num_rows]
    grams = (pa.concat_tables(tabs).column("g").to_pylist()
             if tabs else [])
    return ray.put(frozenset(grams))


def contamination_counts(
    ds: "ray.data.Dataset",
    bench_grams_ref,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-document contamination table: (id, n_matched_grams) where
    ``n_matched_grams`` counts DISTINCT document n-grams present in the
    benchmark gram set. Pure scan — one vectorized isin per batch."""

    def count(df: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(bench_grams_ref)
        didx, grams = _doc_ngrams(df[text_col], n)
        out = pd.DataFrame({id_col: df[id_col].to_numpy()})
        hits = np.zeros(len(df), dtype=np.int64)
        if len(grams):
            matched = pd.Series(grams).isin(bench).to_numpy()
            pairs = pd.DataFrame(
                {"d": didx[matched], "g": grams[matched]}
            ).drop_duplicates()
            cnt = pairs.groupby("d").size()
            hits[cnt.index.to_numpy()] = cnt.to_numpy()
        out["n_matched_grams"] = hits
        return out

    return ds.map_batches(count, batch_format="pandas")


def decontaminate(
    ds: "ray.data.Dataset",
    bench_ds: "ray.data.Dataset",
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Remove every corpus document sharing at least one token n-gram
    with the benchmark set; returns surviving rows of ``ds`` with their
    original schema. Benchmark grams broadcast once; the corpus is a
    single filtering scan (no shuffle, no second pass)."""
    ref = benchmark_ngram_ref(bench_ds, n=n, text_col=text_col)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(ref)
        didx, grams = _doc_ngrams(df[text_col], n)
        bad = np.zeros(len(df), dtype=bool)
        if len(grams):
            matched = pd.Series(grams).isin(bench).to_numpy()
            bad[np.unique(didx[matched])] = True
        return df.loc[~bad]

    return ds.map_batches(keep, batch_format="pandas")
