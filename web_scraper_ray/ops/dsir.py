"""DSIR-style data selection — importance weights for domain-targeted
resampling (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): score every raw-corpus document by how much
more likely its hashed n-gram features are under a TARGET domain's
bag-of-ngrams model than under the raw corpus's.

Ray-Data shape (two counting passes + one scoring scan):

  1. feature counting — unigram + bigram token features hashed to
     ``n_buckets`` (md5-upper-half % B, SQL-replayable); per-batch
     combiner partials → one tiny ``groupby(bucket)`` each for the raw
     corpus and the target subset. Only (bucket, count) rows shuffle.
  2. a Ray task folds both histograms into ONE int64 contribution
     array of length B (Laplace-smoothed log-likelihood ratio per
     bucket, fixed-point): the driver never holds it; every scoring
     task reads the same object-store copy.
  3. scoring scan — per batch, re-featurize and sum ``c[bucket]`` over
     feature OCCURRENCES (with multiplicity), a pure vectorized gather.

Float discipline (the BM25 rule, ``ops/retrieval.py``): probabilities
are single correctly-rounded divisions of exact integers, logs are
libm ``math.log`` (bit-identical to DuckDB ``ln``; numpy's SIMD log is
not and is never used here), and each bucket's contribution is floored
to int64 at 2^32 scale BEFORE any summation — document weights are
exact integers, order-independent, and the whole operator is
SQL-hash-checkable (``__ray_entry__.oracle_sql()['dsir_weights']``).
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd

import ray
import ray.data

_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")
_QSCALE = 4294967296.0  # 2^32


def _feature_rows(texts: pd.Series, n_buckets: int):
    """(doc_index, bucket) for every unigram and bigram occurrence of a
    batch (with multiplicity). Bucket = md5-upper-64(feature) % B; the
    bigram feature string is the single-space join, so DuckDB replays
    it as ``tk[p] || ' ' || tk[p+1]``."""
    token_lists = [_TOKEN_RE.findall(t) for t in texts.fillna("")]
    feats: list = []
    didx: list = []
    for i, toks in enumerate(token_lists):
        feats.extend(toks)
        feats.extend(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        didx.extend([i] * (2 * len(toks) - 1 if toks else 0))
    if not feats:
        return (np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(f.encode("utf-8")).digest()[:8], "big")
         for f in feats),
        dtype=np.uint64, count=len(feats),
    )
    return (np.asarray(didx, dtype=np.int64),
            (h % np.uint64(n_buckets)).astype(np.int64))


def _bucket_counts(ds: ray.data.Dataset, text_col: str,
                   n_buckets: int) -> ray.data.Dataset:
    from ray.data.aggregate import Sum

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        _, bkt = _feature_rows(df[text_col], n_buckets)
        vals, cnts = np.unique(bkt, return_counts=True)
        return pd.DataFrame({"bkt": vals, "n": cnts.astype("int64")})

    return (ds.select_columns([text_col])
            .map_batches(partials, batch_format="pandas")
            .groupby("bkt").aggregate(Sum("n", alias_name="n")))


@ray.remote(num_cpus=0)
def _contribution_array(n_buckets: int, raw_refs: int, *tables) -> np.ndarray:
    """Fold (bucket, count) blocks — first ``raw_refs`` tables are the
    raw-corpus side, the rest the target side — into the fixed-point
    per-bucket log-likelihood-ratio array."""

    def fold(tabs) -> tuple[np.ndarray, int]:
        counts = np.zeros(n_buckets, dtype=np.int64)
        for t in tabs:
            if t.num_rows:
                b = t.column("bkt").to_numpy(zero_copy_only=False)
                n = t.column("n").to_numpy(zero_copy_only=False)
                counts[b] += n
        return counts, int(counts.sum())

    raw, t_raw = fold(tables[:raw_refs])
    tgt, t_tgt = fold(tables[raw_refs:])
    out = np.empty(n_buckets, dtype=np.int64)
    for i in range(n_buckets):
        # math.log (libm), NOT np.log: must stay bit-identical to
        # DuckDB ln; ints promote exactly, each division is one
        # correctly-rounded IEEE op
        pt = math.log((int(tgt[i]) + 1) / (t_tgt + n_buckets))
        pr = math.log((int(raw[i]) + 1) / (t_raw + n_buckets))
        out[i] = math.floor((pt - pr) * _QSCALE)
    return out


def dsir_weights(
    ds: ray.data.Dataset,
    target_ds: ray.data.Dataset,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-document importance table ``(id, weight_q)``: the
    fixed-point log importance weight (higher = more target-like).
    ``ds`` is consumed twice (counting + scoring) and ``target_ds``
    once — pass re-readable sources. Resample by weight downstream
    (e.g. top-m by ``(weight_q, id)``, or threshold)."""
    raw_counts = _bucket_counts(ds, text_col, n_buckets).materialize()
    tgt_counts = _bucket_counts(target_ds, text_col, n_buckets)
    raw_refs = raw_counts.to_arrow_refs()
    tgt_refs = tgt_counts.to_arrow_refs()
    ref = _contribution_array.remote(n_buckets, len(raw_refs),
                                     *raw_refs, *tgt_refs)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        didx, bkt = _feature_rows(df[text_col], n_buckets)
        w = np.zeros(len(df), dtype=np.int64)
        if len(bkt):
            np.add.at(w, didx, c[bkt])
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "weight_q": w})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas")


def dsir_topm(
    ds: ray.data.Dataset,
    target_ds: ray.data.Dataset,
    m: int,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """The selection composite: the ``m`` most target-like documents by
    ``(weight_q desc, id asc)`` — local head per batch, then a global
    sort+limit over m × blocks rows."""
    w = dsir_weights(ds, target_ds, n_buckets=n_buckets,
                     id_col=id_col, text_col=text_col)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["weight_q", id_col],
                              ascending=[False, True],
                              kind="mergesort").head(m)

    return (w.map_batches(local, batch_format="pandas")
            .sort(["weight_q", id_col], descending=[True, False]).limit(m))
