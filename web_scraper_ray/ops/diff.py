"""Snapshot diffing — what changed between two crawls of the same
space (the recrawl planner's input: fetch only what moved, expire what
vanished).

Scale shape: each side reduces to slim ``(key, content_h)`` rows —
an int63 md5-upper-half content hash, never the text — then the two
sides co-locate by ``key % B`` in ONE union + groupby (the
``_bucketed_fetch_join`` pattern, ``crawl/frontier.py``): no process
ever holds either snapshot, and the all-to-all moves 16 bytes per row.
Verdicts per key:

  added      key only in ``new``
  removed    key only in ``old``
  changed    both sides, different content hash
  (unchanged keys are dropped — at web scale they are ~95% of rows
  and the diff's consumers never want them; pass
  ``keep_unchanged=True`` to emit them.)

Exact integers end to end, so the op is SQL-hash-checkable
(``oracle_sql()['corpus_diff']`` — a FULL OUTER JOIN replay).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

__all__ = ["corpus_diff"]

_INT63 = (1 << 63) - 1


def _content_h(texts) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(t).encode("utf-8"))
                        .digest()[:8], "big") & _INT63
         for t in texts),
        dtype=np.int64, count=len(texts),
    )


def corpus_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    keep_unchanged: bool = False,
) -> ray.data.Dataset:
    """(old, new) → rows ``(key, change)`` with ``change`` in
    ``added | removed | changed`` (+ ``unchanged`` when kept).
    Precondition: ``key_col`` is unique within each snapshot (true for
    url/doc_id keyed crawls; duplicate keys would cross-product in the
    per-bucket outer merge)."""

    def slim(side: str):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            keys = df[key_col].to_numpy(dtype=np.int64)
            return pd.DataFrame({
                "bkt": keys % n_buckets,
                key_col: keys,
                "h": _content_h(df[text_col].fillna("")),
                "side": side,
            })
        return tag

    both = (old.select_columns([key_col, text_col])
            .map_batches(slim("o"), batch_format="pandas")
            .union(new.select_columns([key_col, text_col])
                   .map_batches(slim("n"), batch_format="pandas")))

    def verdicts(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == "o", [key_col, "h"]]
        n = g.loc[g["side"] == "n", [key_col, "h"]]
        m = o.merge(n, on=key_col, how="outer", suffixes=("_o", "_n"))
        change = np.where(
            m["h_o"].isna(), "added",
            np.where(m["h_n"].isna(), "removed",
                     np.where(m["h_o"] != m["h_n"], "changed",
                              "unchanged")))
        out = pd.DataFrame({key_col: m[key_col].astype("int64"),
                            "change": change})
        if not keep_unchanged:
            out = out.loc[out["change"] != "unchanged"]
        return out

    return (both.groupby("bkt")
            .map_groups(verdicts, batch_format="pandas"))
