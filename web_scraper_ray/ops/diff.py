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

import ray
import ray.data

__all__ = ["corpus_diff", "recrawl_plan", "recrawl_refresh"]

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


def recrawl_plan(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    budget: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """The recrawl scheduler's output: the ``budget`` keys most worth
    re-fetching, from the snapshot diff. Priority classes — changed
    (3: content moved, refresh first), added (2: never archived),
    unchanged (1: routine refresh, oldest-key-first); removed keys are
    excluded (nothing to fetch). Within a class the order is key
    ascending — a total order, so the plan is parallelism- and
    resume-stable and the budget cut is deterministic even inside the
    unchanged tail.

    Shape: :func:`corpus_diff`'s one slim union+groupby, a priority
    label scan, then a budget-bounded ``sort + limit`` (only the
    surviving verdict rows — key + two small columns — reach the
    exchange). Rows: ``(key, change, priority)``."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    diff = corpus_diff(old, new, key_col=key_col, text_col=text_col,
                       n_buckets=n_buckets, keep_unchanged=True)
    prio = {"changed": 3, "added": 2, "unchanged": 1}

    def label(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["change"] != "removed"].copy()
        df["priority"] = (df["change"].map(prio)
                          .to_numpy(dtype="int64"))
        return df

    return (diff.map_batches(label, batch_format="pandas")
            .sort(["priority", key_col], descending=[True, False])
            .limit(budget))


@ray.remote
def _plan_table_task(*blocks) -> pd.DataFrame:
    """Fold the (budget-bounded) plan into one object-store frame —
    the driver never holds it (the subtract_ids regime)."""
    import pyarrow as pa

    frames = [b.to_pandas() if isinstance(b, pa.Table) else b
              for b in blocks]
    if not frames:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "change": pd.Series([], dtype=object),
                             "priority": pd.Series([], dtype="int64")})
    return pd.concat(frames, ignore_index=True)


def recrawl_refresh(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    budget: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """The full recrawl loop closed: diff → budgeted plan →
    sparse refetch. Returns the planned rows WITH their refreshed
    content — ``(key, change, priority, text)`` — by semi-joining the
    plan against the new snapshot.

    Scale shape: the plan is budget-bounded by construction, so the
    broadcast semi-join (plan folded into the object store once, one
    vectorized inner merge per batch of the new-snapshot scan) is
    always the right regime — the refetch never shuffles the corpus.
    When the store itself is a hash-indexed parquet corpus, swap the
    scan for ``sources/hashindex.py:hash_lookup`` (reads only the row
    groups containing planned keys; the bench's indexed_fetch regime)
    — same output, sub-linear read."""
    plan = recrawl_plan(old, new, budget, key_col, text_col,
                        n_buckets).materialize()
    ref = _plan_table_task.remote(*plan.to_arrow_refs())

    def fetch(df: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(ref)  # zero-copy plasma read; budget-bounded
        if not len(df) or not len(pl):
            return pd.DataFrame({
                key_col: pd.Series([], dtype="int64"),
                "change": pd.Series([], dtype=object),
                "priority": pd.Series([], dtype="int64"),
                text_col: pd.Series([], dtype=object)})
        m = df[[key_col, text_col]].merge(pl, on=key_col, how="inner")
        return m[[key_col, "change", "priority", text_col]]

    return new.map_batches(fetch, batch_format="pandas")
