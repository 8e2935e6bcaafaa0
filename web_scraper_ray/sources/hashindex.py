"""Hash-sorted point-lookup layout — sparse key fetches from a huge
corpus without scanning it.

The crawl's scan-join regimes (``crawl/frontier.py``: broadcast /
bucketed) pay ONE FULL CORPUS PASS per round. That is the right price
when the round touches a meaningful fraction of the corpus, but the
wrong one for SPARSE access — re-fetching 10^4 failed URLs out of a
10^10-page store, serving a decontamination blocklist's hits, point
repairs after a partial round. This module is the sparse regime:

  1. ``build_hash_index`` (once per corpus, amortized over every later
     lookup): add ``key_h`` = int63 blake2b of the key, ONE global
     ``Dataset.sort(key_h)`` (the only all-to-all, paid once), write
     parquet with small row groups, then read back ONLY THE FOOTERS to
     record each row group's [min_h, max_h] — because files are sorted,
     the ranges are tight and disjoint, so the index is a genuine
     range tree with one row per row group (metadata-scale: a 10^10-row
     corpus at 4k rows/group is a 2.4M-row index table).
  2. ``hash_lookup``: hash the wanted keys, fold them into one sorted
     array in the object store (a Ray task — the driver never holds
     the key set), prune the row-group list by binary search, and read
     ONLY the touched row groups — one Ray task per file's touched-run.
     A 64-bit hash match is necessary but not sufficient (collisions
     are certain at web scale), so each read task re-filters by the
     EXACT key against the same object-store key set.

Cost model: with key-fraction ``f`` and ``R`` rows per group, a row
group is touched with probability ``1-(1-f)^R ≈ f·R``; at f=1e-6 and
R=4096 the lookup reads ~0.4% of the corpus instead of 100%. The
fragment PLAN (file + row-group runs, not rows) does pass through the
driver — it is bounded by touched row groups, i.e. metadata-, never
row-scale.

Wired as the crawl's ``fetch_join="indexed"`` regime and as the
``indexed_fetch`` driver query (SQL oracle: a plain WHERE over the
same table).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

__all__ = ["build_hash_index", "hash_lookup", "key_hash63"]

_INT63 = (1 << 63) - 1


def key_hash63(key) -> int:
    """int63 blake2b of the key's canonical string form (ints hash as
    their decimal string, so int64 and string key columns share one
    hash definition)."""
    s = key if isinstance(key, str) else str(key)
    h = int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")
    return h & _INT63


def _hash_col(values) -> np.ndarray:
    return np.fromiter((key_hash63(v) for v in values), dtype=np.int64,
                       count=len(values))


def _src_stamp(src_path: str, key_col: str, columns, rows_per_group: int) -> str:
    files = []
    if os.path.isdir(src_path):
        for root, _, fs in os.walk(src_path):
            files += [os.path.join(root, f) for f in fs
                      if f.endswith(".parquet")]
    else:
        files = [src_path]
    # name + size + mtime_ns: an in-place rewrite with same-size files
    # (easy with fixed-schema synthetic corpora) must invalidate too —
    # a stale index would silently serve rows from the OLD corpus
    sig = ";".join(
        f"{os.path.basename(f)}:{os.path.getsize(f)}:"
        f"{os.stat(f).st_mtime_ns}"
        for f in sorted(files))
    return f"{key_col}:{','.join(columns or [])}:{rows_per_group}:{sig}"


@ray.remote(num_cpus=0)
def _footer_ranges(path: str, key_h_col: str) -> pa.Table:
    """Per-row-group [min,max] of the hash column from the parquet
    FOOTER only — no data pages are read."""
    md = pq.ParquetFile(path).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    ci = names.index(key_h_col)
    lo, hi, ns = [], [], []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(ci).statistics
        lo.append(st.min)
        hi.append(st.max)
        ns.append(md.row_group(g).num_rows)
    return pa.table({
        "file": pa.array([path] * md.num_row_groups, pa.string()),
        "rg": pa.array(range(md.num_row_groups), pa.int64()),
        "min_h": pa.array(lo, pa.int64()),
        "max_h": pa.array(hi, pa.int64()),
        "n": pa.array(ns, pa.int64()),
    })


def build_hash_index(
    src_path: str,
    key_col: str,
    out_dir: str,
    columns: Optional[list[str]] = None,
    rows_per_group: int = 4096,
) -> str:
    """Materialize ``src_path`` as a hash-sorted point-lookup layout
    under ``out_dir`` (``data/`` sorted parquet + ``index.parquet``
    row-group ranges). Idempotent: a ``_DONE`` stamp of the source file
    listing + params skips the rebuild, so the one-time sort amortizes
    over every later :func:`hash_lookup` (and over crawl rounds)."""
    stamp = _src_stamp(src_path, key_col, columns, rows_per_group)
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == stamp:
                return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)

    from web_scraper_ray.ops import sized_read_parquet

    ds = sized_read_parquet(src_path, columns=columns)

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__key_h", pa.array(_hash_col(t[key_col].to_pylist()),
                                pa.int64()))

    (ds.map_batches(add_hash, batch_format="pyarrow")
       .sort("__key_h")
       .write_parquet(data_dir, row_group_size=rows_per_group))

    files = sorted(os.path.join(data_dir, f) for f in os.listdir(data_dir)
                   if f.endswith(".parquet"))
    parts = ray.get([_footer_ranges.remote(f, "__key_h") for f in files])
    idx = pa.concat_tables([p for p in parts if p.num_rows])
    pq.write_table(idx, os.path.join(out_dir, "index.parquet"))
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir


@ray.remote(num_cpus=0, num_returns=2)
def _fold_keys(*tables):
    """Two object-store returns — (sorted unique int63 hashes, exact
    key array) — so neither the hash set nor the key set ever lands on
    the driver (the plan task and the read tasks deref them in place)."""
    chunks = [ch for t in tables if t.num_rows
              for ch in t.column(0).chunks]
    if not chunks:
        return np.empty(0, dtype=np.int64), pa.array([], pa.string())
    keys = pc.unique(pa.chunked_array(chunks))
    hashes = np.sort(_hash_col(keys.to_pylist()))
    return hashes, keys


@ray.remote(num_cpus=0)
def _plan_fragments(index_dir: str, hashes: np.ndarray) -> list[dict]:
    """Prune the row-group index against the sorted hash array and
    merge touched row groups into contiguous runs per file (one read
    task per run)."""
    idx = pq.read_table(os.path.join(index_dir, "index.parquet"))
    files = idx.column("file").to_pylist()
    rgs = idx.column("rg").to_numpy()
    lo = idx.column("min_h").to_numpy()
    hi = idx.column("max_h").to_numpy()
    # a row group is touched iff some wanted hash falls in [lo, hi]
    touched = np.searchsorted(hashes, lo, side="left") < \
        np.searchsorted(hashes, hi, side="right")
    runs: list[dict] = []
    prev_file, prev_rg = None, -2
    for f, g, t in zip(files, rgs, touched):
        if not t:
            continue
        if f == prev_file and g == prev_rg + 1:
            runs[-1]["rgs"].append(int(g))
        else:
            runs.append({"file": f, "rgs": [int(g)]})
        prev_file, prev_rg = f, g
    return runs


def hash_lookup(
    index_dir: str,
    keys: Union[ray.data.Dataset, Sequence],
    key_col: str,
    columns: Optional[list[str]] = None,
) -> ray.data.Dataset:
    """Fetch exactly the rows of the indexed table whose ``key_col``
    is in ``keys`` (a Dataset with that column, or a plain sequence).
    Reads only the row groups whose hash range intersects the key set;
    each read task re-filters by the EXACT key, so hash collisions
    cannot leak foreign rows."""
    if isinstance(keys, ray.data.Dataset):
        refs = keys.select_columns([key_col]).to_arrow_refs()
        hashes_ref, keys_ref = _fold_keys.remote(*refs)
    else:
        hashes_ref, keys_ref = _fold_keys.remote(
            pa.table({key_col: pa.array(list(keys))}))
    # only the fragment PLAN reaches the driver (metadata-scale); the
    # hash/key sets stay in the object store end to end
    runs = ray.get(_plan_fragments.remote(index_dir, hashes_ref))

    data_dir = os.path.join(index_dir, "data")
    schema = None
    for f in sorted(os.listdir(data_dir)):
        if f.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(data_dir, f))
            break
    if schema is None:
        raise FileNotFoundError(f"no data files under {data_dir}")
    out_cols = columns or [n for n in schema.names if n != "__key_h"]

    if not runs:
        empty = pa.table({c: pa.array([], schema.field(c).type)
                          for c in out_cols})
        return ray.data.from_arrow(empty)

    def read_run(df: pd.DataFrame) -> pa.Table:
        keys_arr = ray.get(keys_ref)  # zero-copy plasma read
        tabs = []
        for file, rgs in zip(df["file"], df["rgs"]):
            t = pq.ParquetFile(file).read_row_groups(
                list(rgs), columns=list(dict.fromkeys(out_cols + [key_col])))
            mask = pc.is_in(t[key_col].cast(keys_arr.type),
                            value_set=keys_arr)
            tabs.append(t.filter(mask).select(out_cols))
        return pa.concat_tables(tabs)

    return ray.data.from_items(runs).map_batches(
        read_run, batch_format="pandas", batch_size=1)
