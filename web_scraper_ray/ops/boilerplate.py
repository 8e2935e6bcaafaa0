"""Host-level boilerplate line removal (the CCNet / RefinedWeb
"line-level deduplication against the host" step: navs, footers,
cookie banners and table chrome repeat on most pages of a site, and
removing them is a per-host — not corpus-global — decision).

A line is *boilerplate for its host* when it appears on at least
``min_pages`` distinct pages of that host. Two operators:

* :func:`host_boilerplate_lines` — the decision pass: the per-host
  boilerplate line inventory ``(host, line, n_pages)``.
* :func:`strip_boilerplate` — the rebuild pass: every page with its
  host's boilerplate lines removed, surviving lines re-joined in
  original order (``url, text, n_dropped``).

Ray-Data shape (the dedup-family pattern, ops/dedup.py module doc —
line TEXT never rides a shuffle):

1. decision pass ships only ``(host, k, c)`` combiner partials, where
   ``k`` is an 8-byte blake2b of ``host|line`` (the family's compact
   content key; collisions are 2^-64-scale and would only merge two
   line counts) and ``c`` counts distinct batch pages carrying the
   line. A page is one row, so its lines never span batches: the
   global ``count(DISTINCT url)`` is exactly the SUM of batch
   partials. The groupby is coarse-bucketed (``k % n_buckets``
   groups, never one group per distinct line: the documented
   corpus-cardinality-groupby rule). Measured on the 200k-page bench
   corpus this fold is ~4× faster than shuffling the line text.
2. the qualifying key set (a site's chrome — small per host) comes
   back as ``(host, k, n_pages)``; line text for the INVENTORY is
   recovered by a second corpus scan that keeps only qualifying keys
   (a slim join, nothing corpus-shaped moves).
3. rebuild: ``broadcast`` folds the sorted qualifying-key array into
   the object store in a Ray task (the subtract_ids regime — the
   driver never holds it) and every batch drops its lines by
   ``searchsorted`` membership; ``bucketed`` co-locates pages and
   qualifying keys by ``hash(host) % n_buckets`` so no process ever
   holds the full set — right when hosts × boilerplate lines outgrow
   a node. ``mode="auto"`` switches on the measured set size.

Parity discipline (the DuckDB twin in ``__ray_entry__.oracle_sql``
replays every rule over line TEXT — the hashes are internal keys
only): host = ``regexp_extract(url, '://([^/]+)', 1)``; lines split
on ``chr(10)`` exactly; empty lines are never boilerplate (they carry
layout, not content — and stripping them would merge paragraphs);
rejoin is an ordered ``string_agg``; a page whose every line was
boilerplate comes back with empty text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_HOST_RE = r"://([^/]+)"


def _k64(host: np.ndarray, line: np.ndarray) -> np.ndarray:
    """8-byte blake2b content key of host|line, non-negative int64
    (stable across processes and library versions, unlike
    pd.util.hash_array)."""
    b = hashlib.blake2b
    return np.fromiter(
        (int.from_bytes(b((h + "\x1f" + ln).encode(), digest_size=8)
                        .digest(), "big") >> 1
         for h, ln in zip(host, line)),
        dtype=np.int64, count=len(host))


def _host_k64(host: np.ndarray) -> np.ndarray:
    b = hashlib.blake2b
    return np.fromiter(
        (int.from_bytes(b(h.encode(), digest_size=8).digest(), "big") >> 1
         for h in host),
        dtype=np.int64, count=len(host))


def _explode_lines(df: pd.DataFrame, url_col: str,
                   text_col: str) -> pd.DataFrame:
    """(url, host, line) rows of a batch, vectorized repeat-explode."""
    host = df[url_col].str.extract(_HOST_RE, expand=False).fillna("")
    lines = df[text_col].fillna("").str.split("\n")
    cnt = lines.str.len().to_numpy()
    return pd.DataFrame({
        url_col: np.repeat(df[url_col].to_numpy(), cnt),
        "host": np.repeat(host.to_numpy(), cnt),
        "line": np.concatenate(lines.to_numpy()) if len(df)
                else np.array([], dtype=object),
    })


def _qualifying_keys(
    ds: ray.data.Dataset,
    url_col: str,
    text_col: str,
    min_pages: int,
    n_buckets: int,
) -> ray.data.Dataset:
    """The decision fold: ``(host, k, n_pages)`` for every line-key on
    ``>= min_pages`` distinct pages of its host. Only int64 keys +
    short host strings ride the shuffle."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "host": pd.Series([], dtype=object),
                "k": pd.Series([], dtype="int64"),
                "c": pd.Series([], dtype="int64"),
                "__bkt": pd.Series([], dtype="int64")})
        ex = _explode_lines(df, url_col, text_col)
        ex = ex[ex["line"] != ""].drop_duplicates(
            ["host", "line", url_col])
        agg = (ex.groupby(["host", "line"], sort=False)[url_col]
                 .size().reset_index(name="c"))
        agg["k"] = _k64(agg["host"].to_numpy(), agg["line"].to_numpy())
        agg["c"] = agg["c"].astype("int64")
        agg["__bkt"] = agg["k"] % np.int64(n_buckets)
        return agg[["host", "k", "c", "__bkt"]]

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("k", sort=False)
                .agg(host=("host", "first"), n_pages=("c", "sum"))
                .reset_index())
        agg = agg[agg["n_pages"] >= min_pages]
        agg["n_pages"] = agg["n_pages"].astype("int64")
        return agg[["host", "k", "n_pages"]]

    return (ds.select_columns([url_col, text_col])
              .map_batches(partials, batch_format="pandas")
              .groupby("__bkt")
              .map_groups(count_group, batch_format="pandas"))


@ray.remote
def _key_table_task(*blocks) -> pd.DataFrame:
    """Fold the qualifying-key table into one object-store frame,
    k-sorted for searchsorted membership (the subtract_ids regime —
    the driver never holds it)."""
    frames = [b.to_pandas() if isinstance(b, pa.Table) else b
              for b in blocks]
    if not frames:
        return pd.DataFrame({"host": [], "k": pd.Series([], "int64"),
                             "n_pages": pd.Series([], "int64")})
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values("k", kind="mergesort").reset_index(drop=True)


def host_boilerplate_lines(
    ds: ray.data.Dataset,
    url_col: str = "url",
    text_col: str = "text",
    min_pages: int = 3,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-host boilerplate inventory: ``(host, line, n_pages)`` for
    every non-empty line appearing on ``>= min_pages`` distinct pages
    of the same host. ``ds`` is consumed twice (decision fold + text
    recovery for the qualifying set) — pass a re-readable source."""
    keys = _qualifying_keys(ds, url_col, text_col, min_pages,
                            n_buckets).materialize()
    ref = _key_table_task.remote(*keys.to_arrow_refs())

    def recover(df: pd.DataFrame) -> pd.DataFrame:
        kt = ray.get(ref)  # zero-copy plasma read
        ex = _explode_lines(df, url_col, text_col)
        ex = ex[ex["line"] != ""].drop_duplicates(["host", "line"])
        if not len(ex):
            return pd.DataFrame({
                "host": pd.Series([], dtype=object),
                "line": pd.Series([], dtype=object),
                "n_pages": pd.Series([], dtype="int64"),
                "__bkt": pd.Series([], dtype="int64")})
        k = _k64(ex["host"].to_numpy(), ex["line"].to_numpy())
        ks = kt["k"].to_numpy()
        pos = np.searchsorted(ks, k)
        pos_c = np.minimum(pos, len(ks) - 1) if len(ks) else pos
        hit = (ks[pos_c] == k) if len(ks) else np.zeros(len(k), bool)
        out = ex.loc[hit, ["host", "line"]].copy()
        out["n_pages"] = kt["n_pages"].to_numpy()[pos_c[hit]]
        out["__bkt"] = k[hit] % np.int64(n_buckets)
        return out

    # many batches re-emit the same qualifying line → one small dedup
    # fold over qualifying rows only (inventory-shaped, not corpus-)
    return (ds.select_columns([url_col, text_col])
              .map_batches(recover, batch_format="pandas")
              .groupby("__bkt")
              .map_groups(
                  lambda g: g.drop_duplicates(["host", "line"])
                             [["host", "line", "n_pages"]],
                  batch_format="pandas"))


def _strip_batch_by_keys(df: pd.DataFrame, ks: np.ndarray, url_col: str,
                         text_col: str) -> pd.DataFrame:
    """Rebuild a batch of pages without lines whose host|line key is in
    the sorted key array (order-preserving, empty lines kept)."""
    if not len(df):
        return pd.DataFrame({
            url_col: pd.Series([], dtype=object),
            text_col: pd.Series([], dtype=object),
            "n_dropped": pd.Series([], dtype="int64")})
    ex = _explode_lines(df, url_col, text_col)
    ex["p"] = ex.groupby(url_col, sort=False).cumcount()
    if len(ks):
        k = _k64(ex["host"].to_numpy(), ex["line"].to_numpy())
        pos = np.minimum(np.searchsorted(ks, k), len(ks) - 1)
        drop = (ks[pos] == k) & (ex["line"] != "").to_numpy()
    else:
        drop = np.zeros(len(ex), dtype=bool)
    kept = ex.loc[~drop].sort_values([url_col, "p"], kind="mergesort")
    agg = kept.groupby(url_col, sort=False)["line"].agg("\n".join)
    out = pd.DataFrame({url_col: df[url_col].to_numpy()})
    out[text_col] = out[url_col].map(agg).fillna("")
    n_drop = ex.loc[drop].groupby(url_col, sort=False).size()
    out["n_dropped"] = (out[url_col].map(n_drop).fillna(0)
                        .astype("int64"))
    return out


def strip_boilerplate(
    ds: ray.data.Dataset,
    url_col: str = "url",
    text_col: str = "text",
    min_pages: int = 3,
    n_buckets: int = 64,
    mode: str = "auto",
    broadcast_limit: int = 50_000_000,
) -> ray.data.Dataset:
    """Every page with its host's boilerplate removed:
    ``(url, text, n_dropped)``. ``ds`` is consumed twice (decision +
    rebuild) — pass a re-readable source."""
    keys = _qualifying_keys(ds, url_col, text_col, min_pages,
                            n_buckets).materialize()
    if mode == "auto":
        mode = "broadcast" if keys.count() <= broadcast_limit else "bucketed"

    if mode == "broadcast":
        ref = _key_table_task.remote(*keys.to_arrow_refs())

        def rb(df: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(ref)["k"].to_numpy()
            return _strip_batch_by_keys(df, ks, url_col, text_col)

        return ds.select_columns([url_col, text_col]).map_batches(
            rb, batch_format="pandas")

    if mode != "bucketed":
        raise ValueError(f"unknown strip_boilerplate mode: {mode}")

    def tag_pages(df: pd.DataFrame) -> pd.DataFrame:
        host = df[url_col].str.extract(_HOST_RE, expand=False).fillna("")
        out = df[[url_col, text_col]].copy()
        out["k"] = np.int64(0)
        out["__side"] = "c"
        out["__bkt"] = (_host_k64(host.to_numpy())
                        % np.int64(n_buckets))
        return out

    def tag_keys(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            url_col: "", text_col: "",
            "k": df["k"].to_numpy(dtype=np.int64), "__side": "b",
            "__bkt": (_host_k64(df["host"].to_numpy(dtype=object))
                      % np.int64(n_buckets)),
        })

    both = ds.select_columns([url_col, text_col]).map_batches(
        tag_pages, batch_format="pandas"
    ).union(keys.map_batches(tag_keys, batch_format="pandas"))

    def rebuild_group(g: pd.DataFrame) -> pd.DataFrame:
        pages = g.loc[g["__side"] == "c", [url_col, text_col]]
        ks = np.sort(g.loc[g["__side"] == "b", "k"].to_numpy(np.int64))
        return _strip_batch_by_keys(pages, ks, url_col, text_col)

    return both.groupby("__bkt").map_groups(
        rebuild_group, batch_format="pandas")
