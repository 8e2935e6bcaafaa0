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
   ``k`` is a stable 64-bit vectorized content key of (host, line)
   (vhash.py — collisions are 2^-63-scale and would only merge two
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

Kernel discipline: every per-batch pass is Arrow-native — regex host
extract, line split/flatten, hashing, membership, and the ordered
rejoin (``LargeListArray`` rebuild + ``binary_join``) all run in
Arrow/numpy kernels; no Python string ever materializes in the hot
path (the round-4 per-line blake2b generator was the bench's slowest
kernel). Rebuild is keyed on ROW POSITION, not url, so duplicate urls
in one batch/bucket (multi-snapshot corpora) rebuild independently.

Parity discipline (the DuckDB twin in ``__ray_entry__.oracle_sql``
replays every rule over line TEXT — the hashes are internal keys
only): host = ``regexp_extract(url, '://([^/]+)', 1)``; lines split
on ``chr(10)`` exactly; empty lines are never boilerplate (they carry
layout, not content — and stripping them would merge paragraphs);
rejoin is an ordered ``string_agg``; a page whose every line was
boilerplate comes back with empty text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..vhash import hash64_combine, hash64_str

_HOST_RE = r"://([^/]+)"
_HOST_RE_ARROW = r"://(?P<h>[^/]+)"

_EMPTY_PARTIAL = pa.table({
    "host": pa.array([], pa.large_string()),
    "k": pa.array([], pa.int64()),
    "c": pa.array([], pa.int64()),
    "__bkt": pa.array([], pa.int64())})

_EMPTY_INVENTORY = pa.table({
    "host": pa.array([], pa.large_string()),
    "line": pa.array([], pa.large_string()),
    "n_pages": pa.array([], pa.int64()),
    "__bkt": pa.array([], pa.int64())})


def _hosts_of(url: pa.Array) -> pa.Array:
    """host per page — ``regexp_extract(url, '://([^/]+)', 1)``, '' on
    no match (same as the SQL twin)."""
    return pc.fill_null(
        pc.struct_field(pc.extract_regex(url, _HOST_RE_ARROW), "h"), "")


def _line_rows(url: pa.Array, text: pa.Array):
    """Arrow-native explode of a (url, text) batch into line rows:
    ``(host_per_page, parent_row, flat_lines, k, nonempty)`` where
    ``k`` is the stable content key of (host, line) per line and
    ``nonempty`` marks lines != ''. No Python strings materialize."""
    host = _hosts_of(url)
    lines = pc.split_pattern(pc.fill_null(text, ""), "\n")
    parent = pc.list_parent_indices(lines).to_numpy().astype(
        np.int64, copy=False)
    flat = pc.list_flatten(lines)
    k = hash64_combine(hash64_str(host)[parent], hash64_str(flat))
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return host, parent, flat, k, nonempty


def _member(ks: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Membership of each key in the sorted key array ``ks``."""
    if not len(ks):
        return np.zeros(len(k), dtype=bool)
    pos = np.minimum(np.searchsorted(ks, k), len(ks) - 1)
    return ks[pos] == k


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

    def partials(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return _EMPTY_PARTIAL
        url = batch[url_col].combine_chunks()
        text = batch[text_col].combine_chunks()
        host, parent, _flat, k, nonempty = _line_rows(url, text)
        k, parent = k[nonempty], parent[nonempty]
        if not len(k):
            return _EMPTY_PARTIAL
        # distinct (line-key, page) pairs, then pages per key — pure
        # int64 sorting, no string groupby
        o = np.lexsort((parent, k))
        ks, ps = k[o], parent[o]
        first = np.empty(len(ks), dtype=bool)
        first[0] = True
        first[1:] = (ks[1:] != ks[:-1]) | (ps[1:] != ps[:-1])
        ku, pu = ks[first], ps[first]
        new_key = np.empty(len(ku), dtype=bool)
        new_key[0] = True
        new_key[1:] = ku[1:] != ku[:-1]
        starts = np.flatnonzero(new_key)
        c = np.diff(np.append(starts, len(ku)))
        uk = ku[starts]
        return pa.table({
            "host": host.cast(pa.large_string()).take(
                pa.array(pu[starts], pa.int64())),
            "k": pa.array(uk, pa.int64()),
            "c": pa.array(c.astype(np.int64), pa.int64()),
            "__bkt": pa.array(uk % np.int64(n_buckets), pa.int64())})

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("k", sort=False)
                .agg(host=("host", "first"), n_pages=("c", "sum"))
                .reset_index())
        agg = agg[agg["n_pages"] >= min_pages]
        agg["n_pages"] = agg["n_pages"].astype("int64")
        return agg[["host", "k", "n_pages"]]

    return (ds.select_columns([url_col, text_col])
              .map_batches(partials, batch_format="pyarrow")
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

    def recover(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return _EMPTY_INVENTORY
        kt = ray.get(ref)  # zero-copy plasma read
        ks = kt["k"].to_numpy()
        url = batch[url_col].combine_chunks()
        text = batch[text_col].combine_chunks()
        host, parent, flat, k, nonempty = _line_rows(url, text)
        hit = _member(ks, k) & nonempty
        idx = np.flatnonzero(hit)
        if not len(idx):
            return _EMPTY_INVENTORY
        # one row per distinct qualifying key in this batch
        kk = k[idx]
        o = np.argsort(kk, kind="stable")
        firsts = np.empty(len(o), dtype=bool)
        firsts[0] = True
        firsts[1:] = kk[o][1:] != kk[o][:-1]
        sel = idx[o][firsts]
        ku = k[sel]
        pos = np.searchsorted(ks, ku)
        return pa.table({
            "host": host.cast(pa.large_string()).take(
                pa.array(parent[sel], pa.int64())),
            "line": flat.cast(pa.large_string()).take(
                pa.array(sel, pa.int64())),
            "n_pages": pa.array(
                kt["n_pages"].to_numpy()[pos], pa.int64()),
            "__bkt": pa.array(ku % np.int64(n_buckets), pa.int64())})

    # many batches re-emit the same qualifying line → one small dedup
    # fold over qualifying rows only (inventory-shaped, not corpus-)
    return (ds.select_columns([url_col, text_col])
              .map_batches(recover, batch_format="pyarrow")
              .groupby("__bkt")
              .map_groups(
                  lambda g: g.drop_duplicates(["host", "line"])
                             [["host", "line", "n_pages"]],
                  batch_format="pandas"))


def _strip_rows(url: pa.Array, text: pa.Array, ks: np.ndarray,
                url_col: str, text_col: str) -> pa.Table:
    """Rebuild pages without lines whose (host, line) key is in the
    sorted key array: ordered rejoin keyed on ROW POSITION (duplicate
    urls rebuild independently), empty lines kept."""
    n = len(url)
    if not n:
        return pa.table({
            url_col: pa.array([], pa.large_string()),
            text_col: pa.array([], pa.large_string()),
            "n_dropped": pa.array([], pa.int64())})
    _host, parent, flat, k, nonempty = _line_rows(url, text)
    drop = _member(ks, k) & nonempty
    keep = ~drop
    counts = np.bincount(parent[keep], minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    kept_lines = flat.cast(pa.large_string()).filter(
        pa.array(keep, pa.bool_()))
    rebuilt = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), kept_lines)
    n_dropped = np.bincount(parent[drop], minlength=n)
    return pa.table({
        url_col: url.cast(pa.large_string()),
        text_col: pc.binary_join(
            rebuilt, pa.scalar("\n", pa.large_string())),
        "n_dropped": pa.array(n_dropped.astype(np.int64), pa.int64())})


def strip_boilerplate(
    ds: ray.data.Dataset,
    url_col: str = "url",
    text_col: str = "text",
    min_pages: int = 3,
    n_buckets: int = 64,
    mode: str = "auto",
    broadcast_limit: int = 50_000_000,
    host_limit: int = 20_000_000,
) -> ray.data.Dataset:
    """Every page with its host's boilerplate removed:
    ``(url, text, n_dropped)``. ``ds`` is consumed twice (decision +
    rebuild) — pass a re-readable source.

    ``mode="auto"`` picks the rebuild regime from the measured
    qualifying-key table: ``sharded`` when the key count exceeds
    ``broadcast_limit`` (per-worker copies of the key array stop
    fitting) OR when the HLL-estimated distinct-host count exceeds
    ``host_limit`` (a 10^8-host corpus implies an inventory no single
    process should hold even before the key count crosses the line —
    one constant-state sketch scan of the small keys table, never of
    the corpus). ``sharded`` partitions the slim key table into actors
    by host hash and streams the corpus IN PLACE (no text all-to-all;
    measured 2.2× faster than ``bucketed`` at 200k pages and matching
    ``broadcast``); ``bucketed`` (the text-shuffle hash join) remains
    available explicitly and parity-tested."""
    keys = _qualifying_keys(ds, url_col, text_col, min_pages,
                            n_buckets).materialize()
    if mode == "auto":
        if keys.count() > broadcast_limit:
            mode = "sharded"
        else:
            from .sketch import approx_distinct

            est = approx_distinct(keys, "host").take_all()
            n_hosts = int(est[0]["n_distinct_est"]) if est else 0
            mode = "sharded" if n_hosts > host_limit else "broadcast"

    if mode == "broadcast":
        ref = _key_table_task.remote(*keys.to_arrow_refs())

        def rb(batch: pa.Table) -> pa.Table:
            ks = ray.get(ref)["k"].to_numpy()
            return _strip_rows(batch[url_col].combine_chunks(),
                               batch[text_col].combine_chunks(),
                               ks, url_col, text_col)

        return ds.select_columns([url_col, text_col]).map_batches(
            rb, batch_format="pyarrow")

    if mode == "sharded":
        return _sharded_strip(ds, keys, url_col, text_col,
                              n_shards=max(4, n_buckets // 4))

    if mode != "bucketed":
        raise ValueError(f"unknown strip_boilerplate mode: {mode}")

    def tag_pages(batch: pa.Table) -> pa.Table:
        host = _hosts_of(batch[url_col].combine_chunks())
        return pa.table({
            url_col: batch[url_col].combine_chunks().cast(
                pa.large_string()),
            text_col: pc.fill_null(batch[text_col].combine_chunks(),
                                   "").cast(pa.large_string()),
            "k": pa.array(np.zeros(batch.num_rows, np.int64),
                          pa.int64()),
            "__side": pa.array(["c"] * batch.num_rows,
                               pa.large_string()),
            "__bkt": pa.array(hash64_str(host) % np.int64(n_buckets),
                              pa.int64())})

    def tag_keys(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            url_col: pa.array([""] * n, pa.large_string()),
            text_col: pa.array([""] * n, pa.large_string()),
            "k": batch["k"].combine_chunks().cast(pa.int64()),
            "__side": pa.array(["b"] * n, pa.large_string()),
            "__bkt": pa.array(
                hash64_str(batch["host"].combine_chunks())
                % np.int64(n_buckets), pa.int64())})

    both = ds.select_columns([url_col, text_col]).map_batches(
        tag_pages, batch_format="pyarrow"
    ).union(keys.map_batches(tag_keys, batch_format="pyarrow"))

    def rebuild_group(g: pa.Table) -> pa.Table:
        side = g["__side"]
        pages = g.filter(pc.equal(side, "c"))
        ks = np.sort(
            g.filter(pc.equal(side, "b"))["k"].to_numpy(
                zero_copy_only=False).astype(np.int64))
        return _strip_rows(pages[url_col].combine_chunks(),
                           pages[text_col].combine_chunks(),
                           ks, url_col, text_col)

    return both.groupby("__bkt").map_groups(
        rebuild_group, batch_format="pyarrow")


@ray.remote(num_cpus=0)
class _KeyShard:
    """One partition of the qualifying-key table, hashed by host — the
    sharded rebuild regime's state (the seen-set pattern): no process
    ever holds the full key inventory, and the CORPUS TEXT never moves.
    ``add`` may receive the same host from several feed batches (the
    keys table is partitioned arbitrarily) and task retries may repeat
    an add; duplicate keys are harmless — membership via searchsorted
    is duplicate-tolerant."""

    def __init__(self):
        self._by_host: dict[str, list] = {}

    def add(self, hosts: list, key_arrays: list) -> int:
        for h, ks in zip(hosts, key_arrays):
            self._by_host.setdefault(h, []).append(ks)
        return len(hosts)

    def get(self, hosts: list) -> np.ndarray:
        chunks = [a for h in hosts for a in self._by_host.get(h, ())]
        if not chunks:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(chunks)


def _sharded_strip(ds: ray.data.Dataset, keys: ray.data.Dataset,
                   url_col: str, text_col: str, n_shards: int
                   ) -> ray.data.Dataset:
    """The sharded rebuild regime: partition the slim (host, k) table
    into ``n_shards`` actors by ``hash64(host)``, then stream the
    corpus IN PLACE — each rebuild batch fetches only its own hosts'
    key arrays (one batched RPC per shard touched) and strips locally.
    vs ``bucketed``: the all-to-all of page text disappears; what moves
    per batch is #distinct-hosts × a few int64 keys. Byte-identical to
    the broadcast regime (test_boilerplate regime parity)."""
    from ..vhash import hash64_str

    shards = [_KeyShard.remote() for _ in range(n_shards)]

    def feed(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n:
            host = np.asarray(batch["host"].to_pylist(), dtype=object)
            k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
            sid = hash64_str(host) % n_shards
            futs = []
            for s in np.unique(sid):
                m = sid == s
                hs = host[m]
                ks = k[m]
                # group this shard's rows by host (sorted run-split)
                o = np.argsort(hs, kind="stable")
                hs, ks = hs[o], ks[o]
                cut = np.flatnonzero(
                    np.concatenate(([True], hs[1:] != hs[:-1])))
                futs.append(shards[int(s)].add.remote(
                    [str(h) for h in hs[cut]],
                    np.split(ks, cut[1:])))
            ray.get(futs)
        return pa.table({"n": pa.array([n], pa.int64())})

    # barrier: every key registered before any rebuild batch reads
    keys.map_batches(feed, batch_format="pyarrow").count()

    def rb(batch: pa.Table) -> pa.Table:
        url = batch[url_col].combine_chunks()
        host = _hosts_of(url)
        uh = np.unique(np.asarray(host.to_pylist(), dtype=object))
        ks = np.empty(0, dtype=np.int64)
        if len(uh):
            sid = hash64_str(uh) % n_shards
            futs = [shards[int(s)].get.remote(
                        [str(h) for h in uh[sid == s]])
                    for s in np.unique(sid)]
            got = ray.get(futs)
            ks = np.sort(np.concatenate(got)) if got else ks
        return _strip_rows(url, batch[text_col].combine_chunks(),
                           ks, url_col, text_col)

    return ds.select_columns([url_col, text_col]).map_batches(
        rb, batch_format="pyarrow")
