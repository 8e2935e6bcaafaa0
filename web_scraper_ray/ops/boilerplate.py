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

Ray-Data shape (the dedup-family pattern, ops/dedup.py module doc):

1. decision pass ships only ``(host, line, url)`` triples, de-duplicated
   per batch BEFORE the shuffle (a page mentioning a line five times
   contributes one triple) — the html/full text never rides this
   all-to-all, and the groupby is coarse-bucketed (``n_buckets``
   groups, never one group per distinct line: the documented
   corpus-cardinality-groupby rule);
2. rebuild pass: ``broadcast`` folds the boilerplate table into the
   object store in a Ray task (the driver never holds it) and every
   batch filters its own lines against its own hosts' entries;
   ``bucketed`` co-locates pages and boilerplate rows by
   ``hash(host) % n_buckets`` so no process ever holds the full
   inventory — right when hosts × boilerplate lines outgrow a node.
   ``mode="auto"`` switches on the measured inventory size.

Per-host inventories are naturally small (a site's chrome is dozens of
lines), so broadcast is the default regime; the bucketed path exists
for the 10^8-host crawl where even dozens × hosts is corpus-shaped.

Parity discipline (the DuckDB twin in ``__ray_entry__.oracle_sql``
replays every rule): host = ``regexp_extract(url, '://([^/]+)', 1)``;
lines split on ``chr(10)`` exactly; empty lines are never boilerplate
(they carry layout, not content — and stripping them would merge
paragraphs); rejoin is an ordered ``string_agg``; a page whose every
line was boilerplate comes back with empty text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_HOST_RE = r"://([^/]+)"


def _line_triples(df: pd.DataFrame, url_col: str, text_col: str,
                  n_buckets: int) -> pd.DataFrame:
    """Distinct (host, line, url) triples of a batch, bucketed — the
    slim decision rows. Empty lines excluded (module doc)."""
    if not len(df):
        return pd.DataFrame({
            "host": pd.Series([], dtype=object),
            "line": pd.Series([], dtype=object),
            url_col: pd.Series([], dtype=object),
            "__bkt": pd.Series([], dtype="int64")})
    host = df[url_col].str.extract(_HOST_RE, expand=False).fillna("")
    ex = pd.DataFrame({
        url_col: df[url_col],
        "host": host,
        "line": df[text_col].fillna("").str.split("\n"),
    }).explode("line", ignore_index=True)
    ex = ex[ex["line"] != ""].drop_duplicates(["host", "line", url_col])
    key = (ex["host"] + "\x1f" + ex["line"]).to_numpy(dtype=object)
    # run-internal bucket hash only (never persisted, never compared
    # across versions) — vectorized, no per-row Python
    ex["__bkt"] = (pd.util.hash_array(key).astype(np.int64)
                   % np.int64(n_buckets))
    return ex[["host", "line", url_col, "__bkt"]]


def host_boilerplate_lines(
    ds: ray.data.Dataset,
    url_col: str = "url",
    text_col: str = "text",
    min_pages: int = 3,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-host boilerplate inventory: ``(host, line, n_pages)`` for
    every non-empty line appearing on ``>= min_pages`` distinct pages
    of the same host."""
    triples = ds.select_columns([url_col, text_col]).map_batches(
        lambda df: _line_triples(df, url_col, text_col, n_buckets),
        batch_format="pandas",
    )

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.drop_duplicates(["host", "line", url_col])
                .groupby(["host", "line"], sort=False)[url_col]
                .nunique().reset_index(name="n_pages"))
        agg = agg[agg["n_pages"] >= min_pages]
        return agg[["host", "line", "n_pages"]]

    return triples.groupby("__bkt").map_groups(
        count_group, batch_format="pandas")


@ray.remote
def _bp_table_task(*blocks) -> pd.DataFrame:
    """Fold the boilerplate inventory into one object-store frame (the
    _loser_pairs_task pattern — the driver never holds it)."""
    frames = [b.to_pandas() if isinstance(b, pa.Table) else b
              for b in blocks]
    if not frames:
        return pd.DataFrame({"host": [], "line": []})
    return pd.concat(frames, ignore_index=True)[["host", "line"]]


def _strip_batch(df: pd.DataFrame, bp: pd.DataFrame, url_col: str,
                 text_col: str) -> pd.DataFrame:
    """Rebuild a batch of pages without their hosts' boilerplate lines
    (order-preserving, empty lines kept)."""
    if not len(df):
        return pd.DataFrame({
            url_col: pd.Series([], dtype=object),
            text_col: pd.Series([], dtype=object),
            "n_dropped": pd.Series([], dtype="int64")})
    host = df[url_col].str.extract(_HOST_RE, expand=False).fillna("")
    lines = df[text_col].fillna("").str.split("\n")
    ex = pd.DataFrame({
        url_col: df[url_col].to_numpy().repeat(lines.str.len()),
        "host": host.to_numpy().repeat(lines.str.len()),
        "line": np.concatenate(lines.to_numpy()),
    })
    ex["p"] = ex.groupby(url_col, sort=False).cumcount()
    if len(bp):
        bp = bp[bp["host"].isin(host.unique())]
    if len(bp):
        m = ex.merge(bp.assign(__drop=True), on=["host", "line"],
                     how="left")
        drop = m["__drop"].notna() & (m["line"] != "")
    else:
        m = ex
        drop = pd.Series(False, index=m.index)
    kept = m.loc[~drop].sort_values([url_col, "p"], kind="mergesort")
    agg = kept.groupby(url_col, sort=False)["line"].agg("\n".join)
    out = pd.DataFrame({url_col: df[url_col].to_numpy()})
    out[text_col] = out[url_col].map(agg).fillna("")
    n_drop = m.loc[drop].groupby(url_col, sort=False).size()
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
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Every page with its host's boilerplate removed:
    ``(url, text, n_dropped)``. ``ds`` is consumed twice (decision +
    rebuild) — pass a re-readable source."""
    bp = host_boilerplate_lines(ds, url_col, text_col, min_pages,
                                n_buckets).materialize()
    if mode == "auto":
        mode = "broadcast" if bp.count() <= broadcast_limit else "bucketed"

    if mode == "broadcast":
        ref = _bp_table_task.remote(*bp.to_arrow_refs())

        def rb(df: pd.DataFrame) -> pd.DataFrame:
            return _strip_batch(df, ray.get(ref), url_col, text_col)

        return ds.select_columns([url_col, text_col]).map_batches(
            rb, batch_format="pandas")

    if mode != "bucketed":
        raise ValueError(f"unknown strip_boilerplate mode: {mode}")

    def tag_pages(df: pd.DataFrame) -> pd.DataFrame:
        host = df[url_col].str.extract(_HOST_RE, expand=False).fillna("")
        out = df[[url_col, text_col]].copy()
        out["host"] = host
        out["line"] = ""
        out["__side"] = "c"
        out["__bkt"] = (pd.util.hash_array(
            host.to_numpy(dtype=object)).astype(np.int64)
            % np.int64(n_buckets))
        return out

    def tag_bp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            url_col: "", text_col: "",
            "host": df["host"], "line": df["line"], "__side": "b",
            "__bkt": (pd.util.hash_array(
                df["host"].to_numpy(dtype=object)).astype(np.int64)
                % np.int64(n_buckets)),
        })

    both = ds.select_columns([url_col, text_col]).map_batches(
        tag_pages, batch_format="pandas"
    ).union(bp.map_batches(tag_bp, batch_format="pandas"))

    def rebuild_group(g: pd.DataFrame) -> pd.DataFrame:
        pages = g.loc[g["__side"] == "c", [url_col, text_col]]
        inv = g.loc[g["__side"] == "b", ["host", "line"]]
        return _strip_batch(pages, inv, url_col, text_col)

    return both.groupby("__bkt").map_groups(
        rebuild_group, batch_format="pandas")
